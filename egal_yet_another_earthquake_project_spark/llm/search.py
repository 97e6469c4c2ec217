"""Keyword search over the corpus: BM25 scoring with an inverted-index
shape that holds at 100 TB.

The plan: one explode of the materialized token array produces the
(doc, term) postings restricted to the query terms (the filter lands
BEFORE the grouping shuffle, so the shuffle carries only query-term
postings — KBs, not the corpus). Document-frequency and the global
(N, total-doc-length) statistics are tiny aggregates broadcast back into
the scoring join; the corpus-sized frames are only ever shuffled on
doc_id. No UDFs — the whole scoring expression is Catalyst-compiled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import text as ltx

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Per-document BM25 score over ``terms`` (Robertson/Sparck-Jones idf
    with the +1 shift so idf stays positive). Returns
    (doc_id, score, n_terms) for documents matching ≥1 term.

    Length normalization uses dl * N / Σdl instead of dl / avg(dl): the
    integer product stays exact in a double (< 2^53) and both engines
    perform the single division identically, so scores are reproducible
    bit-for-bit across partitionings.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    tokd = ltx.tokenized(df, text_col).select(
        F.col(id_col).alias("doc_id"), F.col("_toks")
    )
    lens = tokd.select("doc_id", F.size("_toks").alias("dl"))
    tf = (
        tokd.select("doc_id", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = lens.agg(F.sum("dl").alias("sdl"), F.count("*").alias("ndocs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(lens, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("ndocs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm_len = F.col("dl").cast("double") * F.col("ndocs") / F.col("sdl")
    denom = F.col("tf") + k1 * (1.0 - b + b * norm_len)
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return scored.groupBy("doc_id").agg(
        F.round(F.sum(contrib), 4).alias("score"),
        F.count("*").alias("n_terms"),
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    query_col: str = "query_id",
    item_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings — the standard
    hybrid-retrieval combiner (Cormack/Clarke/Buettcher 2009: score =
    Σ_sides 1/(k + rank), k=60): items surfaced by BOTH the lexical and
    the dense ranker beat items one side loved, without score
    calibration between incomparable scales.

    Scale shape: both inputs are CANDIDATE frames (≤ queries × k_side
    rows — the output of a top-k, never a corpus) so the full-outer
    join on (query, item) is candidate-scale; the per-query cut is a
    rank window over ≤ 2·k_side rows per query (WindowGroupLimit).
    Deterministic: the fused score is one fixed-shape arithmetic
    expression (two coalesced terms, no aggregation order), ranked
    rounded with the item id as tiebreak.

    Returns (query_col, item_col, rrf_score, rank_a, rank_b, rank) —
    rank_a/rank_b NULL when only one side surfaced the item.
    """
    ra = a.select(
        query_col, item_col, F.col(rank_col).alias("rank_a")
    )
    rb = b.select(
        query_col, item_col, F.col(rank_col).alias("rank_b")
    )
    fused = (
        ra.join(rb, [query_col, item_col], "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(
                    1.0 / (F.lit(int(rrf_k)) + F.col("rank_a")), F.lit(0.0)
                )
                + F.coalesce(
                    1.0 / (F.lit(int(rrf_k)) + F.col("rank_b")), F.lit(0.0)
                ),
                6,
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(item_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(topk))
        .select(query_col, item_col, "rrf_score", "rank_a", "rank_b", "rank")
    )
