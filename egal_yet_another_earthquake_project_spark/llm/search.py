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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import text as ltx

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


#: Binary quantization grid (2^26) for ORDER-FREE exact accumulation of
#: per-term score contributions: each contribution is floored onto the
#: grid as a 64-bit integer and integers are summed — exact under ANY
#: addition order, so the sum is partition-, plan-, and engine-
#: independent by construction (an unordered SUM of doubles is last-ulp
#: order-dependent; the previous term-sorted collect_list + left-fold
#: pinned the order but forced per-group array buffers AND a DuckDB
#: list_sort/ROW/lambda oracle surface that proved dialect-volatile —
#: VERDICT r12 #4). Quantization error ≤ n_terms · 2^-26 (~1.5e-8 per
#: term), invisible at the 4-dp score grain; a binary (non-decimal)
#: quantum can never land exactly ON a decimal rounding boundary. At
#: scale this is also the cheaper plan: a plain long SUM enables
#: map-side partial aggregation where collect_list buffered every term.
SCORE_QUANTUM = 67108864.0


def quantized_score_sum(contrib: Column) -> Column:
    """Σ contributions via the exact integer-grid accumulation above —
    returns a DOUBLE aggregate expression (sum of floored longs divided
    back by :data:`SCORE_QUANTUM`)."""
    return F.sum(
        F.floor(contrib * F.lit(SCORE_QUANTUM)).cast("long")
    ).cast("double") / F.lit(SCORE_QUANTUM)


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
    raw = bm25_scores_raw(df, terms, id_col, text_col, k1, b)
    return raw.select(
        "doc_id", F.round(F.col("_score_raw"), 4).alias("score"), "n_terms"
    )


def bm25_scores_raw(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """:func:`bm25_scores` before the round(·,4) — (doc_id, _score_raw,
    n_terms). Split out so the parity rounding-margin audit can measure
    every raw score's distance to its rounding boundary with the exact
    production arithmetic.

    The per-term contributions are accumulated with
    :func:`quantized_score_sum` — integer-grid floor + long SUM — which
    is exact under any addition order, so the raw score is identical
    across partitionings and engines by construction (no per-group
    array buffer, no ordered fold, map-side combinable).
    """
    contribs = bm25_contribs(df, terms, id_col, text_col, k1, b)
    return contribs.groupBy("doc_id").agg(
        quantized_score_sum(F.col("_c")).alias("_score_raw"),
        F.count("*").alias("n_terms"),
    )


def bm25_contribs(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Per-(doc, term) BM25 contributions ``_c`` BEFORE accumulation —
    the floor-grid margin audit measures each raw contribution's
    distance to its :data:`SCORE_QUANTUM` integer boundary here, with
    the exact production arithmetic."""
    if not terms:
        raise ValueError("terms must be non-empty")
    tokd = ltx.tokenized(df, text_col).select(
        F.col(id_col).alias("doc_id"), F.col("_toks")
    )
    # dl rides the exploded postings (constant within a (doc, term)
    # group, re-surfaced by max), so no separate per-doc length frame
    # is ever joined back on doc_id — the old tf×lens join re-ran the
    # corpus tokenize for its lens side AND shuffled the corpus-scale
    # (doc_id, dl) frame. Remaining corpus passes: this one and the
    # global-stats aggregate (which must see every doc, matching or
    # not, and reduces map-side without shuffling the corpus).
    tf = (
        tokd.select(
            "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    stats = tokd.select(F.size("_toks").alias("dl")).agg(
        F.sum("dl").alias("sdl"), F.count("*").alias("ndocs")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").join(F.broadcast(stats))
    idf = F.log(
        (F.col("ndocs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm_len = F.col("dl").cast("double") * F.col("ndocs") / F.col("sdl")
    denom = F.col("tf") + k1 * (1.0 - b + b * norm_len)
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return scored.select("doc_id", "term", contrib.alias("_c"))


def bm25_scores_per_query(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Per-QUERY BM25 (VERDICT r11 ask #3): each query row carries its
    own text; terms are extracted with the same tokenizer as the corpus
    side, so real multi-query retrieval replaces the shared corpus-probe
    term list. Returns (query_id, doc_id, score, n_terms) for documents
    matching ≥1 of the query's terms.

    Scale shape — identical to :func:`bm25_scores` with the term filter
    generalized: the union of all query terms is a tiny frame (queries
    are a request batch, never a corpus), broadcast-SEMI-joined into the
    exploded corpus tokens MAP-SIDE, so the grouping shuffle still
    carries only query-term postings. The per-(query, doc) score join is
    candidate-frame × broadcast (query, term) pairs; accumulation is
    :func:`quantized_score_sum` (order-free exact integer grid). idf/dl
    statistics are query-independent — computed once, broadcast once.
    """
    raw = bm25_scores_per_query_raw(
        df, queries, id_col, text_col, query_id_col, query_text_col, k1, b
    )
    return raw.select(
        query_id_col,
        "doc_id",
        F.round(F.col("_score_raw"), 4).alias("score"),
        "n_terms",
    )


def bm25_contribs_per_query(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Per-(query, doc, term) BM25 contributions ``_c`` BEFORE
    accumulation — the floor-grid margin audit measures each raw
    contribution's distance to its :data:`SCORE_QUANTUM` integer
    boundary here, with the exact production arithmetic."""
    qterms = (
        ltx.tokenized(queries, query_text_col)
        .select(F.col(query_id_col), F.explode("_toks").alias("term"))
        .distinct()
    )
    term_set = qterms.select("term").distinct()
    tokd = ltx.tokenized(df, text_col).select(
        F.col(id_col).alias("doc_id"), F.col("_toks")
    )
    # Same shape as :func:`bm25_contribs`: dl rides the exploded
    # postings instead of joining a separate corpus-scale length frame
    # back on doc_id (which re-tokenized the corpus for the lens side
    # and shuffled it). Two corpus passes total — this one and the
    # global-stats aggregate.
    tf = (
        tokd.select(
            "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        .join(F.broadcast(term_set), "term", "semi")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    stats = tokd.select(F.size("_toks").alias("dl")).agg(
        F.sum("dl").alias("sdl"), F.count("*").alias("ndocs")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").join(F.broadcast(stats))
    idf = F.log(
        (F.col("ndocs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm_len = F.col("dl").cast("double") * F.col("ndocs") / F.col("sdl")
    denom = F.col("tf") + k1 * (1.0 - b + b * norm_len)
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    per_doc_term = scored.select("doc_id", "term", contrib.alias("_c"))
    return per_doc_term.join(F.broadcast(qterms), "term").select(
        query_id_col, "doc_id", "term", "_c"
    )


def bm25_scores_per_query_raw(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """:func:`bm25_scores_per_query` before the round(·,4) — for the
    parity rounding-margin audit. Accumulation is
    :func:`quantized_score_sum` (order-free integer grid)."""
    contribs = bm25_contribs_per_query(
        df, queries, id_col, text_col, query_id_col, query_text_col, k1, b
    )
    return contribs.groupBy(query_id_col, "doc_id").agg(
        quantized_score_sum(F.col("_c")).alias("_score_raw"),
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
