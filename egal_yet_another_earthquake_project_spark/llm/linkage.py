"""Entity resolution / record linkage: blocked fuzzy matching and
TF-IDF keyword extraction.

The reference deduplicates only by full-row ``distinct()``
(/root/reference/sparktoELKstream.py:99,105); a training-data pipeline
additionally needs *fuzzy* linkage — "these two records are the same
entity despite small edits" — without an all-pairs comparison. The
standard scalable shape is blocking: a cheap deterministic key buckets
candidate records, an edit-distance verify runs only within buckets.

Scale notes (100 TB discipline):
- The self-join is an equi-join on the block key — never a cross join.
- Boilerplate prefixes (empty/near-empty documents, templated headers)
  create hot blocks whose within-block pair count is quadratic; the
  ``max_block`` cap drops them the same way ``max_doc_freq`` drops
  stop-shingles in :mod:`egal_yet_another_earthquake_project_spark.llm.dedup`.
- ``levenshtein`` runs JVM-side on a bounded prefix (``probe_chars``),
  so the verify cost per candidate pair is O(probe_chars²) with a small
  constant, not O(doc²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from egal_yet_another_earthquake_project_spark.llm.text import normalize, tokenized


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_chars: int = 16,
    probe_chars: int = 64,
    max_dist: int = 8,
    max_block: int = 50,
) -> DataFrame:
    """Candidate pairs whose normalized-text prefixes are within
    ``max_dist`` edits, blocked on the first ``block_chars`` characters.

    Returns ``(doc_a, doc_b, edit_dist)`` with ``doc_a < doc_b``.
    Blocks with more than ``max_block`` members are dropped as
    boilerplate (the quadratic-hot-key guard); lower ``block_chars``
    trades recall for block selectivity.
    """
    norm = normalize(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc"),
        F.substring(norm, 1, block_chars).alias("_blk"),
        F.substring(norm, 1, probe_chars).alias("_probe"),
    )
    ok = (
        base.groupBy("_blk")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_block)
        .select("_blk")
    )
    capped = base.join(ok, "_blk")
    a = capped.select(
        "_blk", F.col("doc").alias("doc_a"), F.col("_probe").alias("_pa")
    )
    b = capped.select(
        "_blk", F.col("doc").alias("doc_b"), F.col("_probe").alias("_pb")
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("edit_dist", F.levenshtein("_pa", "_pb").cast("int"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("doc_a", "doc_b", "edit_dist")
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Top-``top_n`` TF-IDF terms per document — the classic keyword /
    salient-term extraction pass.

    score = tf · ln((N+1)/(df+1)), rounded to 4 decimals BEFORE the
    per-document rank so the cut is stable across engines and
    partitionings (same discipline as the BM25 query); ties break on
    term ascending.

    ``max_df_frac`` (scikit-learn's ``max_df``): drop terms appearing
    in more than that fraction of documents BEFORE the tf⋈df join.
    These Zipf-head terms carry near-zero IDF (they are stopwords by
    definition of the corpus) yet account for most of the join's row
    mass; capping removes the skew fan at its source. Documents whose
    every term is capped simply emit fewer than ``top_n`` rows.

    Plan shape: one explode + two hash aggregates (per-(doc,term) tf,
    then per-term df); the document count is a broadcast scalar; the
    rank window partitions by document — no global window, no driver
    state. The df-side join key is vocabulary-scale, Zipf-headed; even
    UNCAPPED the tf⋈df join is linear in the collapsed tf table (skew
    bounded by the tf collapse that precedes it — re-measured at 10×
    pair mass: 1.25× wall, see SCALE.md), and ``max_df_frac`` bounds
    the head fan outright where keyword quality allows it.
    """
    toks = (
        tokenized(df, text_col)
        .select(F.col(id_col).alias("doc"), F.explode("_toks").alias("term"))
        # canonicalization no-op (split tokens/ids are never NULL): the
        # scored branch's join infers isnotnull(term) into its copy of
        # the tf subtree; making the filter explicit keeps every
        # branch's copy identical so AQE exchange reuse fires.
        .where(F.col("doc").isNotNull() & F.col("term").isNotNull())
    )
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    # count(when(tf >= 1, 1)) ≡ count(*): tf is a per-existing-group
    # count, always ≥ 1. The predicate exists ONLY to keep a real
    # dependency on the aggregated column — with plain count(*) (or
    # count(tf), which the optimizer folds to count(1) because counts
    # are non-nullable) column pruning collapses this branch's copy of
    # the tf aggregate to a bare distinct, making the two tf subtrees
    # canonically different and forcing a SECOND corpus tokenize; with
    # the dependency both branches share one exchange (AQE reuse).
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).alias("df_t")
    )
    ndocs = df.select(F.count_distinct(F.col(id_col)).alias("ndocs"))
    if max_df_frac is not None:
        dfreq = (
            dfreq.crossJoin(F.broadcast(ndocs))
            .filter(F.col("df_t") <= F.lit(max_df_frac) * F.col("ndocs"))
            .drop("ndocs")
        )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((F.col("ndocs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0))),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col("doc").alias(id_col),
            "term",
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )
