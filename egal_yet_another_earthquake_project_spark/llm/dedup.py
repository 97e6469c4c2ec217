"""Document deduplication: exact, n-gram Jaccard, MinHash-LSH.

All three scale paths avoid the O(n²) all-pairs trap:

* **exact** — hash-groupBy on the content fingerprint: one shuffle on an
  md5 key, uniform by construction (no skew), keep min-id winner.
* **n-gram Jaccard** — inverted-index join: explode shingles, self-join on
  the shingle, count common shingles per pair, Jaccard from set sizes.
  Work is proportional to shared-shingle mass, not n².
* **MinHash-LSH** — per-doc signature of k independent min-hashes, banded;
  docs joining on a full band signature are candidates; verify candidates
  with exact Jaccard. Hash = md5(seed‖shingle) with *lexicographic string
  min*: a valid uniform min-hash that exists verbatim in every SQL engine,
  so the whole pipeline is oracle-checkable (no Spark-only hash).

References on the technique (public): Broder '97 min-wise hashing;
Leskovec-Rajaraman-Ullman MMDS ch.3 banding analysis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.text import (
    exploded_shingles,
    fingerprint,
)

#: Fixed, public seeds — one per minhash. Deterministic across runs/engines.
DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4  # → rows-per-band = 2


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep exactly one doc (min id) per identical normalized text.

    min-over-window on the md5 fingerprint: ONE shuffle on a uniformly
    distributed key and one pass over the input — a groupBy+self-join
    formulation evaluates the (possibly expensive) upstream plan twice.
    At 100 TB this is the cheapest possible full-corpus dedup.
    """
    from pyspark.sql.window import Window

    keyed = df.withColumn("_fp", fingerprint(text_col))
    w = Window.partitionBy("_fp")
    return (
        keyed.withColumn("_min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_min_id"))
        .drop("_fp", "_min_id")
    )


def doc_shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct — the inverted-index input."""
    return exploded_shingles(df, id_col, text_col, n).distinct()


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold.

    Inverted-index self-join on the shingle; |A∩B| from the join, |A|,|B|
    from a per-doc size aggregate; Jaccard = common/(|A|+|B|−common).
    Returns ``doc_a < doc_b`` pairs with ``jaccard`` (rounded 4).
    Hot shingles (stop-shingle skew) are the known risk at scale — AQE skew
    join handles moderate cases; drop top-frequency shingles for extreme
    corpora (they contribute candidates, not discrimination).
    """
    pairs = doc_shingle_sets(df, id_col, text_col, n)
    sizes = pairs.groupBy("doc").agg(F.count("*").alias("sz"))
    a = pairs.alias("a")
    b = pairs.alias("b")
    common = (
        a.join(b, on="sh")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Per-doc MinHash signature columns mh0..mh{k-1}.

    Hash = lexicographic min of md5(seed‖shingle) — a valid uniform
    min-hash that exists verbatim in every SQL engine. Computed via
    explode → groupBy(doc) with k ``min`` aggregates: the shingle array is
    materialized ONCE (a per-row signature expression would re-derive it k
    times — measured 50× slower), and partial map-side mins make the
    shuffle carry only k hashes per doc.
    """
    exploded = exploded_shingles(df, id_col, text_col, n)
    # k hashes from ceil(k/4) md5 digests: disjoint 8-hex-char (32-bit)
    # chunks of md5(seed‖shingle) are independent enough for min-hashing
    # and cost 4× fewer digest computations than one md5 per hash.
    aggs = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"mh{i // 4}|"), F.col("sh"))),
                (i % 4) * 8 + 1,
                8,
            )
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on ALL hashes of any band.

    Explode each doc into ``bands`` (band, band_signature) keys and
    self-join per key — a pure equi-join on a uniform hash key. Distinct
    (doc_a < doc_b) pairs out.
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *parts).alias("sig"))
        )
    exploded = signatures.select(
        "doc", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, on=["band", "sig"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    verify_threshold: float | None = 0.8,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: signatures → banded
    candidates → (optional) exact-Jaccard verification of candidates only.

    The verification join touches only candidate pairs — the LSH band step
    is what turns 100 TB all-pairs into a tractable candidate set.
    """
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands)
    if verify_threshold is None:
        return cands
    # The candidate set feeds three consumers (doc pruning, the pair join,
    # the final projection); cache AND materialize it so the LSH pipeline
    # runs exactly once — concurrent downstream stages would otherwise race
    # on the unpopulated cache and each recompute it. It is tiny by
    # construction (that is the point of LSH).
    cands = cands.cache()
    cands.count()
    # Verification touches only candidate docs: semi-join-prune the shingle
    # index down to them first (candidates are a tiny fraction of the
    # corpus — that is the whole point of LSH), and join on a 64-bit hash
    # of the shingle instead of the raw string to shrink the shuffle.
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc"))
        .unionByName(cands.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    # Prune BEFORE tokenizing: only candidate docs get re-shingled (the
    # corpus-wide explode would redo tokenization for every doc just to
    # throw most of it away). Pruned index is consumed by sizes + both
    # sides of the pair join.
    pruned_docs = df.join(
        F.broadcast(cand_docs.withColumnRenamed("doc", id_col)), id_col
    )
    shingle_sets = (
        doc_shingle_sets(pruned_docs, id_col, text_col, n)
        .select("doc", F.xxhash64("sh").alias("shh"))
        .cache()
    )
    sizes = shingle_sets.groupBy("doc").agg(F.count("*").alias("sz"))
    a = shingle_sets.select(F.col("doc").alias("doc_a"), "shh")
    b = shingle_sets.select(F.col("doc").alias("doc_b"), "shh")
    common = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
