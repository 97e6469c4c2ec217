"""Deterministic distributed sketches: KMV cardinality, count-min counts.

A 100 TB pipeline cannot afford exact `count(DISTINCT)` or exact
per-token counts on every probe — but the usual sketch libraries
(HyperLogLog, datasketches) are engine-private: two engines disagree in
the last few percent, so their outputs can never be hash-verified
against an independent oracle. These sketches are built instead from the
md5-derived hash family the rest of the package already uses — every
operation exists verbatim in any SQL engine, so the *estimates
themselves* are reproducible bit-for-bit across engines, partitionings,
and runs, and the driver's DuckDB gate can check them exactly.

* :func:`kmv_distinct` — K-Minimum-Values cardinality estimator
  (Bar-Yossef et al. 2002): keep the k smallest hash values per group;
  with the k-th smallest at normalized position u, the unbiased distinct
  estimate is (k−1)/u. Bounded state (k longs/group), mergeable
  (union = min-merge of two KMV sets), one shuffle.
* :func:`cms_build` / :func:`cms_estimate` — count-min sketch (Cormode &
  Muthukrishnan 2005): d independent hash rows of w buckets accumulate
  counts; a key's estimate is the min over its d buckets — an
  overestimate with error ≤ εN at probability 1−δ for w = e/ε, d =
  ln(1/δ). The sketch is d·w longs regardless of corpus size and is
  mergeable by element-wise +, which is what makes frequency tracking
  over an unbounded token stream feasible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 2^32 — the md5-prefix hash space; normalizing by it maps hashes to (0, 1].
_HASH_SPACE = float(1 << 32)


def _h32(c: Column, salt: str = "") -> Column:
    """First 32 md5 bits of (salt‖value) as a long in [0, 2^32) — the
    engine-portable uniform hash used across the package."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Plan: distinct (group, value) → hash → per-group rank → keep the
    k-th row. Groups with fewer than k distinct values report the exact
    count (their sketch never filled — KMV degrades gracefully to
    exact). Output: group_cols + ``est_distinct`` (double, rounded 2)
    + ``exact_distinct`` (the true count, carried so estimator quality
    is visible and testable).

    Scale: the distinct and the window shuffle on the same group key, so
    this is two passes of one partitioning. At extreme group width swap
    the window for a per-partition top-k merge (the sketch is mergeable
    by construction); estimate quality: RSE ≈ 1/√(k−2) ≈ 12.7% at k=64.
    """
    hv = (_h32(F.col(value_col)) + 1).alias("_hv")  # +1: (0, 2^32], avoids u=0
    d = df.select(*group_cols, value_col).distinct().select(*group_cols, hv, value_col)
    w = Window.partitionBy(*group_cols).orderBy(F.col("_hv").asc(), F.col(value_col).asc())
    wc = Window.partitionBy(*group_cols)
    ranked = d.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_cnt", F.count("*").over(wc)
    )
    kth = ranked.filter(F.col("_rn") == F.least(F.lit(k), F.col("_cnt")))
    est = F.when(F.col("_cnt") < k, F.col("_cnt").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_hv").cast("double")
    )
    return kth.select(
        *group_cols,
        F.round(est, 2).alias("est_distinct"),
        F.col("_cnt").cast("long").alias("exact_distinct"),
    )


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch from an item stream (one row per
    occurrence, or per (key, weight) with ``weight_col``).

    Each occurrence lands in ``depth`` buckets — hash row j uses the
    salted hash md5('cms{j}|'‖key) mod width — and the sketch is the
    (j, bucket) → total count table: ``depth·width`` rows no matter how
    large the input. The explode-to-depth rows happen map-side and
    partially aggregate before the only shuffle, which carries at most
    partitions·depth·width rows.
    """
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (_h32(F.col(key_col), f"cms{j}|") % width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_jb"),
        wcol.alias("_w"),
    )
    return (
        rows.select("_jb.j", "_jb.bucket", "_w")
        .groupBy("j", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each probe key's count from a built sketch: min over the
    key's ``depth`` buckets. The sketch is tiny (d·w rows) and is
    broadcast; probes never shuffle. Missing buckets count 0 (a key the
    sketch never saw estimates 0 unless every one of its buckets
    collided). Output: probe columns + ``est_count``."""
    pb = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (_h32(F.col(key_col), f"cms{j}|") % width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_jb"),
    ).select("*", "_jb.j", "_jb.bucket").drop("_jb")
    joined = pb.join(F.broadcast(sketch), ["j", "bucket"], "left").withColumn(
        "_c", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return (
        joined.groupBy(key_col)
        .agg(F.min("_c").alias("est_count"))
    )
