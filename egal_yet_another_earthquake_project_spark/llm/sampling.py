"""Deterministic sampling and dataset splits.

Training pipelines need samples and train/val/test splits that are (a)
reproducible across runs and engines, (b) stable under repartitioning,
and (c) assigned per-record with no coordination. ``df.sample(seed=...)``
fails (a)/(b) — its outcome depends on partitioning. Hash-based
assignment from a stable key satisfies all three: bucket =
first-32-bits-of-md5(key) mod N, identical in any engine that has md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(salt‖key)
    as an integer, mod buckets. Portable to any SQL engine."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10)
    return (h.cast("long") % buckets).cast("int")


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — the same rows on
    every run, every engine, every partitioning."""
    return df.filter(hash_bucket(key, 10_000, salt) < int(fraction * 10_000))


def with_split(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket. ``weights`` maps
    split name → percentage (must sum to 100); default 80/10/10
    train/val/test."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    assert sum(weights.values()) == 100, "split weights must sum to 100"
    bucket = hash_bucket(key, 100, salt)
    expr: Column | None = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn(out_col, expr)
