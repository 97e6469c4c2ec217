"""Skew mitigation: key salting for hot-key aggregations and joins.

AQE's skew-join splitting handles moderate skew automatically
(session.py enables it); salting is the explicit tool for pathological
keys — e.g. a single province producing most events after a major quake,
or a stop-shingle in the dedup index. Two-phase aggregate: spread the hot
key over ``salt_buckets`` partial keys, aggregate, strip the salt,
aggregate again. Both shuffles carry balanced partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic-per-row salt (hash of the whole row's partition id +
    monotonically increasing id would be nondeterministic across retries;
    a hash of stable columns is reproducible)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).cast("int")
    )


def salted_group_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 16
) -> DataFrame:
    """groupBy(keys).count() resistant to hot keys: pre-aggregate on
    (keys, salt), then merge. Output: keys + ``n``."""
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_n"))
    return partial.groupBy(*keys).agg(F.sum("_n").alias("n"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase sum aggregation over salted keys (sums/counts/min/max are
    mergeable; averages must be derived from sum+count after the merge)."""
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count("*").alias("_n"), *[F.sum(c).alias(f"_s_{c}") for c in sum_cols]
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def replicate_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted join for a skewed fact against a small dim WITHOUT broadcast
    (when the dim is too large to broadcast but small enough to replicate
    ``salt_buckets``×): fact rows get a random-ish salt, dim rows are
    exploded to every salt value, join on (key, salt)."""
    fact = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(salt_buckets)).cast("int")
    )
    dim = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return fact.join(dim, on=[key, "_salt"]).drop("_salt")
