"""Deduplication operators (SURVEY A1/A2, ST5).

The reference deduplicates with two full-row ``distinct()`` passes — one on
the DataFrame (/root/reference/sparktoELKstream.py:99) and one on the RDD
tuples (:105) — which still leaves near-duplicate docs when AFAD re-sends an
event with ``isEventUpdate=true`` (SURVEY ST5). Engine semantics:

* :func:`distinct_rows` — the reference's literal behavior, one pass.
* :func:`dedup_by_key` — keep exactly one row per business key.
* :func:`latest_by_key` — last-update-wins upsert semantics (what the
  reference's ES sink needed), via ``max_by``-style window, shuffle-once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_rows(df: DataFrame) -> DataFrame:
    """Full-row dedup (A1+A2 collapse into one shuffle)."""
    return df.distinct()


def dedup_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """One arbitrary row per key — ``dropDuplicates``: hash-partitions by
    ``keys``, map-side partial dedup first, so it scales linearly."""
    return df.dropDuplicates(list(keys))


def latest_by_key(
    df: DataFrame, keys: Sequence[str], order_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Last-update-wins: the newest row per key by ``order_col``.

    Implemented as a row_number window (single shuffle on ``keys``). Pass
    ``tiebreak`` columns to make the winner deterministic when ``order_col``
    ties — required for oracle-hash parity and for idempotent replays.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
