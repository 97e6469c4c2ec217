"""Upsert / merge emulation (CDC pattern) without a table format.

Without Delta/Iceberg jars (not in this container), MERGE INTO is
emulated with the classic anti-join + union: incoming batch rows replace
same-key target rows, everything else passes through. For true SCD2,
closed-out versions are kept with validity ranges. Partition-parallel —
the only shuffle is the key join; at scale the target side should be
bucketed on the key (sinks/bucketed.py) so repeated merges co-locate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from egal_yet_another_earthquake_project_spark.operators.dedup import latest_by_key


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Last-writer-wins merge: rows from ``updates`` replace target rows
    with the same key; unmatched target rows survive. If ``order_col`` is
    given, intra-batch duplicates in ``updates`` collapse to the newest
    first (making the merge idempotent under replay)."""
    if order_col is not None:
        updates = latest_by_key(updates, keys, order_col)
    keep = target.join(updates.select(*keys), on=list(keys), how="left_anti")
    return keep.unionByName(updates)


def scd2_merge(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_col: str,
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: incoming versions close out the
    current row (``valid_to`` = new version's effective time) and insert
    the new row as current. Target must carry ``end_col``/``current_flag``
    (null / true for open rows)."""
    upd = updates.select(
        *keys,
        F.col(effective_col),
        *[c for c in updates.columns if c not in (*keys, effective_col)],
    )
    new_rows = (
        upd.withColumn(end_col, F.lit(None).cast(target.schema[end_col].dataType))
        .withColumn(current_flag, F.lit(True))
    )
    closing = upd.select(*keys, F.col(effective_col).alias("_new_eff"))
    closed = (
        target.join(closing, on=list(keys), how="left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_flag) & F.col("_new_eff").isNotNull(), F.col("_new_eff")
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_flag,
            F.when(F.col("_new_eff").isNotNull(), F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        )
        .drop("_new_eff")
    )
    return closed.unionByName(new_rows.select(*closed.columns))


def scd2_from_log(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Reconstruct the full SCD2 history from a change LOG in one pass —
    the batch complement of :func:`scd2_merge` (which applies one
    incremental batch): collapse consecutive rows whose tracked
    attributes didn't change, then close each surviving version with the
    next version's effective time.

    Two windows on the same (keys) partitioning — one shuffle, reused.
    Null-safe change detection (``<=>``), deterministic under ties via
    ``tiebreak``. Output: keys + attrs + ``valid_from``/``valid_to``
    (+``is_current``); the open version has a null ``valid_to``.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lag(ts_col).over(w).isNull()
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    vers = (
        df.select(*keys, ts_col, *attr_cols, *[c for c in tiebreak if c not in attr_cols])
        .withColumn("_chg", changed)
        .filter(F.col("_chg"))
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return vers.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
