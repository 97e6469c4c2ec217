"""Temporal joins (SURVEY §2.3).

The reference's README promises earthquake × electric-field correlation but
implements no join at all (SURVEY J1). This module provides the joins that
promise needs, Spark-first:

* :func:`minute_equijoin` — exact minute-grain equi-join (both sides are
  minute-granular in the reference: events at
  /root/reference/sparktoELKstream.py:99, electric at electricraw.py:64-68).
  Cheapest; broadcast when the series side is small.
* :func:`range_join` — event ↔ all samples within ±tolerance. Implemented
  as coarse-bucket equi-join + residual predicate so Catalyst gets an
  equi-key to hash/shuffle on instead of a cartesian BroadcastNestedLoop —
  the difference between O(n·m) and O(n) at 100 TB.
* :func:`asof_join` — last-sample-at-or-before-event, the classic ASOF.
  Spark has no native ASOF (as of 4.x); implemented with the union +
  last(ignorenulls) window pattern: one shuffle-sort per key, fully
  distributed, no pandas.

Dimension enrichment (J2) lives in operators/enrich.py (broadcast join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from egal_yet_another_earthquake_project_spark import functions as EF


def minute_equijoin(
    events: DataFrame,
    series: DataFrame,
    event_ts: str = "ts",
    series_ts: str = "time",
    how: str = "left",
    broadcast_series: bool = True,
) -> DataFrame:
    """Join each event to the series sample of the same minute (J1 exact)."""
    e = events.withColumn("_minute", EF.minute_bucket(event_ts))
    s = series.withColumn("_minute", EF.minute_bucket(series_ts)).drop(series_ts)
    if broadcast_series:
        s = F.broadcast(s)
    return e.join(s, on="_minute", how=how).drop("_minute")


def range_join(
    events: DataFrame,
    series: DataFrame,
    event_ts: str = "ts",
    series_ts: str = "time",
    tolerance_minutes: int = 5,
) -> DataFrame:
    """Event ↔ every sample with |sample − event| ≤ tolerance (J1 range).

    Buckets both sides to ``tolerance``-sized windows and explodes each
    event into its bucket and the two neighbors, turning the range predicate
    into an equi-join key; the exact interval check remains as a residual
    filter. Shuffle is on the bucket key → ordinary hash join, AQE-skew
    splittable.
    """
    tol = tolerance_minutes * 60  # seconds
    e = events.withColumn(
        "_b",
        F.explode(
            F.array(
                (F.unix_timestamp(event_ts) / tol).cast("long") - 1,
                (F.unix_timestamp(event_ts) / tol).cast("long"),
                (F.unix_timestamp(event_ts) / tol).cast("long") + 1,
            )
        ),
    )
    s = series.withColumn("_b", (F.unix_timestamp(series_ts) / tol).cast("long"))
    joined = e.join(s, on="_b", how="inner").drop("_b")
    residual = (
        F.abs(F.unix_timestamp(series_ts) - F.unix_timestamp(event_ts)) <= F.lit(tol)
    )
    return joined.filter(residual)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    keys: list[str] | None = None,
    tolerance_minutes: int | None = None,
) -> DataFrame:
    """For each left row, the most recent right row at-or-before it (ASOF).

    Union both sides with a side marker, sort once within each key by
    (ts, side), and carry the latest right values forward with
    ``last(..., ignorenulls=True)``. One shuffle, one sort — the same cost
    profile as a sort-merge join. With ``keys=None`` the sort is global:
    fine for a single dense series (the electric table is ~0.5M rows/year),
    use keys to scale out.
    """
    keys = keys or []
    marker = F.lit(1)
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", marker)
    r_tagged = (
        right.select(
            *keys, F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_cols]
        )
        .withColumn("_side", F.lit(0))
    )
    # Align schemas for the union: left gets null right-cols, right gets null left-cols.
    for c in right_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    left_only_cols = [c for c in l_tagged.columns if c not in r_tagged.columns]
    for c in left_only_cols:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged)

    # right rows (side=0) sort before left rows (side=1) at equal ts, so an
    # exactly-coincident sample is visible to the event.
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    carried = carried.withColumn(
        "_asof_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_minutes is not None:
        horizon = F.col("_ts").cast("long") - F.lit(tolerance_minutes * 60)
        stale = F.col("_asof_ts").cast("long") < horizon
        for c in right_cols:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.drop("_ts", "_side", "_asof_ts")
