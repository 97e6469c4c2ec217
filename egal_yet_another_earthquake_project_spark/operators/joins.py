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
    bucket_minutes: int = 1440,
) -> DataFrame:
    """For each left row, the most recent right row at-or-before it (ASOF).

    Union both sides with a side marker and carry the latest right values
    forward with ``last(..., ignorenulls=True)``:

    * with ``keys`` — one window per key: a single shuffle + sort, the
      cost profile of a sort-merge join, parallel across keys;
    * without keys — a naive global window would be ONE partition (dies at
      scale), so the carry runs bucketed: parallel within-bucket windows
      on ``bucket_minutes`` time buckets, then a prefix carry over the
      tiny per-bucket summary (≈ time-range / bucket_minutes rows), joined
      back broadcast. Work per partition is bounded by bucket width, not
      data size.

    Right rows order before left rows at equal ts, so an exactly-coincident
    sample is visible to its event. With ``tolerance_minutes``, matches
    staler than the horizon are nulled (row kept, LEFT semantics).
    """
    keys = keys or []
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
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

    asof_marker = F.when(F.col("_side") == 0, F.col("_ts"))
    if keys:
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned
        for c in right_cols:
            carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
        carried = carried.withColumn(
            "_asof_ts", F.last(asof_marker, ignorenulls=True).over(w)
        )
    else:
        bucket = (F.col("_ts").cast("long") / (bucket_minutes * 60)).cast("long")
        unioned = unioned.withColumn("_bkt", bucket)
        w_in = (
            Window.partitionBy("_bkt")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned
        for c in right_cols:
            carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w_in))
        carried = carried.withColumn(
            "_asof_ts", F.last(asof_marker, ignorenulls=True).over(w_in)
        )
        # Per-bucket summary of the latest right row, then a prefix carry
        # over buckets. The summary has one row per non-empty bucket — a
        # driver-free single-partition window over a frame that stays tiny
        # by construction, then broadcast back.
        summary = (
            unioned.filter(F.col("_side") == 0)
            .groupBy("_bkt")
            .agg(
                F.max("_ts").alias("_bkt_last_ts"),
                *[F.max_by(c, "_ts").alias(f"_bkt_{c}") for c in right_cols],
            )
        )
        w_carry = Window.orderBy("_bkt").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_lag = Window.orderBy("_bkt")
        all_buckets = unioned.select("_bkt").distinct()
        carry = all_buckets.join(summary, "_bkt", "left")
        # two steps per column: running last-known value over buckets, then
        # lag(1) so a bucket sees only STRICTLY earlier buckets (its own
        # right rows are already covered by the within-bucket window)
        carry = carry.withColumn(
            "_run_ts", F.last("_bkt_last_ts", ignorenulls=True).over(w_carry)
        ).withColumn("_carry_ts", F.lag("_run_ts").over(w_lag))
        for c in right_cols:
            carry = carry.withColumn(
                f"_run_{c}", F.last(f"_bkt_{c}", ignorenulls=True).over(w_carry)
            ).withColumn(f"_carry_{c}", F.lag(f"_run_{c}").over(w_lag))
        carry = carry.select(
            "_bkt", "_carry_ts", *[F.col(f"_carry_{c}") for c in right_cols]
        )
        carried = carried.join(F.broadcast(carry), "_bkt", "left")
        for c in right_cols:
            carried = carried.withColumn(c, F.coalesce(c, f"_carry_{c}"))
        carried = carried.withColumn(
            "_asof_ts", F.coalesce("_asof_ts", "_carry_ts")
        ).drop("_bkt", "_carry_ts", *[f"_carry_{c}" for c in right_cols])

    out = carried.filter(F.col("_side") == 1)
    if tolerance_minutes is not None:
        horizon = F.col("_ts").cast("long") - F.lit(tolerance_minutes * 60)
        stale = F.col("_asof_ts").cast("long") < horizon
        for c in right_cols:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.drop("_ts", "_side", "_asof_ts")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket_minutes: int = 5,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Interval × interval OVERLAP join (a_start < b_end AND
    b_start < a_end) as an equi-join — the temporal-coverage shape
    (outages × sessions, promotions × orders) that naive SQL plans as
    an O(n·m) theta join.

    Each interval explodes to the ``bucket_minutes``-wide buckets it
    covers; candidates meet on the bucket key (ordinary hash join,
    AQE-skew splittable). Two overlapping intervals share EVERY bucket
    of their intersection, so the join is restricted to the FIRST
    common bucket — ``greatest(floor(a_start/w), floor(b_start/w))`` —
    which emits each pair exactly once: no distinct pass, no dedup
    shuffle. The exact overlap predicate remains as a residual filter.

    ``max_buckets`` bounds the per-row explosion: one interval spanning
    years would otherwise fan out unboundedly (the skew cliff this
    operator exists to avoid); violators fail loudly rather than
    silently degrade the whole stage.
    """
    w = F.lit(int(bucket_minutes) * 60)

    def buckets(start: str, end: str) -> F.Column:
        lo = (F.unix_timestamp(start) / w).cast("long")
        hi = (F.unix_timestamp(end) / w).cast("long")
        guarded = F.when(
            (hi >= lo) & (hi - lo < int(max_buckets)), F.sequence(lo, hi)
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "interval_overlap_join: interval is inverted (end "
                    "before start) or spans more than "
                    f"{int(max_buckets)} buckets (start=%s)", F.col(start)
                )
            )
        )
        return F.explode(guarded)

    ea = a.withColumn("_b", buckets(a_start, a_end))
    eb = b.withColumn("_b", buckets(b_start, b_end))
    first_common = F.greatest(
        (F.unix_timestamp(a_start) / w).cast("long"),
        (F.unix_timestamp(b_start) / w).cast("long"),
    )
    overlap = (F.col(a_start) < F.col(b_end)) & (
        F.col(b_start) < F.col(a_end)
    )
    return (
        ea.join(eb, "_b")
        .filter((F.col("_b") == first_common) & overlap)
        .drop("_b")
    )
