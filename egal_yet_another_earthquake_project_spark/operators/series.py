"""Time-series repair and anomaly detection over event streams.

The reference's electric-field series marks missing minutes with a 0.0
sentinel and simply stops at the first gap
(/root/reference/electricraw.py:134-138); the gap-sentinel query family
(``gap_series``) reproduces that. These operators go further, the way a
production time-series store would: *fill* the gaps by linear
interpolation between the nearest present samples, and flag anomalous
samples by trailing-window z-score.

Scale notes:
- ``interpolate_minute_series`` aggregates the (arbitrarily large)
  event stream down to minute grain FIRST — the interpolation windows
  then run over a minute-cardinality frame (~526k rows/year, the
  electric-series scale). By default (``partition_grain="month"``) the
  neighbor-carry windows are PARTITIONED by calendar month and the
  boundaries are stitched through a per-bucket summary (one row per
  month: last/first present sample) carried across buckets and joined
  back broadcast — the same shape as the keyless ASOF's bucketed carry
  (``operators/joins.py:asof_join``). Work per partition is bounded by
  the month width (~44k minutes), never the span of the series, and the
  only unpartitioned windows run over the month-cardinality summary.
  ``partition_grain=None`` keeps the single-window variant for
  sub-month frames.
- ``trailing_zscore`` windows partition by the entity key (user), so
  state and sort are per-key and shuffle once on that key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interpolate_minute_series(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    ndigits: int = 4,
    partition_grain: str | None = "month",
) -> DataFrame:
    """Minute-grain series with gaps linearly interpolated.

    Aggregates ``events`` to per-minute means, expands the full minute
    grid between the observed min and max, and fills each missing
    minute with the linear interpolation between its nearest present
    neighbors (edge gaps take the nearest present value). Output:
    ``(minute, v, was_gap)`` ordered by minute.

    With ``partition_grain`` (default ``"month"``) the neighbor-carry
    windows are partitioned by that calendar grain and bucket boundaries
    are stitched via a per-bucket last/first-present summary carried
    across buckets and broadcast back — bit-identical to the global
    window (the arithmetic is integer either way) but never a
    series-sized single partition. ``None`` = one global window (only
    for frames known to be small).
    """
    scale = 10**ndigits
    # Fixed-point value in 1/scale units: _v has ndigits decimals, so the
    # scaled long is exact — the interpolation then runs entirely in
    # integer arithmetic, making the rounded result bit-identical across
    # engines (double-rounding of an x.xxxx5 tie is engine-dependent;
    # integer half-up is not).
    per_min = (
        events.groupBy(F.date_trunc("minute", F.col(ts_col)).alias("minute"))
        .agg(F.round(F.avg(value_col), ndigits).alias("_v"))
        .withColumn("_v4", F.round(F.col("_v") * scale).cast("long"))
    )
    bounds = per_min.agg(F.min("minute").alias("lo"), F.max("minute").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 minute"))
        ).alias("minute")
    )
    joined = grid.join(per_min, "minute", "left")

    present_min = F.when(F.col("_v").isNotNull(), F.col("minute"))
    # The forward carry ("first present sample at-or-after me") runs as a
    # running ``last`` over minute DESCENDING — an incremental O(n)
    # frame. A ``first(...).rowsBetween(0, unboundedFollowing)`` frame
    # would be quadratic: Spark's UnboundedFollowing window frame
    # re-scans the remaining rows per row, which at 99% gap density is
    # O(grid²) (measured: 59k minutes → 70 s; this shape → sub-second).
    if partition_grain is None:
        w_back = Window.orderBy("minute").rowsBetween(Window.unboundedPreceding, 0)
        w_fwd = Window.orderBy(F.col("minute").desc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
        stamped = joined.select(
            "minute",
            "_v",
            F.last("_v4", ignorenulls=True).over(w_back).alias("_pv"),
            F.last("_v4", ignorenulls=True).over(w_fwd).alias("_nv"),
            F.last(present_min, ignorenulls=True).over(w_back).alias("_pt"),
            F.last(present_min, ignorenulls=True).over(w_fwd).alias("_nt"),
        )
    else:
        bkt = F.date_trunc(partition_grain, F.col("minute"))
        bucketed = joined.withColumn("_bkt", bkt)
        w_back = (
            Window.partitionBy("_bkt")
            .orderBy("minute")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_fwd = (
            Window.partitionBy("_bkt")
            .orderBy(F.col("minute").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        stamped = bucketed.select(
            "minute",
            "_v",
            "_bkt",
            F.last("_v4", ignorenulls=True).over(w_back).alias("_pv"),
            F.last("_v4", ignorenulls=True).over(w_fwd).alias("_nv"),
            F.last(present_min, ignorenulls=True).over(w_back).alias("_pt"),
            F.last(present_min, ignorenulls=True).over(w_fwd).alias("_nt"),
        )
        # Boundary stitch: one row per bucket (month-cardinality, i.e.
        # span/grain rows — 120 for a decade of minutes), so the
        # unpartitioned carry windows below run over a frame that stays
        # tiny by construction, then broadcast back. A row whose bucket
        # has no earlier/later present sample takes the carried neighbor
        # from the adjacent buckets; gaps spanning wholly-empty buckets
        # stitch through the running carry.
        summary = (
            per_min.withColumn("_bkt", bkt)
            .groupBy("_bkt")
            .agg(
                F.max("minute").alias("_l_t"),
                F.max_by("_v4", "minute").alias("_l_v"),
                F.min("minute").alias("_f_t"),
                F.min_by("_v4", "minute").alias("_f_v"),
            )
        )
        w_prev = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
        w_next = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        all_bkts = grid.select(bkt.alias("_bkt")).distinct()
        carry = all_bkts.join(summary, "_bkt", "left").select(
            "_bkt",
            F.last("_l_v", ignorenulls=True).over(w_prev).alias("_c_pv"),
            F.last("_l_t", ignorenulls=True).over(w_prev).alias("_c_pt"),
            F.last("_f_v", ignorenulls=True).over(w_next).alias("_c_nv"),
            F.last("_f_t", ignorenulls=True).over(w_next).alias("_c_nt"),
        )
        stamped = (
            stamped.join(F.broadcast(carry), "_bkt")
            .select(
                "minute",
                "_v",
                F.coalesce("_pv", "_c_pv").alias("_pv"),
                F.coalesce("_nv", "_c_nv").alias("_nv"),
                F.coalesce("_pt", "_c_pt").alias("_pt"),
                F.coalesce("_nt", "_c_nt").alias("_nt"),
            )
        )
    # Scaled interpolation: num/den in 1/scale units, rounded half-away-
    # from-zero with the explicit integer formula (2|num|+den) div (2 den).
    dt = F.unix_timestamp("minute") - F.unix_timestamp("_pt")
    den = F.unix_timestamp("_nt") - F.unix_timestamp("_pt")
    num = F.col("_pv") * den + (F.col("_nv") - F.col("_pv")) * dt
    interp4 = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)) * F.expr(
        "(2 * abs(_num) + _den) div (2 * _den)"
    )
    filled4 = (
        F.when(F.col("_v").isNotNull(), F.round(F.col("_v") * scale).cast("long"))
        .when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .otherwise(interp4)
    )
    return (
        stamped.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            F.date_format("minute", "yyyy-MM-dd HH:mm").alias("minute"),
            (filled4.cast("double") / scale).alias("v"),
            F.col("_v").isNull().alias("was_gap"),
        )
        .orderBy("minute")
    )


def trailing_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    lookback: int = 20,
    min_points: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key trailing-window anomaly flags: each event's value scored
    against the mean/stddev of its previous ``lookback`` events (frame
    excludes the current row — no self-leak), emitted when |z| crosses
    ``threshold`` with at least ``min_points`` of history.

    Output: ``(event_id, user_id, value, z)``, z rounded to 4.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-lookback, -1)
    )
    scored = events.select(
        F.col(id_col),
        F.col(key_col),
        F.col(value_col),
        F.avg(value_col).over(w).alias("_mu"),
        F.stddev_samp(value_col).over(w).alias("_sd"),
        F.count(value_col).over(w).alias("_n"),
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sd")
    return (
        scored.filter(
            (F.col("_n") >= min_points) & (F.col("_sd") > 1e-9)
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .select(id_col, key_col, value_col, F.round("z", 4).alias("z"))
    )
