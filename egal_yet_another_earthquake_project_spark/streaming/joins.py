"""Stream-stream correlation joins (SURVEY J1 live path, §7.2 step 7).

The reference's README promises live earthquake × electric-field
correlation and never builds it. Here: a watermarked stream-stream
interval join — each event joins the electric samples within a tolerance
window around it. Both sides carry watermarks so Spark can bound the join
state: a side's buffered rows are dropped once the other side's watermark
passes the interval bound (state ∝ watermark × rate, not stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_streams(
    events: DataFrame,
    ticks: DataFrame,
    event_ts: str = "date",
    tick_ts: str = "time",
    tolerance_minutes: int = 5,
    event_watermark: str = "30 minutes",
    tick_watermark: str = "30 minutes",
) -> DataFrame:
    """Event stream ⋈ tick stream on ``|tick − event| ≤ tolerance``.

    Implemented as a watermarked interval join: Spark turns the range
    condition plus the two watermarks into bounded join state on both
    sides. Output: event columns + ``time``/``data`` of every in-window
    sample (inner semantics — events with no sample in window emit
    nothing; aggregate downstream for per-event summaries).
    """
    # Spark requires an equality predicate on stream-stream joins: bucket
    # both sides at tolerance granularity (events exploded into bucket
    # ±1, exactly like operators/joins.range_join) so the range condition
    # rides on an equi-key; the interval predicate stays as the residual.
    tol_sec = tolerance_minutes * 60
    e = (
        events.withWatermark(event_ts, event_watermark)
        .withColumn(
            "_bkt",
            F.explode(
                F.array(
                    (F.unix_timestamp(event_ts) / tol_sec).cast("long") - 1,
                    (F.unix_timestamp(event_ts) / tol_sec).cast("long"),
                    (F.unix_timestamp(event_ts) / tol_sec).cast("long") + 1,
                )
            ),
        )
    )
    t = ticks.withWatermark(tick_ts, tick_watermark).withColumn(
        "_bkt", (F.unix_timestamp(tick_ts) / tol_sec).cast("long")
    )
    tol = f"INTERVAL {tolerance_minutes} MINUTES"
    cond = (
        (e["_bkt"] == t["_bkt"])
        & F.expr(f"{tick_ts} BETWEEN {event_ts} - {tol} AND {event_ts} + {tol}")
    )
    return e.join(t, on=cond, how="inner").drop("_bkt")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment (SURVEY J2 in its streaming
    form): every micro-batch joins against the static dim with an
    explicit broadcast, so enrichment never shuffles the stream — the
    dim ships to executors once per batch and the join is map-side.

    The static side is re-read per micro-batch by Spark, which is what
    makes slowly-changing dims pick up updates without restarting the
    query; `how="left"` keeps events whose key has no dim row yet
    (emitted with nulls, the streaming-safe default).
    """
    return stream.join(F.broadcast(dim), on=on, how=how)


def attribute_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "left_ts",
    right_ts: str = "right_ts",
    within_minutes: int = 30,
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
) -> DataFrame:
    """Keyed LEFT OUTER stream-stream attribution join — the
    click→conversion pattern: every left event, attributed to the right
    events on the same key arriving within ``within_minutes`` AFTER it;
    left events with no conversion are still emitted (right columns
    null) once the right watermark passes their attribution window, so
    the unmatched output is complete AND the join state stays bounded
    (state ∝ watermark × rate, never stream length).

    The time-interval predicate is mandatory for the outer side: without
    it Spark cannot know when a left row is definitively unmatched.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.select(
        F.col(key).alias("_rkey"),
        *[c for c in right.columns if c != key],
    ).withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw["_rkey"])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {within_minutes} MINUTES")
        )
    )
    return lw.join(rw, on=cond, how="leftOuter").drop("_rkey")
