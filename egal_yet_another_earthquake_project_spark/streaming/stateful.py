"""Custom stateful streaming operators (SURVEY §2.9 beyond-reference).

The reference's electric producer hand-rolls incremental-tail state in a
driver loop: remember the last non-gap minute, resume from there, stop at
the first 0.0 sentinel (/root/reference/electricraw.py:131-203). Here the
same semantics are a proper distributed stateful operator:

* :func:`track_series_gaps` — per-series ``applyInPandasWithState``: keeps
  (last_good_ts, open_gap_start) per key, emits one row per *closed* gap.
  State is per-key and checkpointed — restarts resume exactly, and a
  million independent series scale horizontally, unlike the reference's
  single driver loop.
* :func:`session_counts` — ``session_window`` aggregation (gap-bounded
  sessions), the streaming twin of workloads_ext.q_sessionize.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output: one row per closed gap in a series.
GAP_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("gap_start", T.TimestampType(), False),
        T.StructField("gap_end", T.TimestampType(), False),
        T.StructField("n_missing", T.LongType(), False),
    ]
)

#: State: last good sample ts + current open gap start (epoch seconds).
GAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_good", T.LongType(), True),
        T.StructField("gap_open", T.LongType(), True),
    ]
)


def _track_gaps_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_good, gap_open = state.get if state.exists else (None, None)
    closed: list[tuple[str, int, int, int]] = []
    # One global sort over the whole group for this trigger: the group's
    # rows arrive as multiple Arrow chunks in arbitrary order (one per
    # upstream partition). Cross-trigger disorder is the caller's concern
    # (watermark + sorted sources); within a trigger we establish order.
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        merged = pd.concat(chunks).sort_values("epoch")
        for epoch, value in zip(merged["epoch"], merged["value"]):
            epoch = int(epoch)
            if value == 0.0:  # the producer's gap sentinel (ST7)
                if gap_open is None:
                    gap_open = epoch
            else:
                if gap_open is not None:
                    closed.append((key[0], gap_open, epoch, (epoch - gap_open) // 60))
                    gap_open = None
                last_good = epoch
    state.update((last_good, gap_open))
    if closed:
        yield pd.DataFrame(
            {
                "series": [c[0] for c in closed],
                "gap_start": [pd.Timestamp(c[1], unit="s") for c in closed],
                "gap_end": [pd.Timestamp(c[2], unit="s") for c in closed],
                "n_missing": [c[3] for c in closed],
            }
        )


def track_series_gaps(
    ticks: DataFrame,
    series_col: str = "series",
    time_col: str = "time",
    value_col: str = "data",
) -> DataFrame:
    """Streaming gap detector over (series, time, value) tick streams.

    Emits (series, gap_start, gap_end, n_missing) whenever a run of 0.0
    sentinels closes. Grouped per series key → state shards across
    executors; the pandas path is Arrow-batched.
    """
    prepared = ticks.select(
        F.col(series_col).alias("series"),
        F.col(time_col).cast("long").alias("epoch"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("series").applyInPandasWithState(
        _track_gaps_fn,
        outputStructType=GAP_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Streaming KMV output: live distinct-count estimate per group.
KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType(), False),
        T.StructField("est_distinct", T.DoubleType(), False),
        T.StructField("n_kept", T.IntegerType(), False),
    ]
)

#: State: the k smallest (hash, value) pairs seen so far. Keeping the
#: raw value alongside its hash makes the kept set a multiset of hashes
#: keyed by distinct VALUES — exactly what the batch operator ranks
#: after its distinct-(group, value) pass — so two distinct values that
#: collide to one 32-bit hash occupy two slots in both engines and the
#: drained-stream == batch equality holds even under collisions.
KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("kept_hv", T.ArrayType(T.LongType()), True),
        T.StructField("kept_val", T.ArrayType(T.StringType()), True),
    ]
)

_KMV_HASH_SPACE = float(1 << 32)


def _kmv_round2(x: float) -> float:
    """HALF_UP rounding to 2 places, matching Spark's ``F.round`` (which
    goes through BigDecimal HALF_UP) rather than Python's builtin
    ``round`` (banker's half-even — diverges on .xx5 midpoints)."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _kmv_fn_factory(k: int):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hvs, vals = state.get
            seen = set(zip(hvs, vals))
        else:
            seen = set()
        for pdf in batches:
            for hv, val in zip(pdf["hv"], pdf["v"]):
                seen.add((int(hv), str(val)))
        # Same order as the batch window (ORDER BY _hv, value): ties on
        # hash break on the value, so the retained k are identical.
        kept = sorted(seen)[:k]
        state.update(([hv for hv, _ in kept], [v for _, v in kept]))
        if len(kept) < k:
            est = float(len(kept))
        else:
            est = _kmv_round2((k - 1) * _KMV_HASH_SPACE / kept[-1][0])
        yield pd.DataFrame(
            {"g": [key[0]], "est_distinct": [est], "n_kept": [len(kept)]}
        )

    return fn


def kmv_stream(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Live per-group distinct-count estimates over an unbounded stream.

    The batch KMV (llm/sketches.py) as a stateful streaming operator:
    state per group is the k smallest md5 value-hashes — BOUNDED
    (k longs) no matter how many events flow, which is the whole reason
    a stream can afford it (exact streaming count-distinct needs
    unbounded state). Each trigger min-merges the batch's hashes into
    the sketch (KMV union = k-smallest of the union — associative,
    commutative, idempotent: late or replayed data cannot corrupt it)
    and emits the group's refreshed estimate. Same estimator arithmetic
    as the batch operator, so a drained stream converges to the batch
    answer exactly (asserted in tests/test_streaming_sketch.py).
    """
    hv = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ).alias("hv")
    prepared = stream.select(
        F.col(group_col).cast("string").alias("g"),
        hv,
        F.col(value_col).cast("string").alias("v"),
    )
    return prepared.groupBy("g").applyInPandasWithState(
        _kmv_fn_factory(k),
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_counts(
    stream: DataFrame,
    event_time: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: gap-bounded session windows per key with
    per-session event counts and value sums."""
    return (
        stream.withWatermark(event_time, watermark)
        .groupBy(F.session_window(event_time, gap), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
