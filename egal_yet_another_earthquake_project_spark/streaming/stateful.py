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
