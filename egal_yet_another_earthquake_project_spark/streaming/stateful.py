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


#: Streaming z-score output: one row per anomalous event (append mode).
ZSCORE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("z", T.DoubleType(), False),
    ]
)

#: State: the last ``lookback`` values per key, in (ts, event_id) order —
#: bounded by construction (lookback doubles), like the KMV sketch above.
ZSCORE_STATE_SCHEMA = T.StructType(
    [T.StructField("vals", T.ArrayType(T.DoubleType()), True)]
)


def _round_half_up(x: float, quantum: str) -> float:
    """HALF_UP rounding matching Spark's ``F.round`` on doubles (which
    goes through ``BigDecimal.valueOf(double)`` — i.e. the shortest
    decimal repr, same as Python's ``repr`` — then HALF_UP setScale),
    rather than Python's builtin banker's rounding."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(quantum), rounding=decimal.ROUND_HALF_UP
        )
    )


def _zscore_fn_factory(lookback: int, min_points: int, threshold: float):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        vals: list[float] = list(state.get[0]) if state.exists else []
        out: list[tuple[int, float, float]] = []
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            # Establish the batch window's frame order within the trigger;
            # cross-trigger order is the feed's contract (time-ordered
            # micro-batches), as with every trailing-window stream.
            merged = pd.concat(chunks).sort_values(["ts", "event_id"])
            for eid, v in zip(merged["event_id"], merged["value"]):
                v = float(v)
                n = len(vals)
                if n >= min_points:
                    # Mean as Spark's Average (sequential sum / count) and
                    # variance via Welford updates in frame order — the
                    # exact arithmetic of CentralMomentAgg/stddev_samp, so
                    # the streamed z is bit-identical to the batch window's
                    # and the drained==batch assertion cannot flake on ulps.
                    mu = sum(vals) / n
                    avg = 0.0
                    m2 = 0.0
                    for i, x in enumerate(vals, 1):
                        d = x - avg
                        avg += d / i
                        m2 += d * (x - avg)
                    sd = (m2 / (n - 1)) ** 0.5
                    if sd > 1e-9:
                        z = (v - mu) / sd
                        if abs(z) >= threshold:
                            out.append((int(eid), v, _round_half_up(z, "0.0001")))
                vals.append(v)
                if len(vals) > lookback:
                    vals = vals[-lookback:]
        state.update((vals,))
        if out:
            yield pd.DataFrame(
                {
                    "event_id": [o[0] for o in out],
                    "user_id": [int(key[0])] * len(out),
                    "value": [o[1] for o in out],
                    "z": [o[2] for o in out],
                }
            )

    return fn


def zscore_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    lookback: int = 20,
    min_points: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Live per-key trailing-window anomaly detection — the streaming twin
    of :func:`operators.series.trailing_zscore`.

    State per key is the last ``lookback`` values only (bounded doubles,
    never the history), so a million keys shard across executors with
    O(lookback) memory each. Each trigger scores its rows against the
    rolling window exactly as the batch window frame does (frame excludes
    the current row; same mean/Welford-variance arithmetic), emitting
    only threshold crossings in append mode. A drained time-ordered
    stream equals the batch operator's output row-for-row
    (tests/test_stateful_streaming.py).

    Null values are dropped at the door: the batch window would keep a
    null-valued row as a frame SLOT (its value ignored by avg/count)
    while bounded per-key state cannot afford placeholder slots, so on
    null-bearing inputs the two twins diverge by design — the stream
    scores against the last ``lookback`` non-null values.
    """
    stream = stream.filter(F.col(value_col).isNotNull())
    prepared = stream.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _zscore_fn_factory(lookback, min_points, threshold),
        outputStructType=ZSCORE_OUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
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


#: Streaming HLL output: live distinct-count estimate per group.
HLL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType(), False),
        T.StructField("est_distinct", T.DoubleType(), False),
        T.StructField("present", T.IntegerType(), False),
    ]
)

#: State: the group's non-zero HLL registers as parallel (bucket, M)
#: arrays — at most 2^p entries, bounded by construction like the KMV
#: sketch above. Max-merge is associative/commutative/idempotent, so
#: replayed or late data cannot corrupt the sketch.
HLL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.IntegerType()), True),
        T.StructField("ranks", T.ArrayType(T.IntegerType()), True),
    ]
)


def _hll_fn_factory(p: int):
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(1 << 40)  # same Python double as the batch lit
    two_k = 1 << 40

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        regs: dict[int, int] = {}
        if state.exists:
            bks, rks = state.get
            regs = dict(zip(bks, rks))
        for pdf in batches:
            for b, r in zip(pdf["bucket"], pdf["rho"]):
                b, r = int(b), int(r)
                if r > regs.get(b, 0):
                    regs[b] = r
        items = sorted(regs.items())
        state.update(([b for b, _ in items], [r for _, r in items]))
        present = len(regs)
        # Identical arithmetic to the batch hll_estimate: exact-integer
        # harmonic fold, one double division, linear counting below 2.5m.
        t = sum(1 << (40 - r) for r in regs.values()) + (m - present) * two_k
        v = m - present
        e_raw = num / float(t)
        if e_raw <= 2.5 * m and v > 0:
            import math

            est = float(m) * math.log(float(m) / float(v))
        else:
            est = e_raw
        yield pd.DataFrame(
            {
                "g": [key[0]],
                "est_distinct": [_round_half_up(est, "0.01")],
                "present": [present],
            }
        )

    return fn


def hll_stream(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Live per-group HLL distinct estimates over an unbounded stream.

    The batch HLL (llm/sketches.py) as a stateful streaming operator:
    (bucket, ρ) is computed JVM-side by the same `hll_rho` column math
    the batch path uses, so the Python state fn only max-merges integers
    — state is the ≤ 2^p non-zero registers, bounded no matter how many
    events flow. Drained-stream == batch equality is exact because both
    sides share the hash family, the register fold, and the estimator's
    integer arithmetic (asserted in tests/test_streaming_sketch.py).
    """
    from egal_yet_another_earthquake_project_spark.llm.sketches import hll_rho

    bucket, rho = hll_rho(F.col(value_col).cast("string"), p)
    prepared = stream.select(
        F.col(group_col).cast("string").alias("g"), bucket, rho
    )
    return prepared.groupBy("g").applyInPandasWithState(
        _hll_fn_factory(p),
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Streaming funnel output: each user's current stage after a trigger.
FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("stage", T.IntegerType(), False),
    ]
)

#: State: the three stage timestamps as epoch-micros (−1 = not reached)
#: — 3 longs per user, bounded by construction.
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tv", T.LongType(), True),
        T.StructField("tc", T.LongType(), True),
        T.StructField("tp", T.LongType(), True),
    ]
)


def _funnel_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    tv, tc, tp = state.get if state.exists else (-1, -1, -1)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        merged = pd.concat(chunks).sort_values(["ts", "event_id"])
        for et, ts in zip(merged["event_type"], merged["ts"]):
            us = int(ts.value // 1000)  # pandas ns → µs
            if et == "view" and tv < 0:
                tv = us
            elif et == "click" and tc < 0 and tv >= 0 and us > tv:
                tc = us
            elif et == "purchase" and tp < 0 and tc >= 0 and us > tc:
                tp = us
    state.update((tv, tc, tp))
    stage = 3 if tp >= 0 else 2 if tc >= 0 else 1 if tv >= 0 else 0
    yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})


def funnel_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Live per-user funnel stage (view=1 → click=2 → purchase=3) over
    an events stream — the streaming twin of the batch
    ``funnel_conversion`` window chain.

    State per user is THREE epoch-micros longs (first view, first
    qualifying click, first qualifying purchase) — bounded regardless of
    event volume, which is what makes a funnel over an unbounded stream
    affordable. Stage timestamps only ever latch forward, so under a
    time-ordered feed (every trailing-window stream's contract here, cf.
    ``zscore_stream``) the drained stream's per-user stages equal the
    batch funnel's exactly (asserted in tests/test_stateful_streaming.py).
    Update mode: one row per active user per trigger; the downstream
    conversion rollup is a plain batch aggregate over the latest rows.
    """
    prepared = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("event_type"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("next_type", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

#: State per user: the last seen event (epoch-micros ts, event_id, type)
#: — one row of bounded state regardless of stream volume.
TRANSITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType(), True),
        T.StructField("last_eid", T.LongType(), True),
        T.StructField("last_type", T.StringType(), True),
    ]
)


def _transition_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_ts, last_eid, last_type = (
        state.get if state.exists else (None, None, None)
    )
    pairs: dict[tuple[str, str], int] = {}
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        merged = pd.concat(chunks).sort_values(["ts", "event_id"])
        for et, ts, eid in zip(
            merged["event_type"], merged["ts"], merged["event_id"]
        ):
            if last_type is not None:
                k = (last_type, et)
                pairs[k] = pairs.get(k, 0) + 1
            last_ts, last_eid, last_type = int(ts.value // 1000), int(eid), et
    state.update((last_ts, last_eid, last_type))
    if pairs:
        yield pd.DataFrame(
            {
                "event_type": [k[0] for k in pairs],
                "next_type": [k[1] for k in pairs],
                "n": list(pairs.values()),
            }
        )


def transition_stream(stream: DataFrame) -> DataFrame:
    """Per-user Markov transition DELTAS over an events stream — the
    streaming twin of the batch ``event_transitions`` matrix
    (workloads_ext.q_event_transitions).

    State per user is the single last-seen event (ts, id, type); each
    trigger sorts its arrivals, chains them onto the remembered tail,
    and APPENDS the within-group transition pair counts observed this
    trigger. The global matrix is then a plain rolling aggregate over
    the appended deltas (``SUM(n) GROUP BY event_type, next_type``) —
    counts are additive, so drained deltas aggregate to exactly the
    batch matrix under the time-ordered feed contract shared by
    ``funnel_stream``/``zscore_stream`` (asserted drained≡batch in
    tests/test_stateful_streaming.py). Bounded state, append mode, no
    watermark needed: deltas are emitted once and never retracted.
    """
    prepared = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("event_type"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _transition_fn,
        outputStructType=TRANSITION_OUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transition_stream_tws(stream: DataFrame) -> DataFrame:
    """``transition_stream`` on Spark 4's transformWithState API — the
    successor to applyInPandasWithState (SPARK-49564): typed named state
    (ValueState/ListState/MapState), per-key timers, and state TTL,
    backed by the same RocksDB-checkpointed store.

    Identical semantics to :func:`transition_stream` (one last-seen-event
    ValueState row per user; append-mode additive deltas; drained deltas
    roll up to the batch matrix — asserted drained≡batch in
    tests/test_stateful_streaming.py wherever the runtime supports the
    API). Kept alongside the v1 operator so the engine exercises both
    stateful APIs; new operators should prefer this one — a production
    tracker can attach ``ttlDurationMs`` to the state so dormant users
    age out of the store without a manual timer loop, which the v1 API
    cannot express.

    Environment gate (same class as the Kafka broker): the
    transformWithState state-server protocol needs ``google.protobuf``
    on the Python workers; containers without it get an ImportError at
    query start, and the drained-equality test skips itself. The v1
    twin (:func:`transition_stream`) has no such dependency and is the
    one exercised everywhere.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TransitionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState(
                "last", "last_ts long, last_eid long, last_type string"
            )

        def handleInputRows(self, key, rows, timer_values):
            last_ts, last_eid, last_type = (
                self._last.get() if self._last.exists() else (None, None, None)
            )
            pairs: dict[tuple[str, str], int] = {}
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                merged = pd.concat(chunks).sort_values(["ts", "event_id"])
                for et, ts, eid in zip(
                    merged["event_type"], merged["ts"], merged["event_id"]
                ):
                    if last_type is not None:
                        k = (last_type, et)
                        pairs[k] = pairs.get(k, 0) + 1
                    last_ts, last_eid, last_type = (
                        int(ts.value // 1000),
                        int(eid),
                        et,
                    )
            self._last.update((last_ts, last_eid, last_type))
            if pairs:
                yield pd.DataFrame(
                    {
                        "event_type": [k[0] for k in pairs],
                        "next_type": [k[1] for k in pairs],
                        "n": list(pairs.values()),
                    }
                )

        def close(self) -> None:
            pass

    prepared = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("event_type"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        _TransitionProcessor(),
        outputStructType=TRANSITION_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


#: Streaming drift output: the per-source KL row, refreshed per trigger.
DRIFT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("n_topk_tokens", T.LongType(), False),
        T.StructField("kl", T.DoubleType(), False),
    ]
)

#: State: per-source counts aligned to the FROZEN top-K vocabulary order
#: — bounded at K longs per source regardless of stream volume.
DRIFT_STATE_SCHEMA = T.StructType(
    [T.StructField("counts", T.ArrayType(T.LongType()), True)]
)


def _drift_fn_factory(vocab: list[str], ref_cnt: list[int]):
    import math

    nk = float(sum(ref_cnt))
    kk = float(len(vocab))
    idx = {t: i for i, t in enumerate(vocab)}

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        counts = list(state.get[0]) if state.exists else [0] * len(vocab)
        for pdf in batches:
            # null tok = the per-document presence sentinel (see
            # drift_stream): it forces the group to exist but carries no
            # count; value_counts drops it (dropna), and any token that
            # somehow bypassed the vocab filter is ignored rather than
            # KeyError-ing the stream.
            for tok, n in pdf["tok"].value_counts().items():
                if tok in idx:
                    counts[idx[tok]] += int(n)
        state.update((counts,))
        ns = sum(counts)
        kl = 0.0
        # fold in frozen-vocab order — deterministic sum order, and the
        # same full-grid smoothing as the batch fold (a missing head
        # token contributes its c=0 term; p and q each sum to 1)
        for j, cnt in enumerate(ref_cnt):
            p = (counts[j] + 1.0) / (ns + kk)
            q = (cnt + 1.0) / (nk + kk)
            kl += p * math.log(p / q)
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "n_topk_tokens": [ns],
                "kl": [round(kl, 4)],
            }
        )

    return fn


def drift_stream(
    stream: DataFrame, vocab_ref: list[tuple[str, int]]
) -> DataFrame:
    """Per-crawl-drop distribution-drift monitor: the streaming twin of
    the batch ``source_drift`` query (workloads_corpus.source_drift_kl).

    ``vocab_ref`` is the FROZEN reference: the top-K corpus tokens with
    their reference counts, computed once from the trusted corpus (the
    thing new crawl drops are compared against) and closed over as plan
    literals — at K=50 that is a trivially broadcastable constant, so
    the stream never recomputes a corpus-wide vocabulary. Each trigger:
    tokenize (stateless), FILTER to the frozen vocabulary before the
    shuffle (the mass reduction — off-vocab tokens never leave the map
    side), then per-source ``applyInPandasWithState`` merges the batch's
    token counts into the bounded K-long state vector and emits the
    source's refreshed add-one-smoothed KL against the reference
    (update mode: last row per source is current). Merging counts is
    associative and commutative, so a drained stream lands on the batch
    fold exactly (asserted drained≡batch in
    tests/test_stateful_streaming.py — same grid smoothing, same
    round(·,4)).

    The vocab filter alone would make a FULLY drifted source invisible
    — a batch whose tokens are all off-vocab (wrong language, template
    spam: the monitor's headline case) leaves no rows, so no group, no
    state, no KL row, while the batch query's #sources × K grid emits a
    near-max-KL row for it. So one null-token PRESENCE SENTINEL per
    document rides past the filter (one row per doc — noise next to the
    token stream): it forces the source's group to exist every trigger
    it appears in, contributes zero counts, and the c=0 grid terms then
    price the divergence exactly as the batch fold does. A source of
    EMPTY documents registers the same way, matching the batch grid's
    ``docs.select("source").distinct()``.
    """
    from egal_yet_another_earthquake_project_spark.llm import text as ltx

    vocab = [t for t, _ in vocab_ref]
    ref_cnt = [int(c) for _, c in vocab_ref]
    toks = (
        ltx.tokenized(stream)
        .select(
            F.col("source").cast("string").alias("source"),
            F.explode("_toks").alias("tok"),
        )
        .filter(F.col("tok").isin(vocab))
        .unionByName(
            stream.select(
                F.col("source").cast("string").alias("source"),
                F.lit(None).cast("string").alias("tok"),
            )
        )
    )
    return toks.groupBy("source").applyInPandasWithState(
        _drift_fn_factory(vocab, ref_cnt),
        outputStructType=DRIFT_OUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
