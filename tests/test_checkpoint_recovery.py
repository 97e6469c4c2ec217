"""Checkpoint recovery: a stopped stream restarted with the same
checkpoint resumes exactly-once — no re-archived rows, dedup state intact
across the restart (the property the reference's relaunch-every-minute
cron treatment silently relied on Spark to provide)."""

from __future__ import annotations

from pathlib import Path

from egal_yet_another_earthquake_project_spark.schemas import KAFKA_ENVELOPE
from egal_yet_another_earthquake_project_spark.sources.files import stream_parquet_dir
from egal_yet_another_earthquake_project_spark.streaming.bronze import archive_stream
from egal_yet_another_earthquake_project_spark.streaming.silver import (
    dedup_stream,
    parsed_stream,
)
from egal_yet_another_earthquake_project_spark.testing import fixtures


def _write_batch(spark, payloads, path: Path):
    spark.createDataFrame(
        fixtures.kafka_envelopes(payloads), KAFKA_ENVELOPE
    ).coalesce(1).write.parquet(str(path))


def test_archive_resumes_exactly_once(spark, tmp_path: Path):
    events1 = fixtures.earthquake_events(n=10, seed=1)
    events2 = fixtures.earthquake_events(n=10, seed=2)
    src = tmp_path / "in"
    _write_batch(spark, events1, src / "b1")

    out, ckpt = str(tmp_path / "archive"), str(tmp_path / "ck")
    q1 = archive_stream(stream_parquet_dir(spark, str(src / "*"), KAFKA_ENVELOPE), out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    n_first = spark.read.parquet(out).count()
    assert n_first == len(events1)

    # new data lands while the stream is DOWN; restart from the checkpoint
    _write_batch(spark, events2, src / "b2")
    q2 = archive_stream(stream_parquet_dir(spark, str(src / "*"), KAFKA_ENVELOPE), out, ckpt)
    q2.processAllAvailable()
    q2.stop()

    archived = spark.read.parquet(out)
    assert archived.count() == len(events1) + len(events2)  # no replays, no loss
    payloads = {bytes(r.value).decode() for r in archived.collect()}
    import json

    expected = {json.dumps(e, ensure_ascii=False) for e in events1 + events2}
    assert payloads == expected


def test_dedup_state_survives_restart(spark, tmp_path: Path):
    """An eventID seen before the restart must still be recognized as a
    duplicate after it — the dropDuplicatesWithinWatermark state store is
    restored from the checkpoint."""
    e = fixtures.earthquake_events(n=1, dup_rate=0.0, update_rate=0.0, bad_date_rate=0.0)[0]
    src = tmp_path / "in"
    out = str(tmp_path / "silver")
    _write_batch(spark, [e], src / "b1")

    def run_silver():
        # parquet sink: the memory sink refuses checkpoint recovery
        stream = stream_parquet_dir(spark, str(src / "*"), KAFKA_ENVELOPE)
        silver = dedup_stream(parsed_stream(stream))
        return (
            silver.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )

    q1 = run_silver()
    q1.processAllAvailable()
    q1.stop()
    assert spark.read.parquet(out).count() == 1

    # the SAME event re-arrives after the restart (overlapping poll)
    _write_batch(spark, [e], src / "b2")
    q2 = run_silver()
    q2.processAllAvailable()
    q2.stop()
    # restored state must suppress the replayed id: still exactly one row
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1, rows
    assert rows[0].eventID == int(e["eventID"])


def _restart_sketch_roundtrip(spark, tmp_path, build_query, queryname):
    """Drive a stateful sketch stream through a kill-and-restart: batch 1
    → drain → STOP (query object discarded), batch 2 lands while the
    stream is down → a NEW query from the SAME checkpoint drains it.
    Sink is foreachBatch→parquet (the memory sink is not fault-tolerant
    and refuses checkpoint recovery). Returns (events, rows) where rows
    carry a batch_id for last-write-wins ordering."""
    from pyspark.sql import functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    src = tmp_path / "in"
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    events.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def sink(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    def start():
        stream = stream_parquet_dir(spark, str(src) + "/*", events.schema)
        return (
            build_query(stream)
            .writeStream.foreachBatch(sink)
            .queryName(queryname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # killed between micro-batches

    events.filter(F.col("user_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "b2")
    )
    q2 = start()  # restarted from checkpoint — state store must restore
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = spark.read.parquet(out).orderBy("batch_id").collect()
    return events, rows


def test_kmv_stream_state_survives_restart(spark, tmp_path: Path):
    """applyInPandasWithState KMV: the (hash, value) multiset state must
    restore from the checkpoint so the post-restart drain lands on the
    batch estimator exactly (no double-merge, no state loss)."""
    from egal_yet_another_earthquake_project_spark.llm import sketches as lsk
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        kmv_stream,
    )

    events, rows = _restart_sketch_roundtrip(
        spark, tmp_path, lambda s: kmv_stream(s, "event_type", "user_id", k=32),
        "kmv_recover",
    )
    live = {}
    for r in rows:  # update mode: last row per group wins
        live[r.g] = r.est_distinct
    batch = {
        r.event_type: r.est_distinct
        for r in lsk.kmv_distinct(
            events, ["event_type"], "user_id", k=32
        ).collect()
    }
    assert live == batch and len(batch) > 0


def test_hll_stream_state_survives_restart(spark, tmp_path: Path):
    """applyInPandasWithState HLL: the register state must restore from
    the checkpoint so the post-restart drain equals the batch estimator."""
    from egal_yet_another_earthquake_project_spark.llm import sketches as lsk
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        hll_stream,
    )

    events, rows = _restart_sketch_roundtrip(
        spark, tmp_path, lambda s: hll_stream(s, "event_type", "event_id", p=8),
        "hll_recover",
    )
    live = {}
    for r in rows:
        live[r.g] = r.est_distinct
    batch = {
        r.event_type: r.est_distinct
        for r in lsk.hll_distinct(
            events, ["event_type"], "event_id", p=8
        ).collect()
    }
    assert live == batch and len(batch) > 0


def test_funnel_stream_state_survives_restart(spark, tmp_path: Path):
    """applyInPandasWithState funnel: per-user stage latches must restore
    from the checkpoint; a click whose view arrived before the restart
    must still advance the stage."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        funnel_stream,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("event_type", T.StringType(), False),
        ]
    )

    def _df(rows):
        return spark.createDataFrame(
            [(i, u, dt.datetime(2024, 1, 1, 0, m), et) for i, u, m, et in rows],
            schema,
        )

    src = tmp_path / "f_in"
    ckpt = str(tmp_path / "f_ck")
    out = str(tmp_path / "f_out")
    _df([(1, 7, 0, "view"), (2, 8, 1, "view")]).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def sink(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out
        )

    def start():
        stream = stream_parquet_dir(spark, str(src) + "/*", schema)
        return (
            funnel_stream(stream)
            .writeStream.foreachBatch(sink)
            .queryName("funnel_recover")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()

    # while down: user 7 clicks then purchases; user 8 does nothing more
    _df(
        [(3, 7, 2, "click"), (4, 7, 3, "purchase")]
    ).coalesce(1).write.parquet(str(src / "b2"))
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    live = {}
    for r in spark.read.parquet(out).orderBy("batch_id").collect():
        live[r.user_id] = r.stage
    assert live == {7: 3, 8: 1}


def test_transition_stream_state_survives_restart(spark, tmp_path: Path):
    """The per-user last-seen-event state must restore from the
    checkpoint: a transition whose first half arrived before the restart
    and second half after must be counted exactly once."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        transition_stream,
    )
    from egal_yet_another_earthquake_project_spark.workloads_ext import (
        q_event_transitions,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cut = events.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0].c
    src = tmp_path / "in"
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    events.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    def start():
        stream = stream_parquet_dir(spark, str(src) + "/*", events.schema)
        return (
            transition_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()
    events.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b2")
    )
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rolled = {
        (r.event_type, r.next_type): r.total
        for r in spark.read.parquet(out)
        .groupBy("event_type", "next_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    batch = {
        (r.event_type, r.next_type): r.n
        for r in q_event_transitions(spark, "/root/testdata/sf0.001").collect()
    }
    assert rolled == batch and len(batch) > 0


def test_drift_stream_state_survives_restart(spark, tmp_path: Path):
    """The KL-drift monitor's per-source count vector must restore from
    the checkpoint: batch 1 → drain → STOP, batch 2 lands while the
    stream is down, a NEW query from the SAME checkpoint drains it —
    the final per-source KL must equal the batch source_drift fold over
    ALL documents (state loss would under-count batch-1 tokens; replay
    would double-count them)."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm import text as ltx
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        drift_stream,
    )
    from egal_yet_another_earthquake_project_spark.workloads_corpus import (
        DRIFT_TOPK,
        source_drift_kl,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    vocab_ref = [
        (r.tok, r.cnt)
        for r in ltx.tokenized(docs)
        .select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(DRIFT_TOPK)
        .collect()
    ]

    src = tmp_path / "in"
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def sink(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out
        )

    def start():
        stream = stream_parquet_dir(spark, str(src) + "/*", docs.schema)
        return (
            drift_stream(stream, vocab_ref)
            .writeStream.foreachBatch(sink)
            .queryName("drift_recover")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # killed between micro-batches

    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "b2")
    )
    q2 = start()  # state vector must restore, not reset or double
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    live = {}
    for r in spark.read.parquet(out).orderBy("batch_id").collect():
        live[r.source] = (r.n_topk_tokens, r.kl)  # last batch wins
    batch = {
        r.source: (r.n_topk_tokens, r.kl)
        for r in source_drift_kl(docs).collect()
    }
    assert live == batch and len(batch) > 0


def test_zscore_stream_state_survives_restart(spark, tmp_path: Path):
    """applyInPandasWithState trailing z-score: the per-key rolling
    window (last `lookback` values) must restore from the checkpoint so
    the post-restart drain emits exactly the batch operator's anomaly
    rows — a lost window would mis-score every early post-restart event."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.operators.series import (
        trailing_zscore,
    )
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        zscore_stream,
    )

    events = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "value"
    )
    cut = events.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0].c
    src, ckpt, out = tmp_path / "in", str(tmp_path / "ck"), str(tmp_path / "out")
    events.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )

    kw = dict(lookback=20, min_points=10, threshold=2.0)

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    def start():
        stream = stream_parquet_dir(
            spark, str(src) + "/*", events.schema, max_files_per_trigger=1
        )
        return (
            zscore_stream(stream, **kw)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # killed; later half lands while the stream is down
    events.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b2")
    )
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    streamed = {
        (r.event_id, r.user_id, r.value, r.z)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.event_id, r.user_id, r.value, r.z)
        for r in trailing_zscore(events, **kw).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_gap_tracker_state_survives_restart(spark, tmp_path: Path):
    """applyInPandasWithState gap tracker: a 0.0 run still OPEN when the
    stream dies must close correctly after restart — the open-gap state
    (start epoch + run length) restores from the checkpoint."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        track_series_gaps,
    )

    def _minute(i):
        return f"2024-01-01 00:{i:02d}:00"

    TICKS = "series string, time timestamp, data double"
    # b1: gap at 3-4 closes at 5 (emitted pre-kill); 6-7 run still open
    b1 = [("el", _minute(i), 0.0 if i in (3, 4, 6, 7) else 1.0) for i in range(8)]
    b2 = [("el", _minute(8), 2.5)]  # closes the open gap AFTER restart
    src, ckpt, out = tmp_path / "ticks", str(tmp_path / "ck"), str(tmp_path / "out")
    spark.createDataFrame(
        b1, "series string, time string, data double"
    ).withColumn("time", F.to_timestamp("time")).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    def start():
        stream = stream_parquet_dir(
            spark, str(src) + "/*", TICKS, max_files_per_trigger=1
        )
        return (
            track_series_gaps(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()
    spark.createDataFrame(
        b2, "series string, time string, data double"
    ).withColumn("time", F.to_timestamp("time")).coalesce(1).write.parquet(
        str(src / "b2")
    )
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(
        (r.series, r.gap_start.strftime("%M"), r.gap_end.strftime("%M"), r.n_missing)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [("el", "03", "05", 2), ("el", "06", "08", 2)], got


def test_session_window_state_survives_restart(spark, tmp_path: Path):
    """Built-in session_window aggregation: a session OPEN across the
    kill must come back as ONE session after restart (events 10 minutes
    apart on both sides of the restart merge; a later event starts a
    fresh session). foreachBatch complete-mode sink: the last batch's
    snapshot is the final state."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.schemas import EVENTS
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        session_counts,
    )

    def rows_df(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))

    b1 = [(1, "2024-01-01 00:00:00", 7, "click", 1.0, None)]
    b2 = [
        (2, "2024-01-01 00:10:00", 7, "click", 2.0, None),  # same session
        (3, "2024-01-01 02:00:00", 7, "view", 4.0, None),  # new session
    ]
    src, ckpt, out = tmp_path / "in", str(tmp_path / "ck"), str(tmp_path / "out")
    rows_df(b1).coalesce(1).write.parquet(str(src / "b1"))

    def sink(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    def start():
        stream = stream_parquet_dir(
            spark, str(src) + "/*", EVENTS, max_files_per_trigger=1
        )
        return (
            session_counts(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()
    rows_df(b2).coalesce(1).write.parquet(str(src / "b2"))
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    all_rows = spark.read.parquet(out)
    last = all_rows.agg(F.max("batch_id").alias("m")).first().m
    got = sorted(
        (r.user_id, r.session_window.start.strftime("%H:%M"), r.n, r.total_value)
        for r in all_rows.filter(F.col("batch_id") == last).collect()
    )
    assert got == [(7, "00:00", 2, 3.0), (7, "02:00", 1, 4.0)], got
