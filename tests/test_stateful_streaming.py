"""Custom stateful operator tests: gap tracking across micro-batches and
streaming session windows."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from egal_yet_another_earthquake_project_spark.sources.files import stream_parquet_dir
from egal_yet_another_earthquake_project_spark.streaming.stateful import (
    session_counts,
    track_series_gaps,
)

TICKS = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("data", T.DoubleType(), False),
    ]
)


def _minute(i: int) -> str:
    return f"2024-01-01 00:{i:02d}:00"


def test_track_series_gaps_across_batches(spark, tmp_path: Path):
    """A 0.0 run that closes in a LATER micro-batch must still be emitted —
    i.e. the open-gap state survives batch boundaries."""
    batch1 = [("el", _minute(i), 1.0 if i not in (3, 4) else 0.0) for i in range(6)]
    batch2 = [("el", _minute(6), 0.0), ("el", _minute(7), 0.0)]
    batch3 = [("el", _minute(8), 2.5)]

    src = tmp_path / "ticks"
    # one file per logical batch so each maxFilesPerTrigger=1 trigger sees
    # exactly one in-order batch (cross-trigger event-time disorder is out
    # of scope for the tracker — see stateful.py docstring)
    spark.createDataFrame(batch1, "series string, time string, data double").withColumn(
        "time", F.to_timestamp("time")
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = stream_parquet_dir(spark, str(src / "*"), TICKS, max_files_per_trigger=1)
    gaps = track_series_gaps(stream)
    q = (
        gaps.writeStream.format("memory")
        .queryName("gaps_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()

    for name, rows in (("b2", batch2), ("b3", batch3)):
        spark.createDataFrame(
            rows, "series string, time string, data double"
        ).withColumn("time", F.to_timestamp("time")).coalesce(1).write.parquet(
            str(src / name)
        )
        q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.series, r.gap_start.strftime("%M"), r.gap_end.strftime("%M"), r.n_missing)
        for r in spark.sql("SELECT * FROM gaps_out").collect()
    )
    # gap 1: minutes 3-4, closed by minute 5 (within batch 1)
    # gap 2: minutes 6-7 (batch 2), closed by minute 8 (batch 3)
    assert got == [("el", "03", "05", 2), ("el", "06", "08", 2)], got


def test_session_counts_stream(spark, tmp_path: Path):
    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0, None),
        (2, "2024-01-01 00:10:00", 7, "click", 2.0, None),  # same session
        (3, "2024-01-01 02:00:00", 7, "view", 4.0, None),   # new session
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = tmp_path / "in"
    df.write.parquet(str(src))

    from egal_yet_another_earthquake_project_spark.schemas import EVENTS

    stream = stream_parquet_dir(spark, str(src), EVENTS)
    agg = session_counts(stream)
    # session-window aggregations reject update mode; complete works for
    # the finite test feed.
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.user_id, r.session_window.start.strftime("%H:%M"), r.n, r.total_value)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    assert got == [(7, "00:00", 2, 3.0), (7, "02:00", 1, 4.0)], got


def test_streaming_zscore_equals_batch(spark, tmp_path: Path):
    """A drained, time-ordered stream of events through zscore_stream must
    emit exactly the batch trailing_zscore rows: same frame order, same
    mean/Welford-variance arithmetic, same HALF_UP rounding."""
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
    cut = events.agg(
        F.percentile_approx("ts", 0.5).alias("c")
    ).collect()[0].c

    src = tmp_path / "z_in"
    events.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )

    kw = dict(lookback=20, min_points=10, threshold=2.0)
    stream = stream_parquet_dir(
        spark, str(src) + "/*", events.schema, max_files_per_trigger=1
    )
    q = (
        zscore_stream(stream, **kw)
        .writeStream.format("memory")
        .queryName("z_live")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "z_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        events.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r.event_id, r.user_id, r.value, r.z)
        for r in spark.table("z_live").collect()
    }
    batch = {
        (r.event_id, r.user_id, r.value, r.z)
        for r in trailing_zscore(events, **kw).collect()
    }
    assert streamed == batch
    assert len(batch) > 0  # the fixture must actually exercise the path


def test_streaming_funnel_equals_batch(spark, tmp_path: Path):
    """Drained time-ordered stream through funnel_stream == the batch
    funnel's per-user stages (stage timestamps only latch forward, so
    two ts-split micro-batches must land on the window chain's
    answer)."""
    from pyspark.sql.window import Window

    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        funnel_stream,
    )

    events = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cut = events.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0].c

    src = tmp_path / "f_in"
    events.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = stream_parquet_dir(
        spark, str(src) + "/*", events.schema, max_files_per_trigger=1
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_live")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "f_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        events.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode: last row per user wins.
    live_rows = spark.table("funnel_live").collect()
    live: dict = {}
    for r in live_rows:  # memory sink appends in trigger order
        live[r.user_id] = r.stage

    # batch reference: the q_funnel_conversion window chain, per user.
    w = Window.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    with_v = events.withColumn("_tv", tv)
    tc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("_tv")),
            F.col("ts"),
        )
    ).over(w)
    with_c = with_v.withColumn("_tc", tc)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("_tc")),
            F.col("ts"),
        )
    ).over(w)
    staged = with_c.withColumn("_tp", tp)
    batch = {
        r.user_id: (3 if r.p else 2 if r.c else 1 if r.v else 0)
        for r in staged.groupBy("user_id")
        .agg(
            F.max(F.col("_tv").isNotNull()).alias("v"),
            F.max(F.col("_tc").isNotNull()).alias("c"),
            F.max(F.col("_tp").isNotNull()).alias("p"),
        )
        .collect()
    }
    assert live == batch


def test_streaming_transitions_equal_batch(spark, tmp_path: Path):
    """Drained transition deltas, summed, == the batch event_transitions
    matrix (counts are additive per (cur, next) pair; the per-user tail
    state chains micro-batches, so a transition that straddles the batch
    split must still be counted exactly once)."""
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        transition_stream,
    )
    from egal_yet_another_earthquake_project_spark.workloads_ext import (
        q_event_transitions,
    )

    events = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cut = events.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0].c

    src = tmp_path / "t_in"
    events.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = stream_parquet_dir(
        spark, str(src) + "/*", events.schema, max_files_per_trigger=1
    )
    q = (
        transition_stream(stream)
        .writeStream.format("memory")
        .queryName("trans_live")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "t_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        events.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rolled = {
        (r.event_type, r.next_type): r.total
        for r in spark.table("trans_live")
        .groupBy("event_type", "next_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    batch = {
        (r.event_type, r.next_type): r.n
        for r in q_event_transitions(spark, "/root/testdata/sf0.001").collect()
    }
    assert rolled == batch
    assert len(batch) > 0


def test_transform_with_state_transitions_equal_batch(spark, tmp_path: Path):
    """The transformWithState (Spark 4 API) twin must drain to the same
    matrix as the batch query — same harness as the v1 twin. Skips where
    the runtime lacks google.protobuf (the state-server protocol dep),
    mirroring the broker gate on the Kafka tests.

    Unskip probe (2026-08, round 6): (a) google.protobuf is absent from
    site-packages (importlib.util.find_spec("google") -> None); (b) the
    sandbox has no package index — `pip download protobuf --no-deps`
    fails with "No matching distribution found" (and installs are
    disallowed here regardless); (c) pyspark 4.1.2 ships only JVM-side
    protobuf jars (netty/orc shaded) and pyspark.sql.protobuf bindings —
    no Python runtime to vendor from; (d) re-implementing the protobuf
    wire runtime to satisfy pyspark/sql/streaming/proto/*_pb2 is out of
    scope by any measure. The applyInPandasWithState v1 twin above runs
    the identical drained≡batch harness unskipped, so the capability is
    tested; this remains evidence polish blocked on the environment."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState state server needs protobuf",
    )
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        transition_stream_tws,
    )
    from egal_yet_another_earthquake_project_spark.workloads_ext import (
        q_event_transitions,
    )

    events = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cut = events.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0].c

    src = tmp_path / "tw_in"
    events.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = stream_parquet_dir(
        spark, str(src) + "/*", events.schema, max_files_per_trigger=1
    )
    q = (
        transition_stream_tws(stream)
        .writeStream.format("memory")
        .queryName("trans_tws_live")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tw_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        events.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rolled = {
        (r.event_type, r.next_type): r.total
        for r in spark.table("trans_tws_live")
        .groupBy("event_type", "next_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    batch = {
        (r.event_type, r.next_type): r.n
        for r in q_event_transitions(spark, "/root/testdata/sf0.001").collect()
    }
    assert rolled == batch and len(batch) > 0


def test_drift_stream_drained_equals_batch(spark, tmp_path: Path):
    """Drained per-source KL drift == the batch source_drift query, row
    for row (source, n_topk_tokens, kl). The frozen reference vocabulary
    is the full-corpus top-50 (what a production monitor snapshots from
    the trusted corpus); count-merging is associative+commutative so the
    split point can't matter — docs are split in half across two
    triggers and the LAST emitted row per source (update mode; counts
    only grow, so max n_topk_tokens identifies it) must equal the batch
    fold exactly, including the grid smoothing terms for head tokens a
    source never produced."""
    from pyspark.sql.window import Window

    from egal_yet_another_earthquake_project_spark.llm import text as ltx
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from egal_yet_another_earthquake_project_spark.streaming.stateful import drift_stream
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

    cut = docs.agg(F.percentile_approx("doc_id", 0.5).alias("c")).collect()[0].c
    src = tmp_path / "d_in"
    docs.filter(F.col("doc_id") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = stream_parquet_dir(
        spark, str(src) + "/*", docs.schema, max_files_per_trigger=1
    )
    q = (
        drift_stream(stream, vocab_ref)
        .writeStream.format("memory")
        .queryName("drift_live")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "d_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        docs.filter(F.col("doc_id") >= F.lit(cut)).coalesce(1).write.parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    w = Window.partitionBy("source").orderBy(F.col("n_topk_tokens").desc())
    live = {
        (r.source, r.n_topk_tokens): r.kl
        for r in spark.table("drift_live")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    batch = {
        (r.source, r.n_topk_tokens): r.kl
        for r in source_drift_kl(docs).collect()
    }
    assert live == batch and len(batch) > 0


def test_drift_stream_sees_fully_offvocab_source(spark, tmp_path: Path):
    """ADVICE r6: a source whose tokens are ENTIRELY off the frozen
    vocabulary (wrong language / template spam — the monitor's headline
    case) must still emit its near-max-KL row: the presence sentinel
    carries the source past the vocab filter, and the c=0 grid terms
    price it exactly like the batch query's #sources × K grid. An
    empty-document source must register too (batch grid counts distinct
    sources over docs, not tokens)."""
    from egal_yet_another_earthquake_project_spark.llm import text as ltx
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        drift_stream,
    )
    from egal_yet_another_earthquake_project_spark.workloads_corpus import (
        DRIFT_TOPK,
        source_drift_kl,
    )

    base = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", "text"
    )
    # frozen reference = trusted-corpus top-K (no alien sources in it)
    vocab_ref = [
        (r.tok, r.cnt)
        for r in ltx.tokenized(base)
        .select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(DRIFT_TOPK)
        .collect()
    ]
    vocab = {t for t, _ in vocab_ref}
    assert "zzqx" not in vocab and "zzqy" not in vocab

    alien = spark.createDataFrame(
        [
            (900001, "alien_spam", "zzqx zzqy zzqx zzqy zzqx"),
            (900002, "alien_spam", "zzqy zzqx zzqy"),
            (900003, "alien_empty", ""),
        ],
        "doc_id long, source string, text string",
    )
    drop = base.limit(40).unionByName(alien)

    src = tmp_path / "ov_in"
    drop.coalesce(1).write.parquet(str(src / "b1"))
    stream = stream_parquet_dir(
        spark, str(src) + "/*", drop.schema, max_files_per_trigger=1
    )
    q = (
        drift_stream(stream, vocab_ref)
        .writeStream.format("memory")
        .queryName("drift_offvocab")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ov_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    live = {
        r.source: (r.n_topk_tokens, r.kl)
        for r in spark.table("drift_offvocab").collect()
    }
    assert "alien_spam" in live and "alien_empty" in live
    assert live["alien_spam"][0] == 0 and live["alien_empty"][0] == 0

    # the zero-count KL must equal the batch grid's c=0-everywhere fold
    # against the SAME frozen reference
    import math

    nk = float(sum(c for _, c in vocab_ref))
    kk = float(len(vocab_ref))
    want = round(
        sum(
            (1.0 / kk) * math.log((1.0 / kk) / ((c + 1.0) / (nk + kk)))
            for _, c in vocab_ref
        ),
        4,
    )
    assert live["alien_spam"][1] == want == live["alien_empty"][1]
    assert want > 0.0  # Gibbs: a zero-overlap source is strictly drifted
    # (no ordering claim vs in-corpus sources: small-sample in-corpus
    # KLs can exceed the uniform ns=0 fold — what flags the alien source
    # is n_topk_tokens == 0 at nonzero volume, plus its KL)
    in_corpus = [v[1] for s, v in live.items() if not s.startswith("alien")]
    assert in_corpus
