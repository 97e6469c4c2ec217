"""Streaming count-min sketch: the same `cms_build` plan runs as an
incremental streaming aggregation — state is the d·w bucket table
(bounded by construction, the whole point of the sketch), and the
streamed result over N micro-batches must equal the batch sketch over
the union (mergeability in action)."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import sketches as lsk
from egal_yet_another_earthquake_project_spark.llm import text as ltx
from egal_yet_another_earthquake_project_spark.sources.files import stream_parquet_dir

DEPTH, WIDTH = 4, 256


def _tokens(df):
    return ltx.tokenized(df).select(F.explode("_toks").alias("tok"))


def test_streaming_cms_equals_batch_sketch(spark, tmp_path: Path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    src = tmp_path / "stream_in"
    ckpt = str(tmp_path / "ck")
    b1.write.parquet(str(src / "batch1"))

    stream = stream_parquet_dir(spark, str(src) + "/*", docs.schema)
    sketch_stream = lsk.cms_build(_tokens(stream), "tok", DEPTH, WIDTH)
    q = (
        sketch_stream.writeStream.format("memory")
        .queryName("cms_live")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        b2.write.parquet(str(src / "batch2"))
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r.j, r.bucket): r.cnt for r in spark.table("cms_live").collect()
    }
    batch = {
        (r.j, r.bucket): r.cnt
        for r in lsk.cms_build(_tokens(docs), "tok", DEPTH, WIDTH).collect()
    }
    assert streamed == batch
    # bounded state: never more rows than the sketch geometry allows
    assert len(streamed) <= DEPTH * WIDTH
    shutil.rmtree(src, ignore_errors=True)


def test_streaming_kmv_converges_to_batch(spark, tmp_path: Path):
    """Drained streaming KMV == batch KMV: the k-min merge is associative,
    so feeding the events table in two micro-batches must land on the
    batch estimator's numbers exactly (update mode: last row per group
    wins)."""
    from egal_yet_another_earthquake_project_spark.streaming.stateful import kmv_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    src = tmp_path / "kmv_in"
    events.filter(F.col("user_id") % 2 == 0).write.parquet(str(src / "b1"))

    stream = stream_parquet_dir(spark, str(src) + "/*", events.schema)
    q = (
        kmv_stream(stream, "event_type", "user_id", k=32)
        .writeStream.format("memory")
        .queryName("kmv_live")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "kmv_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        events.filter(F.col("user_id") % 2 == 1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode appends one row per group per trigger; keep the last.
    live = {}
    for r in spark.table("kmv_live").collect():
        live[r.g] = r.est_distinct

    from egal_yet_another_earthquake_project_spark.llm import sketches as lsk

    batch = {
        r.event_type: r.est_distinct
        for r in lsk.kmv_distinct(events, ["event_type"], "user_id", k=32).collect()
    }
    assert live == batch


class _FakeState:
    """Minimal GroupState stand-in for driving the KMV merge fn directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_kmv_state_is_hash_multiset_under_collisions():
    """Two distinct VALUES colliding to one 32-bit hash must occupy two
    sketch slots (the batch operator dedups raw values, so its ranked
    hash column is a multiset) — a hash-set state would silently drop
    one and overestimate. Driven directly with crafted hashes, since md5
    collisions can't be produced on demand."""
    import pandas as pd

    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        _KMV_HASH_SPACE,
        _kmv_fn_factory,
        _kmv_round2,
    )

    fn = _kmv_fn_factory(2)
    state = _FakeState()
    pdf = pd.DataFrame({"hv": [10, 10, 50], "v": ["a", "b", "c"]})
    (out,) = fn(("g1",), iter([pdf]), state)
    # multiset: kept = [(10,'a'), (10,'b')] -> k-th smallest hash is 10,
    # not 50 as a set-of-hashes state would report.
    assert out["est_distinct"][0] == _kmv_round2(1 * _KMV_HASH_SPACE / 10)
    # replay/merge idempotence: same batch again changes nothing.
    (out2,) = fn(("g1",), iter([pdf]), state)
    assert out2["est_distinct"][0] == out["est_distinct"][0]
    assert state.get == ([10, 10], ["a", "b"])


def test_kmv_round_matches_spark_half_up(spark):
    """The streaming estimator's rounding must match F.round (BigDecimal
    HALF_UP) on .xx5 midpoints where Python's builtin round (half-even)
    diverges."""
    from egal_yet_another_earthquake_project_spark.streaming.stateful import (
        _kmv_round2,
    )

    cases = [2.675, 0.125, 1.005, 2.665, 7.865, 1234.565, 0.005]
    rows = spark.createDataFrame(
        [(x,) for x in cases], "x double"
    ).select(F.round("x", 2).alias("r")).collect()
    for x, row in zip(cases, rows):
        assert _kmv_round2(x) == row.r, x


def test_streaming_hll_converges_to_batch(spark, tmp_path: Path):
    """Drained streaming HLL == batch HLL: per-bucket max-merge is
    associative/idempotent, and both sides share the hash family and the
    exact-integer estimator, so two micro-batches must land on the batch
    numbers exactly."""
    from egal_yet_another_earthquake_project_spark.streaming.stateful import hll_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "event_id"
    )
    src = tmp_path / "hll_in"
    events.filter(F.col("event_id") % 2 == 0).write.parquet(str(src / "b1"))

    stream = stream_parquet_dir(spark, str(src) + "/*", events.schema)
    q = (
        hll_stream(stream, "event_type", "event_id", p=8)
        .writeStream.format("memory")
        .queryName("hll_live")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        events.filter(F.col("event_id") % 2 == 1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    live = {}
    n_present = {}
    for r in spark.table("hll_live").collect():
        live[r.g] = r.est_distinct
        n_present[r.g] = r.present

    batch = {
        r.event_type: r.est_distinct
        for r in lsk.hll_distinct(events, ["event_type"], "event_id", p=8).collect()
    }
    assert live == batch
    # bounded state: register count never exceeds the sketch geometry
    assert all(n <= 256 for n in n_present.values())
