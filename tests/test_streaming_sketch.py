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
