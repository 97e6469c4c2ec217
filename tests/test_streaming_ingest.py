"""Streaming ingestion gate: drained stream == batch gate, exactly.

The stream-static anti-join + in-stream fingerprint dedup must admit
the same doc set as llm.dedup.incremental_new_docs on the same split —
the property that lets a pipeline switch between nightly batch and
continuous streaming ingestion without changing what lands in the
corpus.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import dedup as ldd
from egal_yet_another_earthquake_project_spark.llm.text import fingerprint
from egal_yet_another_earthquake_project_spark.sources.files import (
    stream_parquet_dir,
)
from egal_yet_another_earthquake_project_spark.streaming.ingest import (
    stream_new_docs,
)


def test_stream_gate_matches_batch_gate(spark, tmp_path: Path):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "ALPHA beta   gamma", "2024-01-01 10:00:00"),  # corpus dup
            (11, "eta theta iota", "2024-01-01 10:01:00"),      # new
            (12, "eta theta iota", "2024-01-01 10:02:00"),      # in-stream dup
            (13, "kappa lambda mu", "2024-01-01 10:03:00"),     # new
        ],
        "doc_id long, text string, ingest_ts string",
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))

    src = tmp_path / "in"
    incoming.write.parquet(str(src))
    stream = stream_parquet_dir(spark, str(src), incoming.schema)

    fps = corpus.select(fingerprint("text").alias("fp")).distinct()
    gated = stream_new_docs(stream, fps)
    q = (
        gated.writeStream.format("memory")
        .queryName("ingest_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed_rows = spark.table("ingest_out").collect()
    batch_rows = ldd.incremental_new_docs(
        incoming.drop("ingest_ts"), corpus, "doc_id"
    ).withColumn("fp", fingerprint("text")).collect()
    # The gate contract is one representative per NEW fingerprint. WHICH
    # dup representative survives differs by engine mode: the batch gate
    # picks min-id deterministically, the stream keeps whichever arrives
    # first within the micro-batch (partition-order-dependent for rows
    # landing in one trigger) — so compare the admitted CONTENT set, not
    # the winner ids.
    assert sorted(r.fp for r in streamed_rows) == sorted(r.fp for r in batch_rows)
    streamed_ids = sorted(r.doc_id for r in streamed_rows)
    assert streamed_ids[0] in (11, 12) and streamed_ids[1:] == [13]
    # admitted rows carry fp so the sink can extend the seen-set index
    assert "fp" in spark.table("ingest_out").columns
