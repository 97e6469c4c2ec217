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


def test_stream_neardup_flags_match_batch_gate(spark, tmp_path: Path):
    """Drained streaming near-dedup == the batch incremental gate on the
    same split: same signatures (per-row expression form), same band
    keys (shared band_struct_array), same verify arithmetic."""
    from egal_yet_another_earthquake_project_spark.streaming.ingest import (
        stream_neardup_flags,
    )

    def words(i: int) -> str:
        return " ".join(f"t{i}w{j}" for j in range(12))

    corpus = spark.createDataFrame(
        [(i, words(i)) for i in range(1, 6)], "doc_id long, text string"
    )
    ldd.write_band_index(corpus, "stream_band_index_test", "doc_id")
    incoming = spark.createDataFrame(
        [
            (101, words(1) + " extra", "2024-01-01 10:00:00"),  # near-dup of 1
            (102, words(99), "2024-01-01 10:01:00"),            # genuinely new
            (103, words(3), "2024-01-01 10:02:00"),             # exact dup of 3
        ],
        "doc_id long, text string, ingest_ts string",
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))

    src = tmp_path / "nd_in"
    incoming.filter(F.col("doc_id") != 103).write.parquet(str(src / "b1"))
    stream = stream_parquet_dir(spark, str(src) + "/*", incoming.schema)
    flags = stream_neardup_flags(
        stream,
        spark.table("stream_band_index_test"),
        corpus,
        verify_threshold=0.8,
    )
    q = (
        flags.writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nd_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        incoming.filter(F.col("doc_id") == 103).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()
        spark.sql("DROP TABLE IF EXISTS stream_band_index_test")

    streamed = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.table("neardup_out").collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ldd.incremental_neardup_pairs(
            incoming.drop("ingest_ts"), corpus, "doc_id", verify_threshold=0.8
        ).collect()
    }
    assert streamed == batch
    assert {(a, b) for a, b, _ in streamed} == {(101, 1), (103, 3)}


def test_stream_contamination_flags_match_batch_scorer(spark, tmp_path: Path):
    """Drained streaming decontamination == llm.dedup.
    contamination_fraction row-for-row: the stream form gets the same
    distinct-shingle counts from per-row array arithmetic (zero
    streaming state), so the split into micro-batches cannot matter."""
    from egal_yet_another_earthquake_project_spark.llm.dedup import (
        contamination_fraction,
    )
    from egal_yet_another_earthquake_project_spark.streaming.ingest import (
        stream_contamination_flags,
    )

    eval_docs = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),    # exact copy
            (2, "alpha beta gamma north south east west"),  # partial reuse
            (3, "red green blue yellow purple orange"),     # disjoint
        ],
        "doc_id long, text string",
    )

    src = tmp_path / "ct_in"
    incoming.filter(F.col("doc_id") < 3).write.parquet(str(src / "b1"))
    stream = stream_parquet_dir(spark, str(src) + "/*", incoming.schema)
    flags = stream_contamination_flags(stream, eval_docs, dirty_threshold=0.5)
    q = (
        flags.writeStream.format("memory")
        .queryName("contamination_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ct_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        incoming.filter(F.col("doc_id") == 3).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    live = {
        (r.doc_id, r.n_shingles, r.n_hits, r.contamination, r.dirty)
        for r in spark.table("contamination_out").collect()
    }
    batch = {
        (r.doc, r.n_shingles, r.n_hits, r.contamination, r.dirty)
        for r in contamination_fraction(
            incoming, eval_docs, "doc_id", dirty_threshold=0.5
        ).collect()
    }
    assert live == batch and len(batch) == 3
    assert any(r[4] for r in live) and any(not r[4] for r in live)


def test_stream_contamination_rejects_oversized_eval_set(spark):
    """VERDICT r7 #7: "benchmarks are small" is now a pinned number —
    an eval frame whose distinct shingle count exceeds the cap must
    fail the stream BUILD with a clear error, not broadcast-explode at
    runtime. Exercised with a tiny cap so the test stays cheap."""
    import pytest

    from egal_yet_another_earthquake_project_spark.streaming.ingest import (
        stream_contamination_flags,
    )

    eval_docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta number {i} of many") for i in range(20)],
        "doc_id long, text string",
    )
    incoming = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS string) AS text"
    )
    with pytest.raises(ValueError, match="max_eval_shingles"):
        stream_contamination_flags(
            incoming, eval_docs, max_eval_shingles=10
        )
    # under the cap the build succeeds (plan only, nothing started)
    flagged = stream_contamination_flags(
        incoming, eval_docs, max_eval_shingles=10_000
    )
    assert "contamination" in flagged.columns


def test_stream_semantic_flags_full_probe_equals_exact_pairs(
    spark, tmp_path: Path
):
    """stream_semantic_flags with nprobe = num_cells (probe every cell)
    drained over a finite stream must equal the EXACT thresholded
    cosine pair set vs the corpus — the IVF routing only partitions the
    work, it must not change any verdict. A single-probe run is a
    subset (recall dial)."""
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        build_ivf_index,
        resolve_index_dir,
    )
    from egal_yet_another_earthquake_project_spark.llm.similarity import (
        _dots,
        unit,
    )
    from egal_yet_another_earthquake_project_spark.sources.files import (
        read_table,
    )
    from egal_yet_another_earthquake_project_spark.streaming.ingest import (
        stream_semantic_flags,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 3 != 0)
    stream_vecs = emb.filter(F.col("vec_id") % 3 == 0).limit(60)

    idx = str(tmp_path / "ivf")
    build_ivf_index(corpus, idx, num_cells=8)
    root = resolve_index_dir(idx)
    cents = spark.read.parquet(f"{root}/centroids")
    cells = spark.read.parquet(f"{root}/cells")

    src = tmp_path / "vec_in"
    stream_vecs.selectExpr(
        "vec_id", "embedding", "TIMESTAMP'2024-01-01' AS ingest_ts"
    ).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    incoming = spark.readStream.format("parquet").schema(schema).load(str(src))
    flags = stream_semantic_flags(
        incoming, cents, cells, cos_threshold=0.2, nprobe=8
    )
    q = (
        flags.writeStream.format("memory")
        .queryName("sem_flags")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_a, r.doc_b, r.cos)
        for r in spark.table("sem_flags").collect()
    }

    a = unit(
        stream_vecs.select(F.col("vec_id").alias("doc_a"), "embedding"),
        "embedding", "_ua",
    ).drop("embedding")
    b = unit(
        corpus.select(F.col("vec_id").alias("doc_b"), "embedding"),
        "embedding", "_ub",
    ).drop("embedding")
    want = {
        (r.doc_a, r.doc_b, r.cos)
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") != F.col("doc_b"))
        .withColumn("cos", F.round(_dots(F.col("_ua"), F.col("_ub")), 4))
        .filter(F.col("cos") >= 0.2)
        .collect()
    }
    assert got == want and len(want) > 0

    # single probe: strict subset semantics (never a false positive)
    flags1 = stream_semantic_flags(
        incoming, cents, cells, cos_threshold=0.2, nprobe=1
    )
    q1 = (
        flags1.writeStream.format("memory")
        .queryName("sem_flags1")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    got1 = {
        (r.doc_a, r.doc_b, r.cos)
        for r in spark.table("sem_flags1").collect()
    }
    assert got1 <= want
