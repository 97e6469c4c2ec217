"""Streaming end-to-end curation: the daily crawl drop flows through
every gate incrementally — the composed streaming twin of
``curate.curate_corpus`` (VERDICT r6 #4).

The batch job re-reads the whole corpus per run; at 100 TB the corpus
is append-only and only the DROP should cost work. Each stage here is
the already-tested streaming/incremental operator, composed as a
three-hop medallion pipeline over one source directory — the same
multi-hop shape as the reference's NiFi ingest→transform→index chain
(`sparktoELKstream.py:130-144`), re-expressed as checkpointed Spark
file-to-file streams:

    {out}/admitted   hop 1  gates + optional benchmark decontamination
                            (zero-state overlap-fraction flags) +
                            exact-dup gate (stream_new_docs: corpus-fp
                            anti-join + watermark dedup)
    {out}/scored     hop 2  near-dup drop (incremental vs corpus and
                            kept-so-far; LSH + connected components
                            within the batch) + frozen-LM scoring
    {out}/shards     hop 3  incremental packing (pack_sequences_append
                            continuing each source's token stream)

Each hop has its OWN checkpoint, so a restart resumes exactly where
that hop stopped, and its own idempotence story:

* hop 1 is an append file sink — the sink's ``_spark_metadata`` commit
  log makes replayed batches invisible to downstream readers;
* hops 2–3 write ``_batch_id``-partitioned parquet with DYNAMIC
  partition overwrite, and every read of "state so far" filters to
  ``_batch_id < current`` — a replayed batch overwrites its own
  partition and never sees its own partial output as history (the
  same replay contract as ``silver_with_quarantine``).

Cross-batch memory lives in the hops' OUTPUT directories (the kept
fingerprints, texts, and pack offsets already written), never in
unbounded streaming state: the only streaming state anywhere is hop 1's
watermark-bounded fingerprint dedup. Per-drop work is O(drop) plus
index-shaped joins against the corpus side — the corpus is never
re-signed or re-packed.

Incremental semantics (the standard trade, same as
``pack_sequences_append``): within one micro-batch the near-dup policy
is EXACTLY the batch job's (LSH pairs → connected components → min-id
survivor), so a drop that drains in a single batch reproduces
``curate_corpus`` bit-for-bit (asserted in tests). Across batches,
earlier-arrived survivors win against later arrivals — a global re-run
could pick a different (equally valid) survivor set, which is the
price of never rescanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from egal_yet_another_earthquake_project_spark.llm import clusters as lcl
from egal_yet_another_earthquake_project_spark.llm import dedup as ldd
from egal_yet_another_earthquake_project_spark.llm import packing as lpack
from egal_yet_another_earthquake_project_spark.llm import text as ltx
from egal_yet_another_earthquake_project_spark.streaming.ingest import (
    stream_new_docs,
)


def _read_prior(spark: SparkSession, path: str, batch_id: int) -> DataFrame | None:
    """Rows this pipeline already committed BEFORE ``batch_id`` — the
    replay guard: a recovered batch must not count its own partial
    output as history. None when the hop has produced nothing yet."""
    try:
        return spark.read.parquet(path).filter(F.col("_batch_id") < batch_id)
    except Exception:
        return None


def _admit_hop(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    corpus: DataFrame | None,
    out_dir: str,
    checkpoint_dir: str,
    *,
    min_quality: float,
    lang: str | None,
    eval_docs: DataFrame | None,
    contamination_threshold: float,
    id_col: str,
    source_col: str,
    text_col: str,
    event_time: str,
    watermark: str,
    max_files_per_trigger: int | None,
):
    """Hop 1: quality/language gates (stateless Catalyst filters), the
    optional benchmark-decontamination gate (``stream_contamination_
    flags`` — per-row array arithmetic vs the broadcast eval shingle
    set, zero state, mirroring the batch job's ``decontaminate``
    stage), + the exact-duplicate gate (``stream_new_docs``:
    corpus-fingerprint anti-join, then watermark-bounded in-stream fp
    dedup)."""
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    incoming = reader.load(source_dir)

    gated = ltx.text_profile(incoming, text_col).filter(
        F.col("quality") >= min_quality
    )
    if lang is not None:
        gated = gated.filter(F.col("lang_guess") == lang)
    gated = gated.select(id_col, source_col, text_col, event_time, "quality")

    if eval_docs is not None:
        from egal_yet_another_earthquake_project_spark.streaming.ingest import (
            stream_contamination_flags,
        )

        gated = (
            stream_contamination_flags(
                gated,
                eval_docs,
                text_col=text_col,
                dirty_threshold=contamination_threshold,
            )
            .filter(~F.col("dirty"))
            .drop("n_shingles", "n_hits", "contamination", "dirty")
        )

    if corpus is not None:
        fps = corpus.select(
            ltx.fingerprint(text_col).alias("fp")
        ).distinct()
    else:
        fps = spark.createDataFrame([], "fp string")
    admitted = stream_new_docs(
        gated, fps, text_col=text_col, event_time=event_time, watermark=watermark
    )
    return (
        admitted.writeStream.format("parquet")
        .option("path", f"{out_dir}/admitted")
        .option("checkpointLocation", f"{checkpoint_dir}/admit")
        .outputMode("append")
    )


_ADMITTED_FIELDS = "{id} {idt}, {src} string, {txt} string, {et} timestamp, quality double, fp string"


def _score_hop(
    spark: SparkSession,
    corpus: DataFrame | None,
    model: dict | None,
    out_dir: str,
    checkpoint_dir: str,
    *,
    jaccard_threshold: float,
    id_col: str,
    id_type: str,
    source_col: str,
    text_col: str,
    event_time: str,
):
    """Hop 2: near-duplicate DROP + frozen-LM scoring, per micro-batch.

    Within the batch: the batch job's exact policy — LSH pairs →
    connected components → min-id survivor (a single-batch drain is
    therefore ``curate_corpus`` verbatim). Against history: one
    ``incremental_neardup_pairs`` join vs corpus ∪ kept-so-far — the
    incoming side is batch-sized, the existing side is an index-shaped
    scan, never batch×batch or corpus×corpus."""
    admitted_schema = _ADMITTED_FIELDS.format(
        id=id_col, idt=id_type, src=source_col, txt=text_col, et=event_time
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(admitted_schema)
        .load(f"{out_dir}/admitted")
    )

    def _score(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(id_col, source_col, text_col, "quality").persist()
        try:
            # within-batch: the batch job's policy, verbatim
            pairs = ldd.minhash_lsh_dedup_pairs(
                batch, id_col, text_col, verify_threshold=jaccard_threshold
            )
            comp = lcl.connected_components(pairs, "doc_a", "doc_b")
            losers = comp.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias(id_col)
            )
            kept = batch.join(losers, id_col, "left_anti")

            # vs history: corpus ∪ batches already committed by THIS hop
            prior = _read_prior(spark, f"{out_dir}/scored", batch_id)
            existing = corpus.select(id_col, text_col) if corpus is not None else None
            if prior is not None:
                prior = prior.select(id_col, text_col)
                existing = (
                    prior if existing is None else existing.unionByName(prior)
                )
            if existing is not None:
                hits = ldd.incremental_neardup_pairs(
                    kept,
                    existing,
                    id_col,
                    text_col,
                    verify_threshold=jaccard_threshold,
                ).select(F.col("doc_a").alias(id_col)).distinct()
                kept = kept.join(hits, id_col, "left_anti")

            if model is not None:
                from egal_yet_another_earthquake_project_spark.llm.lm import (
                    score_bigram_frozen,
                )

                scores = score_bigram_frozen(kept, model, id_col, text_col)
                kept = kept.join(scores, id_col, "left")
            else:
                kept = kept.withColumn(
                    "n_bigrams", F.lit(None).cast("long")
                ).withColumn("nll", F.lit(None).cast("double"))

            (
                kept.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{out_dir}/scored")
            )
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", f"{checkpoint_dir}/score")
    )


def _pack_hop(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    *,
    ctx: int,
    id_col: str,
    id_type: str,
    source_col: str,
    text_col: str,
):
    """Hop 3: incremental packing. Tails are DERIVED from the shards
    already written (max start_tok + n_tokens per source, one tiny row
    per group) — the pack state is the output itself, so there is
    nothing extra to checkpoint and a restart recomputes it exactly."""
    scored_schema = (
        f"{id_col} {id_type}, {source_col} string, {text_col} string, "
        "quality double, n_bigrams long, nll double, _batch_id long"
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(scored_schema)
        .load(f"{out_dir}/scored")
        .drop("_batch_id")  # hop 2's replay key; hop 3 stamps its own
    )

    def _pack(batch: DataFrame, batch_id: int) -> None:
        prior = _read_prior(spark, f"{out_dir}/shards", batch_id)
        if prior is not None:
            tails = prior.groupBy(source_col).agg(
                F.max(F.col("start_tok") + F.col("n_tokens")).alias("tail_tok")
            )
        else:
            tails = spark.createDataFrame(
                [], f"{source_col} string, tail_tok long"
            )
        packed = lpack.pack_sequences_append(
            batch, tails, id_col, source_col, text_col, ctx=ctx
        )
        out = batch.join(packed.drop(source_col), id_col)
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .repartitionByRange(source_col, "pack_id")
            .sortWithinPartitions(source_col, "pack_id", "start_tok")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id", source_col)
            .parquet(f"{out_dir}/shards")
        )

    return (
        stream.writeStream.foreachBatch(_pack)
        .option("checkpointLocation", f"{checkpoint_dir}/pack")
    )


def curate_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    corpus: DataFrame | None,
    out_dir: str,
    checkpoint_dir: str,
    model: dict | None = None,
    *,
    min_quality: float = 0.5,
    lang: str | None = "en",
    eval_docs: DataFrame | None = None,
    contamination_threshold: float = 0.2,
    jaccard_threshold: float = 0.8,
    ctx: int = 256,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    event_time: str = "ingest_ts",
    watermark: str = "1 hour",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> list[StreamingQuery]:
    """Start the three hops as concurrent streaming queries (continuous
    mode: each hop's file source picks up the previous hop's commits
    trigger by trigger). Returns the queries in pipeline order; callers
    own their lifecycle. For a finite drop use :func:`drain_curate_stream`
    — ``availableNow`` pins each hop to the files present when it
    starts, so concurrent availableNow hops would race their upstream.

    ``corpus`` is the trusted existing corpus (``id, source, text``) the
    drop is gated against; None means bootstrap-from-empty. ``model`` is
    a ``train_bigram_lm``/``read_lm_model`` dict; None skips scoring
    (nll columns are null)."""
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in schema.fields
    )[id_col]
    hops = _build_hops(
        spark, source_dir, schema, corpus, out_dir, checkpoint_dir, model,
        min_quality=min_quality, lang=lang, eval_docs=eval_docs,
        contamination_threshold=contamination_threshold,
        jaccard_threshold=jaccard_threshold, ctx=ctx, id_col=id_col,
        id_type=id_type, source_col=source_col, text_col=text_col,
        event_time=event_time, watermark=watermark,
        max_files_per_trigger=max_files_per_trigger,
    )
    started = []
    for writer in hops:
        if available_now:
            writer = writer.trigger(availableNow=True)
        started.append(writer.start())
    return started


def _build_hops(
    spark, source_dir, schema, corpus, out_dir, checkpoint_dir, model, **kw
):
    import os

    # a downstream hop's file source must be able to resolve its input
    # directory before the upstream hop has committed anything
    for hop_dir in ("admitted", "scored"):
        os.makedirs(f"{out_dir}/{hop_dir}", exist_ok=True)
    admit = _admit_hop(
        spark, source_dir, schema, corpus, out_dir, checkpoint_dir,
        min_quality=kw["min_quality"], lang=kw["lang"],
        eval_docs=kw["eval_docs"],
        contamination_threshold=kw["contamination_threshold"],
        id_col=kw["id_col"], source_col=kw["source_col"],
        text_col=kw["text_col"], event_time=kw["event_time"],
        watermark=kw["watermark"],
        max_files_per_trigger=kw["max_files_per_trigger"],
    )
    score = _score_hop(
        spark, corpus, model, out_dir, checkpoint_dir,
        jaccard_threshold=kw["jaccard_threshold"], id_col=kw["id_col"],
        id_type=kw["id_type"], source_col=kw["source_col"],
        text_col=kw["text_col"], event_time=kw["event_time"],
    )
    pack = _pack_hop(
        spark, out_dir, checkpoint_dir,
        ctx=kw["ctx"], id_col=kw["id_col"], id_type=kw["id_type"],
        source_col=kw["source_col"], text_col=kw["text_col"],
    )
    return [admit, score, pack]


def drain_curate_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    corpus: DataFrame | None,
    out_dir: str,
    checkpoint_dir: str,
    model: dict | None = None,
    **kw,
) -> dict:
    """Drain a finite drop through all three hops: each hop runs with
    ``availableNow`` and terminates before the next starts (a hop's
    availableNow snapshot must include its upstream's full output).
    Restart-safe — every hop resumes from its own checkpoint. Returns
    per-hop row counts for the job log."""
    kw.setdefault("min_quality", 0.5)
    kw.setdefault("lang", "en")
    kw.setdefault("eval_docs", None)
    kw.setdefault("contamination_threshold", 0.2)
    kw.setdefault("jaccard_threshold", 0.8)
    kw.setdefault("ctx", 256)
    kw.setdefault("id_col", "doc_id")
    kw.setdefault("source_col", "source")
    kw.setdefault("text_col", "text")
    kw.setdefault("event_time", "ingest_ts")
    kw.setdefault("watermark", "1 hour")
    kw.setdefault("max_files_per_trigger", None)
    kw["id_type"] = dict(
        (f.name, f.dataType.simpleString()) for f in schema.fields
    )[kw["id_col"]]
    hops = _build_hops(
        spark, source_dir, schema, corpus, out_dir, checkpoint_dir, model, **kw
    )
    for writer in hops:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    stats = {}
    for name in ("admitted", "scored", "shards"):
        try:
            stats[name] = spark.read.parquet(f"{out_dir}/{name}").count()
        except Exception:
            stats[name] = 0
    return stats
