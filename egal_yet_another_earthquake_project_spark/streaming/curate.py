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

    {out}/admitted        hop 1  gates + optional benchmark
                                 decontamination (zero-state
                                 overlap-fraction flags) + exact-dup
                                 gate (stream_new_docs: corpus-fp
                                 anti-join + watermark dedup)
    {out}/scored          hop 2  near-dup drop (incremental vs corpus
                                 and kept-so-far; LSH + connected
                                 components within the batch) +
                                 frozen-LM scoring
    {out}/bands           hop 2  the persisted LSH band INDEX of
                                 everything hop 2 has kept (plus the
                                 corpus bootstrap at ``_batch_id=-1``)
                                 — later batches join it instead of
                                 re-signing the corpus
    {out}/scored_commits  hop 2  one tiny ``batch-N.txt`` manifest per
                                 committed batch — hop 3's source
    {out}/shards          hop 3  incremental packing
                                 (pack_sequences_append continuing
                                 each source's token stream)

Each hop has its OWN checkpoint, so a restart resumes exactly where
that hop stopped, and its own idempotence story:

* hop 1 is an append file sink — the sink's ``_spark_metadata`` commit
  log makes replayed batches invisible to downstream readers;
* hops 2–3 write ``_batch_id``-partitioned parquet with DYNAMIC
  partition overwrite, and every read of "state so far" filters to
  ``_batch_id < current`` — a replayed batch overwrites its own
  partition and never sees its own partial output as history (the
  same replay contract as ``silver_with_quarantine``).

**Cross-hop exactly-once** (concurrent mode): hop 3 does NOT discover
hop 2's data files (a replayed hop-2 batch rewrites its partition with
NEW file names — raw discovery would double-ingest or read deleted
files). It streams the ``scored_commits`` manifests instead: one
deterministic ``batch-N.txt`` per hop-2 batch, created atomically
(create-temp + rename-no-overwrite) AFTER the batch's data and band
writes, and never rewritten on replay (``fsutil.write_text_once``). A
file-stream source tracks files by name, so hop 3 ingests each
upstream batch exactly once and reads its rows fresh from the
``_batch_id=N`` partition — which a replay repopulates with the same
logical rows (every hop-2 stage is deterministic). The residual race
is a replay REWRITING partition N while hop 3 happens to be scanning
it: that read fails and hop 3's checkpoint retries the batch — a
transient failure, never duplicate or missing rows.

Upgrade note: the manifest source was introduced with this design —
an out_dir produced by a pre-manifest build has scored batches with
no ``scored_commits`` entries and a pack checkpoint written for a
parquet source. Such pipelines must restart from a fresh
out_dir/checkpoint pair (or replay the source drops); resuming the
old pack checkpoint against the text source is undefined.

Cross-batch memory lives in the hops' OUTPUT directories (the kept
fingerprints, band index, texts, and pack offsets already written),
never in unbounded streaming state: the only streaming state anywhere
is hop 1's watermark-bounded fingerprint dedup. Per-drop work is
O(drop) plus index-shaped joins against the corpus side — the corpus
is SIGNED ONCE (the ``_batch_id=-1`` bootstrap partition of
``{out}/bands``, skipped when already present) and never re-signed:
each batch signs only itself and equi-joins the persisted index,
exactly the :func:`...llm.dedup.band_key_frame` production pattern
(asserted by tests/test_streaming_curate.py's signing spy). Corpus
TEXT is touched per batch only by the verify stage, which prunes to
candidate docs before tokenizing anything.

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

import math

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from egal_yet_another_earthquake_project_spark import fsutil
from egal_yet_another_earthquake_project_spark.llm import clusters as lcl
from egal_yet_another_earthquake_project_spark.llm import dedup as ldd
from egal_yet_another_earthquake_project_spark.llm import packing as lpack
from egal_yet_another_earthquake_project_spark.llm import text as ltx
from egal_yet_another_earthquake_project_spark.streaming.ingest import (
    stream_new_docs,
)

#: AnalysisException error classes that mean "this hop has produced
#: nothing yet" — the ONLY errors _read_prior converts to None. A
#: corrupt footer, permission blip, or any other transient failure
#: propagates and fails the micro-batch so the checkpoint retries it;
#: swallowing it would silently erase history (duplicate admissions,
#: overlapping pack offsets) instead of a visible, retryable error.
_NO_HISTORY = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def _read_prior(spark: SparkSession, path: str, batch_id: int) -> DataFrame | None:
    """Rows this pipeline already committed BEFORE ``batch_id`` — the
    replay guard: a recovered batch must not count its own partial
    output as history. None when the hop has produced nothing yet;
    any OTHER read error propagates (see ``_NO_HISTORY``)."""
    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        get_cls = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        cls = get_cls() if callable(get_cls) else None
        if cls in _NO_HISTORY or (
            cls is None
            and (
                "Path does not exist" in str(e)
                or "Unable to infer schema" in str(e)
            )
        ):
            return None
        raise
    return df.filter(F.col("_batch_id") < batch_id)


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
    vec_col: str | None = None,
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
    carry = [vec_col] if vec_col is not None else []
    gated = gated.select(
        id_col, source_col, text_col, event_time, "quality", *carry
    )

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
    semantic_index: str | None = None,
    vec_col: str | None = None,
    vec_type: str = "array<double>",
    semantic_cos_threshold: float = 0.95,
    semantic_nprobe: int = 4,
    nb_model: str | None = None,
    nb_keep_label: str = "en",
    lr_model: str | None = None,
    monitor: bool = False,
):
    """Hop 2: near-duplicate DROP + frozen-LM scoring, per micro-batch.

    With ``monitor=True`` each batch additionally lands its monitoring
    rows (VERDICT r10 'Next round' #6) — the tables a production
    pipeline alerts on, not print-scale progress events:

    * ``{out}/metrics/dq/_batch_id=N``  — the publish-gate expectation
      suite (non-null / unique ids, non-null text) over the batch's
      KEPT rows, one ``run_checks`` scan;
    * ``{out}/metrics/psi/_batch_id=N`` — PSI drift of the kept text-
      length distribution vs the FROZEN corpus reference (bin edges and
      the reference histogram computed ONCE at hop build and
      localCheckpointed — ≤bins rows — so monitoring never re-scans the
      corpus per drop; skipped when there is no corpus);
    * ``{out}/metrics/psi_lr/_batch_id=N`` — PSI drift of the LR gate's
      PRE-gate margin distribution vs the trusted corpus's margins
      under the frozen model (VERDICT r11 ask #6: a shifted margin
      distribution is the first symptom of corpus drift poisoning the
      gate; post-gate margins are censored at 0, so the pre-gate slice
      is monitored). Same frozen-at-build ≤bins reference; emitted only
      when BOTH ``monitor`` and ``lr_model`` are set.

    Both are replay-idempotent dynamic partition overwrites like every
    hop output, and both equal their batch-mode counterparts
    (``run_checks`` / ``psi_profile``) on the batch's scored partition
    — the aggregates are deterministic (drained≡batch test in
    tests/test_streaming_curate.py).

    The batch is SIGNED ONCE — one ``minhash_signatures`` pass whose
    band frame feeds all three consumers: the within-batch self-join
    (the batch job's exact policy — LSH pairs → connected components →
    min-id survivor, so a single-batch drain is ``curate_corpus``
    verbatim), the vs-history join (``incremental_neardup_pairs`` with
    BOTH band sides supplied: incoming = this batch's frame filtered to
    survivors, existing = the persisted ``{out}/bands`` index covering
    corpus ∪ every batch already committed), and the index append (the
    final survivors' bands become the next batch's history). The corpus
    is never re-signed — its bands were written once by the bootstrap;
    corpus text is read only by verify, pruned to candidate docs first.

    Every frame cached along the way is tracked in a per-batch registry
    and released in ``finally`` — a long-running stream must not
    accumulate cached blocks across triggers."""
    nb_frames = None
    if nb_model is not None:
        from egal_yet_another_earthquake_project_spark.llm.classify import (
            read_nb_model,
        )

        nb_frames = read_nb_model(spark, nb_model)
    lr_weights_frame = None
    if lr_model is not None:
        from egal_yet_another_earthquake_project_spark.llm.lr import (
            read_lr_model,
        )

        lr_weights_frame = read_lr_model(spark, lr_model)
    psi_frozen = None
    psi_lr_frozen = None
    if monitor and corpus is not None:
        from egal_yet_another_earthquake_project_spark.operators.stats import (
            psi_reference_hist,
            psi_reference_stats,
        )

        ref_len = corpus.select(
            F.length(F.col(text_col)).cast("double").alias("_mlen")
        )
        stats = psi_reference_stats(ref_len, "_mlen")
        hist = psi_reference_hist(
            ref_len, "_mlen", stats=stats
        ).localCheckpoint(eager=True)
        psi_frozen = (stats, hist)
        if lr_weights_frame is not None:
            # PSI on the LR gate's OWN margins (VERDICT r11 ask #6): a
            # shifted margin distribution is the first symptom of corpus
            # drift poisoning the gate, and nothing else watches the
            # classifier itself. Reference = the trusted corpus's margins
            # under the FROZEN model (the same distribution the gate was
            # validated against), binned once at hop build — ≤bins rows
            # localCheckpointed, never re-scored per drop.
            from egal_yet_another_earthquake_project_spark.llm.lr import (
                lr_scores,
            )

            ref_m = lr_scores(
                corpus.select(
                    F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"),
                ),
                lr_weights_frame,
            ).select(F.col("score").alias("_lrm"))
            lr_stats = psi_reference_stats(ref_m, "_lrm")
            lr_hist = psi_reference_hist(
                ref_m, "_lrm", stats=lr_stats
            ).localCheckpoint(eager=True)
            psi_lr_frozen = (lr_stats, lr_hist)
    admitted_schema = _ADMITTED_FIELDS.format(
        id=id_col, idt=id_type, src=source_col, txt=text_col, et=event_time
    )
    if vec_col is not None:
        admitted_schema += f", {vec_col} {vec_type}"
    stream = (
        spark.readStream.format("parquet")
        .schema(admitted_schema)
        .load(f"{out_dir}/admitted")
    )
    carry = [vec_col] if vec_col is not None else []

    def _score(batch: DataFrame, batch_id: int) -> None:
        reg: list[DataFrame] = []
        batch = batch.select(
            id_col, source_col, text_col, "quality", *carry
        ).persist()
        reg.append(batch)
        try:
            # ONE signing pass; the cached band frame feeds the self-join
            # (both sides), the history join, and the index append.
            batch_bands = ldd.band_key_frame(
                ldd.minhash_signatures(batch, id_col, text_col)
            ).persist()
            reg.append(batch_bands)
            batch_bands.count()

            # within-batch: the batch job's policy, verbatim
            pairs = ldd.verify_candidate_pairs(
                batch,
                ldd.band_pair_join(batch_bands),
                id_col,
                text_col,
                verify_threshold=jaccard_threshold,
                cache_registry=reg,
            )
            comp = lcl.connected_components(pairs, "doc_a", "doc_b")
            losers = comp.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias(id_col)
            )
            kept = batch.join(losers, id_col, "left_anti")

            # vs history: the persisted band index (corpus bootstrap at
            # _batch_id=-1 + batches already committed by THIS hop) —
            # an equi-join against an index scan, never a re-sign.
            prior_bands = _read_prior(spark, f"{out_dir}/bands", batch_id)
            prior = _read_prior(spark, f"{out_dir}/scored", batch_id)
            existing = corpus.select(id_col, text_col) if corpus is not None else None
            if prior is not None:
                prior = prior.select(id_col, text_col)
                existing = (
                    prior if existing is None else existing.unionByName(prior)
                )
            if existing is not None and prior_bands is not None:
                kept_bands = batch_bands.join(
                    kept.select(F.col(id_col).alias("doc")), "doc", "semi"
                )
                hits = ldd.incremental_neardup_pairs(
                    kept,
                    existing,
                    id_col,
                    text_col,
                    verify_threshold=jaccard_threshold,
                    existing_bands=prior_bands.select("doc", "band", "sig"),
                    incoming_bands=kept_bands,
                    cache_registry=reg,
                ).select(F.col("doc_a").alias(id_col)).distinct()
                kept = kept.join(hits, id_col, "left_anti")

            if semantic_index is not None:
                # SemDeDup gate vs the persisted IVF index (embedding
                # dups survive lexical dedup). Hit ids feed TWO
                # consumers (the accounting write and the anti-join) —
                # persist the tiny frame; the partitioned write is the
                # audit trail AND the drain report's accounting row,
                # replay-idempotent like every hop output here.
                from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                    semantic_gate_hits,
                )

                sem_hits = semantic_gate_hits(
                    spark,
                    semantic_index,
                    kept.select(id_col, vec_col),
                    cos_threshold=semantic_cos_threshold,
                    nprobe=semantic_nprobe,
                    id_col=id_col,
                    vec_col=vec_col,
                ).persist()
                reg.append(sem_hits)
                (
                    sem_hits.withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(f"{out_dir}/semantic_drops")
                )
                kept = kept.join(sem_hits, id_col, "left_anti")
            if vec_col is not None:
                # embeddings served their gate — scored/shards keep the
                # same schema with or without the semantic stage
                kept = kept.drop(vec_col)

            if nb_frames is not None:
                # Trained-classifier gate, last among the drop stages —
                # the same position as curate_corpus's nb_model gate
                # (after every dedup decision, so a per-document filter
                # cannot change which duplicate survived and drained
                # stays bit-identical to batch). Model frames are
                # materialized parquet loaded at hop BUILD (read_nb_model
                # refuses a marker-less dir before the stream starts).
                from egal_yet_another_earthquake_project_spark.llm.classify import (
                    nb_classify_with_model,
                )

                nb_w, nb_c = nb_frames
                nb_keep = (
                    nb_classify_with_model(
                        kept.select(
                            F.col(id_col).alias("doc_id"),
                            F.col(text_col).alias("text"),
                        ),
                        nb_w,
                        nb_c,
                    )
                    .where(F.col("pred_label") == nb_keep_label)
                    .select(F.col("doc_id").alias(id_col))
                )
                kept = kept.join(nb_keep, id_col, "left_semi")

            lr_margin_batch = None
            if lr_weights_frame is not None:
                # discriminative gate beside the generative one — same
                # after-all-dedup position (per-document filters AND,
                # so their order is immaterial and drained ≡ batch).
                # Scored (not classified) so the monitor can see the
                # PRE-gate margin distribution — post-gate margins are
                # censored at 0 and would hide exactly the drift the
                # PSI exists to catch.
                from egal_yet_another_earthquake_project_spark.llm.lr import (
                    lr_scores,
                )

                scored_lr = lr_scores(
                    kept.select(
                        F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("text"),
                    ),
                    lr_weights_frame,
                )
                if psi_lr_frozen is not None:
                    # two consumers (gate + monitor): persist per the
                    # multi-consumer caching rule, released in finally
                    scored_lr = scored_lr.persist()
                    reg.append(scored_lr)
                    lr_margin_batch = scored_lr.select(
                        F.col("score").alias("_lrm")
                    )
                lr_keep = scored_lr.where(F.col("score") >= 0).select(
                    F.col("doc_id").alias(id_col)
                )
                kept = kept.join(lr_keep, id_col, "left_semi")

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

            # kept feeds TWO writes (scored rows, index bands): persist at
            # the branch so components/verify run once, not per write.
            kept = kept.persist()
            reg.append(kept)

            scored_out = kept.withColumn("_batch_id", F.lit(batch_id))
            # persist the scored schema ONCE (create-only sidecar;
            # underscore-prefixed, so parquet readers skip it):
            # read_scored_asof's pre-first-commit empty snapshot returns
            # THIS schema instead of a hardcoded minimal one — ADVICE
            # r11: code selecting pipeline-configured columns must not
            # throw only on a fresh out_dir.
            fsutil.write_text_once(
                spark,
                f"{out_dir}/scored/_schema.json",
                scored_out.schema.json() + "\n",
            )
            (
                scored_out
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{out_dir}/scored")
            )
            (
                batch_bands.join(
                    kept.select(F.col(id_col).alias("doc")), "doc", "semi"
                )
                .withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{out_dir}/bands")
            )
            if monitor:
                from egal_yet_another_earthquake_project_spark.operators import (
                    quality as dqx,
                )

                checks = [
                    dqx.not_null(id_col),
                    dqx.unique(id_col),
                    dqx.not_null(text_col),
                ]
                (
                    dqx.run_checks(kept, checks)
                    .withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(f"{out_dir}/metrics/dq")
                )
                if psi_frozen is not None:
                    from egal_yet_another_earthquake_project_spark.operators.stats import (
                        psi_profile,
                    )

                    stats, hist = psi_frozen
                    (
                        psi_profile(
                            kept.select(
                                F.length(F.col(text_col))
                                .cast("double")
                                .alias("_mlen")
                            ),
                            None,
                            "_mlen",
                            stats=stats,
                            ref_hist=hist,
                        )
                        .withColumn("_batch_id", F.lit(batch_id))
                        .write.mode("overwrite")
                        .option("partitionOverwriteMode", "dynamic")
                        .partitionBy("_batch_id")
                        .parquet(f"{out_dir}/metrics/psi")
                    )
                if lr_margin_batch is not None:
                    from egal_yet_another_earthquake_project_spark.operators.stats import (
                        psi_profile,
                    )

                    lr_stats, lr_hist = psi_lr_frozen
                    (
                        psi_profile(
                            lr_margin_batch,
                            None,
                            "_lrm",
                            stats=lr_stats,
                            ref_hist=lr_hist,
                        )
                        .withColumn("_batch_id", F.lit(batch_id))
                        .write.mode("overwrite")
                        .option("partitionOverwriteMode", "dynamic")
                        .partitionBy("_batch_id")
                        .parquet(f"{out_dir}/metrics/psi_lr")
                    )

            # manifest LAST — hop 3 must only ever see a batch whose data
            # AND index writes are complete. Create-once: a replay that
            # already committed the manifest leaves it untouched, so hop 3
            # never double-ingests (file sources track by name). A batch
            # every stage filtered away writes no partition — and no
            # manifest, so empty triggers cost hop 3 nothing (a replayed
            # empty batch is empty again: the skip is deterministic).
            if not kept.isEmpty():
                fsutil.write_text_once(
                    spark,
                    f"{out_dir}/scored_commits/batch-{batch_id}.txt",
                    f"{batch_id}\n",
                )
        finally:
            for frame in reg:
                frame.unpersist()

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
    source_col: str,
    text_col: str,
):
    """Hop 3: incremental packing. The SOURCE is hop 2's commit
    manifests (one deterministic tiny file per upstream batch — see the
    module docstring's cross-hop exactly-once note); each micro-batch
    reads the named ``_batch_id`` partitions of ``{out}/scored``
    (static partition pruning — only those directories are scanned).
    Tails are DERIVED from the shards already written (max start_tok +
    n_tokens per source, one tiny row per group) — the pack state is
    the output itself, so there is nothing extra to checkpoint and a
    restart recomputes it exactly."""
    stream = spark.readStream.format("text").load(f"{out_dir}/scored_commits")

    def _pack(manifest: DataFrame, batch_id: int) -> None:
        # one row per upstream batch in this trigger — bounded collect
        ids = sorted(
            {int(r.value.strip()) for r in manifest.collect() if r.value.strip()}
        )
        if not ids:
            return
        batch = (
            spark.read.parquet(f"{out_dir}/scored")
            .filter(F.col("_batch_id").isin(ids))
            .drop("_batch_id")
        )
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
        # Consumption markers for the compactor: "hop-2 batch N was
        # packed by MY batch {batch_id}". Streaming batch ids are stable
        # across replays, so a replayed pack batch re-creates identical
        # markers (create-once no-op). The compactor treats a hop-2 id
        # as merge-safe only when its marker's hop-3 id is COMMITTED in
        # the pack checkpoint — a marker from a crashed, uncommitted
        # batch does not unlock the merge, because that batch will
        # replay and must still find its partitions un-merged.
        for hop2_id in ids:
            fsutil.write_text_once(
                spark,
                f"{out_dir}/pack_consumed/batch-{hop2_id}.txt",
                f"{batch_id}\n",
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
    semantic_index: str | None = None,
    vec_col: str = "embedding",
    semantic_cos_threshold: float = 0.95,
    semantic_nprobe: int = 4,
    nb_model: str | None = None,
    nb_keep_label: str = "en",
) -> list[StreamingQuery]:
    """Start the three hops as concurrent streaming queries (continuous
    mode: each hop's file source picks up the previous hop's commits
    trigger by trigger). Returns the queries in pipeline order; callers
    own their lifecycle. For a finite drop use :func:`drain_curate_stream`
    — ``availableNow`` pins each hop to the files present when it
    starts, so concurrent availableNow hops would race their upstream.

    ``corpus`` is the trusted existing corpus (``id, source, text``) the
    drop is gated against; None means bootstrap-from-empty. Its LSH band
    index is written ONCE (``{out}/bands/_batch_id=-1``) before the
    queries start — a restart skips the bootstrap when the partition
    already exists. ``model`` is a ``train_bigram_lm``/``read_lm_model``
    dict; None skips scoring (nll columns are null)."""
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
        semantic_index=semantic_index, vec_col=vec_col,
        semantic_cos_threshold=semantic_cos_threshold,
        semantic_nprobe=semantic_nprobe,
        nb_model=nb_model, nb_keep_label=nb_keep_label,
    )
    started = []
    for writer in hops:
        if available_now:
            writer = writer.trigger(availableNow=True)
        started.append(writer.start())
    return started


def _bootstrap_corpus_bands(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    id_col: str,
    text_col: str,
) -> None:
    """Sign the trusted corpus ONCE into ``{out}/bands/_batch_id=-1`` —
    the index partition every hop-2 batch equi-joins instead of
    re-signing the corpus (VERDICT r7 #1). Skipped only when the
    ``_bootstrap.done`` marker exists — written AFTER the partition
    write completes, because directory existence alone cannot prove
    completeness (an object-store commit moves files one by one; a
    crash mid-commit would otherwise disable the vs-corpus gate
    forever). A partial bootstrap has no marker, so the next start
    dynamic-overwrites the partition whole."""
    marker = f"{out_dir}/bands/_bootstrap.done"
    if fsutil.exists(spark, marker):
        return
    (
        ldd.band_key_frame(ldd.minhash_signatures(corpus, id_col, text_col))
        .withColumn("_batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(f"{out_dir}/bands")
    )
    fsutil.write_text_once(spark, marker, "-1\n")


def _build_hops(
    spark, source_dir, schema, corpus, out_dir, checkpoint_dir, model, **kw
):
    # a crashed compaction that completed its stage may already have
    # deleted source partitions — running hops against that half-swapped
    # history would silently re-admit near-dups and reset pack tails;
    # the rerun restores it in seconds, so refuse to start until then
    for name in ("scored", "bands", "shards"):
        if fsutil.exists(spark, f"{out_dir}/{name}__compact_stage/_SUCCESS"):
            raise RuntimeError(
                f"interrupted compaction stage at {out_dir}/{name}"
                "__compact_stage — run curate-compact (or "
                "compact_curate_outputs) to finish the swap before "
                "starting the pipeline"
            )
    # a downstream hop's file source must be able to resolve its input
    # directory before the upstream hop has committed anything
    for hop_dir in ("admitted", "scored_commits"):
        fsutil.mkdirs(spark, f"{out_dir}/{hop_dir}")
    if corpus is not None:
        _bootstrap_corpus_bands(
            spark, corpus, out_dir, kw["id_col"], kw["text_col"]
        )
    semantic_index = kw.get("semantic_index")
    vec_col = kw.get("vec_col", "embedding") if semantic_index else None
    vec_type = "array<double>"
    if semantic_index is not None:
        types = {f.name: f.dataType.simpleString() for f in schema.fields}
        if vec_col not in types:
            raise ValueError(
                f"semantic_index is set but the source schema has no "
                f"'{vec_col}' column to gate on"
            )
        vec_type = types[vec_col]
    admit = _admit_hop(
        spark, source_dir, schema, corpus, out_dir, checkpoint_dir,
        min_quality=kw["min_quality"], lang=kw["lang"],
        eval_docs=kw["eval_docs"],
        contamination_threshold=kw["contamination_threshold"],
        id_col=kw["id_col"], source_col=kw["source_col"],
        text_col=kw["text_col"], event_time=kw["event_time"],
        watermark=kw["watermark"],
        max_files_per_trigger=kw["max_files_per_trigger"],
        vec_col=vec_col,
    )
    score = _score_hop(
        spark, corpus, model, out_dir, checkpoint_dir,
        jaccard_threshold=kw["jaccard_threshold"], id_col=kw["id_col"],
        id_type=kw["id_type"], source_col=kw["source_col"],
        text_col=kw["text_col"], event_time=kw["event_time"],
        semantic_index=semantic_index, vec_col=vec_col, vec_type=vec_type,
        semantic_cos_threshold=kw.get("semantic_cos_threshold", 0.95),
        semantic_nprobe=kw.get("semantic_nprobe", 4),
        nb_model=kw.get("nb_model"),
        nb_keep_label=kw.get("nb_keep_label", "en"),
        lr_model=kw.get("lr_model"),
        monitor=kw.get("monitor", False),
    )
    pack = _pack_hop(
        spark, out_dir, checkpoint_dir,
        ctx=kw["ctx"], id_col=kw["id_col"],
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
    kw.setdefault("semantic_index", None)
    kw.setdefault("vec_col", "embedding")
    kw.setdefault("semantic_cos_threshold", 0.95)
    kw.setdefault("semantic_nprobe", 4)
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
    counted = ("admitted", "scored", "shards") + (
        ("semantic_drops",) if kw["semantic_index"] is not None else ()
    )
    for name in counted:
        try:
            stats[name] = spark.read.parquet(f"{out_dir}/{name}").count()
        except AnalysisException:
            stats[name] = 0
    return stats


def drain_with_scheduled_compaction(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    corpus: DataFrame | None,
    out_dir: str,
    checkpoint_dir: str,
    model: dict | None = None,
    *,
    compact_every: int,
    target_rows_per_file: int = 1_000_000,
    **kw,
) -> dict:
    """One drain cycle of the run-book a year-horizon deployment needs
    (VERDICT r8 Next #6): drain the available drop, then — every
    ``compact_every``-th drain — run :func:`compact_curate_outputs`
    while the pipeline is provably stopped (every availableNow query
    has terminated before this returns, which is exactly the MUST-stop
    precondition the manual ``curate-compact`` documents).

    The cycle counter persists at ``{out}/_drain_count`` (overwrite-
    atomic via fsutil), so the cadence survives restarts and separate
    CLI invocations: ``curate-stream --compact-every N`` per scheduled
    drop gives compaction every N drops with no operator intervention.
    The counter is advanced AFTER a successful drain and the compaction
    decision is made on the new value; a crash between drain and
    compaction only defers compaction to the next cycle — never runs it
    concurrently with the hops. Returns the drain stats plus a
    ``compaction`` entry when one ran."""
    if compact_every < 1:
        raise ValueError("compact_every must be >= 1")
    stats = drain_curate_stream(
        spark, source_dir, schema, corpus, out_dir, checkpoint_dir, model, **kw
    )
    counter_path = f"{out_dir}/_drain_count"
    prev = fsutil.read_text(spark, counter_path)
    n = (int(prev.strip()) if prev and prev.strip() else 0) + 1
    fsutil.write_text_overwrite(spark, counter_path, f"{n}\n")
    if n % compact_every == 0:
        stats["compaction"] = compact_curate_outputs(
            spark,
            out_dir,
            checkpoint_dir,
            source_col=kw.get("source_col", "source"),
            target_rows_per_file=target_rows_per_file,
        )
    return stats


# ---------------------------------------------------------------------------
# maintenance: small-partition compaction for the hop outputs


def last_committed_batch(
    spark: SparkSession, checkpoint_dir: str, hop: str
) -> int | None:
    """Highest batch id the named hop's checkpoint has COMMITTED — the
    compaction safety watermark: a committed batch can never be
    replayed, so its output partition is immutable."""
    names = fsutil.list_names(spark, f"{checkpoint_dir}/{hop}/commits")
    ids = [int(n) for n in names if n.isdigit()]
    return max(ids) if ids else None


def _batch_partition_ids(spark: SparkSession, path: str, safe: int) -> list[int]:
    """``_batch_id`` partition directories of ``path`` in ``[0, safe]``,
    ascending — the set a compaction merge would consume. Shared with
    :func:`compact_curate_outputs` so the scored-horizon WAL write can
    key on the PRE-merge state (ADVICE r11: a crash between the merge
    swap and the horizon advance, or a replay of a partially-completed
    merge, must not complete the merge with the horizon unwritten)."""
    ids = []
    for name in fsutil.list_names(spark, path):
        if not name.startswith("_batch_id="):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if 0 <= v <= safe:
            ids.append(v)
    return sorted(ids)


def _compact_batched_path(
    spark: SparkSession,
    path: str,
    safe: int,
    inner_partitions: list[str],
    target_rows_per_file: int,
    layout=None,
) -> dict:
    """Merge every ``_batch_id`` partition in ``[0, safe]`` of ``path``
    into the single partition ``_batch_id=safe``, few balanced files.

    Crash-safe via a staged copy as the WAL: the merged data is first
    written in full to ``{path}__compact_stage`` (Spark's ``_SUCCESS``
    marks it complete), and only then are the source partitions deleted
    and the staged partition renamed in — one directory rename. A rerun
    after a crash at ANY point resumes: stage complete + data still
    staged → redo deletes (idempotent) + rename; stage complete + data
    already renamed → just drop the stage; stage incomplete → rebuild
    it (the source partitions are untouched until the stage is
    complete). The bands bootstrap partition ``_batch_id=-1`` is never
    touched (its presence is the signal that skips re-signing the
    corpus).

    MUST run with the pipeline stopped: concurrent readers of the
    partitions being merged would see partial history mid-swap.
    Batches > ``safe`` (including any in-flight replay) are untouched.
    """
    stage = f"{path}__compact_stage"
    dst = f"{path}/_batch_id={safe}"

    def _merge_ids() -> list[int]:
        return _batch_partition_ids(spark, path, safe)

    if not fsutil.exists(spark, f"{stage}/_SUCCESS"):
        fsutil.delete(spark, stage)  # incomplete previous attempt
        ids = _merge_ids()
        if len(ids) <= 1:
            return {"merged_partitions": 0}
        df = (
            spark.read.parquet(path)
            .filter((F.col("_batch_id") >= 0) & (F.col("_batch_id") <= safe))
            .withColumn("_batch_id", F.lit(safe))
        )
        rows = df.count()
        n_files = max(1, math.ceil(rows / target_rows_per_file))
        arranged = layout(df, n_files) if layout else df.repartition(n_files)
        (
            arranged.write.mode("overwrite")
            .partitionBy("_batch_id", *inner_partitions)
            .parquet(stage)
        )
    merged = _merge_ids()
    if fsutil.exists(spark, f"{stage}/_batch_id={safe}"):
        for v in merged:
            fsutil.delete(spark, f"{path}/_batch_id={v}")
        # the staged copy is the ONLY copy now — a failed rename (dst
        # re-created by a concurrent writer, permission blip) must
        # leave the stage in place and fail loudly, never fall through
        # to the stage delete below
        if not fsutil.rename(spark, f"{stage}/_batch_id={safe}", dst):
            raise OSError(
                f"compaction swap failed: rename {stage}/_batch_id={safe}"
                f" -> {dst} returned false; staged data retained — "
                "re-run compaction after clearing the destination"
            )
    fsutil.delete(spark, stage)
    return {"merged_partitions": len(merged), "into": safe}


def _pack_consumed_upto(spark: SparkSession, out_dir: str, checkpoint_dir: str) -> int | None:
    """Highest hop-2 batch id BELOW which every manifested batch has
    been packed by a COMMITTED hop-3 batch — the extra bound the
    ``scored`` merge needs. Hop 3 addresses scored partitions by
    manifest id: merging a partition hop 3 has not consumed yet would
    make its later ``isin([N])`` read hit the merged partition (every
    row of every merged batch — duplicate packing) or nothing at all.
    A consumption marker only counts when its recorded hop-3 batch id
    is in the pack commit log: a marker from a crashed batch will be
    REPLAYED, and the replay must still find its partitions intact.
    Returns None when nothing bounds the merge (no manifests, or all
    consumed)."""
    committed = set()
    for n in fsutil.list_names(spark, f"{checkpoint_dir}/pack/commits"):
        if n.isdigit():
            committed.add(int(n))
    manifest_ids = set()
    for n in fsutil.list_names(spark, f"{out_dir}/scored_commits"):
        if n.startswith("batch-") and n.endswith(".txt"):
            manifest_ids.add(int(n[len("batch-") : -len(".txt")]))
    consumed = set()
    for n in fsutil.list_names(spark, f"{out_dir}/pack_consumed"):
        if not (n.startswith("batch-") and n.endswith(".txt")):
            continue
        hop2 = int(n[len("batch-") : -len(".txt")])
        text = fsutil.read_text(spark, f"{out_dir}/pack_consumed/{n}")
        if text is not None and int(text.strip()) in committed:
            consumed.add(hop2)
    unconsumed = sorted(manifest_ids - consumed)
    if not unconsumed:
        return None
    return unconsumed[0] - 1


def scored_horizon(spark: SparkSession, out_dir: str) -> int | None:
    """The retention horizon of the curated corpus: the LOWEST
    ``_batch_id`` still addressable by time travel. Compaction advances
    it when it merges scored partitions (the merge physically destroys
    per-batch snapshot granularity below the merge point); snapshots
    below the horizon raise in :func:`read_scored_asof` instead of
    returning a silently partial result. Markers are tiny monotone
    ``horizon-N.txt`` files (write-once, max wins) so advancing is an
    atomic create, never an in-place rewrite."""
    best = None
    for n in fsutil.list_names(spark, f"{out_dir}/scored_horizon"):
        if n.startswith("horizon-") and n.endswith(".txt"):
            v = int(n[len("horizon-") : -len(".txt")])
            best = v if best is None else max(best, v)
    return best


def _advance_scored_horizon(spark: SparkSession, out_dir: str, h: int) -> None:
    cur = scored_horizon(spark, out_dir)
    if cur is not None and cur >= h:
        return
    fsutil.write_text_once(
        spark, f"{out_dir}/scored_horizon/horizon-{h}.txt", f"{h}\n"
    )


def vacuum_scored_history(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    keep_last: int = 0,
) -> dict:
    """Retention vacuum for the curated corpus' snapshot ledger
    (VERDICT r10 'Next round' #5): at one manifest per trigger, a year
    of minutely drops leaves ~500k tiny ledger files that every
    snapshot read must list. Vacuum (1) optionally compacts scored
    history down to the last ``keep_last`` commits (older per-batch
    partitions merge into the oldest retained commit's PREDECESSOR
    id, advancing the horizon), then (2) deletes expired manifests and
    consumption markers — ONLY those whose ``_batch_id`` partition no
    longer exists, because a live (unmerged) partition is reachable
    exclusively through its manifest and deleting that manifest would
    drop rows from every snapshot. The horizon marker is the WAL: it
    advances (atomic create) before any ledger delete, so a crash
    mid-vacuum leaves only dead manifests behind and a re-run finishes
    the deletes idempotently. Hop-3 WAL invariants hold by
    construction: manifests hop 3 has not consumed are never expired
    (the compaction merge point is already bounded by
    :func:`_pack_consumed_upto`, and the partition-absence check
    refuses everything else). Run with the pipeline STOPPED, like
    compaction."""
    if keep_last:
        compact_curate_outputs(
            spark,
            out_dir,
            checkpoint_dir,
            scored_keep_last=keep_last,
        )
    horizon = scored_horizon(spark, out_dir)
    stats = {"horizon": horizon, "manifests_deleted": 0, "markers_deleted": 0}
    if horizon is None:
        return stats
    for n in fsutil.list_names(spark, f"{out_dir}/scored_commits"):
        if not (n.startswith("batch-") and n.endswith(".txt")):
            continue
        bid = int(n[len("batch-") : -len(".txt")])
        if bid >= horizon:
            continue
        if fsutil.exists(spark, f"{out_dir}/scored/_batch_id={bid}"):
            # a live partition's only reachability is its manifest —
            # refuse, loudly visible in the stats, rather than orphan it
            continue
        fsutil.delete(spark, f"{out_dir}/scored_commits/{n}")
        stats["manifests_deleted"] += 1
        if fsutil.delete(spark, f"{out_dir}/pack_consumed/{n}"):
            stats["markers_deleted"] += 1
    # prune superseded horizon markers (max wins; keep only the max)
    for n in fsutil.list_names(spark, f"{out_dir}/scored_horizon"):
        if n.startswith("horizon-") and n.endswith(".txt"):
            if int(n[len("horizon-") : -len(".txt")]) < horizon:
                fsutil.delete(spark, f"{out_dir}/scored_horizon/{n}")
    return stats


def vacuum_metrics_history(
    spark: SparkSession,
    out_dir: str,
    keep_last: int = 10,
) -> dict:
    """Retention vacuum for the per-drop monitoring tables (VERDICT r11
    ask #5): ``--monitor`` lands one ``_batch_id=N`` partition per
    trigger under ``{out}/metrics/{dq,psi,...}`` — the same
    one-dir-per-trigger growth the scored-history vacuum bounds, at
    ~500k directories/year at minutely cadence. Keeps the newest
    ``keep_last`` partitions of EVERY metric table under ``metrics/``
    (generic over the family — an lr-margin PSI table added later is
    covered automatically), deletes the rest.

    No horizon marker: nothing time-travels metrics (reports are
    per-drop health signals, not a snapshot source), so deletion needs
    no WAL — each partition delete is independent and a crash mid-sweep
    just leaves the remainder for the idempotent re-run. Run any time;
    monitor sinks only ever (over)write their CURRENT batch id, which
    retention never touches."""
    if int(keep_last) < 1:
        raise ValueError("vacuum_metrics_history: keep_last must be >= 1")
    base = f"{out_dir}/metrics"
    stats: dict[str, dict] = {}
    for metric in sorted(fsutil.list_names(spark, base)):
        mdir = f"{base}/{metric}"
        ids = []
        for n in fsutil.list_names(spark, mdir):
            if not n.startswith("_batch_id="):
                continue
            try:
                ids.append(int(n.split("=", 1)[1]))
            except ValueError:
                continue
        ids.sort()
        expired = ids[: -int(keep_last)] if len(ids) > int(keep_last) else []
        deleted = sum(
            1
            for bid in expired
            if fsutil.delete(spark, f"{mdir}/_batch_id={bid}")
        )
        stats[metric] = {"kept": len(ids) - len(expired), "deleted": deleted}
    return stats


def compact_curate_outputs(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    source_col: str = "source",
    target_rows_per_file: int = 1_000_000,
    scored_keep_last: int = 0,
) -> dict:
    """Maintenance compaction over the pipeline's batched outputs
    (VERDICT r7 #4): a year of triggers leaves thousands of one-batch
    partitions that ``_read_prior`` must list and read; merging every
    COMMITTED batch into one partition per output makes history reads
    O(1) directories again. Replay semantics are preserved because the
    merge watermark is each owning hop's checkpoint commit log — a
    committed batch can never be replayed, and the merged rows keep
    ``_batch_id = safe < any future batch`` so every ``_batch_id <
    current`` history filter still includes them. ``scored`` is
    additionally bounded by hop 3's committed CONSUMPTION
    (:func:`_pack_consumed_upto`): hop 3 reads scored by manifest id,
    so a partition it still owes a read must keep its own directory.
    Run with the pipeline STOPPED (see :func:`_compact_batched_path`).
    Shards keep their (source, pack_id, start_tok) clustering."""

    def shard_layout(df: DataFrame, n_files: int) -> DataFrame:
        return df.repartitionByRange(
            n_files, source_col, "pack_id"
        ).sortWithinPartitions(source_col, "pack_id", "start_tok")

    consumed_upto = _pack_consumed_upto(spark, out_dir, checkpoint_dir)
    results: dict[str, dict] = {}
    for name, hop, inner, layout in (
        ("scored", "score", [], None),
        ("bands", "score", [], None),
        ("shards", "pack", [source_col], shard_layout),
    ):
        safe = last_committed_batch(spark, checkpoint_dir, hop)
        if name == "scored":
            if consumed_upto is not None:
                safe = (
                    consumed_upto if safe is None else min(safe, consumed_upto)
                )
            if scored_keep_last > 0 and safe is not None:
                # retention: the newest keep_last commits keep their own
                # partitions (stay time-travelable); the merge target is
                # the newest commit OUTSIDE the retained window — a real
                # manifest id, so the merged rows stay visible.
                ids = [
                    i for i in committed_batches(spark, out_dir) if i <= safe
                ]
                if len(ids) <= scored_keep_last:
                    results[name] = {"merged_partitions": 0}
                    continue
                safe = ids[-(scored_keep_last + 1)]
        if (
            safe is None
            or safe < 0
            or not fsutil.exists(spark, f"{out_dir}/{name}")
        ):
            results[name] = {"merged_partitions": 0}
            continue
        if (
            name == "scored"
            and len(_batch_partition_ids(spark, f"{out_dir}/{name}", safe)) > 1
        ):
            # horizon is the WAL for the merge (ADVICE r11, medium):
            # write it BEFORE the merge destroys per-batch granularity.
            # Early is safe — a merge that then fails only makes
            # sub-merge snapshots raise conservatively — while late
            # (the old post-hoc write) had a real hole: a crash after
            # the swap, or a replay of a partially-completed merge
            # (sources already deleted, so the rerun reports
            # merged_partitions 0), completed the merge with the
            # horizon unwritten and read_scored_asof served silently
            # PARTIAL sub-merge snapshots.
            _advance_scored_horizon(spark, out_dir, safe)
        results[name] = _compact_batched_path(
            spark,
            f"{out_dir}/{name}",
            safe,
            inner,
            target_rows_per_file,
            layout,
        )
    return results


def committed_batches(spark: SparkSession, out_dir: str) -> list[int]:
    """Hop-2 batch ids with a commit manifest, ascending — the
    pipeline's visibility ledger. Manifests are one tiny file per
    batch, so this read is bounded by the number of committed batches,
    not by data volume."""
    try:
        rows = spark.read.format("text").load(
            f"{out_dir}/scored_commits"
        ).collect()
    except AnalysisException as exc:
        get_cls = getattr(exc, "getCondition", None) or getattr(
            exc, "getErrorClass", None
        )
        cls = get_cls() if callable(get_cls) else None
        if cls in _NO_HISTORY or "Path does not exist" in str(exc):
            return []
        raise
    return sorted({int(r.value.strip()) for r in rows if r.value.strip()})


def read_scored_asof(
    spark: SparkSession, out_dir: str, upto_batch: int | None = None
) -> DataFrame:
    """Snapshot (time-travel) read of the curated corpus AS OF a hop-2
    commit: only ``_batch_id`` partitions whose manifest exists — and,
    with ``upto_batch``, only those ≤ it — are visible. A partition a
    replayed/crashed batch wrote WITHOUT committing its manifest is
    invisible, exactly as it is to hop 3: the manifest IS the commit.
    The ``isin`` on partition values is a static partition filter —
    Spark lists only the named directories, so reading an old snapshot
    costs that snapshot's data, not the table's.

    Snapshots below the retention horizon (advanced by compaction /
    :func:`vacuum_scored_history`, whose merge physically destroys
    per-batch granularity) raise instead of returning a silently
    PARTIAL result — the merged rows all carry the merge point's id,
    so a sub-horizon ``isin`` would miss them."""
    horizon = scored_horizon(spark, out_dir)
    if (
        upto_batch is not None
        and horizon is not None
        and upto_batch < horizon
    ):
        raise ValueError(
            f"read_scored_asof: snapshot as of batch {upto_batch} has been "
            f"compacted away — the retention horizon is {horizon}; only "
            "snapshots at or above it are reconstructable"
        )
    ids = committed_batches(spark, out_dir)
    if upto_batch is not None:
        ids = [i for i in ids if i <= upto_batch]
    try:
        scored = spark.read.parquet(f"{out_dir}/scored")
    except AnalysisException:
        if not ids:
            # Nothing ever committed (or only uncommitted partials):
            # the empty snapshot, same contract as the no-commits case
            # below — not an error. The real column set is
            # pipeline-configured (it carries the input's columns), so
            # prefer the _schema.json sidecar hop 2 persists at its
            # first write; the minimal stable columns are only the
            # fallback for dirs that predate the sidecar (ADVICE r11).
            import json as _json

            sidecar = fsutil.read_text(spark, f"{out_dir}/scored/_schema.json")
            if sidecar:
                return spark.createDataFrame(
                    [], T.StructType.fromJson(_json.loads(sidecar))
                )
            return spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("n_bigrams", T.LongType()),
                        T.StructField("nll", T.DoubleType()),
                        T.StructField("_batch_id", T.LongType()),
                    ]
                ),
            )
        raise
    if not ids:
        return scored.filter(F.lit(False))
    return scored.filter(F.col("_batch_id").isin(ids))
