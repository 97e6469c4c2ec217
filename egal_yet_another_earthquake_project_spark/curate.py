"""End-to-end batch corpus curation: the composed training-data job.

The declared queries verify every stage in isolation; this module is the
*product* path a pipeline operator actually runs — one callable (and a
``curate`` CLI subcommand in ``jobs.py``) that takes a raw documents
table through:

    quality/language gates → exact dedup → (optional) MinHash-LSH
    near-dedup with transitive clusters → α source resampling →
    sequence packing → partitioned parquet shards

Every stage is the already-tested library operator; the composition adds
no new shuffle beyond the stages' own (gates are Catalyst filters pushed
ahead of the dedup shuffle; the near-dedup clusters and resample quotas
are candidate-scale frames). Stage row counts are collected once from
tiny aggregates and returned for the job log.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import clusters as lcl
from egal_yet_another_earthquake_project_spark.llm import dedup as ldd
from egal_yet_another_earthquake_project_spark.llm import packing as lpack
from egal_yet_another_earthquake_project_spark.llm import sampling as lsamp
from egal_yet_another_earthquake_project_spark.llm import text as ltx


@dataclass
class CurationResult:
    """Curated corpus plus per-stage accounting."""

    corpus: DataFrame  # doc_id, source, text, n_tokens, start_tok, pack_id
    stats: dict[str, int] = field(default_factory=dict)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str | None = "en",
    near_dedup: bool = False,
    jaccard_threshold: float = 0.7,
    decontaminate: DataFrame | None = None,
    contamination_threshold: float = 0.2,
    keep: str = "min_id",
    alpha: float | None = None,
    budget: int = 1000,
    mixture: dict[str, float] | None = None,
    ctx: int = 256,
    semantic_index: str | None = None,
    embeddings: DataFrame | None = None,
    semantic_cos_threshold: float = 0.95,
    semantic_nprobe: int = 4,
    nb_model: str | None = None,
    nb_keep_label: str = "en",
    lr_model: str | None = None,
) -> CurationResult:
    """Run the full curation flow; see module docstring for the stages.

    ``near_dedup=True`` adds MinHash-LSH pair detection + connected
    components (the iterative step — everything else is one Catalyst
    plan). ``keep`` picks the cluster survivor: ``"min_id"`` (the
    component representative — cheapest, no extra shuffle) or
    ``"best_quality"`` (highest quality, ties → min id — the
    keep-the-best-copy policy; one row_number window over the
    clustered docs only, which are a corpus fraction). ``alpha``
    enables the temperature resample down to ``budget`` docs.
    ``decontaminate`` takes the benchmark/eval document frame: docs
    whose distinct-shingle overlap fraction with it reaches
    ``contamination_threshold`` are dropped (llm.dedup.
    contamination_fraction — the GPT-3/PaLM gate) right after exact
    dedup, so the eval-set broadcast joins the already-shrunk corpus.
    ``semantic_index`` adds the SemDeDup-style embedding gate AFTER the
    lexical stages (the paper's point: embedding dups survive lexical
    dedup): docs whose embedding has a cosine ≥
    ``semantic_cos_threshold`` near-twin in the persisted IVF index at
    that directory are dropped (``llm.ann_index.semantic_gate_hits`` —
    cell-pruned candidates, one dot per candidate). ``embeddings`` must
    then supply ``(id_col, embedding)`` rows for the incoming docs; it
    is semi-join-pruned to the docs still alive, so only survivors pay
    assignment math. ``mixture`` maps source → epoch weight: each
    surviving doc is
    repeated per its source's weight (floor copies + md5-stable
    fractional extra — llm.sampling.mixture_epochs) BEFORE packing, so
    the shards materialize the training mixture itself; rows then carry
    a ``copy`` column and pack under a composite ``id#copy`` key.
    ``nb_model`` adds the TRAINED-classifier gate (llm.classify
    persisted model dir): survivors whose predicted label is not
    ``nb_keep_label`` are dropped — last among the drop stages, after
    every dedup decision, the position that keeps the streaming twin
    bit-identical and spares duplicates the inference cost.
    """
    # The input count rides the first stage materialization as an
    # observe() metric instead of a separate count() action — the gates
    # scan every input row anyway, so a dedicated pre-count job (plan
    # analysis + one more pass over the table's metadata) reports the
    # same integer for free. Read back after the first stage count,
    # which always executes the observed node (every branch's first
    # action materializes the gate pipeline).
    from pyspark.sql import Observation

    _input_obs = Observation()
    docs = docs.observe(_input_obs, F.count(F.lit(1)).alias("n_input"))
    stats: dict[str, int] = {"input": 0}

    profiled = ltx.text_profile(docs)
    gated = profiled.filter(F.col("quality") >= min_quality)
    if lang is not None:
        gated = gated.filter(F.col("lang_guess") == lang)
    # Only the columns the rest of the job reads cross the persist
    # boundary: the other profile signals (the BPE-regex token count,
    # length/stopword/punct ratios) would otherwise be MATERIALIZED into
    # the cache for nothing — Catalyst prunes unused projection exprs,
    # but not across an explicit persist. Deduping on the profile's own
    # fingerprint column skips a second normalize+md5 scan of the corpus
    # (measured together: ~25 % off the gate+dedup stage at sf0.1).
    gated = gated.select(id_col, source_col, text_col, "quality", "fingerprint")
    # Pin the heavy lineage (gates -> window exact-dedup) once, BEFORE
    # near-dedup: the LSH path alone reads it three times (signatures,
    # the candidate-doc verify join, the loser anti-join), and the stats
    # counts, both sides of the packed join, and write_shards read the
    # result again. MEMORY_AND_DISK, so at real scale executors spill
    # instead of OOM-ing or silently recomputing. Measured at sf0.1:
    # the un-persisted pipeline re-ran the gate+dedup stages 4-5x.
    deduped = (
        ldd.exact_dedup(gated, id_col, text_col, fp_col="fingerprint")
        .drop("fingerprint")
        .persist()
    )

    if keep not in ("min_id", "best_quality"):
        raise ValueError(f"unknown keep policy: {keep!r}")

    if decontaminate is not None:
        # Dirty set is a corpus fraction (same class as the dedup loser
        # set below) — no broadcast hint; the anti-join keeps plan shape
        # and AQE broadcasts it while it genuinely fits.
        dirty = (
            ldd.contamination_fraction(
                deduped,
                decontaminate,
                id_col,
                text_col,
                dirty_threshold=contamination_threshold,
            )
            .filter(F.col("dirty"))
            .select(F.col("doc").alias(id_col))
        )
        clean = deduped.join(dirty, id_col, "left_anti").persist()
        stats["after_decontamination"] = clean.count()
        deduped.unpersist()
        deduped = clean

    if near_dedup:
        pairs = ldd.minhash_lsh_dedup_pairs(
            deduped, id_col, text_col, verify_threshold=jaccard_threshold
        )
        comp = lcl.connected_components(pairs, "doc_a", "doc_b")
        # No broadcast hint: the loser set is a corpus FRACTION (every
        # non-canonical duplicate), not a fixed-size dim — at real dup
        # rates it outgrows any broadcast threshold. AQE still broadcasts
        # it at small scale where it genuinely fits.
        if keep == "best_quality":
            # Keep each cluster's highest-quality member (ties → min id)
            # instead of the component representative. The window runs
            # over CLUSTERED docs only — a corpus fraction — and quality
            # is already on `deduped` from the profiling gate, so the
            # policy costs one row_number window, no rescoring.
            from pyspark.sql.window import Window

            scored = comp.select(
                F.col("node").alias(id_col), "component"
            ).join(deduped.select(id_col, "quality"), id_col)
            w = Window.partitionBy("component").orderBy(
                F.col("quality").desc(), F.col(id_col).asc()
            )
            losers = (
                scored.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") > 1)
                .select(id_col)
            )
        else:
            losers = comp.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias(id_col)
            )
        kept = deduped.join(losers, id_col, "left_anti").persist()
        stats["after_dedup"] = kept.count()
        deduped.unpersist()
        deduped = kept
    else:
        stats["after_dedup"] = deduped.count()

    if semantic_index is not None:
        if embeddings is None:
            raise ValueError(
                "curate_corpus: semantic_index requires an embeddings frame "
                f"with ({id_col}, embedding) rows for the incoming docs"
            )
        from egal_yet_another_earthquake_project_spark.llm.ann_index import (
            semantic_gate_hits,
        )

        alive_vecs = embeddings.join(
            deduped.select(id_col), id_col, "leftsemi"
        )
        sem_hits = semantic_gate_hits(
            docs.sparkSession,
            semantic_index,
            alive_vecs,
            cos_threshold=semantic_cos_threshold,
            nprobe=semantic_nprobe,
            id_col=id_col,
        )
        sem_kept = deduped.join(sem_hits, id_col, "left_anti").persist()
        stats["after_semantic_dedup"] = sem_kept.count()
        deduped.unpersist()
        deduped = sem_kept

    if nb_model is not None:
        # Trained-classifier gate LAST among the drop stages, mirroring
        # hop 2's placement in the streaming twin: a per-document filter
        # AFTER every dedup decision is position-independent between the
        # two pipelines (dedup winners are already fixed), which is what
        # keeps drained ≡ batch bit-identical. Running the model on
        # survivors only also means dups never pay inference.
        from egal_yet_another_earthquake_project_spark.llm.classify import (
            nb_classify_with_model,
            read_nb_model,
        )

        weights, consts = read_nb_model(docs.sparkSession, nb_model)
        scored_docs = deduped.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        keep_ids = (
            nb_classify_with_model(scored_docs, weights, consts)
            .where(F.col("pred_label") == nb_keep_label)
            .select(F.col("doc_id").alias(id_col))
        )
        nb_kept = deduped.join(keep_ids, id_col, "left_semi").persist()
        stats["after_nb_gate"] = nb_kept.count()
        deduped.unpersist()
        deduped = nb_kept

    if lr_model is not None:
        # Discriminative (LR) gate beside the generative one — same
        # per-document, after-all-dedup position, so composition order
        # between the two classifier gates is immaterial (they AND) and
        # drained ≡ batch still holds. Keeps predicted-positive docs.
        from egal_yet_another_earthquake_project_spark.llm.lr import (
            lr_classify,
            read_lr_model,
        )

        w = read_lr_model(docs.sparkSession, lr_model)
        keep_ids = (
            lr_classify(
                deduped.select(
                    F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"),
                ),
                w,
            )
            .where(F.col("pred"))
            .select(F.col("doc_id").alias(id_col))
        )
        lr_kept = deduped.join(keep_ids, id_col, "left_semi").persist()
        stats["after_lr_gate"] = lr_kept.count()
        deduped.unpersist()
        deduped = lr_kept

    if alpha is not None:
        # No broadcast hint: `keep` is budget-sized, and a real curation
        # budget is the training set itself (billions of ids) — the same
        # corpus-fraction class as the loser set above. left_semi keeps
        # the plan shape; AQE still broadcasts while it genuinely fits.
        keep = lsamp.alpha_resample(
            deduped, source_col, id_col, alpha=alpha, budget=budget
        ).select(id_col)
        resampled = deduped.join(keep, id_col, "left_semi").persist()
        stats["after_resample"] = resampled.count()
        deduped.unpersist()
        deduped = resampled

    pack_id_col = id_col
    if mixture is not None:
        # Zero-shuffle projection+explode; the repeat stream packs under
        # a composite key so duplicate doc ids stay distinct rows.
        mixed = lsamp.mixture_epochs(
            deduped, source_col, id_col, mixture
        ).withColumn(
            "_mix_id",
            F.concat(F.col(id_col).cast("string"), F.lit("#"), F.col("copy")),
        )
        deduped = mixed.persist()
        stats["after_mixture"] = deduped.count()
        pack_id_col = "_mix_id"

    packed = lpack.pack_sequences(
        deduped, pack_id_col, source_col, text_col, ctx=ctx
    ).persist()
    keep_cols = [id_col, source_col, text_col] + (
        ["copy", "_mix_id"] if mixture is not None else []
    )
    out = deduped.select(*keep_cols).join(
        packed.drop(source_col), pack_id_col
    )
    if mixture is not None:
        out = out.drop("_mix_id")
    stats["packs"] = packed.select(source_col, "pack_id").distinct().count()
    # Every branch has run at least one materializing action by now, so
    # the observation is complete (get would block otherwise).
    stats["input"] = int(_input_obs.get["n_input"])
    return CurationResult(corpus=out, stats=stats)


def write_shards(result: CurationResult, out_dir: str) -> None:
    """Write the curated corpus partitioned by source — the shard layout
    a training loader consumes (each source directory holds its packed
    stream in pack/offset order).

    Range-partition on (source, pack_id), not hash-on-source: one
    partition per source value funnels a dominant source (a web crawl
    that is 90% of corpus mass) through a single task. Ranging over the
    pack id spreads each source across many tasks while
    ``partitionBy("source")`` still yields one directory per source and
    ``sortWithinPartitions`` keeps pack/offset order within each file.
    """
    (
        result.corpus.repartitionByRange("source", "pack_id")
        .sortWithinPartitions("source", "pack_id", "start_tok")
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(out_dir)
    )
