"""Composed streaming curation (VERDICT r6 #4): the daily drop flows
through gate → exact dedup → near-dedup → LM scoring → packing as one
checkpointed multi-hop pipeline, and a single-batch drain reproduces
the batch curate_corpus job exactly."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark import curate
from egal_yet_another_earthquake_project_spark.llm import dedup as ldd
from egal_yet_another_earthquake_project_spark.llm import text as ltx
from egal_yet_another_earthquake_project_spark.sources.files import read_table
from egal_yet_another_earthquake_project_spark.streaming.curate import (
    drain_curate_stream,
)

SF = "/root/testdata/sf0.001"
TS = "TIMESTAMP'2024-01-01 00:00:00'"


def _drop_frame(spark):
    """A clean drop: gated + exact-deduped documents (so the batch and
    streaming exact-dup policies — min-id vs first-arrival — cannot
    pick different survivors; the gates themselves are exercised as
    no-op re-application, and cross-corpus exact dups still flow
    through hop 1's anti-join in the incremental test)."""
    docs = read_table(spark, SF, "documents")
    profiled = ltx.text_profile(docs)
    gated = profiled.filter(
        (F.col("quality") >= 0.5) & (F.col("lang_guess") == "en")
    )
    return ldd.exact_dedup(gated, "doc_id", "text").select(
        "doc_id", "source", "text"
    )


def test_single_batch_drain_equals_curate_corpus(spark, tmp_path: Path):
    """One drop, one micro-batch, empty starting corpus: the streaming
    pipeline's shards must equal curate_corpus(near_dedup=True,
    keep=min_id) row for row on (doc_id, source, text, n_tokens,
    start_tok, pack_id) — within a batch every stage IS the batch
    operator, so the composition can't drift."""
    drop = _drop_frame(spark)

    want = {
        tuple(r)
        for r in curate.curate_corpus(
            drop,
            min_quality=0.5,
            lang="en",
            near_dedup=True,
            jaccard_threshold=0.7,
            keep="min_id",
            ctx=256,
        )
        .corpus.select(
            "doc_id", "source", "text", "n_tokens", "start_tok", "pack_id"
        )
        .collect()
    }

    src = tmp_path / "drop_in"
    drop.selectExpr("doc_id", "source", "text", f"{TS} AS ingest_ts").coalesce(
        1
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    stats = drain_curate_stream(
        spark,
        str(src),
        schema,
        corpus=None,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
        model=None,
        jaccard_threshold=0.7,
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out" / "shards"))
        .select("doc_id", "source", "text", "n_tokens", "start_tok", "pack_id")
        .collect()
    }
    assert got == want and len(want) > 0
    assert stats["shards"] == len(want)


def test_incremental_drain_gates_scores_and_packs_across_batches(
    spark, tmp_path: Path
):
    """Multi-batch drop against a real corpus + frozen LM: exact dups of
    the corpus are gated out in hop 1, near-dups of corpus AND of
    earlier-kept docs are dropped in hop 2, every kept doc carries the
    frozen model's exact score, shard offsets tile each source's token
    stream with no gaps or overlaps across batches, and a re-drain with
    nothing new is a no-op (checkpoints + _batch_id idempotence)."""
    from egal_yet_another_earthquake_project_spark.llm.lm import (
        score_bigram_frozen,
        train_bigram_lm,
    )

    clean = _drop_frame(spark).persist()
    cut = clean.agg(F.percentile_approx("doc_id", 0.6).alias("c")).first().c
    corpus = clean.filter(F.col("doc_id") < F.lit(cut))
    drop = clean.filter(F.col("doc_id") >= F.lit(cut))
    mid = drop.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c

    # poison the drop with exact copies of corpus docs (new ids) — hop 1
    # must reject every one of them
    copies = (
        corpus.limit(5)
        .select((F.col("doc_id") + 800000).alias("doc_id"), "source", "text")
    )

    model = train_bigram_lm(corpus)
    src = tmp_path / "inc_in"
    b1 = (
        drop.filter(F.col("doc_id") < F.lit(mid))
        .unionByName(copies)
        .selectExpr("doc_id", "source", "text", f"{TS} AS ingest_ts")
    )
    b2 = drop.filter(F.col("doc_id") >= F.lit(mid)).selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    schema = spark.read.parquet(str(src / "b1")).schema

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        return drain_curate_stream(
            spark,
            str(src) + "/*",
            schema,
            corpus=corpus,
            out_dir=out,
            checkpoint_dir=ck,
            model=model,
        )

    drain()
    b2.coalesce(1).write.parquet(str(src / "b2"))
    stats = drain()

    admitted = spark.read.parquet(f"{out}/admitted")
    # hop 1: every poisoned exact copy rejected; nothing else lost to it
    assert admitted.filter(F.col("doc_id") >= 800000).count() == 0
    assert stats["admitted"] == drop.count()

    shards = spark.read.parquet(f"{out}/shards").persist()
    # hop 2: no kept doc is a near-dup of the corpus
    kept_docs = shards.select("doc_id", "text")
    assert (
        ldd.incremental_neardup_pairs(
            kept_docs, corpus, "doc_id", "text", verify_threshold=0.8
        ).count()
        == 0
    )
    # scoring: exactly the frozen model's numbers
    want_scores = {
        r.doc_id: r.nll
        for r in score_bigram_frozen(kept_docs, model).collect()
    }
    got_scores = {r.doc_id: r.nll for r in shards.select("doc_id", "nll").collect()}
    for doc_id, nll in got_scores.items():
        if nll is not None:
            assert nll == want_scores[doc_id]

    # hop 3: per-source offsets tile [0, total) with no gaps/overlaps
    rows = shards.select("source", "start_tok", "n_tokens").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append((r.start_tok, r.n_tokens))
    assert by_source
    for source, spans in by_source.items():
        spans.sort()
        pos = 0
        for start, n in spans:
            assert start == pos, (source, start, pos)
            pos += n

    # idempotence: re-drain with no new files changes nothing
    before = {tuple(r) for r in shards.drop("_batch_id").collect()}
    shards.unpersist()
    drain()
    after = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/shards").drop("_batch_id").collect()
    }
    assert after == before
    clean.unpersist()


def test_drained_stream_with_decontamination_matches_batch(
    spark, tmp_path: Path
):
    """Same single-batch equality with the decontamination gate ON: the
    stream drops exactly the docs the batch job's decontaminate stage
    drops (the per-doc overlap score is independent of other corpus
    docs, so hop placement — before vs after the exact gate — cannot
    change the verdict for an exact-deduped drop)."""
    drop = _drop_frame(spark)
    eval_docs = drop.filter(F.col("doc_id") < 3).select("doc_id", "text")

    want = {
        tuple(r)
        for r in curate.curate_corpus(
            drop,
            min_quality=0.5,
            lang="en",
            near_dedup=True,
            decontaminate=eval_docs,
            contamination_threshold=0.5,
            jaccard_threshold=0.7,
            keep="min_id",
            ctx=256,
        )
        .corpus.select(
            "doc_id", "source", "text", "n_tokens", "start_tok", "pack_id"
        )
        .collect()
    }

    src = tmp_path / "drop_in"
    drop.selectExpr("doc_id", "source", "text", f"{TS} AS ingest_ts").coalesce(
        1
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    drain_curate_stream(
        spark,
        str(src),
        schema,
        corpus=None,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
        model=None,
        eval_docs=eval_docs,
        contamination_threshold=0.5,
        jaccard_threshold=0.7,
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out" / "shards"))
        .select("doc_id", "source", "text", "n_tokens", "start_tok", "pack_id")
        .collect()
    }
    assert got == want and len(want) > 0
    assert not {t[0] for t in got} & {0, 1, 2}
