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


def test_hop2_signs_each_doc_once_and_never_resigns_corpus(
    spark, tmp_path: Path, monkeypatch
):
    """The VERDICT r7 #1 contract: hop 2's near-dup gate joins the
    PERSISTED band index instead of re-signing history. The spy wraps
    minhash_signatures and records every input's row count — across a
    bootstrap + three drains the signing calls must be exactly: the
    corpus once (the _batch_id=-1 bootstrap), then each batch once.
    A re-sign of corpus ∪ prior batches would show up as an extra
    corpus-sized call in drains 2-3."""
    from egal_yet_another_earthquake_project_spark.streaming import (
        curate as scur,
    )

    clean = _drop_frame(spark).persist()
    cut = clean.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    corpus = clean.filter(F.col("doc_id") < F.lit(cut))
    drop = clean.filter(F.col("doc_id") >= F.lit(cut))
    mid = drop.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    corpus_n = corpus.count()
    b1 = drop.filter(F.col("doc_id") < F.lit(mid))
    b2 = drop.filter(F.col("doc_id") >= F.lit(mid))

    signed_sizes: list[int] = []
    orig = ldd.minhash_signatures

    def spy(df, id_col, text_col="text", *a, **k):
        signed_sizes.append(df.count())
        return orig(df, id_col, text_col, *a, **k)

    monkeypatch.setattr(ldd, "minhash_signatures", spy)
    # curate.py binds the module (ldd.minhash_signatures), so the spy is
    # seen; incremental_neardup_pairs receives BOTH band frames and must
    # not call it at all.

    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    b1.selectExpr("doc_id", "source", "text", f"{TS} AS ingest_ts").coalesce(
        1
    ).write.parquet(str(src / "b1"))
    schema = spark.read.parquet(str(src / "b1")).schema

    def drain():
        return scur.drain_curate_stream(
            spark, str(src) + "/*", schema, corpus=corpus, out_dir=out,
            checkpoint_dir=ck, model=None,
        )

    drain()
    # bootstrap signed the corpus once, then batch 1 once
    assert signed_sizes[0] == corpus_n
    assert len(signed_sizes) == 2 and signed_sizes[1] <= b1.count()

    b2.selectExpr("doc_id", "source", "text", f"{TS} AS ingest_ts").coalesce(
        1
    ).write.parquet(str(src / "b2"))
    drain()
    # batch 2 signed once; the corpus and batch 1 were NOT re-signed —
    # their bands came from {out}/bands
    assert len(signed_sizes) == 3 and signed_sizes[2] <= b2.count()
    assert all(s < corpus_n for s in signed_sizes[1:])

    # a no-op drain signs nothing
    drain()
    assert len(signed_sizes) == 3

    # the _bootstrap.done marker is the completeness gate: without it
    # (a crash mid-bootstrap leaves a partial partition and no marker)
    # the next start re-signs the corpus whole
    marker = Path(out) / "bands" / "_bootstrap.done"
    assert marker.exists()
    marker.unlink()
    drain()
    assert len(signed_sizes) == 4 and signed_sizes[3] == corpus_n
    assert marker.exists()

    # and the admitted set still went through the near-dup gate: no kept
    # doc is a near-dup of the corpus (the index path changed, the
    # semantics must not)
    kept_docs = spark.read.parquet(f"{out}/scored").select("doc_id", "text")
    assert (
        ldd.incremental_neardup_pairs(
            kept_docs, corpus, "doc_id", "text", verify_threshold=0.8
        ).count()
        == 0
    )
    clean.unpersist()


def test_corrupt_prior_output_fails_batch_instead_of_dropping_history(
    spark, tmp_path: Path
):
    """_read_prior must only treat path-missing as "no history"
    (VERDICT r7 #2): a corrupt prior partition fails the micro-batch
    (checkpoint retries it) instead of silently re-admitting near-dups
    and resetting pack offsets; after repair the retry succeeds."""
    from pyspark.errors import StreamingQueryException

    drop = _drop_frame(spark)
    mid = drop.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    drop.filter(F.col("doc_id") < F.lit(mid)).selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    ).coalesce(1).write.parquet(str(src / "b1"))
    schema = spark.read.parquet(str(src / "b1")).schema

    def drain():
        return drain_curate_stream(
            spark, str(src) + "/*", schema, corpus=None, out_dir=out,
            checkpoint_dir=ck, model=None,
        )

    drain()

    # corrupt the committed history hop 2 reads (its band index), then
    # ship a second batch: the drain must FAIL, not silently continue
    junk = Path(out) / "bands" / "_batch_id=0" / "junk.parquet"
    good = next(junk.parent.glob("part-*.parquet"))
    junk.write_bytes(b"not a parquet file")
    drop.filter(F.col("doc_id") >= F.lit(mid)).selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    ).coalesce(1).write.parquet(str(src / "b2"))
    try:
        drain()
        raise AssertionError("corrupt prior band index must fail the batch")
    except StreamingQueryException:
        pass
    except Exception as e:  # footer errors can surface pre-stream too
        assert "junk" in str(e) or "footer" in str(e).lower() or "Parquet" in str(e)

    # repair → the retry succeeds and history is intact (offsets tile)
    junk.unlink()
    assert good.exists()
    drain()
    shards = spark.read.parquet(f"{out}/shards")
    rows = shards.select("source", "start_tok", "n_tokens").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append((r.start_tok, r.n_tokens))
    for source, spans in by_source.items():
        spans.sort()
        pos = 0
        for start, n in spans:
            assert start == pos, (source, start, pos)
            pos += n


def test_compaction_merges_committed_partitions_and_preserves_results(
    spark, tmp_path: Path
):
    """compact_curate_outputs (VERDICT r7 #4): after a multi-batch run,
    compaction collapses the per-trigger _batch_id partitions into one
    per output (bands keep the _batch_id=-1 corpus bootstrap), changes
    NO rows, and the pipeline keeps working afterwards — a further drop
    drains with intact dedup gating and seamless pack offsets."""
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        compact_curate_outputs,
    )

    clean = _drop_frame(spark).persist()
    cut = clean.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    corpus = clean.filter(F.col("doc_id") < F.lit(cut))
    rest = clean.filter(F.col("doc_id") >= F.lit(cut))
    qs = [
        rest.agg(F.percentile_approx("doc_id", q).alias("c")).first().c
        for q in (0.33, 0.66)
    ]
    batches = [
        rest.filter(F.col("doc_id") < F.lit(qs[0])),
        rest.filter((F.col("doc_id") >= F.lit(qs[0])) & (F.col("doc_id") < F.lit(qs[1]))),
        rest.filter(F.col("doc_id") >= F.lit(qs[1])),
    ]
    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def ship(i):
        batches[i].selectExpr(
            "doc_id", "source", "text", f"{TS} AS ingest_ts"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))

    ship(0)
    schema = spark.read.parquet(str(src / "b0")).schema

    def drain():
        return drain_curate_stream(
            spark, str(src) + "/*", schema, corpus=corpus, out_dir=out,
            checkpoint_dir=ck, model=None,
        )

    drain()
    ship(1)
    drain()

    def snapshot(name):
        return {
            tuple(r)
            for r in spark.read.parquet(f"{out}/{name}")
            .drop("_batch_id")
            .collect()
        }

    before = {n: snapshot(n) for n in ("scored", "bands", "shards")}
    parts_before = {
        n: len(list((Path(out) / n).glob("_batch_id=*")))
        for n in ("scored", "bands", "shards")
    }
    assert parts_before["scored"] == 2 and parts_before["bands"] == 3

    res = compact_curate_outputs(spark, out, ck)
    assert res["scored"]["merged_partitions"] == 2
    assert res["bands"]["merged_partitions"] == 2  # -1 bootstrap untouched

    for name in ("scored", "bands", "shards"):
        assert snapshot(name) == before[name], name
    assert len(list((Path(out) / "scored").glob("_batch_id=*"))) == 1
    assert (Path(out) / "bands" / "_batch_id=-1").exists()
    assert len(list((Path(out) / "bands").glob("_batch_id=*"))) == 2

    # the pipeline continues over the compacted history: dedup gate and
    # pack tails both read the merged partitions
    ship(2)
    drain()
    shards = spark.read.parquet(f"{out}/shards")
    assert shards.select("doc_id").distinct().count() == shards.count()
    rows = shards.select("source", "start_tok", "n_tokens").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append((r.start_tok, r.n_tokens))
    for source, spans in by_source.items():
        spans.sort()
        pos = 0
        for start, n in spans:
            assert start == pos, (source, start, pos)
            pos += n
    clean.unpersist()


def test_concurrent_curate_stream_consumes_each_batch_exactly_once(
    spark, tmp_path: Path
):
    """curate_stream in CONCURRENT mode (all three hops live, not the
    sequential drain): hop 3 ingests hop 2's output via the commit
    manifests, so every scored batch lands in the shards exactly once
    even though hop 2's data files are dynamic-overwrite partitions.
    Two drops are fed while the queries run; the shards must hold each
    admitted doc once with seamless per-source offsets, and there must
    be exactly one manifest per scored partition."""
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        curate_stream,
    )

    drop = _drop_frame(spark)
    mid = drop.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    drop.filter(F.col("doc_id") < F.lit(mid)).selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    ).coalesce(1).write.parquet(str(src / "b1"))
    schema = spark.read.parquet(str(src / "b1")).schema

    queries = curate_stream(
        spark, str(src) + "/*", schema, corpus=None, out_dir=out,
        checkpoint_dir=ck, model=None, jaccard_threshold=0.7,
    )
    try:
        for q in queries:  # cascade: admit -> score -> pack
            q.processAllAvailable()
        drop.filter(F.col("doc_id") >= F.lit(mid)).selectExpr(
            "doc_id", "source", "text", f"{TS} AS ingest_ts"
        ).coalesce(1).write.parquet(str(src / "b2"))
        for q in queries:
            q.processAllAvailable()
        for q in queries:
            assert q.exception() is None
    finally:
        for q in queries:
            q.stop()

    shards = spark.read.parquet(f"{out}/shards")
    scored = spark.read.parquet(f"{out}/scored")
    # exactly-once: every scored doc appears in the shards exactly once
    assert shards.select("doc_id").distinct().count() == shards.count()
    assert shards.count() == scored.count() > 0
    # one manifest per scored partition, names deterministic
    manifests = sorted(
        p.name for p in (Path(out) / "scored_commits").glob("batch-*.txt")
    )
    scored_parts = sorted(
        p.name for p in (Path(out) / "scored").glob("_batch_id=*")
    )
    assert len(manifests) == len(scored_parts) >= 2
    # offsets tile [0, total) per source
    rows = shards.select("source", "start_tok", "n_tokens").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append((r.start_tok, r.n_tokens))
    for source, spans in by_source.items():
        spans.sort()
        pos = 0
        for start, n in spans:
            assert start == pos, (source, start, pos)
            pos += n


def test_compaction_respects_hop3_consumption_watermark(
    spark, tmp_path: Path
):
    """A scored partition hop 3 has not consumed (committed) yet must
    keep its own directory: hop 3 addresses scored by manifest id, so
    merging it away would double-pack or lose it. Simulated by
    removing the consumption marker for the newest batch — compaction
    must bound the scored merge below it, then merge fully once the
    marker is back."""
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        compact_curate_outputs,
    )

    drop = _drop_frame(spark)
    qs = [
        drop.agg(F.percentile_approx("doc_id", q).alias("c")).first().c
        for q in (0.33, 0.66)
    ]
    batches = [
        drop.filter(F.col("doc_id") < F.lit(qs[0])),
        drop.filter(
            (F.col("doc_id") >= F.lit(qs[0])) & (F.col("doc_id") < F.lit(qs[1]))
        ),
        drop.filter(F.col("doc_id") >= F.lit(qs[1])),
    ]
    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    schema = None
    for i, b in enumerate(batches):
        b.selectExpr(
            "doc_id", "source", "text", f"{TS} AS ingest_ts"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
        if schema is None:
            schema = spark.read.parquet(str(src / "b0")).schema
        drain_curate_stream(
            spark, str(src) + "/*", schema, corpus=None, out_dir=out,
            checkpoint_dir=ck, model=None,
        )
    parts = sorted(p.name for p in (Path(out) / "scored").glob("_batch_id=*"))
    assert len(parts) == 3
    before = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/scored").drop("_batch_id").collect()
    }

    # hop 3 "owes" the newest batch: hide its consumption marker
    newest = max(int(p.split("=")[1]) for p in parts)
    marker = Path(out) / "pack_consumed" / f"batch-{newest}.txt"
    stash = marker.read_text()
    marker.unlink()
    res = compact_curate_outputs(spark, out, ck)
    assert res["scored"]["into"] < newest  # bounded below the owed batch
    assert (Path(out) / "scored" / f"_batch_id={newest}").exists()
    after = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/scored").drop("_batch_id").collect()
    }
    assert after == before

    # marker restored -> the remaining partitions merge into one
    marker.write_text(stash)
    res = compact_curate_outputs(spark, out, ck)
    assert res["scored"]["merged_partitions"] == 2
    assert len(list((Path(out) / "scored").glob("_batch_id=*"))) == 1
    final = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/scored").drop("_batch_id").collect()
    }
    assert final == before


def test_pipeline_refuses_to_start_over_interrupted_compaction(
    spark, tmp_path: Path
):
    """A completed compaction stage means the source partitions may
    already be half-deleted; starting the hops there would silently
    run against broken history. _build_hops must refuse until the
    compaction rerun finishes the swap."""
    import pytest

    drop = _drop_frame(spark).limit(20)
    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    drop.selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    ).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    stage = Path(out) / "scored__compact_stage"
    stage.mkdir(parents=True)
    (stage / "_SUCCESS").touch()
    with pytest.raises(RuntimeError, match="curate-compact"):
        drain_curate_stream(
            spark, str(src), schema, corpus=None, out_dir=out,
            checkpoint_dir=ck, model=None,
        )


def test_semantic_gate_drained_equals_batch(spark, tmp_path: Path):
    """VERDICT r8 Next #7: the SemDeDup embedding gate as a composed
    stage. Docs whose embeddings have a cosine-1 twin in the persisted
    IVF index are LEXICALLY novel (unique text) yet must be dropped by
    both paths; a single-batch drain with --semantic-index reproduces
    curate_corpus(semantic_index=...) bit-for-bit, and the drain report
    carries the semantic_drops accounting row."""
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        build_ivf_index,
    )

    drop = _drop_frame(spark).filter(F.col("doc_id") < 200)
    ids = sorted(r.doc_id for r in drop.select("doc_id").distinct().collect())
    dim = len(ids)

    def onehot(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    # orthogonal embedding per doc; the index holds twins (other ids!)
    # for every 7th doc — exactly those must fall to the semantic gate
    emb = spark.createDataFrame(
        [(d, onehot(i)) for i, d in enumerate(ids)],
        "doc_id long, embedding array<double>",
    )
    planted = {d for i, d in enumerate(ids) if i % 7 == 0}
    index_vecs = spark.createDataFrame(
        [(100000 + i, onehot(i)) for i, d in enumerate(ids) if d in planted],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(index_vecs, idx, num_cells=2)

    want_res = curate.curate_corpus(
        drop,
        min_quality=0.5,
        lang="en",
        near_dedup=True,
        jaccard_threshold=0.7,
        keep="min_id",
        ctx=256,
        semantic_index=idx,
        embeddings=emb,
    )
    want = {
        tuple(r)
        for r in want_res.corpus.select(
            "doc_id", "source", "text", "n_tokens", "start_tok", "pack_id"
        ).collect()
    }
    kept_ids = {r[0] for r in want}
    assert planted and not (kept_ids & planted), "gate missed a planted twin"
    assert want_res.stats["after_semantic_dedup"] == want_res.stats[
        "after_dedup"
    ] - len(planted)

    src = tmp_path / "drop_in"
    drop.join(emb, "doc_id").selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts", "embedding"
    ).coalesce(1).write.parquet(str(src))
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
        semantic_index=idx,
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out" / "shards"))
        .select("doc_id", "source", "text", "n_tokens", "start_tok", "pack_id")
        .collect()
    }
    assert got == want and len(want) > 0
    assert stats["semantic_drops"] == len(planted)
    dropped = {
        r.doc_id
        for r in spark.read.parquet(
            str(tmp_path / "out" / "semantic_drops")
        ).collect()
    }
    assert dropped == planted


def test_semantic_gate_requires_vec_col_in_schema(spark, tmp_path: Path):
    """--semantic-index without an embedding column in the source schema
    must fail at build time, not silently skip the gate."""
    import pytest

    drop = _drop_frame(spark).limit(5)
    src = tmp_path / "in"
    drop.selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    with pytest.raises(ValueError, match="no 'embedding' column"):
        drain_curate_stream(
            spark, str(src), schema, corpus=None,
            out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ck"),
            semantic_index=str(tmp_path / "ivf"),
        )


def test_scheduled_compaction_cycle_is_bit_identical(spark, tmp_path: Path):
    """VERDICT r8 Next #6: `curate-stream --compact-every N` encodes the
    run-book. Two drain cycles with compact_every=1 (drain → compact →
    drain → compact) must leave exactly the rows of an uncompacted twin
    pipeline over the same drops, with the cadence counter persisted and
    the compaction accounting in the returned stats."""
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        drain_with_scheduled_compaction,
    )

    clean = _drop_frame(spark).persist()
    cut = clean.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    corpus = clean.filter(F.col("doc_id") < F.lit(cut))
    rest = clean.filter(F.col("doc_id") >= F.lit(cut))
    mid = rest.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    batches = [
        rest.filter(F.col("doc_id") < F.lit(mid)),
        rest.filter(F.col("doc_id") >= F.lit(mid)),
    ]
    src = tmp_path / "in"

    def ship(i):
        batches[i].selectExpr(
            "doc_id", "source", "text", f"{TS} AS ingest_ts"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))

    ship(0)
    schema = spark.read.parquet(str(src / "b0")).schema

    def run(kind):
        out, ck = str(tmp_path / f"out_{kind}"), str(tmp_path / f"ck_{kind}")
        if kind == "sched":
            return drain_with_scheduled_compaction(
                spark, str(src) + "/*", schema, corpus=corpus, out_dir=out,
                checkpoint_dir=ck, model=None, compact_every=1,
            )
        return drain_curate_stream(
            spark, str(src) + "/*", schema, corpus=corpus, out_dir=out,
            checkpoint_dir=ck, model=None,
        )

    s1 = run("sched")
    assert "compaction" in s1
    run("plain")
    ship(1)
    s2 = run("sched")
    assert "compaction" in s2
    run("plain")

    counter = (tmp_path / "out_sched" / "_drain_count").read_text().strip()
    assert counter == "2"

    for name in ("scored", "bands", "shards"):
        sched = {
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "out_sched" / name))
            .drop("_batch_id")
            .collect()
        }
        plain = {
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "out_plain" / name))
            .drop("_batch_id")
            .collect()
        }
        assert sched == plain and len(sched) > 0, name
    # compacted history really is one partition per hop output (+ the
    # -1 bands bootstrap)
    assert len(list((tmp_path / "out_sched" / "scored").glob("_batch_id=*"))) == 1
    clean.unpersist()


def test_nb_gate_drained_equals_batch(spark, tmp_path: Path):
    """The trained-classifier gate composed into both pipelines: a
    persisted NB model (trained on the full corpus, so 'en' predictions
    exist on both sides by construction) gates the same drop through
    curate_corpus(nb_model=...) and through the streaming twin — shards
    must match row for row, and the gate must actually drop something
    (otherwise this test proves nothing). A marker-less model dir fails
    the stream at BUILD time."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm.classify import (
        write_nb_model,
    )

    docs = read_table(spark, SF, "documents")
    mdl = tmp_path / "nb_model"
    write_nb_model(docs, str(mdl))

    drop = _drop_frame(spark)
    batch = curate.curate_corpus(
        drop,
        min_quality=0.5,
        lang="en",
        near_dedup=True,
        jaccard_threshold=0.7,
        keep="min_id",
        ctx=256,
        nb_model=str(mdl),
        nb_keep_label="en",
    )
    assert batch.stats["after_nb_gate"] < batch.stats["after_dedup"], (
        "fixture must exercise the gate: no doc was dropped"
    )
    want = {
        tuple(r)
        for r in batch.corpus.select(
            "doc_id", "source", "text", "n_tokens", "start_tok", "pack_id"
        ).collect()
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
        jaccard_threshold=0.7,
        nb_model=str(mdl),
        nb_keep_label="en",
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out" / "shards"))
        .select("doc_id", "source", "text", "n_tokens", "start_tok", "pack_id")
        .collect()
    }
    assert got == want and len(want) > 0

    bad = tmp_path / "partial_model"
    (bad / "weights").mkdir(parents=True)
    with pytest.raises(ValueError, match="_COMPLETE"):
        drain_curate_stream(
            spark,
            str(src),
            schema,
            corpus=None,
            out_dir=str(tmp_path / "out2"),
            checkpoint_dir=str(tmp_path / "ck2"),
            model=None,
            nb_model=str(bad),
        )


def test_read_scored_asof_time_travel_and_manifest_visibility(
    spark, tmp_path: Path
):
    """Two drops drained into one out_dir: the as-of-first-commit
    snapshot returns exactly the first drop's scored rows; the full
    read returns both; a scored partition WITHOUT a commit manifest
    (a crashed batch's orphan) is invisible to every snapshot."""
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        committed_batches,
        read_scored_asof,
    )

    drop = _drop_frame(spark)
    cut = drop.agg(F.percentile_approx("doc_id", 0.5).alias("c")).collect()[0].c
    d1 = drop.filter(F.col("doc_id") < F.lit(cut))
    d2 = drop.filter(F.col("doc_id") >= F.lit(cut))

    src = tmp_path / "in"
    out, ck = tmp_path / "out", tmp_path / "ck"
    d1.selectExpr("doc_id", "source", "text", f"{TS} AS ingest_ts").coalesce(
        1
    ).write.parquet(str(src / "d1"))
    schema = spark.read.parquet(str(src / "d1")).schema
    drain_curate_stream(
        spark, str(src) + "/*", schema, corpus=None,
        out_dir=str(out), checkpoint_dir=str(ck), model=None,
    )
    first_commits = committed_batches(spark, str(out))
    assert first_commits, "first drain committed nothing"
    first_ids = {
        r.doc_id for r in read_scored_asof(spark, str(out)).collect()
    }

    d2.selectExpr("doc_id", "source", "text", f"{TS} AS ingest_ts").coalesce(
        1
    ).write.parquet(str(src / "d2"))
    drain_curate_stream(
        spark, str(src) + "/*", schema, corpus=None,
        out_dir=str(out), checkpoint_dir=str(ck), model=None,
    )
    all_commits = committed_batches(spark, str(out))
    assert len(all_commits) > len(first_commits)

    snap = {
        r.doc_id
        for r in read_scored_asof(
            spark, str(out), upto_batch=max(first_commits)
        ).collect()
    }
    assert snap == first_ids
    full = {r.doc_id for r in read_scored_asof(spark, str(out)).collect()}
    assert full > snap

    # orphan partition without manifest: invisible
    orphan_id = max(all_commits) + 1000
    spark.read.parquet(f"{out}/scored").limit(3).withColumn(
        "_batch_id", F.lit(orphan_id)
    ).write.mode("append").partitionBy("_batch_id").parquet(f"{out}/scored")
    after = {r.doc_id for r in read_scored_asof(spark, str(out)).collect()}
    assert after == full
    raw = spark.read.parquet(f"{out}/scored")
    assert raw.filter(F.col("_batch_id") == orphan_id).count() == 3


def test_read_scored_asof_fresh_out_dir_is_empty_snapshot(
    spark, tmp_path: Path
):
    """An out_dir where NO batch ever committed and the scored
    directory was never created returns the empty snapshot, not an
    AnalysisException — same contract as committed_batches' missing-
    manifest-dir guard."""
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        read_scored_asof,
    )

    snap = read_scored_asof(spark, str(tmp_path / "never_ran"))
    assert snap.count() == 0
    assert "_batch_id" in snap.columns


def test_vacuum_retention_horizon_and_snapshot_expiry(spark, tmp_path: Path):
    """Retention vacuum (VERDICT r10 #5): three drained drops, then
    vacuum --keep-last 1. The two oldest commits merge into one
    partition (still a manifested id), the horizon advances to the
    merge point, the dead manifest is expired, the FULL read is
    bit-identical, the retained snapshot still time-travels — and
    asking for a snapshot below the horizon raises loudly instead of
    returning the silently partial result a sub-horizon isin would
    produce."""
    import pytest

    from egal_yet_another_earthquake_project_spark import fsutil
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        committed_batches,
        read_scored_asof,
        scored_horizon,
        vacuum_scored_history,
    )

    clean = _drop_frame(spark).persist()
    qs = [
        clean.agg(F.percentile_approx("doc_id", q).alias("c")).first().c
        for q in (0.33, 0.66)
    ]
    batches = [
        clean.filter(F.col("doc_id") < F.lit(qs[0])),
        clean.filter(
            (F.col("doc_id") >= F.lit(qs[0])) & (F.col("doc_id") < F.lit(qs[1]))
        ),
        clean.filter(F.col("doc_id") >= F.lit(qs[1])),
    ]
    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def ship_and_drain(i, schema=[None]):
        batches[i].selectExpr(
            "doc_id", "source", "text", f"{TS} AS ingest_ts"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
        if schema[0] is None:
            schema[0] = spark.read.parquet(str(src / f"b{i}")).schema
        drain_curate_stream(
            spark, str(src) + "/*", schema[0], corpus=None, out_dir=out,
            checkpoint_dir=ck, model=None,
        )

    for i in range(3):
        ship_and_drain(i)
    ids = committed_batches(spark, out)
    assert len(ids) == 3 and scored_horizon(spark, out) is None
    full_before = {r.doc_id for r in read_scored_asof(spark, out).collect()}
    snap_mid = {
        r.doc_id
        for r in read_scored_asof(spark, out, upto_batch=ids[1]).collect()
    }

    stats = vacuum_scored_history(spark, out, ck, keep_last=1)
    assert stats["horizon"] == ids[1]
    assert stats["manifests_deleted"] == 1  # ids[0]'s ledger entry
    assert scored_horizon(spark, out) == ids[1]
    # partitions: merged target + the retained newest
    parts = sorted(
        int(p.name.split("=")[1])
        for p in (Path(out) / "scored").glob("_batch_id=*")
    )
    assert parts == [ids[1], ids[2]]
    # full read bit-identical; retained snapshots still reconstruct
    assert {r.doc_id for r in read_scored_asof(spark, out).collect()} == full_before
    assert {
        r.doc_id
        for r in read_scored_asof(spark, out, upto_batch=ids[1]).collect()
    } == snap_mid
    # below the horizon: loud error, not a partial snapshot
    with pytest.raises(ValueError, match="horizon"):
        read_scored_asof(spark, out, upto_batch=ids[0])

    # crash-mid-vacuum replay: a dead manifest resurfaces below the
    # already-advanced horizon (delete crashed before this file).
    # Reads stay correct (it matches no partition), and a re-run with
    # keep_last=0 finishes the expiry without touching anything else.
    fsutil.write_text_once(
        spark, f"{out}/scored_commits/batch-{ids[0]}.txt", f"{ids[0]}\n"
    )
    assert {r.doc_id for r in read_scored_asof(spark, out).collect()} == full_before
    stats2 = vacuum_scored_history(spark, out, ck, keep_last=0)
    assert stats2["manifests_deleted"] == 1
    assert not fsutil.exists(
        spark, f"{out}/scored_commits/batch-{ids[0]}.txt"
    )

    # WAL-invariant refusal: a sub-horizon manifest whose partition is
    # LIVE (its rows are reachable only through it) is never expired
    fake = ids[1] - 1 if ids[1] - 1 not in ids else ids[1] - 2
    spark.read.parquet(f"{out}/scored").limit(2).withColumn(
        "_batch_id", F.lit(fake)
    ).write.mode("append").partitionBy("_batch_id").parquet(f"{out}/scored")
    fsutil.write_text_once(
        spark, f"{out}/scored_commits/batch-{fake}.txt", f"{fake}\n"
    )
    stats3 = vacuum_scored_history(spark, out, ck, keep_last=0)
    assert stats3["manifests_deleted"] == 0
    assert fsutil.exists(spark, f"{out}/scored_commits/batch-{fake}.txt")

    # pipeline keeps working after vacuum: a genuinely NEW drop — fresh
    # ids, word-REVERSED texts (novel shingles, so the near-dup gate
    # keeps them; same vocabulary, so the lang/quality gates still pass)
    extra = clean.limit(4).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        "source",
        F.concat_ws(" ", F.reverse(F.split(F.col("text"), " "))).alias(
            "text"
        ),
    )
    extra.selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    ).coalesce(1).write.parquet(str(src / "b3"))
    drain_curate_stream(
        spark, str(src) + "/*", spark.read.parquet(str(src / "b0")).schema,
        corpus=None, out_dir=out, checkpoint_dir=ck, model=None,
    )
    after = committed_batches(spark, out)
    assert max(after) > ids[2]


def test_monitor_metrics_drained_equal_batch(spark, tmp_path: Path):
    """--monitor (VERDICT r10 #6): each drained drop lands its DQ
    expectation report and PSI drift rows under {out}/metrics with
    _batch_id idempotence, and every row equals the BATCH-mode operator
    (run_checks / psi_profile with the same frozen reference) applied
    to that batch's scored partition — the aggregates are deterministic
    so drained ≡ batch exactly."""
    from egal_yet_another_earthquake_project_spark.operators import (
        quality as dqx,
    )
    from egal_yet_another_earthquake_project_spark.operators.stats import (
        psi_profile,
        psi_reference_stats,
    )
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        committed_batches,
    )

    clean = _drop_frame(spark).persist()
    cut = clean.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    corpus = clean.filter(F.col("doc_id") < F.lit(cut))
    rest = clean.filter(F.col("doc_id") >= F.lit(cut))
    mid = rest.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    drops = [
        rest.filter(F.col("doc_id") < F.lit(mid)),
        rest.filter(F.col("doc_id") >= F.lit(mid)),
    ]
    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    schema = None
    for i, d in enumerate(drops):
        d.selectExpr(
            "doc_id", "source", "text", f"{TS} AS ingest_ts"
        ).coalesce(1).write.parquet(str(src / f"b{i}"))
        if schema is None:
            schema = spark.read.parquet(str(src / f"b{i}")).schema
        drain_curate_stream(
            spark, str(src) + "/*", schema, corpus=corpus, out_dir=out,
            checkpoint_dir=ck, model=None, monitor=True,
        )

    ids = committed_batches(spark, out)
    assert len(ids) == 2
    dq = spark.read.parquet(f"{out}/metrics/dq")
    psi = spark.read.parquet(f"{out}/metrics/psi")
    ref_len = corpus.select(F.length("text").cast("double").alias("_mlen"))
    frozen = psi_reference_stats(ref_len, "_mlen")
    checks = [dqx.not_null("doc_id"), dqx.unique("doc_id"), dqx.not_null("text")]
    for bid in ids:
        part = spark.read.parquet(f"{out}/scored").filter(
            F.col("_batch_id") == bid
        )
        want_dq = {
            tuple(r) for r in dqx.run_checks(part, checks).collect()
        }
        got_dq = {
            tuple(r)
            for r in dq.filter(F.col("_batch_id") == bid)
            .drop("_batch_id")
            .collect()
        }
        assert got_dq == want_dq and len(got_dq) == 3, bid
        want_psi = {
            tuple(r)
            for r in psi_profile(
                part.select(F.length("text").cast("double").alias("_mlen")),
                ref_len,
                "_mlen",
                stats=frozen,
            ).collect()
        }
        got_psi = {
            tuple(r)
            for r in psi.filter(F.col("_batch_id") == bid)
            .drop("_batch_id")
            .collect()
        }
        assert got_psi == want_psi and len(got_psi) == 1, bid
    # every check passes on a clean pipeline (ids unique/non-null by
    # construction) and the drops come from the corpus distribution —
    # PSI stays below the industry 'shifting' threshold
    assert all(r.passed for r in dq.collect())
    assert all(r.psi is not None and r.psi < 0.25 for r in psi.collect())
    clean.unpersist()


def test_lr_gate_drained_equals_batch(spark, tmp_path: Path):
    """The DISCRIMINATIVE classifier gate composed into both pipelines
    (the LR twin of test_nb_gate_drained_equals_batch): a persisted LR
    model trained on a text-predictable planted label (doc contains
    'join') gates the same drop through curate_corpus(lr_model=...) and
    through the streaming twin — shards must match row for row, and the
    gate must genuinely split the drop."""
    from egal_yet_another_earthquake_project_spark.llm.lr import (
        write_lr_model,
    )

    # marker-augmented drop: even doc_ids carry a strong positive token,
    # odd ones a strong negative token — a SEPARABLE planted label the
    # 8-epoch model genuinely learns (a weak natural signal like
    # 'contains join' is prior-dominated and the gate drops nothing)
    drop = _drop_frame(spark).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" keepmark keepmark keepmark")
            ).otherwise(F.lit(" dropmark dropmark dropmark")),
        ),
    )
    mdl = tmp_path / "lr_model"
    write_lr_model(drop, str(mdl), label=F.col("text").contains("keepmark"))
    batch = curate.curate_corpus(
        drop,
        min_quality=0.5,
        lang="en",
        near_dedup=True,
        jaccard_threshold=0.7,
        keep="min_id",
        ctx=256,
        lr_model=str(mdl),
    )
    assert 0 < batch.stats["after_lr_gate"] < batch.stats["after_dedup"], (
        "fixture must exercise the gate in both directions"
    )
    want = {
        tuple(r)
        for r in batch.corpus.select(
            "doc_id", "source", "text", "n_tokens", "start_tok", "pack_id"
        ).collect()
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
        jaccard_threshold=0.7,
        lr_model=str(mdl),
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out" / "shards"))
        .select("doc_id", "source", "text", "n_tokens", "start_tok", "pack_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_lr_margin_psi_drained_equals_batch(spark, tmp_path: Path):
    """PSI on the LR gate's own margins (VERDICT r11 ask #6): with
    --monitor AND an LR model, each drained drop lands a psi_lr report
    vs the trusted corpus's margins under the frozen model — and the
    monitored slice is the PRE-gate margin distribution (the admitted
    batch after dedup, BEFORE the score>=0 cut), replayed here exactly
    from the admitted partition. A mixed drop whose negative half the
    gate removes pins the pre-gate semantics: the scored-partition
    (post-gate) replay must NOT match."""
    from egal_yet_another_earthquake_project_spark.llm.lr import (
        lr_scores,
        write_lr_model,
    )
    from egal_yet_another_earthquake_project_spark.operators.stats import (
        psi_profile,
        psi_reference_stats,
    )
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        committed_batches,
    )

    clean = _drop_frame(spark).persist()
    cut = clean.agg(F.percentile_approx("doc_id", 0.5).alias("c")).first().c
    corpus = clean.filter(F.col("doc_id") < F.lit(cut))
    # mixed drop: even ids strongly positive, odd strongly negative —
    # the gate genuinely removes the negative half
    drop = clean.filter(F.col("doc_id") >= F.lit(cut)).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" keepmark keepmark keepmark")
            ).otherwise(F.lit(" dropmark dropmark dropmark")),
        ),
    )
    mdl = tmp_path / "lr_model"
    write_lr_model(drop, str(mdl), label=F.col("text").contains("keepmark"))

    src = tmp_path / "in"
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    drop.selectExpr(
        "doc_id", "source", "text", f"{TS} AS ingest_ts"
    ).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    # jaccard_threshold > 1 neutralizes near-dedup (round(j,4) >= 1.01
    # never holds), so the hop's pre-gate frame == the admitted batch —
    # the one frame the test can reconstruct exactly from disk
    drain_curate_stream(
        spark, str(src), schema, corpus=corpus, out_dir=out,
        checkpoint_dir=ck, model=None, monitor=True, lr_model=str(mdl),
        jaccard_threshold=1.01,
    )

    ids = committed_batches(spark, out)
    assert len(ids) == 1
    bid = ids[0]
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/metrics/psi_lr")
        .filter(F.col("_batch_id") == bid)
        .drop("_batch_id")
        .collect()
    }
    assert len(got) == 1

    from egal_yet_another_earthquake_project_spark.llm.lr import read_lr_model

    weights = read_lr_model(spark, str(mdl))
    ref_m = lr_scores(
        corpus.select("doc_id", "text"), weights
    ).select(F.col("score").alias("_lrm"))
    frozen = psi_reference_stats(ref_m, "_lrm")

    # pre-gate frame = the admitted batch (dup-free fixture, no NB gate;
    # single-drain test, so the admitted table IS this batch)
    pre_gate = spark.read.parquet(f"{out}/admitted").select("doc_id", "text")
    want = {
        tuple(r)
        for r in psi_profile(
            lr_scores(pre_gate, weights).select(F.col("score").alias("_lrm")),
            ref_m,
            "_lrm",
            stats=frozen,
        ).collect()
    }
    assert got == want

    # post-gate replay (scored partition only) must NOT match: the gate
    # removed the negative half, and monitoring censored margins would
    # hide exactly the drift psi_lr exists to catch
    post_gate = (
        spark.read.parquet(f"{out}/scored")
        .filter(F.col("_batch_id") == bid)
        .select("doc_id", "text")
    )
    assert post_gate.count() < pre_gate.count() > 0
    censored = {
        tuple(r)
        for r in psi_profile(
            lr_scores(post_gate, weights).select(F.col("score").alias("_lrm")),
            ref_m,
            "_lrm",
            stats=frozen,
        ).collect()
    }
    assert censored != want
    # the planted bimodal drop is real drift vs the unmarked corpus
    psi_val = next(iter(got))
    assert any(
        isinstance(v, float) and v > 0.25 for v in psi_val if v is not None
    )
    clean.unpersist()


def test_vacuum_metrics_history_retention_and_crash_idempotence(
    spark, tmp_path: Path
):
    """vacuum_metrics_history (VERDICT r11 ask #5): keeps the newest
    keep_last per-drop partitions of EVERY metrics table, is generic
    over the metric family, survives a crash mid-sweep (partial deletes
    finish on the idempotent re-run), and refuses keep_last < 1."""
    import os

    import pytest

    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        vacuum_metrics_history,
    )

    out = str(tmp_path / "out")
    one = spark.range(1)
    for metric in ("dq", "psi", "psi_lr"):
        for bid in range(6):
            one.write.parquet(f"{out}/metrics/{metric}/_batch_id={bid}")

    res = vacuum_metrics_history(spark, out, keep_last=2)
    assert res == {
        m: {"kept": 2, "deleted": 4} for m in ("dq", "psi", "psi_lr")
    }
    for metric in ("dq", "psi", "psi_lr"):
        left = sorted(os.listdir(f"{out}/metrics/{metric}"))
        assert [n for n in left if n.startswith("_batch_id=")] == [
            "_batch_id=4", "_batch_id=5",
        ]
    # the kept partitions still read
    assert spark.read.parquet(f"{out}/metrics/dq").count() == 2

    # idempotent re-run: nothing more to delete
    res2 = vacuum_metrics_history(spark, out, keep_last=2)
    assert all(v == {"kept": 2, "deleted": 0} for v in res2.values())

    # crash mid-sweep: simulate by adding history then hand-deleting a
    # prefix (what a crashed first pass leaves) — the re-run finishes
    for bid in range(6, 10):
        one.write.parquet(f"{out}/metrics/dq/_batch_id={bid}")
    import shutil

    shutil.rmtree(f"{out}/metrics/dq/_batch_id=4")  # "crashed" partial
    res3 = vacuum_metrics_history(spark, out, keep_last=2)
    assert res3["dq"] == {"kept": 2, "deleted": 3}  # 5,6,7 go; 8,9 stay
    assert sorted(
        n
        for n in os.listdir(f"{out}/metrics/dq")
        if n.startswith("_batch_id=")
    ) == ["_batch_id=8", "_batch_id=9"]

    with pytest.raises(ValueError, match="keep_last"):
        vacuum_metrics_history(spark, out, keep_last=0)
