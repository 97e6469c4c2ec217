"""Frozen-LM streaming scoring: drained micro-batch scores must equal
the batch bigram-NLL query, and out-of-corpus text must score at its
smoothing floor instead of dropping."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.lm import (
    doc_bigram_nll,
    score_bigram_frozen,
    train_bigram_lm,
)
from egal_yet_another_earthquake_project_spark.sources.files import (
    read_table,
    stream_parquet_dir,
)
from egal_yet_another_earthquake_project_spark.streaming.scoring import lm_score_sink

SF = "/root/testdata/sf0.001"


def test_frozen_scorer_on_training_corpus_equals_batch_query(spark):
    """score_bigram_frozen(train corpus) == doc_bigram_nll: every pair
    hits the model, so the left joins reduce to the batch query's inner
    joins — the equality that pins the streaming twin."""
    docs = read_table(spark, SF, "documents")
    model = train_bigram_lm(docs)
    frozen = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in score_bigram_frozen(docs, model).collect()
    }
    batch = {
        (r.doc_id, r.n_bigrams): r.nll for r in doc_bigram_nll(docs).collect()
    }
    assert frozen == batch and len(batch) > 0


def test_frozen_scorer_floors_unseen_text(spark):
    """A document of tokens the model has never seen must still score —
    at the smoothing floor −ln(λ/V + (1−λ)/(N+V)) per bigram (c2, c1a,
    c1b all coalesce to 0) — not drop out (the monitor exists to flag
    exactly this text)."""
    import math

    docs = read_table(spark, SF, "documents")
    model = train_bigram_lm(docs)
    alien = spark.createDataFrame(
        [(1, "zzqx zzqy zzqz")], "doc_id long, text string"
    )
    row = score_bigram_frozen(alien, model).collect()
    assert len(row) == 1 and row[0].n_bigrams == 2
    floor = -math.log(
        model["lam"] / model["v"]
        + (1.0 - model["lam"]) / (model["n"] + model["v"])
    )
    assert abs(row[0].nll - round(floor, 4)) < 1e-3


def test_lm_score_stream_drained_equals_batch(spark, tmp_path: Path):
    """Two triggers of documents through lm_score_sink, drained, must
    score identically to the batch scorer over the whole corpus — the
    stateless foreachBatch plan IS the batch plan, so the split point
    can't matter."""
    docs = read_table(spark, SF, "documents")
    model = train_bigram_lm(docs)
    cut = docs.agg(F.percentile_approx("doc_id", 0.5).alias("c")).collect()[0].c

    src = tmp_path / "s_in"
    out = tmp_path / "scored"
    docs.filter(F.col("doc_id") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    docs.filter(F.col("doc_id") >= F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = stream_parquet_dir(
        spark, str(src) + "/*", docs.schema, max_files_per_trigger=1
    )
    q = (
        lm_score_sink(stream, model, str(out))
        .option("checkpointLocation", str(tmp_path / "s_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    live = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in score_bigram_frozen(docs, model).collect()
    }
    assert live == batch and len(batch) > 0


def test_lm_model_artifact_roundtrip_scores_in_fresh_session(spark, tmp_path: Path):
    """VERDICT r6 #3: the frozen model must survive as a REAL artifact —
    write_lm_model → read_lm_model in a fresh session (no shared temp
    views, no cached lineage from training) must reproduce the
    in-memory model's scores exactly, batch and streaming."""
    from egal_yet_another_earthquake_project_spark.llm.lm import (
        read_lm_model,
        write_lm_model,
    )

    docs = read_table(spark, SF, "documents")
    model = train_bigram_lm(docs)
    mdir = str(tmp_path / "lm_model")
    write_lm_model(model, mdir)

    fresh = spark.newSession()
    loaded = read_lm_model(fresh, mdir)
    assert (loaded["n"], loaded["v"], loaded["lam"]) == (
        model["n"],
        model["v"],
        model["lam"],
    )

    docs_fresh = read_table(fresh, SF, "documents")
    from_artifact = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in score_bigram_frozen(docs_fresh, loaded).collect()
    }
    in_memory = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in score_bigram_frozen(docs, model).collect()
    }
    assert from_artifact == in_memory and len(in_memory) > 0

    # and the streaming sink scores off the artifact, not the lineage
    src = tmp_path / "a_in"
    out = tmp_path / "a_scored"
    docs_fresh.coalesce(1).write.parquet(str(src / "b1"))
    stream = stream_parquet_dir(
        fresh, str(src) + "/*", docs_fresh.schema, max_files_per_trigger=1
    )
    q = (
        lm_score_sink(stream, loaded, str(out))
        .option("checkpointLocation", str(tmp_path / "a_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in fresh.read.parquet(str(out)).collect()
    }
    assert streamed == in_memory


def test_ppl_bucket_stream_drained_equals_batch(spark, tmp_path: Path):
    """Frozen-cutoff bucketing: two triggers through ppl_bucket_sink,
    drained, must label every doc exactly as the batch assignment with
    the same frozen (c33, c67) — and the frozen cutoffs must equal the
    ones the batch summary derives (same histogram grid)."""
    from egal_yet_another_earthquake_project_spark.llm.lm import (
        bucket_expr,
        perplexity_buckets,
        ppl_cutoffs,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        ppl_bucket_sink,
    )

    docs = read_table(spark, SF, "documents")
    model = train_bigram_lm(docs.filter("doc_id % 10 != 0"))
    scored_all = score_bigram_frozen(docs, model)
    cuts = ppl_cutoffs(scored_all)

    src = tmp_path / "p_in"
    out = tmp_path / "bucketed"
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(str(src / "b1"))
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(str(src / "b2"))
    stream = stream_parquet_dir(
        spark, str(src) + "/*", docs.schema, max_files_per_trigger=1
    )
    q = (
        ppl_bucket_sink(stream, model, cuts, str(out))
        .option("checkpointLocation", str(tmp_path / "p_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.doc_id: (r.nll, r.bucket)
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = {
        r.doc_id: (r.nll, r.bucket)
        for r in scored_all.withColumn(
            "bucket", bucket_expr(F.col("nll"), F.lit(cuts[0]), F.lit(cuts[1]))
        ).collect()
    }
    assert streamed == batch and len(batch) > 0
    # both triggers actually landed, and all three labels exist somewhere
    assert {r._batch_id for r in spark.read.parquet(str(out)).collect()} == {0, 1}
    assert {b for _, b in streamed.values()} == {"head", "middle", "tail"}
    # the summary's per-bucket counts agree with the drained labels
    summary = {
        r.bucket: r.n_docs for r in perplexity_buckets(scored_all).collect()
    }
    from collections import Counter

    assert summary == Counter(b for _, b in streamed.values())


def test_dsir_score_stream_drained_equals_batch_from_artifact(
    spark, tmp_path: Path
):
    """DSIR streaming twin: write_dsir_model → read_dsir_model in a
    FRESH session (no cached training lineage), stream the raw pool
    through dsir_score_sink in two triggers — the drained scores must
    equal the batch frozen scorer over the whole pool (stateless
    foreachBatch: the micro-batch plan IS the batch plan)."""
    from egal_yet_another_earthquake_project_spark.llm.dsir import (
        read_dsir_model,
        score_dsir_frozen,
        train_dsir_model,
        write_dsir_model,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        dsir_score_sink,
    )

    docs = read_table(spark, SF, "documents")
    raw = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    mdir = str(tmp_path / "dsir_model")
    write_dsir_model(train_dsir_model(raw, target), mdir)

    fresh = spark.newSession()
    loaded = read_dsir_model(fresh, mdir)
    raw_fresh = read_table(fresh, SF, "documents").filter(
        F.col("source") != "src0"
    )
    cut = raw_fresh.agg(
        F.percentile_approx("doc_id", 0.5).alias("c")
    ).collect()[0].c

    src = tmp_path / "d_in"
    out = tmp_path / "d_scored"
    raw_fresh.filter(F.col("doc_id") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    raw_fresh.filter(F.col("doc_id") >= F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = stream_parquet_dir(
        fresh, str(src) + "/*", raw_fresh.schema, max_files_per_trigger=1
    )
    q = (
        dsir_score_sink(stream, loaded, str(out))
        .option("checkpointLocation", str(tmp_path / "d_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    live = {
        (r.doc, r.n_grams, round(r.logw, 9))
        for r in fresh.read.parquet(str(out)).collect()
    }
    batch = {
        (r.doc, r.n_grams, round(r.logw, 9))
        for r in score_dsir_frozen(raw_fresh, loaded).collect()
    }
    assert live == batch and len(batch) > 0


def test_ppl_cutoffs_raises_clearly_on_empty_corpus(spark):
    """ADVICE r7: an empty (or all-null) scored frame used to surface
    as float(None) -> TypeError; train-time must say what went wrong."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm.lm import ppl_cutoffs

    empty = spark.createDataFrame([], "doc long, n_bigrams long, nll double")
    with pytest.raises(ValueError, match="empty training corpus"):
        ppl_cutoffs(empty)
    nulls = spark.createDataFrame(
        [(1, None, None)], "doc long, n_bigrams long, nll double"
    )
    with pytest.raises(ValueError, match="empty training corpus"):
        ppl_cutoffs(nulls)


def test_nb_classify_stream_drained_equals_batch_from_artifact(
    spark, tmp_path: Path
):
    """Persisted-NB streaming gate: train once into a model dir, stream
    the corpus through nb_classify_sink in two triggers, drain — the
    landed predictions must equal nb_classify_with_model on the whole
    corpus (per-document argmax: the split point can't matter). A
    marker-less model dir is refused at sink BUILD time."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm.classify import (
        nb_classify_with_model,
        read_nb_model,
        write_nb_model,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        nb_classify_sink,
    )

    docs = read_table(spark, SF, "documents")
    mdl = tmp_path / "nb_model"
    write_nb_model(docs, str(mdl))

    cut = docs.agg(F.percentile_approx("doc_id", 0.5).alias("c")).collect()[0].c
    src = tmp_path / "nb_in"
    out = tmp_path / "nb_scored"
    docs.filter(F.col("doc_id") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    docs.filter(F.col("doc_id") >= F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = stream_parquet_dir(
        spark, str(src) + "/*", docs.schema, max_files_per_trigger=1
    )
    q = (
        nb_classify_sink(stream, str(mdl), str(out))
        .option("checkpointLocation", str(tmp_path / "nb_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    live = {
        r.doc_id: (r.true_label, r.pred_label, r.score)
        for r in spark.read.parquet(str(out)).collect()
    }
    weights, consts = read_nb_model(spark, str(mdl))
    batch = {
        r.doc_id: (r.true_label, r.pred_label, r.score)
        for r in nb_classify_with_model(docs, weights, consts).collect()
    }
    assert live == batch and len(batch) > 0

    # partial model (no _COMPLETE) is refused at build time
    bad = tmp_path / "partial_model"
    (bad / "weights").mkdir(parents=True)
    with pytest.raises(ValueError, match="_COMPLETE"):
        nb_classify_sink(stream, str(bad), str(out))


def test_lr_classify_stream_drained_equals_batch_from_artifact(
    spark, tmp_path: Path
):
    """Persisted-LR streaming gate (the discriminative twin of the NB
    gate): train once into a model dir, stream the corpus through
    lr_classify_sink in two triggers, drain — the landed predictions
    must equal lr_classify on the whole corpus (inference is one
    broadcast join + a per-doc exact integer sum: per-document
    independent, so the split point can't matter). A marker-less model
    dir is refused at sink BUILD time."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm.lr import (
        lr_classify,
        read_lr_model,
        write_lr_model,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        lr_classify_sink,
    )

    docs = read_table(spark, SF, "documents")
    mdl = tmp_path / "lr_model"
    write_lr_model(docs, str(mdl))

    cut = docs.agg(F.percentile_approx("doc_id", 0.5).alias("c")).collect()[0].c
    src = tmp_path / "lr_in"
    out = tmp_path / "lr_scored"
    docs.filter(F.col("doc_id") < F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b1")
    )
    docs.filter(F.col("doc_id") >= F.lit(cut)).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = stream_parquet_dir(
        spark, str(src) + "/*", docs.schema, max_files_per_trigger=1
    )
    q = (
        lr_classify_sink(stream, str(mdl), str(out))
        .option("checkpointLocation", str(tmp_path / "lr_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    live = {
        r.doc_id: r.pred for r in spark.read.parquet(str(out)).collect()
    }
    weights = read_lr_model(spark, str(mdl))
    batch = {
        r.doc_id: r.pred
        for r in lr_classify(docs, weights).collect()
    }
    assert live == batch and len(batch) > 0

    # partial model (no _COMPLETE) is refused at build time
    bad = tmp_path / "lr_partial"
    (bad / "weights").mkdir(parents=True)
    with pytest.raises(ValueError, match="_COMPLETE"):
        lr_classify_sink(stream, str(bad), str(out))


def test_hybrid_search_stream_drained_equals_batch(spark, tmp_path: Path):
    """Retrieval serving (round 12): a query stream through
    hybrid_search_sink — PERSISTED BM25 index lexical side + PERSISTED
    IVF index dense side, RRF-fused per micro-batch — drained over two
    triggers must equal the batch composition row for row (the sink is
    stateless per query, so the micro-batch plan IS the batch plan),
    with _batch_id partitions proving replay idempotence."""
    from pyspark.sql.window import Window

    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        build_ivf_index,
        search_ivf_index,
    )
    from egal_yet_another_earthquake_project_spark.llm.search import rrf_fuse
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        build_bm25_index,
        search_bm25_index,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        hybrid_search_sink,
    )
    from egal_yet_another_earthquake_project_spark.workloads_llm import (
        HYBRID_QUERY_TEXTS,
    )

    docs = read_table(spark, SF, "documents")
    emb = read_table(spark, SF, "embeddings")
    bm_idx, ivf_idx = str(tmp_path / "bm25"), str(tmp_path / "ivf")
    build_bm25_index(docs, bm_idx, n_buckets=16)
    build_ivf_index(emb, ivf_idx, num_cells=16)

    texts = spark.createDataFrame(
        list(HYBRID_QUERY_TEXTS), "query_id long, qtext string"
    )
    queries = texts.join(
        emb.select(F.col("vec_id").alias("query_id"), "embedding"),
        "query_id",
    )

    def batch_side(qdf):
        lex = (
            search_bm25_index(spark, bm_idx, qdf.select("query_id", "qtext"))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("score").desc(), F.col("doc_id").asc()
                    )
                ),
            )
            .filter(F.col("rank") <= 20)
            .select("query_id", "doc_id", "rank")
        )
        dense = search_ivf_index(
            spark,
            ivf_idx,
            qdf.select(F.col("query_id").alias("vec_id"), "embedding"),
            k=20,
            nprobe=4,
            method="exact",
        ).select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
        )
        return rrf_fuse(lex, dense, topk=10)

    want = {
        tuple(r)
        for r in batch_side(queries)
        .select("query_id", "doc_id", "rrf_score", "rank")
        .collect()
    }

    src, out = tmp_path / "q_in", tmp_path / "results"
    queries.filter("query_id < 3").coalesce(1).write.parquet(str(src / "b1"))
    queries.filter("query_id >= 3").coalesce(1).write.parquet(str(src / "b2"))
    stream = stream_parquet_dir(
        spark, str(src) + "/*", queries.schema, max_files_per_trigger=1
    )
    q = (
        hybrid_search_sink(stream, bm_idx, ivf_idx, str(out))
        .option("checkpointLocation", str(tmp_path / "q_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    results = spark.read.parquet(str(out))
    got = {
        tuple(r)
        for r in results.select(
            "query_id", "doc_id", "rrf_score", "rank"
        ).collect()
    }
    assert got == want and len(want) == 50  # 5 queries × top-10
    assert {r._batch_id for r in results.select("_batch_id").distinct().collect()} == {0, 1}


def test_bm25_update_stream_drained_equals_full_build(spark, tmp_path: Path):
    """Streaming index MAINTENANCE (round 12): documents arriving over
    two triggers through bm25_update_sink — each micro-batch an O(batch)
    named-segment commit (b=<batch_id>), compaction inline past the
    segment threshold — must leave an index whose scores are
    BIT-identical to a from-scratch build over the full corpus, and a
    replayed commit must be a no-op even after compaction folded the
    segment away."""
    from egal_yet_another_earthquake_project_spark.llm.search import (
        bm25_scores_per_query,
    )
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        _segment_paths,
        build_bm25_index,
        search_bm25_index,
        update_bm25_index,
    )
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        resolve_index_dir,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        bm25_update_sink,
    )
    from egal_yet_another_earthquake_project_spark.workloads_llm import (
        HYBRID_QUERY_TEXTS,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    base = docs.filter("doc_id % 3 = 0")
    d1 = docs.filter("doc_id % 3 = 1")
    d2 = docs.filter("doc_id % 3 = 2")
    idx = str(tmp_path / "bm25")
    build_bm25_index(base, idx, n_buckets=16)

    src = tmp_path / "docs_in"
    d1.coalesce(1).write.parquet(str(src / "b1"))
    d2.coalesce(1).write.parquet(str(src / "b2"))
    stream = stream_parquet_dir(
        spark, str(src) + "/*", docs.schema, max_files_per_trigger=1
    )
    q = (
        bm25_update_sink(stream, idx, compact_if_segments=2)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    queries = spark.createDataFrame(
        list(HYBRID_QUERY_TEXTS), "query_id long, qtext string"
    )

    def key(rows):
        return {(r.query_id, r.doc_id): (r.score, r.n_terms) for r in rows}

    got = key(search_bm25_index(spark, idx, queries).collect())
    want = key(bm25_scores_per_query(docs, queries).collect())
    assert got == want and got
    # the threshold fired: base + b=0 + b=1 folded back to one segment
    segs = _segment_paths(spark, idx, resolve_index_dir(idx))
    assert len(segs) == 1 and not segs[0].startswith("v=")
    # replayed last commit (crash-after-compaction window): manifest no
    # longer lists b=1, last_applied remembers it -> no-op
    cur = resolve_index_dir(idx)
    assert update_bm25_index(d2, idx, segment_name="b=1") == int(
        cur.rsplit("v=", 1)[1]
    )
    assert key(search_bm25_index(spark, idx, queries).collect()) == want


def test_ivf_update_stream_appends_exactly_once_and_rebuild_folds(
    spark, tmp_path: Path
):
    """Streaming ANN maintenance (round 12): vectors arriving over two
    triggers through ivf_update_sink must equal the batch append twin
    (same frozen quantizer), a replayed commit must be a no-op both
    before AND after a rebuild folds the staged appends away, and a
    marker-less (crashed) append must stay invisible."""
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        ivf_update_sink,
    )

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.filter("vec_id % 3 = 0")
    d1 = emb.filter("vec_id % 3 = 1")
    d2 = emb.filter("vec_id % 3 = 2")

    idx = str(tmp_path / "ivf")
    twin = str(tmp_path / "ivf_twin")
    ai.build_ivf_index(base, idx, num_cells=8)
    ai.build_ivf_index(base, twin, num_cells=8)
    ai.append_ivf_index(spark, twin, d1)
    ai.append_ivf_index(spark, twin, d2)

    src = tmp_path / "vec_in"
    d1.coalesce(1).write.parquet(str(src / "b1"))
    d2.coalesce(1).write.parquet(str(src / "b2"))
    stream = stream_parquet_dir(
        spark, str(src) + "/*", emb.schema, max_files_per_trigger=1
    )
    q = (
        ivf_update_sink(stream, idx)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    queries = emb.filter("vec_id < 5")

    def topk(index_dir):
        return sorted(
            map(
                tuple,
                ai.search_ivf_index(spark, index_dir, queries, k=5, nprobe=8)
                .select("query_id", "neighbor_id", "cos", "rank")
                .collect(),
            )
        )

    drained = topk(idx)
    assert drained == topk(twin) and drained  # sink ≡ batch append twin

    # replayed last commit: marker present -> no-op (False)
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        staged_append_ivf_index,
    )

    assert staged_append_ivf_index(spark, idx, d2, batch_name="b=1") is False
    assert topk(idx) == drained

    # a crashed (marker-less) append stays invisible to every reader
    import os

    root = ai.resolve_index_dir(idx)
    os.makedirs(f"{root}/appends/b=9", exist_ok=True)
    d2.limit(3).selectExpr(
        "vec_id AS neighbor_id", "embedding AS uv", "CAST(0 AS INT) AS cell"
    ).write.parquet(f"{root}/appends/b=9/cells")
    assert topk(idx) == drained

    # rebuild folds appends into clean cells; replay after the fold is
    # still a no-op (applied.json memo), and results are unchanged
    # because unit vectors re-train to the same candidate geometry
    res = ai.maybe_rebuild_ivf_index(spark, idx, threshold=0.0)
    assert res["rebuilt"] is True
    root2 = ai.resolve_index_dir(idx)
    assert root2 != root
    assert not os.path.exists(f"{root2}/appends") or not os.listdir(
        f"{root2}/appends"
    )
    assert staged_append_ivf_index(spark, idx, d2, batch_name="b=1") is False
    n_after = (
        spark.read.parquet(f"{root2}/cells").count()
    )
    assert n_after == base.count() + d1.count() + d2.count()  # no dup rows


def test_index_sink_name_collision_raises_not_drops(spark, tmp_path: Path):
    """ADVICE r12 (medium): micro-batch ids restart at 0 for a new
    streaming query or a reset checkpoint, so a SECOND stream pointed at
    the same index used to silently drop its early batches (same segment
    name, different content -> treated as a replay no-op). Both
    maintenance paths now record the applied batch's row count and raise
    on a same-name different-content collision; a true replay (same
    content) stays a no-op; app_id namespacing avoids the collision
    entirely."""
    import pytest as _pytest

    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        staged_append_ivf_index,
    )
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        _segment_paths,
        build_bm25_index,
        update_bm25_index,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    base = docs.filter("doc_id % 3 = 0")
    d1 = docs.filter("doc_id % 3 = 1")
    d2 = docs.filter("doc_id % 3 = 2")  # different row count than d1

    # --- BM25 ---
    idx = str(tmp_path / "bm25")
    build_bm25_index(base, idx, n_buckets=16)
    update_bm25_index(d1, idx, segment_name="b=0")
    # true replay: same batch, same name -> no-op, no raise
    v = update_bm25_index(d1, idx, segment_name="b=0")
    assert v == int(ai.resolve_index_dir(idx).rsplit("v=", 1)[1])
    # collision: different batch, same name -> raise (was: silent drop)
    with _pytest.raises(ValueError, match="app_id"):
        update_bm25_index(d2, idx, segment_name="b=0")
    # the namespaced name commits fine
    update_bm25_index(d2, idx, segment_name="b=q2-0")
    segs = _segment_paths(spark, idx, ai.resolve_index_dir(idx))
    assert "segments/b=q2-0" in segs

    # --- IVF ---
    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    ebase = emb.filter("vec_id % 3 = 0")
    e1 = emb.filter("vec_id % 3 = 1")
    e2 = emb.filter("vec_id % 3 = 2")
    vidx = str(tmp_path / "ivf")
    ai.build_ivf_index(ebase, vidx, num_cells=8)
    assert staged_append_ivf_index(spark, vidx, e1, batch_name="b=0") is True
    # true replay -> no-op
    assert staged_append_ivf_index(spark, vidx, e1, batch_name="b=0") is False
    # collision -> raise
    with _pytest.raises(ValueError, match="app_id"):
        staged_append_ivf_index(spark, vidx, e2, batch_name="b=0")
    # namespaced name lands
    assert staged_append_ivf_index(spark, vidx, e2, batch_name="b=q2-0") is True

    # the guard survives a rebuild folding the appends away: the memo
    # now records row counts, so a post-fold same-name different-content
    # replay still raises (round 13 — the folded path was name-only)
    assert ai.maybe_rebuild_ivf_index(spark, vidx, threshold=0.0)["rebuilt"]
    assert staged_append_ivf_index(spark, vidx, e1, batch_name="b=0") is False
    with _pytest.raises(ValueError, match="app_id"):
        staged_append_ivf_index(spark, vidx, e2, batch_name="b=0")


def test_index_health_rows_per_commit_drained_equals_batch(
    spark, tmp_path: Path
):
    """VERDICT r12 #6: the maintenance sinks land index-health rows per
    commit; the FINAL batch's rows (wall-clock age excluded) must equal
    a direct batch computation over the drained index, and the
    documented thresholds trip: segment accretion past max_segments
    flips n_segments to ok=false; a delete-heavy index flips
    tombstone_fraction."""
    from egal_yet_another_earthquake_project_spark.llm.index_health import (
        bm25_index_health,
        ivf_index_health,
    )
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        build_bm25_index,
        delete_from_bm25_index,
        update_bm25_index,
    )
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        bm25_update_sink,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    base = docs.filter("doc_id % 3 = 0")
    d1 = docs.filter("doc_id % 3 = 1")
    d2 = docs.filter("doc_id % 3 = 2")
    idx = str(tmp_path / "bm25")
    build_bm25_index(base, idx, n_buckets=16)

    src = tmp_path / "docs_in"
    d1.coalesce(1).write.parquet(str(src / "b1"))
    d2.coalesce(1).write.parquet(str(src / "b2"))
    stream = stream_parquet_dir(
        spark, str(src) + "/*", docs.schema, max_files_per_trigger=1
    )
    health = str(tmp_path / "health")
    q = (
        bm25_update_sink(stream, idx, health_dir=health)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def rows(df):
        return {
            r.metric: (r.value, r.threshold, r.ok)
            for r in df.collect()
            if r.metric != "version_age_sec"
        }

    landed = spark.read.parquet(health)
    last = landed.filter(
        F.col("_batch_id")
        == landed.agg(F.max("_batch_id")).collect()[0][0]
    )
    direct = bm25_index_health(spark, idx)
    assert rows(last) == rows(direct)
    got = rows(direct)
    # base + 2 streamed segments, all healthy at default thresholds
    assert got["n_segments"] == (3.0, 8.0, True)
    assert got["tombstone_fraction"][2] is True

    # threshold trips: accrete past max_segments=2 -> ok=false
    tight = rows(bm25_index_health(spark, idx, max_segments=2))
    assert tight["n_segments"] == (3.0, 2.0, False)

    # delete a third of the corpus -> tombstone fraction ~0.5 of the
    # LIVE segment mass trips the 0.2 default
    delete_from_bm25_index(d1, idx)
    after = rows(bm25_index_health(spark, idx))
    assert after["tombstone_fraction"][2] is False
    assert after["n_delete_sidecars"][0] == 1.0

    # IVF twin: appends count as segments, tombstones as fraction
    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    vidx = str(tmp_path / "ivf")
    ai.build_ivf_index(emb.filter("vec_id % 2 = 0"), vidx, num_cells=8)
    ai.staged_append_ivf_index(
        spark, vidx, emb.filter("vec_id % 2 = 1"), batch_name="b=0"
    )
    h = rows(ivf_index_health(spark, vidx))
    assert h["n_segments"] == (1.0, 8.0, True)
    assert h["tombstone_fraction"][0] == 0.0
    ai.delete_from_ivf_index(
        spark, vidx, emb.filter("vec_id % 2 = 0").select("vec_id")
    )
    h2 = rows(ivf_index_health(spark, vidx))
    assert h2["tombstone_fraction"][2] is False  # half the rows dead
