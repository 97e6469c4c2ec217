"""Streaming LM scoring: a frozen model judges each micro-batch.

The batch query ``bigram_nll`` trains and scores in one plan; the
per-crawl-drop monitor needs the OPPOSITE split — train once on the
trusted corpus (``llm.lm.train_bigram_lm``), then score every incoming
batch against that frozen artifact. Scoring is stateless per document
(a document arrives whole in one row), so the streaming form carries
ZERO streaming state: ``foreachBatch`` applies the batch scorer —
vocabulary-scale model joins, (N, V) as plan literals — and lands each
batch's scores in a ``_batch_id``-keyed partition, the same
replay-idempotent shape as ``silver_with_quarantine`` (a restarted
batch overwrites its own partition instead of duplicating rows).

Contrast with ``stateful.drift_stream``: drift is a running PER-SOURCE
aggregate (needs bounded per-key state); NLL is a per-document score
(needs none). Picking the stateless form when state isn't required is
the scale decision — no state store, no checkpointed growth, and the
micro-batch plan is exactly the batch plan.

No counterpart in the reference (structured sensor data, no text
scoring); part of the LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from egal_yet_another_earthquake_project_spark.llm.lm import (
    bucket_expr,
    score_bigram_frozen,
)


def lm_score_sink(
    stream: DataFrame,
    model: dict,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataStreamWriter:
    """``writeStream`` writer scoring each micro-batch with the frozen
    bigram model into ``{out_dir}/_batch_id=N/`` partitions.

    Replay-idempotent: dynamic partition overwrite scoped to the
    batch's own ``_batch_id`` partition, so checkpoint recovery that
    re-runs a batch replaces its output instead of appending twice.
    Reading ``out_dir`` yields the running scored corpus; a drained
    stream equals the batch scorer on the union of batches
    (drained≡batch test in tests/test_streaming_scoring.py).

    "Train once" is enforced, not advisory: ``train_bigram_lm`` persists
    the count frames (and ``read_lm_model`` serves them off parquet), so
    the per-micro-batch model joins scan a materialized artifact — the
    training lineage never re-runs inside the stream.
    """

    def _score(batch: DataFrame, batch_id: int) -> None:
        scored = score_bigram_frozen(batch, model, id_col, text_col)
        (
            scored.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_score)


def dsir_score_sink(
    stream: DataFrame,
    model: dict,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataStreamWriter:
    """``writeStream`` writer scoring each micro-batch's DSIR
    importance log-weight against a FROZEN target/raw model
    (``llm.dsir.train_dsir_model`` / ``read_dsir_model``) into
    ``{out_dir}/_batch_id=N/`` partitions — the continuous-crawl form
    of data selection: the curated target distribution is fixed, every
    incoming drop gets its target-affinity score as it lands.

    Stateless per document (a doc arrives whole in one row), so zero
    streaming state — the micro-batch plan IS the batch plan: one
    doc-scale feature aggregate plus two ≤B-row broadcast artifact
    joins with the totals as plan literals. Replay-idempotent via
    dynamic partition overwrite on ``_batch_id``, like
    :func:`lm_score_sink`; drained ≡ batch scoring on the union of
    batches (tests/test_streaming_scoring.py).
    """
    from egal_yet_another_earthquake_project_spark.llm.dsir import (
        score_dsir_frozen,
    )

    def _score(batch: DataFrame, batch_id: int) -> None:
        scored = score_dsir_frozen(batch, model, id_col, text_col)
        (
            scored.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_score)


def ppl_bucket_sink(
    stream: DataFrame,
    model: dict,
    cutoffs: tuple[float, float],
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataStreamWriter:
    """``writeStream`` writer scoring each micro-batch with the frozen
    bigram model AND labeling it head/middle/tail against FROZEN tercile
    cutoffs (``llm.lm.ppl_cutoffs`` on the reference corpus at train
    time) — the streaming half of the CCNet bucketing pass
    (``llm.lm.perplexity_buckets``).

    The cutoffs are plan literals, the same frozen-artifact pattern as
    ``stateful.drift_stream``'s vocabulary: a monitor's bucket
    boundaries must come from the trusted reference distribution, not
    drift with whatever batch arrives (recomputing terciles per
    micro-batch would relabel history). Bucketing is therefore stateless
    per document — zero streaming state — and the micro-batch plan is
    exactly the batch plan, so drained ≡ batch assignment with the same
    cutoffs (tested). Output partitions are ``_batch_id``-keyed with
    dynamic partition overwrite: replay-idempotent like
    :func:`lm_score_sink`.
    """
    c33, c67 = float(cutoffs[0]), float(cutoffs[1])

    def _score(batch: DataFrame, batch_id: int) -> None:
        scored = score_bigram_frozen(batch, model, id_col, text_col)
        (
            scored.withColumn(
                "bucket", bucket_expr(F.col("nll"), F.lit(c33), F.lit(c67))
            )
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_score)


def nb_classify_sink(
    stream: DataFrame,
    model_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataStreamWriter:
    """``writeStream`` writer classifying each micro-batch against a
    PERSISTED Naive-Bayes model (``llm.classify.write_nb_model``:
    weights + consts parquet under a ``_COMPLETE`` marker) into
    ``{out_dir}/_batch_id=N/`` partitions — the streaming half of the
    trained language-ID / quality gate: the model is fixed at sink
    build, every crawl drop gets its predicted class as it lands.

    Scoring is per-document independent (argmax over ≤ #classes rows of
    one doc's scores — the window partitions on doc_id, never across
    documents), so the micro-batch plan IS the batch plan and a drained
    stream equals ``nb_classify_with_model`` on the union of batches
    (drained≡batch test in tests/test_streaming_scoring.py). The model
    frames scan a materialized artifact — training lineage never
    re-runs inside the stream; ``read_nb_model`` refuses a marker-less
    (partially written) model at sink BUILD time, not mid-stream.
    Replay-idempotent via dynamic partition overwrite on ``_batch_id``.
    """
    from egal_yet_another_earthquake_project_spark.llm.classify import (
        nb_classify_with_model,
        read_nb_model,
    )

    weights, consts = read_nb_model(stream.sparkSession, model_dir)

    def _score(batch: DataFrame, batch_id: int) -> None:
        if id_col != "doc_id":
            batch = batch.withColumnRenamed(id_col, "doc_id")
        scored = nb_classify_with_model(batch, weights, consts, text_col)
        (
            scored.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_score)


def lr_classify_sink(
    stream: DataFrame,
    model_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataStreamWriter:
    """``writeStream`` writer scoring each micro-batch against a
    PERSISTED logistic-regression model (``llm.lr.write_lr_model``:
    integer-grid weights under a ``_COMPLETE`` marker) into
    ``{out_dir}/_batch_id=N/`` — the discriminative twin of
    :func:`nb_classify_sink`. Inference is one broadcast join of the
    ≤DIM+1-row model against the batch's hashed features plus a per-doc
    integer sum — exact arithmetic, per-document independent, so a
    drained stream equals ``lr_classify`` on the union of batches
    (drained≡batch test in tests/test_streaming_scoring.py).
    ``read_lr_model`` refuses a marker-less model at sink BUILD time.
    Replay-idempotent via dynamic partition overwrite."""
    from egal_yet_another_earthquake_project_spark.llm.lr import (
        lr_classify,
        read_lr_model,
    )

    weights = read_lr_model(stream.sparkSession, model_dir)

    def _score(batch: DataFrame, batch_id: int) -> None:
        if id_col != "doc_id":
            batch = batch.withColumnRenamed(id_col, "doc_id")
        scored = lr_classify(batch, weights, text_col).drop("label")
        (
            scored.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_score)


def dq_monitor_sink(
    stream: DataFrame,
    checks: list,
    out_dir: str,
) -> DataStreamWriter:
    """``writeStream`` writer running a declarative data-quality suite
    (``operators/quality.run_checks`` — null/unique/range/accepted-set
    compiled into ONE aggregation scan) over EACH micro-batch and
    landing the per-batch report into ``{out_dir}/_batch_id=N/`` — the
    drift monitor a firehose runs continuously: the report is per-drop
    by design (a whole-corpus metric would need the corpus; the monitor
    answers "is THIS drop healthy"). Replay-idempotent via dynamic
    partition overwrite, like the scoring sinks above; empty batches
    write an empty partition (metrics NULL), never a crash."""
    from egal_yet_another_earthquake_project_spark.operators.quality import (
        run_checks,
    )

    def _report(batch: DataFrame, batch_id: int) -> None:
        (
            run_checks(batch, checks)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_report)


def psi_monitor_sink(
    stream: DataFrame,
    ref: DataFrame,
    col: str,
    out_dir: str,
    bins: int = 10,
) -> DataStreamWriter:
    """``writeStream`` writer computing the Population Stability Index
    of each micro-batch's ``col`` distribution against a FROZEN
    reference (``operators/stats.psi_profile``; the reference range is
    collected once at sink build — the frozen-cutoffs pattern of
    :func:`ppl_bucket_sink`) into ``{out_dir}/_batch_id=N/`` — the
    per-drop drift gate: a drop whose PSI exceeds the pipeline's
    threshold gets quarantined before it pollutes the corpus. The
    reference frame should be a materialized table (its bin histogram
    is re-read per batch as an artifact scan, never recomputed
    lineage). Replay-idempotent via dynamic partition overwrite."""
    from egal_yet_another_earthquake_project_spark.operators.stats import (
        psi_profile,
        psi_reference_stats,
    )

    stats = psi_reference_stats(ref, col)

    def _psi(batch: DataFrame, batch_id: int) -> None:
        (
            psi_profile(batch, ref, col, bins=bins, stats=stats)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_psi)


def hybrid_search_sink(
    queries_stream: DataFrame,
    bm25_index_dir: str,
    ivf_index_dir: str,
    out_dir: str,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    vec_col: str = "embedding",
    topk: int = 10,
    k_side: int = 20,
    nprobe: int = 4,
) -> DataStreamWriter:
    """``writeStream`` writer serving HYBRID retrieval over a query
    stream — the production shape of the ``hybrid_index_search``
    declared query: each micro-batch of (query_id, qtext, embedding)
    rows is ranked against the PERSISTED BM25 inverted index (lexical
    side, static term-bucket pruning) and the PERSISTED IVF index
    (dense side, probed-cell pruning), RRF-fused, and landed under
    ``{out_dir}/_batch_id=N`` — the retrieval-API backend a RAG stack
    batches against.

    Stateless per query (a query arrives whole in one row), so zero
    streaming state — the micro-batch plan IS the batch plan, which is
    exactly what the drained≡batch test asserts. Index versions resolve
    per batch (one CURRENT read), so a rebuild cuts over cleanly
    between triggers. Replay-idempotent via dynamic partition
    overwrite, like every scoring sink in this module."""
    from pyspark.sql.window import Window

    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        search_ivf_index,
    )
    from egal_yet_another_earthquake_project_spark.llm.search import rrf_fuse
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        search_bm25_index,
    )

    def _search(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        lex = (
            search_bm25_index(
                spark,
                bm25_index_dir,
                batch.select(query_id_col, query_text_col),
                query_id_col=query_id_col,
                query_text_col=query_text_col,
            )
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy(query_id_col).orderBy(
                        F.col("score").desc(), F.col("doc_id").asc()
                    )
                ),
            )
            .filter(F.col("rank") <= int(k_side))
            .select(query_id_col, "doc_id", "rank")
        )
        dense = search_ivf_index(
            spark,
            ivf_index_dir,
            batch.select(
                F.col(query_id_col).alias("vec_id"), F.col(vec_col)
            ),
            k=int(k_side),
            nprobe=int(nprobe),
            method="exact",
        ).select(
            F.col("query_id").alias(query_id_col),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
        (
            rrf_fuse(lex, dense, query_col=query_id_col, topk=int(topk))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return queries_stream.writeStream.foreachBatch(_search)


def bm25_update_sink(
    docs_stream: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_if_segments: int | None = None,
    app_id: str | None = None,
    health_dir: str | None = None,
) -> DataStreamWriter:
    """``writeStream`` writer that keeps a persisted BM25 inverted
    index CURRENT as documents arrive — streaming index MAINTENANCE
    (``hybrid_search_sink`` is the serving side). Each micro-batch
    tokenizes ALONE into an immutable segment named ``b=<batch_id>``
    and commits by the atomic manifest flip: O(batch) work, the base
    postings never rewritten, and a reader (including a concurrent
    ``hybrid_search_sink``) always resolves one complete version.

    Replay-idempotent WITHOUT dynamic partition overwrite: the segment
    name is the batch id, so a replayed batch whose commit already
    landed is a manifest no-op, and one whose commit crashed before the
    flip re-stages the same segment and commits — exactly once in
    effect, per ``update_bm25_index``'s ``segment_name`` contract.
    ``compact_if_segments`` folds the accreted segments back to one
    whenever the count exceeds it (the small-files compaction cadence,
    inline because maintenance is single-writer).

    ``app_id`` namespaces the segment names (``b=<app_id>-<batch_id>``,
    the Delta ``txnAppId`` pattern) — REQUIRED when more than one
    streaming query may ever write this index, or a checkpoint may be
    reset: micro-batch ids restart at 0 per query, and without a
    namespace a second query's early batches would collide with the
    first's (the manifest additionally records per-segment row counts
    and update_bm25_index raises on a same-name different-content
    collision rather than silently dropping the batch — ADVICE r12).

    ``health_dir`` lands :func:`llm.index_health.bm25_index_health`
    rows under ``{health_dir}/_batch_id=N/`` AFTER each commit (and
    after any inline compaction) — the per-commit staleness/segment/
    tombstone monitor (VERDICT r12 #6), replay-idempotent via dynamic
    partition overwrite like every monitor sink."""
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        _segment_paths,
        compact_bm25_index,
        update_bm25_index,
    )
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        resolve_index_dir,
    )

    def _update(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        update_bm25_index(
            batch.select(id_col, text_col),
            index_dir,
            id_col=id_col,
            text_col=text_col,
            segment_name=(
                f"b={app_id}-{batch_id}" if app_id else f"b={batch_id}"
            ),
        )
        if compact_if_segments is not None:
            n = len(
                _segment_paths(spark, index_dir, resolve_index_dir(index_dir))
            )
            if n > int(compact_if_segments):
                compact_bm25_index(spark, index_dir)
        if health_dir is not None:
            from egal_yet_another_earthquake_project_spark.llm.index_health import (
                bm25_index_health,
            )

            (
                bm25_index_health(spark, index_dir)
                .withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(health_dir)
            )

    return docs_stream.writeStream.foreachBatch(_update)


def ivf_update_sink(
    vectors_stream: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_if_imbalance: float | None = None,
    app_id: str | None = None,
    health_dir: str | None = None,
) -> DataStreamWriter:
    """``writeStream`` writer that keeps a persisted IVF index CURRENT
    as vectors arrive — the ANN side of the maintenance matrix
    (``bm25_update_sink`` is the lexical side, ``hybrid_search_sink``
    the serving side). Each micro-batch is assigned to the FROZEN
    quantizer and lands as a staged sub-index ``appends/b=<batch_id>``
    whose ``_COMPLETE`` marker is written LAST — exactly-once in
    effect: a replayed batch whose commit landed (marker present, or
    the name folded into ``applied.json`` by an interleaved rebuild) is
    a no-op, and a crash mid-write leaves an invisible dir the replay
    overwrites. Readers (search, the semantic gate, cell stats) see
    base cells ∪ complete appends atomically per batch.

    ``rebuild_if_imbalance`` runs the imbalance-triggered rebuild after
    each commit (single-writer maintenance, like ``bm25_update_sink``'s
    inline compaction): the rebuild folds base + appends − tombstones
    into clean cells for the next version and cuts over atomically
    between triggers.

    ``app_id`` namespaces the staged batch names
    (``b=<app_id>-<batch_id>``, the Delta ``txnAppId`` pattern) — see
    :func:`bm25_update_sink`: batch ids restart per query/checkpoint,
    and the ``_COMPLETE`` marker's recorded row count makes a same-name
    different-content collision raise instead of silently dropping.

    ``health_dir`` lands :func:`llm.index_health.ivf_index_health`
    rows per commit — see :func:`bm25_update_sink`."""
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        maybe_rebuild_ivf_index,
        staged_append_ivf_index,
    )

    def _update(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        staged_append_ivf_index(
            spark,
            index_dir,
            batch.select(id_col, vec_col),
            batch_name=(
                f"b={app_id}-{batch_id}" if app_id else f"b={batch_id}"
            ),
            id_col=id_col,
            vec_col=vec_col,
        )
        if rebuild_if_imbalance is not None:
            maybe_rebuild_ivf_index(
                spark, index_dir, threshold=float(rebuild_if_imbalance)
            )
        if health_dir is not None:
            from egal_yet_another_earthquake_project_spark.llm.index_health import (
                ivf_index_health,
            )

            (
                ivf_index_health(spark, index_dir)
                .withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(health_dir)
            )

    return vectors_stream.writeStream.foreachBatch(_update)
