"""Hashed-feature logistic regression (llm/lr): planted-separable
learning, integer-grid determinism under repartitioning, empty-doc
bias handling, and the broadcast-model plan shape.

The declared lr_weights / lr_score / lr_auc queries prove bit-exact
epoch replay against the DuckDB oracle; these tests pin the training
semantics on frames where the right answer is planted by construction.
"""

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import lr


def _planted(spark):
    # 30 positives marked by 'aardvark zebra', 30 negatives by
    # 'quartz onyx', a shared 'common' token in both.
    rows = []
    for i in range(30):
        rows.append((i, "en", "aardvark zebra aardvark common"))
        rows.append((100 + i, "de", "quartz onyx quartz common"))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_lr_learns_planted_separable_labels(spark):
    docs = _planted(spark)
    w = lr.lr_train(docs)
    preds = lr.lr_classify(docs, w).collect()
    assert all(r.pred == r.label for r in preds)
    # the model is the full grid: DIM buckets + bias
    assert w.count() == lr.DIM + 1


def test_lr_weights_partitioning_invariant(spark):
    """Integer-grid GD is EXACT: margins and gradients are integer
    sums, the sigmoid is re-quantized per doc before aggregation — so
    weights are bit-identical however the input is partitioned."""
    docs = _planted(spark)
    w1 = {r.bucket: r.w for r in lr.lr_train(docs).collect()}
    w2 = {
        r.bucket: r.w
        for r in lr.lr_train(docs.repartition(7, "lang")).collect()
    }
    assert w1 == w2


def test_lr_empty_docs_score_on_bias_alone(spark):
    """A document with no tokens still gets a feature row (the bias),
    hence a margin and a prediction — it never drops out of scoring."""
    docs = _planted(spark).unionByName(
        _planted(spark)
        .sparkSession.createDataFrame(
            [(999, "en", ""), (998, "de", None)],
            "doc_id long, lang string, text string",
        )
    )
    w = lr.lr_train(docs)
    scored = {r.doc_id: r for r in lr.lr_scores(docs, w).collect()}
    assert 999 in scored and 998 in scored
    bias = {r.bucket: r.w for r in w.collect()}[lr.DIM]
    assert scored[999].score == float(bias)
    assert scored[998].score == float(bias)


def test_lr_margin_join_broadcasts_model_side(spark):
    """The model side (≤ DIM+1 rows) must broadcast: a shuffle join on
    bucket would exchange the corpus-scale feature stream against a
    1025-row dim table."""
    docs = _planted(spark)
    feats = lr.hashed_features(docs)
    weights = spark.range(lr.DIM + 1).select(
        F.col("id").alias("bucket"), F.lit(0).cast("long").alias("w")
    )
    plan = lr.lr_margins(feats, weights)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
