"""DSIR importance-resampling invariants (llm/dsir.py).

Semantics: target-looking raw docs must score higher; selection is a
true Gumbel-top-k (heavy weights dominate). Determinism: weights and
the selected set are partitioning-invariant (the md5 contract shared
with llm/sampling.py). Scale: models join broadcast-hash, selection
plans a top-k heap, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.dsir import (
    dsir_log_weights,
    gumbel_topk,
    hashed_ngram_features,
)
from egal_yet_another_earthquake_project_spark.plans import inspect
from egal_yet_another_earthquake_project_spark.sources.files import read_table

from tests.conftest import TESTDATA_SMOKE

SF = "/root/testdata/sf0.001"


def _toy(spark):
    target = spark.createDataFrame(
        [(100 + i, "spark shuffle join spark agg spark") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (0, "spark shuffle spark join agg spark plan"),  # target-like
            (1, "cat dog bird fish cow horse goat"),
            (2, "red green blue yellow purple orange pink"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_target_like_docs_score_higher(spark):
    raw, target = _toy(spark)
    w = {r.doc: r.logw for r in dsir_log_weights(raw, target).collect()}
    assert len(w) == 4
    assert w[0] == max(w.values()), w
    # off-target docs share no gram with the target: strictly below
    assert all(w[0] > w[d] for d in (1, 2, 3)), w


def test_weights_stable_under_repartitioning(spark):
    docs = read_table(spark, SF, "documents")
    raw = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    a = {
        (r.doc, round(r.logw, 9))
        for r in dsir_log_weights(raw, target).collect()
    }
    b = {
        (r.doc, round(r.logw, 9))
        for r in dsir_log_weights(
            raw.repartition(13), target.repartition(7)
        ).collect()
    }
    assert a == b
    assert len(a) == raw.count()


def test_unseen_grams_take_the_smoothing_floor(spark):
    """A raw doc whose grams appear in NEITHER model side's vocabulary
    intersection still gets a finite weight (add-one smoothing), never
    NULL/±inf — the frozen-LM convention."""
    raw, target = _toy(spark)
    rows = dsir_log_weights(raw, target).collect()
    assert all(r.logw is not None for r in rows)
    assert all(abs(r.logw) < 1e6 for r in rows)


def test_gumbel_topk_prefers_heavy_weights_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, 10.0 if i < 100 else -10.0) for i in range(200)],
        "doc long, logw double",
    )
    sel = gumbel_topk(df, "doc", "logw", k=50)
    picked = {r.doc for r in sel.collect()}
    assert len(picked) == 50
    # a 20-nat gap: P(any light doc wins) ~ 1e-7 — all picks are heavy
    assert all(d < 100 for d in picked)
    again = {r.doc for r in gumbel_topk(df.repartition(17), "doc", "logw", k=50).collect()}
    assert picked == again


def test_feature_counts_cap_at_bucket_space(spark):
    raw, _ = _toy(spark)
    f = hashed_ngram_features(raw, buckets=8)
    assert f.agg(F.max("bucket")).first()[0] < 8
    assert f.agg(F.min("bucket")).first()[0] >= 0
    # per-doc gram mass survives the hashing: 7 unigrams + 6 bigrams
    per_doc = {r.doc: r.s for r in f.groupBy("doc").agg(F.sum("cnt").alias("s")).collect()}
    assert all(v == 13 for v in per_doc.values()), per_doc


def test_frozen_scorer_matches_in_plan_weights(spark):
    """score_dsir_frozen against a model trained on the same raw pool
    must reproduce dsir_log_weights exactly — the equality that lets
    the streaming sink and the CLI score off the frozen artifact."""
    from egal_yet_another_earthquake_project_spark.llm.dsir import (
        score_dsir_frozen,
        train_dsir_model,
    )

    docs = read_table(spark, SF, "documents")
    raw = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    model = train_dsir_model(raw, target)
    frozen = {
        (r.doc, r.n_grams, round(r.logw, 9))
        for r in score_dsir_frozen(raw, model).collect()
    }
    in_plan = {
        (r.doc, r.n_grams, round(r.logw, 9))
        for r in dsir_log_weights(raw, target).collect()
    }
    assert frozen == in_plan and len(in_plan) > 0


def test_dsir_weights_plan_broadcasts_models(spark):
    from egal_yet_another_earthquake_project_spark import workloads

    df = workloads.QUERIES["dsir_weights"](spark, TESTDATA_SMOKE)
    plan = inspect.formatted_plan(df)
    assert inspect.uses_broadcast_join(df)
    # the corpus-scale feature frame must never sort-merge against a model
    assert "SortMergeJoin" not in plan, plan


def test_dsir_resample_plans_a_topk_heap(spark):
    from egal_yet_another_earthquake_project_spark import workloads

    df = workloads.QUERIES["dsir_resample"](spark, TESTDATA_SMOKE)
    plan = inspect.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
