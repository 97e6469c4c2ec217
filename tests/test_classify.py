"""Naive-Bayes classifier (llm.classify): planted-separation fixtures.

The oracle parity suite verifies the declared queries bit-for-bit
against DuckDB; these tests pin the SEMANTICS on corpora where the
right answer is known by construction: separable vocabularies classify
correctly, train/score are separable frames, empty documents fall back
to the prior, and ties break deterministically on the class label.
"""

import pytest

from egal_yet_another_earthquake_project_spark.llm import classify as lcls


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_nb_classify_separable_vocabularies(spark):
    """Classes with disjoint vocabularies classify perfectly — including
    docs whose token MIX leans one way despite one shared token."""
    rows = [
        (1, "aaa bbb aaa bbb aaa", "en"),
        (2, "bbb aaa aaa aaa", "en"),
        (3, "xxx yyy xxx yyy zzz", "fr"),
        (4, "yyy zzz zzz xxx", "fr"),
        (5, "aaa aaa bbb shared", "en"),
        (6, "xxx yyy shared", "fr"),
    ]
    out = {r.doc_id: r for r in lcls.nb_classify(_df(spark, rows)).collect()}
    assert len(out) == 6
    for did, _, lang in rows:
        assert out[did].pred_label == lang, did
        assert out[did].true_label == lang


def test_nb_classify_scores_new_docs_with_trained_model(spark):
    """train= is a separate frame: the model learned on the labeled
    slice scores UNSEEN docs; unseen-vocabulary tokens contribute only
    smoothing mass, so the prediction follows the known tokens."""
    train = _df(
        spark,
        [
            (1, "dog cat dog bird", "animal"),
            (2, "cat cat dog", "animal"),
            (3, "bolt nut wrench", "tool"),
            (4, "wrench bolt bolt", "tool"),
        ],
    )
    score = _df(
        spark,
        [
            (10, "dog bird NEVERSEEN", "animal"),
            (11, "bolt wrench NEVERSEEN", "tool"),
        ],
    )
    out = {
        r.doc_id: r.pred_label
        for r in lcls.nb_classify(score, train=train).collect()
    }
    assert out == {10: "animal", 11: "tool"}


def test_nb_empty_doc_scores_on_prior_alone(spark):
    """A zero-token document still gets exactly one prediction: the
    majority class (the largest ln prior), not a dropped row."""
    rows = [
        (1, "aaa aaa", "en"),
        (2, "bbb aaa", "en"),
        (3, "xxx", "fr"),
        (4, "   ", "fr"),  # normalizes to zero tokens
    ]
    out = {r.doc_id: r for r in lcls.nb_classify(_df(spark, rows)).collect()}
    assert len(out) == 4
    # en has 2 docs, fr has 2 docs -> tie on prior; n_d = 0 makes the
    # denominator term vanish too, so the tiebreak is the class label
    assert out[4].pred_label == "en"


def test_nb_argmax_tiebreak_is_class_label(spark):
    """Perfectly symmetric corpus: every class score ties, so the
    winner must be the lexicographically first class — deterministic
    across engines and partitionings."""
    rows = [
        (1, "tok", "b"),
        (2, "tok", "a"),
    ]
    out = {r.doc_id: r.pred_label for r in lcls.nb_classify(_df(spark, rows)).collect()}
    assert out == {1: "a", 2: "a"}


def test_nb_confusion_counts_match_classify(spark):
    rows = [
        (1, "aaa bbb", "en"),
        (2, "aaa aaa", "en"),
        (3, "xxx yyy", "fr"),
    ]
    conf = {
        (r.true_label, r.pred_label): r.n
        for r in lcls.nb_confusion(_df(spark, rows)).collect()
    }
    assert sum(conf.values()) == 3
    assert conf[("en", "en")] == 2 and conf[("fr", "fr")] == 1


def test_nb_token_weights_and_constants_shapes(spark):
    """Model frames have the documented shapes: one row per nonzero
    (token, class) pair; one row per class with finite constants."""
    import math

    rows = [(1, "aaa bbb aaa", "en"), (2, "bbb ccc", "fr")]
    df = _df(spark, rows)
    w = {(r.tok, r.cls): r.ctc for r in lcls.nb_token_weights(df).collect()}
    assert w == {("aaa", "en"): 2, ("bbb", "en"): 1,
                 ("bbb", "fr"): 1, ("ccc", "fr"): 1}
    consts = {r.cls: r for r in lcls.nb_class_constants(df).collect()}
    assert set(consts) == {"en", "fr"}
    # priors: ln(1/2) each; denominators: ln(N_c + V) with V=3
    assert consts["en"].ln_prior == pytest.approx(math.log(0.5))
    assert consts["en"].ln_denom == pytest.approx(math.log(3 + 3))
    assert consts["fr"].ln_denom == pytest.approx(math.log(2 + 3))
