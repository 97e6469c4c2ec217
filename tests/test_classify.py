"""Naive-Bayes classifier (llm.classify): planted-separation fixtures.

The oracle parity suite verifies the declared queries bit-for-bit
against DuckDB; these tests pin the SEMANTICS on corpora where the
right answer is known by construction: separable vocabularies classify
correctly, train/score are separable frames, empty documents fall back
to the prior, and ties break deterministically on the class label.
"""

import pytest

from pyspark.sql import functions as F

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


def test_binary_auc_known_values(spark):
    """Hand-checkable AUC: perfect separation = 1.0, perfect inversion
    = 0.0, and a tie-heavy case against the midrank formula computed by
    hand."""
    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    perfect = spark.createDataFrame(
        [(1, 0.9, True), (2, 0.8, True), (3, 0.2, False), (4, 0.1, False)],
        "doc_id long, score double, label boolean",
    )
    r = lmet.binary_auc(perfect).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)

    inverted = perfect.selectExpr("doc_id", "-score AS score", "label")
    assert lmet.binary_auc(inverted).collect()[0].auc == 0.0

    # ties: scores [1,1,1,2] labels [+,-,-,+]
    # midranks: ties at 1 -> (1+2+3)/3 = 2; score 2 -> rank 4
    # ranksum_pos = 2 + 4 = 6; auc = (6 - 2*3/2) / (2*2) = 0.75
    tied = spark.createDataFrame(
        [(1, 1.0, True), (2, 1.0, False), (3, 1.0, False), (4, 2.0, True)],
        "doc_id long, score double, label boolean",
    )
    assert lmet.binary_auc(tied).collect()[0].auc == 0.75


def test_binary_auc_single_class_is_null(spark):
    """AUC is undefined with one class present: NULL, not a fake 0.5."""
    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    one = spark.createDataFrame(
        [(1, 0.9, True), (2, 0.1, True)],
        "doc_id long, score double, label boolean",
    )
    r = lmet.binary_auc(one).collect()[0]
    assert r.n_pos == 2 and r.n_neg == 0 and r.auc is None


def test_binary_auc_matches_per_row_rank_formula(spark):
    """Randomized cross-check: the bucketed grouped-score computation
    equals the per-row midrank formula computed in plain Python."""
    import random

    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    rng = random.Random(11)
    rows = [
        (i, round(rng.choice([0.1, 0.25, 0.25, 0.7, 1.3, 1.3, 2.0]) , 4),
         rng.random() < 0.4)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label boolean")
    got = lmet.binary_auc(df).collect()[0]

    srt = sorted(rows, key=lambda r: r[1])
    # midranks per tie group
    ranks, i = {}, 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j][1] == srt[i][1]:
            j += 1
        mid = (i + 1 + j) / 2.0
        ranks[srt[i][1]] = mid
        i = j
    n_pos = sum(1 for r in rows if r[2])
    n_neg = len(rows) - n_pos
    ranksum = sum(ranks[r[1]] for r in rows if r[2])
    expect = round((ranksum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6)
    assert (got.n_pos, got.n_neg) == (n_pos, n_neg)
    assert got.auc == pytest.approx(expect, abs=1e-9)


def test_calibration_table_bands_and_fractions(spark):
    """Exact deciles over (score, id): 20 rows -> 10 bands of 2; the
    positive fraction per band tracks the planted monotone labels."""
    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    rows = [(i, i / 10.0, i >= 10) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, score double, label boolean")
    bands = {r.band: r for r in lmet.calibration_table(df, k=10).collect()}
    assert len(bands) == 10
    assert all(b.n == 2 for b in bands.values())
    assert bands[1].frac_pos == 0.0 and bands[10].frac_pos == 1.0
    assert bands[6].frac_pos == 1.0  # rows 10,11 land in band 6


def test_average_precision_known_values(spark):
    """AP: perfect separation = 1.0; hand-computed tie case. Scores
    [2,1,1,1] labels [+,+,-,-]: thresholds desc 2 (cum 1/1), 1
    (cum 2/4) -> AP = (1/2)*1 + (1/2)*(2/4) = 0.75."""
    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    perfect = spark.createDataFrame(
        [(1, 0.9, True), (2, 0.8, True), (3, 0.2, False), (4, 0.1, False)],
        "doc_id long, score double, label boolean",
    )
    r = lmet.average_precision(perfect).collect()[0]
    assert (r.n_pos, r.n_neg, r.ap) == (2, 2, 1.0)

    tied = spark.createDataFrame(
        [(1, 2.0, True), (2, 1.0, True), (3, 1.0, False), (4, 1.0, False)],
        "doc_id long, score double, label boolean",
    )
    assert lmet.average_precision(tied).collect()[0].ap == 0.75

    none_pos = spark.createDataFrame(
        [(1, 0.9, False), (2, 0.1, False)],
        "doc_id long, score double, label boolean",
    )
    assert lmet.average_precision(none_pos).collect()[0].ap is None


def test_average_precision_matches_python_replay(spark):
    """Randomized cross-check of the descending-cumsum identity against
    a per-threshold Python replay."""
    import random

    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    rng = random.Random(7)
    rows = [
        (i, round(rng.choice([0.1, 0.4, 0.4, 0.8, 1.5, 1.5, 3.0]), 4),
         rng.random() < 0.35)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label boolean")
    got = lmet.average_precision(df).collect()[0]

    by_s: dict = {}
    for _, s, y in rows:
        p, t = by_s.get(s, (0, 0))
        by_s[s] = (p + int(y), t + 1)
    n_pos = sum(p for p, _ in by_s.values())
    cpos = ctot = 0
    ap = 0.0
    for s in sorted(by_s, reverse=True):
        p, t = by_s[s]
        cpos += p
        ctot += t
        ap += p * cpos / ctot
    ap /= n_pos
    assert got.n_pos == n_pos
    assert got.ap == pytest.approx(round(ap, 6), abs=1e-9)


def test_log_odds_keywords_surface_class_exclusive_tokens(spark):
    """A token that appears ONLY in one class tops that class's keyword
    list; the shared filler token never outranks it; ranks are dense
    1..k and capped at k."""
    from egal_yet_another_earthquake_project_spark.llm import classify as lcls

    rows = []
    for i in range(30):
        rows.append((i, "common filler berlin " + ("der " * 5), "de"))
        rows.append((100 + i, "common filler paris " + ("le " * 5), "fr"))
    df = _df(spark, rows)
    out = lcls.log_odds_keywords(df, k=3).collect()
    by_cls = {}
    for r in out:
        by_cls.setdefault(r.cls, []).append(r)
    assert set(by_cls) == {"de", "fr"}
    for cls, toks in (("de", {"der", "berlin"}), ("fr", {"le", "paris"})):
        got = by_cls[cls]
        assert [r.rnk for r in got] == [1, 2, 3]
        assert {got[0].tok, got[1].tok} == toks, (cls, got)
        assert got[0].z > 0


def test_prf_from_confusion_hand_case_and_never_predicted(spark):
    """Hand confusion: a=(2 tp, 1 fn to b), b=(1 tp), c never predicted
    (1 fn to a). Precision of c is NULL (0 predicted), not 0."""
    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    conf = spark.createDataFrame(
        [("a", "a", 2), ("a", "b", 1), ("b", "b", 1), ("c", "a", 1)],
        "true_label string, pred_label string, n long",
    )
    rows = {r.cls: r for r in lmet.prf_from_confusion(conf).collect()}
    assert rows["a"].tp == 2 and rows["a"].support == 3
    assert rows["a"].predicted == 3  # 2 correct + 1 from c
    assert rows["a"].precision == pytest.approx(2 / 3, abs=1e-4)
    assert rows["a"].recall == pytest.approx(2 / 3, abs=1e-4)
    assert rows["b"].precision == pytest.approx(0.5)
    assert rows["b"].recall == 1.0
    assert rows["c"].predicted == 0 and rows["c"].precision is None
    assert rows["c"].recall == 0.0 and rows["c"].f1 is None


def test_binary_auc_by_group_matches_per_group_global(spark):
    """Each group's sliced AUC equals binary_auc run on that group's
    rows alone — the partitioned window and the bucketed-cumsum global
    form compute the same rank-sum."""
    import random

    from egal_yet_another_earthquake_project_spark.llm import metrics as lmet

    rng = random.Random(23)
    rows = [
        (i, "g" + str(i % 3),
         round(rng.choice([0.2, 0.5, 0.5, 1.1, 1.8]), 4),
         rng.random() < 0.45)
        for i in range(240)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, score double, label boolean"
    )
    sliced = {
        r.grp: (r.n_pos, r.n_neg, r.auc)
        for r in lmet.binary_auc_by_group(df, "grp").collect()
    }
    for gname in ("g0", "g1", "g2"):
        solo = lmet.binary_auc(df.where(F.col("grp") == gname)).collect()[0]
        assert sliced[gname] == (solo.n_pos, solo.n_neg, solo.auc), gname


def test_ndcg_at_k_hand_computed_and_partition_invariant(spark):
    """nDCG@k (llm.metrics.ndcg_at_k): hand-computed DCG/IDCG on a
    planted ranking, NULL when no relevant item, identical under
    repartitioning (the rank-sorted fold fixes float addition order)."""
    import math

    from egal_yet_another_earthquake_project_spark.llm.metrics import (
        ndcg_at_k,
    )

    rows = [
        # query 1: rel at ranks 1 and 3 of 3 -> DCG = 1 + 1/log2(4)
        (1, 1, 1.0), (1, 2, 0.0), (1, 3, 1.0),
        # query 2: rel only at rank 2 -> DCG = 1/log2(3); IDCG = 1
        (2, 1, 0.0), (2, 2, 1.0),
        # query 3: nothing relevant -> ndcg NULL
        (3, 1, 0.0), (3, 2, 0.0),
    ]
    df = spark.createDataFrame(rows, "query_id long, rank int, rel double")
    got = {r.query_id: r for r in ndcg_at_k(df, k=10).collect()}
    dcg1 = 1.0 + 1.0 / math.log2(4.0)
    idcg1 = 1.0 + 1.0 / math.log2(3.0)
    assert got[1].dcg == round(dcg1, 6) and got[1].idcg == round(idcg1, 6)
    assert got[1].ndcg == round(round(dcg1, 6) / round(idcg1, 6), 6)
    assert got[2].ndcg == round(round(1.0 / math.log2(3.0), 6) / 1.0, 6)
    assert got[3].n_rel == 0 and got[3].ndcg is None
    # partitioning invariance
    again = {
        r.query_id: r.ndcg
        for r in ndcg_at_k(df.repartition(7, "rank"), k=10).collect()
    }
    assert again == {q: r.ndcg for q, r in got.items()}


def test_ndcg_at_k_discounts_by_carried_rank_not_position(spark):
    """A candidate list with HOLES (unjudged docs filtered upstream)
    keeps each item's true positional discount: rel at carried rank 3
    contributes 1/log2(4), not 1/log2(3) — the array-position bug the
    round-11 review caught."""
    import math

    from egal_yet_another_earthquake_project_spark.llm.metrics import (
        ndcg_at_k,
    )

    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 3, 1.0)], "query_id long, rank int, rel double"
    )
    row = ndcg_at_k(df, k=10).collect()[0]
    assert row.dcg == round(1.0 + 1.0 / math.log2(4.0), 6)
    # ideal packs the two relevant items into positions 1 and 2
    assert row.idcg == round(1.0 + 1.0 / math.log2(3.0), 6)


def test_ndcg_binary_twin_matches_general_fold(spark):
    """ndcg_at_k_binary (the environment-proof literal-weight form the
    retrieval_ndcg oracle pairs with) agrees with the general log2-fold
    ndcg_at_k on binary relevance to within one 6-dp rounding ulp, and
    exactly on n_rel/NULL structure — including holes in the candidate
    list and k-truncation. The literal weights are correctly-rounded
    doubles of 1/log2(i+1), so the two arithmetics can differ only in
    the last ulp before rounding."""
    import random

    from egal_yet_another_earthquake_project_spark.llm.metrics import (
        ndcg_at_k,
        ndcg_at_k_binary,
    )

    rng = random.Random(13)
    rows = []
    for q in range(12):
        ranks = sorted(rng.sample(range(1, 15), rng.randint(1, 12)))
        for rk in ranks:
            rows.append((q, rk, float(rng.random() < 0.4)))
    df = spark.createDataFrame(rows, "query_id long, rank int, rel double")
    gen = {r.query_id: r for r in ndcg_at_k(df, k=10).collect()}
    lit = {r.query_id: r for r in ndcg_at_k_binary(df, k=10).collect()}
    assert set(gen) == set(lit)
    for q in gen:
        assert gen[q].n_rel == lit[q].n_rel, q
        for col in ("dcg", "idcg", "ndcg"):
            a, b = getattr(gen[q], col), getattr(lit[q], col)
            if a is None or b is None:
                assert a is None and b is None, (q, col)
            else:
                assert abs(a - b) <= 1e-6 + 1e-12, (q, col, a, b)


def test_ndcg_binary_sql_literal_tables_and_bounds():
    import pytest as _pytest

    from egal_yet_another_earthquake_project_spark.llm.metrics import (
        NDCG_DCG_WEIGHT_LITERALS,
        NDCG_IDCG_LITERALS,
        ndcg_binary_sql,
    )
    import math

    # literal tables are the correctly-rounded doubles they claim to be
    for i, w in enumerate(NDCG_DCG_WEIGHT_LITERALS, 1):
        assert float(w) == 1.0 / math.log2(i + 1)
    acc = 0.0
    for n, c in enumerate(NDCG_IDCG_LITERALS):
        assert float(c) == acc
        if n < len(NDCG_DCG_WEIGHT_LITERALS):
            acc += float(NDCG_DCG_WEIGHT_LITERALS[n])
    with _pytest.raises(ValueError):
        ndcg_binary_sql(33)
    with _pytest.raises(ValueError):
        ndcg_binary_sql(0)
