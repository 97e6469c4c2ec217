"""Unit tests for the record-linkage / keyword / weighted-sampling and
time-series repair operators (the oracle-parity test covers their
declared queries end-to-end; these pin semantics on controlled input)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.linkage import (
    blocked_fuzzy_pairs,
    tfidf_keywords,
)
from egal_yet_another_earthquake_project_spark.llm.sampling import (
    weighted_priority_sample,
)
from egal_yet_another_earthquake_project_spark.operators.series import (
    interpolate_minute_series,
    trailing_zscore,
)
from egal_yet_another_earthquake_project_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"


# ---------- fuzzy linkage ----------


def test_fuzzy_pairs_match_and_threshold(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy cat tonight"),  # 3 edits
            (3, "completely unrelated text about database join planning"),
            (4, "THE  quick   Brown fox jumps over the lazy dog tonight"),  # normalizes to ~#1
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in blocked_fuzzy_pairs(docs, max_dist=3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 3
    assert (1, 4) in got and got[(1, 4)] == 0  # normalization folds case/space
    assert all(a < b for a, b in got)
    assert not any(3 in pair for pair in got)


def test_fuzzy_hot_block_cap_drops_boilerplate(spark):
    # 5 docs share a template prefix; with max_block=4 the block is
    # dropped entirely (the quadratic guard), so no pairs emerge.
    rows = [(i, f"common template header here padding body variant {i}") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    assert blocked_fuzzy_pairs(docs, max_block=4).count() == 0
    assert blocked_fuzzy_pairs(docs, max_block=10).count() == 10  # 5C2


# ---------- tf-idf keywords ----------


def test_tfidf_ranks_rare_terms_over_common(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha shared shared"),
            (2, "beta shared"),
            (3, "gamma shared"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(docs, top_n=2).collect()
    top = {r.doc_id: r.term for r in out if r.rank == 1}
    # 'shared' appears in every doc -> idf ln(4/4)=0; doc-unique terms win.
    assert top == {1: "alpha", 2: "beta", 3: "gamma"}
    assert all(r.score >= 0 for r in out)


def test_tfidf_empty_docs_dropped(spark):
    docs = spark.createDataFrame([(1, "   "), (2, "word")], ["doc_id", "text"])
    got = tfidf_keywords(docs).collect()
    assert {r.doc_id for r in got} == {2}


# ---------- weighted priority sampling ----------


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    docs = read_table(spark, SF, "documents")
    a = [r.doc_id for r in weighted_priority_sample(docs, "doc_id", "n_chars", k=50).collect()]
    b = [
        r.doc_id
        for r in weighted_priority_sample(
            docs.repartition(17), "doc_id", "n_chars", k=50
        ).collect()
    ]
    assert sorted(a) == sorted(b)
    assert len(a) == 50


def test_weighted_sample_biases_toward_heavy_rows(spark):
    # One row carries 1000x the weight of 999 others: across independent
    # salts it should be selected far more often than a uniform row.
    rows = [(i, 1000 if i == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    hits = sum(
        any(r.id == 0 for r in weighted_priority_sample(df, "id", "w", k=10, salt=s).collect())
        for s in ("s1", "s2", "s3", "s4", "s5")
    )
    assert hits >= 4  # P(miss) per salt is tiny; uniform row would hit ~1%


def test_weighted_sample_plan_is_partial_topk(spark):
    docs = read_table(spark, SF, "documents")
    plan = weighted_priority_sample(docs, "doc_id", "n_chars", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------- interpolation ----------


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_interpolation_fills_interior_gap_linearly(spark):
    ev = spark.createDataFrame(
        [(_ts(0), 10.0), (_ts(4), 30.0)], ["ts", "value"]
    )
    out = {r.minute: (r.v, r.was_gap) for r in interpolate_minute_series(ev).collect()}
    assert out["2024-01-01 00:00"] == (10.0, False)
    assert out["2024-01-01 00:01"] == (15.0, True)
    assert out["2024-01-01 00:02"] == (20.0, True)
    assert out["2024-01-01 00:03"] == (25.0, True)
    assert out["2024-01-01 00:04"] == (30.0, False)


def test_interpolation_tie_rounds_half_up(spark):
    # Midpoint of 0.0 and 0.0001 is 0.00005 — an exact tie in the 4th
    # decimal; the integer formula rounds away from zero on any engine.
    ev = spark.createDataFrame([(_ts(0), 0.0), (_ts(2), 0.0001)], ["ts", "value"])
    out = {r.minute: r.v for r in interpolate_minute_series(ev).collect()}
    assert out["2024-01-01 00:01"] == 0.0001


def test_interpolation_edges_clamp(spark):
    # A leading gap cannot exist (grid starts at the first present
    # minute), but averages within a minute are used, and a single
    # minute yields a single non-gap row.
    ev = spark.createDataFrame([(_ts(3), 7.0), (_ts(3), 9.0)], ["ts", "value"])
    rows = interpolate_minute_series(ev).collect()
    assert len(rows) == 1 and rows[0].v == 8.0 and not rows[0].was_gap


def test_interpolation_stitches_month_boundary(spark):
    # Present samples in January and March only: the February bucket is
    # ENTIRELY empty and the gap spans two month edges — the per-bucket
    # carry must stitch the January tail to the March head.
    a = dt.datetime(2024, 1, 31, 23, 58)
    b = dt.datetime(2024, 3, 1, 0, 2)
    ev = spark.createDataFrame([(a, 10.0), (b, 20.0)], ["ts", "value"])
    rows = interpolate_minute_series(ev, partition_grain="month").collect()
    out = {r.minute: (r.v, r.was_gap) for r in rows}
    total = int((b - a).total_seconds() // 60)
    assert len(rows) == total + 1
    # Linear between the endpoints, including the bucket-edge minutes.
    assert out["2024-01-31 23:58"] == (10.0, False)
    assert out["2024-03-01 00:02"] == (20.0, False)
    mid_k = total // 2
    mid_minute = (a + dt.timedelta(minutes=mid_k)).strftime("%Y-%m-%d %H:%M")
    expect = round(10.0 + 10.0 * mid_k / total, 4)
    assert out[mid_minute] == (expect, True)
    # First minute of February interpolates across the empty bucket.
    feb1 = dt.datetime(2024, 2, 1, 0, 0)
    k = int((feb1 - a).total_seconds() // 60)
    assert out["2024-02-01 00:00"] == (round(10.0 + 10.0 * k / total, 4), True)


def test_interpolation_month_grain_equals_global(spark):
    # Deterministic multi-month series with gaps placed to cross both
    # month edges; the bucketed path must be bit-identical to the
    # global-window path.
    base = dt.datetime(2024, 1, 15, 0, 0)
    ev = spark.createDataFrame(
        [
            (base + dt.timedelta(minutes=m * 997), float((m * 37) % 100) / 7.0)
            for m in range(120)
        ],
        ["ts", "value"],
    )
    got_b = interpolate_minute_series(ev, partition_grain="month").collect()
    got_g = interpolate_minute_series(ev, partition_grain=None).collect()
    assert sorted(map(tuple, got_b)) == sorted(map(tuple, got_g))


def test_interpolation_grid_windows_are_partitioned(spark):
    """The neighbor-carry windows over the minute grid must be
    partitioned by the month bucket — only the bucket-summary carry
    (month-cardinality frame) may be a single-partition window."""
    from egal_yet_another_earthquake_project_spark.plans import inspect

    ev = read_table(spark, SF, "events")
    plan = inspect.formatted_plan(interpolate_minute_series(ev))
    import re

    for m in re.finditer(r"Arguments: \[([^\]]*_pv[^\]]*)\], \[([^\]]*)\]", plan):
        part_spec = m.group(2)
        assert "_bkt" in m.group(1) or "_bkt" in part_spec or "minute" not in part_spec
    # The grid-sized windows (they compute _pv/_nv) must name _bkt in
    # their partition spec; formatted plans render Window as
    # "Arguments: [exprs], [partition spec], [order spec]".
    win_args = re.findall(
        r"Window[\s\S]*?Arguments: (\[[^\n]*)", plan
    )
    grid_wins = [a for a in win_args if "_pv" in a or "_nv" in a]
    assert grid_wins, plan
    for a in grid_wins:
        assert "_bkt" in a, a


# ---------- trailing z-score ----------


def test_zscore_flags_spike_not_baseline(spark):
    base = [(i, _ts(i), 1, 10.0 + (i % 2) * 0.2) for i in range(30)]
    spike = [(99, _ts(30), 1, 50.0)]
    ev = spark.createDataFrame(
        base + spike, ["event_id", "ts", "user_id", "value"]
    )
    got = trailing_zscore(ev, lookback=20, min_points=10, threshold=3.0).collect()
    assert [r.event_id for r in got] == [99]
    assert got[0].z > 3


def test_zscore_requires_history(spark):
    # Fewer than min_points prior events -> never flagged, even for a
    # wild value.
    ev = spark.createDataFrame(
        [(i, _ts(i), 1, float(i * 100)) for i in range(5)],
        ["event_id", "ts", "user_id", "value"],
    )
    assert trailing_zscore(ev, min_points=10).count() == 0


def test_fuzzy_pairs_plan_is_equi_join(spark):
    """The self-join must hash on the block key — never a cartesian or
    nested-loop pass (the O(n²) cliff the blocking exists to avoid)."""
    from egal_yet_another_earthquake_project_spark.plans import inspect

    docs = read_table(spark, SF, "documents")
    plan = inspect.formatted_plan(blocked_fuzzy_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any("_blk" in keys for _, keys in inspect.join_key_nodes(blocked_fuzzy_pairs(docs)))


def test_zscore_single_shuffle_on_entity_key(spark):
    """The trailing window shuffles once, on the user key."""
    from egal_yet_another_earthquake_project_spark.plans import inspect

    ev = read_table(spark, SF, "events")
    assert inspect.exchange_count(trailing_zscore(ev)) == 1


def test_zscore_frame_excludes_current_row(spark):
    # Constant history then a jump: if the frame leaked the current row,
    # sd would absorb the jump and z would shrink; with the exclusive
    # frame sd is ~0 of constants -> filtered by the sd floor, so craft
    # slight noise to keep sd positive.
    vals = [10.0, 10.1] * 10 + [25.0]
    ev = spark.createDataFrame(
        [(i, _ts(i), 1, v) for i, v in enumerate(vals)],
        ["event_id", "ts", "user_id", "value"],
    )
    got = trailing_zscore(ev, lookback=20, min_points=10, threshold=3.0).collect()
    assert [r.event_id for r in got] == [20]
