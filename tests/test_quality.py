"""Data-quality expectations (operators/quality): planted violations.

The declared dq_report query verifies the clean-corpus path against
DuckDB; these tests pin the violation semantics — exact fractions,
pass/fail flips at the threshold, FK orphan counting — on frames where
the dirt is planted by construction, and assert the one-scan shape.
"""

import pytest

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.operators import quality as dq


def _frame(spark):
    # 10 rows: 2 null names, ids 1..9 with 9 duplicated, vals 0..90
    rows = [
        (1, "a", 0.0), (2, "b", 10.0), (3, None, 20.0), (4, "d", 30.0),
        (5, "e", 40.0), (6, None, 50.0), (7, "g", 60.0), (8, "h", 70.0),
        (9, "i", 80.0), (9, "j", 90.0),
    ]
    return spark.createDataFrame(rows, "id long, name string, val double")


def test_run_checks_exact_fractions_and_threshold_flips(spark):
    df = _frame(spark)
    report = {
        r.check_name: r
        for r in dq.run_checks(
            df,
            [
                dq.not_null("name"),                       # 0.2 > 0 -> fail
                dq.unique("id"),                           # 0.1 > 0 -> fail
                dq.in_range("val", 0, 80),                 # 1 of 10 out -> fail
                dq.in_range("val", 0, 100),                # pass
                dq.accepted_values("name", ("a", "b", "d", "e", "g", "h", "i")),
            ],
        ).collect()
    }
    assert report["not_null(name)"].metric == pytest.approx(0.2)
    assert not report["not_null(name)"].passed
    assert report["unique(id)"].metric == pytest.approx(0.1)
    assert not report["unique(id)"].passed
    assert report["in_range(val,0,80)"].metric == pytest.approx(0.1)
    assert not report["in_range(val,0,80)"].passed
    assert report["in_range(val,0,100)"].passed
    # 'j' is outside the accepted set -> 1/10; nulls don't count
    assert report["accepted_values(name)"].metric == pytest.approx(0.1)
    # threshold flip
    relaxed = dq.run_checks(df, [dq.not_null("name", 0.25)]).collect()[0]
    assert relaxed.passed


def test_unique_ignores_nulls_and_counts_excess_copies(spark):
    """unique() measures the EXCESS-copy fraction over NON-NULL rows:
    NULL density cannot fail a uniqueness check (that is not_null()'s
    job), and k duplicate copies of one value count as k-1 excess."""
    rows = [(1,), (2,), (None,), (None,), (None,), (3,), (3,), (3,)]
    df = spark.createDataFrame(rows, "id long")
    report = {
        r.check_name: r
        for r in dq.run_checks(df, [dq.unique("id", 0.5)]).collect()
    }
    # 5 non-null rows, 3 distinct -> 2 excess copies / 5 = 0.4; the
    # three NULLs contribute nothing.
    assert report["unique(id)"].metric == pytest.approx(0.4)
    assert report["unique(id)"].passed


def test_run_checks_is_one_aggregation_scan(spark):
    """However many expectations the suite declares, the physical plan
    aggregates the input exactly once (one partial+final HashAggregate
    pair over one scan)."""
    df = _frame(spark)
    plan = dq.run_checks(
        df,
        [dq.not_null("name"), dq.in_range("val", 0, 100),
         dq.accepted_values("name", ("a",)), dq.not_null("val")],
    )._jdf.queryExecution().executedPlan().toString()
    # count_distinct-free suites compile to exactly one aggregate pair
    assert plan.count("HashAggregate") <= 2, plan


def test_fk_check_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = dq.fk_check(child, "fk", parent, "pk").collect()[0]
    # 1 orphan (99) out of 4 child rows; the NULL fk is not an orphan
    assert r.check_name == "fk(fk)"
    assert r.metric == pytest.approx(0.25)
    assert not r.passed
    ok = dq.fk_check(child, "fk", parent, "pk", max_orphan_frac=0.3).collect()[0]
    assert ok.passed


def test_fk_check_empty_child_passes(spark):
    child = spark.createDataFrame([], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    r = dq.fk_check(child, "fk", parent, "pk").collect()[0]
    assert r.metric is None and r.passed


def test_run_checks_rejects_empty_suite(spark):
    with pytest.raises(ValueError):
        dq.run_checks(_frame(spark), [])


def test_dq_monitor_stream_reports_per_batch(spark, tmp_path):
    """Two triggers through dq_monitor_sink: each batch lands its own
    report partition whose metrics equal run_checks on that batch
    directly — the per-drop health monitor."""
    from egal_yet_another_earthquake_project_spark.sources.files import (
        stream_parquet_dir,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        dq_monitor_sink,
    )

    b1 = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 15.0)], "id long, name string, val double"
    )
    b2 = spark.createDataFrame(
        [(3, "c", 5.0), (4, "d", 5.0), (4, "e", 5.0)],
        "id long, name string, val double",
    )
    src = tmp_path / "dq_in"
    b1.coalesce(1).write.parquet(str(src / "b1"))
    b2.coalesce(1).write.parquet(str(src / "b2"))
    checks = [dq.not_null("name"), dq.unique("id"), dq.in_range("val", 0, 10)]
    stream = stream_parquet_dir(
        spark, str(src) + "/*", b1.schema, max_files_per_trigger=1
    )
    q = (
        dq_monitor_sink(stream, checks, str(tmp_path / "dq_out"))
        .option("checkpointLocation", str(tmp_path / "dq_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "dq_out"))
    assert out.select("_batch_id").distinct().count() == 2
    reports = {
        (r._batch_id, r.check_name): (r.metric, r.passed)
        for r in out.collect()
    }
    assert len(reports) == 6
    # batch with the null name fails not_null at 0.5; the other passes
    null_metrics = sorted(
        m for (b, c), (m, _p) in reports.items() if c == "not_null(name)"
    )
    assert null_metrics == [0.0, 0.5]
    dup_metrics = sorted(
        m for (b, c), (m, _p) in reports.items() if c == "unique(id)"
    )
    assert dup_metrics[0] == 0.0 and abs(dup_metrics[1] - 1 / 3) < 1e-6


def test_psi_profile_identical_and_shifted_distributions(spark):
    """PSI semantics on planted distributions: a group drawn identically
    to the reference scores near zero; a group concentrated in one tail
    bin scores high; out-of-range values clamp into edge bins instead
    of vanishing."""
    from egal_yet_another_earthquake_project_spark.operators.stats import (
        psi_profile,
        psi_reference_stats,
    )

    ref = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS x")
    same = ref.selectExpr("'same' AS g", "x")
    shifted = spark.range(500).selectExpr(
        "'shifted' AS g", "CAST(95 + id % 5 AS DOUBLE) AS x"
    )
    outside = spark.range(500).selectExpr(
        "'outside' AS g", "CAST(1000 + id AS DOUBLE) AS x"
    )
    incoming = same.unionByName(shifted).unionByName(outside)
    out = {r.g: r for r in psi_profile(incoming, ref, "x", "g").collect()}
    assert out["same"].psi < 0.01
    assert out["shifted"].psi > 1.0
    assert out["outside"].psi > 1.0  # clamped to the top bin, not dropped
    assert out["outside"].n == 500

    stats = psi_reference_stats(ref, "x")
    assert (stats["lo"], stats["hi"]) == (0.0, 99.0)
    import pytest

    with pytest.raises(ValueError, match="empty reference"):
        psi_reference_stats(ref.filter("x < 0"), "x")


def test_psi_monitor_stream_flags_drifted_batch(spark, tmp_path):
    """Two triggers: a batch resampled from the reference scores low;
    a tail-concentrated batch scores high — the per-drop drift gate."""
    from egal_yet_another_earthquake_project_spark.sources.files import (
        stream_parquet_dir,
    )
    from egal_yet_another_earthquake_project_spark.streaming.scoring import (
        psi_monitor_sink,
    )

    ref = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS x")
    good = spark.range(400).selectExpr("CAST(id % 100 AS DOUBLE) AS x")
    bad = spark.range(400).selectExpr("CAST(90 + id % 10 AS DOUBLE) AS x")
    src = tmp_path / "psi_in"
    good.coalesce(1).write.parquet(str(src / "b1"))
    bad.coalesce(1).write.parquet(str(src / "b2"))
    stream = stream_parquet_dir(
        spark, str(src) + "/*", good.schema, max_files_per_trigger=1
    )
    q = (
        psi_monitor_sink(stream, ref, "x", str(tmp_path / "psi_out"))
        .option("checkpointLocation", str(tmp_path / "psi_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        (r.psi for r in spark.read.parquet(str(tmp_path / "psi_out")).collect())
    )
    assert len(rows) == 2
    assert rows[0] < 0.05 and rows[1] > 1.0
