"""Scale-technique tests: salting correctness, bucketed shuffle-free joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.operators import skew
from egal_yet_another_earthquake_project_spark.plans import inspect
from egal_yet_another_earthquake_project_spark.sinks.bucketed import (
    bucketed_join,
    write_bucketed,
)
from egal_yet_another_earthquake_project_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"


def test_salted_group_count_matches_plain(spark):
    events = read_table(spark, SF, "events")
    plain = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r.event_type: r.n
        for r in skew.salted_group_count(events, ["event_type"]).collect()
    }
    assert salted == plain


def test_salted_agg_matches_plain(spark):
    events = read_table(spark, SF, "events")
    plain = {
        r.event_type: (r.n, round(r.s, 2))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()
    }
    got = {
        r.event_type: (r.n, round(r.sum_value, 2))
        for r in skew.salted_agg(
            events.withColumn("value", F.col("value").cast("decimal(18,2)")),
            ["event_type"],
            ["value"],
        )
        .withColumn("sum_value", F.col("sum_value").cast("double"))
        .collect()
    }
    assert got == plain


def test_replicate_join_matches_broadcast(spark):
    events = read_table(spark, SF, "events").withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("int")
    )
    nation = read_table(spark, SF, "nation")
    expected = events.join(F.broadcast(nation), "n_nationkey").count()
    got = skew.replicate_broadcast_join(events, nation, "n_nationkey", salt_buckets=4).count()
    assert got == expected


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = read_table(spark, SF, "orders")
        lineitem = read_table(spark, SF, "lineitem")
        write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            ["o_orderkey"],
            num_buckets=8,
            sort_cols=["o_orderkey"],
        )
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        assert inspect.exchange_count(joined) == 0, inspect.formatted_plan(joined)
        # and it still returns the right row count
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_approx_sketches_track_exact(spark):
    """Sketch aggregates (HLL distinct, approx_percentile) are the
    100 TB substitutes for exact distinct/percentile when the answer
    feeds a dashboard, not an oracle — assert they stay inside their
    documented error envelopes on real data."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from tests.conftest import TESTDATA_SMOKE

    ev = read_table(spark, TESTDATA_SMOKE, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", 0.02)).first()[0]
    assert abs(approx - exact) <= max(1.0, 0.05 * exact), (approx, exact)

    row = ev.select(
        F.expr("percentile(value, 0.45)").alias("lo"),
        F.expr("percentile(value, 0.55)").alias("hi"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("ap"),
    ).first()
    assert row.lo <= row.ap <= row.hi, row


def test_bloom_pruned_join_matches_plain_and_filters_before_exchange(spark):
    """The bloom-pruned join is bit-identical to the plain join, and the
    probe side's getbit filter sits BELOW its exchange in the physical
    plan — the shuffle only carries candidate rows."""
    from egal_yet_another_earthquake_project_spark.operators import bloom
    from tests.conftest import TESTDATA_SMOKE

    orders = read_table(spark, TESTDATA_SMOKE, "orders")
    rich = (
        read_table(spark, TESTDATA_SMOKE, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("o_custkey"), "c_acctbal")
    )
    got = bloom.bloom_pruned_join(orders, rich, "o_custkey")
    plain = orders.join(rich, "o_custkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "bit_get" in plan, "bloom bit-test missing from the physical plan"
    # The bit-test must run under the probe's exchange (filter-then-
    # shuffle): in executedPlan's top-down print, the first bit_get
    # appears after the join node but there must be NO Exchange between
    # the probe scan and the Filter — i.e. the Filter's subtree contains
    # the scan directly.
    tail = plan[plan.index("bit_get"):]
    first_scan = tail.find("FileScan")
    first_exchange = tail.find("Exchange")
    assert first_scan != -1
    assert first_exchange == -1 or first_scan < first_exchange


def test_bloom_never_false_negative(spark):
    """Every true build key passes the probe filter (bloom guarantees
    no false negatives); the pass-through set is a superset of matches
    and a subset of the probe."""
    from egal_yet_another_earthquake_project_spark.operators import bloom
    from tests.conftest import TESTDATA_SMOKE

    orders = read_table(spark, TESTDATA_SMOKE, "orders")
    rich = (
        read_table(spark, TESTDATA_SMOKE, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    words = bloom.bloom_words(rich, "o_custkey")
    passed = orders.filter(bloom.might_contain(F.col("o_custkey"), words))
    matches = orders.join(rich, "o_custkey", "left_semi")
    n_probe, n_passed, n_match = orders.count(), passed.count(), matches.count()
    assert n_match <= n_passed <= n_probe
    # matches ⊆ passed row-wise, not just by count
    assert matches.join(passed, orders.columns, "left_anti").count() == 0
