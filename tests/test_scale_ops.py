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
