"""Partition-level MERGE: last-writer-wins semantics plus the physical
guarantee — untouched partitions' files are byte-identical after the
merge (the O(touched)/batch property that replaces O(corpus)/day)."""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.sinks.merge import (
    merge_into_partitioned,
)


def _files(root: str, part: str) -> dict[str, tuple[int, float]]:
    d = Path(root) / part
    return {
        f.name: (f.stat().st_size, f.stat().st_mtime)
        for f in d.glob("*.parquet")
    }


def test_merge_touches_only_updated_partitions(spark, tmp_path):
    table = str(tmp_path / "events_tbl")
    base = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i), 1) for i in range(30)],
        "id long, dt string, v double, ver int",
    )
    base.coalesce(2).write.partitionBy("dt").parquet(table)

    before_d0 = _files(table, "dt=d0")
    before_d2 = _files(table, "dt=d2")
    assert before_d0 and before_d2

    updates = spark.createDataFrame(
        [
            (1, "d1", 99.0, 2),     # update existing key in d1
            (1, "d1", 77.0, 3),     # newer version same batch — must win
            (100, "d1", 5.0, 2),    # brand-new key
        ],
        "id long, dt string, v double, ver int",
    )
    touched = merge_into_partitioned(
        spark, table, updates, ["id"], "dt", order_col="ver"
    )
    assert touched == ["d1"]

    out = spark.read.parquet(table)
    assert out.count() == 31
    assert out.filter("id = 1").collect()[0].v == 77.0
    # non-touched keys in d1 survive
    assert out.filter("dt = 'd1' and id = 4").count() == 1
    # untouched partitions: exactly the same files, sizes, mtimes
    assert _files(table, "dt=d0") == before_d0
    assert _files(table, "dt=d2") == before_d2


def test_merge_is_idempotent_under_replay(spark, tmp_path):
    table = str(tmp_path / "replay_tbl")
    spark.createDataFrame(
        [(i, "d0", float(i), 1) for i in range(10)],
        "id long, dt string, v double, ver int",
    ).write.partitionBy("dt").parquet(table)
    updates = spark.createDataFrame(
        [(3, "d0", 42.0, 2)], "id long, dt string, v double, ver int"
    )
    merge_into_partitioned(spark, table, updates, ["id"], "dt", order_col="ver")
    merge_into_partitioned(spark, table, updates, ["id"], "dt", order_col="ver")
    out = spark.read.parquet(table)
    assert out.count() == 10
    assert out.filter("id = 3").collect()[0].v == 42.0


def test_stream_merge_into_table(spark, tmp_path):
    """A change stream drained through stream_merge_into leaves the
    table in the batch-merge state: updates applied, new keys added,
    untouched partitions' files identical."""
    from egal_yet_another_earthquake_project_spark.sources.files import (
        stream_parquet_dir,
    )
    from egal_yet_another_earthquake_project_spark.streaming.merge_sink import (
        stream_merge_into,
    )

    table = str(tmp_path / "cdc_tbl")
    spark.createDataFrame(
        [(i, f"d{i % 2}", float(i), 1) for i in range(10)],
        "id long, dt string, v double, ver int",
    ).write.partitionBy("dt").parquet(table)
    before_d0 = _files(table, "dt=d0")

    src = tmp_path / "changes"
    b1 = spark.createDataFrame(
        [(1, "d1", 50.0, 2)], "id long, dt string, v double, ver int"
    )
    b1.write.parquet(str(src / "b1"))
    stream = stream_parquet_dir(spark, str(src) + "/*", b1.schema)
    q = stream_merge_into(
        stream,
        table,
        ["id"],
        "dt",
        order_col="ver",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(1, "d1", 60.0, 3), (99, "d1", 7.0, 1)],
            "id long, dt string, v double, ver int",
        ).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(table)
    assert out.count() == 11
    assert out.filter("id = 1").collect()[0].v == 60.0
    assert out.filter("id = 99").count() == 1
    assert _files(table, "dt=d0") == before_d0


def test_stream_enrichment_sees_dim_updates_between_triggers(spark, tmp_path):
    """The refreshing-dim join must pick up a dimension rewrite between
    micro-batches: rows enriched in trigger 1 carry the old attribute,
    rows in trigger 2 the new one — no query restart."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.sources.files import (
        stream_parquet_dir,
    )
    from egal_yet_another_earthquake_project_spark.streaming.merge_sink import (
        stream_enrich_with_refreshing_dim,
    )

    dim_dir = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "bronze"), (2, "bronze")], "user_id long, tier string"
    ).write.parquet(dim_dir)

    src = tmp_path / "facts"
    spark.createDataFrame([(100, 1)], "event_id long, user_id long").write.parquet(
        str(src / "b1")
    )
    out_dir = str(tmp_path / "enriched")
    stream = stream_parquet_dir(
        spark,
        str(src) + "/*",
        spark.read.parquet(str(src / "b1")).schema,
        max_files_per_trigger=1,
    )
    q = stream_enrich_with_refreshing_dim(
        stream,
        dim_dir,
        "user_id",
        out_dir,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
        # rewrite the dimension, then feed the second fact batch
        spark.createDataFrame(
            [(1, "gold"), (2, "gold")], "user_id long, tier string"
        ).write.mode("overwrite").parquet(dim_dir)
        spark.createDataFrame(
            [(200, 1), (201, 3)], "event_id long, user_id long"
        ).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.event_id: r.tier for r in spark.read.parquet(out_dir).collect()}
    assert rows[100] == "bronze", "trigger-1 row should carry the old snapshot"
    assert rows[200] == "gold", "trigger-2 row missed the dim refresh"
    assert rows[201] is None, "unmatched fact must flow with null attributes"
