"""Small-files compaction (sinks/parquet.compact_parquet): the
maintenance pass that keeps micro-batch output scannable at scale."""

from __future__ import annotations

import math
from pathlib import Path

from egal_yet_another_earthquake_project_spark.sinks.parquet import compact_parquet
from egal_yet_another_earthquake_project_spark.sources.files import read_table

from tests.conftest import TESTDATA_SMOKE


def test_compact_reduces_file_count_preserving_rows(spark, tmp_path: Path):
    events = read_table(spark, TESTDATA_SMOKE, "events")
    rows = events.count()
    src = tmp_path / "fragmented"
    events.repartition(32).write.parquet(str(src))
    assert len(spark.read.parquet(str(src)).inputFiles()) >= 32

    n_files = compact_parquet(
        spark,
        str(src),
        str(tmp_path / "compacted"),
        target_rows_per_file=math.ceil(rows / 2),
    )
    assert n_files == 2

    out = spark.read.parquet(str(tmp_path / "compacted"))
    assert out.count() == rows
    assert sorted(out.columns) == sorted(events.columns)
    # content identical, not just counts
    assert (
        out.select("event_id").exceptAll(events.select("event_id")).count() == 0
    )


def test_compact_partitioned_layout(spark, tmp_path: Path):
    events = read_table(spark, TESTDATA_SMOKE, "events")
    src = tmp_path / "fragmented"
    events.repartition(16).write.parquet(str(src))

    compact_parquet(
        spark,
        str(src),
        str(tmp_path / "by_type"),
        partition_cols=["event_type"],
        target_rows_per_file=10_000_000,
    )
    out = spark.read.parquet(str(tmp_path / "by_type"))
    assert out.count() == events.count()
    # hive layout: one directory per event_type, each readable alone (the
    # layout partition pruning operates on)
    dirs = sorted(
        d.name for d in (tmp_path / "by_type").iterdir()
        if d.name.startswith("event_type=")
    )
    types = sorted(
        "event_type=" + r.event_type
        for r in events.select("event_type").distinct().collect()
    )
    assert dirs == types
    clicks = spark.read.parquet(str(tmp_path / "by_type" / "event_type=click"))
    assert 0 < clicks.count() < events.count()
