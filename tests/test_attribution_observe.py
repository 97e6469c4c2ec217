"""Left-outer stream-stream attribution join + observe-based quality
metrics (zero-extra-pass load audits)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from egal_yet_another_earthquake_project_spark.operators.quality import (
    observed,
    observed_stream,
)
from egal_yet_another_earthquake_project_spark.sources.files import (
    stream_parquet_dir,
)
from egal_yet_another_earthquake_project_spark.streaming.joins import (
    attribute_streams,
)

CLICKS_S = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("click_ts", T.TimestampType(), False),
    ]
)
BUYS_S = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("buy_ts", T.TimestampType(), False),
        T.StructField("amount", T.DoubleType(), False),
    ]
)


def _write(spark, path, rows, schema_str, ts_cols):
    df = spark.createDataFrame(rows, schema_str)
    for c in ts_cols:
        df = df.withColumn(c, F.to_timestamp(c))
    df.write.mode("append").parquet(str(path))


def test_left_outer_attribution_emits_unmatched_after_watermark(
    spark, tmp_path: Path
):
    c_src, b_src = tmp_path / "clicks", tmp_path / "buys"
    # u1 converts within 30 min; u2 never converts.
    _write(spark, c_src,
           [("u1", "2024-01-01 10:00:00"), ("u2", "2024-01-01 10:05:00")],
           "user_id string, click_ts string", ["click_ts"])
    _write(spark, b_src, [("u1", "2024-01-01 10:10:00", 9.99)],
           "user_id string, buy_ts string, amount double", ["buy_ts"])
    # Late traffic far past every window: advances both watermarks so the
    # u2 click is provably unmatched and must be emitted with nulls.
    _write(spark, c_src, [("u9", "2024-01-01 16:00:00")],
           "user_id string, click_ts string", ["click_ts"])
    _write(spark, b_src, [("u9", "2024-01-01 16:00:30", 1.0)],
           "user_id string, buy_ts string, amount double", ["buy_ts"])

    joined = attribute_streams(
        stream_parquet_dir(spark, str(c_src), CLICKS_S, max_files_per_trigger=1),
        stream_parquet_dir(spark, str(b_src), BUYS_S, max_files_per_trigger=1),
        key="user_id",
        left_ts="click_ts",
        right_ts="buy_ts",
        within_minutes=30,
        left_watermark="10 minutes",
        right_watermark="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            r.user_id: r
            for r in spark.table("attr_out").collect()
        }
    finally:
        q.stop()
    assert rows["u1"].amount == 9.99
    assert rows["u1"].buy_ts is not None
    # The unmatched click came out exactly once, right side null.
    assert rows["u2"].buy_ts is None and rows["u2"].amount is None
    assert spark.table("attr_out").filter("user_id = 'u2'").count() == 1


def test_observed_batch_metrics_ride_the_job(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"), (2, "2024-01-02 11:00:00", None),
         (3, None, "c")],
        "id long, ts string, v string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out, obs = observed(df, ts_col="ts", not_null_cols=("ts", "v"))
    assert out.count() == 3  # first action materializes the metrics
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_ts"] == 1 and got["n_null_v"] == 1
    assert str(got["max_ts"]).startswith("2024-01-02")


def test_observed_stream_metrics_in_progress(spark, tmp_path: Path):
    src = tmp_path / "src"
    _write(spark, src,
           [("u1", "2024-01-01 10:00:00"), ("u2", None)],
           "user_id string, click_ts string", ["click_ts"])
    stream = observed_stream(
        stream_parquet_dir(spark, str(src), CLICKS_S),
        name="audit",
        not_null_cols=("click_ts",),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        metrics = [
            p["observedMetrics"]["audit"]
            for p in (q.recentProgress or [])
            if p.get("observedMetrics", {}).get("audit")
        ]
    finally:
        q.stop()
    assert metrics, "no observedMetrics surfaced in progress events"
    assert metrics[0]["n_rows"] == 2
    assert metrics[0]["n_null_click_ts"] == 1
