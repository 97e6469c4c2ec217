"""In-flight data-quality metrics via ``Dataset.observe`` — counters the
engine accumulates DURING a job instead of with extra passes.

A pipeline that wants "rows written, nulls seen, max event time" after a
load normally pays one extra aggregate job per metric set; ``observe``
attaches the aggregates to the existing plan and the executors fold them
into the same pass (zero extra scans, zero shuffles — the metrics ride
the task results). On streams the same call surfaces per-micro-batch
metrics in every ``StreamingQueryProgress`` (``observedMetrics``), which
is the hook monitoring/alerting consumes.

The reference has no monitoring surface at all (its jobs print to
stdout); this is engine-native operational telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(
    df: DataFrame,
    ts_col: str | None = None,
    not_null_cols: tuple[str, ...] = (),
) -> list:
    """The standard load-audit aggregate set: row count, per-column null
    counts, and the event-time high-water mark."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    if ts_col is not None:
        metrics.append(F.max(ts_col).alias("max_ts"))
    return metrics


def observed(
    df: DataFrame,
    ts_col: str | None = None,
    not_null_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, Observation]:
    """Batch: attach the audit metrics; read ``observation.get`` after
    the first action on the returned frame."""
    obs = Observation()
    out = df.observe(obs, *quality_metrics(df, ts_col, not_null_cols))
    return out, obs


def observed_stream(
    df: DataFrame,
    name: str = "quality",
    ts_col: str | None = None,
    not_null_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming: attach the audit metrics under ``name``; they appear in
    each progress event's ``observedMetrics[name]``."""
    return df.observe(name, *quality_metrics(df, ts_col, not_null_cols))
