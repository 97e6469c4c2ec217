"""Declarative data-quality expectations, compiled to one scan.

The deequ/dbt-tests capability for a 100 TB lake: a suite of
expectations over a table — null fractions, uniqueness, value ranges,
set membership, referential integrity — evaluated as ONE aggregation
pass per table (every row-level check is an aggregate expression, so
Catalyst fuses them into a single scan + partial/final aggregate), plus
one left-anti join per foreign-key check (the only expectation that
inherently needs a second input). Results come back as a small report
frame ``(check_name, metric, threshold, passed)`` — the artifact a pipeline
gates on before publishing a table.

Checks are plain (name, metric Column, pass predicate) triples, so new
expectation types are one-liners; nothing here collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "run_checks",
    "fk_check",
    "quality_metrics",
    "observed",
    "observed_stream",
]


@dataclass(frozen=True)
class Check:
    """One expectation: ``metric`` is an AGGREGATE expression over the
    table, ``passed`` a scalar predicate over the metric's value
    (expressed on ``F.col("metric")``)."""

    name: str
    metric: Column
    threshold: float

    def row(self) -> Column:
        return F.struct(
            F.lit(self.name).alias("check_name"),
            self.metric.cast("double").alias("metric"),
            F.lit(float(self.threshold)).alias("threshold"),
        )


def not_null(col: str, max_null_frac: float = 0.0) -> Check:
    """Fraction of NULL values in ``col`` must be ≤ the threshold."""
    frac = F.avg(F.col(col).isNull().cast("double"))
    return Check(f"not_null({col})", frac, max_null_frac)


def unique(col: str, max_dup_frac: float = 0.0) -> Check:
    """EXCESS-copy fraction among non-null values must be ≤ the
    threshold: 1 − distinct/count over non-null rows (exact, one
    count_distinct). Two duplicate values in 100 rows score 0.01 (the
    one excess copy), not 0.02. NULLs are excluded entirely — NULL
    handling belongs to :func:`not_null`, so a nullable column cannot
    fail uniqueness purely from NULL density. An all-NULL column has
    zero non-null rows and therefore zero excess copies: the fraction
    coalesces to 0.0 (ADVICE r11 — a NULL metric made ``passed`` NULL,
    which a ``passed = false`` gate silently missed)."""
    frac = F.coalesce(
        1.0 - F.count_distinct(F.col(col)) / F.count(F.col(col)), F.lit(0.0)
    )
    return Check(f"unique({col})", frac, max_dup_frac)


def in_range(
    col: str, lo: float, hi: float, max_out_frac: float = 0.0
) -> Check:
    """Fraction of non-null values outside [lo, hi] must be ≤ the
    threshold."""
    out = (
        F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi))
    ).cast("double")
    return Check(f"in_range({col},{lo:g},{hi:g})", F.avg(out), max_out_frac)


def accepted_values(
    col: str, values: tuple, max_out_frac: float = 0.0
) -> Check:
    """Fraction of non-null values outside the accepted set must be ≤
    the threshold. ``values`` is a bounded literal list (it compiles
    into the plan), not a frame."""
    out = (F.col(col).isNotNull() & ~F.col(col).isin(*values)).cast("double")
    name = f"accepted_values({col})"
    return Check(name, F.avg(out), max_out_frac)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregation over ``df`` — the report
    frame ``(check_name, metric, threshold, passed)``, one row per check,
    ordered as given. The single `.agg` keeps the scan count at one no
    matter how many expectations the suite declares."""
    if not checks:
        raise ValueError("run_checks: empty check suite")
    packed = df.agg(F.array(*[c.row() for c in checks]).alias("_checks"))
    return packed.select(F.explode("_checks").alias("c")).select(
        F.col("c.check_name").alias("check_name"),
        F.round(F.col("c.metric"), 6).alias("metric"),
        F.col("c.threshold").alias("threshold"),
        (F.col("c.metric") <= F.col("c.threshold")).alias("passed"),
    )


def fk_check(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    max_orphan_frac: float = 0.0,
) -> DataFrame:
    """Referential integrity as a report row: fraction of child rows
    whose non-null ``fk_col`` has no match in ``parent.pk_col``. One
    left-anti join (shuffle or broadcast — Catalyst/AQE picks by parent
    size) plus one count each side; no driver collect."""
    orphans = child.where(F.col(fk_col).isNotNull()).join(
        parent.select(F.col(pk_col).alias(fk_col)).distinct(),
        fk_col,
        "left_anti",
    )
    num = orphans.agg(F.count(F.lit(1)).alias("_n"))
    den = child.agg(F.count(F.lit(1)).alias("_d"))
    name = f"fk({fk_col})"
    return num.crossJoin(den).select(
        F.lit(name).alias("check_name"),
        F.round(
            F.col("_n") / F.when(F.col("_d") > 0, F.col("_d").cast("double")),
            6,
        ).alias("metric"),
        F.lit(float(max_orphan_frac)).alias("threshold"),
        (
            F.coalesce(
                F.col("_n") / F.when(F.col("_d") > 0, F.col("_d").cast("double")),
                F.lit(0.0),
            )
            <= F.lit(float(max_orphan_frac))
        ).alias("passed"),
    )


# ---------------------------------------------------------------------------
# In-flight load audits via ``Dataset.observe`` — the zero-extra-pass
# counterpart of the suites above: run_checks answers "audit this table"
# (its own scan); observe rides an EXISTING job's plan and folds the
# audit into the same pass (batch: Observation.get after the first
# action; streams: per-micro-batch ``observedMetrics`` in every
# StreamingQueryProgress — the monitoring/alerting hook).
# ---------------------------------------------------------------------------


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
