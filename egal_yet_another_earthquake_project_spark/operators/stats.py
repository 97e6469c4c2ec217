"""Descriptive statistics (SURVEY A3, A7, P8).

The reference sniffs numeric columns by ``take(1)`` + ``isinstance``
(/root/reference/sparktoELKstream.py:181-188) and runs
``mllib.Statistics.colStats`` (:194-227) — count, mean, **sample** variance,
stddev (√variance, :217), max, min, and sum reconstructed as mean·count
(:214). Here: numeric columns come from the schema (no job), and all seven
statistics for all columns compute in ONE aggregate job (the reference runs
a job per action; at 100 TB one pass vs. seven matters).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def numeric_columns(df: DataFrame) -> list[str]:
    """Schema-driven replacement for the reference's sample-a-row sniff (P8)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.NumericType)]


#: statistic name → aggregate builder; variance is the unbiased (sample)
#: variance to match mllib colStats.
_STATS = {
    "count": lambda c: F.count(c).cast("double"),
    "mean": F.avg,
    "variance": F.var_samp,
    "stddev": F.stddev_samp,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
}


def describe_numeric(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Long-form stats table: one row per (column, statistic).

    Single wide aggregate → unpivot via ``stack``; exactly one shuffle-free
    map-side-combinable pass over the data regardless of column count.
    Output: ``column: string, statistic: string, value: double``.
    """
    cols = list(cols) if cols is not None else numeric_columns(df)
    aggs = [
        fn(c).cast("double").alias(f"{c}__{stat}")
        for c in cols
        for stat, fn in _STATS.items()
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', '{stat}', `{c}__{stat}`" for c in cols for stat in _STATS
    )
    n = len(cols) * len(_STATS)
    return wide.selectExpr(
        f"stack({n}, {pairs}) as (column, statistic, value)"
    )


def global_extrema(df: DataFrame, col: str) -> DataFrame:
    """Global max/min in one aggregate (A7) — the reference runs two full
    ``reduce`` jobs (/root/reference/sparktoELKstream.py:319-324)."""
    return df.agg(
        F.max(col).cast("double").alias(f"max_{col}"),
        F.min(col).cast("double").alias(f"min_{col}"),
    )


def psi_reference_stats(ref: DataFrame, col: str) -> dict:
    """Frozen reference statistics for :func:`psi_profile`: the
    reference's [min, max] range (two scalars — a bounded one-row
    collect, the frozen-artifact pattern of ``lm.ppl_cutoffs``). The
    monitor's bin edges must come from the TRUSTED distribution, not
    drift with whatever batch arrives."""
    row = ref.agg(
        F.min(F.col(col)).cast("double").alias("lo"),
        F.max(F.col(col)).cast("double").alias("hi"),
    ).collect()[0]
    if row.lo is None:
        raise ValueError("psi_reference_stats: empty reference frame")
    return {"col": col, "lo": float(row.lo), "hi": float(row.hi)}


def _psi_bin(col: str, stats: dict, bins: int):
    """Equal-width bin id over the FROZEN reference range; values
    outside the range clamp into the edge bins (they are exactly the
    drift signal — a new bin would change the reference proportions)."""
    span = stats["hi"] - stats["lo"] or 1.0
    raw = F.floor(
        (F.col(col) - F.lit(stats["lo"])) * bins / F.lit(span)
    ).cast("int")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))


def psi_reference_hist(
    ref: DataFrame, col: str, bins: int = 10, stats: dict | None = None
) -> DataFrame:
    """The reference side of :func:`psi_profile` as a ≤``bins``-row
    frame (_bin, _qc, _qn) — compute it ONCE from the trusted corpus
    and hand it to every monitoring call so a streaming monitor never
    re-scans the reference per micro-batch (localCheckpoint it: it is
    bins rows). ``psi_profile(incoming, ref)`` and ``psi_profile(
    incoming, None, ref_hist=psi_reference_hist(ref, col))`` are
    identical by construction."""
    stats = psi_reference_stats(ref, col) if stats is None else stats
    q = (
        ref.withColumn("_bin", _psi_bin(col, stats, bins))
        .groupBy("_bin")
        .agg(F.count("*").alias("_qc"))
    )
    return q.crossJoin(F.broadcast(ref.agg(F.count("*").alias("_qn"))))


def psi_profile(
    incoming: DataFrame,
    ref: DataFrame | None,
    col: str,
    group_col: str | None = None,
    bins: int = 10,
    stats: dict | None = None,
    ref_hist: DataFrame | None = None,
) -> DataFrame:
    """Population Stability Index of ``col``'s distribution per group
    vs the reference — the ML-ops drift gate (rule of thumb: < 0.1
    stable, 0.1–0.25 shifting, > 0.25 drifted)::

        PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

    with p the group's and q the reference's Laplace-smoothed bin
    proportions ((cnt + 1) / (n + bins) — no ln(0) without clipping
    constants). Bins are equal-width over the FROZEN reference range
    (``stats`` from :func:`psi_reference_stats`; computed here when not
    given); out-of-range values clamp into the edge bins, so new-range
    drift shows up instead of silently re-binning. Shape: one aggregate
    per side over (group, bin) — two shuffles, a ≤bins-row broadcast,
    no windows. Pass ``ref_hist`` (from :func:`psi_reference_hist`,
    with matching ``stats``/``bins``) to skip the reference scan —
    required when monitoring a stream against a big frozen corpus."""
    if ref_hist is not None:
        if stats is None:
            raise ValueError(
                "psi_profile: ref_hist requires the frozen stats it was "
                "built with"
            )
        q = ref_hist.select("_bin", "_qc")
        q_tot = ref_hist.select("_qn").limit(1)
    else:
        if ref is None:
            raise ValueError("psi_profile: need ref or ref_hist")
        stats = psi_reference_stats(ref, col) if stats is None else stats
        q = (
            ref.withColumn("_bin", _psi_bin(col, stats, bins))
            .groupBy("_bin")
            .agg(F.count("*").alias("_qc"))
        )
        q_tot = ref.agg(F.count("*").alias("_qn"))
    gb = [group_col] if group_col is not None else []
    p = (
        incoming.withColumn("_bin", _psi_bin(col, stats, bins))
        .groupBy(*gb, "_bin")
        .agg(F.count("*").alias("_pc"))
    )
    p_tot = incoming.groupBy(*gb).agg(F.count("*").alias("_pn"))
    all_bins = incoming.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("_bin")
    )
    grid = p_tot.crossJoin(F.broadcast(all_bins))
    full = (
        grid.join(p, gb + ["_bin"], "left")
        .join(F.broadcast(q), "_bin", "left")
        .crossJoin(F.broadcast(q_tot))
        .withColumn(
            "_p",
            (F.coalesce(F.col("_pc"), F.lit(0)) + 1)
            / (F.col("_pn") + F.lit(bins)).cast("double"),
        )
        .withColumn(
            "_q",
            (F.coalesce(F.col("_qc"), F.lit(0)) + 1)
            / (F.col("_qn") + F.lit(bins)).cast("double"),
        )
    )
    return (
        full.groupBy(*gb, "_pn")
        .agg(
            F.round(
                F.sum(
                    (F.col("_p") - F.col("_q"))
                    * F.log(F.col("_p") / F.col("_q"))
                ),
                4,
            ).alias("psi")
        )
        .select(*gb, F.col("_pn").alias("n"), "psi")
    )
