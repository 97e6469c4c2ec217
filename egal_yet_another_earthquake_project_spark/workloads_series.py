"""Time-series repair workload: gap interpolation and trailing-window
anomaly detection over the events table.

The reference's treatment of missing samples is a 0.0 sentinel and a
tail-loop stop (/root/reference/electricraw.py:134-150) — covered by
``gap_series``. These queries are the production counterpart: fill the
gaps (linear interpolation on the minute grid) and flag anomalies
(per-user trailing z-score), both oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from egal_yet_another_earthquake_project_spark.operators import series
from egal_yet_another_earthquake_project_spark.sources.files import read_table

ZSCORE_LOOKBACK = 20
ZSCORE_MIN_POINTS = 10
ZSCORE_THRESHOLD = 2.5


def q_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute-grain series with missing minutes linearly interpolated
    between nearest present neighbors (edges clamp). The event stream
    aggregates to minute grain first, so the interpolation windows run
    over a minute-cardinality frame — the electric-series scale, not
    the fact table's."""
    return series.interpolate_minute_series(read_table(spark, sf_dir, "events"))


# The interpolation runs in fixed-point (1/10000ths) integer arithmetic
# with an explicit (2|num|+den) // (2 den) half-away-from-zero formula —
# double-rounding an x.xxxx5 tie is engine-dependent (Spark HALF_UPs the
# shortest decimal repr, DuckDB scales the binary double), integer
# arithmetic is not. Mirrors operators/series.py exactly.
_INTERPOLATE_ORACLE = """
WITH per_min AS (
  SELECT date_trunc('minute', ts) AS minute, round(avg(value), 4) AS v
  FROM events GROUP BY 1
),
bounds AS (SELECT min(minute) AS lo, max(minute) AS hi FROM per_min),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
  FROM bounds
),
j AS (
  SELECT g.minute, p.v,
         CAST(round(p.v * 10000) AS BIGINT) AS v4
  FROM grid g LEFT JOIN per_min p USING (minute)
),
f AS (
  SELECT minute, v,
    last_value(v4 IGNORE NULLS) OVER wb AS pv,
    first_value(v4 IGNORE NULLS) OVER wf AS nv,
    last_value(CASE WHEN v IS NOT NULL THEN minute END IGNORE NULLS)
      OVER wb AS pt,
    first_value(CASE WHEN v IS NOT NULL THEN minute END IGNORE NULLS)
      OVER wf AS nt
  FROM j
  WINDOW
    wb AS (ORDER BY minute ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (ORDER BY minute ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
g2 AS (
  SELECT minute, v, pv, nv,
         pv * date_diff('second', pt, nt)
           + (nv - pv) * date_diff('second', pt, minute) AS num,
         date_diff('second', pt, nt) AS den
  FROM f
)
SELECT strftime(minute, '%Y-%m-%d %H:%M') AS minute,
       CAST(CASE WHEN v IS NOT NULL THEN CAST(round(v * 10000) AS BIGINT)
                 WHEN pv IS NULL THEN nv
                 WHEN nv IS NULL THEN pv
                 ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                      * ((2 * abs(num) + den) // (2 * den))
            END AS DOUBLE) / 10000.0 AS v,
       v IS NULL AS was_gap
FROM g2
ORDER BY minute
"""


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates ≥ 2.5 trailing standard deviations
    from the user's previous 20 events (≥ 10 points of history; frame
    excludes the current row). Window partitions on the user key — one
    shuffle, per-key state."""
    return series.trailing_zscore(
        read_table(spark, sf_dir, "events"),
        lookback=ZSCORE_LOOKBACK,
        min_points=ZSCORE_MIN_POINTS,
        threshold=ZSCORE_THRESHOLD,
    ).orderBy("event_id")


_ZSCORE_ORACLE = f"""
WITH s AS (
  SELECT event_id, user_id, value,
         avg(value) OVER w AS mu,
         stddev_samp(value) OVER w AS sd,
         count(value) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, value, round((value - mu) / sd, 4) AS z
FROM s
WHERE n >= {ZSCORE_MIN_POINTS} AND sd > 0.000000001
  AND abs((value - mu) / sd) >= {ZSCORE_THRESHOLD}
ORDER BY event_id
"""


QUERIES = {
    "interpolate_gaps": q_interpolate_gaps,
    "zscore_outliers": q_zscore_outliers,
}

ORACLES = {
    "interpolate_gaps": _INTERPOLATE_ORACLE,
    "zscore_outliers": _ZSCORE_ORACLE,
}
