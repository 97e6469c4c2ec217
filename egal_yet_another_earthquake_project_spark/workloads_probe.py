"""Oracle-dialect and render probes (VERDICT r12 "Next round" #3).

Two rounds of ``retrieval_ndcg`` forensics burned on a blind spot: the
repo had no way to detect that an oracle construct behaves differently
under the DRIVER's DuckDB than under the local build (the sandbox has no
package network, so alternate DuckDB versions can't be installed).
These two constant-input queries close that gap:

- ``oracle_dialect_probe`` — one row whose cells each exercise a
  dialect construct the registry's oracles historically depended on
  (``->`` lambdas, ``list_reduce``/``list_transform``, ``list_sort``
  over ``ROW(...)`` structs, positional ``s[2]`` indexing, ``range()``,
  ``round`` on knife-edge doubles, float association) — plus, since the
  round-13 de-exoticization, the constructs the ROW-FORM oracles lean
  on instead: INCLUSIVE list slicing ``l[a:b]``, correlated lateral
  ``unnest(range(...))``, ``string_agg(... ORDER BY)``, windowed
  ``min`` frames, variadic ``greatest`` — emitting a
  known-constant value. The Spark side returns the SAME constants as
  plain literals. Every output column is DOUBLE or BIGINT — no
  rendering-volatile type — so the row only flips if a construct's
  SEMANTICS change (or its syntax is removed, which surfaces as a
  recorded ``err``). A red cell pinpoints WHICH construct drifted.

- ``oracle_render_probe`` — the fetch-layer rendering surfaces: a naked
  ``sum(BIGINT)`` (HUGEINT — the type that made ``retrieval_ndcg`` the
  single red row in rounds 11–12 while every fetchall-based local
  instrument agreed cell-for-cell), a DECIMAL column, and a ``-0.0``
  double. Values are chosen so the SQL-level answers are version-stable;
  a flip isolates the driver's value-RENDERING path (arrow/pandas
  conversion), not query semantics.

Both probes read no tables — pure ``VALUES``/literal plans, sub-second
at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_oracle_dialect_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected constants for every dialect construct, as literals —
    the engine side never computes them, so a mismatch is attributable
    to the oracle engine alone."""
    return spark.range(1).select(
        F.lit(3).cast("long").alias("n_rows"),
        F.lit(14.0).alias("lambda_fold"),
        F.lit(10.25).alias("struct_sort_pos"),
        F.lit(3).cast("long").alias("range_len"),
        F.lit(6.0).alias("range_fold"),
        F.lit(2.68).alias("round_knife_a"),
        F.lit(1.0).alias("round_half"),
        F.lit(-1.0).alias("round_neg_half"),
        F.lit(1.000001).alias("round_knife_b"),
        F.lit(3.0).alias("round_half_up"),
        F.lit(0.30000000000000004).alias("fp_assoc"),
        # round-13: the constructs the de-exoticized (row-form) oracles
        # now lean on — inclusive list slicing, correlated lateral
        # range-unnest, ordered string_agg, windowed min frames,
        # variadic greatest
        F.lit(2).cast("long").alias("slice_incl_len"),
        F.lit("abc").alias("slice_incl_text"),
        F.lit(4).cast("long").alias("corr_range_rows"),
        F.lit("a-b-c").alias("agg_order"),
        F.lit(10.0).alias("win_min_sum"),
        F.lit(2.5).alias("greatest_val"),
    )


_ORACLE_DIALECT_PROBE = """
WITH nums(x) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT)))
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  list_reduce(list_transform([1.0E0, 2.0E0, 3.0E0], y -> y * y),
              (a, b) -> a + b) AS lambda_fold,
  list_sort([ROW(2, 20.5E0), ROW(1, 10.25E0)])[1][2] AS struct_sort_pos,
  CAST(len(range(1, 4)) AS BIGINT) AS range_len,
  list_reduce(list_transform(range(1, 4), i -> CAST(i AS DOUBLE)),
              (a, b) -> a + b) AS range_fold,
  round(2.675E0, 2) AS round_knife_a,
  round(0.5E0, 0) AS round_half,
  round(-0.5E0, 0) AS round_neg_half,
  round(1.0000005E0, 6) AS round_knife_b,
  round(2.5E0, 0) AS round_half_up,
  0.1E0 + 0.2E0 AS fp_assoc,
  CAST(len((['a','b','c','d'])[2:3]) AS BIGINT) AS slice_incl_len,
  array_to_string((['a','b','c','d'])[1:3], '') AS slice_incl_text,
  (SELECT CAST(count(*) AS BIGINT)
   FROM (VALUES (3), (1)) t(n), unnest(range(1, n + 1)) r(i))
    AS corr_range_rows,
  (SELECT string_agg(x, '-' ORDER BY x)
   FROM (VALUES ('b'), ('c'), ('a')) t(x)) AS agg_order,
  (SELECT sum(m) FROM (
     SELECT min(v) OVER (ORDER BY i
                         ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS m
     FROM (VALUES (1, 5.0E0), (2, 3.0E0), (3, 4.0E0)) t(i, v)) s)
    AS win_min_sum,
  greatest(1.5E0, 2.5E0, 0.5E0) AS greatest_val
FROM nums
"""


def q_oracle_render_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendering-surface twin: the Spark side emits the Python values
    the LOCAL fetchall path yields, in the closest Spark types (long for
    HUGEINT-in-int-range, DECIMAL(8,6), double -0.0)."""
    return spark.range(1).select(
        F.lit(6).cast("long").alias("hugeint_sum"),
        F.expr("CAST(1.5 AS DECIMAL(8,6))").alias("dec_render"),
        F.lit(-0.0).alias("neg_zero"),
        F.lit(float("nan")).alias("nan_render"),
    )


_ORACLE_RENDER_PROBE = """
WITH nums(x) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT)))
SELECT
  sum(x) AS hugeint_sum,
  CAST(1.5 AS DECIMAL(8,6)) AS dec_render,
  round(-1.0E-7, 3) AS neg_zero,
  CAST('NaN' AS DOUBLE) AS nan_render
FROM nums
"""


QUERIES = {
    "oracle_dialect_probe": q_oracle_dialect_probe,
    "oracle_render_probe": q_oracle_render_probe,
}

ORACLES = {
    "oracle_dialect_probe": _ORACLE_DIALECT_PROBE,
    "oracle_render_probe": _ORACLE_RENDER_PROBE,
}
