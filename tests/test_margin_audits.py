"""Rounding-margin audits for rounded-rank queries (VERDICT r11 #1b).

Every declared query that ranks or cuts on a round(·, d) value must keep
all raw values > MIN_MARGIN from a rounding boundary on the parity
dataset — the fragility that flipped retrieval_ndcg on the round-11
driver host is detected here instead of suffered downstream. parity.py
runs the same audits against sf0.01 and refuses a green artifact on any
failure; this test keeps them in the pytest gate and checks the audit's
own arithmetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark import audits, workloads

SF_DIR = "/root/testdata/sf0.01"


def test_round_margin_expression(spark):
    # distances to the x.xxx5 boundaries of round(·, 4)
    cases = [
        (0.12344, 0.00004),    # boundary at 0.12345 → 1e-5 short... no:
        # 0.12344 scaled = 1234.4, frac 0.4, |0.4-0.5| = 0.1 → 1e-5
        (0.123450001, 1e-9),   # just past the boundary
        (0.1234, 0.5e-4),      # dead center of its interval
        (-0.99995000001, 1e-11),  # negative side boundary
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "raw double")
    got = [
        r["m"]
        for r in df.select(
            audits.round_margin(F.col("raw"), 4).alias("m")
        ).collect()
    ]
    expect = [1e-5, 1e-9, 0.5e-4, 1e-11]
    for g, e in zip(got, expect):
        assert g == pytest.approx(e, rel=1e-6), (g, e)


def test_every_audit_names_a_declared_query():
    unknown = set(audits.MARGIN_AUDITS) - set(workloads.QUERIES)
    assert not unknown, f"margin audits for undeclared queries: {unknown}"


@pytest.mark.parametrize("name", sorted(audits.MARGIN_AUDITS))
def test_margin_audit_passes(spark, name):
    rows = audits.MARGIN_AUDITS[name](spark, SF_DIR).collect()
    assert rows, f"{name}: audit produced no rows"
    for r in rows:
        # floor-grid rows (scaled-axis units) carry their own threshold
        thr = (
            audits.FLOOR_MIN_MARGIN
            if str(r["what"]).endswith("-grid")
            else audits.MIN_MARGIN
        )
        assert r["margin"] is not None and r["margin"] > thr, (
            f"{name}: raw value {r['margin']:.3e} from its "
            f"boundary at key {r['what']} (threshold {thr:.1e}) — "
            "cross-engine fragile"
        )


def test_floor_margin_expression(spark):
    # distances of c·Q to the integer grid, scaled-axis units
    q = audits.lsrch.SCORE_QUANTUM
    cases = [
        ((100.0 + 0.25) / q, 0.25),   # frac 0.25 below next int
        ((100.0 - 0.125) / q, 0.125),  # frac 0.875 → 0.125 to next int
        (100.0 / q, 0.0),              # exactly on the grid
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "raw double")
    got = [
        r["m"]
        for r in df.select(
            audits.floor_margin(F.col("raw"), q).alias("m")
        ).collect()
    ]
    for g, (_, e) in zip(got, cases):
        assert g == pytest.approx(e, abs=1e-9), (g, e)
