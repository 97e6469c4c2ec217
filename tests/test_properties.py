"""Property-based tests (hypothesis): engine operators vs independent
reference implementations on randomized inputs. Few examples, fixed seeds
— these catch semantic edge cases (ties, gaps, empties), not performance.
"""

from __future__ import annotations

import bisect

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import text as ltx
from egal_yet_another_earthquake_project_spark.operators import joins, skew

SETTINGS = settings(max_examples=8, deadline=None)


@st.composite
def _asof_case(draw):
    left_ts = draw(
        st.lists(st.integers(min_value=0, max_value=50_000), min_size=1, max_size=30)
    )
    right = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50_000),
                st.floats(min_value=-100, max_value=100, allow_nan=False),
            ),
            min_size=0,
            max_size=30,
            unique_by=lambda t: t[0],
        )
    )
    return left_ts, right


@SETTINGS
@given(_asof_case())
def test_asof_join_matches_reference(spark, case):
    """Bucketed keyless ASOF == a simple bisect-based reference."""
    left_ts, right = case
    from datetime import datetime, timezone

    def dt(t):
        return datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None)

    left = spark.createDataFrame(
        [(i, dt(t)) for i, t in enumerate(left_ts)], "id long, ts timestamp"
    )
    right_df = spark.createDataFrame(
        [(dt(t), v) for t, v in right] or [], "time timestamp, v double"
    )
    out = {
        r.id: r.v
        for r in joins.asof_join(
            left, right_df, "ts", "time", ["v"], bucket_minutes=7
        ).collect()
    }
    rs = sorted(right)
    rts = [t for t, _ in rs]
    for i, t in enumerate(left_ts):
        j = bisect.bisect_right(rts, t) - 1
        expected = rs[j][1] if j >= 0 else None
        assert out[i] == expected, (i, t, out[i], expected)


@SETTINGS
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 5)),
        min_size=0,
        max_size=60,
    )
)
def test_salted_group_count_property(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k string, v int")
    plain = dict(df.groupBy("k").count().collect())
    salted = {r.k: r.n for r in skew.salted_group_count(df, ["k"], 5).collect()}
    assert salted == plain


@SETTINGS
@given(st.text(alphabet=" abcdefgh\t\n", min_size=0, max_size=80))
def test_tokenizer_matches_python_reference(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    got = df.select(ltx.tokens("text").alias("t")).collect()[0].t
    expected = s.lower().split()
    assert got == expected


@SETTINGS
@given(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=2, max_size=16),
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=2, max_size=16),
)
def test_cosine_matches_numpy(spark, a, b):
    import math

    import numpy as np

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    na, nb = np.array(a), np.array(b)
    denom = float(np.linalg.norm(na) * np.linalg.norm(nb))
    if denom == 0.0:
        return
    expected = float(na @ nb) / denom
    from egal_yet_another_earthquake_project_spark.llm.similarity import cosine

    df = spark.createDataFrame([(a, b)], "x array<double>, y array<double>")
    got = df.select(cosine("x", "y").alias("c")).collect()[0].c
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)
    assert not math.isnan(got)
