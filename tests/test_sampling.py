"""Deterministic sampling/split invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.sampling import (
    deterministic_sample,
    with_split,
)
from egal_yet_another_earthquake_project_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"


def test_sample_stable_under_repartitioning(spark):
    docs = read_table(spark, SF, "documents")
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), "doc_id", 0.2).collect()
    }
    assert a == b
    # fraction is approximately honored
    assert 0.1 < len(a) / docs.count() < 0.3


def test_split_partitions_everything_once(spark):
    docs = read_table(spark, SF, "documents")
    split = with_split(docs, "doc_id")
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)


def test_split_disjoint_from_sample_salt(spark):
    """Different salts give independent assignments — the same key can be
    sampled in one view and test-split in another without correlation."""
    docs = read_table(spark, SF, "documents")
    s1 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5, salt="a").collect()}
    s2 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5, salt="b").collect()}
    assert s1 != s2  # overwhelmingly likely under independence


def test_mixture_epochs_copy_counts_and_determinism(spark):
    """Weight w yields floor(w) copies for every doc plus one extra for
    a stable ~frac(w) share; zero-weight sources vanish; repartitioning
    changes nothing."""
    from egal_yet_another_earthquake_project_spark.llm import sampling as lsamp

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    out = lsamp.mixture_epochs(df, "source", "doc_id", {"a": 2.5, "b": 0.0})
    rows = out.collect()
    assert all(r.source == "a" for r in rows), "zero-weight source survived"
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.copy)
    for doc, copies in per_doc.items():
        assert sorted(copies) == list(range(1, len(copies) + 1))
        assert len(copies) in (2, 3)
    share3 = sum(1 for c in per_doc.values() if len(c) == 3) / len(per_doc)
    assert 0.3 < share3 < 0.7  # ~0.5 of 200 docs, generous envelope
    again = lsamp.mixture_epochs(
        df.repartition(7), "source", "doc_id", {"a": 2.5, "b": 0.0}
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_mixture_epochs_is_shuffle_free(spark):
    from egal_yet_another_earthquake_project_spark.llm import sampling as lsamp
    from egal_yet_another_earthquake_project_spark.plans import inspect
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from tests.conftest import TESTDATA_SMOKE

    docs = read_table(spark, TESTDATA_SMOKE, "documents").select("doc_id", "source")
    out = lsamp.mixture_epochs(docs, "source", "doc_id", {"src0": 2.3})
    assert inspect.exchange_count(out) == 0


def test_mixture_rejects_negative_weights(spark):
    import pytest

    from egal_yet_another_earthquake_project_spark.llm import sampling as lsamp

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="must be ≥ 0"):
        lsamp.mixture_epochs(df, "source", "doc_id", {"a": -1.0}).collect()


def test_leakage_safe_split_never_straddles_pairs(spark):
    """The whole point: every near-dup pair's two ends land in the SAME
    split (contrast hash_split on raw ids, which the split_leakage
    audit catches straddling); docs outside any pair keep the id-hash
    assignment."""
    from egal_yet_another_earthquake_project_spark.llm import sampling as lsamp

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(0, 50)], "doc_a long, doc_b long"
    )
    out = lsamp.leakage_safe_split(docs.select("doc_id"), pairs, "doc_id")
    split = {r.doc_id: r.split for r in out.collect()}
    for a in range(0, 50):
        assert split[a] == split[a + 100], f"pair ({a},{a+100}) straddles"
    # unpaired docs match the plain id-hash assignment
    plain = {
        r.doc_id: r.split
        for r in lsamp.with_split(docs.select("doc_id"), "doc_id").collect()
    }
    for i in range(50, 100):
        assert split[i] == plain[i]


def test_stratified_split_hits_exact_quotas(spark):
    """Within every stratum the split sizes are exactly ⌊w·n⌋-based —
    even a tiny stratum gets its proportional shares, where a hash
    split would wander."""
    from egal_yet_another_earthquake_project_spark.llm import sampling as lsamp

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = lsamp.stratified_split(df, "source", "doc_id")
    counts = {
        (r.source, r.split): r.n
        for r in out.groupBy("source", "split").agg(F.count("*").alias("n")).collect()
    }
    assert counts[("big", "train")] == 80
    assert counts[("big", "val")] == 10
    assert counts[("big", "test")] == 10
    assert counts[("small", "train")] == 8
    assert counts[("small", "val")] == 1
    assert counts[("small", "test")] == 1
    # invariance
    again = lsamp.stratified_split(df.repartition(7), "source", "doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
