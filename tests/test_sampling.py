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
