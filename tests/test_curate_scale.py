"""Scale-shape regression tests for the composed curate job.

Round-3 verdict flagged two 100 TB killers in the curate CLI path: the
α-resample keep-set was hint-broadcast (budget-sized = training-set-sized
at a real run) and write_shards hashed the exchange on `source` alone
(one task per source value — a 90%-web-crawl corpus funnels 90% of mass
through one task). These tests pin the fixes the same way
tests/test_plans.py pins the declared queries: as plan/layout
properties, so a regression fails CI.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark import curate
from egal_yet_another_earthquake_project_spark.plans import inspect


@pytest.fixture()
def docs(spark):
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    return read_table(spark, "/root/testdata/sf0.001", "documents")


def test_curate_no_corpus_fraction_broadcast(spark, docs):
    """With size-based autobroadcast off (simulating scale, where every
    corpus-fraction frame exceeds the threshold) NO doc-id-keyed join in
    the curated-corpus plan may be broadcast: a surviving
    BroadcastHashJoin there can only come from a hint, and every
    doc-id-keyed frame in this job (keep-set, loser-set, packed) is a
    corpus fraction. AQE may still broadcast them at small scale — that
    is size-based and fine; a HINT is forever."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        result = curate.curate_corpus(
            docs, min_quality=0.0, lang=None, alpha=0.5, budget=100
        )
        bad = [
            (name, keys)
            for name, keys in inspect.join_key_nodes(result.corpus)
            if name == "BroadcastHashJoin" and "doc_id" in keys
        ]
        assert not bad, f"corpus-fraction frame(s) hint-broadcast: {bad}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.catalog.clearCache()


def test_write_shards_spreads_skewed_source(spark, tmp_path):
    """A 95%-dominant source must land in MORE than one output file (the
    ranged exchange splits it across tasks by pack_id) while each file
    individually stays in (pack_id, start_tok) order — the layout a
    training loader consumes."""
    n_dom, n_tail = 2000, 100
    corpus = spark.range(n_dom + n_tail).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_dom, F.lit("web")).otherwise(F.lit("books")).alias(
            "source"
        ),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.lit(7).alias("n_tokens"),
        (F.col("id") % 13 * 7).alias("start_tok"),
        (F.col("id") % 40).alias("pack_id"),
    )
    out = str(tmp_path / "shards")
    # AQE's small-partition coalescing re-merges kilobyte partitions (a
    # local-test artifact — at shard scale partitions are hundreds of MB
    # and stay put); disable it so the range partitioner's task split is
    # observable.
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        curate.write_shards(curate.CurationResult(corpus=corpus), out)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)

    web_files = [
        str(p) for p in (tmp_path / "shards" / "source=web").glob("*.parquet")
    ]
    assert len(web_files) > 1, (
        "dominant source written by a single task — the exchange is "
        "keyed on source alone again"
    )
    # Within every file: non-decreasing (pack_id, start_tok).
    for f in web_files:
        rows = spark.read.parquet(f).select("pack_id", "start_tok").collect()
        keys = [(r.pack_id, r.start_tok) for r in rows]
        assert keys == sorted(keys), f"pack/offset order broken within {f}"
    # And the shard tree as a whole is exactly the corpus.
    assert spark.read.parquet(out).count() == n_dom + n_tail


def test_curate_end_to_end_all_stages(spark, docs):
    """Full path with every optional stage ON (near-dedup + α-resample):
    the stats ladder must be monotone and the corpus must carry exactly
    the post-resample docs, packed."""
    result = curate.curate_corpus(
        docs, near_dedup=True, alpha=0.7, budget=150
    )
    try:
        s = result.stats
        # the observe()-collected input count must equal a plain count of
        # the input frame — i.e. no gate filter was pushed below the
        # CollectMetrics node (the r14 merge of the input-count job into
        # the first stage materialization relies on this)
        assert s["input"] == docs.count()
        assert s["input"] >= s["after_dedup"] >= s["after_resample"]
        # per-source ceil quotas overshoot by at most one doc per source
        n_sources = docs.select("source").distinct().count()
        assert s["after_resample"] <= 150 + n_sources
        got = result.corpus.count()
        assert got == s["after_resample"]
        assert result.corpus.select("pack_id").distinct().count() <= s["packs"]
    finally:
        spark.catalog.clearCache()


def test_curate_keep_best_quality(spark):
    """keep='best_quality' must retain each near-dup cluster's
    highest-quality member (here the LONGER doc, which has the larger
    id — the min_id policy would keep the shorter one)."""
    from egal_yet_another_earthquake_project_spark import curate

    base = " ".join(f"tok{j} word{j}" for j in range(20))  # 40 tokens
    longer = base + " " + " ".join(f"extra{j}" for j in range(5))
    docs = spark.createDataFrame(
        [
            (1, "web", base),
            (2, "web", longer),  # near-dup of 1, higher quality, larger id
            (3, "web", " ".join(f"unrel{j} other{j}" for j in range(20))),
        ],
        "doc_id long, source string, text string",
    )
    kept_best = curate.curate_corpus(
        docs, lang=None, near_dedup=True, keep="best_quality"
    ).corpus
    ids_best = {r.doc_id for r in kept_best.select("doc_id").distinct().collect()}
    assert ids_best == {2, 3}

    kept_min = curate.curate_corpus(docs, lang=None, near_dedup=True).corpus
    ids_min = {r.doc_id for r in kept_min.select("doc_id").distinct().collect()}
    assert ids_min == {1, 3}


def test_curate_decontamination_stage_drops_dirty_docs(spark, docs):
    """decontaminate=eval_docs drops exactly the docs whose overlap
    fraction reaches the threshold, records the stage in the stats
    ladder, and leaves the clean docs' downstream flow untouched."""
    from egal_yet_another_earthquake_project_spark.llm.dedup import (
        contamination_fraction,
    )

    # the eval set IS three corpus docs → those docs are 100% dirty
    eval_docs = docs.filter(F.col("doc_id") < 3)
    baseline = curate.curate_corpus(docs)
    try:
        result = curate.curate_corpus(
            docs, decontaminate=eval_docs, contamination_threshold=0.5
        )
        s = result.stats
        assert "after_decontamination" in s
        assert s["after_dedup"] >= s["after_decontamination"]
        expected_dirty = (
            contamination_fraction(
                docs, eval_docs, "doc_id", dirty_threshold=0.5
            )
            .filter(F.col("dirty"))
            .count()
        )
        assert expected_dirty >= 3  # the planted copies are caught
        kept_ids = {r.doc_id for r in result.corpus.select("doc_id").collect()}
        assert not kept_ids & {0, 1, 2}
        # clean docs flow through identically (same gates, no resample)
        base_ids = {r.doc_id for r in baseline.corpus.select("doc_id").collect()}
        assert kept_ids <= base_ids
    finally:
        spark.catalog.clearCache()
