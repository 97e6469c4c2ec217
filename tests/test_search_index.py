"""Persisted BM25 inverted index (llm.search_index, VERDICT r11 ask #4):
build-once/search-many must be BIT-identical to the from-scratch scorer,
survive rebuilds atomically (CURRENT flip), and never serve a partially
staged version."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import search as lsrch
from egal_yet_another_earthquake_project_spark.llm import search_index as si
from egal_yet_another_earthquake_project_spark.llm.ann_index import (
    resolve_index_dir,
)

DOCS = [
    (1, "spark joins a hash join with a sort merge join"),
    (2, "the scan filter pushes the filter into the scan"),
    (3, "hash partitioning beats a global sort for a join"),
    (4, "a filter after a scan"),
    (5, "unrelated prose about nothing in particular"),
]
QUERIES = [(0, "join hash"), (1, "scan filter"), (2, "join")]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture()
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, qtext string")


def _by_key(rows):
    return {
        (r["query_id"], r["doc_id"]): (r["score"], r["n_terms"]) for r in rows
    }


def test_index_search_matches_from_scratch(spark, tmp_path, docs, queries):
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    got = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    want = _by_key(lsrch.bm25_scores_per_query(docs, queries).collect())
    assert got == want  # bit-identical scores, same candidate set
    assert got  # non-vacuous


def test_rebuild_flips_current_and_search_sees_new_corpus(
    spark, tmp_path, docs, queries
):
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    assert resolve_index_dir(idx).endswith("v=1")
    docs2 = docs.unionByName(
        spark.createDataFrame(
            [(6, "join join join join")], "doc_id long, text string"
        )
    )
    si.build_bm25_index(docs2, idx, n_buckets=8)
    assert resolve_index_dir(idx).endswith("v=2")
    got = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    want = _by_key(lsrch.bm25_scores_per_query(docs2, queries).collect())
    assert got == want
    assert (0, 6) in got  # the new doc is retrievable post-rebuild


def test_partial_stage_never_selected(spark, tmp_path, docs, queries):
    # a crash mid-stage leaves v=N without _COMPLETE and (worse) may
    # have lost CURRENT — the resolver must fall back to the newest
    # COMPLETE version, not the partial one
    import os

    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    os.makedirs(f"{idx}/v=2/postings", exist_ok=True)  # staged, no marker
    os.remove(f"{idx}/CURRENT")
    assert resolve_index_dir(idx).endswith("v=1")
    got = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    want = _by_key(lsrch.bm25_scores_per_query(docs, queries).collect())
    assert got == want


def test_no_matching_terms_returns_typed_empty(spark, tmp_path, docs):
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    out = si.search_bm25_index(
        spark,
        idx,
        spark.createDataFrame(
            [(0, "zzz qqq")], "query_id long, qtext string"
        ),
    )
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "doc_id", "score", "n_terms"}


def test_stats_are_frozen_at_build(spark, tmp_path, docs, queries):
    # searching v=1 after the corpus GREW (but before a rebuild) must
    # use v=1's df/ndocs/sdl — the index is a snapshot, staleness is
    # resolved by rebuild, never by mixing live stats into old postings
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    before = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    # (no rebuild) — results must be byte-stable however often we ask
    again = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    assert before == again
