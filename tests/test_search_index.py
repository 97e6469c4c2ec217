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


def test_update_matches_full_rebuild_and_is_delta_only(
    spark, tmp_path, docs, queries
):
    # incremental maintenance: base index on 3 docs, update with the
    # other 2 -> scores BIT-identical to (a) the from-scratch scorer and
    # (b) a full rebuild over all 5; the staged version is manifest-only
    # (no postings were rewritten) and the base segment's files are
    # untouched
    import os

    base = docs.filter(F.col("doc_id") <= 3)
    delta = docs.filter(F.col("doc_id") > 3)
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(base, idx, n_buckets=8)
    base_files = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _, fs in os.walk(f"{idx}/v=1/postings")
        for f in fs
    }
    v = si.update_bm25_index(delta, idx)
    assert v == 2 and resolve_index_dir(idx).endswith("v=2")
    assert not os.path.exists(f"{idx}/v=2/postings")  # manifest-only
    after = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _, fs in os.walk(f"{idx}/v=1/postings")
        for f in fs
    }
    assert after == base_files  # base postings never rewritten
    got = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    want = _by_key(lsrch.bm25_scores_per_query(docs, queries).collect())
    assert got == want and got
    full = str(tmp_path / "bm25full")
    si.build_bm25_index(docs, full, n_buckets=8)
    assert got == _by_key(si.search_bm25_index(spark, full, queries).collect())


def test_update_crash_before_cutover_serves_old_version(
    spark, tmp_path, docs, queries
):
    base = docs.filter(F.col("doc_id") <= 3)
    delta = docs.filter(F.col("doc_id") > 3)
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(base, idx, n_buckets=8)
    want = _by_key(si.search_bm25_index(spark, idx, queries).collect())

    class Boom(RuntimeError):
        pass

    def _crash():
        raise Boom()

    import pytest as _pt

    with _pt.raises(Boom):
        si.update_bm25_index(delta, idx, _before_cutover=_crash)
    # every reader still resolves the old complete version; a retried
    # update then lands cleanly (the orphaned segment is just GC fodder)
    assert resolve_index_dir(idx).endswith("v=1")
    assert _by_key(si.search_bm25_index(spark, idx, queries).collect()) == want
    si.update_bm25_index(delta, idx)
    got = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    assert got == _by_key(lsrch.bm25_scores_per_query(docs, queries).collect())


def test_compaction_preserves_scores_then_gc_drops_dead_segments(
    spark, tmp_path, docs, queries
):
    import os

    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs.filter(F.col("doc_id") <= 2), idx, n_buckets=8)
    si.update_bm25_index(docs.filter(F.col("doc_id") == 3), idx)
    si.update_bm25_index(docs.filter(F.col("doc_id") >= 4), idx)
    before = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    res = si.compact_bm25_index(spark, idx)
    assert res["compacted"] and res["segments"] == 3
    assert _by_key(si.search_bm25_index(spark, idx, queries).collect()) == before
    # predecessor grace: the pre-compaction manifest still references
    # the legacy v=1 segment and s=1/s=2, so they survive this GC …
    assert os.path.exists(f"{idx}/v=1/postings")
    # … and die once the NEXT maintenance call advances the window
    si.update_bm25_index(
        spark.createDataFrame([(9, "join scan")], "doc_id long, text string"),
        idx,
    )
    assert not os.path.exists(f"{idx}/v=1")
    assert not os.path.exists(f"{idx}/segments/s=1")
    assert not os.path.exists(f"{idx}/segments/s=2")
    # compacting a monolithic index is a no-op
    mono = str(tmp_path / "mono")
    si.build_bm25_index(docs, mono, n_buckets=8)
    assert si.compact_bm25_index(spark, mono) == {
        "compacted": False,
        "segments": 1,
    }


def test_update_requires_existing_index(spark, tmp_path, docs):
    with pytest.raises(ValueError, match="build first"):
        si.update_bm25_index(docs, str(tmp_path / "nope"))


def test_delete_matches_from_scratch_over_remaining(
    spark, tmp_path, docs, queries
):
    # tombstones + NEGATIVE df/Σdl/N sidecars: post-delete scores must
    # equal a from-scratch build over the remaining corpus — exact df,
    # not Lucene's stale-until-merge approximation
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    doomed = docs.filter(F.col("doc_id").isin(2, 4))
    v = si.delete_from_bm25_index(doomed, idx)
    assert v == 2
    remaining = docs.filter(~F.col("doc_id").isin(2, 4))
    got = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    want = _by_key(lsrch.bm25_scores_per_query(remaining, queries).collect())
    assert got == want and got
    assert not any(d in (2, 4) for (_, d) in got)


def test_delete_of_terms_sole_doc_makes_term_unsearchable(
    spark, tmp_path, docs
):
    q = spark.createDataFrame(
        [(0, "prose")], "query_id long, qtext string"
    )
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    assert si.search_bm25_index(spark, idx, q).count() == 1  # doc 5
    si.delete_from_bm25_index(docs.filter(F.col("doc_id") == 5), idx)
    assert si.search_bm25_index(spark, idx, q).count() == 0


def test_delete_then_compact_physically_purges(spark, tmp_path, docs, queries):
    import os

    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    si.delete_from_bm25_index(docs.filter(F.col("doc_id") == 2), idx)
    before = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    res = si.compact_bm25_index(spark, idx)  # 1 segment but live deletes
    assert res["compacted"] is True
    assert _by_key(si.search_bm25_index(spark, idx, queries).collect()) == before
    # the merged segment holds NO tombstoned rows
    merged = spark.read.parquet(f"{idx}/segments/s=1/postings")
    assert merged.filter(F.col("doc_id") == 2).count() == 0
    # next maintenance advances the GC window past the delete segment
    si.update_bm25_index(
        spark.createDataFrame([(9, "join scan")], "doc_id long, text string"),
        idx,
    )
    assert not os.path.exists(f"{idx}/segments/d=1")
    got = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    want = _by_key(
        lsrch.bm25_scores_per_query(
            docs.filter(F.col("doc_id") != 2).unionByName(
                spark.createDataFrame(
                    [(9, "join scan")], "doc_id long, text string"
                )
            ),
            queries,
        ).collect()
    )
    assert got == want


def test_delete_crash_before_cutover_serves_old_version(
    spark, tmp_path, docs, queries
):
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs, idx, n_buckets=8)
    want = _by_key(si.search_bm25_index(spark, idx, queries).collect())

    class Boom(RuntimeError):
        pass

    def _crash():
        raise Boom()

    with pytest.raises(Boom):
        si.delete_from_bm25_index(
            docs.filter(F.col("doc_id") == 1), idx, _before_cutover=_crash
        )
    assert resolve_index_dir(idx).endswith("v=1")
    assert _by_key(si.search_bm25_index(spark, idx, queries).collect()) == want


def test_named_segment_commit_is_replay_idempotent(
    spark, tmp_path, docs, queries
):
    # the streaming-maintenance contract: a replayed named commit is a
    # no-op even after a compaction folded the segment away
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs.filter(F.col("doc_id") <= 3), idx, n_buckets=8)
    delta = docs.filter(F.col("doc_id") > 3)
    v1 = si.update_bm25_index(delta, idx, segment_name="b=0")
    want = _by_key(si.search_bm25_index(spark, idx, queries).collect())
    assert si.update_bm25_index(delta, idx, segment_name="b=0") == v1  # no-op
    assert _by_key(si.search_bm25_index(spark, idx, queries).collect()) == want
    res = si.compact_bm25_index(spark, idx)
    assert res["compacted"] is True
    # b=0 is no longer in the manifest, but last_applied remembers it
    assert si.update_bm25_index(delta, idx, segment_name="b=0") == v1 + 1
    assert _by_key(si.search_bm25_index(spark, idx, queries).collect()) == want


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


def test_segmented_search_prunes_buckets_statically_per_segment(
    spark, tmp_path, docs, queries
):
    # the update must not cost the pruning: EVERY segment's postings
    # scan carries the query buckets as a STATIC partition filter
    import re

    idx = str(tmp_path / "bm25")
    si.build_bm25_index(docs.filter(F.col("doc_id") <= 3), idx, n_buckets=8)
    si.update_bm25_index(docs.filter(F.col("doc_id") > 3), idx)
    plan = (
        si.search_bm25_index(spark, idx, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    filters = re.findall(r"PartitionFilters: \[[^\]]*_tb[^\]]*IN[^\]]*\]", plan)
    assert len(filters) == 2, plan[:2000]  # one per segment, both pruned


def test_full_rebuild_carries_streaming_replay_memo(spark, tmp_path):
    """ADVICE r12 (low): a full build_bm25_index over a live index used
    to discard the manifest's last_applied memo, so a streaming
    checkpoint replaying its last batch across the rebuild would
    re-commit the segment and double-count df. The rebuild now carries
    the memo in a one-entry manifest: the replay stays a no-op and
    scores are unchanged."""
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        resolve_index_dir,
    )
    from egal_yet_another_earthquake_project_spark.llm.search import (
        bm25_scores_per_query,
    )
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        build_bm25_index,
        search_bm25_index,
        update_bm25_index,
    )
    from egal_yet_another_earthquake_project_spark.sources.files import (
        read_table,
    )
    from egal_yet_another_earthquake_project_spark.workloads_llm import (
        HYBRID_QUERY_TEXTS,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    base = docs.filter("doc_id % 2 = 0")
    d1 = docs.filter("doc_id % 2 = 1")
    idx = str(tmp_path / "bm25")
    build_bm25_index(base, idx, n_buckets=16)
    update_bm25_index(d1, idx, segment_name="b=0")

    # full rebuild over the whole corpus while the checkpoint is live
    build_bm25_index(docs, idx, n_buckets=16)
    cur = int(resolve_index_dir(idx).rsplit("v=", 1)[1])

    # the replayed last batch must be a no-op, not a double-commit
    assert update_bm25_index(d1, idx, segment_name="b=0") == cur

    queries = spark.createDataFrame(
        list(HYBRID_QUERY_TEXTS), "query_id long, qtext string"
    )

    def key(rows):
        return {(r.query_id, r.doc_id): (r.score, r.n_terms) for r in rows}

    assert key(search_bm25_index(spark, idx, queries).collect()) == key(
        bm25_scores_per_query(docs, queries).collect()
    )


def test_compaction_crash_before_cutover_loses_nothing(spark, tmp_path):
    """Crash discipline across the compaction boundary (VERDICT r12
    #7): a compaction that stages its merged segment + manifest but
    dies BEFORE the CURRENT flip must leave every reader on the old
    complete version with identical scores, and a retry must complete
    normally with no segment loss and no double counting."""
    from egal_yet_another_earthquake_project_spark.llm import (
        search_index as si,
    )
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        resolve_index_dir,
    )
    from egal_yet_another_earthquake_project_spark.llm.search import (
        bm25_scores_per_query,
    )
    from egal_yet_another_earthquake_project_spark.sources.files import (
        read_table,
    )
    from egal_yet_another_earthquake_project_spark.workloads_llm import (
        HYBRID_QUERY_TEXTS,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    base = docs.filter("doc_id % 3 = 0")
    d1 = docs.filter("doc_id % 3 = 1")
    d2 = docs.filter("doc_id % 3 = 2")
    idx = str(tmp_path / "bm25")
    si.build_bm25_index(base, idx, n_buckets=16)
    si.update_bm25_index(d1, idx, segment_name="b=0")
    si.update_bm25_index(d2, idx, segment_name="b=1")

    queries = spark.createDataFrame(
        list(HYBRID_QUERY_TEXTS), "query_id long, qtext string"
    )

    def key(rows):
        return {(r.query_id, r.doc_id): (r.score, r.n_terms) for r in rows}

    want = key(bm25_scores_per_query(docs, queries).collect())
    assert key(si.search_bm25_index(spark, idx, queries).collect()) == want
    before_version = resolve_index_dir(idx)

    # crash the pointer flip mid-compaction
    real_set = si._set_current
    calls = {"n": 0}

    def crashing_set(index_dir, version):
        calls["n"] += 1
        raise RuntimeError("simulated crash before cutover")

    si._set_current = crashing_set
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="simulated crash"):
            si.compact_bm25_index(spark, idx)
    finally:
        si._set_current = real_set
    assert calls["n"] == 1

    # readers still resolve the OLD complete version, scores unchanged
    assert resolve_index_dir(idx) == before_version
    assert key(si.search_bm25_index(spark, idx, queries).collect()) == want

    # retry completes; one merged segment, scores still exact, and the
    # streaming replay memo survived the crash + retry
    res = si.compact_bm25_index(spark, idx)
    assert res["compacted"] is True
    segs = si._segment_paths(spark, idx, resolve_index_dir(idx))
    assert len(segs) == 1
    assert key(si.search_bm25_index(spark, idx, queries).collect()) == want
    assert si.update_bm25_index(d2, idx, segment_name="b=1") == int(
        resolve_index_dir(idx).rsplit("v=", 1)[1]
    )
