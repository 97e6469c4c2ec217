"""Unit tests for the corpus-preparation operators (chunking, repetition
profile, BM25) — edge cases the oracle-parity sweep can't see because the
driver corpus contains no degenerate documents."""

from __future__ import annotations

import math

import pytest

from egal_yet_another_earthquake_project_spark.llm import search as lsrch
from egal_yet_another_earthquake_project_spark.llm import text as ltx


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_tokens_overlap(spark):
    text = " ".join(f"w{i}" for i in range(40))
    out = ltx.chunk_tokens(_docs(spark, [(1, text)]), size=32, stride=24).collect()
    assert [r.chunk_start for r in out] == [0, 24]
    assert [r.chunk_id for r in out] == [0, 1]
    first, second = out
    assert first.n_chunk_tokens == 32
    assert second.n_chunk_tokens == 16  # tail chunk is short
    # Overlap: the last 8 tokens of chunk 0 are the first 8 of chunk 1.
    assert first.chunk_text.split()[24:] == second.chunk_text.split()[:8]
    # Every token is covered.
    covered = set(first.chunk_text.split()) | set(second.chunk_text.split())
    assert covered == {f"w{i}" for i in range(40)}


def test_chunk_tokens_empty_and_short_docs(spark):
    out = {
        (r.doc_id, r.chunk_id): r
        for r in ltx.chunk_tokens(
            _docs(spark, [(1, ""), (2, "   "), (3, "one two")]),
            size=32,
            stride=24,
        ).collect()
    }
    # Empty/whitespace docs survive as one empty chunk.
    assert out[(1, 0)].chunk_text == "" and out[(1, 0)].n_chunk_tokens == 0
    assert out[(2, 0)].chunk_text == "" and out[(2, 0)].n_chunk_tokens == 0
    assert out[(3, 0)].chunk_text == "one two"
    assert len(out) == 3


def test_chunk_tokens_no_overlap_stride(spark):
    text = " ".join(str(i) for i in range(10))
    out = ltx.chunk_tokens(_docs(spark, [(1, text)]), size=5, stride=5).collect()
    assert [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_id)] == [
        "0 1 2 3 4",
        "5 6 7 8 9",
    ]


def test_chunk_tokens_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        ltx.chunk_tokens(_docs(spark, [(1, "x")]), size=0)
    with pytest.raises(ValueError):
        ltx.chunk_tokens(_docs(spark, [(1, "x")]), stride=0)


def test_repetition_profile_degenerate_doc(spark):
    rows = ltx.repetition_profile(
        _docs(spark, [(1, "a a a a"), (2, "the quick brown fox")])
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    loop = by_id[1]
    assert loop.n_tokens == 4 and loop.n_bigrams == 3
    assert loop.top_token_frac == 1.0 and loop.top_bigram_frac == 1.0
    assert loop.distinct_token_ratio == 0.25
    assert loop.distinct_bigram_ratio == round(1 / 3, 4)
    clean = by_id[2]
    assert clean.distinct_token_ratio == 1.0
    assert clean.top_token_frac == 0.25
    assert clean.distinct_bigram_ratio == 1.0


def test_bm25_rewards_matches_and_brevity(spark):
    docs = _docs(
        spark,
        [
            (1, "join join join filler filler"),
            (2, "join filler filler filler filler"),
            (3, "nothing relevant here at all"),
            (4, "join " + "pad " * 50),
        ],
    )
    rows = {r.doc_id: r for r in lsrch.bm25_scores(docs, ("join",)).collect()}
    assert 3 not in rows  # no matching term -> no row
    assert rows[1].score > rows[2].score  # higher tf wins
    assert rows[2].score > rows[4].score  # same tf, shorter doc wins
    assert rows[1].n_terms == 1


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    docs = _docs(
        spark,
        [
            (1, "common rare x x"),
            (2, "common x x x"),
            (3, "common x x x"),
            (4, "common x x x"),
        ],
    )
    rows = {r.doc_id: r for r in lsrch.bm25_scores(docs, ("common", "rare")).collect()}
    # doc 1 holds both; the rare term must contribute more than common.
    n, sdl = 4, 16
    def idf(df_):
        return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)
    assert idf(1) > idf(4)
    assert rows[1].n_terms == 2
    assert rows[1].score > rows[2].score


def test_bm25_rejects_empty_terms(spark):
    with pytest.raises(ValueError):
        lsrch.bm25_scores(_docs(spark, [(1, "x")]), ())
