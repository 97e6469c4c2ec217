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


# ---------------------------------------------------------------- PII


_PII_TEXT = (
    "Contact alice.smith+x@example.co.uk or see https://ex.com/a?b=1 "
    "from 10.0.255.7 ref 12345678 and bob@ex.io."
)


def test_pii_profile_counts_and_redaction(spark):
    from egal_yet_another_earthquake_project_spark.llm import pii as lpii

    row = lpii.pii_profile(_docs(spark, [(1, _PII_TEXT)])).collect()[0]
    assert (row.n_email, row.n_url, row.n_ipv4, row.n_digit_run) == (2, 1, 1, 1)
    assert row.n_pii == 5
    red = spark.createDataFrame([(_PII_TEXT,)], "text string").select(
        lpii.redact("text").alias("r")
    ).collect()[0].r
    assert red == (
        "Contact <EMAIL> or see <URL> from <IP> ref <NUM> and <EMAIL>."
    )
    assert row.redacted_len == len(red)


def test_pii_redaction_matches_duckdb_on_positive_text(spark):
    """Cross-engine pin on text that DOES contain PII (the driver corpus
    is PII-free, so its oracle rows are all-zero; this is the positive
    case)."""
    import duckdb

    from egal_yet_another_earthquake_project_spark.llm import pii as lpii
    from egal_yet_another_earthquake_project_spark.workloads_corpus import (
        _PII_REDACTED,
    )

    texts = [
        (_PII_TEXT,),
        ("no pii here at all",),
        ("edge: x@y.zz http://a 1.2.3.4 9999999",),
        ("almost: x@y 999999 1.2.3 http//nope",),
    ]
    spark_rows = (
        spark.createDataFrame(texts, "text string")
        .select(lpii.redact("text").alias("r"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", texts)
    duck_rows = con.execute(
        f"SELECT {_PII_REDACTED} FROM t"
    ).fetchall()
    assert [r.r for r in spark_rows] == [d[0] for d in duck_rows]


def test_unigram_nll_orders_surprisal(spark):
    """A doc made of corpus-frequent tokens must score lower NLL than a
    doc of hapaxes; token-free docs drop out."""
    from egal_yet_another_earthquake_project_spark.llm import lm as llm

    docs = _docs(
        spark,
        [
            (1, "the the the cat"),
            (2, "the cat sat"),
            (3, "zyzzyva qwerty"),
            (4, "   "),
        ],
    )
    out = {r.doc_id: r for r in llm.doc_nll(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_tokens == 4
    assert out[1].nll < out[2].nll < out[3].nll
    # Hand-check doc 3: corpus N=9 tokens, V=5 distinct; both tokens are
    # hapaxes.
    expected = -math.log((1 + 1) / (9 + 5))
    assert out[3].nll == pytest.approx(expected, abs=1e-4)


def test_udtf_split_sentences_lateral(spark):
    """§2.10 UDTF surface: per-row Python expansion with a declared
    schema, consumed from SQL via LATERAL."""
    spark.udtf.register("split_sentences", ltx.SplitSentences)
    rows = spark.sql(
        "SELECT t.doc_id, s.sent_id, s.sentence "
        "FROM VALUES (1, 'one fish. two fish! red?'), (2, '') t(doc_id, txt), "
        "LATERAL split_sentences(txt) s "
        "ORDER BY doc_id, sent_id"
    ).collect()
    assert [(r.doc_id, r.sent_id, r.sentence) for r in rows] == [
        (1, 0, "one fish"),
        (1, 1, "two fish"),
        (1, 2, "red"),
    ]


def test_bpe_merges_hand_computed_and_greedy(spark):
    """Hand-checkable vocabulary: 'low'×5, 'lower'×2, 'aaaa'×10.
    Round 1: 'aaaa' contributes 3 adjacent 'a a' pairs ×10 = 30 — the
    clear winner; the greedy left-to-right merge turns it into
    'aa aa $'. Round 2: 'aa aa' and 'aa $' tie at 10 (> 'l o' at 7) and
    the deterministic tie-break (pair ascending; '$' < 'a') picks
    'aa $'. Round 3: the stream is 'aa aa$', so 'aa aa$' wins at 10."""
    from egal_yet_another_earthquake_project_spark.llm import bpe as lbpe

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("aaaa", 10)], "word string, cnt long"
    )
    merges = {r.step: (r.pair, r.cnt) for r in
              lbpe.bpe_train(spark, words, num_merges=3).collect()}
    assert merges[1] == ("a a", 30)
    assert merges[2] == ("aa $", 10), f"round 2 got {merges[2]}"
    assert merges[3] == ("aa aa$", 10), f"round 3 got {merges[3]}"


def test_bpe_independence_predicate():
    from egal_yet_another_earthquake_project_spark.llm.bpe import _independent

    assert _independent("a b", "c d")
    assert not _independent("a b", "b c")  # shared member
    assert not _independent("a b", "a c")  # shared member
    assert not _independent("a b", "ab c")  # product of p is member of q
    assert not _independent("th e", "t h")  # product of q is member of p
    assert _independent("a bc", "ab c")  # equal products are fine


def test_bpe_batched_hand_computed(spark):
    """Batched rounds on disjoint alphabets, hand-replayed:
    'aab'×10, 'ccd'×9, 'eef'×8. Round-1 ranking: 'a a'10,'a b'10,'b $'10,
    'c c'9,'c d'9,'d $'9,'e e'8,'e f'8,'f $'8 — greedy batch of 4 skips
    'a b' (shares a), picks 'b $' (independent of 'a a'), 'c c', 'e e'.
    Applying gives 'aa b$', 'cc d $', 'ee f $'. Round-2 ranking:
    'aa b$'10,'cc d'9,'d $'9,'ee f'8,'f $'8 — greedy picks only THREE
    independent pairs, so num_merges=8 learns 7 (documented behavior)."""
    from egal_yet_another_earthquake_project_spark.llm import bpe as lbpe

    words = spark.createDataFrame(
        [("aab", 10), ("ccd", 9), ("eef", 8)], "word string, cnt long"
    )
    got = [
        (r.step, r.pair, r.cnt)
        for r in lbpe.bpe_train(spark, words, num_merges=8, batch_merges=4)
        .orderBy("step")
        .collect()
    ]
    assert got == [
        (1, "a a", 10),
        (2, "b $", 10),
        (3, "c c", 9),
        (4, "e e", 8),
        (5, "aa b$", 10),
        (6, "cc d", 9),
        (7, "ee f", 8),
    ], got


def test_bpe_batch_one_is_classic(spark):
    """batch_merges=1 must reproduce the classic per-merge sequence."""
    from egal_yet_another_earthquake_project_spark.llm import bpe as lbpe

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("aaaa", 10)], "word string, cnt long"
    )
    a = lbpe.bpe_train(spark, words, num_merges=3, batch_merges=1).collect()
    b = lbpe.bpe_train(spark, words, num_merges=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_partition_invariant(spark):
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm import bpe as lbpe
    from egal_yet_another_earthquake_project_spark.llm import text as ltx
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    words = (
        ltx.tokenized(docs)
        .select(F.explode("_toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    a = sorted(map(tuple, lbpe.bpe_train(spark, words, num_merges=2).collect()))
    b = sorted(
        map(
            tuple,
            lbpe.bpe_train(spark, words.repartition(7), num_merges=2).collect(),
        )
    )
    assert a == b


def test_bpe_apply_segments_with_learned_merges(spark):
    """Round trip: applying the learned merges segments 'lower' into the
    merged units (round 1 'a a', 2 'aa $', 3 'aa aa$' — from the
    hand-computed fixture) and leaves unrelated words at char level;
    'aaaa' collapses to the single final symbol."""
    from egal_yet_another_earthquake_project_spark.llm import bpe as lbpe

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("aaaa", 10)], "word string, cnt long"
    )
    merges = [
        r.pair
        for r in lbpe.bpe_train(spark, words, num_merges=3).orderBy("step").collect()
    ]
    got = {r.word: r.pieces for r in lbpe.bpe_apply(words, merges).collect()}
    assert got["aaaa"] == "aaaa$"
    assert got["low"] == "l o w $"
    assert got["lower"] == "l o w e r $"


def test_compression_profile_separates_template_from_prose(spark):
    """Repeated boilerplate must compress far better than varied prose,
    and the plan must stay a shuffle-free Arrow projection."""
    from egal_yet_another_earthquake_project_spark.llm.text import (
        compression_profile,
    )
    from egal_yet_another_earthquake_project_spark.plans import inspect

    template = "click here to subscribe now " * 60
    prose = (
        "the quarterly report outlines revenue shifts across distinct "
        "regional markets while noting unusual churn among recently "
        "acquired enterprise customers and proposing several remedies "
        "grounded in pricing experiments from adjacent product lines "
    ) * 3
    df = spark.createDataFrame(
        [(1, template), (2, prose), (3, "")], "doc_id long, text string"
    )
    out = compression_profile(df)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].ratio > 2 * rows[2].ratio, (rows[1], rows[2])
    assert rows[2].ratio > 1.5
    assert rows[3].ratio == 0.0 and rows[3].n_bytes == 0
    assert inspect.exchange_count(out) == 0, inspect.formatted_plan(out)
    # deterministic across partitionings
    again = {
        r.doc_id: r.ratio
        for r in compression_profile(df.repartition(5)).collect()
    }
    assert again == {k: v.ratio for k, v in rows.items()}


def test_span_corruption_grid_semantics(spark):
    """25 tokens at block=20/span=3: block 0 masks one 3-run at an
    md5-determined offset, block 1 (5 tokens) masks one too; sentinel
    ids are block indices; inputs+targets reconstruct the original."""
    from egal_yet_another_earthquake_project_spark.llm.masking import span_corrupt

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in span_corrupt(df).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 25
    inp, tgt = r1.inputs.split(), r1.targets.split()
    assert inp.count("<extra_id_0>") == 1 and inp.count("<extra_id_1>") == 1
    assert tgt[0] == "<extra_id_0>" and tgt[-1] == "</s>"
    # reconstruct: splice each target span back over its sentinel
    spans = {}
    cur = None
    for t in tgt[:-1]:
        if t.startswith("<extra_id_"):
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    rebuilt = []
    for t in inp:
        rebuilt.extend(spans[t] if t in spans else [t])
    assert rebuilt == [f"t{i}" for i in range(25)]
    assert all(len(v) == 3 for v in spans.values())
    # too-short and empty docs pass through
    assert rows[2].inputs == "a b" and rows[2].targets == "</s>"
    assert rows[3].inputs == "" and rows[3].targets == "</s>"


def test_span_corruption_is_shuffle_free(spark):
    from egal_yet_another_earthquake_project_spark.llm.masking import span_corrupt
    from egal_yet_another_earthquake_project_spark.plans import inspect
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    df = span_corrupt(docs)
    assert inspect.exchange_count(df) == 0, inspect.formatted_plan(df)


def test_span_corruption_rejects_bad_grid(spark):
    from egal_yet_another_earthquake_project_spark.llm.masking import span_corrupt

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_corrupt(df, block=3, span_len=3)


def test_dedup_lines_keeps_first_occurrence_order(spark):
    from egal_yet_another_earthquake_project_spark.llm.text import dedup_lines
    from egal_yet_another_earthquake_project_spark.plans import inspect

    df = spark.createDataFrame(
        [
            (1, "buy now. great product. buy now. call us. great product. done"),
            (2, "no repeats here"),
        ],
        "doc_id long, text string",
    )
    out = dedup_lines(df)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].cleaned_text == "buy now. great product. call us. done"
    assert (rows[1].n_units, rows[1].n_kept) == (6, 4)
    assert rows[2].cleaned_text == "no repeats here"
    assert inspect.exchange_count(out) == 0


def test_bigram_nll_penalizes_scrambled_text(spark):
    """The bigram model's reason to exist: a doc of frequent tokens in a
    NEVER-SEEN order must score worse than the same tokens in the
    corpus-attested order; sub-2-token docs drop out."""
    from egal_yet_another_earthquake_project_spark.llm.lm import doc_bigram_nll

    fluent = "the quick brown fox jumps over the lazy dog"
    docs = _docs(
        spark,
        [
            (1, fluent),
            (2, fluent),
            (3, fluent),
            (4, "dog the over quick lazy jumps fox brown the"),  # scrambled
            (5, "solo"),
        ],
    )
    out = {r.doc_id: r for r in doc_bigram_nll(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].nll == out[2].nll == out[3].nll
    assert out[4].nll > out[1].nll
    assert out[1].n_bigrams == 8


def test_source_drift_nonnegative_and_flags_drifted_source(spark):
    """KL over the full source × top-K grid with the ACTUAL cut size as
    the smoothing constant: p and q each sum to exactly 1, so KL ≥ 0 by
    Gibbs' inequality for EVERY source, and a source missing the shared
    head vocabulary (template spam / parser break) must score strictly
    above sources that match the corpus. Before the grid fix, missing
    head tokens silently dropped their smoothing terms and deflated KL
    exactly for the drifted sources."""
    from egal_yet_another_earthquake_project_spark.workloads_corpus import (
        source_drift_kl,
    )

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common, f"src{i % 3}") for i in range(30)] + [
        (100 + i, "zzz yyy xxx www vvv uuu ttt sss", "drifted") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r.kl for r in source_drift_kl(docs, topk_n=10).collect()}
    assert set(out) == {"src0", "src1", "src2", "drifted"}
    assert all(v >= 0 for v in out.values()), out
    assert out["drifted"] > max(out["src0"], out["src1"], out["src2"]), out


def test_bpe_train_roundtrips_match_contract(spark, monkeypatch):
    """The batched-training scale contract, asserted: driver round trips
    (pair-count top-K collects) = ceil(num_merges / batch_merges) — at
    200 merges / batch 32 that is 7, the shape bench.py times as
    bpe_train_200 (a 30k-merge tokenizer at batch 64 is ~470, never
    30k). Counted by patching DataFrame.collect, so a regression that
    quietly de-batches the loop fails here, not in a wall-clock graph."""
    import math

    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # whose collect overrides the pyspark.sql.DataFrame base — patch the
    # concrete class or the counter never fires
    from pyspark.sql.classic.dataframe import DataFrame

    from egal_yet_another_earthquake_project_spark.llm import bpe as lbpe

    # deterministic 300-word / 10-char vocabulary — rich enough that no
    # round's candidate pool runs dry before the 7th round trip
    vocab = sorted(
        {
            "".join(chr(97 + (i * 7 + j * 13 + i * j) % 26) for j in range(10))
            for i in range(300)
        }
    )
    words = spark.createDataFrame(
        [(w, 10 + i) for i, w in enumerate(vocab)], "word string, cnt long"
    )

    calls = {"n": 0}
    orig = DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    num_merges, batch = 200, 32
    merges = lbpe.bpe_train(
        spark, words, num_merges=num_merges, batch_merges=batch
    )
    rounds = calls["n"]
    expected = math.ceil(num_merges / batch)
    # every round is exactly one bounded top-K collect; training may
    # stop early only if a round finds no pairs at all (not the case on
    # this vocabulary)
    assert rounds == expected, (rounds, expected)
    assert merges.count() > 0


# --------------------------------------------------------------------------
# Gopher rule filters (llm.text.gopher_flags)
# --------------------------------------------------------------------------


def test_gopher_flags_rule_edges(spark):
    """Each published rule trips on its own handcrafted violator and the
    clean doc passes all five."""
    good = " ".join(
        ["the quick brown fox jumps over lazy dogs that have fun with it"] * 5
    )  # 60 tokens, mwl in range, 'the'/'that'/'have'/'with'/'of'... >=2 stopwords
    short = "the cat sat with me"  # fails word count only
    symbols = " ".join(["woo ###"] * 30)  # '#' heavy -> fails sym (and stop)
    longwords = " ".join(["pneumonoultramicroscopic expialidocious"] * 30)
    numeric = " ".join(["12345 67890 11111 22222 33333"] * 12)  # fails alpha
    df = spark.createDataFrame(
        [
            (1, good, "s"),
            (2, short, "s"),
            (3, symbols, "s"),
            (4, longwords, "s"),
            (5, numeric, "s"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r.doc_id: r
        for r in ltx.gopher_flags(df).collect()
    }
    assert rows[1].passes
    assert not rows[2].ok_wc and rows[2].ok_mwl and rows[2].ok_sym
    assert not rows[3].ok_sym
    assert not rows[4].ok_mwl
    assert not rows[5].ok_alpha
    assert all(not rows[i].passes for i in (2, 3, 4, 5))


def test_gopher_flags_stopword_rule_needs_two_distinct(spark):
    one_stop = " ".join(["the"] + ["word"] * 60)  # only 'the' -> fail
    two_stop = " ".join(["the", "and"] + ["word"] * 60)
    df = spark.createDataFrame(
        [(1, one_stop), (2, two_stop)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ltx.gopher_flags(df).collect()}
    assert not rows[1].ok_stop
    assert rows[2].ok_stop


def test_gopher_flags_plan_is_map_only(spark):
    """The per-doc flag pass must fuse into the scan: no exchange, no
    Python eval in the plan."""
    df = spark.createDataFrame([(1, "the and word", "s")],
                               "doc_id long, text string, source string")
    plan = ltx.gopher_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# --------------------------------------------------------------------------
# Perplexity buckets (llm.lm.perplexity_buckets)
# --------------------------------------------------------------------------


def test_perplexity_buckets_partition_and_order(spark):
    from egal_yet_another_earthquake_project_spark.llm.lm import (
        perplexity_buckets,
        score_bigram_frozen,
        train_bigram_lm,
    )

    rows = [
        (i, "the cat sat on the mat and the dog ran to the cat", )
        for i in range(20)
    ] + [(100 + i, "zx qv jkl pqr zx qv stw uvx yz qqq", ) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bigram_lm(docs.filter("doc_id < 20"))
    scored = score_bigram_frozen(docs, model)
    out = perplexity_buckets(scored).collect()
    by = {r.bucket: r for r in out}
    # buckets partition the scored docs
    assert sum(r.n_docs for r in out) == scored.count()
    # bucket stats are internally ordered: head <= middle <= tail means
    assert list(sorted(by)) == sorted(b for b in ("head", "middle", "tail") if b in by)
    means = [by[b].mean_nll for b in ("head", "middle", "tail") if b in by]
    assert means == sorted(means)
    # the gibberish docs (unseen bigrams, smoothing floor) land in the tail
    assert by["tail"].min_nll > by["head"].max_nll


def test_perplexity_buckets_partition_invariant(spark):
    from egal_yet_another_earthquake_project_spark.llm.lm import (
        perplexity_buckets,
        score_bigram_frozen,
        train_bigram_lm,
    )

    rows = [(i, f"the cat {i % 7} sat on mat {i % 3} and dog") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bigram_lm(docs)
    a = perplexity_buckets(score_bigram_frozen(docs, model)).collect()
    b = perplexity_buckets(
        score_bigram_frozen(docs.repartition(7), model)
    ).collect()
    assert a == b


def test_token_entropy_known_values(spark):
    """Uniform token use scores ln(n_types); a single repeated token
    scores 0; mixed docs land in between."""
    import math

    from egal_yet_another_earthquake_project_spark.llm.text import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a b c d"),           # uniform over 4 types
            (2, "x x x x"),           # degenerate
            (3, "a a a b"),           # skewed
            (4, ""),                  # no tokens -> no row
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].entropy == round(math.log(4), 4) and got[1].n_types == 4
    assert got[2].entropy == 0.0 and got[2].n_types == 1
    want3 = round(math.log(4) - (3 * math.log(3)) / 4, 4)
    assert got[3].entropy == want3


def test_zipf_slope_recovers_planted_exponent(spark):
    """Tokens drawn with freq(rank) = C / rank (alpha = 1) must estimate
    alpha ~= 1; a flat distribution estimates alpha ~= 0."""
    from egal_yet_another_earthquake_project_spark.llm.text import zipf_slope

    zipf_text = " ".join(
        " ".join([f"tok{r}"] * max(1, int(600 / r))) for r in range(1, 51)
    )
    flat_text = " ".join(f"tok{r}" for r in range(1, 51)) * 5
    df = spark.createDataFrame(
        [("zipf", zipf_text), ("flat", flat_text)], "source string, text string"
    )
    got = {r.source: r for r in zipf_slope(df, top_k=50).collect()}
    assert abs(got["zipf"].alpha - 1.0) < 0.1
    assert abs(got["flat"].alpha) < 0.05
    assert got["zipf"].n_ranked == 50


def test_rrf_fuse_semantics(spark):
    """Reciprocal-rank fusion: an item BOTH rankers surface outranks an
    item only one side loved (at comparable ranks), missing-side ranks
    come through as NULL, the per-query cut holds, and the fused score
    is the textbook sum 1/(60+r_a) + 1/(60+r_b)."""
    from egal_yet_another_earthquake_project_spark.llm.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    rows = {r.doc_id: r for r in rrf_fuse(a, b, topk=3).collect()}
    # 11 is rank 2+1 (both sides) -> beats 10 (rank 1, one side only)
    assert rows[11].rank == 1 and rows[11].rank_a == 2 and rows[11].rank_b == 1
    assert rows[11].rrf_score == round(1 / 62 + 1 / 61, 6)
    # 12 in both (3+3) also beats single-sided 10 at rank 1
    assert rows[12].rank == 2
    assert rows[10].rank == 3 and rows[10].rank_b is None
    assert rows[10].rrf_score == round(1 / 61, 6)
    # topk=3 cut: doc 13 (single side, rank 2) is out
    assert 13 not in rows
