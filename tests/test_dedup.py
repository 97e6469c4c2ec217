"""Dedup-operator tests: LSH banding sizing (s-curve math) and the
stop-shingle ``max_doc_freq`` cap on the inverted-index joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import dedup as ldd


# --------------------------------------------------------------------------
# plan_banding — pure s-curve math, no Spark
# --------------------------------------------------------------------------


def _recall(b: int, r: int, s: float) -> float:
    return 1.0 - (1.0 - s**r) ** b


def test_plan_banding_picks_steepest_banding_meeting_recall():
    assert ldd.plan_banding(120, 0.7) == (20, 6)
    assert ldd.plan_banding(120, 0.8) == (15, 8)
    # every returned banding actually meets the recall floor…
    for k, t in ((120, 0.7), (120, 0.8), (64, 0.7), (128, 0.8)):
        b, r = ldd.plan_banding(k, t)
        assert b * r == k
        assert _recall(b, r, t) >= 0.9
        # …and the next-steeper divisor banding would miss it.
        steeper = [rr for rr in range(r + 1, k + 1) if k % rr == 0]
        if steeper:
            rr = steeper[0]
            assert _recall(k // rr, rr, t) < 0.9


def test_plan_banding_rejects_impossible_targets():
    with pytest.raises(ValueError):
        ldd.plan_banding(2, 0.01, min_recall=0.999999)


def test_default_banding_consistent():
    assert ldd.DEFAULT_BANDS * ldd.DEFAULT_ROWS_PER_BAND == ldd.DEFAULT_NUM_HASHES
    # the defaults are sized for the declared queries' 0.7 verify threshold
    assert _recall(ldd.DEFAULT_BANDS, ldd.DEFAULT_ROWS_PER_BAND, 0.7) >= 0.9
    # …while staying selective: a jaccard-0.4 pair rarely becomes a candidate
    assert _recall(ldd.DEFAULT_BANDS, ldd.DEFAULT_ROWS_PER_BAND, 0.4) < 0.15


# --------------------------------------------------------------------------
# max_doc_freq — stop-shingle cap
# --------------------------------------------------------------------------


def _boilerplate_corpus(spark):
    """10 docs that are ~all shared boilerplate plus a tiny unique tail:
    pairwise jaccard ≈ 0.9, but ALL of the overlap rides on shingles with
    document frequency 10 — the hot-key shape the cap exists for."""
    boiler = " ".join(f"common boilerplate token{i} legal header" for i in range(6))
    rows = [(i, f"{boiler} unique tail {i} ending{i}") for i in range(10)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_jaccard_cap_noop_when_no_hot_shingles(spark):
    """On a corpus whose max shingle df is below the cap the output is
    IDENTICAL — the cap only ever removes ubiquitous shingles."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(
        map(tuple, ldd.jaccard_pairs(docs, "doc_id", threshold=0.5).collect())
    )
    max_df = (
        ldd.doc_shingle_sets(docs, "doc_id", "text")
        .groupBy("sh")
        .count()
        .agg({"count": "max"})
        .collect()[0][0]
    )
    capped = sorted(
        map(
            tuple,
            ldd.jaccard_pairs(
                docs, "doc_id", threshold=0.5, max_doc_freq=max_df
            ).collect(),
        )
    )
    assert capped == base


def test_jaccard_cap_prunes_hot_shingle_pairs(spark):
    corpus = _boilerplate_corpus(spark)
    uncapped = ldd.jaccard_pairs(corpus, "doc_id", threshold=0.5).collect()
    assert len(uncapped) == 45  # all 10·9/2 pairs — boilerplate dominates
    capped = ldd.jaccard_pairs(
        corpus, "doc_id", threshold=0.5, max_doc_freq=5
    ).collect()
    assert capped == []  # overlap was pure df-10 boilerplate


def test_hot_shingle_pairs_two_step_generation(spark):
    """The UNCAPPED declared pair path (max_doc_freq=None) must survive a
    hot shingle: pair generation explodes the anchor doc first and then
    only its a<b tail slice, so no single materialized value exceeds
    O(d) — the one-shot flatten(transform(...)) form built the whole
    O(d²) pair array of a boilerplate shingle inside one task. Checks
    (a) exact output on a 40-doc hot-shingle corpus against hand-derived
    jaccard/containment, (b) the plan stays self-join-free and carries
    no flattened pair transform."""
    rows = [
        (i, f"alpha beta gamma delta unique{i} tail{i} x{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # 7 tokens -> 5 trigram shingles; any two docs share exactly the 2
    # boilerplate shingles: jaccard = 2/(5+5-2) = 0.25, containment
    # = 2/5 = 0.4 in both directions.
    jac = ldd.jaccard_pairs(docs, "doc_id", threshold=0.2)
    got = jac.collect()
    assert len(got) == 40 * 39 // 2
    assert all(abs(r.jaccard - 0.25) < 1e-9 and r.doc_a < r.doc_b for r in got)
    cont = ldd.containment_pairs(docs, "doc_id", threshold=0.3)
    got_c = cont.collect()
    assert len(got_c) == 40 * 39  # both directions
    assert all(abs(r.containment - 0.4) < 1e-9 for r in got_c)
    for frame in (jac, cont):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        assert "flatten(transform" not in plan
        assert "Join" not in plan  # pair generation stays join-free


def test_minhash_cap_prunes_verify_stage(spark):
    corpus = _boilerplate_corpus(spark)
    uncapped = ldd.minhash_lsh_dedup_pairs(
        corpus, "doc_id", verify_threshold=0.5
    ).collect()
    assert len(uncapped) == 45
    capped = ldd.minhash_lsh_dedup_pairs(
        corpus, "doc_id", verify_threshold=0.5, max_doc_freq=5
    ).collect()
    assert capped == []


def test_minhash_engines_identical(spark):
    """The pandas (Arrow/numpy) and catalyst signature engines are two
    implementations of the same integer arithmetic — values must be
    bit-identical."""
    docs = _boilerplate_corpus(spark)
    a = sorted(map(tuple, ldd.minhash_signatures(docs, "doc_id", engine="catalyst").collect()))
    b = sorted(map(tuple, ldd.minhash_signatures(docs, "doc_id", engine="pandas").collect()))
    assert a == b


def test_minhash_engines_agree_on_null_text(spark):
    """Null-text docs are dropped by BOTH engines (previously: catalyst
    null-filled their signatures while the pandas worker crashed on
    len(None) — a divergence exactly where it's least visible)."""
    docs = _boilerplate_corpus(spark).unionByName(
        spark.createDataFrame([(9901, None), (9902, None)], "doc_id long, text string")
    )
    a = sorted(map(tuple, ldd.minhash_signatures(docs, "doc_id", engine="catalyst").collect()))
    b = sorted(map(tuple, ldd.minhash_signatures(docs, "doc_id", engine="pandas").collect()))
    assert a == b
    assert not any(row[0] in (9901, 9902) for row in a)


def test_substring_dup_pairs_caps_boilerplate(spark):
    """A template substring present in MANY docs must produce no pairs
    (its fingerprints exceed the df-cap: ubiquity is not duplication),
    while genuinely shared rare substrings still pair up."""
    boiler = "all rights reserved contact the publisher for permissions "
    rare = "the quick brown fox jumps over the lazy dog in zanzibar "
    rows = []
    for i in range(30):  # 30 docs share only the boilerplate
        rows.append((i, boiler + f"unique filler number {i} " * 3))
    rows.append((100, rare * 2 + "alpha tail"))
    rows.append((101, rare * 2 + "beta tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = ldd.substring_dup_pairs(docs, "doc_id", max_doc_freq=10).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), f"boilerplate-only pairs leaked: {pairs}"
    # uncapped, the boilerplate floods: every one of the 30×29/2 pairs
    uncapped = ldd.substring_dup_pairs(docs, "doc_id", max_doc_freq=None).count()
    assert uncapped > 400


def test_incremental_new_docs_gate(spark):
    """The ingestion gate: drops incoming docs already in the corpus
    (by normalized fingerprint), collapses within-batch duplicates to
    the min id, passes genuinely new docs through."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "Alpha  beta GAMMA"),   # dup of corpus doc 1 (normalized)
            (11, "zeta eta theta"),      # new
            (12, "zeta eta theta"),      # within-batch dup of 11
            (13, "iota kappa"),          # new
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r.doc_id
        for r in ldd.incremental_new_docs(incoming, corpus, "doc_id").collect()
    )
    assert got == [11, 13]


def test_incremental_gate_idempotent(spark):
    """Admitting the gate's output into the corpus then re-gating the
    same batch admits nothing — the invariant that makes the gate safe
    under replayed/re-scraped batches."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(10, "delta epsilon"), (11, "delta epsilon"), (12, "zeta eta")],
        "doc_id long, text string",
    )
    admitted = ldd.incremental_new_docs(incoming, corpus, "doc_id")
    grown = corpus.unionByName(admitted)
    again = ldd.incremental_new_docs(incoming, grown, "doc_id")
    assert again.count() == 0


def test_fingerprint_index_gate_zero_shuffle_on_index_side(spark):
    """With the seen-set persisted as a bucketed-by-fp table, the gate's
    anti-join must shuffle ONLY the incoming batch (one exchange,
    hashpartitioned on fp to match the buckets): the index side reads
    bucket-aligned with no exchange, and the within-batch window reuses
    the join's fp partitioning. This is the shape that keeps a 100 TB
    index from ever moving."""
    from egal_yet_another_earthquake_project_spark.plans import inspect

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        corpus = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"),
        )
        ldd.write_fingerprint_index(corpus, "fp_index_test", num_buckets=8)
        incoming = spark.range(450, 600).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"),
        )
        gated = ldd.gate_against_fps(
            incoming, spark.table("fp_index_test"), "doc_id"
        )
        assert gated.count() == 100  # 500..599 are new
        plan = inspect.formatted_plan(gated)
        assert "Bucketed: true" in plan, plan
        assert inspect.exchange_count(gated) == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS fp_index_test")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_band_index_gate_zero_shuffle_on_index_side(spark):
    """With the corpus's LSH band keys persisted bucketed by (band, sig),
    the incremental near-dedup candidate join must shuffle ONLY the
    incoming batch: signatures (1), the band join (1), the pair distinct
    (1) — the index side reads bucket-aligned with no exchange. The
    shape that keeps the 100 TB corpus's signatures from ever moving."""
    from egal_yet_another_earthquake_project_spark.plans import inspect

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        corpus = spark.range(200).select(
            F.col("id").alias("doc_id"),
            # every token id-derived: no shingle (hence no band) is shared
            # between two different corpus docs
            F.concat(
                F.lit("w"), F.col("id"),
                F.lit(" x"), F.col("id") * 7,
                F.lit(" y"), F.col("id") * 13,
                F.lit(" z"), F.col("id") * 29,
                F.lit(" q"), F.col("id") * 31,
            ).alias("text"),
        )
        ldd.write_band_index(corpus, "band_index_test", "doc_id", num_buckets=8)
        incoming = corpus.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
        cands = ldd.incremental_neardup_pairs(
            incoming,
            corpus,
            "doc_id",
            verify_threshold=None,
            existing_bands=spark.table("band_index_test"),
        )
        assert cands.count() == 50  # each shifted doc matches its original
        plan = inspect.formatted_plan(cands)
        assert "Bucketed: true" in plan, plan
        assert inspect.exchange_count(cands) == 3, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS band_index_test")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_band_index_overwrite_heals_orphaned_location(spark):
    """A killed run leaves the managed table's warehouse directory on
    disk while the fresh in-memory metastore has never heard of the
    name — DROP TABLE IF EXISTS is a no-op and (before the fix)
    saveAsTable failed LOCATION_ALREADY_EXISTS forever, poisoning every
    later full-suite run (VERDICT r9 #2). Overwrite mode must clear the
    orphan and succeed; append must still fail loudly (it has no
    license to discard unknown data)."""
    import uuid

    from egal_yet_another_earthquake_project_spark import fsutil

    table = f"band_orphan_{uuid.uuid4().hex[:8]}"
    corpus = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("orphan doc "), F.col("id")).alias("text"),
    )
    # Plant the orphan: the table's default location exists on disk,
    # the catalog does not know it.
    jvm = spark._jvm
    ident = jvm.org.apache.spark.sql.catalyst.TableIdentifier.apply(table)
    location = str(
        spark._jsparkSession.sessionState()
        .catalog()
        .defaultTablePath(ident)
        .toString()
    )
    try:
        fsutil.mkdirs(spark, location + "/part-orphan")
        assert not spark.catalog.tableExists(table)
        ldd.write_band_index(corpus, table, "doc_id", num_buckets=4)
        assert spark.table(table).count() > 0
        # Append onto an orphaned location (drop from catalog, leave
        # the dir) must NOT silently clear it.
        spark.sql(f"DROP TABLE {table}")
        fsutil.mkdirs(spark, location + "/part-orphan")
        with pytest.raises(Exception):
            ldd.write_band_index(
                corpus, table, "doc_id", num_buckets=4, mode="append"
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        fsutil.delete(spark, location)


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc quoted whole inside a much larger one: containment
    small→big ≈ 1.0 while Jaccard stays far below any dedup threshold —
    the wrapper/boilerplate case the directional metric exists for."""
    small = "the quick brown fox jumps over the lazy dog near the river bank"
    filler = " ".join(f"filler{i} token{i} word{i}" for i in range(120))
    big = filler + " " + small + " " + filler
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in ldd.containment_pairs(df, "doc_id", threshold=0.7).collect()
    }
    assert cont.get((1, 2), 0.0) >= 0.9, "small-in-big inclusion missed"
    assert (2, 1) not in cont, "big is not contained in small"
    jac = ldd.jaccard_pairs(df, "doc_id", threshold=0.3).collect()
    assert not jac, "jaccard should NOT flag the inclusion pair"


def test_contamination_fraction_semantics_and_plan(spark):
    """Exact benchmark copy → fraction 1.0 dirty; partial phrase reuse
    below threshold → clean; disjoint → 0.0 clean; every corpus doc
    gets a row (unlike the any-hit contaminated_docs). The eval shingle
    set must broadcast."""
    from egal_yet_another_earthquake_project_spark.llm.dedup import (
        contamination_fraction,
    )
    from egal_yet_another_earthquake_project_spark.plans import inspect

    eval_docs = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # exact copy
            (2, "alpha beta gamma north south east west"), # one shared 3-gram
            (3, "red green blue yellow purple orange"),    # disjoint
        ],
        "doc_id long, text string",
    )
    out = contamination_fraction(corpus, eval_docs, "doc_id", dirty_threshold=0.5)
    rows = {r.doc: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].contamination == 1.0 and rows[1].dirty
    assert 0.0 < rows[2].contamination < 0.5 and not rows[2].dirty
    assert rows[3].contamination == 0.0 and not rows[3].dirty
    assert rows[1].n_shingles == 4 and rows[1].n_hits == 4
    assert inspect.uses_broadcast_join(out)


def test_shingle_novelty_bounds_and_duplicates(spark):
    """An exact duplicate pair shares every shingle → novelty 0.0 for
    both; a doc sharing nothing with anyone → 1.0; every doc gets a
    row and n_unique ≤ n_shingles."""
    from egal_yet_another_earthquake_project_spark.llm.dedup import (
        shingle_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),   # exact dup of 1
            (3, "red green blue yellow purple"),      # fully unique
            (4, "alpha beta gamma north south"),      # partial overlap w/ 1,2
        ],
        "doc_id long, text string",
    )
    rows = {r.doc: r for r in shingle_novelty(docs, "doc_id").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].novelty == 0.0 and rows[2].novelty == 0.0
    assert rows[3].novelty == 1.0
    assert 0.0 < rows[4].novelty < 1.0
    assert all(r.n_unique <= r.n_shingles for r in rows.values())
