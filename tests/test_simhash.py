"""SimHash64 near-dup signal and multimodal decode-stub contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import multimodal
from egal_yet_another_earthquake_project_spark.llm.text import hamming64, simhash64


def test_simhash_hamming_separates_near_from_far(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    near = base + " tonight"  # small tail edit
    far = (
        "completely unrelated text about distributed query engines and "
        "columnar storage formats with vectorized execution pipelines"
    )
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, text string"
    ).withColumn("sig", simhash64("text"))
    sigs = {r.id: r.sig for r in df.collect()}
    pairs = spark.createDataFrame(
        [(sigs[1], sigs[2]), (sigs[1], sigs[3])], "a long, b long"
    ).select(hamming64("a", "b").alias("d"))
    d_near, d_far = [r.d for r in pairs.collect()]
    assert d_near < d_far, (d_near, d_far)
    assert d_near <= 16  # near-dup: most bits agree
    assert d_far >= 16  # unrelated: ~32 expected


def test_simhash_deterministic(spark):
    df = spark.createDataFrame([("same text here",)], "text string")
    a = df.select(simhash64("text").alias("s")).collect()[0].s
    b = df.select(simhash64("text").alias("s")).collect()[0].s
    assert a == b


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_payload(b"\x89PNG...")


def test_multimodal_fake_features_deterministic(spark):
    f1 = multimodal.fake_features(b"hello world", dim=8)
    f2 = multimodal.fake_features(b"hello world", dim=8)
    assert f1 == f2
    assert abs(sum(f1) - 1.0) < 1e-9


def test_media_neardup_finds_planted_duplicate_payloads(spark):
    """Identical payloads MUST pair at hamming 0 (pigeonhole recall is
    exact at distance ≤ bands−1, trivially at 0); a payload with a
    wildly different byte-bigram profile must not pair with the text
    docs."""
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm

    base = "the quick brown fox jumps over the lazy dog " * 6
    other = "join scan filter hash table merge sort window batch " * 5
    weird = "!!!???###@@@$$$%%%^^^&&&***((()))" * 12
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other), (4, weird)],
        "doc_id long, text string",
    )
    corpus = lmm.attach_binary_payload(df)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in lmm.media_neardup_pairs(corpus).collect()
    }
    assert pairs.get((1, 2)) == 0, "identical payloads missed"
    assert not any(4 in p for p in pairs), f"weird payload paired: {pairs}"


def test_media_signature_deterministic_and_partition_invariant(spark):
    from egal_yet_another_earthquake_project_spark.llm import multimodal as lmm
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = lmm.attach_binary_payload(docs)
    a = sorted(map(tuple, lmm.payload_signatures(corpus).collect()))
    b = sorted(
        map(tuple, lmm.payload_signatures(corpus.repartition(9)).collect())
    )
    assert a == b
