"""Bloom-filter probe pruning: drop non-matching probe rows BEFORE the
join shuffle.

The dominant cost of a selective big⋈small join at 100 TB is not the
join itself but shuffling probe rows that will never match. Spark's AQE
can inject a runtime bloom filter for this; this module is the explicit,
deterministic form of the same plan move — build a bit array from the
build side's keys, ship it to every probe task as a plan literal, and
filter map-side so the exchange only carries candidate rows. False
positives pass the filter but are removed by the exact join that
follows, so the result is bit-identical to the plain join (which is how
the declared query hash-verifies it against a plain-join oracle).

Scale shape:
* The build pass aggregates to DISTINCT BIT POSITIONS — at most
  ``num_bits`` rows cross the wire to the driver no matter how large the
  build side is (the same bounded-driver-state argument as the k-means
  centroid collect in ``llm/clustering.py``).
* The probe filter is pure JVM column math over a broadcast-literal
  ``array<long>`` of ``num_bits/64`` words (2^17 bits = 2 KiB of plan
  literal) — zero extra shuffle, runs inside whole-stage codegen,
  evaluated before the probe's Exchange.
* Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k; the default
  m = 2^17, k = 5 holds ~1% up to n ≈ 10k build keys. For a build side
  approaching m/10 keys, pass a larger ``num_bits`` (the literal grows
  linearly; 2^23 bits is still only 1 MiB of broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default filter geometry: 2^17 bits (2 KiB), 5 hash functions.
NUM_BITS = 1 << 17
NUM_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The key's bit positions under ``num_hashes`` seeded xxhash64
    draws — the same family both build and probe sides must use."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(num_bits))
        for j in range(num_hashes)
    ]


def bloom_words(
    build: DataFrame,
    key_col: str,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> list[int]:
    """Aggregate the build side into a bloom bit array (64-bit words).

    One pass: explode each key to its positions, distinct them (map-side
    partial), collect ≤ ``num_bits`` ints, fold into words driver-side.
    Returns signed longs ready for a Spark ``array<long>`` literal.
    """
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    pos = (
        build.select(
            F.explode(
                F.array(*_positions(F.col(key_col), num_bits, num_hashes))
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in pos:
        words[r.p // 64] |= 1 << (r.p % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def might_contain(
    key: Column,
    words: list[int] | Column,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> Column:
    """True iff every hash position of ``key`` is set — the probe-side
    filter expression. Pure codegen-able column math over the word
    array; no shuffle, no UDF. ``words`` may be a Python list (becomes
    a plan literal — fine for ad-hoc use) or a Column referencing a
    broadcast-joined array (see :func:`bloom_pruned_join` — the form
    that scales: the bit array rides as DATA, so a wide filter never
    bloats the plan, and at real num_bits a plan literal is impossible
    anyway)."""
    arr = F.lit(words) if isinstance(words, list) else words
    cond = F.lit(True)
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, (F.floor(p / 64) + 1).cast("int"))
        cond = cond & (F.bit_get(word, (p % 64).cast("int")) == 1)
    return cond


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Inner-join ``probe`` to ``build`` on ``key_col``, with the probe
    side bloom-pruned before its exchange. Bit-identical to the plain
    join — false positives die in the exact join.

    The bit array ships as a broadcast ONE-ROW frame, not a plan
    literal: a 2048-word literal renders ~tens of KB into every plan
    string (retained per execution by the status store — measured as
    session-wide driver-heap creep), and a production-sized filter
    (2^30 bits = 128 MiB) could never be an expression literal at all.
    """
    words = bloom_words(build, key_col, num_bits, num_hashes)
    spark = probe.sparkSession
    wdf = spark.createDataFrame([(words,)], "_bloom_words array<long>")
    pruned = (
        probe.join(F.broadcast(wdf))
        .filter(
            might_contain(
                F.col(key_col), F.col("_bloom_words"), num_bits, num_hashes
            )
        )
        .drop("_bloom_words")
    )
    return pruned.join(build, key_col)
