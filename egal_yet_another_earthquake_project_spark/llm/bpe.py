"""Distributed BPE merge training — the tokenizer-learning pass over a
corpus's word-frequency table.

Byte-pair encoding (Sennrich et al. 2016) learns a subword vocabulary by
repeatedly merging the most frequent adjacent symbol pair. The classic
formulation trains on the WORD-FREQUENCY table, not the raw corpus —
vocabulary-scale by Heaps' law, which is what makes each round cheap at
100 TB: one explode of per-word symbol pairs weighted by word count, one
partial-aggregated sum, one global top-1 (a driver scalar — bounded
state, like the k-means centroids), and one literal string replace to
apply the merge.

Determinism: ties on pair count break on the pair string ascending, and
the merge application is plain left-to-right non-overlapping literal
replacement (the BPE convention) — no regex, no float — so the learned
merges replay exactly in any SQL engine and the declared query
hash-verifies its unrolled-iteration oracle.

Symbol representation: a word's symbols are joined by TWO spaces with a
``$`` end-of-word marker (``low`` → ``l  o  w  $``). The double-space
separator is what makes literal replacement boundary-safe without
lookahead (which RE2-based engines lack): the pattern `` a  b `` claims
one space on each side, so it can never match inside a multi-character
symbol, and consecutive occurrences merge greedily left-to-right exactly
as BPE specifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: End-of-word marker symbol (never appears in the [a-z0-9] token
#: alphabet, so it cannot collide with a real character).
WORD_END = "$"


def word_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Attach the initial symbol string: characters double-space-joined
    with the end-of-word marker appended."""
    chars = F.split(F.col(word_col), "")
    sym = F.array_join(F.concat(chars, F.array(F.lit(WORD_END))), "  ")
    return words.withColumn("sym", sym)


def _pair_counts(w: DataFrame, cnt_col: str) -> DataFrame:
    ss = F.split("sym", "  ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(ss) - 2),
        lambda i: F.concat(
            F.element_at(ss, (i + 1).cast("int")),
            F.lit(" "),
            F.element_at(ss, (i + 2).cast("int")),
        ),
    )
    return (
        w.select(F.explode(pairs).alias("pair"), F.col(cnt_col).alias("_c"))
        .groupBy("pair")
        .agg(F.sum("_c").alias("cnt"))
    )


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    word_col: str = "word",
    cnt_col: str = "cnt",
    num_merges: int = 3,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a (word, count) table.

    Returns (step, pair, cnt): the merge learned at each round and the
    weighted occurrence count that won it. Each round: pair explode →
    partial-agg sum → deterministic top-1 to the driver → literal
    replace, with the vocabulary-scale word table localCheckpointed so
    the per-round lineage stays flat.
    """
    w = word_symbols(
        words.select(word_col, cnt_col), word_col
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, int]] = []
    for step in range(1, num_merges + 1):
        top = (
            _pair_counts(w, cnt_col)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0].pair, int(top[0].cnt)
        merges.append((step, pair, cnt))
        a, b = pair.split(" ")
        w = w.withColumn(
            "sym",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    F.lit(f" {a}  {b} "),
                    F.lit(f" {a}{b} "),
                )
            ),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, "step int, pair string, cnt long")


def bpe_apply(
    words: DataFrame, merges: list[str], word_col: str = "word"
) -> DataFrame:
    """Segment each word with an ordered merge list (the APPLY side of
    the tokenizer: train once, encode everywhere).

    Pure projection: the k ordered merges chain into k literal replaces
    over the symbol string — no shuffle, no per-merge action, composes
    with any scan. Output adds ``pieces`` (the word's subword sequence,
    single-space-joined) and ``n_pieces``.
    """
    out = word_symbols(words, word_col)
    sym = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
    for pair in merges:
        a, b = pair.split(" ")
        sym = F.replace(sym, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    pieces = F.array_join(F.split(F.trim(sym), "  "), " ")
    return (
        out.withColumn("pieces", pieces)
        .withColumn("n_pieces", F.size(F.split(F.col("pieces"), " ")))
        .drop("sym")
    )
