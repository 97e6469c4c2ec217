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
    # The symbol array is STAGED as its own projection column: a lambda
    # body re-evaluates every embedded non-lambda subexpression per
    # element (no subexpression elimination inside higher-order
    # functions), so the previous form — element_at(split(sym), i)
    # inside the transform — re-split the string twice per pair,
    # O(L²) character work per word. One split per row, then the
    # adjacent-pair list is a zip of the array with its own tail
    # (zip_with pads the shorter side with NULL, so the final
    # (last, NULL) element is sliced off; a 1-symbol word yields
    # slice(…, 1, 0) = [] with no special case — the old guard against
    # DESCENDING sequence(0, -1) is structurally unnecessary here).
    staged = w.select(
        F.split("sym", "  ").alias("_ss"), F.col(cnt_col).alias("_c")
    )
    pairs = F.slice(
        F.zip_with(
            F.col("_ss"),
            F.slice(F.col("_ss"), 2, F.greatest(F.size("_ss") - 1, F.lit(0))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
        F.lit(1),
        F.greatest(F.size("_ss") - 1, F.lit(0)),
    )
    return (
        staged.select(F.explode(pairs).alias("pair"), "_c")
        .groupBy("pair")
        .agg(F.sum("_c").alias("cnt"))
    )


#: How many ranked candidate pairs each round examines when selecting a
#: batch of independent merges: ``CANDIDATE_FACTOR * batch_merges``.
#: Part of the algorithm definition — the SQL oracle scans the same
#: bounded prefix of the ranking, so both engines pick identical batches.
CANDIDATE_FACTOR = 8


def _independent(p: str, q: str) -> bool:
    """True iff merges ``p`` and ``q`` (each ``"a b"``) commute: their
    member symbols are disjoint AND neither's merged product equals a
    member of the other. Under this condition each pair's match set in
    the pre-round table is untouched by applying the other, so a batch
    applies in any order with the same result as sequential."""
    pa, pb = p.split(" ")
    qa, qb = q.split(" ")
    if {pa, pb} & {qa, qb}:
        return False
    if pa + pb in (qa, qb) or qa + qb in (pa, pb):
        return False
    return True


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    word_col: str = "word",
    cnt_col: str = "cnt",
    num_merges: int = 3,
    batch_merges: int = 1,
) -> DataFrame:
    """Learn up to ``num_merges`` BPE merges from a (word, count) table.

    Returns (step, pair, cnt): the merges in learned order with the
    weighted occurrence count (from the round's pre-merge table) that
    won each. Each ROUND: pair explode → partial-agg sum → deterministic
    top-K to the driver (K = ``CANDIDATE_FACTOR * batch_merges`` rows,
    bounded) → greedy selection of up to ``batch_merges`` mutually
    INDEPENDENT pairs in rank order (``_independent``: disjoint symbols,
    no product/member collision — the condition under which the batch
    commutes) → the batch's literal replaces applied together, with the
    vocabulary-scale word table localCheckpointed so per-round lineage
    stays flat.

    Scale contract: driver round trips are ``ceil(num_merges /
    batch_merges)``, not ``num_merges`` — a 30k-merge tokenizer at
    ``batch_merges=64`` is ~470 Spark jobs, each moving ≤ K tiny rows to
    the driver. ``batch_merges=1`` is EXACTLY classic BPE (Sennrich et
    al. 2016). ``batch_merges>1`` is the standard batched approximation:
    picks 2..m of a round rank against the round's pre-merge counts
    rather than recounting after each pick, so the learned sequence can
    differ from classic BPE's (it equals classic whenever the round's
    top pairs are independent, the common case on natural text). Rounds
    whose candidate prefix yields fewer than ``batch_merges``
    independent pairs learn fewer merges (never more rounds), so the
    result can have < ``num_merges`` rows; the structure is static and
    replays identically in the unrolled SQL oracle.
    """
    if num_merges < 0 or batch_merges < 1:
        raise ValueError("num_merges must be >= 0 and batch_merges >= 1")
    w = word_symbols(
        words.select(word_col, cnt_col), word_col
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, int]] = []
    k = CANDIDATE_FACTOR * batch_merges
    n_rounds = (num_merges + batch_merges - 1) // batch_merges
    for r in range(n_rounds):
        cap = min(batch_merges, num_merges - r * batch_merges)
        topk = (
            _pair_counts(w, cnt_col)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(k)
            .collect()
        )
        if not topk:
            break
        picks: list[tuple[str, int]] = []
        for row in topk:
            if len(picks) == cap:
                break
            if all(_independent(row.pair, p) for p, _ in picks):
                picks.append((row.pair, int(row.cnt)))
        for pair, cnt in picks:
            merges.append((len(merges) + 1, pair, cnt))
        sym = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        for pair, _ in picks:
            a, b = pair.split(" ")
            sym = F.replace(sym, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        w = w.withColumn("sym", F.trim(sym)).localCheckpoint(eager=True)
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
    # Stage the piece ARRAY once: both outputs read it, and it is the
    # k-replace chain + a split — CollapseProject inlines a cheap alias
    # into every consumer, so the previous withColumn chain (n_pieces
    # re-splitting the pieces STRING) evaluated the whole replace chain
    # and a second split per row. A non-cheap alias referenced twice
    # stays staged; codegen still fuses the projections into one pass.
    keep = [c for c in out.columns if c != "sym"]
    staged = out.select(
        *keep, F.split(F.trim(sym), "  ").alias("_pieces_arr")
    )
    return staged.select(
        *keep,
        F.array_join("_pieces_arr", " ").alias("pieces"),
        F.size("_pieces_arr").alias("n_pieces"),
    )
