"""Span-corruption masking — the T5/UL2 denoising-objective data pass
(Raffel et al. 2020 §3.1.4): replace token spans with sentinel tokens and
emit (inputs, targets) pairs a seq2seq trainer consumes.

The textbook sampler draws span starts/lengths from an RNG, which can
never be replayed by an independent engine. Here the spans are placed on
a deterministic BLOCK GRID instead: token positions are partitioned into
fixed-size blocks of ``block``; each block long enough to hold a span
masks exactly one ``span_len`` run whose offset within the block is
md5(doc_id, block_index) — uniform, non-overlapping by construction, and
mask rate = span_len/block ≈ the T5 15% at the defaults (3/20). Every
step is hash/array arithmetic that exists verbatim in any SQL engine, so
the corrupted (inputs, targets) themselves hash-verify against the
DuckDB oracle — the same determinism discipline as the sketches.

Scale: pure per-row projection over the materialized token array — no
shuffle, no UDF, composes with any scan; the whole pass runs at scan
speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.text import tokenized

#: grid defaults: one 3-token span per 20-token block = 15% corruption.
BLOCK = 20
SPAN_LEN = 3


def _span_start(doc_id: Column, b: Column, room: Column) -> Column:
    """Deterministic 0-based span offset within a block: first 8 md5 hex
    digits of ``doc_id|block`` mod the number of legal offsets."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(doc_id.cast("string"), F.lit("|"), b.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h % room


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = BLOCK,
    span_len: int = SPAN_LEN,
) -> DataFrame:
    """Attach ``inputs``/``targets`` denoising pair per document.

    For block ``b`` covering token positions ``[b·block, …)``: if the
    block holds at least ``span_len + 1`` tokens it masks the run of
    ``span_len`` tokens starting at ``_span_start % (len − span_len)``
    (so at least one token per block survives in the inputs); shorter
    tail blocks pass through unmasked. Sentinel ``<extra_id_b>`` takes
    the span's place in ``inputs`` and prefixes the span in
    ``targets``; targets end with ``</s>``. Documents with no maskable
    block (fewer than ``span_len + 1`` tokens) emit the original text
    and an empty-target ``</s>``.

    Output: ``id_col, n_tokens, inputs, targets`` (both single-space
    strings).
    """
    if span_len < 1 or block <= span_len:
        raise ValueError("need block > span_len >= 1")
    toks = F.col("_toks")
    n = F.size(toks)
    nblocks = F.ceil(n / F.lit(block)).cast("int")
    doc_id = F.col(id_col)

    def block_cols(b: Column) -> tuple[Column, Column, Column, Column]:
        start = b * block  # 0-based block start
        blen = F.least(F.lit(block), n - start)
        maskable = blen >= span_len + 1
        s = _span_start(doc_id, b, blen - span_len)  # 0-based in block
        return start, blen, maskable, s

    def input_tokens(b: Column) -> Column:
        start, blen, maskable, s = block_cols(b)
        sentinel = F.concat(F.lit("<extra_id_"), b.cast("string"), F.lit(">"))
        whole = F.slice(toks, start + 1, blen)
        masked = F.concat(
            F.slice(toks, start + 1, s),
            F.array(sentinel),
            F.slice(toks, start + s + span_len + 1, blen - s - span_len),
        )
        return F.when(maskable, masked).otherwise(whole)

    def target_tokens(b: Column) -> Column:
        start, blen, maskable, s = block_cols(b)
        sentinel = F.concat(F.lit("<extra_id_"), b.cast("string"), F.lit(">"))
        span = F.concat(
            F.array(sentinel), F.slice(toks, start + s + 1, F.lit(span_len))
        )
        return F.when(maskable, span).otherwise(F.array().cast("array<string>"))

    blocks = F.sequence(F.lit(0), nblocks - 1)
    inputs = F.array_join(F.flatten(F.transform(blocks, input_tokens)), " ")
    targets = F.array_join(
        F.concat(
            F.flatten(F.transform(blocks, target_tokens)),
            F.array(F.lit("</s>")),
        ),
        " ",
    )
    return (
        tokenized(df, text_col)
        .withColumn("n_tokens", n)
        .select(
            id_col,
            "n_tokens",
            F.when(n > 0, inputs).otherwise(F.lit("")).alias("inputs"),
            F.when(n > 0, targets).otherwise(F.lit("</s>")).alias("targets"),
        )
    )
