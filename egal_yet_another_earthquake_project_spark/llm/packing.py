"""Sequence packing: assign documents to fixed-size training contexts.

Training on short documents wastes context-window tokens unless documents
are packed: the T5/GPT-style recipe concatenates the (shuffled) token
stream and slices it into ``ctx``-sized windows. The distributed version
here reproduces that exactly without any sequential pass:

* documents get a deterministic stream order per pack group (md5 of the
  id — the "shuffle" every epoch pipeline does, but reproducible);
* a window cumsum assigns each document its token offset in the group's
  concatenated stream;
* ``pack_id = floor(start_offset / ctx)`` — the window a document's
  first token lands in.

Packing runs per ``group_col`` (e.g. source or language bucket), so the
window shuffle parallelizes across groups and no global single-partition
ordering exists. For a skew-free stream at any scale, pre-bucket the
group key (e.g. ``source‖hash(id)%B``) — the assignment stays
deterministic because the order key is still the document hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from egal_yet_another_earthquake_project_spark.llm import text as ltx


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str = "text",
    ctx: int = 256,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document a (start_tok, pack_id) in its group's
    concatenated token stream. Output: (id, group, n_tokens, start_tok,
    pack_id); deterministic under any partitioning.

    One shuffle (the per-group window); token counts ride the
    materialized-tokens projection, so the text is tokenized once.
    """
    toks = ltx.tokenized(df, text_col).select(
        F.col(id_col),
        F.col(group_col),
        F.size("_toks").alias("n_tokens"),
        F.md5(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ).alias("_ord"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        toks.withColumn(
            "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_tok") / F.lit(ctx)).cast("long")
        )
        .select(id_col, group_col, "n_tokens", "start_tok", "pack_id")
    )


def pack_texts(
    df: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str = "text",
    ctx: int = 256,
    salt: str = "pack",
) -> DataFrame:
    """Materialize each (group, pack) window as its concatenated member
    text — the shard payload a training loader reads. Members are joined
    in stream order (start_tok) with a single space, matching the
    token-stream concatenation the offsets were computed from.

    One extra aggregate over :func:`pack_sequences` output joined back to
    the text: ``collect_list`` of (start, text) structs, ``array_sort``
    (sorts on the leading struct field — the offset), then join. The
    per-pack payload is bounded by ctx plus one straddling document, so
    the collected list never exceeds a context window of text.
    """
    packed = pack_sequences(df, id_col, group_col, text_col, ctx, salt)
    joined = packed.join(df.select(id_col, text_col), id_col)
    return (
        joined.groupBy(group_col, "pack_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start_tok", text_col))
                    ),
                    lambda s: s[text_col],
                ),
                " ",
            ).alias("pack_text"),
            F.count("*").alias("n_docs"),
        )
    )


def pack_utilization(packed: DataFrame, group_col: str, ctx: int = 256) -> DataFrame:
    """Per-(group, pack) fill statistics from :func:`pack_sequences`
    output: how many docs start in each window and the token mass
    charged to it — the packing-efficiency audit a pipeline runs before
    committing a layout. Pure second aggregate over the small packed
    frame."""
    return (
        packed.groupBy(group_col, "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tok_mass"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("tok_mass") / F.lit(float(ctx)), 4),
        )
    )


def pack_tails(packed: DataFrame, group_col: str) -> DataFrame:
    """Per-group continuation state for incremental packing: the total
    token count already laid out. One row per group (bounded —
    group-key-scale); this is the only state an append needs."""
    return packed.groupBy(group_col).agg(
        (F.max(F.col("start_tok") + F.col("n_tokens"))).alias("tail_tok")
    )


def pack_sequences_append(
    new_docs: DataFrame,
    tails: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str = "text",
    ctx: int = 256,
    salt: str = "pack",
) -> DataFrame:
    """Pack an APPENDED batch continuing each group's existing stream.

    Daily shard production can't re-pack the whole corpus: the new
    batch gets its own deterministic hash-order cumsum, offset by the
    group's stored tail (:func:`pack_tails` — one tiny row per group,
    broadcast). Within-batch layout is identical to a fresh
    :func:`pack_sequences` of the batch; offsets continue seamlessly
    (the first appended doc starts exactly where the group's stream
    ended — asserted in tests). This is append-order packing: a full
    REBUILD would interleave old and new docs in global hash order and
    produce a different (equally valid) layout, which is the standard
    trade for O(batch) incremental work.

    Output matches ``pack_sequences``: (id, group, n_tokens, start_tok,
    pack_id).
    """
    base = pack_sequences(new_docs, id_col, group_col, text_col, ctx, salt)
    offset = tails.select(group_col, "tail_tok")
    return (
        base.join(F.broadcast(offset), group_col, "left")
        .withColumn(
            "start_tok",
            F.col("start_tok") + F.coalesce(F.col("tail_tok"), F.lit(0)),
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_tok") / F.lit(ctx)).cast("long")
        )
        .select(id_col, group_col, "n_tokens", "start_tok", "pack_id")
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    batch_size: int = 8,
    salt: str = "lenbatch",
) -> DataFrame:
    """Assign docs to fixed-size batches within log2 length buckets —
    the padding-waste reducer for non-packed (per-example) training:
    batching similar lengths together means each batch pads to a max
    close to its mean.

    bucket = ⌊log2(n_tokens + 1)⌋ (integer — engine-portable, no
    quantile estimation drift); within a bucket docs take an md5-rank
    order and chunk into ``batch_size`` groups. One shuffle (the bucket
    window). Output: (id, n_tokens, bucket, batch_id), deterministic
    under any partitioning.
    """
    toks = ltx.tokenized(df, text_col).select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias("_ord"),
    )
    bucket = F.length(
        F.conv((F.col("n_tokens") + 1).cast("string"), 10, 2)
    ) - F.lit(1)
    w = Window.partitionBy("bucket").orderBy(F.col("_ord").asc(), F.col(id_col).asc())
    return (
        toks.withColumn("bucket", bucket.cast("int"))
        .withColumn(
            "batch_id",
            ((F.row_number().over(w) - 1) / batch_size).cast("long"),
        )
        .select(id_col, "n_tokens", "bucket", "batch_id")
    )


def padding_audit(batches: DataFrame) -> DataFrame:
    """Per-bucket padding accounting over length-bucketed batches: each
    batch pads every member to the batch max, so waste = Σ(max·n − Σlen)
    — all integer until the final ratio. Output per bucket:
    (bucket, n_batches, pad_pct)."""
    per_batch = batches.groupBy("bucket", "batch_id").agg(
        F.max("n_tokens").alias("_mx"),
        F.sum("n_tokens").alias("_sum"),
        F.count("*").alias("_n"),
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.count("*").alias("n_batches"),
            F.round(
                F.lit(100.0)
                * (
                    F.sum(F.col("_mx") * F.col("_n")) - F.sum("_sum")
                ).cast("double")
                / F.sum(F.col("_mx") * F.col("_n")).cast("double"),
                4,
            ).alias("pad_pct"),
        )
        .orderBy("bucket")
    )
