"""Global row numbering without a global window.

`row_number() OVER (ORDER BY ...)` with no partition key funnels the
whole table through ONE task — the classic 100 TB cliff. But training
pipelines need global, contiguous, deterministic ids (shard indexes,
sample numbering, resumable cursors). Two-phase construction:

1. order key = (md5(salt‖id), id); bucket = the first ``bucket_hex``
   hex chars of the hash — a PREFIX of the order key, so bucket
   boundaries respect the global order by construction;
2. per-bucket `row_number` (parallel across 16^bucket_hex buckets);
3. bucket offsets = cumulative counts over the tiny (≤16^bucket_hex row)
   bucket-histogram frame, broadcast back; global id = offset + local
   rank.

The result is bit-identical to the single-window formulation (which is
what the DuckDB oracle runs) at any partition count — the md5 order key
is itself the shuffle key, uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_ordered_row_numbers(
    df: DataFrame,
    id_col: str,
    salt: str = "rowid",
    bucket_hex: int = 2,
    out_col: str = "rid",
) -> DataFrame:
    """Attach a deterministic global 1..n row number in md5(salt‖id)
    order. One shuffle on the (uniform) bucket key plus a broadcast of
    the bucket-offset table; no single-partition stage touches row-scale
    data."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    keyed = df.withColumn("_h", h).withColumn(
        "_b", F.conv(F.substring("_h", 1, bucket_hex), 16, 10).cast("int")
    )
    hist = keyed.groupBy("_b").agg(F.count("*").alias("_n"))
    # ≤ 16^bucket_hex rows: the running offset window is single-partition
    # over the HISTOGRAM, never over the data.
    off_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = hist.select(
        "_b", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    local_w = Window.partitionBy("_b").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        keyed.withColumn("_rn", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_h", "_b", "_rn", "_off")
    )


def bucketed_cumsum(
    df: DataFrame,
    val,
    buckets: list,
    order: list,
    out_col: str = "cum",
    hist_buckets: list | None = None,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Inclusive running sum of ``val`` over a GLOBAL order, without the
    single-partition window `sum() OVER (ORDER BY …)` plans — the
    generalization of :func:`hash_ordered_row_numbers` from row ids to
    arbitrary prefix sums (VERDICT r9 #5: every corpus-scale cumulative
    pass must be bucketed).

    ``buckets``: ``[(Column, ascending), …]`` — a coarse bucketing whose
    tuple is a PREFIX of the global order (every bucket is a contiguous
    range of it), e.g. ``(floor(value/w), True)`` for an ORDER BY value,
    or ``[(cnt, False), (substr(token,1,2), True)]`` for an ORDER BY
    cnt DESC, token ASC. ``order``: within-bucket tie-break Columns
    (directions included), completing the total order.

    Shape: one shuffle to the bucket histogram (Σ val per bucket), the
    exclusive-prefix offsets computed OVER THE HISTOGRAM (bucket-count
    rows, never data rows), one per-bucket window partitioned on the
    bucket key, one offsets join. ``hist_buckets`` makes the histogram's
    own prefix sum bucketed too (one recursion level — for bucket keys
    whose cardinality is itself data-dependent, e.g. distinct counts ×
    token prefixes at corpus scale); its expressions are evaluated
    against the HISTOGRAM frame, whose bucket columns are named
    ``_b0 … _bN`` in caller order. ``broadcast_offsets=False`` swaps
    the offsets broadcast for a shuffle join when the bucket cardinality
    outgrows a broadcast.

    The result is bit-identical to the single-window formulation at any
    partition count — offsets + per-bucket running sums telescope to the
    same integers (the DuckDB oracles run the single-window form)."""
    return _bucketed_cumsum(
        df, val, buckets, order, out_col, hist_buckets, broadcast_offsets, ""
    )


def _bucketed_cumsum(
    df, val, buckets, order, out_col, hist_buckets, broadcast_offsets, tag
):
    b_names = [f"_{tag}b{i}" for i in range(len(buckets))]
    vn, nn, offn = f"_{tag}v", f"_{tag}n", f"_{tag}off"
    keyed = df
    for name, (expr, _asc) in zip(b_names, buckets):
        keyed = keyed.withColumn(name, expr)
    keyed = keyed.withColumn(vn, val)
    hist = keyed.groupBy(*b_names).agg(F.sum(vn).alias(nn))
    hist_order = [
        F.col(n).asc() if asc else F.col(n).desc()
        for n, (_e, asc) in zip(b_names, buckets)
    ]
    if hist_buckets is None:
        # bucket-count rows only: the one place a global window is
        # acceptable — it never sees data-scale rows.
        off_w = Window.orderBy(*hist_order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = hist.select(
            *b_names, F.coalesce(F.sum(nn).over(off_w), F.lit(0)).alias(offn)
        )
    else:
        # one recursion level: the histogram's own prefix sum runs
        # bucketed too; recursion shifts temp names to _hb*/_hv/_hn,
        # so nothing collides with this level's columns.
        rec = _bucketed_cumsum(
            hist, F.col(nn), hist_buckets, hist_order,
            f"_{tag}cumh", None, True, tag + "h",
        )
        offsets = rec.select(
            *b_names, (F.col(f"_{tag}cumh") - F.col(nn)).alias(offn)
        )
    local_w = (
        Window.partitionBy(*b_names)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runn = f"_{tag}run"
    joined = keyed.withColumn(runn, F.sum(vn).over(local_w)).join(
        F.broadcast(offsets) if broadcast_offsets else offsets, b_names
    )
    return (
        joined.withColumn(out_col, F.col(offn) + F.col(runn))
        .drop(vn, runn, offn, *b_names)
    )


def ntile_exact(
    df: DataFrame,
    k: int,
    order: list,
    buckets: list,
    out_col: str = "band",
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY …)`` without the single-partition
    window. ntile is a pure function of (global row number, total row
    count): base = n div k rows per band, the first n mod k bands
    holding one extra — so a bucketed global row number
    (:func:`bucketed_cumsum` of 1s) plus one broadcast count reproduce
    it bit-identically (the SQL-standard formula the oracle's ntile
    evaluates). ``buckets``/``order`` as in :func:`bucketed_cumsum`."""
    rid = bucketed_cumsum(
        df, F.lit(1).cast("long"), buckets, order, out_col="_rid"
    )
    total = df.agg(F.count("*").alias("_nt"))
    return (
        rid.crossJoin(F.broadcast(total))
        .withColumn("_base", F.expr(f"_nt div {int(k)}"))
        .withColumn("_rem", F.expr(f"_nt % {int(k)}"))
        .withColumn(
            out_col,
            F.expr(
                "case when _rid <= _rem * (_base + 1) "
                "then (_rid - 1) div (_base + 1) + 1 "
                "else _rem + (_rid - 1 - _rem * (_base + 1)) "
                "div greatest(_base, 1) + 1 end"
            ).cast("int"),
        )
        .drop("_rid", "_nt", "_base", "_rem")
    )
