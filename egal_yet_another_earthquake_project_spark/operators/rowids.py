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
