"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max-pruned scans.

A 100 TB table is pruned, not scanned: Parquet row-group and file-level
min/max statistics skip data only when the layout clusters the filter
columns. A plain sort clusters ONE column; interleaving the bits of two
columns (the Morton / Z-order curve) gives both columns locality, so
range predicates on either hit a small fraction of files. This is the
layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built from pure
Catalyst bit arithmetic — no UDF.

Write path, all scale-safe:

1. per-dimension quantile boundaries via ``approxQuantile`` — a
   distributed Greenwald-Khanna sketch (ONE extra pass, both columns
   together, driver receives 2×255 doubles). Quantile buckets, not raw
   values, keep the curve robust to skew and outliers (equal-population
   cells). NOT ntile/percent_rank: a global-order window would funnel the
   whole table through one partition.
2. bucket assignment = count of boundaries ≤ value — a 255-element array
   ``filter`` inside whole-stage codegen, no join, no shuffle.
3. bits interleave into one long ``_zkey``; ``repartitionByRange`` on it
   (range partitioner ⇒ files own disjoint key ranges ⇒ file-level
   min/max pruning works on BOTH dimensions), sort within partitions
   (row-group pruning inside each file), drop the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims × 8 bits → 256×256 curve cells, interleaved
#: into a 16-bit key. Plenty of granularity for file/row-group pruning —
#: the key only needs more distinct values than output files.
DIM_BITS = 8


def _spread_bits(col: Column) -> Column:
    """Interleave zeros between the low 16 bits of ``col`` (Morton spread:
    bit i moves to bit 2i) via the classic shift-or-mask ladder — four
    fixed bitwise ops, fully codegen'd."""
    x = col.cast("long")
    for shift, mask in (
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ):
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(cols: list[Column | str]) -> Column:
    """Morton key from exactly two integer-bucket columns (each already in
    [0, 2^16))."""
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 dimensions")
    a = F.col(cols[0]) if isinstance(cols[0], str) else cols[0]
    b = F.col(cols[1]) if isinstance(cols[1], str) else cols[1]
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def with_rank_buckets(
    df: DataFrame,
    cols: list[str],
    bits: int = DIM_BITS,
    relative_error: float = 0.01,
) -> DataFrame:
    """Attach ``_rb_<col>`` quantile-bucket columns in [0, 2^bits) for each
    numeric dimension. One approxQuantile sketch pass covers all columns;
    assignment is `count(boundaries <= value)` over a literal array —
    codegen, no shuffle."""
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    all_bounds = df.approxQuantile(cols, qs, relative_error)
    out = df
    for c, bounds in zip(cols, all_bounds):
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        out = out.withColumn(
            f"_rb_{c}",
            F.size(F.filter(arr, lambda bd: bd <= F.col(c).cast("double"))),
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = DIM_BITS,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` Z-ordered on two columns: bucket → interleave →
    range-partition on the key → sort within files → drop the key.

    The bucket assignment (a 2^bits-element boundary scan per row per
    dimension) is the rewrite's compute; it must not inherit the
    source's file parallelism (a table read from few large files would
    evaluate it on few tasks — measured 4.3 s → 1.3 s at sf0.1 from
    exactly that). The pre-shuffle spreads rows across the cluster
    FIRST, so the scan runs map-side at full width before the range
    exchange."""
    spread = df.repartition(max(4 * num_files, 32))
    keyed = with_rank_buckets(spread, cols, bits).withColumn(
        "_zkey", zorder_key([f"_rb_{c}" for c in cols])
    )
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_rb_{c}" for c in cols])
        .write.mode(mode)
        .parquet(path)
    )
