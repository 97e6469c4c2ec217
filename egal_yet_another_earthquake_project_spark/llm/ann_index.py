"""Persisted IVF ANN index: build once, search many — the product form
of ``llm.similarity.ivf_trained_topk``.

The declared ANN queries train + assign + search in one plan because the
oracle needs one self-contained statement. A production vector store
amortizes the expensive parts instead:

* **build** (once per corpus version): train the coarse quantizer,
  assign every corpus vector to its cell, precompute unit vectors, and
  write the index PARTITIONED BY cell. The layout IS the index — each
  cell is a directory.
* **search** (per query batch): assign queries to their top-``nprobe``
  cells, then scan ONLY those cells' partitions. The probed-cell set is
  ≤ num_cells (≈ √n by the sizing rule) regardless of batch size, so
  collecting it to the driver for a static partition filter is bounded —
  and static pruning means the scan never touches the other cells'
  files (plan-asserted: the FileSourceScan's PartitionFilters carries
  the cell predicate).

At 100 TB: the corpus-side work per search is nprobe/num_cells of one
corpus scan — and with min/max footer stats + the partition layout, the
bytes read shrink by the same factor. No shuffle touches the corpus at
search time; only the (small) query batch broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.similarity import (
    _dots,
    _topk_from_candidates,
    assign_cells,
    refine_centroids,
    sample_centroids,
    unit,
)


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    num_cells: int = 16,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train the quantizer and write the cell-partitioned index.

    Layout: ``{index_dir}/centroids`` (cell, cv) and
    ``{index_dir}/cells`` (neighbor_id, uv) partitioned by ``cell``,
    with unit vectors precomputed so search pays no normalization."""
    cent = sample_centroids(corpus, num_cells, id_col, vec_col)
    if refine_iters:
        cent = refine_centroids(corpus, cent, refine_iters, id_col, vec_col)
    cent.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    assigned = unit(
        assign_cells(corpus, cent, 1, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "cell"
        ),
        "_v",
        "uv",
    ).drop("_v")
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{index_dir}/cells")
    )


def search_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` neighbors for a query batch against a persisted index.

    The probed-cell set (≤ num_cells values however large the batch is)
    becomes a STATIC partition filter, so the scan plans against only
    those directories; the query side broadcasts into the cell join."""
    cent = spark.read.parquet(f"{index_dir}/centroids")
    qa = unit(
        assign_cells(queries, cent, nprobe, id_col, vec_col).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"), "cell"
        ),
        "_q",
        "uq",
    ).drop("_q")
    probed = [r.cell for r in qa.select("cell").distinct().collect()]
    cells = spark.read.parquet(f"{index_dir}/cells").filter(
        F.col("cell").isin(probed)
    )
    cands = (
        cells.join(F.broadcast(qa), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_dots(F.col("uq"), F.col("uv")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_candidates(cands, k)


def append_ivf_index(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add a batch of vectors to an existing index WITHOUT a rebuild.

    The coarse quantizer is frozen: new vectors are assigned to the
    already-trained centroids and appended into their cells' partitions
    (dynamic partition append — only the touched cell directories gain
    files). Per-batch work is O(batch × num_cells) assignment math plus
    one write; the corpus is never rescanned, which is what makes daily
    ingest into a 10^10-vector index affordable.

    The standard IVF maintenance trade: as the corpus drifts from the
    training sample, cell balance degrades — monitor with
    :func:`ivf_cell_stats` and trigger a rebuild (or a
    ``refine_centroids`` pass) when the imbalance ratio crosses the
    documented threshold, exactly like compaction for small files.
    Search needs no change: appended vectors live in the same partition
    layout, so probes see them immediately.
    """
    cent = spark.read.parquet(f"{index_dir}/centroids")
    assigned = unit(
        assign_cells(new_vectors, cent, 1, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "cell"
        ),
        "_v",
        "uv",
    ).drop("_v")
    (
        assigned.write.mode("append")
        .partitionBy("cell")
        .parquet(f"{index_dir}/cells")
    )


def maybe_rebuild_ivf_index(
    spark: SparkSession,
    index_dir: str,
    threshold: float,
    num_cells: int | None = None,
    refine_iters: int = 1,
) -> dict:
    """Act on the imbalance metric: rebuild the index iff the max/mean
    cell-occupancy ratio exceeds ``threshold`` (append_ivf_index's
    documented maintenance trigger, now automated — the CLI exposes it
    as ``index-append --rebuild-if-imbalance N``).

    The rebuild re-trains ON THE INDEX'S OWN unit vectors (one index
    scan; the original corpus is never re-read — at 10^10 vectors the
    index IS the only copy you want to touch), with a Lloyd refinement
    pass so the new centroids actually track the drifted distribution
    rather than re-sampling it. Unit vectors are the right training
    input for a cosine quantizer: assignment is argmax cosine, which is
    norm-invariant, and re-unit-ing a unit vector is the identity, so
    the rebuilt cells hold byte-identical ``uv`` rows — search results
    are unchanged by construction (recall re-asserted in
    tests/test_ann_index.py), only the partitioning improves.

    Staged write + atomic rename keeps a concurrent reader safe: the
    new cells+centroids land in a temp dir and replace the live index
    in two directory renames (the same lost-race-is-benign pattern as
    the z-order layout cache, workloads_ext.py:1259).

    Returns ``{"imbalance": float, "rebuilt": bool}``.
    """
    import os
    import shutil
    import uuid

    imb = float(
        ivf_cell_stats(spark, index_dir).select("imbalance").first().imbalance
    )
    if imb <= threshold:
        return {"imbalance": imb, "rebuilt": False}

    cent = spark.read.parquet(f"{index_dir}/centroids")
    k = num_cells or cent.count()
    corpus = spark.read.parquet(f"{index_dir}/cells").select(
        F.col("neighbor_id").alias("vec_id"), F.col("uv").alias("embedding")
    )
    stage = f"{index_dir}/.rebuild-{uuid.uuid4().hex[:8]}"
    build_ivf_index(corpus, stage, num_cells=k, refine_iters=refine_iters)
    for part in ("centroids", "cells"):
        old = f"{index_dir}/.old-{part}-{uuid.uuid4().hex[:8]}"
        os.rename(f"{index_dir}/{part}", old)
        os.rename(f"{stage}/{part}", f"{index_dir}/{part}")
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    return {"imbalance": imb, "rebuilt": True}


def ivf_cell_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-cell vector counts + the max/mean imbalance ratio — the
    rebuild trigger metric for :func:`append_ivf_index` (a cell at many
    times the mean probes slow and recalls poorly)."""
    cells = spark.read.parquet(f"{index_dir}/cells")
    per = cells.groupBy("cell").agg(F.count("*").alias("n"))
    stats = per.agg(
        F.max("n").alias("_mx"), F.avg("n").alias("_mean")
    ).select(F.round(F.col("_mx") / F.col("_mean"), 4).alias("imbalance"))
    return per.crossJoin(F.broadcast(stats)).orderBy("cell")
