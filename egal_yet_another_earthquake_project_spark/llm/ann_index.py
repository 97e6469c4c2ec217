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

**On-disk layout is versioned** so maintenance can cut over atomically::

    {index_dir}/CURRENT          one line: "v=N"  (written last, via
                                 write-temp + os.replace — atomic on
                                 POSIX; on an object store this file is
                                 the manifest a catalog commit replaces)
    {index_dir}/v=N/centroids    (cell, cv)
    {index_dir}/v=N/cells        (neighbor_id, uv) partitioned by cell
    {index_dir}/v=N/_COMPLETE    staged-complete marker, written last —
                                 the CURRENT-less fallback only selects
                                 versions that carry it

A reader always resolves CURRENT first, so it sees one complete version
— never new centroids with old cells. Rebuilds stage the next version
in full before the single pointer flip; the predecessor version is kept
(deferred deletion) so an in-flight reader that resolved before the
flip finishes against intact data, and a crash mid-rebuild leaves
CURRENT — and therefore the live index — untouched. Appends assume a
single writer (they append into the live version's cell partitions);
concurrent writers need the catalog-commit layer this file's manifest
stands in for. Legacy flat layouts ({index_dir}/{centroids,cells} with
no CURRENT) are still readable; the first rebuild migrates them.

At 100 TB: the corpus-side work per search is nprobe/num_cells of one
corpus scan — and with min/max footer stats + the partition layout, the
bytes read shrink by the same factor. No shuffle touches the corpus at
search time; only the (small) query batch broadcasts.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark import fsutil
from egal_yet_another_earthquake_project_spark.sources.files import (
    read_parquet_memo as _pq,
)
from egal_yet_another_earthquake_project_spark.llm.similarity import (
    _dots,
    _topk_from_candidates,
    assign_cells,
    refine_centroids,
    sample_centroids,
    unit,
)


def _active_spark() -> SparkSession | None:
    return SparkSession.getActiveSession()


def _read_current(index_dir: str) -> int | None:
    """Version number in ``{index_dir}/CURRENT``, or None (legacy flat
    layout / index not built yet). Goes through the Hadoop FileSystem
    when a session is active so hdfs://s3a:// index dirs work; plain
    ``open`` only as the no-session local fallback."""
    spark = _active_spark()
    if spark is not None:
        text = fsutil.read_text(spark, f"{index_dir}/CURRENT")
    else:
        try:
            with open(f"{index_dir}/CURRENT", encoding="utf-8") as fh:
                text = fh.read()
        except (FileNotFoundError, NotADirectoryError):
            text = None
    if text is None:
        return None
    return int(text.strip().split("=", 1)[1])


def _list_versions(index_dir: str) -> list[int]:
    """Version numbers of every ``v=N`` child (complete or staged)."""
    spark = _active_spark()
    if spark is not None:
        names = fsutil.list_names(spark, index_dir)
    else:
        try:
            names = os.listdir(index_dir)
        except (FileNotFoundError, NotADirectoryError):
            names = []
    return sorted(
        int(n.split("=", 1)[1])
        for n in names
        if n.startswith("v=") and n.split("=", 1)[1].isdigit()
    )


def _version_complete(index_dir: str, version: int) -> bool:
    """True iff ``v=N`` carries the ``_COMPLETE`` marker that
    ``_write_version`` writes LAST — the per-version completeness signal
    that lets CURRENT-less fallback distinguish a fully staged version
    from a crash's partial one (on object stores / committer v2 a
    partial cells dir can read successfully, so directory existence is
    not enough)."""
    marker = f"{index_dir}/v={version}/_COMPLETE"
    spark = _active_spark()
    if spark is not None:
        return fsutil.exists(spark, marker)
    return os.path.exists(marker)


def _backfill_marker(index_dir: str, version: int) -> None:
    """Stamp ``_COMPLETE`` onto a version that CURRENT has successfully
    resolved but that predates the marker scheme (staged before round 9):
    CURRENT pointing at it IS the completeness proof — the pointer is
    written only after a full stage — so recording the marker now keeps
    the version eligible for the CURRENT-less fallback if the pointer is
    later lost. Best-effort: a read-only mount must not break search."""
    marker = f"{index_dir}/v={version}/_COMPLETE"
    spark = _active_spark()
    try:
        if spark is not None:
            if not fsutil.exists(spark, marker):
                fsutil.write_text_overwrite(spark, marker, "complete\n")
        elif not os.path.exists(marker):
            with open(marker, "w", encoding="utf-8") as fh:
                fh.write("complete\n")
    except Exception:
        pass


def resolve_index_dir(index_dir: str) -> str:
    """Root of the LIVE index version: ``{index_dir}/v=N`` per CURRENT.
    When CURRENT is absent, the newest version carrying a ``_COMPLETE``
    marker wins — that covers both a crash that lost the pointer and the
    momentary delete-then-rename window of a non-local pointer overwrite,
    while a first-build crash mid-stage (no CURRENT ever existed, no
    marker) falls through rather than silently serving a partial cells
    dir. A marker-less version that CURRENT resolves (staged before the
    marker scheme existed) gets the marker backfilled on resolve, so
    legacy indexes regain fallback coverage instead of falling through
    to the flat layout on pointer loss. Falls back to ``index_dir``
    itself for legacy flat layouts. One resolve pins a reader to one
    complete (centroids, cells) pair."""
    n = _read_current(index_dir)
    if n is not None:
        if not _version_complete(index_dir, n):
            _backfill_marker(index_dir, n)
    else:
        complete = [
            v for v in _list_versions(index_dir) if _version_complete(index_dir, v)
        ]
        n = complete[-1] if complete else None
    return index_dir if n is None else f"{index_dir}/v={n}"


def _set_current(index_dir: str, version: int) -> None:
    """Atomically point CURRENT at ``version`` (write-temp + rename —
    the one-file manifest a concurrent reader can never see half of on
    a local filesystem; on hdfs://s3a:// see fsutil.write_text_overwrite
    for the momentary-missing window resolve_index_dir tolerates)."""
    spark = _active_spark()
    if spark is not None:
        fsutil.write_text_overwrite(
            spark, f"{index_dir}/CURRENT", f"v={version}\n"
        )
        return
    tmp = f"{index_dir}/.CURRENT.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"v={version}\n")
    os.replace(tmp, f"{index_dir}/CURRENT")


def _write_version(
    corpus: DataFrame,
    root: str,
    num_cells: int,
    refine_iters: int,
    id_col: str,
    vec_col: str,
    pq_m: int | None = None,
    pq_k: int = 16,
) -> None:
    """Write one complete (centroids, cells) pair under ``root``, then
    the ``_COMPLETE`` marker LAST — the signal ``resolve_index_dir``'s
    CURRENT-less fallback requires, so a crash anywhere in here leaves a
    version no reader will ever select.

    With ``pq_m``, the version is an **IVF-PQ** index (Jégou 2011):
    per-subspace codebooks are trained on the UNIT vectors (cosine
    search ranks by unit-vector L2, which is monotone in cosine), the
    codes ride in the cell partitions next to ``uv``, and the books are
    persisted as JSON inside the version so a reader resolves ONE
    consistent (centroids, cells, books) triple."""
    import json as _json

    cent = sample_centroids(corpus, num_cells, id_col, vec_col)
    if refine_iters:
        cent = refine_centroids(corpus, cent, refine_iters, id_col, vec_col)
    cent.write.mode("overwrite").parquet(f"{root}/centroids")
    assigned = unit(
        assign_cells(corpus, cent, 1, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "cell"
        ),
        "_v",
        "uv",
    ).drop("_v")
    pinned = None
    if pq_m is not None:
        from egal_yet_another_earthquake_project_spark.llm import pq as lpq

        # THREE consumers of the assign+unit lineage (codebook training's
        # collect, the encode projection, the join's left side) — persist
        # so a build/rebuild pays the cell assignment once, per the
        # repo's multi-consumer caching rule (semdedup_prune's shape).
        pinned = assigned.persist()
        assigned = pinned
        books = lpq.train_pq_codebooks(
            assigned, m=pq_m, k=pq_k, id_col="neighbor_id", vec_col="uv"
        )
        codes = lpq.pq_encode(
            assigned, books, id_col="neighbor_id", vec_col="uv"
        )
        assigned = assigned.join(codes, "neighbor_id")
        fsutil.write_text_overwrite(
            corpus.sparkSession, f"{root}/pq_books.json", _json.dumps(books)
        )
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{root}/cells")
    )
    if pinned is not None:
        pinned.unpersist()
    fsutil.write_text_overwrite(
        corpus.sparkSession, f"{root}/_COMPLETE", "complete\n"
    )


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    num_cells: int = 16,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_m: int | None = None,
    pq_k: int = 16,
) -> None:
    """Train the quantizer and write the cell-partitioned index as
    version 1 (see the module docstring for the versioned layout), with
    unit vectors precomputed so search pays no normalization. ``pq_m``
    additionally trains per-subspace PQ codebooks and stores each
    vector's ``m`` code indices in the cells — the IVF-PQ compressed
    form ``search_ivf_index(method="adc")`` scans."""
    _write_version(
        corpus, f"{index_dir}/v=1", num_cells, refine_iters, id_col, vec_col,
        pq_m=pq_m, pq_k=pq_k,
    )
    _set_current(index_dir, 1)


def search_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
) -> DataFrame:
    """Top-``k`` neighbors for a query batch against a persisted index.

    Resolves CURRENT once, so centroids and cells come from the same
    version even if a rebuild cuts over mid-search. The probed-cell set
    (≤ num_cells values however large the batch is) becomes a STATIC
    partition filter, so the scan plans against only those directories;
    the query side broadcasts into the cell join.

    ``method="exact"`` ranks probed candidates by the true cosine
    (reads ``uv``) → ``(query_id, neighbor_id, cos, rank)``.
    ``method="adc"`` requires an index built with ``pq_m`` and ranks by
    the PQ asymmetric distance instead (reads ``codes`` — ``m`` ints per
    candidate instead of the full vector, so the probed partitions scan
    ~100× fewer value bytes; ranking is monotone in cosine up to
    quantization error because the codes encode UNIT vectors) →
    ``(query_id, neighbor_id, dist, rank)`` with the exact int64
    quantized distance."""
    import json as _json

    root = resolve_index_dir(index_dir)
    cent = _pq(spark, f"{root}/centroids")
    qa = unit(
        assign_cells(queries, cent, nprobe, id_col, vec_col).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"), "cell"
        ),
        "_q",
        "uq",
    ).drop("_q")
    probed = [r.cell for r in qa.select("cell").distinct().collect()]
    cells = _read_cells(spark, root).filter(F.col("cell").isin(probed))
    tombs = _tombstones(spark, root)
    if tombs is not None:
        cells = cells.join(tombs, "neighbor_id", "anti")
    if method == "adc":
        from pyspark.sql import Window

        from egal_yet_another_earthquake_project_spark.llm import pq as lpq
        from egal_yet_another_earthquake_project_spark.llm.clustering import (
            QUANT_SCALE,
        )

        text = fsutil.read_text(spark, f"{root}/pq_books.json")
        if text is None:
            raise ValueError(
                "search method 'adc' needs an index built with pq_m "
                f"(no pq_books.json under {root})"
            )
        books = _json.loads(text)
        m, dsub = len(books), len(books[0][0])
        qq = qa.select(
            "query_id",
            "cell",
            F.transform(
                "uq", lambda v: F.floor(v * QUANT_SCALE).cast("long")
            ).alias("qv"),
        )
        # One parsed expression per subspace LUT instead of m × k' ×
        # dsub F.lit py4j round trips (1024 here) — same Catalyst tree,
        # same exact int64 arithmetic (see pq._dists_expr).
        luts = [
            lpq._dists_expr("qv", s, dsub, books[s]).alias(f"_lut{s}")
            for s in range(m)
        ]
        qside = qq.select("query_id", "cell", *luts)
        dist = None
        for s in range(m):
            term = F.element_at(
                F.col(f"_lut{s}"), F.element_at(F.col("codes"), s + 1) + 1
            )
            dist = term if dist is None else dist + term
        cands = (
            cells.select("neighbor_id", "codes", "cell")
            .join(F.broadcast(qside), on="cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", dist.alias("dist"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col("neighbor_id").asc()
        )
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dist", "rank")
        )
    cands = (
        cells.join(F.broadcast(qa), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_dots(F.col("uq"), F.col("uv")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_candidates(cands, k)


def semantic_gate_hits(
    spark: SparkSession,
    index_dir: str,
    vectors: DataFrame,
    cos_threshold: float = 0.95,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ids of ``vectors`` that have a semantic near-twin (cosine ≥
    ``cos_threshold``) in the persisted index — the batch gate the
    composed curation pipelines anti-join (SemDeDup's point: embedding
    dups survive lexical dedup). The batch twin of
    ``streaming.ingest.stream_semantic_flags``.

    Same scale shape as :func:`search_ivf_index`: one CURRENT resolve,
    top-``nprobe`` cell assignment per row against the ≤ num_cells
    centroid literals, a static partition filter on the probed cells
    (≤ num_cells values regardless of batch size), one dot product per
    candidate — no ranking window (the gate needs ANY hit, not top-k),
    and the output is just the distinct hit ids. Unlike search (whose
    query batch is small by contract), the gated batch is a corpus
    FRACTION — so no broadcast hint on the cell join: AQE broadcasts a
    small drop, and a big one shuffle-joins on cell where per-cell pair
    mass |q_cell| × |c_cell| is the irreducible IVF candidate cost.
    Self-matches (identical id in index and batch) are excluded so
    re-gating already-indexed rows is a no-op."""
    if int(nprobe) < 1:
        raise ValueError("semantic_gate_hits: nprobe must be >= 1")
    root = resolve_index_dir(index_dir)
    cent = _pq(spark, f"{root}/centroids")
    qa = unit(
        assign_cells(vectors, cent, nprobe, id_col, vec_col).select(
            F.col(id_col).alias("_gate_id"), F.col(vec_col).alias("_q"), "cell"
        ),
        "_q",
        "uq",
    ).drop("_q")
    probed = [r.cell for r in qa.select("cell").distinct().collect()]
    cells = _read_cells(spark, root).filter(F.col("cell").isin(probed))
    tombs = _tombstones(spark, root)
    if tombs is not None:
        cells = cells.join(tombs, "neighbor_id", "anti")
    return (
        cells.join(qa, on="cell")
        .filter(F.col("_gate_id") != F.col("neighbor_id"))
        .filter(
            F.round(_dots(F.col("uq"), F.col("uv")), 4)
            >= F.lit(float(cos_threshold))
        )
        .select(F.col("_gate_id").alias(id_col))
        .distinct()
    )


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

    Single-writer assumption: the append targets the version that is
    CURRENT at call time. Run appends and rebuilds from one maintenance
    job (the CLI's ``index-append --rebuild-if-imbalance`` does both in
    sequence); concurrent writers would need a real catalog commit.

    The standard IVF maintenance trade: as the corpus drifts from the
    training sample, cell balance degrades — monitor with
    :func:`ivf_cell_stats` and trigger a rebuild (or a
    ``refine_centroids`` pass) when the imbalance ratio crosses the
    documented threshold, exactly like compaction for small files.
    Search needs no change: appended vectors live in the same partition
    layout, so probes see them immediately.
    """
    root = resolve_index_dir(index_dir)
    (
        _assign_for_append(spark, root, new_vectors, id_col, vec_col)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{root}/cells")
    )


def _assign_for_append(
    spark: SparkSession,
    root: str,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Frozen-quantizer cell assignment (+ PQ codes when the version
    carries codebooks) for an append batch — shared by the in-place
    batch append and the staged streaming append."""
    cent = _pq(spark, f"{root}/centroids")
    assigned = unit(
        assign_cells(new_vectors, cent, 1, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "cell"
        ),
        "_v",
        "uv",
    ).drop("_v")
    books_text = fsutil.read_text(spark, f"{root}/pq_books.json")
    if books_text is not None:
        # IVF-PQ index: appended vectors must carry codes too, or an ADC
        # scan would rank them by a null distance. Codebooks are frozen
        # with the coarse quantizer (the standard IVF-PQ append trade —
        # drift degrades code quality until the imbalance rebuild).
        import json as _json

        from egal_yet_another_earthquake_project_spark.llm import pq as lpq

        books = _json.loads(books_text)
        codes = lpq.pq_encode(
            assigned, books, id_col="neighbor_id", vec_col="uv"
        )
        assigned = assigned.join(codes, "neighbor_id")
    return assigned


def staged_append_ivf_index(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    batch_name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """EXACTLY-ONCE-in-effect append for streaming maintenance: the
    batch lands as its own staged sub-index
    ``{version}/appends/{batch_name}/cells`` and becomes visible only
    when its ``_COMPLETE`` marker is written LAST — so a crash mid-write
    leaves an invisible dir the replay simply overwrites, and a
    replayed batch whose commit already landed (marker present, or the
    name recorded in ``applied.json`` by a rebuild that folded it) is a
    no-op. Returns False for the no-op replay, True when the batch
    landed. The in-place :func:`append_ivf_index` stays the single-shot
    batch path; this is its ``foreachBatch``-safe twin
    (``streaming.scoring.ivf_update_sink``)."""
    import json as _json

    root = resolve_index_dir(index_dir)
    stage = f"{root}/appends/{batch_name}"
    marker = fsutil.read_text(spark, f"{stage}/_COMPLETE")
    if marker is not None:
        # replayed commit — but guard against a NAME COLLISION that is
        # not a replay (ADVICE r12: micro-batch ids restart at 0 for a
        # new query or a reset checkpoint, so a second stream pointed at
        # the same index would silently lose its early batches): the
        # marker records the applied batch's row count; a different
        # count means a different batch wearing the same name.
        try:
            recorded = _json.loads(marker).get("rows")
        except ValueError:  # legacy "complete" marker — no guard info
            recorded = None
        if recorded is not None and int(recorded) != new_vectors.count():
            raise ValueError(
                f"staged_append_ivf_index: batch {batch_name!r} already "
                f"applied with {recorded} rows but the incoming batch "
                "differs — two writers (or a reset checkpoint) are "
                "sharing batch names; pass a distinct app_id per "
                "streaming query (ivf_update_sink(app_id=...))"
            )
        # a crash BETWEEN the marker and the _SEQ bump leaves cached
        # listings unable to see this batch; the streaming contract
        # guarantees the uncommitted batch replays, so bump here
        prev_seq = fsutil.read_text(spark, f"{root}/appends/_SEQ")
        try:
            nxt = int(prev_seq) + 1 if prev_seq else 1
        except ValueError:
            nxt = 1
        fsutil.write_text_overwrite(
            spark, f"{root}/appends/_SEQ", f"{nxt}\n"
        )
        return False
    applied = _applied_appends(spark, root)
    if batch_name in applied:
        # folded by a rebuild — compare against the memo's recorded row
        # count when the pre-fold marker carried one (legacy memos map
        # to None: app_id namespacing is the defense there)
        recorded = applied[batch_name]
        if recorded is not None and int(recorded) != new_vectors.count():
            raise ValueError(
                f"staged_append_ivf_index: batch {batch_name!r} was "
                f"folded with {recorded} rows but the incoming batch "
                "differs — two writers (or a reset checkpoint) are "
                "sharing batch names; pass a distinct app_id per "
                "streaming query (ivf_update_sink(app_id=...))"
            )
        return False
    n_rows = new_vectors.count()
    (
        _assign_for_append(spark, root, new_vectors, id_col, vec_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{stage}/cells")
    )
    fsutil.write_text_overwrite(
        spark, f"{stage}/_COMPLETE", _json.dumps({"rows": n_rows}) + "\n"
    )
    # bump the listing-cache validator AFTER the marker: readers either
    # see the old seq (and re-list at worst one call late — the marker
    # is already visible to a direct listing) or the new seq and re-list
    prev_seq = fsutil.read_text(spark, f"{root}/appends/_SEQ")
    try:
        nxt = int(prev_seq) + 1 if prev_seq else 1
    except ValueError:
        nxt = 1
    fsutil.write_text_overwrite(spark, f"{root}/appends/_SEQ", f"{nxt}\n")
    return True


#: per-process cache of a version's complete-append listing keyed by
#: the version root; validated against the writer-bumped ``_SEQ`` file,
#: so one tiny read replaces O(n_appends) existence round trips per
#: search/gate/stats call (ADVICE r12 low — costly on object stores).
#: Maintenance is single-writer per index (documented contract), and a
#: rebuild cuts over to a NEW version root, so the key never aliases.
_APPEND_LISTING_CACHE: dict[str, tuple[str, list[str]]] = {}


def _complete_appends(spark: SparkSession, root: str) -> list[str]:
    """Names of the version's staged append batches whose ``_COMPLETE``
    marker exists — the visibility gate that makes streaming appends
    exactly-once-in-effect (a crash mid-write leaves a marker-less dir
    no reader ever selects; the replay overwrites it and marks).

    Cached per (root, ``appends/_SEQ``): the writer bumps ``_SEQ``
    after each marker, so a hit costs one small read. Legacy dirs
    without ``_SEQ`` (or pre-upgrade writers) fall back to the direct
    listing every call — never stale, just unamortized."""
    seq = fsutil.read_text(spark, f"{root}/appends/_SEQ")
    if seq is not None:
        cached = _APPEND_LISTING_CACHE.get(root)
        if cached is not None and cached[0] == seq:
            return list(cached[1])
    names = sorted(
        n
        for n in fsutil.list_names(spark, f"{root}/appends")
        if n != "_SEQ"
        and fsutil.exists(spark, f"{root}/appends/{n}/_COMPLETE")
    )
    if seq is not None:
        _APPEND_LISTING_CACHE[root] = (seq, names)
    return names


def _applied_appends(spark: SparkSession, root: str) -> dict[str, int | None]:
    """Append-batch names a rebuild already FOLDED into this version's
    cells (recorded at cutover), mapped to their recorded row counts —
    the replay memo that survives the fold, exactly like the BM25
    manifest's ``last_applied``(+rows). Legacy memos were a bare name
    list; those names map to None (no content guard available)."""
    import json as _json

    text = fsutil.read_text(spark, f"{root}/applied.json")
    if not text:
        return {}
    loaded = _json.loads(text)
    if isinstance(loaded, list):
        return {n: None for n in loaded}
    return {n: (None if v is None else int(v)) for n, v in loaded.items()}


def _read_cells(spark: SparkSession, root: str) -> DataFrame:
    """The version's full cell frame: the base ``cells`` plus every
    COMPLETE staged append. All read-side consumers (search, the
    semantic gate, cell stats, the rebuild's corpus) go through here so
    streaming appends become visible everywhere at once."""
    # NOTE (r14): a single multi-root scan over base + append cells was
    # tried and REJECTED — the roots sit at different depths (`cells` vs
    # `appends/<name>/cells`), which Spark's partition discovery rejects
    # with CONFLICTING_DIRECTORY_STRUCTURES (see search_bm25_index).
    cells = _pq(spark, f"{root}/cells")
    for name in _complete_appends(spark, root):
        cells = cells.unionByName(
            _pq(spark, f"{root}/appends/{name}/cells")
        )
    return cells


def _tombstones(spark: SparkSession, root: str) -> DataFrame | None:
    """The live version's tombstoned ``neighbor_id`` frame, or None when
    no delete has ever landed (the common case — absence costs one
    existence check, never a scan)."""
    if not fsutil.exists(spark, f"{root}/tombstones"):
        return None
    return _pq(spark, f"{root}/tombstones").select("neighbor_id")


def delete_from_ivf_index(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> None:
    """Remove vectors from the index WITHOUT a rebuild — the takedown
    path (GDPR erasure, dedup retro-purge) a production vector store
    needs as much as append. O(delta): the ids land in the live
    version's ``tombstones`` sidecar (dynamic append, the same
    single-writer contract as :func:`append_ivf_index`); search and the
    semantic gate anti-join them out of every probed cell, so deleted
    vectors stop being retrievable immediately. The physical rows stay
    in the cell partitions until the next rebuild
    (:func:`maybe_rebuild_ivf_index` re-trains on the LIVE rows only
    and writes tombstone-free cells) — the Lucene live-docs trade,
    which is exact here because IVF search has no corpus statistics to
    go stale (unlike BM25's df, which is why the BM25 delete carries
    negative sidecars). Deleting an id not in the index is a harmless
    no-op; re-adding a deleted id requires a rebuild first (tombstones
    apply to all cells, so the re-added row would be invisible)."""
    root = resolve_index_dir(index_dir)
    (
        ids.select(F.col(id_col).alias("neighbor_id"))
        .distinct()
        .write.mode("append")
        .parquet(f"{root}/tombstones")
    )


def maybe_rebuild_ivf_index(
    spark: SparkSession,
    index_dir: str,
    threshold: float,
    num_cells: int | None = None,
    refine_iters: int = 1,
    _before_cutover=None,
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
    tests/test_similarity.py::
    test_ivf_rebuild_fires_on_skewed_appends_and_preserves_recall),
    only the partitioning improves.

    Cutover is ONE atomic pointer flip: the next version ``v=N+1`` is
    staged in full (invisible — readers resolve CURRENT), then CURRENT
    is replaced via write-temp + ``os.replace``. A crash anywhere before
    the flip leaves the live index untouched (the orphaned stage dir is
    GC'd by the next successful rebuild); a reader mid-rebuild sees
    either the old version or the new one, never a mix. The predecessor
    version is kept (deferred deletion) so readers that resolved just
    before the flip finish cleanly; versions older than that are GC'd.

    ``_before_cutover`` is a test seam: called after the stage completes
    and before the pointer flip, where a concurrent reader or a crash
    would land.

    Returns ``{"imbalance": float | None, "rebuilt": bool}`` (+
    ``"version"`` when rebuilt); an empty/absent index is reported as
    ``{"imbalance": None, "rebuilt": False}`` rather than raising.
    """
    stats_row = ivf_cell_stats(spark, index_dir).select("imbalance").first()
    if stats_row is None or stats_row.imbalance is None:
        return {"imbalance": None, "rebuilt": False}
    imb = float(stats_row.imbalance)
    if imb <= threshold:
        return {"imbalance": imb, "rebuilt": False}

    root = resolve_index_dir(index_dir)
    cur = _read_current(index_dir)
    existing = _list_versions(index_dir)
    next_v = max(existing + ([cur] if cur else []), default=0) + 1

    cent = _pq(spark, f"{root}/centroids")
    k = num_cells or cent.count()
    # the rebuild folds EVERYTHING the readers see: base cells, staged
    # streaming appends, minus tombstones (the physical purge) — the new
    # version starts with clean cells, no appends, no tombstones
    import json as _mjson

    corpus = _read_cells(spark, root)
    folded_rows: dict[str, int | None] = dict(_applied_appends(spark, root))
    for _name in _complete_appends(spark, root):
        _marker = fsutil.read_text(spark, f"{root}/appends/{_name}/_COMPLETE")
        try:
            folded_rows[_name] = (
                _mjson.loads(_marker).get("rows") if _marker else None
            )
        except ValueError:
            folded_rows[_name] = None
    folded_appends = sorted(folded_rows)
    tombs = _tombstones(spark, root)
    if tombs is not None:
        corpus = corpus.join(tombs, "neighbor_id", "anti")
    corpus = corpus.select(
        F.col("neighbor_id").alias("vec_id"), F.col("uv").alias("embedding")
    )
    # an IVF-PQ index stays IVF-PQ across the cutover: re-train the
    # subspace codebooks (same m × k' shape) on the current unit vectors
    # alongside the refreshed coarse quantizer
    old_books_text = fsutil.read_text(spark, f"{root}/pq_books.json")
    pq_m = pq_k = None
    if old_books_text is not None:
        import json as _json

        old_books = _json.loads(old_books_text)
        pq_m, pq_k = len(old_books), len(old_books[0])
    _write_version(
        corpus, f"{index_dir}/v={next_v}", k, refine_iters, "vec_id", "embedding",
        pq_m=pq_m, pq_k=pq_k or 16,
    )
    if folded_appends:
        # the replay memo: a streaming append whose batch dir this
        # rebuild just folded into the new cells must stay a no-op if
        # its micro-batch replays after the cutover (the same
        # crash-after-fold window the BM25 manifest's last_applied
        # covers). Carried forward across rebuilds so the memo never
        # shrinks under a live checkpoint.
        import json as _json

        fsutil.write_text_overwrite(
            spark,
            f"{index_dir}/v={next_v}/applied.json",
            _json.dumps(folded_rows, sort_keys=True) + "\n",
        )
    if _before_cutover is not None:
        _before_cutover()
    _set_current(index_dir, next_v)

    # GC: keep the new version and its immediate predecessor (grace for
    # in-flight readers); drop older versions and any orphaned stages.
    keep = {next_v, cur} - {None}
    for v in existing:
        if v not in keep:
            fsutil.delete(spark, f"{index_dir}/v={v}")
    return {"imbalance": imb, "rebuilt": True, "version": next_v}


def ivf_cell_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-cell vector counts + the max/mean imbalance ratio — the
    rebuild trigger metric for :func:`append_ivf_index` (a cell at many
    times the mean probes slow and recalls poorly). Counts are PHYSICAL
    rows including tombstoned ones — deleted vectors still occupy probe
    bytes until the rebuild purges them, and probe cost is what this
    metric exists to bound. Empty on an empty or unbuilt index (callers
    must treat a missing first() as healthy)."""
    root = resolve_index_dir(index_dir)
    try:
        cells = _read_cells(spark, root)
    except Exception:
        return spark.createDataFrame(
            [], "cell int, n long, imbalance double"
        )
    per = cells.groupBy("cell").agg(F.count("*").alias("n"))
    stats = per.agg(
        F.max("n").alias("_mx"), F.avg("n").alias("_mean")
    ).select(F.round(F.col("_mx") / F.col("_mean"), 4).alias("imbalance"))
    return per.crossJoin(F.broadcast(stats)).orderBy("cell")
