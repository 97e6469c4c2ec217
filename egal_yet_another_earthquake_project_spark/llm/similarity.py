"""Similarity search over embedding columns (array<float>).

* :func:`cosine` — double-accumulated dot/norm via zip_with + aggregate:
  JVM-side, deterministic element order, no UDF.
* :func:`brute_force_topk` — exact top-k neighbors; the candidate join is
  a cross join, so this is the *baseline* (correctness reference and
  small-query-set path), not the scale path.
* :func:`ivf_topk` — IVF-style ANN: restrict the candidate join to the
  query's coarse cell (here the provided ``label`` plays the trained
  k-means cell id; production swaps in learned centroids). Candidate mass
  drops by the number of cells — that's the 100 TB path.
* :func:`sample_centroids` / :func:`assign_cells` /
  :func:`ivf_trained_topk` — the full IVF pipeline with a REAL coarse
  quantizer: deterministically sampled centroids (k-means|| init without
  the Lloyd iterations — still a valid quantizer, and engine-portable so
  the whole path stays oracle-checkable), argmax-cosine cell assignment,
  and multi-probe queries (``nprobe`` cells per query) to trade candidate
  mass for recall.
* :func:`neardup_pairs` — embedding near-duplicate pairs above a cosine
  threshold, IVF-bucketed to avoid all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _dots(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    c = F.col(a) if isinstance(a, str) else a
    return F.sqrt(_dots(c, c))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float vectors, double accumulation in
    element order (bit-reproducible on any partitioning)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _dots(ca, cb) / (norm(ca) * norm(cb))


def unit(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Attach the L2-normalized copy of ``vec_col`` as ``out_col``.

    Normalizing ONCE PER ROW turns every downstream cosine into a single
    dot product: a pairwise join otherwise pays three array passes per
    candidate (dot + both norms), and the norms are recomputed
    |candidates|/|rows| times each — at any real fan-out that triples the
    dominant kernel. The norm must be materialized in its own projection:
    a plain alias gets inlined back into the ``transform`` lambda by
    CollapseProject (single-reference aliases always collapse), which
    would re-run the O(dim) norm aggregate per ELEMENT — O(dim²)/row.
    The ``abs``-shaped guard below references the alias in both branches;
    the optimizer cannot prove them equal (a norm is already ≥ 0, so the
    value is unchanged), the alias becomes multi-referenced, and the
    projection survives — verified against the optimized plan in
    ``tests/test_plans.py::test_unit_norm_not_inlined``.
    """
    nm = norm(F.col(vec_col))
    guarded = F.when(F.col("_nm") >= 0, F.col("_nm")).otherwise(-F.col("_nm"))
    return (
        df.withColumn("_nm", nm)
        .withColumn(
            out_col,
            F.transform(vec_col, lambda x: x.cast("double") / guarded),
        )
        .drop("_nm")
    )


def _topk_from_candidates(cands: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors (self-match excluded).

    queries × corpus cross join — broadcast the query side; per-partition
    work is a tight codegen'd loop over corpus rows. Ranks are total-ordered
    (cos desc, neighbor asc) so results are unique and reproducible.
    """
    q = unit(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv", "uq",
    ).drop("qv")
    c = unit(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv", "uc",
    ).drop("cv")
    cands = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_dots(F.col("uq"), F.col("uc")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_candidates(cands, k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF ANN: candidates limited to the query's coarse cell (equi-join on
    the cell id instead of a cross join). With nprobe=1 semantics, recall
    depends on the quantizer; the candidate mass — and thus cost — drops by
    ~#cells. Swap ``cell_col`` for an assigned nearest-centroid column to
    use trained centroids."""
    q = unit(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col(cell_col).alias("cell"),
        ),
        "qv", "uq",
    ).drop("qv")
    c = unit(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            F.col(cell_col).alias("cell"),
        ),
        "cv", "uc",
    ).drop("cv")
    cands = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_dots(F.col("uq"), F.col("uc")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_candidates(cands, k)


def sample_centroids(
    corpus: DataFrame,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer "training": the ``num_cells`` corpus
    vectors with the smallest md5(id) — a uniform, engine-portable sample
    (k-means init; Lloyd refinement is an optional extra iteration, the
    sampled init is already a valid quantizer). Output: (cell, cv).

    ``orderBy().limit()`` plans TakeOrderedAndProject (per-partition
    heaps) — no global sort; the row_number window then runs over only
    ``num_cells`` rows. Sizing rule at scale: num_cells ≈ √n so both the
    assignment cross-product (n·√n) and the per-cell candidate mass
    (n/√n per probe) stay balanced.
    """
    cent = (
        corpus.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("cv"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "_cid")
        .limit(num_cells)
    )
    w = Window.orderBy("_h", "_cid")  # num_cells rows — single partition OK
    return cent.withColumn("cell", F.row_number().over(w)).select("cell", "cv")


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid cell assignment: score every row against the
    (broadcast, ≤num_cells-row) centroid table, keep the top-``nprobe``
    cells per row. Cosines are rounded to 4 before ranking with a cell-id
    tiebreak, so the argmax is stable across engines (oracle parity) and
    partitionings. Corpus rows use nprobe=1; query rows probe several
    cells to recover neighbors that fell just across a cell boundary."""
    ucent = unit(centroids, "cv", "ucv").drop("cv")
    scored = (
        unit(df, vec_col, "_uv")
        .crossJoin(F.broadcast(ucent))
        .withColumn("_acos", F.round(_dots(F.col("_uv"), F.col("ucv")), 4))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_acos").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= nprobe)
        .drop("ucv", "_uv", "_acos", "_rk")
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement over a centroid init: assign every corpus vector
    to its argmax-cosine cell, recompute each cell's element-wise mean —
    the standard distributed k-means step (posexplode → (cell, pos)
    average → re-assemble; two shuffles per iteration, all Catalyst).
    Cells that lose every member drop out, as in any k-means.

    The means use floating accumulation, so refined centroids are
    partition-order dependent in the last ulp — use them for recall
    (query-side), NOT inside oracle-hashed queries; the declared
    ``embedding_ivf_topk`` stays on the deterministic sampled init.
    """
    for _ in range(iters):
        assigned = assign_cells(corpus, centroids, 1, id_col, vec_col)
        exploded = assigned.select(
            "cell", F.posexplode(vec_col).alias("pos", "val")
        )
        means = exploded.groupBy("cell", "pos").agg(F.avg("val").alias("m"))
        centroids = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell", F.transform("pm", lambda s: s["m"]).alias("cv")
            )
        )
    return centroids


def ivf_trained_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """End-to-end IVF ANN: sampled centroids → corpus assigned to its
    argmax cell (one shuffle, reusable across query batches) → queries
    multi-probe their top-``nprobe`` cells → candidates from an equi-join
    on the cell id → exact cosine verify → top-k. Per (query, neighbor)
    at most one candidate row exists (a neighbor lives in exactly one
    cell), so no dedup is needed. Candidate mass ≈ nprobe/num_cells of
    the corpus per query — the knob that buys recall with bounded cost.
    ``refine_iters`` Lloyd steps sharpen the quantizer (see
    :func:`refine_centroids` for the determinism caveat)."""
    cent = sample_centroids(corpus, num_cells, id_col, vec_col)
    if refine_iters:
        cent = refine_centroids(corpus, cent, refine_iters, id_col, vec_col)
    c = unit(
        assign_cells(corpus, cent, 1, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv2"), "cell"
        ),
        "cv2", "uc",
    ).drop("cv2")
    q = unit(
        assign_cells(queries, cent, nprobe, id_col, vec_col).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell"
        ),
        "qv", "uq",
    ).drop("qv")
    cands = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_dots(F.col("uq"), F.col("uc")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_candidates(cands, k)


def _hyperplanes(dim: int, bits: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: components derived from md5
    digests of (seed, plane, chunk) — reproducible on any machine with no
    RNG state to ship."""
    import hashlib
    import struct as _struct

    planes: list[list[float]] = []
    for j in range(bits):
        weights: list[float] = []
        chunk = 0
        while len(weights) < dim:
            digest = hashlib.md5(f"{seed}|{j}|{chunk}".encode()).digest()
            for k in range(0, 16, 4):
                (u,) = _struct.unpack("<I", digest[k : k + 4])
                weights.append((u / 2**31) - 1.0)  # uniform [-1, 1)
            chunk += 1
        planes.append(weights[:dim])
    return planes


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach a random-hyperplane LSH bucket id: bit j = sign(v·w_j).

    Signatures are computed with a numpy matmul inside ``mapInPandas`` —
    one Arrow batch per partition, (batch × dim) @ (dim × bits) — which is
    the right shape for wide embeddings (a per-plane Catalyst expression
    tree re-walks the array per bit)."""
    import numpy as np
    import pandas as pd

    planes = np.array(_hyperplanes(dim, bits)).T  # dim × bits
    powers = 1 << np.arange(bits)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType(), False)]
    )

    def run(batches):
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())  # n × dim
            bucket = ((mat @ planes) >= 0) @ powers
            yield pd.DataFrame({**{c: pdf[c] for c in pdf.columns}, out_col: bucket.astype("int32")})

    return df.mapInPandas(run, out_schema)


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's bucket (equi-join on
    the signature), then exact cosine + top-k within candidates.

    Candidate mass drops ~2^bits; recall depends on neighbor closeness
    (near-duplicates share all bits with probability → 1). nprobe>1 /
    multi-probe extends this by also joining neighbor buckets."""
    qb = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        dim, bits, vec_col="qv",
    )
    cb = with_lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        dim, bits, vec_col="cv",
    )
    cands = (
        unit(cb, "cv", "uc")
        .join(F.broadcast(unit(qb, "qv", "uq")), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_dots(F.col("uq"), F.col("uc")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_candidates(cands, k)


def semantic_gate_inline(
    incoming: DataFrame,
    corpus: DataFrame,
    cos_threshold: float = 0.95,
    num_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ids of ``incoming`` vectors with a cosine ≥ ``cos_threshold``
    near-twin in ``corpus`` — the one-plan (oracle-checkable) twin of
    ``llm.ann_index.semantic_gate_hits``, which runs the same math
    against a PERSISTED cell-partitioned index (production amortizes
    the quantizer + corpus assignment; this form recomputes them so a
    single SQL statement can replay it).

    Shape: sampled quantizer → corpus argmax-cell assignment →
    top-``nprobe`` probe per incoming row → per-cell candidate
    equi-join → one dot per candidate → ANY-hit distinct. No ranking
    window on the candidate side (unlike top-k search) and self-id
    matches are excluded, so re-gating corpus members is a no-op.
    """
    if int(nprobe) < 1:
        raise ValueError("semantic_gate_inline: nprobe must be >= 1")
    cent = sample_centroids(corpus, num_cells, id_col, vec_col)
    corp = unit(
        assign_cells(corpus, cent, 1, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "cell"
        ),
        "_v",
        "uv",
    ).drop("_v")
    qa = unit(
        assign_cells(incoming, cent, nprobe, id_col, vec_col).select(
            F.col(id_col).alias("_gate_id"), F.col(vec_col).alias("_q"), "cell"
        ),
        "_q",
        "uq",
    ).drop("_q")
    return (
        corp.join(qa, on="cell")
        .filter(F.col("_gate_id") != F.col("neighbor_id"))
        .filter(
            F.round(_dots(F.col("uq"), F.col("uv")), 4)
            >= F.lit(float(cos_threshold))
        )
        .select(F.col("_gate_id").alias(id_col))
        .distinct()
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = "label",
    max_cell_size: int | None = 65536,
    hot_cell_anchors: int = 256,
) -> DataFrame:
    """Embedding near-duplicate pairs (cos ≥ threshold, id_a < id_b).

    With ``cell_col`` the pair join is per-cell (near-dups share a cell at
    any reasonable quantizer); ``None`` falls back to all-pairs — baseline
    only.

    Hot-cell skew guard (the ``max_doc_freq`` stop-shingle analog,
    VERDICT r8 #2): a degenerate cell — mass-duplicated boilerplate —
    makes the per-cell join quadratic in that one cell. Cells larger
    than ``max_cell_size`` contribute only their ``hot_cell_anchors``
    LOWEST-id members to the ``id_a`` (lower) side, so hot-cell pair
    mass is |c| × anchors. In the degenerate all-identical case the
    min-id anchor pairs with every member, so downstream keep-min dedup
    loses nothing; for a merely-large diverse cell the cap trades recall
    for boundedness (same documented trade as LSH's stop-shingle cap).
    Hot-cell detection is a broadcast anti/semi join against the ≤
    n/max_cell_size over-cap cells — no driver collect, no assumption on
    cell cardinality. ``max_cell_size=None`` disables the guard."""
    a = unit(
        df.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
            *( [F.col(cell_col).alias("cell")] if cell_col else [] ),
        ),
        "va", "ua",
    ).drop("va")
    b = unit(
        df.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
            *( [F.col(cell_col).alias("cell")] if cell_col else [] ),
        ),
        "vb", "ub",
    ).drop("vb")
    if cell_col and max_cell_size is not None:
        hot = (
            df.groupBy(F.col(cell_col).alias("cell"))
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > int(max_cell_size))
            .select("cell")
        )
        a_normal = a.join(F.broadcast(hot), "cell", "left_anti")
        rk = Window.partitionBy("cell").orderBy("id_a")
        a_hot = (
            a.join(F.broadcast(hot), "cell", "leftsemi")
            .withColumn("_rk", F.row_number().over(rk))
            .filter(F.col("_rk") <= F.lit(int(hot_cell_anchors)))
            .drop("_rk")
        )
        a = a_normal.unionByName(a_hot)
    joined = a.join(b, on="cell") if cell_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(_dots(F.col("ua"), F.col("ub")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_neardup_pairs(
    docs: DataFrame,
    embs: DataFrame,
    cos_threshold: float = 0.95,
    n: int = 3,
    doc_id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style two-stage near-dedup: embedding-cosine CANDIDATES,
    text-shingle-Jaccard VERIFY (Abbas et al. 2023's shape: the cheap
    dense signal proposes, the lexical signal confirms — catching both
    paraphrase-dups the text signal misses and false embedding neighbors).

    Scale contract:
    - candidates come from :func:`neardup_pairs` (per-cell equi-join,
      never all-pairs);
    - shingle sets are computed ONLY for documents that appear in a
      candidate pair (semi-join pruning), so the corpus never pays the
      shingle cost for non-candidates;
    - the verify is per-pair `array_intersect` arithmetic — no shingle
      explode, no second shuffle over the corpus.

    Output: (id_a, id_b, cos, jaccard), id_a < id_b.
    """
    from egal_yet_another_earthquake_project_spark.llm import text as ltx

    # The candidate frame feeds THREE consumers (the id union below reads
    # it twice, the final pair join once). Without pinning, each consumer
    # re-runs the per-cell pair join — measured 2× the whole query at
    # sf0.1. It is tiny by construction (that is the point of the
    # candidate stage), so localCheckpoint materializes it once and
    # truncates the lineage.
    cands = neardup_pairs(
        embs, threshold=cos_threshold, id_col=emb_id_col
    ).localCheckpoint()
    ids = (
        cands.select(F.col("id_a").alias("_vid"))
        .unionByName(cands.select(F.col("id_b").alias("_vid")))
        .distinct()
    )
    # Same rule for the candidate-doc shingle sets: consumed by both join
    # sides (a and b), and each evaluation re-tokenizes the pruned docs.
    sh = (
        ltx.tokenized(docs)
        .join(ids, F.col(doc_id_col) == F.col("_vid"), "leftsemi")
        .select(
            F.col(doc_id_col).alias("_doc"),
            F.array_distinct(
                ltx.shingles_of_tokens(F.col("_toks"), n)
            ).alias("_sh"),
        )
        .localCheckpoint()
    )
    a = sh.select(F.col("_doc").alias("id_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_doc").alias("id_b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size("_sha") + F.size("_shb") - inter
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.when(union == 0, F.lit(0.0)).otherwise(
                F.round(inter.cast("double") / union.cast("double"), 4)
            ),
        )
        .select("id_a", "id_b", "cos", "jaccard")
    )
