"""Product quantization (PQ) + asymmetric-distance (ADC) search —
compressed ANN scan for corpora whose raw vectors don't fit anywhere
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

Why this exists at 100 TB: a 64-D float64 embedding is 512 bytes; its
PQ code here is ``m`` small ints (m=4 ⇒ 4 bytes at k'=16) — a ~100×
smaller scan. Search never decodes: each query precomputes one
``m × k'`` lookup table (LUT) of exact subspace distances, and a
candidate's distance is ``Σ_s LUT[s][code_s]`` — ``m`` array lookups
per candidate, no vector math on the corpus side. Production composes
this with the IVF cell layout (``llm/ann_index.py``): cells prune the
candidate set, codes make scanning the survivors nearly free.

Spark shapes:

* **Codebooks are driver literals** — ``k'`` sampled vectors sliced
  into ``m`` subspaces (the same md5-min deterministic sample as
  ``sample_centroids``; bounded k'×dim ints, the same
  bounded-driver-state contract as ``llm/clustering.py``). They enter
  every plan as literal arrays, broadcast by construction.
* **Encoding is a pure projection**: per subspace an argmin over k'
  in-row integer distances — no join, no shuffle, one narrow pass.
* **ADC search joins the (tiny) query side into the code scan**: the
  query frame carries its LUT as an array column; the candidate
  distance is ``m`` ``element_at`` lookups — whole-stage-codegen
  arithmetic, never a per-row UDF.

Determinism (what makes a quantizer oracle-checkable): vectors are
floor-quantized to the 1e-6 integer grid up front (``llm/clustering.py``'s
grid), subspace distances are exact int64 sums of squares, and every
argmin/rank tie breaks on the lowest code / lowest id — so codes,
distances, and rankings are bit-identical on any engine, and the DuckDB
oracle replays the whole pipeline (sampling, slicing, encoding, ADC)
from the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.clustering import (
    QUANT_SCALE,
    _quantized,
)


def _subvec(col, s: int, dsub: int):
    """Slice subspace ``s`` (0-based) out of an int-grid vector column
    (F.slice is 1-based)."""
    return F.slice(col, s * dsub + 1, dsub)


def _l2(a, b) -> F.Column:
    """Exact int64 squared L2 between two equal-length int arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _dists_expr(qv_sql: str, s: int, dsub: int, codebook: list[list[int]]) -> F.Column:
    """The subspace-``s`` distance array against every literal code
    vector, as ONE parsed expression. The Column-builder form pays
    m × k' × dsub ``F.lit`` py4j round trips per plan (4×16×16 = 1024
    here — whole seconds of driver time, rebuilt on every run); the
    parsed string is one round trip and yields the identical Catalyst
    tree: bigint literals, the same zip_with/aggregate fold, the same
    exact int64 arithmetic."""
    sub = f"slice({qv_sql}, {s * dsub + 1}, {dsub})"
    per_code = [
        (
            f"aggregate(zip_with({sub}, array({', '.join(f'{int(x)}L' for x in cv)}), "
            f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, d) -> acc + d)"
        )
        for cv in codebook
    ]
    return F.expr("array(" + ", ".join(per_code) + ")")


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Deterministic PQ "training": the ``k`` corpus vectors with the
    smallest md5(id) (the ``sample_centroids`` sample), quantized to the
    integer grid and sliced into ``m`` subspaces. Returns
    ``codebooks[s][c] = the c-th code vector of subspace s`` — bounded
    driver state (k × dim ints), the literals every downstream plan
    embeds. A Lloyd refinement per subspace would sharpen the cells
    (same trade as ``refine_centroids``); the sampled form is already a
    valid quantizer and keeps the oracle replay to one CTE."""
    q = _quantized(corpus.select(id_col, vec_col), id_col, vec_col)
    seed = (
        q.withColumn("_h", F.md5(F.col("vid").cast("string")))
        .orderBy("_h", "vid")
        .limit(k)
        .collect()
    )
    if not seed:
        raise ValueError("train_pq_codebooks: corpus is empty")
    if len(seed) < k:
        # A silently smaller codebook changes code semantics (code c
        # means a DIFFERENT centroid than the caller's k declared) —
        # fail loudly instead; train on a bigger sample or lower k.
        raise ValueError(
            f"train_pq_codebooks: corpus has {len(seed)} rows, "
            f"fewer than k={k} codes per subspace"
        )
    dim = len(seed[0].qv)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    return [
        [list(r.qv[s * dsub : (s + 1) * dsub]) for r in seed]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to its ``m`` nearest-code indices (0-based):
    per subspace an argmin over k' literal code vectors — a pure
    projection, no shuffle. Output: ``(id, codes array<int>)``; ties
    break to the lowest code index (matching the SQL row_number
    replay)."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    q = _quantized(df.select(id_col, vec_col), id_col, vec_col)

    # Stage each subspace's distance array as its own column before the
    # argmin: `array_position(dists, array_min(dists))` over the raw
    # tree evaluates all k' L2 aggregates TWICE per row; aliasing the
    # array first makes the argmin read a per-row attribute instead
    # (CollapseProject keeps a non-cheap alias referenced twice staged).
    staged = q
    for s in range(m):
        staged = staged.withColumn(
            f"_d{s}", _dists_expr("qv", s, dsub, codebooks[s])
        )

    def code_of(s: int) -> F.Column:
        d = F.col(f"_d{s}")
        return (F.array_position(d, F.array_min(d)) - 1).cast("int")

    return staged.select(
        F.col("vid").alias(id_col),
        F.array(*[code_of(s) for s in range(m)]).alias("codes"),
    )


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: list[list[list[int]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-``k``: each query computes its
    ``m × k'`` LUT of exact subspace distances ONCE (array columns on
    the tiny query side), then the code scan pays ``m`` element_at
    lookups + an add per candidate. The query side broadcasts into the
    scan (the ``embedding_topk`` bounded-small-side shape); ranking is
    one window per query id with (distance, neighbor) tie-break.

    Output: ``(query_id, neighbor_id, dist, rank)``, rank ≤ k; ``dist``
    is the exact int64 quantized ADC distance (divide by
    ``QUANT_SCALE**2`` for the float value), self-matches excluded."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    q = _quantized(queries.select(id_col, vec_col), id_col, vec_col)
    luts = [
        _dists_expr("qv", s, dsub, codebooks[s]).alias(f"_lut{s}")
        for s in range(m)
    ]
    qside = q.select(F.col("vid").alias("query_id"), *luts)
    dist = None
    for s in range(m):
        term = F.element_at(
            F.col(f"_lut{s}"), F.element_at(F.col("codes"), s + 1) + 1
        )
        dist = term if dist is None else dist + term
    cands = (
        encoded.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(qside))
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
