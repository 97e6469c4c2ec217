"""Embedding quantization: per-vector symmetric int8, engine-portable.

Embedding tables dominate storage in a vector-heavy corpus (a 1024-dim
float32 vector is 4 KiB/row); absmax int8 quantization (the inference-
side recipe popularized by LLM.int8, Dettmers et al. 2022) cuts that 4×
with near-lossless cosine ranking, which is why ANN indexes store
quantized vectors and re-rank the shortlist in full precision.

All arithmetic is element-wise Catalyst (`transform`/`zip_with`) over
double-cast values, and the row-rounding uses ``floor(x + 0.5)`` rather
than an engine ``round`` — half-up rounding spelled the same way in any
SQL engine, so quantized codes, reconstruction error, and fidelity
cosine are all hash-verifiable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dbl(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector absmax int8 codes + fidelity metrics.

    scale = absmax/127; code_i = floor(x_i/scale + 0.5) (clamped by
    construction since |x_i| ≤ absmax); dequant_i = code_i·scale.
    Zero vectors quantize to all-zero codes with scale 0 and perfect
    fidelity by convention. Output: (id, qscale, max_abs_err, cos_dq)
    — rounded 6/6/4. Shuffle-free: one projection per row, so it
    composes with any scan at any scale.
    """
    raw = quantize_int8_raw(df, id_col, vec_col)
    return raw.select(
        F.col(id_col),
        F.round(F.col("_qscale_raw"), 6).alias("qscale"),
        F.round(F.col("_err_raw"), 6).alias("max_abs_err"),
        F.round(F.col("_cos_raw"), 4).alias("cos_dq"),
    )


def quantize_int8_raw(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`quantize_int8` before the rounding — (id, _qscale_raw,
    _err_raw, _cos_raw). Split out so the parity rounding-margin audit
    can measure each raw metric's distance to its rounding boundary.

    Staged projections, not one expression tree: embedding the ``scale``
    Column inside the per-element lambdas re-evaluates the whole
    ``array_max(transform(...))`` subtree for EVERY array element —
    O(d²) work per row (measured 18× slower at d=64). Aliasing each
    non-cheap intermediate in its own ``select`` makes the downstream
    lambdas reference a per-row attribute instead; Catalyst keeps the
    stages separate (CollapseProject refuses to duplicate non-cheap
    exprs) and whole-stage codegen fuses them back into one pass. Same
    operations in the same order, so results stay bit-identical.
    """
    staged = (
        df.select(F.col(id_col), _dbl(F.col(vec_col)).alias("_v"))
        .select(
            id_col,
            "_v",
            F.array_max(F.transform(F.col("_v"), lambda x: F.abs(x))).alias(
                "_amax"
            ),
        )
        .select(
            id_col, "_v", "_amax", (F.col("_amax") / F.lit(127.0)).alias("_scale")
        )
        # The staged projections evaluate _q/_dq for EVERY row (the
        # original tree only reached them through the zero-guard's
        # otherwise-branch), so an all-zero vector would hit ANSI
        # divide-by-zero here. Divide by a guarded scale instead:
        # identical value for non-zero rows, and zero rows' outputs are
        # overridden by the zero-guard below regardless.
        .select(
            id_col,
            "_v",
            "_amax",
            "_scale",
            F.when(F.col("_amax") == 0.0, F.lit(1.0))
            .otherwise(F.col("_scale"))
            .alias("_sdiv"),
        )
        .select(
            id_col,
            "_v",
            "_amax",
            "_scale",
            "_sdiv",
            F.transform(
                F.col("_v"),
                lambda x: F.floor(x / F.col("_sdiv") + F.lit(0.5)),
            ).alias("_q"),
        )
        .select(
            id_col,
            "_v",
            "_amax",
            "_scale",
            F.transform(
                F.col("_q"), lambda c: c.cast("double") * F.col("_scale")
            ).alias("_dq"),
        )
    )
    err = F.array_max(
        F.zip_with(F.col("_v"), F.col("_dq"), lambda x, d: F.abs(x - d))
    )
    dot = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_dq"), lambda x, d: x * d),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    nv = F.sqrt(
        F.aggregate(
            F.transform(F.col("_v"), lambda x: x * x),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    nd = F.sqrt(
        F.aggregate(
            F.transform(F.col("_dq"), lambda x: x * x),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    zero = F.col("_amax") == 0.0
    return staged.select(
        F.col(id_col),
        F.when(zero, F.lit(0.0)).otherwise(F.col("_scale")).alias("_qscale_raw"),
        F.when(zero, F.lit(0.0)).otherwise(err).alias("_err_raw"),
        F.when(zero, F.lit(1.0)).otherwise(dot / (nv * nd)).alias("_cos_raw"),
    )


#: Sparse JL projection geometry (Achlioptas 2003): weights ∈ {−1, 0, +1}
#: with probability {1/6, 2/3, 1/6}, scaled by √(3/out_dim) — the
#: database-friendly Johnson–Lindenstrauss family: each output dim is a
#: signed sum of ~1/3 of the input dims, no dense float matrix anywhere.
JL_OUT_DIM = 16


def _jl_signs(in_dim: int, out_dim: int) -> list[list[int]]:
    """Fixed md5-derived sign pattern — public constants shared verbatim
    by the Spark expression and the SQL oracle."""
    import hashlib

    def sign(j: int, d: int) -> int:
        h = int(hashlib.md5(f"jl{j}|{d}".encode()).hexdigest()[:8], 16) % 6
        return 1 if h == 0 else -1 if h == 1 else 0

    return [[sign(j, d) for d in range(in_dim)] for j in range(out_dim)]


def project_jl(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = JL_OUT_DIM,
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction, engine-exact.

    Pairwise distances survive within (1±ε) at out_dim = O(log n/ε²) —
    the standard pre-ANN shrink (4× here: 64 → 16 dims) that cuts both
    index storage and every downstream dot product. Each output
    coordinate is an EXPLICIT left-associated chain of ±element adds
    (double-cast) times the √(3/k) scale: fixed evaluation order ⇒
    bit-identical across engines/partitionings, so the projection
    hash-verifies like everything else. Zero shuffle — a pure
    projection that composes with any scan.

    Output: (id, dim, val) rows, val rounded 6.
    """
    import math

    signs = _jl_signs(in_dim, out_dim)
    scale = math.sqrt(3.0 / out_dim)
    # One parsed expression for all out_dim coordinates: the Column-
    # builder form paid ~out_dim × in_dim py4j round trips per plan
    # (~1.4 s of driver time at 16×64). The SQL string parses to the
    # identical Catalyst tree — the same left-associated ±term chain
    # (SQL +/- are left-associative), the same int element_at indexes,
    # and the same double scale (`{scale!r}D`: repr round-trips the
    # float exactly and the D suffix parses it as DoubleType, not
    # DECIMAL) — so values stay bit-identical.
    outs = []
    for j in range(out_dim):
        terms = []
        for d in range(in_dim):
            w = signs[j][d]
            if w == 0:
                continue
            t = f"CAST(element_at(`{vec_col}`, {d + 1}) AS DOUBLE)"
            if not terms:
                terms.append(t if w > 0 else f"- {t}")
            else:
                terms.append(f"+ {t}" if w > 0 else f"- {t}")
        chain = " ".join(terms) if terms else "0.0D"
        outs.append(f"round(({chain}) * {scale!r}D, 6)")
    # Stage the coordinates as named columns BEFORE the posexplode:
    # feeding the Generate one giant array-of-chains expression blows
    # janino's method-size limit (whole-stage codegen emitted ONE
    # doConsume for the whole array → "Failed to compile", silent
    # interpreted fallback — pre-existing with the Column-builder form
    # too). As separate projection columns each ±chain compiles into
    # its own split method, so the operator actually runs compiled.
    staged = df.select(
        F.col(id_col), *[F.expr(e).alias(f"_jl{j}") for j, e in enumerate(outs)]
    )
    arr = F.array(*[F.col(f"_jl{j}") for j in range(out_dim)])
    return staged.select(F.col(id_col), F.posexplode(arr).alias("dim", "val"))
