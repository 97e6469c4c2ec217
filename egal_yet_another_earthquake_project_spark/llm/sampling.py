"""Deterministic sampling and dataset splits.

Training pipelines need samples and train/val/test splits that are (a)
reproducible across runs and engines, (b) stable under repartitioning,
and (c) assigned per-record with no coordination. ``df.sample(seed=...)``
fails (a)/(b) — its outcome depends on partitioning. Hash-based
assignment from a stable key satisfies all three: bucket =
first-32-bits-of-md5(key) mod N, identical in any engine that has md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(key: Column | str, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(salt‖key)
    as an integer, mod buckets. Portable to any SQL engine."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10)
    return (h.cast("long") % buckets).cast("int")


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — the same rows on
    every run, every engine, every partitioning."""
    return df.filter(hash_bucket(key, 10_000, salt) < int(fraction * 10_000))


def alpha_resample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    budget: int = 1000,
    salt: str = "alpha",
) -> DataFrame:
    """Temperature-style source rebalancing: sample a ``budget``-doc
    corpus whose per-source share follows c_s^α (the multilingual-corpus
    recipe — mC4/UniMax-style α-smoothing: α=1 keeps natural proportions,
    α→0 approaches uniform-per-source, so low-resource sources are
    upsampled relative to their natural share).

    target_s = min(c_s, ceil(budget · c_s^α / Σ c_s^α)); the kept docs
    are the target_s smallest md5(salt‖id) per source — a deterministic
    "random" sample, stable across runs/engines/partitionings.

    Plan shape: the per-source counts and the weight normalizer are
    one tiny aggregate (broadcast back — nothing driver-side); selection
    is one rank window partitioned by source. At extreme source skew,
    pre-bucket the rank (source‖hash%B) and take per-bucket quotas —
    determinism survives because the order key is the id hash.
    Output: (id, source, target) for every kept doc.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(source_col).agg(F.count("*").alias("_c"))
    wsum = counts.agg(
        F.sum(F.pow(F.col("_c").cast("double"), F.lit(alpha))).alias("_wsum")
    )
    targets = counts.crossJoin(F.broadcast(wsum)).select(
        source_col,
        F.least(
            F.col("_c"),
            F.ceil(
                F.lit(float(budget))
                * F.pow(F.col("_c").cast("double"), F.lit(alpha))
                / F.col("_wsum")
            ),
        ).cast("long").alias("target"),
    )
    ordered = df.select(
        F.col(id_col),
        F.col(source_col),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias("_ord"),
    )
    w = Window.partitionBy(source_col).orderBy(F.col("_ord").asc(), F.col(id_col).asc())
    return (
        ordered.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(targets), source_col)
        .filter(F.col("_rn") <= F.col("target"))
        .select(id_col, source_col, "target")
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
    salt: str = "wrs",
) -> DataFrame:
    """Weighted sampling without replacement, A-Res style (Efraimidis &
    Spirakis priority sampling): each row gets priority u^(1/w) for a
    deterministic hash-uniform u ∈ (0, 1]; the global top-k priorities
    are the sample. Inclusion probability is proportional to weight,
    and — unlike ``df.sample`` — the outcome is identical across runs,
    engines, and partitionings because u derives from md5(salt‖id).

    Plan shape: per-partition partial top-k (TakeOrderedAndProject),
    merged at the driver — no full sort, no shuffle of the input. This
    is the distributed weighted-reservoir formulation: at 100 TB every
    partition ships only its k best rows.

    Output: (id, weight, priority) with priority rounded for display;
    selection orders on the unrounded key with id as tiebreak.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "weight", F.round("_key", 4).alias("priority"))
    )


def split_of(
    key: Column | str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> Column:
    """The split-name column for a key expression — the pure-expression
    form of :func:`with_split`, usable on ANY column (e.g. scoring both
    ends of a duplicate pair without joining the corpus back in).
    ``weights`` maps split name → percentage (must sum to 100); default
    80/10/10 train/val/test."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    assert sum(weights.values()) == 100, "split weights must sum to 100"
    bucket = hash_bucket(key, 100, salt)
    expr: Column | None = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return expr


def with_split(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket. ``weights`` maps
    split name → percentage (must sum to 100); default 80/10/10
    train/val/test."""
    return df.withColumn(out_col, split_of(key, weights, salt))


def mixture_epochs(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Materialize a training data mixture: repeat each doc according to
    its source's epoch weight.

    A mixture spec ("wiki ×2.3, web ×0.8") is the standard way training
    runs consume a curated corpus — upsampling high-quality sources by
    repetition, downsampling the rest. A weight w yields ⌊w⌋ copies of
    every doc plus one extra copy for a deterministic md5-chosen
    fraction frac(w) of docs (w = 2.3 → every doc twice, a stable 30%
    three times; w = 0.8 → a stable 80% once). Selection is per-doc hash
    against an integer threshold — reproducible across runs, engines,
    and partitionings, like every sampler here.

    Output: the input columns plus ``copy`` (1-based repetition index).
    Scale shape: one when-chain projection + ``explode(sequence)`` —
    zero shuffle, composes with any downstream packing pass. The weights
    dict is plan literals (a mixture spec is dozens of sources, not a
    data-scale frame).
    """
    bad = {k: v for k, v in weights.items() if v < 0}
    if bad or default_weight < 0:
        raise ValueError(f"mixture weights must be ≥ 0 (drop = 0.0): {bad}")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")

    def copies_for(w: float) -> Column:
        whole = int(w)
        frac = w - whole
        threshold = int(round(frac * (1 << 32)))
        return F.lit(whole) + (hv < F.lit(threshold)).cast("int")

    n_copies = copies_for(default_weight)
    for src, w in sorted(weights.items()):
        n_copies = F.when(F.col(source_col) == src, copies_for(w)).otherwise(
            n_copies
        )
    return (
        df.withColumn("_nc", n_copies)
        .filter(F.col("_nc") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("_nc"))))
        .drop("_nc")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Split assignment that PREVENTS near-dup leakage by construction:
    every member of a duplicate cluster hashes into the SAME split.

    The audit (`q_split_leakage`) measures leakage after the fact; this
    is the fix — split on the CLUSTER representative, not the doc id:
    near-dup pairs → connected components → each doc's split = hash of
    its component id (docs outside any pair keep their own id as
    representative, so the assignment is unchanged for the un-duplicated
    bulk of the corpus). One left join against the component table,
    which is candidate-scale, not corpus-scale.

    Output: df + ``split``.
    """
    from egal_yet_another_earthquake_project_spark.llm.clusters import (
        connected_components,
    )

    comp = connected_components(pairs, src_col, dst_col).select(
        F.col("node").alias(id_col), "component"
    )
    rep = F.coalesce(F.col("component"), F.col(id_col))
    return (
        df.join(comp, id_col, "left")
        .withColumn("split", split_of(rep, weights, salt))
        .drop("component")
    )


def stratified_split(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "strat",
) -> DataFrame:
    """EXACT per-stratum splits: within every stratum the split sizes
    hit their quotas to the row (±1 from integer flooring), unlike the
    hash split whose per-stratum ratios only hold in expectation (a
    small source can land 70/30 by chance at 80/10/10 weights).

    Per stratum: md5-rank rows, cut at exact cumulative quota
    boundaries (⌊w·n⌋, computed from the stratum's own count window).
    One shuffle (the stratum window) — the alpha_resample plan shape.
    Output: df + ``split``; deterministic across engines/partitionings.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    assert sum(weights.values()) == 100, "split weights must sum to 100"
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).asc(),
        F.col(id_col).asc(),
    )
    wc = Window.partitionBy(strata_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_ns", F.count("*").over(wc)
    )
    expr = None
    cum = 0
    names = list(weights.items())
    for name, pct in names[:-1]:
        cum += pct
        bound = F.floor(F.col("_ns") * cum / 100)
        cond = F.col("_rn") <= bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        expr.otherwise(names[-1][0]) if expr is not None else F.lit(names[-1][0])
    )
    return ranked.withColumn("split", expr).drop("_rn", "_ns")
