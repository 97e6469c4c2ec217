"""Classifier evaluation at corpus scale: AUC and calibration.

Both metrics are usually written with a global per-row ranking
(``rank() OVER (ORDER BY score)``) — a single-partition window at
100 TB. This module computes them exactly with the repo's bucketed
prefix-sum machinery instead:

- **AUC** (Mann-Whitney rank-sum with midrank tie handling): group the
  rows by distinct score first — at most one row per distinct score
  survives, carrying (positives, total) — then take ONE bucketed
  cumulative sum over that grouped frame. The tie-aware rank-sum
  identity::

      Σ_{positives} midrank = Σ_s pos_s · (cum_before(s) + (tot_s + 1)/2)

  needs only the exclusive prefix of totals per distinct score, so the
  plan is two shuffles (group by score, bucketed cumsum) and one final
  aggregate — no data-scale window, no collect.

- **Calibration**: exact decile assignment via
  :func:`operators.rowids.ntile_exact` (the SQL ntile formula from a
  bucketed row number), then one aggregate per band: count, mean score,
  positive fraction.

Scores are grouped on their ROUNDED value (4 dp): both engines agree
on the rounded doubles, which fixes the tie structure — with unrounded
IEEE sums two scores can tie in one engine and differ in the last ulp
in the other, changing midranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.operators.rowids import (
    bucketed_cumsum,
    ntile_exact,
)

__all__ = [
    "binary_auc",
    "binary_auc_by_group",
    "average_precision",
    "prf_from_confusion",
    "calibration_table",
]


def binary_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    round_scores: int = 4,
    bucket: Column | None = None,
) -> DataFrame:
    """Exact ROC-AUC of a binary classifier as a one-row frame
    (n_pos, n_neg, auc): the Mann-Whitney U statistic with midranks for
    ties, so it equals the window formulation
    ``avg(row_number) OVER (PARTITION BY score)`` bit-for-bit.

    ``label_col`` is boolean (or 0/1). ``bucket`` is the coarse
    order-prefix bucketing for the cumulative pass — default
    ``floor(score)``, monotone in score by construction; override when
    scores concentrate inside one unit interval. AUC is NULL when
    either class is absent (undefined, not 0.5-faked)."""
    s = F.round(F.col(score_col), round_scores)
    y = F.col(label_col).cast("int")
    g = (
        df.select(s.alias("_s"), y.alias("_y"))
        .groupBy("_s")
        .agg(F.sum("_y").alias("_pos"), F.count("*").alias("_tot"))
    )
    bucket = F.floor(F.col("_s")).cast("long") if bucket is None else bucket
    cum = bucketed_cumsum(
        g, F.col("_tot"), buckets=[(bucket, True)],
        order=[F.col("_s").asc()], out_col="_cumtot",
    )
    # midrank of the tie-group at s = cum_before + (tot+1)/2; halves are
    # exact in binary, so the rank sum is exact.
    agg = cum.agg(
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_tot") - F.col("_pos")).alias("n_neg"),
        F.sum(
            F.col("_pos")
            * (
                (F.col("_cumtot") - F.col("_tot")).cast("double")
                + (F.col("_tot") + 1) / 2.0
            )
        ).alias("_ranksum"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (
                F.col("_ranksum")
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2.0
            )
            / F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.col("n_pos").cast("double") * F.col("n_neg"),
            ),
            6,
        ).alias("auc"),
    )


def average_precision(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    round_scores: int = 4,
    bucket: Column | None = None,
) -> DataFrame:
    """Exact area under the precision-recall curve (average precision,
    the step-wise estimator over distinct thresholds)::

        AP = Σ_s (pos_s / n_pos) · precision(s)
        precision(s) = cum_pos(≥s) / cum_tot(≥s)

    — one row per distinct ROUNDED score, two bucketed cumulative sums
    DESCENDING over that grouped frame, one final aggregate. Like
    :func:`binary_auc`: no per-row ranking window, AP is NULL when no
    positives exist. Returns (n_pos, n_neg, ap)."""
    s = F.round(F.col(score_col), round_scores)
    y = F.col(label_col).cast("int")
    g = (
        df.select(s.alias("_s"), y.alias("_y"))
        .groupBy("_s")
        .agg(F.sum("_y").alias("_pos"), F.count("*").alias("_tot"))
    )
    bucket = F.floor(F.col("_s")).cast("long") if bucket is None else bucket
    cum = bucketed_cumsum(
        g, F.col("_tot"), buckets=[(bucket, False)],
        order=[F.col("_s").desc()], out_col="_ctot",
    )
    cum = bucketed_cumsum(
        cum, F.col("_pos"), buckets=[(bucket, False)],
        order=[F.col("_s").desc()], out_col="_cpos",
    )
    agg = cum.agg(
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_tot") - F.col("_pos")).alias("n_neg"),
        F.sum(
            F.col("_pos").cast("double")
            * F.col("_cpos")
            / F.col("_ctot")
        ).alias("_apsum"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("_apsum")
            / F.when(F.col("n_pos") > 0, F.col("n_pos").cast("double")),
            6,
        ).alias("ap"),
    )


def binary_auc_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str = "score",
    label_col: str = "label",
    round_scores: int = 4,
) -> DataFrame:
    """Per-slice ROC-AUC — the fairness/debug breakdown (AUC per
    source, per language, per cohort): the same midrank rank-sum as
    :func:`binary_auc`, with the cumulative pass as a window PARTITIONED
    BY GROUP over the frame grouped to one row per (group, distinct
    rounded score). The window's partition sees at most the group's
    distinct 4 dp scores — grouped-frame scale, never row scale (the
    global variant needs the bucketed cumsum only because it has no
    partition key at all). Returns one row per group: (group, n_pos,
    n_neg, auc); groups missing a class get NULL."""
    from pyspark.sql.window import Window

    s = F.round(F.col(score_col), round_scores)
    y = F.col(label_col).cast("int")
    g = (
        df.select(F.col(group_col).alias("_g"), s.alias("_s"), y.alias("_y"))
        .groupBy("_g", "_s")
        .agg(F.sum("_y").alias("_pos"), F.count("*").alias("_tot"))
    )
    w = (
        Window.partitionBy("_g")
        .orderBy(F.col("_s").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = g.withColumn("_cumtot", F.sum("_tot").over(w))
    agg = cum.groupBy("_g").agg(
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_tot") - F.col("_pos")).alias("n_neg"),
        F.sum(
            F.col("_pos")
            * (
                (F.col("_cumtot") - F.col("_tot")).cast("double")
                + (F.col("_tot") + 1) / 2.0
            )
        ).alias("_ranksum"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n_pos",
        "n_neg",
        F.round(
            (
                F.col("_ranksum")
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2.0
            )
            / F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.col("n_pos").cast("double") * F.col("n_neg"),
            ),
            6,
        ).alias("auc"),
    )


def prf_from_confusion(
    confusion: DataFrame,
    true_col: str = "true_label",
    pred_col: str = "pred_label",
    n_col: str = "n",
) -> DataFrame:
    """Per-class precision / recall / F1 from a confusion-matrix frame
    (true, pred, n) — classes² rows in, #classes rows out, pure
    aggregation. A class never predicted gets NULL precision (undefined,
    not zero-faked); F1 is NULL when either component is."""
    tp = F.sum(F.when(F.col(true_col) == F.col(pred_col), F.col(n_col)))
    by_true = confusion.groupBy(F.col(true_col).alias("cls")).agg(
        F.coalesce(tp, F.lit(0)).alias("tp"),
        F.sum(n_col).alias("support"),
    )
    by_pred = confusion.groupBy(F.col(pred_col).alias("cls")).agg(
        F.sum(n_col).alias("predicted")
    )
    joined = by_true.join(by_pred, "cls", "full").select(
        "cls",
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("predicted", F.lit(0)).alias("predicted"),
    )
    precision = F.col("tp") / F.when(
        F.col("predicted") > 0, F.col("predicted").cast("double")
    )
    recall = F.col("tp") / F.when(
        F.col("support") > 0, F.col("support").cast("double")
    )
    return joined.select(
        "cls",
        "tp",
        "support",
        "predicted",
        F.round(precision, 4).alias("precision"),
        F.round(recall, 4).alias("recall"),
        F.round(
            2 * precision * recall
            / F.when(precision + recall > 0, precision + recall),
            4,
        ).alias("f1"),
    )


def calibration_table(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "doc_id",
    k: int = 10,
    round_scores: int = 4,
    bucket: Column | None = None,
) -> DataFrame:
    """Reliability diagram data: exact ``ntile(k)`` bands over (rounded
    score, id) — assigned WITHOUT a global window via the bucketed row
    number — then per-band count, mean score, and positive fraction.
    A well-calibrated probability-like score has frac_pos tracking
    mean_score band by band."""
    s = F.round(F.col(score_col), round_scores)
    base = df.select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    )
    bucket = F.floor(F.col("_s")).cast("long") if bucket is None else bucket
    banded = ntile_exact(
        base, k,
        order=[F.col("_s").asc(), F.col("_id").asc()],
        buckets=[(bucket, True)],
        out_col="band",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("_s"), 4).alias("mean_score"),
            F.round(F.avg(F.col("_y").cast("double")), 4).alias("frac_pos"),
        )
    )


def ndcg_at_k(
    ranked: DataFrame,
    query_col: str = "query_id",
    rel_col: str = "rel",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """nDCG@k per query over a CANDIDATE ranking frame (one row per
    (query, item) with its 1-based rank and graded relevance) — the
    ranking-quality metric a retrieval stack reports next to recall.

    DCG = Σ_{rank≤k} rel / log2(rank+1) — the discount uses the CARRIED
    rank value, so a candidate list with holes (unjudged docs filtered
    upstream) keeps each item's true position. IDCG re-sorts the SAME
    candidate list by relevance into positions 1..n (the standard
    within-list ideal — no corpus pass).
    Both sums are LEFT FOLDS over rank-sorted arrays (sort_array on a
    (rank, rel) struct, then F.aggregate), so the float addition order
    is FIXED regardless of partitioning — the determinism device the
    label-centroid/JL kernels use; an unordered SUM of doubles would be
    partition-order dependent. Input stays candidate-scale: each query
    group is ≤ k rows after the filter, and the one shuffle is the
    groupBy on the query key.

    Returns (query_col, n_rel, dcg, idcg, ndcg) — ndcg NULL when the
    candidate list has no relevant item (undefined, not 0-faked).
    """
    folds = ndcg_folds(ranked, query_col, rel_col, rank_col, k)
    out = folds.select(
        query_col,
        "n_rel",
        F.round(F.col("_dcg_raw"), 6).alias("dcg"),
        F.round(F.col("_idcg_raw"), 6).alias("idcg"),
    )
    return out.select(
        query_col,
        "n_rel",
        "dcg",
        "idcg",
        F.round(
            F.when(F.col("idcg") != 0.0, F.col("dcg") / F.col("idcg")), 6
        ).alias("ndcg"),
    )


def ndcg_folds(
    ranked: DataFrame,
    query_col: str = "query_id",
    rel_col: str = "rel",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """The RAW (unrounded) dcg/idcg folds behind :func:`ndcg_at_k` —
    (query_col, n_rel, _dcg_raw, _idcg_raw). Split out so the parity
    rounding-margin audit can measure each raw fold's distance to its
    round(·,6) boundary with the exact production arithmetic."""
    capped = ranked.filter(F.col(rank_col) <= int(k)).select(
        F.col(query_col),
        F.col(rank_col).cast("int").alias("_rk"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    grouped = capped.groupBy(query_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_rk"), F.col("_rel")))
        ).alias("_by_rank"),
        F.sort_array(
            F.collect_list(F.struct((-F.col("_rel")).alias("_negrel"), F.col("_rk"))),
        ).alias("_by_rel"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("n_rel"),
    )

    def fold_by_rank(arr):
        # DCG discounts by the CARRIED rank value (non-contiguous ranks
        # — unjudged docs filtered upstream — keep their true discount)
        return F.aggregate(
            F.transform(
                arr,
                lambda s: s["_rel"] / F.log2(s["_rk"].cast("double") + 1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def fold_ideal(arr):
        # IDCG: the ideal reordering occupies positions 1..n
        return F.aggregate(
            F.zip_with(
                arr,
                F.sequence(F.lit(1), F.size(arr)),
                lambda s, i: -s["_negrel"] / F.log2(i.cast("double") + 1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return grouped.select(
        query_col,
        "n_rel",
        fold_by_rank(F.col("_by_rank")).alias("_dcg_raw"),
        fold_ideal(F.col("_by_rel")).alias("_idcg_raw"),
    )


#: DCG discount weights w(i) = 1 / log2(i + 1) for rank i = 1..32, as
#: 17-significant-digit double literals. Both the Spark expression and
#: any SQL oracle parse the SAME literal text (IEEE754 round-trip is
#: exact at 17 digits), so no runtime log2 — whose libm vs JVM
#: (log(x)/log(2)) implementations differ in the last ulp — ever enters
#: a cross-engine-hashed value.
NDCG_DCG_WEIGHT_LITERALS: tuple[str, ...] = (
    "1.0", "0.6309297535714575", "0.5", "0.43067655807339306",
    "0.38685280723454163", "0.3562071871080222", "0.3333333333333333",
    "0.31546487678572877", "0.3010299956639812", "0.2890648263178879",
    "0.27894294565112987", "0.27023815442731974", "0.26264953503719357",
    "0.2559580248098155", "0.25", "0.24465054211822604",
    "0.23981246656813146", "0.23540891336663824", "0.23137821315975915",
    "0.227670248696953", "0.22424382421757544", "0.22106472945750374",
    "0.21810429198553155", "0.21533827903669653", "0.21274605355336318",
    "0.2103099178571525", "0.20801459767650948", "0.20584683246043448",
    "0.2037950470905062", "0.20184908658209985", "0.2",
    "0.19823986317056053",
)

#: IDCG for BINARY relevance is a pure function of n_rel: the n_rel
#: best items fill ideal positions 1..n_rel, so idcg(n) =
#: Σ_{i=1..n} w(i). Precomputed as the left-to-right cumulative sums of
#: the weight literals above (index = n_rel, entry 0 = 0.0) — the same
#: fold order either engine would execute, frozen into literal text.
NDCG_IDCG_LITERALS: tuple[str, ...] = (
    "0.0", "1.0", "1.6309297535714575", "2.1309297535714578",
    "2.5616063116448506", "2.9484591188793923", "3.3046663059874146",
    "3.637999639320748", "3.953464516106477", "4.254494511770458",
    "4.543559338088346", "4.8225022837394755", "5.092740438166795",
    "5.355389973203989", "5.611347998013804", "5.861347998013804",
    "6.10599854013203", "6.345811006700162", "6.5812199200668",
    "6.812598133226559", "7.040268381923512", "7.264512206141087",
    "7.485576935598591", "7.703681227584122", "7.919019506620819",
    "8.131765560174182", "8.342075478031335", "8.550090075707844",
    "8.755936908168279", "8.959731955258786", "9.161581041840885",
    "9.361581041840884", "9.559820905011444",
)


def ndcg_binary_sql(
    k: int = 10, rounded: bool = True
) -> tuple[str, str, str]:
    """The (dcg, idcg, ndcg) SQL expression texts for binary-relevance
    nDCG@k over a pivoted frame with columns ``_r1.._rk`` (per-rank
    relevance as DOUBLE 0.0/1.0) and ``n_rel`` (BIGINT).

    The texts are plain arithmetic + simple CASE — valid and
    IEEE754-identical in both Spark SQL and ANSI/DuckDB SQL, with every
    float constant a precomputed literal: no ``log2``, no list lambdas,
    no struct indexing, nothing dialect-volatile in the hashed path
    (VERDICT r12 "Next round" #1). ``dcg`` is the fixed left-to-right
    chain ``_r1 * w(1) + ... + _rk * w(k)`` (each product exact, since
    relevance is 0.0/1.0); ``idcg`` is a k+1-entry CASE lookup on
    ``n_rel``; ``ndcg`` divides the two already-computed columns and is
    NULL when idcg = 0 (undefined, not 0-faked).

    ``rounded=False`` returns the raw (unrounded) dcg/idcg texts for
    rounding-margin audits.
    """
    if not 1 <= k <= len(NDCG_DCG_WEIGHT_LITERALS):
        raise ValueError(f"k={k} outside precomputed literal table (1..32)")
    # the E0 suffix makes every literal parse as DOUBLE in BOTH Spark
    # SQL and DuckDB — a bare decimal literal parses as DECIMAL in both,
    # and DECIMAL output columns are exactly the rendering-volatile type
    # class (Decimal objects / arrow decimal128) this path must avoid
    chain = " + ".join(
        f"_r{i} * {NDCG_DCG_WEIGHT_LITERALS[i - 1]}E0"
        for i in range(1, k + 1)
    )
    case = " ".join(
        f"WHEN {n} THEN {NDCG_IDCG_LITERALS[n]}E0" for n in range(0, k + 1)
    )
    case = f"CASE n_rel {case} END"
    if rounded:
        return (
            f"round({chain}, 6)",
            f"round({case}, 6)",
            "CASE WHEN idcg <> 0.0 THEN round(dcg / idcg, 6) END",
        )
    return chain, case, "dcg / idcg"


def ndcg_binary_pivot(
    ranked: DataFrame,
    query_col: str = "query_id",
    rel_col: str = "rel",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Pivot a (query, rank, rel) candidate frame into one row per
    query with per-rank relevance columns ``_r1.._rk`` (DOUBLE, absent
    ranks → 0.0 — candidate lists with holes keep their true discount
    positions) and ``n_rel``. One shuffle: the groupBy on the query key
    over ≤ k-row groups; the pivot is conditional aggregation, not a
    second pass per rank."""
    capped = ranked.filter(F.col(rank_col) <= int(k)).select(
        F.col(query_col),
        F.col(rank_col).cast("int").alias("_rk"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    grouped = capped.groupBy(query_col).agg(
        *[
            F.max(F.when(F.col("_rk") == i, F.col("_rel"))).alias(f"_r{i}")
            for i in range(1, k + 1)
        ],
        F.sum((F.col("_rel") > 0).cast("long")).alias("n_rel"),
    )
    return grouped.select(
        query_col,
        "n_rel",
        *[
            F.coalesce(F.col(f"_r{i}"), F.lit(0.0)).alias(f"_r{i}")
            for i in range(1, k + 1)
        ],
    )


def ndcg_at_k_binary(
    ranked: DataFrame,
    query_col: str = "query_id",
    rel_col: str = "rel",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """nDCG@k for BINARY relevance (rel ∈ {0, 1}) — the
    environment-proof twin of :func:`ndcg_at_k`: instead of runtime
    ``log2`` folds it pivots relevance by rank and evaluates the
    precomputed-literal expressions from :func:`ndcg_binary_sql`, so a
    SQL oracle built from the SAME literal text is bit-for-bit
    identical on any engine/version. Semantics match :func:`ndcg_at_k`
    on binary input (asserted in tests/test_llm_metrics.py): DCG
    discounts by the carried rank, IDCG is the within-list ideal,
    ndcg = round(dcg/idcg, 6), NULL when no relevant item.

    Returns (query_col, n_rel, dcg, idcg, ndcg).
    """
    dcg_sql, idcg_sql, ndcg_sql = ndcg_binary_sql(k)
    pivoted = ndcg_binary_pivot(ranked, query_col, rel_col, rank_col, k)
    scored = pivoted.select(
        query_col,
        "n_rel",
        F.expr(dcg_sql).alias("dcg"),
        F.expr(idcg_sql).alias("idcg"),
    )
    return scored.select(
        query_col, "n_rel", "dcg", "idcg", F.expr(ndcg_sql).alias("ndcg")
    )
