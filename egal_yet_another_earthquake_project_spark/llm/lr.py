"""Hashed-feature logistic regression trained by distributed batch
gradient descent — the DISCRIMINATIVE quality-gate counterpart of
:mod:`llm.classify`'s generative Naive Bayes (the industry-standard
fastText-style linear gate trains exactly this way: hashed bag-of-token
features, a linear model, SGD/GD on logistic loss).

Spark-first shape — each epoch is two aggregations, nothing else:

1. margins  — feats(doc, bucket, x) ⋈ broadcast(weights) on bucket,
              then one exact integer SUM per doc (shuffle on doc_id)
2. gradient — feats ⋈ residuals on doc_id, then one exact integer SUM
              per bucket (shuffle on bucket; map-side partials, the
              output is ≤ dim+1 rows no matter the corpus size)

The model is ALWAYS broadcastable (dim+1 rows), the per-epoch driver
state is zero (weights stay a localCheckpointed DataFrame, the
PageRank discipline), and the corpus-side frame is the (doc, bucket,
tf) stream — persisted once, re-joined per epoch.

Integer-grid determinism (the k-means / PageRank discipline, extended
to a model with a transcendental link): weights live on an integer
grid (w = W / SCALE), features are integer token counts, so margins
and gradient sums are EXACT integer aggregations — order- and
partitioning-free. The one float step per epoch, the sigmoid, is
quantized straight back to the integer grid per document
(r = round((σ(m/SCALE) − y)·GRID)) before it enters any sum, so
cross-engine float drift cannot compound across epochs: a DuckDB
oracle unrolling the same epochs reproduces the weights bit-for-bit
(the declared ``lr_weights`` query is exactly that proof). Updates use
truncate-toward-zero integer division spelled explicitly
(sign·(|a| DIV d)) because engines disagree on negative integer
division semantics.

Learning dynamics note: batch GD on raw tf features with lr_num/lr_den
= 1/2 and 8 epochs is deliberately modest — the declared queries
demonstrate the distributed mechanics and the exact replay; a
production gate would run more epochs on a labeled slice with the same
plan per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import text as ltx

__all__ = [
    "hashed_features",
    "lr_train",
    "lr_margins",
    "lr_scores",
    "lr_classify",
    "write_lr_model",
    "read_lr_model",
]

#: hashed feature dimensionality (buckets 0..DIM-1; bucket DIM = bias)
DIM = 1024
#: weight grid: real weight = W / SCALE
SCALE = 1_000_000
#: residual grid: r = round((p − y) · GRID)
GRID = 1_000_000
EPOCHS = 8
LR_NUM, LR_DEN = 1, 2


def _tdiv(a, d):
    """Truncate-toward-zero integer division as an explicit Column —
    Spark's DIV and DuckDB's // disagree on negative operands, so the
    sign is peeled off before the (positive) floor division."""
    a = a.cast("long")
    d = d.cast("long") if isinstance(d, F.Column) else F.lit(int(d)).cast("long")
    # decimal(38,0) keeps the positive floor-division exact beyond 2^53
    # (a double-backed long/long division would round the quotient)
    q = F.floor(
        F.abs(a).cast("decimal(38,0)") / F.abs(d).cast("decimal(38,0)")
    ).cast("long")
    return F.when(a >= 0, q).otherwise(-q)


def _bucket(tok):
    """Token → hashed bucket, the cross-engine md5 device used by the
    MinHash lane: first 8 md5 hex chars as an int, mod DIM."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % DIM
    )


def hashed_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, bucket, x): integer token counts per hashed bucket,
    PLUS one bias row (bucket = DIM, x = 1) per document — the bias
    guarantees every document has at least one feature row, so empty
    documents still receive margins and residuals."""
    tf = (
        ltx.tokenized(docs, text_col)
        .select(F.col(id_col).alias("doc_id"), F.explode("_toks").alias("tok"))
        .groupBy("doc_id", _bucket(F.col("tok")).alias("bucket"))
        .agg(F.count("*").alias("x"))
    )
    bias = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(DIM).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("x"),
    )
    return tf.select("doc_id", "bucket", F.col("x").cast("long")).unionByName(
        bias
    )


def lr_margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, m): exact integer margin Σ W_bucket·x per document.
    The model side is ≤ DIM+1 rows — always a broadcast join; the
    per-doc sum is the epoch's first shuffle."""
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
    )


def lr_train(
    docs: DataFrame,
    text_col: str = "text",
    label: F.Column | None = None,
    epochs: int = EPOCHS,
    lr_num: int = LR_NUM,
    lr_den: int = LR_DEN,
) -> DataFrame:
    """Batch gradient descent on logistic loss: returns the trained
    integer-grid weights (bucket, w), DIM+1 rows. ``label`` is a
    boolean Column over ``docs`` (default: lang = 'en', the same
    planted one-vs-rest labels the NB eval family uses)."""
    spark = docs.sparkSession
    if label is None:
        label = F.col("lang") == "en"
    feats = hashed_features(docs, text_col).persist()
    labels = docs.select(
        F.col("doc_id"), label.cast("long").alias("y")
    )
    n_docs = docs.count()  # one scalar, the PageRank-style driver state

    weights = spark.range(DIM + 1).select(
        F.col("id").alias("bucket"), F.lit(0).cast("long").alias("w")
    )
    for _ in range(int(epochs)):
        margins = lr_margins(feats, weights)
        resid = (
            labels.join(margins, "doc_id", "left")
            .select(
                "doc_id",
                F.round(
                    (
                        F.lit(1.0)
                        / (
                            F.lit(1.0)
                            + F.exp(
                                -(
                                    F.coalesce(F.col("m"), F.lit(0)).cast(
                                        "double"
                                    )
                                    / F.lit(float(SCALE))
                                )
                            )
                        )
                        - F.col("y")
                    )
                    * F.lit(float(GRID)),
                    0,
                )
                .cast("long")
                .alias("r"),
            )
        )
        grad = (
            feats.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("r") * F.col("x")).alias("g"))
        )
        weights = (
            weights.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w")
                    - _tdiv(
                        F.lit(lr_num)
                        * _tdiv(F.coalesce(F.col("g"), F.lit(0)), n_docs)
                        * F.lit(SCALE),
                        GRID * lr_den,
                    )
                ).alias("w"),
            )
            # materialize each epoch so the next one starts from data,
            # not from an epoch-deep plan (the PageRank discipline)
            .localCheckpoint(eager=True)
        )
    feats.unpersist()
    return weights


def lr_scores(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    label: F.Column | None = None,
) -> DataFrame:
    """(doc_id, label, score): the exact integer margin as the score
    slice for eval metrics (AUC/PR-AUC take it as a double), with the
    planted binary label alongside. ``label=None`` defaults to the
    planted lang='en' labels when the frame HAS a lang column and to a
    NULL label otherwise — so pure (doc_id, text) inference frames
    score without a sentinel-column dance (schema stays stable)."""
    if label is None:
        label = (
            F.col("lang") == "en"
            if "lang" in docs.columns
            else F.lit(None).cast("boolean")
        )
    feats = hashed_features(docs, text_col)
    margins = lr_margins(feats, weights)
    return (
        docs.select("doc_id", label.alias("label"))
        .join(margins, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m"), F.lit(0)).cast("double").alias("score"),
            "label",
        )
    )


def write_lr_model(
    docs: DataFrame,
    model_dir: str,
    text_col: str = "text",
    label: F.Column | None = None,
    epochs: int = EPOCHS,
) -> None:
    """Train and persist the model: ``{model_dir}/weights`` (DIM+1
    integer-grid rows — trivially a parquet dim table) with a
    ``_COMPLETE`` marker written last so a crash mid-write is never
    mistaken for a model (the nb-model / ann_index staging
    convention)."""
    from egal_yet_another_earthquake_project_spark import fsutil

    spark = docs.sparkSession
    lr_train(docs, text_col, label, epochs=epochs).write.mode(
        "overwrite"
    ).parquet(f"{model_dir}/weights")
    fsutil.write_text_overwrite(spark, f"{model_dir}/_COMPLETE", "lr-model\n")


def read_lr_model(spark, model_dir: str) -> DataFrame:
    """The persisted weights frame; refuses a marker-less (partially
    written) directory."""
    from egal_yet_another_earthquake_project_spark import fsutil

    if fsutil.read_text(spark, f"{model_dir}/_COMPLETE") is None:
        raise ValueError(
            f"read_lr_model: {model_dir} has no _COMPLETE marker "
            "(missing or partially written model)"
        )
    return spark.read.parquet(f"{model_dir}/weights")


def lr_classify(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    label: F.Column | None = None,
) -> DataFrame:
    """(doc_id, label, pred): margin ≥ 0 ⇔ p ≥ 0.5 — the decision
    boundary needs no sigmoid at inference, so scoring is exact integer
    arithmetic end to end."""
    scored = lr_scores(docs, weights, text_col, label)
    return scored.select(
        "doc_id", "label", (F.col("score") >= 0).alias("pred")
    )
