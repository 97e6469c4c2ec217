"""Distributed text classification trained purely with aggregations.

A multinomial Naive-Bayes classifier (the fastText-style linear
baseline of LLM-corpus pipelines: language ID, quality gating) whose
TRAINING is three shuffles of ordinary aggregations — no driver-side
optimization loop, no UDFs — and whose INFERENCE is one join plus one
windowed argmax. The whole train→score lifecycle is a single Catalyst
plan, so it runs unchanged on a 1000-executor cluster:

1. token counts per (token, class)        — one shuffle on token
2. per-class totals, vocabulary size,
   class priors                           — tiny frames, broadcast
3. per-(doc, class) log-likelihood        — one shuffle join on token,
                                            one aggregate on (doc, class)
4. argmax class per doc                   — per-doc window (≤ #classes
                                            rows per partition key)

The Laplace-smoothing identity that makes this scale: with
P(t|c) = (c_tc + 1) / (N_c + V), a document's class score is

    score(d, c) = ln prior_c + Σ_t tf_t · ln(c_tc + 1) − n_d · ln(N_c + V)

Tokens ABSENT from class c contribute ln(1) = 0 to the sum, so the
score needs only the NONZERO (token, class) counts — the join stays
proportional to the corpus token stream instead of |vocab| × |classes|.
The argmax ranks on the score rounded to 6 dp with the class label as
tiebreak, so the prediction is deterministic across engines and
partitionings (IEEE sums in different orders agree at that precision).

This is SELF-TRAINED on the labeled corpus it scores (the declared
query demonstrates the distributed mechanics end-to-end); a production
pipeline trains on a labeled slice and scores the unlabeled firehose —
same plan, two inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from egal_yet_another_earthquake_project_spark.llm import text as ltx

__all__ = [
    "nb_class_constants",
    "nb_token_weights",
    "nb_scores",
    "nb_classify",
    "nb_confusion",
]


def _token_stream(docs: DataFrame, text_col: str, label_col: str) -> DataFrame:
    """(doc_id, label, tok) — one row per token occurrence; empty docs
    vanish here and are re-attached at scoring time (they score on the
    prior alone)."""
    return (
        ltx.tokenized(docs, text_col)
        .select("doc_id", F.col(label_col).alias("label"), "_toks")
        .select("doc_id", "label", F.explode("_toks").alias("tok"))
    )


def nb_class_constants(
    docs: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """Per-class constants (cls, ln_prior, ln_denom): the broadcast-able
    side of the scorer. ln_prior = ln(docs_c / docs_total); ln_denom =
    ln(N_c + V) with N_c the class token total and V the global distinct
    vocabulary. At any corpus size this frame has one row per class."""
    tok = _token_stream(docs, text_col, label_col)
    class_tot = tok.groupBy("label").agg(F.count("*").alias("n_cls"))
    vocab = tok.select(F.countDistinct("tok").alias("v"))
    pri = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("nd")
    )
    total = docs.select(F.count("*").alias("nd_tot"))
    return (
        pri.crossJoin(F.broadcast(total))
        .join(class_tot, "label", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("label").alias("cls"),
            F.log(F.col("nd").cast("double") / F.col("nd_tot")).alias("ln_prior"),
            F.log(
                (F.coalesce(F.col("n_cls"), F.lit(0)) + F.col("v")).cast("double")
            ).alias("ln_denom"),
        )
    )


def nb_token_weights(
    docs: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """The learned model: (tok, cls, ln_count1) = ln(c_tc + 1) for every
    NONZERO (token, class) pair. Persistable like any dim table; joined
    on token at inference."""
    return (
        _token_stream(docs, text_col, label_col)
        .groupBy("tok", F.col("label").alias("cls"))
        .agg(F.count("*").alias("ctc"))
        .withColumn("ln_count1", F.log((F.col("ctc") + 1).cast("double")))
    )


def nb_scores(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    train: DataFrame | None = None,
) -> DataFrame:
    """The full score surface: (doc_id, true_label, cls, score) — one
    row per document per candidate class, score the UNROUNDED smoothed
    log-posterior. :func:`nb_classify` argmaxes this; eval metrics
    (AUC, calibration) consume a single class's slice."""
    train = docs if train is None else train
    weights = nb_token_weights(train, text_col, label_col)
    consts = nb_class_constants(train, text_col, label_col)
    return nb_scores_with_model(docs, weights, consts, text_col, label_col)


def nb_scores_with_model(
    docs: DataFrame,
    weights: DataFrame,
    consts: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Score against an ALREADY-TRAINED model (the frames
    :func:`nb_token_weights` / :func:`nb_class_constants` produce, or
    :func:`read_nb_model` loads) — the train-once-score-many production
    path. ``label_col`` may be absent from ``docs`` (unlabeled
    firehose): true_label comes back NULL."""
    if label_col not in docs.columns:
        docs = docs.withColumn(label_col, F.lit(None).cast("string"))

    base = ltx.tokenized(docs, text_col).select(
        "doc_id",
        F.col(label_col).alias("true_label"),
        F.size("_toks").alias("n_d"),
        "_toks",
    )
    tf = (
        base.select("doc_id", F.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    # token-likelihood mass per (doc, candidate class): join on token —
    # the model side fans out ≤ #classes rows per token
    contrib = (
        tf.join(weights, "tok")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("tf") * F.col("ln_count1")).alias("s"))
    )
    return (
        base.drop("_toks")
        .crossJoin(F.broadcast(consts))
        .join(contrib, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "true_label",
            "cls",
            (
                F.col("ln_prior")
                + F.coalesce(F.col("s"), F.lit(0.0))
                - F.col("n_d") * F.col("ln_denom")
            ).alias("score"),
        )
    )


def nb_classify(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    train: DataFrame | None = None,
) -> DataFrame:
    """Train on ``train`` (default: ``docs`` itself — self-training demo)
    and score every row of ``docs``: (doc_id, true_label, pred_label,
    score). score is the winning class's smoothed log-posterior
    (rounded 4 dp); argmax ties break on the class label so the
    prediction is engine- and partitioning-deterministic."""
    return _argmax(nb_scores(docs, text_col, label_col, train))


def nb_classify_with_model(
    docs: DataFrame,
    weights: DataFrame,
    consts: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Argmax predictions against a persisted model — per-document
    independent, so per-micro-batch streaming scoring drains to exactly
    the batch result."""
    return _argmax(
        nb_scores_with_model(docs, weights, consts, text_col, label_col)
    )


def _argmax(scores: DataFrame) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy(
        F.round("score", 6).desc(), F.col("cls").asc()
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "true_label",
            F.col("cls").alias("pred_label"),
            F.round("score", 4).alias("score"),
        )
    )


def write_nb_model(
    docs: DataFrame,
    model_dir: str,
    text_col: str = "text",
    label_col: str = "lang",
) -> None:
    """Persist the trained model: ``{model_dir}/weights`` (the nonzero
    (tok, cls, ctc, ln_count1) rows — corpus-vocabulary scale, a
    parquet dim table) and ``{model_dir}/consts`` (one row per class).
    ``_COMPLETE`` is written last, so a crash mid-write is never
    mistaken for a model (the ann_index staging convention)."""
    from egal_yet_another_earthquake_project_spark import fsutil

    spark = docs.sparkSession
    nb_token_weights(docs, text_col, label_col).write.mode("overwrite").parquet(
        f"{model_dir}/weights"
    )
    nb_class_constants(docs, text_col, label_col).write.mode(
        "overwrite"
    ).parquet(f"{model_dir}/consts")
    fsutil.write_text_overwrite(spark, f"{model_dir}/_COMPLETE", "nb-model\n")


def read_nb_model(spark, model_dir: str) -> tuple[DataFrame, DataFrame]:
    """(weights, consts) of a persisted model; refuses a directory
    whose ``_COMPLETE`` marker is missing (partial write)."""
    from egal_yet_another_earthquake_project_spark import fsutil

    if fsutil.read_text(spark, f"{model_dir}/_COMPLETE") is None:
        raise ValueError(
            f"read_nb_model: {model_dir} has no _COMPLETE marker "
            "(missing or partially written model)"
        )
    return (
        spark.read.parquet(f"{model_dir}/weights"),
        spark.read.parquet(f"{model_dir}/consts"),
    )


def log_odds_keywords(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    k: int = 10,
    alpha0: float = 100.0,
) -> DataFrame:
    """Class-characteristic tokens by the log-odds ratio with an
    informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    "Fightin' Words") — the principled replacement for raw tf-idf
    class keywords: rare tokens are shrunk toward the corpus
    distribution instead of dominating on noise.

    One-vs-rest per class. With y_tc the token count in class c, y_t
    the corpus count, n_c / n the class / corpus token totals, and
    prior α_t = α0 · y_t / n::

        δ_tc = ln((y_tc + α_t) / (n_c + α0 − y_tc − α_t))
             − ln((y_t − y_tc + α_t) / (n − n_c + α0 − (y_t − y_tc) − α_t))
        z_tc = δ_tc / sqrt(1/(y_tc + α_t) + 1/(y_t − y_tc + α_t))

    Top-``k`` tokens per class by z (rounded 4 dp, token tiebreak) —
    the per-class rank is WindowGroupLimit-cut, so no class's full
    vocabulary ever sorts in one task. Shape: the same (tok, cls)
    aggregate as NB training, one groupBy(tok) for corpus counts, a
    broadcast of the ≤#classes totals — everything else is per-row
    math."""
    tok = _token_stream(docs, text_col, label_col)
    ct = tok.groupBy("tok", F.col("label").alias("cls")).agg(
        F.count("*").alias("y_tc")
    )
    yt = ct.groupBy("tok").agg(F.sum("y_tc").alias("y_t"))
    n_cls = ct.groupBy("cls").agg(F.sum("y_tc").alias("n_c"))
    n_tot = ct.agg(F.sum("y_tc").alias("n"))
    a0 = F.lit(float(alpha0))
    base = (
        ct.join(yt, "tok")
        .join(F.broadcast(n_cls), "cls")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("a_t", a0 * F.col("y_t") / F.col("n"))
        .withColumn("y_rest", F.col("y_t") - F.col("y_tc"))
    )
    delta = F.log(
        (F.col("y_tc") + F.col("a_t"))
        / (F.col("n_c") + a0 - F.col("y_tc") - F.col("a_t"))
    ) - F.log(
        (F.col("y_rest") + F.col("a_t"))
        / (F.col("n") - F.col("n_c") + a0 - F.col("y_rest") - F.col("a_t"))
    )
    var = 1.0 / (F.col("y_tc") + F.col("a_t")) + 1.0 / (
        F.col("y_rest") + F.col("a_t")
    )
    scored = base.withColumn(
        "z", F.round(delta / F.sqrt(var), 4)
    )
    w = Window.partitionBy("cls").orderBy(F.col("z").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select(
            "cls",
            F.col("rnk").cast("int").alias("rnk"),
            "tok",
            "z",
            F.col("y_tc").alias("count_in_class"),
        )
    )


def nb_confusion(
    docs: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """Confusion matrix of the self-trained classifier: (true_label,
    pred_label, n) — the compact training-eval artifact."""
    return (
        nb_classify(docs, text_col, label_col)
        .groupBy("true_label", "pred_label")
        .agg(F.count("*").alias("n"))
    )
