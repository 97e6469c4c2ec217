"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169).

Given a huge RAW crawl and a small TARGET corpus (the distribution you
want the training mix to look like — Wikipedia, curated text, a
domain), DSIR scores every raw document with the log-likelihood ratio
of two hashed bag-of-n-grams models,

    log w(x) = Σ_b c_b(x) · [ln p_target(b) − ln p_raw(b)],

then samples the training subset WITHOUT replacement with probability
∝ w(x).  Hashing uni+bigrams into a fixed bucket count B keeps both
models bounded regardless of vocabulary size — the whole "model" is
two ≤B-row vectors, broadcastable at any corpus scale.

Scale shape (100 TB story):
- feature extraction is one map-side explode + a (doc, bucket)
  aggregate — doc-scale, shuffles only the feature counts (≤B distinct
  buckets per doc, B fixed);
- each bag-of-words model is a ≤B-row aggregate, BROADCAST to the
  scorers; the raw corpus is never joined against anything its own
  size;
- scoring is one groupBy(doc) sum over the feature frame;
- selection is Gumbel-top-k (Vieira 2014): adding hash-derived Gumbel
  noise to log w and taking the global top-k is exactly sampling k
  docs without replacement ∝ w — and top-k is
  TakeOrderedAndProject (per-partition heaps), never a global sort.

Everything is deterministic: the hash bucket and the Gumbel uniform
both derive from md5, so feature vectors, weights, and the selected
set are identical across runs, engines, and partitionings — the same
portability contract as :mod:`.sampling` (DuckDB replays every step).

Reference anchor: the reference pipeline has no data-selection stage
(its corpus is the full AFAD feed); DSIR is part of the
beyond-reference LLM-curation surface, alongside the quality gates in
:mod:`.text` and the resamplers in :mod:`.sampling`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .text import tokenized

#: Hashed feature-space size. The paper uses 10^4 for web-scale text;
#: the default here is sized for the test corpus's tiny vocabulary —
#: callers at real scale pass 10_000+.
DEFAULT_BUCKETS = 1024


def _bigrams_of_tokens(toks: Column) -> Column:
    """Adjacent word pairs from a MATERIALIZED tokens column; texts
    shorter than 2 tokens yield none (unlike shingles_of_tokens'
    whole-text fallback — a 1-token doc's unigram already carries it)."""
    return F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
        )
    )


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """(doc, bucket, cnt): uni+bigram counts hashed into ``buckets``
    via the portable md5 bucket (:func:`.sampling.hash_bucket`).

    One explode over materialized tokens; the aggregate key is
    (doc, bucket) so per-doc state is capped at B regardless of doc
    length. Collisions are part of the scheme (hashing trick), not a
    defect — both models hash identically, so a collision biases p and
    q the same way.
    """
    t = tokenized(docs, text_col)
    grams = t.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.concat(F.col("_toks"), _bigrams_of_tokens(F.col("_toks")))
        ).alias("gram"),
    )
    return grams.groupBy(
        "doc", hash_bucket(F.col("gram"), buckets, salt).alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def bow_log_model(features: DataFrame, count_alias: str) -> DataFrame:
    """Collapse a (doc, bucket, cnt) feature frame into the bucket-level
    count vector (bucket, <count_alias>) — the hashed bag-of-words
    "model". ≤B rows by construction; smoothing happens at score time
    so unseen buckets never need a dense materialization."""
    return features.groupBy("bucket").agg(F.sum("cnt").alias(count_alias))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
    raw_features: DataFrame | None = None,
    target_features: DataFrame | None = None,
) -> DataFrame:
    """Per-raw-doc DSIR importance log-weight (doc, n_grams, logw).

    log w(x) = Σ_b c_b(x)·[ln((ct_b+1)/(Nt+B)) − ln((cr_b+1)/(Nr+B))]
    — add-one smoothing over the B hashed buckets on both sides, so a
    bucket unseen in either model contributes its smoothing floor
    instead of ±∞ (LEFT join + coalesce(0), same convention as the
    frozen-LM scorer in :mod:`.lm`).

    The raw-model statistics come from the same feature frame that is
    being scored; callers that invoke this inside one plan should pass
    a PERSISTED ``raw_features`` (the declared query does) so the
    tokenize+hash pass runs once, not once per consumer — the exact
    one-pass discipline :func:`.dedup.incremental_neardup_pairs` uses
    for its band frames. Totals ride along as one-row broadcast
    crossJoins (never a driver collect).
    """
    if raw_features is None:
        raw_features = hashed_ngram_features(raw, id_col, text_col, buckets, salt)
    if target_features is None:
        target_features = hashed_ngram_features(
            target, id_col, text_col, buckets, salt
        )
    tm = bow_log_model(target_features, "_ct")
    rm = bow_log_model(raw_features, "_cr")
    tt = tm.agg(F.sum("_ct").alias("_nt"))
    rt = rm.agg(F.sum("_cr").alias("_nr"))
    b = F.lit(float(buckets))
    lam = F.log(
        (F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + 1.0)
        / (F.col("_nt").cast("double") + b)
    ) - F.log(
        (F.coalesce(F.col("_cr"), F.lit(0)).cast("double") + 1.0)
        / (F.col("_nr").cast("double") + b)
    )
    return (
        raw_features.join(F.broadcast(tm), "bucket", "left")
        .join(F.broadcast(rm), "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .withColumn("_lam", lam)
        .groupBy("doc")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.col("cnt").cast("double") * F.col("_lam")).alias("logw"),
        )
    )


def train_dsir_model(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
) -> dict:
    """Freeze the DSIR scorer: both hashed bag-of-words count vectors
    PERSISTED (so no scorer ever re-runs the tokenize+hash lineage) and
    the two totals collapsed to plan literals. The only driver-side
    collects are two one-value aggregates over ≤B-row frames — bounded
    by the bucket parameter, never by data size. "Train once, score
    every batch": the same contract as :func:`.lm.train_bigram_lm`,
    with :func:`write_dsir_model` as the durable form."""
    tm = bow_log_model(
        hashed_ngram_features(target, id_col, text_col, buckets, salt), "_ct"
    ).persist()
    rm = bow_log_model(
        hashed_ngram_features(raw, id_col, text_col, buckets, salt), "_cr"
    ).persist()
    nt = tm.agg(F.sum("_ct")).first()[0] or 0
    nr = rm.agg(F.sum("_cr")).first()[0] or 0
    return {
        "tm": tm,
        "rm": rm,
        "nt": int(nt),
        "nr": int(nr),
        "buckets": int(buckets),
        "salt": salt,
    }


def write_dsir_model(model: dict, model_dir: str) -> None:
    """Persist a trained DSIR model as a durable artifact:
    ``{model_dir}/tm`` and ``{model_dir}/rm`` parquet (≤B rows each)
    plus a one-row ``{model_dir}/meta`` carrying (nt, nr, buckets,
    salt) — the write-once-per-corpus-version form, kilobyte-scale at
    any corpus size because the feature space is hashed."""
    spark = model["tm"].sparkSession
    model["tm"].write.mode("overwrite").parquet(f"{model_dir}/tm")
    model["rm"].write.mode("overwrite").parquet(f"{model_dir}/rm")
    meta = spark.createDataFrame(
        [(int(model["nt"]), int(model["nr"]), int(model["buckets"]), model["salt"])],
        "nt long, nr long, buckets long, salt string",
    )
    meta.write.mode("overwrite").parquet(f"{model_dir}/meta")


def read_dsir_model(spark, model_dir: str) -> dict:
    """Load a :func:`write_dsir_model` artifact in any session — the
    count frames come straight off parquet, so scoring joins scan the
    artifact with pushdown; no training lineage travels with them."""
    row = spark.read.parquet(f"{model_dir}/meta").first().asDict()
    return {
        "tm": spark.read.parquet(f"{model_dir}/tm"),
        "rm": spark.read.parquet(f"{model_dir}/rm"),
        "nt": int(row["nt"]),
        "nr": int(row["nr"]),
        "buckets": int(row["buckets"]),
        "salt": row["salt"],
    }


def score_dsir_frozen(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, n_grams, logw) against a FROZEN DSIR model.

    Same per-bucket arithmetic as :func:`dsir_log_weights` — add-one
    smoothing, LEFT joins + coalesce(0) so a bucket the model never saw
    scores at the smoothing floor instead of dropping or diverging —
    but the totals are plan LITERALS and the model frames are broadcast
    artifact scans, so the scoring plan carries no dependency on the
    training corpus (identical weights to the in-plan form when the
    model was trained on the same pool; tested)."""
    feats = hashed_ngram_features(
        df, id_col, text_col, model["buckets"], model["salt"]
    )
    b = F.lit(float(model["buckets"]))
    nt = F.lit(float(model["nt"]))
    nr = F.lit(float(model["nr"]))
    lam = F.log(
        (F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + 1.0) / (nt + b)
    ) - F.log(
        (F.coalesce(F.col("_cr"), F.lit(0)).cast("double") + 1.0) / (nr + b)
    )
    return (
        feats.join(F.broadcast(model["tm"]), "bucket", "left")
        .join(F.broadcast(model["rm"]), "bucket", "left")
        .withColumn("_lam", lam)
        .groupBy("doc")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.col("cnt").cast("double") * F.col("_lam")).alias("logw"),
        )
    )


def gumbel_topk(
    weights: DataFrame,
    id_col: str = "doc",
    logw_col: str = "logw",
    k: int = 100,
    salt: str = "gumbel",
) -> DataFrame:
    """Deterministic Gumbel-top-k selection: top-k of
    ``logw + Gumbel(md5(salt‖id))`` is an exact sample of k rows
    without replacement with P ∝ exp(logw) (the Gumbel-max trick,
    Vieira 2014 — the log-space twin of the Efraimidis–Spirakis
    priority sample in :func:`.sampling.weighted_priority_sample`).

    The uniform comes from the first 32 md5 bits, offset by half a
    grid step to the OPEN interval (0, 1) — u = 0 or u = 1 would make
    a log singular, and at billion-doc scale the 1-in-2^32 endpoint
    hash WOULD occur and auto-select its doc with an infinite score.
    Plan: per-partition top-k heaps
    (TakeOrderedAndProject) — no global sort, no shuffle of the
    weight frame. Ties break on id for cross-engine stability.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    g = -F.log(-F.log(u))
    return (
        weights.withColumn("_score", F.col(logw_col) + g)
        .orderBy(F.col("_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
