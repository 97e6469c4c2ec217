"""Unigram language-model scoring — the cheap perplexity proxy a
curation pipeline uses to rank documents by "surprisal" before the
expensive model-based filters run.

Model: add-one-smoothed corpus unigram frequencies; score: per-document
mean negative log-likelihood (mean over token INSTANCES, i.e. weighted
by term frequency). High NLL = rare-token-heavy document (gibberish,
boilerplate with IDs, wrong-language fragments); low NLL =
head-vocabulary prose.

Scale shape (the part that matters at 100 TB):

- The (doc, token) stream is collapsed to per-doc TERM FREQUENCIES
  first (map-side partial aggregation on a near-unique composite key),
  so the join against the vocabulary sees distinct (doc, token) pairs —
  orders of magnitude smaller than the raw token stream, and the
  Zipf-head tokens ("the") fan out to at most one row per document
  rather than one per occurrence.
- The vocabulary is corpus-derived (token, count) — Zipf-skewed on the
  join key but tiny per entry; AQE's skew-join split handles the head.
  The N/V totals are a one-row aggregate, broadcast.
- Everything is built-in-function arithmetic over longs/doubles; no UDF.

No counterpart in the reference (structured sensor data); part of the
LLM-pipeline layer. Tokenization is shared with :mod:`llm.text` so the
DuckDB oracle splits identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import text as ltx


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, tok, tf) — per-document term frequencies via the materialized
    tokens column (empty/blank docs contribute no rows).

    The explicit null filter is subtree canonicalization, not semantics
    (split tokens are never NULL): every consumer join would push its
    own constraint-inferred ``isnotnull`` into its copy of this subtree
    while non-join consumers (the broadcast (N, V) stats aggregate)
    would not — divergent copies defeat AQE exchange reuse and
    re-tokenize the corpus once per branch (the NB-classifier fix,
    wave 4, measured on exactly this pattern)."""
    base = ltx.tokenized(df, text_col)
    return (
        base.select(F.col(id_col), F.explode("_toks").alias("tok"))
        .where(F.col(id_col).isNotNull() & F.col("tok").isNotNull())
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
    )


def unigram_vocab(tf: DataFrame) -> DataFrame:
    """(tok, cnt) corpus counts from a term-frequency frame."""
    return tf.groupBy("tok").agg(F.sum("tf").alias("cnt"))


def doc_nll(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document add-one-smoothed unigram NLL.

    nll(d) = Σ_t tf(d,t) · −ln((cnt(t)+1)/(N+V)) / Σ_t tf(d,t)

    Output: (id, n_tokens, nll rounded to 4dp), ordered by id. The
    ordering + rounding make the result hash-stable across engines and
    partitionings.
    """
    tf = term_frequencies(df, id_col, text_col)
    vocab = unigram_vocab(tf)
    stats = vocab.agg(
        F.sum("cnt").alias("_n"), F.count("*").alias("_v")
    )
    p = (F.col("cnt").cast("double") + 1.0) / (
        F.col("_n").cast("double") + F.col("_v").cast("double")
    )
    return (
        tf.join(vocab, "tok")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf").cast("double") * -F.log(p))
                / F.sum(F.col("tf").cast("double")),
                4,
            ).alias("nll"),
        )
        .orderBy(id_col)
    )


def encode_token_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 32,
) -> DataFrame:
    """Token→id encoding against the corpus's frequency-ranked
    vocabulary — the step between curated text and packed training
    sequences. Id 1 = most frequent token (ties break on token asc),
    0 = out-of-vocabulary.

    Output per doc: ``(id_col, n_tokens, n_oov, ids_fp)`` where
    ``ids_fp`` is the md5 of the space-joined id sequence in token
    order — a portable digest of the exact encoding (returning raw
    arrays would tie the contract to engine-specific list rendering).

    Scale shape: one (doc, pos, token) explode; vocab ranking is a
    window over the DISTINCT-token frame (vocabulary scale — Heaps'
    law; same fallback as vocab_coverage for a vocab that outgrows one
    partition); the encode join broadcasts the vocab, which is
    FIXED-SIZE by construction (``vocab_size`` rows — a legitimate
    hint, unlike corpus-fraction frames); per-doc reassembly is one
    groupBy shuffle on the doc key.
    """
    from pyspark.sql.window import Window

    toks = ltx.tokenized(df, text_col).select(
        F.col(id_col).alias("doc"), F.posexplode("_toks").alias("pos", "token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    vocab = counts.select(
        "token", F.row_number().over(w).alias("tid")
    ).filter(F.col("tid") <= vocab_size)
    enc = toks.join(F.broadcast(vocab), "token", "left").withColumn(
        "tid", F.coalesce(F.col("tid"), F.lit(0))
    )
    ids = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tid"))),
        lambda s: s["tid"].cast("string"),
    )
    return (
        enc.groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("tid") == 0, 1).otherwise(0)).alias("n_oov"),
            F.md5(F.concat_ws(" ", ids)).alias("ids_fp"),
        )
        .select(F.col("doc").alias(id_col), "n_tokens", "n_oov", "ids_fp")
        .orderBy(id_col)
    )


def bigram_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, a, b, bf) — per-document bigram frequencies (adjacent token
    pairs), TF-collapsed the same way as :func:`term_frequencies` so the
    corpus-count joins downstream see distinct (doc, pair) rows, never
    the raw instance stream. Docs with < 2 tokens contribute no rows."""
    base = ltx.tokenized(df, text_col)
    toks = F.col("_toks")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, (i + 1).cast("int")).alias("a"),
            F.element_at(toks, (i + 2).cast("int")).alias("b"),
        ),
    )
    # Explicit null filter for subtree canonicalization (see
    # term_frequencies — tokens are never NULL, so a/b never are): keeps
    # every consumer's copy of this subtree identical whether or not a
    # downstream join infers isnotnull(a)/isnotnull(b), so AQE exchange
    # reuse collapses the bigram pipeline to one evaluation per plan.
    return (
        base.filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(id_col, "_p.a", "_p.b")
        .where(
            F.col(id_col).isNotNull()
            & F.col("a").isNotNull()
            & F.col("b").isNotNull()
        )
        .groupBy(id_col, "a", "b")
        .agg(F.count("*").alias("bf"))
    )


def doc_bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Per-document interpolated-bigram NLL — one order of context
    beyond :func:`doc_nll`, which is what separates locally-scrambled
    text (bag-of-frequent-words spam scores WELL on a unigram model)
    from real prose:

    p(b | a) = λ·(C₂(a,b)+1)/(C₁(a)+V) + (1−λ)·(C₁(b)+1)/(N+V)

    nll(d) = Σ bf·−ln(p) / Σ bf over the document's bigram instances;
    docs with < 2 tokens drop out.

    Scale shape: per-doc bigram TF-collapse (map-side) → one join to
    corpus bigram counts on (a,b) — near-unique composite key, so no
    Zipf hot row survives the collapse — plus two vocabulary-scale
    unigram joins (AQE skew-split on the head) and a one-row (N,V)
    broadcast. Built-in arithmetic only; rounded to 4dp so the scores
    hash-verify cross-engine.
    """
    bf = bigram_frequencies(df, id_col, text_col)
    c2 = bf.groupBy("a", "b").agg(F.sum("bf").alias("c2"))
    tf = term_frequencies(df, id_col, text_col)
    vocab = unigram_vocab(tf)
    stats = vocab.agg(F.sum("cnt").alias("_n"), F.count("*").alias("_v"))
    ca = vocab.select(F.col("tok").alias("a"), F.col("cnt").alias("c1a"))
    cb = vocab.select(F.col("tok").alias("b"), F.col("cnt").alias("c1b"))
    p_bi = (F.col("c2").cast("double") + 1.0) / (
        F.col("c1a").cast("double") + F.col("_v").cast("double")
    )
    p_uni = (F.col("c1b").cast("double") + 1.0) / (
        F.col("_n").cast("double") + F.col("_v").cast("double")
    )
    p = F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni
    return (
        bf.join(c2, ["a", "b"])
        .join(ca, "a")
        .join(cb, "b")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum("bf").alias("n_bigrams"),
            F.round(
                F.sum(F.col("bf").cast("double") * -F.log(p))
                / F.sum(F.col("bf").cast("double")),
                4,
            ).alias("nll"),
        )
        .orderBy(id_col)
    )


def train_bigram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    materialize: bool = True,
) -> dict:
    """Freeze the interpolated-bigram model from a trusted corpus so it
    can score OTHER data (an incoming crawl drop, a stream) without
    retraining: :func:`doc_bigram_nll` trains and scores in one plan,
    which is right for the oracle-paired batch query but wrong for a
    monitor — the model must not drift with the data it judges.

    Returns ``{"c2", "vocab", "n", "v", "lam"}``: the corpus bigram and
    unigram count frames plus the (N, V) totals collected as two bounded
    scalars. The count frames are PERSISTED here (vocabulary-scale, they
    fit — and a scorer that joins them repeatedly, e.g. a streaming sink
    touching the model every micro-batch, must not re-run the training
    lineage each time). For a model that outlives the session, write it
    once per corpus version with :func:`write_lm_model` and score from
    :func:`read_lm_model` — then the joins scan a parquet artifact, not
    a lineage.

    ``materialize=False`` returns LAZY count frames for a model that
    will be consumed exactly once (train + score in a single plan, e.g.
    the oracle-paired held-out query): Catalyst fuses training into the
    scoring job and the persist/materialize jobs — pure overhead for a
    one-shot consumer — disappear (measured −39% on the held-out score
    at sf0.1, in-epoch A/B). Keep the default for anything that touches
    the model more than once.
    """
    tf = term_frequencies(df, id_col, text_col)
    vocab = unigram_vocab(tf)
    c2 = (
        bigram_frequencies(df, id_col, text_col)
        .groupBy("a", "b")
        .agg(F.sum("bf").alias("c2"))
    )
    if materialize:
        vocab = vocab.persist()
        c2 = c2.persist()
    row = vocab.agg(F.sum("cnt").alias("n"), F.count("*").alias("v")).first()
    if materialize:
        c2.count()  # materialize both frames; scoring never re-tokenizes
    return {"c2": c2, "vocab": vocab, "n": int(row.n), "v": int(row.v), "lam": lam}


def write_lm_model(model: dict, model_dir: str) -> None:
    """Persist a trained frozen-bigram model as a durable artifact:
    ``{model_dir}/c2`` and ``{model_dir}/vocab`` parquet plus a one-row
    ``{model_dir}/meta`` parquet carrying (n, v, lam). This is the
    "write once per corpus version" form: at 100 TB the counts are
    vocabulary-scale (Heaps' law — millions of rows, not corpus-scale),
    so the artifact is small, mergeable, and scanned — never retrained —
    by every scorer that loads it."""
    spark = model["c2"].sparkSession
    model["c2"].write.mode("overwrite").parquet(f"{model_dir}/c2")
    model["vocab"].write.mode("overwrite").parquet(f"{model_dir}/vocab")
    c33 = model.get("c33")
    c67 = model.get("c67")
    meta = spark.createDataFrame(
        [
            (
                int(model["n"]),
                int(model["v"]),
                float(model["lam"]),
                None if c33 is None else float(c33),
                None if c67 is None else float(c67),
            )
        ],
        "n long, v long, lam double, c33 double, c67 double",
    )
    meta.write.mode("overwrite").parquet(f"{model_dir}/meta")


def read_lm_model(spark, model_dir: str) -> dict:
    """Load a :func:`write_lm_model` artifact in any session. The count
    frames come straight off parquet, so a scorer's model joins are
    artifact scans with pushdown — no training lineage, no dependency on
    the corpus that produced them."""
    row = spark.read.parquet(f"{model_dir}/meta").first().asDict()
    model = {
        "c2": spark.read.parquet(f"{model_dir}/c2"),
        "vocab": spark.read.parquet(f"{model_dir}/vocab"),
        "n": int(row["n"]),
        "v": int(row["v"]),
        "lam": float(row["lam"]),
    }
    # Bucket cutoffs are an optional artifact extension (lm-train
    # --cutoffs); pre-extension artifacts simply lack the columns.
    for key in ("c33", "c67"):
        if row.get(key) is not None:
            model[key] = float(row[key])
    return model


def score_bigram_frozen(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document interpolated-bigram NLL against a FROZEN model.

    Same formula as :func:`doc_bigram_nll`, but the counts come from the
    trained model via LEFT joins (an unseen bigram or token scores at
    its smoothing floor instead of dropping the row — exactly what
    out-of-corpus text should do) and the (N, V) totals are plan
    literals. Scoring the training corpus itself reproduces
    ``doc_bigram_nll`` row for row (every pair hits the model), which is
    what pins the streaming twin to the batch query. Stateless per
    document, so it streams with zero state — see
    ``streaming/scoring.py``.
    """
    bf = bigram_frequencies(df, id_col, text_col)
    ca = model["vocab"].select(F.col("tok").alias("a"), F.col("cnt").alias("c1a"))
    cb = model["vocab"].select(F.col("tok").alias("b"), F.col("cnt").alias("c1b"))
    n, v = float(model["n"]), float(model["v"])
    p_bi = (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + 1.0) / (
        F.coalesce(F.col("c1a"), F.lit(0)).cast("double") + v
    )
    p_uni = (F.coalesce(F.col("c1b"), F.lit(0)).cast("double") + 1.0) / (n + v)
    p = F.lit(model["lam"]) * p_bi + F.lit(1.0 - model["lam"]) * p_uni
    return (
        bf.join(model["c2"], ["a", "b"], "left")
        .join(ca, "a", "left")
        .join(cb, "b", "left")
        .groupBy(id_col)
        .agg(
            F.sum("bf").alias("n_bigrams"),
            F.round(
                F.sum(F.col("bf").cast("double") * -F.log(p))
                / F.sum(F.col("bf").cast("double")),
                4,
            ).alias("nll"),
        )
        .orderBy(id_col)
    )


def ppl_cuts_frame(
    scored: DataFrame,
    nll_col: str = "nll",
    bin_width: float = 0.02,
) -> DataFrame:
    """One-row ``(c33, c67)`` tercile-cutoff frame for a scored corpus,
    derived from the fixed-width mergeable histogram grid (same rule as
    :func:`llm.sketches.hist_quantiles`): bin counts are a tiny
    aggregate, the cumulative walk runs over OCCUPIED bins only, and the
    cutoff is pure integer arithmetic on the grid — no sort, no exact
    global percentile, state O(distinct bins) at any corpus size. The
    single source of truth for bucket boundaries: the batch summary
    broadcasts this frame; a streaming scorer freezes its two scalars
    via :func:`ppl_cutoffs`."""
    from pyspark.sql import Window

    nll = F.col(nll_col)
    bins = (
        scored.select(F.floor(nll / F.lit(bin_width)).cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("_n"),
    )
    return cum.agg(
        *[
            (
                (
                    F.min(
                        F.when(
                            F.col("_cum")
                            >= -F.floor(F.lit(-q) * F.col("_n")),
                            F.col("bin"),
                        )
                    )
                    + 1
                ).cast("double")
                * F.lit(bin_width)
            ).alias(name)
            for name, q in (("c33", 1.0 / 3.0), ("c67", 2.0 / 3.0))
        ]
    )


def ppl_cutoffs(
    scored: DataFrame,
    nll_col: str = "nll",
    bin_width: float = 0.02,
) -> tuple[float, float]:
    """Collect the ``(c33, c67)`` cutoffs as two frozen scalars — a
    bounded one-row collect, the "train-time" half of the streaming
    bucketing twin (cutoffs come from the reference corpus once; every
    micro-batch then buckets against plan literals, exactly the
    frozen-vocabulary pattern of ``stateful.drift_stream``).

    Raises ``ValueError`` on an empty or all-null scored frame — the
    one-row aggregate yields null cutoffs there, and frozen-literal
    consumers must get a clear train-time error, not a ``TypeError``
    (or silently-null buckets) at scoring time."""
    row = ppl_cuts_frame(scored, nll_col, bin_width).first()
    if row is None or row.c33 is None or row.c67 is None:
        raise ValueError(
            "ppl_cutoffs: no non-null NLL scores to derive cutoffs from "
            "(empty training corpus?)"
        )
    return float(row.c33), float(row.c67)


def bucket_expr(nll, c33, c67):
    """head/middle/tail bucket label for an NLL value given the two
    cutoffs — shared by the batch summary (cutoffs as broadcast columns)
    and the streaming sink (cutoffs as frozen literals), so the two
    paths cannot diverge."""
    return (
        F.when(nll <= c33, "head").when(nll <= c67, "middle").otherwise("tail")
    )


def perplexity_buckets(
    scored: DataFrame,
    nll_col: str = "nll",
    bin_width: float = 0.02,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split a
    scored corpus into head / middle / tail terciles of language-model
    NLL, the partition CCNet uses to keep fluent text and down-sample
    the gibberish tail.

    The tercile cutoffs deliberately do NOT come from an exact global
    percentile (a sort or a memory-unbounded collect at corpus scale) —
    see :func:`ppl_cuts_frame`. The one-row cutoff frame is broadcast
    back onto the scored corpus — no second shuffle of the data, no
    global sort.

    Input: a frame from :func:`score_bigram_frozen` (or any per-doc
    score); output: one row per non-empty bucket with ``n_docs``,
    ``mean_nll`` (decimal-summed, partition-order-free), ``min_nll``,
    ``max_nll``.
    """
    nll = F.col(nll_col)
    # The scored frame feeds TWO branches (the histogram that derives the
    # cutoffs, then the bucket assignment) and Catalyst does not reuse the
    # scoring subtree across them — without a persist the whole corpus is
    # scored twice (the bigram explode is token-stream-scale; verified in
    # the physical plan). The persisted frame is one short row per
    # document — the cheapest possible branch point.
    scored = scored.persist()
    cuts = ppl_cuts_frame(scored, nll_col, bin_width)
    bucketed = scored.crossJoin(F.broadcast(cuts)).withColumn(
        "bucket", bucket_expr(nll, F.col("c33"), F.col("c67"))
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(nll.cast("decimal(12,4)")).cast("double") / F.count("*"),
                4,
            ).alias("mean_nll"),
            F.min(nll).alias("min_nll"),
            F.max(nll).alias("max_nll"),
        )
        .orderBy("bucket")
    )
