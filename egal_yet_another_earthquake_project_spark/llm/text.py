"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting (all JVM-side Catalyst expressions — no Python in the path).

Determinism contract: every operator here is reproducible bit-for-bit on
any cluster size (no RNG, no partition-order dependence), which is what
makes the DuckDB oracles in workloads possible and what a 100 TB dedup run
needs to be re-runnable.

Performance note: expressions that *reference tokens many times* (shingles,
per-feature profiles) must read a MATERIALIZED tokens column — an inline
``split()`` sub-expression gets re-evaluated per reference (O(tokens²) for
shingling; measured 10× slower at sf0.1). The projection boundary in
:func:`tokenized` / :func:`text_profile` is load-bearing: Catalyst's
CollapseProject keeps multi-referenced non-cheap aliases materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: ASCII-safe "BPE-ish" token pattern: word pieces, digit runs, single
#: punctuation — identical semantics in Java regex and RE2/DuckDB.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: Tiny language-marker stopword sets for the stopword language-ID
#: heuristic. Public common-word lists; ASCII-only so regex and collation
#: behave identically across engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "tr": ("ve", "bir", "bu", "icin", "ile", "da"),
}

#: English stopwords used by the quality score's stopword-ratio feature.
EN_STOPWORDS = LANG_MARKERS["en"] + ("for", "on", "with", "that", "this")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize(text: Column | str) -> Column:
    """Lowercase + whitespace-collapse + trim — canonical form for
    fingerprints and shingles."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def tokens_of_norm(norm: Column) -> Column:
    """Whitespace tokens of already-normalized text; blank → empty array."""
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def tokens(text: Column | str) -> Column:
    return tokens_of_norm(normalize(text))


def tokenized(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach materialized ``_norm`` and ``_toks`` columns — the required
    input shape for shingling/profiling at scale (see module note)."""
    out = df.withColumn("_norm", normalize(text_col))
    return out.withColumn("_toks", tokens_of_norm(F.col("_norm")))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via regexp_extract_all on the BPE-ish
    pattern — the cheap stand-in for a real BPE tokenizer's length signal."""
    return F.size(F.regexp_extract_all(normalize(text), F.lit(BPE_ISH_PATTERN), 0))


def _count_in(arr: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(arr, lambda t: t.isin(*words)))


def _stopword_ratio_of(toks: Column, stopwords: tuple[str, ...]) -> Column:
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        _count_in(toks, stopwords).cast("double") / F.size(toks)
    )


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return _stopword_ratio_of(tokens(text), stopwords)


def _mean_token_length_of(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def mean_token_length(text: Column | str) -> Column:
    return _mean_token_length_of(tokens(text))


def _punct_ratio_of(norm: Column) -> Column:
    stripped = F.regexp_replace(norm, r"[a-z0-9\s]", "")
    return F.when(F.length(norm) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(norm)
    )


def punct_ratio(text: Column | str) -> Column:
    return _punct_ratio_of(normalize(text))


def _quality_of(norm: Column, toks: Column) -> Column:
    n = F.size(toks).cast("double")
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    mtl = _mean_token_length_of(toks)
    mtl_score = F.when((mtl >= 3.0) & (mtl <= 10.0), 1.0).otherwise(0.5)
    sw = _stopword_ratio_of(toks, EN_STOPWORDS)
    sw_score = F.when((sw >= 0.01) & (sw <= 0.6), 1.0).otherwise(0.3)
    punct_score = F.when(_punct_ratio_of(norm) <= 0.2, 1.0).otherwise(0.4)
    return F.round(
        0.4 * len_score + 0.2 * mtl_score + 0.2 * sw_score + 0.2 * punct_score, 4
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane mean token
    length, some-but-not-too-many stopwords, low punctuation. Fixed-weight,
    deterministic — the analog of C4/Gopher-style rule filters."""
    return _quality_of(normalize(text), tokens(text))


#: Gopher rule-filter stopword set (Rae et al. 2021, appendix A1.1): a doc
#: must contain at least two DISTINCT words from this list to pass.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Per-document Gopher rule-filter flags (Rae et al. 2021, A1.1).

    Unlike :func:`quality_score`'s blended scalar, this keeps each rule as
    its own boolean so a curation run can report WHICH gate rejects — the
    shape the published pipeline uses. Rules (adapted to the whitespace
    tokenizer shared with the oracles):

    - ``ok_wc``    token count in [min_tokens, max_tokens]
    - ``ok_mwl``   mean token length in [3, 10]
    - ``ok_sym``   symbol-to-token ratio ('#' chars + '...' runs) <= 0.1
    - ``ok_alpha`` >= 80% of tokens contain an alphabetic character
    - ``ok_stop``  >= 2 distinct :data:`GOPHER_STOPWORDS` present
    - ``passes``   conjunction of the above

    All flags are single-pass Catalyst expressions over one materialized
    tokens column — no shuffle, no Python; at 100 TB this is a map-only
    stage fused into the scan. Every count is integer and every ratio is
    an IEEE-double of integer operands, so flags are bit-identical across
    engines (the oracle mirrors each rule in DuckDB list functions).
    """
    base = tokenized(df, text_col)
    toks, norm = F.col("_toks"), F.col("_norm")
    n = F.size(toks)
    nd = n.cast("double")
    mwl = _mean_token_length_of(toks)
    hash_chars = F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit("")))
    ellipses = (
        F.length(norm) - F.length(F.replace(norm, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(toks, w),
        )
    )
    return base.select(
        id_col,
        n.alias("n_tokens"),
        ((n >= min_tokens) & (n <= max_tokens)).alias("ok_wc"),
        ((mwl >= 3.0) & (mwl <= 10.0)).alias("ok_mwl"),
        F.when(n == 0, F.lit(False))
        .otherwise((hash_chars + ellipses).cast("double") / nd <= 0.1)
        .alias("ok_sym"),
        F.when(n == 0, F.lit(False))
        .otherwise(alpha.cast("double") / nd >= 0.8)
        .alias("ok_alpha"),
        (stop_hits >= 2).alias("ok_stop"),
        *[c for c in df.columns if c not in (id_col, text_col)],
    ).withColumn(
        "passes",
        F.col("ok_wc")
        & F.col("ok_mwl")
        & F.col("ok_sym")
        & F.col("ok_alpha")
        & F.col("ok_stop"),
    )


def _lang_id_of(toks: Column) -> Column:
    scores = {lang: _count_in(toks, markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(scores)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    expr: Column = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def lang_id(text: Column | str) -> Column:
    """Stopword-marker language ID: argmax marker-hit count, 'und' when no
    marker hits. Ties resolve in fixed key order (en, de, tr)."""
    return _lang_id_of(tokens(text))


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text. Identical
    normalization ⇒ identical fingerprint ⇒ exact-dedup key."""
    return F.md5(normalize(text))


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a MATERIALIZED tokens column (see module
    note); texts shorter than n words yield one joined shingle."""
    return F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Inline shingles — convenience for small frames ONLY. At scale go
    through :func:`tokenized` + :func:`shingles_of_tokens` (O(tokens²)
    re-evaluation otherwise)."""
    return shingles_of_tokens(tokens(text), n)


def exploded_shingles(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc, sh) rows via the materialized-tokens path — the scale-correct
    shingle producer used by dedup."""
    return tokenized(df, text_col).select(
        F.col(id_col).alias("doc"),
        F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("sh"),
    )


def simhash64(text: Column | str, num_shingle_words: int = 3) -> Column:
    """64-bit SimHash over word shingles — the scale-path near-dup
    signature. xxhash64 per shingle, per-bit majority vote, all inside one
    Catalyst expression tree (engine-native; the oracle-paired variant is
    the md5-digit simhash32 in workloads_llm). At scale, pass a
    materialized shingle-array column via ``shingles_col`` (see module
    note)."""
    sh = shingles(text, num_shingle_words)
    return simhash64_of_shingles(sh)


def simhash64_of_shingles(sh: Column) -> Column:
    hashes = F.transform(sh, lambda s: F.xxhash64(s))

    def voter(bit: int):
        mask = F.lit(1 << bit) if bit < 63 else F.lit(-(1 << 63))
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    out: Column = F.lit(0).cast("long")
    for b in range(64):
        votes = F.aggregate(hashes, F.lit(0).cast("long"), voter(b))
        out = out + F.when(
            votes >= 0, F.lit(1 << b) if b < 63 else F.lit(-(1 << 63))
        ).otherwise(0)
    return out


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))


def simhash32_frame(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc, simhash) frame of oracle-portable 32-bit SimHashes: bit i of
    a shingle = parity of hex digit i of md5(shingle); per-bit majority
    vote over the shingle multiset. Exists verbatim in any SQL engine
    (the engine-native fast path is :func:`simhash64`).

    Single pass over the shingle hashes: one ``aggregate`` carrying a
    32-wide vote-array accumulator (``zip_with`` add per hash), then a
    weighted fold to the integer signature — vs 32 separate aggregate
    traversals of the hash array, measured 14× slower for identical
    values. The shingle md5s are materialized once behind a projection
    (module CSE rule)."""
    base = tokenized(df, text_col).select(
        F.col(id_col).alias("doc"), shingles_of_tokens(F.col("_toks"), n).alias("_sh")
    )
    base = base.select(
        "doc", F.transform(F.col("_sh"), lambda s: F.md5(s)).alias("_hs")
    )
    odd = ("1", "3", "5", "7", "9", "b", "d", "f")

    def bits(h: Column) -> Column:
        chars = F.slice(F.split(h, ""), 1, 32)
        return F.transform(chars, lambda c: F.when(c.isin(*odd), 1).otherwise(-1))

    votes = F.aggregate(
        F.col("_hs"),
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(acc, bits(h), lambda a, b: a + b),
    )
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(32)])
    sim = F.aggregate(
        F.zip_with(
            votes,
            weights,
            lambda v, w: F.when(v >= 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return base.select("doc", sim.alias("simhash"))


#: Polynomial k-gram hash family: base and Mersenne modulus. MOSS's own
#: scheme uses exactly such rolling hashes; unlike md5 the hash is pure
#: integer arithmetic (8 multiply-adds per gram vs a digest + hex
#: render), the fingerprint is a LONG instead of a 32-char string (4×
#: less shuffle in the inverted-index join), and it is just as
#: engine-portable — the DuckDB oracles embed the same weights.
#: Measured at sf0.1: the fingerprint pass dropped 3.8 s → ~1 s.
POLY_B = 257
POLY_M = (1 << 31) - 1


def _poly_weights(k: int) -> list[int]:
    """B^(k−1−t) mod M for t = 0..k−1 — per-position weights, so a gram
    hash is one weighted sum instead of a recurrence (recurrences don't
    express in either engine's list_transform)."""
    return [pow(POLY_B, k - 1 - t, POLY_M) for t in range(k)]


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash winnowing fingerprints (the MOSS scheme, Schleimer et
    al. '03): hash every character ``k``-gram of the normalized text, keep
    the minimum hash of each ``window`` of consecutive k-grams, distinct.

    Shared fingerprints ⇒ shared substrings ≥ k chars — a
    position-robust containment/plagiarism signal that exact/minhash
    dedup misses. Hash = polynomial over char codes mod 2³¹−1 (integer
    math, portable to the SQL oracle; per-term code·weight ≤ 2³⁸ so the
    8-term sum never overflows a long); the k-gram hash array is
    materialized before the window pass (module note). Texts shorter
    than ``k`` are right-padded with spaces to one full gram.
    Output: ``(id, fp)`` rows, fp long.
    """
    w = _poly_weights(k)
    base = df.select(
        F.col(id_col).alias("doc"), normalize(text_col).alias("_norm")
    ).select(
        "doc",
        F.when(
            F.length("_norm") < k, F.rpad("_norm", k, " ")
        ).otherwise(F.col("_norm")).alias("_nm"),
    )
    codes = base.select(
        "doc",
        F.transform(F.split("_nm", ""), lambda c: F.ascii(c).cast("long")).alias(
            "_c"
        ),
    )

    def gram(i):
        total = F.element_at("_c", (i + 1).cast("int")) * F.lit(w[0])
        for t in range(1, k):
            total = total + F.element_at("_c", (i + 1 + t).cast("int")) * F.lit(
                w[t]
            )
        return total % F.lit(POLY_M)

    grams = codes.select(
        "doc",
        F.transform(F.sequence(F.lit(0), F.size("_c") - k), gram).alias("_h"),
    )
    wins = grams.select(
        "doc",
        F.when(F.size("_h") <= window, F.array(F.array_min("_h"))).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size("_h") - window),
                lambda j: F.array_min(F.slice(F.col("_h"), j + 1, window)),
            )
        ).alias("_w"),
    )
    return wins.select("doc", F.explode(F.array_distinct("_w")).alias("fp"))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text-analysis signals in one pass over materialized norm/tokens:
    token counts, quality features, language guess, fingerprint."""
    base = tokenized(df, text_col)
    norm, toks = F.col("_norm"), F.col("_toks")
    return base.select(
        *df.columns,
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(BPE_ISH_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.round(_mean_token_length_of(toks), 4).alias("mean_token_len"),
        F.round(_stopword_ratio_of(toks, EN_STOPWORDS), 4).alias("stopword_ratio"),
        F.round(_punct_ratio_of(norm), 4).alias("punct_ratio"),
        _quality_of(norm, toks).alias("quality"),
        _lang_id_of(toks).alias("lang_guess"),
        F.md5(norm).alias("fingerprint"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    information-density quality signal (Shannon 1948 applied to corpus
    filtering à la Gopher's repetition rules): template/boilerplate
    docs re-use few tokens (low entropy), natural prose spreads mass
    across its vocabulary (entropy near ln of the type count).

    entropy(d) = ln(n) − Σ_t tf·ln(tf) / n over the doc's term
    frequencies (n = token count) — computed from the TF-collapsed
    frame, so the aggregate sees distinct (doc, token) rows, never the
    raw token stream (same scale shape as :func:`..lm.doc_nll`). Docs
    with zero tokens contribute no rows (same contract as
    ``term_frequencies``). Output: (id, n_tokens, n_types, entropy
    rounded 4dp), ordered by id.
    """
    from egal_yet_another_earthquake_project_spark.llm.lm import (
        term_frequencies,
    )

    tf = term_frequencies(df, id_col, text_col)
    n = F.sum("tf").cast("double")
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.round(
                F.log(n)
                - F.sum(F.col("tf").cast("double") * F.log(F.col("tf").cast("double")))
                / n,
                4,
            ).alias("entropy"),
        )
        .orderBy(id_col)
    )


def zipf_slope(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Per-group Zipf exponent estimate — the corpus-health diagnostic
    (Zipf 1949; natural language runs α ≈ 1): OLS slope of ln(freq) on
    ln(rank) over each group's ``top_k`` most frequent tokens, reported
    as α = −slope. Machine-generated or keyword-stuffed sources bend
    the rank-frequency line visibly away from the corpus norm.

    Scale shape: one token-count aggregate (vocabulary scale per
    group), a rank window PARTITIONED by the group key (never a global
    sort), the ``top_k`` cut, then a closed-form per-group slope
    (covar_pop/var_pop — two partial-aggregable moments, no iteration).
    Ties rank deterministically (count desc, token asc) so the result
    hash-verifies cross-engine. A single-token group has zero rank
    variance → null α, matching SQL ``regr_slope``. Output:
    (by, n_ranked, alpha rounded 4dp), ordered by the group key.
    """
    counts = (
        tokenized(df, text_col)
        .select(F.col(by), F.explode("_toks").alias("tok"))
        .groupBy(by, "tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(by).orderBy(F.col("cnt").desc(), F.col("tok").asc())
    ranked = counts.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= top_k
    )
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("cnt").cast("double"))
    return (
        ranked.groupBy(by)
        .agg(
            F.count("*").alias("n_ranked"),
            F.round(-F.covar_pop(lx, ly) / F.var_pop(lx), 4).alias("alpha"),
        )
        .orderBy(by)
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap
    (stride < size) — the chunking pass that turns long documents into
    training-context-sized pieces. Pure Catalyst: chunk starts come from
    ``sequence`` over the materialized token array and fan out via
    ``posexplode``, so the operator is embarrassingly partition-parallel
    (no shuffle at all; output co-partitioned with input docs).

    A document with no tokens yields one empty chunk (chunk_id 0) so every
    input id survives into the output — droppable downstream by
    ``n_chunk_tokens > 0``.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    base = tokenized(df, text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_toks") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_start") + 1, size)
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"),
    )


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token and
    distinct-bigram ratios plus the mass fraction of the single most
    frequent token/bigram. High top-fractions or low distinct ratios mark
    boilerplate and degenerate (looping) text.

    One shuffle does all four signals: tokens and bigrams are tagged
    ('t|' / 'b|') into ONE exploded gram stream, counted per (doc, gram),
    then folded per doc with conditional aggregates — instead of two
    separate explode+group pipelines over the same text.
    """
    base = tokenized(df, text_col)
    toks = F.col("_toks")
    bigrams = shingles_of_tokens(toks, 2)
    grams = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.concat(
                F.transform(toks, lambda t: F.concat(F.lit("t|"), t)),
                F.transform(bigrams, lambda b: F.concat(F.lit("b|"), b)),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    is_tok = F.col("gram").startswith("t|")
    tok_cnt = F.when(is_tok, F.col("cnt")).otherwise(0)
    big_cnt = F.when(is_tok, 0).otherwise(F.col("cnt"))
    folded = counts.groupBy("doc_id").agg(
        F.sum(tok_cnt).alias("_tt"),
        F.sum(F.when(is_tok, 1).otherwise(0)).alias("_td"),
        F.max(tok_cnt).alias("_tm"),
        F.sum(big_cnt).alias("_bt"),
        F.sum(F.when(is_tok, 0).otherwise(1)).alias("_bd"),
        F.max(big_cnt).alias("_bm"),
    )

    def ratio(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den == 0, F.lit(0.0)).otherwise(num.cast("double") / den), 4
        )

    return folded.select(
        "doc_id",
        F.col("_tt").alias("n_tokens"),
        ratio(F.col("_td"), F.col("_tt")).alias("distinct_token_ratio"),
        ratio(F.col("_tm"), F.col("_tt")).alias("top_token_frac"),
        F.col("_bt").alias("n_bigrams"),
        ratio(F.col("_bd"), F.col("_bt")).alias("distinct_bigram_ratio"),
        ratio(F.col("_bm"), F.col("_bt")).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# UDTF escape hatch (§2.10 surface demonstration)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - decorator import only
    from pyspark.sql.functions import udtf as _udtf
except ImportError:  # pragma: no cover
    _udtf = None


if _udtf is not None:

    @_udtf(returnType="sent_id int, sentence string")
    class SplitSentences:
        """Python UDTF (one row in → N rows out) splitting text into
        trimmed sentences on ``.!?`` boundaries.

        This exists to demonstrate the sanctioned table-function escape
        hatch — per-row Python with a declared row-set schema, usable
        from SQL via ``LATERAL``. For this particular job the Catalyst
        path (``posexplode(split(text, '[.!?]'))``) is strictly faster
        at scale (JVM-side, codegen'd); reach for a UDTF only when the
        expansion logic genuinely needs Python (a tokenizer library, a
        parser). Register: ``spark.udtf.register("split_sentences",
        SplitSentences)``.
        """

        def eval(self, text: str):  # noqa: D102 - contract method
            if not text:
                return
            import re

            i = 0
            for raw in re.split(r"[.!?]+", text):
                s = raw.strip()
                if s:
                    yield i, s
                    i += 1


def compression_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic corpus-quality
    signal the regex/ratio heuristics can't see (Gopher's repetition
    rules and RefinedWeb both gate on it): natural prose compresses
    ~2.5-3.5×, boilerplate/templates far more, near-random bytes barely
    at all, so both tails of the ratio distribution are removal
    candidates.

    zlib is not expressible in Catalyst, so this is the sanctioned
    Python escape hatch done right: Arrow-batched ``mapInPandas``
    (never a row-at-a-time UDF), a pure projection — no shuffle, output
    co-partitioned with the input, composes with any scan. DEFLATE with
    a fixed ``level`` is deterministic for a given zlib build, so the
    column is stable across runs/partitionings; it has no SQL-engine
    twin, which is why this operator is test-pinned rather than
    oracle-declared (the one capability class where the driver's weaker
    rows-only check would apply).

    Output: ``id_col, n_bytes, n_compressed, ratio`` (ratio rounded 4;
    empty text → ratio 0.0).
    """
    import zlib

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_bytes", T.IntegerType(), False),
            T.StructField("n_compressed", T.IntegerType(), False),
            T.StructField("ratio", T.DoubleType(), False),
        ]
    )

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            raw = [t.encode("utf-8") if t else b"" for t in pdf[text_col]]
            n_bytes = [len(b) for b in raw]
            n_comp = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "ratio": [
                        round(nb / nc, 4) if nb else 0.0
                        for nb, nc in zip(n_bytes, n_comp)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, out_schema)


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ". ",
) -> DataFrame:
    """Strip repeated sentences/lines WITHIN each document, keeping the
    first occurrence in order — the intra-document half of deduplication
    (RefinedWeb's line-dedup pass; boilerplate headers/footers and
    crawler echo repeat inside a page long before they repeat across
    pages).

    ``array_distinct`` preserves first-occurrence order in Spark, so the
    whole pass is one per-row array expression — no explode, no
    shuffle, scan-speed. Output: ``id_col, n_units, n_kept,
    cleaned_text``.
    """
    import re as _re

    # Spark's split() takes a REGEX; the separator is a literal.
    units = F.split(F.col(text_col), _re.escape(sep), -1)
    kept = F.array_distinct(units)
    return df.select(
        id_col,
        F.size(units).alias("n_units"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, sep).alias("cleaned_text"),
    )
