"""Deterministic distributed sketches: KMV cardinality, count-min counts.

A 100 TB pipeline cannot afford exact `count(DISTINCT)` or exact
per-token counts on every probe — but the usual sketch libraries
(HyperLogLog, datasketches) are engine-private: two engines disagree in
the last few percent, so their outputs can never be hash-verified
against an independent oracle. These sketches are built instead from the
md5-derived hash family the rest of the package already uses — every
operation exists verbatim in any SQL engine, so the *estimates
themselves* are reproducible bit-for-bit across engines, partitionings,
and runs, and the driver's DuckDB gate can check them exactly.

* :func:`kmv_distinct` — K-Minimum-Values cardinality estimator
  (Bar-Yossef et al. 2002): keep the k smallest hash values per group;
  with the k-th smallest at normalized position u, the unbiased distinct
  estimate is (k−1)/u. Bounded state (k longs/group), mergeable
  (union = min-merge of two KMV sets), one shuffle.
* :func:`cms_build` / :func:`cms_estimate` — count-min sketch (Cormode &
  Muthukrishnan 2005): d independent hash rows of w buckets accumulate
  counts; a key's estimate is the min over its d buckets — an
  overestimate with error ≤ εN at probability 1−δ for w = e/ε, d =
  ln(1/δ). The sketch is d·w longs regardless of corpus size and is
  mergeable by element-wise +, which is what makes frequency tracking
  over an unbounded token stream feasible.
* :func:`hll_registers` / :func:`hll_distinct` — HyperLogLog (Flajolet
  et al. 2007): m = 2^p registers each hold the max leading-zero rank ρ
  of the hashes routed to that bucket; the harmonic-mean estimate has
  RSE ≈ 1.04/√m (~3.3% at m=1024 — KMV needs k≈1000 mins for the same,
  HLL needs 1024 *bytes* in a real register encoding). Unlike KMV no
  distinct pre-pass is needed (max over occurrences = max over the
  distinct set), so the only shuffle carries ≤ partitions·m partial-max
  rows. The ρ sum is folded through exact integer arithmetic
  (Σ2^(K−ρ) at K=40) so the estimate is bit-identical across engines;
  the one ln() in the small-range linear-counting branch is the sole
  libm call, on a well-separated argument.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 2^32 — the md5-prefix hash space; normalizing by it maps hashes to (0, 1].
_HASH_SPACE = float(1 << 32)


def _h32(c: Column, salt: str = "") -> Column:
    """First 32 md5 bits of (salt‖value) as a long in [0, 2^32) — the
    engine-portable uniform hash used across the package."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Plan: distinct (group, value) → hash → per-group rank → keep the
    k-th row. Groups with fewer than k distinct values report the exact
    count (their sketch never filled — KMV degrades gracefully to
    exact). Output: group_cols + ``est_distinct`` (double, rounded 2)
    + ``exact_distinct`` (the true count, carried so estimator quality
    is visible and testable).

    Scale: the distinct and the window shuffle on the same group key, so
    this is two passes of one partitioning. At extreme group width swap
    the window for a per-partition top-k merge (the sketch is mergeable
    by construction); estimate quality: RSE ≈ 1/√(k−2) ≈ 12.7% at k=64.
    """
    hv = (_h32(F.col(value_col)) + 1).alias("_hv")  # +1: (0, 2^32], avoids u=0
    d = df.select(*group_cols, value_col).distinct().select(*group_cols, hv, value_col)
    w = Window.partitionBy(*group_cols).orderBy(F.col("_hv").asc(), F.col(value_col).asc())
    wc = Window.partitionBy(*group_cols)
    ranked = d.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_cnt", F.count("*").over(wc)
    )
    kth = ranked.filter(F.col("_rn") == F.least(F.lit(k), F.col("_cnt")))
    est = F.when(F.col("_cnt") < k, F.col("_cnt").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_hv").cast("double")
    )
    return kth.select(
        *group_cols,
        F.round(est, 2).alias("est_distinct"),
        F.col("_cnt").cast("long").alias("exact_distinct"),
    )


def _bucket_fn(hash_family: str, width: int):
    """Row j's bucket assignment under the chosen hash family.

    ``"md5"`` is the engine-portable family — required wherever the
    sketch CONTENTS are part of the oracle-checked result
    (cms_token_counts, the streaming twin). ``"xxhash64"`` is the cheap
    JVM-native family for uses where the sketch is only an internal
    pruning device whose false positives a later exact pass removes
    (cms_heavy_hitters) — there the hash values never surface, so
    portability buys nothing and the salted-md5 digest per (row, hash)
    is pure overhead."""
    if hash_family == "md5":
        return lambda c, j: _h32(c, f"cms{j}|") % width
    if hash_family == "xxhash64":
        return lambda c, j: F.pmod(F.xxhash64(c, F.lit(j)), F.lit(width))
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Build a count-min sketch from an item stream (one row per
    occurrence, or per (key, weight) with ``weight_col``).

    Each occurrence lands in ``depth`` buckets — hash row j uses the
    salted hash md5('cms{j}|'‖key) mod width — and the sketch is the
    (j, bucket) → total count table: ``depth·width`` rows no matter how
    large the input. The explode-to-depth rows happen map-side and
    partially aggregate before the only shuffle, which carries at most
    partitions·depth·width rows.
    """
    bucket = _bucket_fn(hash_family, width)
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(F.col(key_col), j).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_jb"),
        wcol.alias("_w"),
    )
    return (
        rows.select("_jb.j", "_jb.bucket", "_w")
        .groupBy("j", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each probe key's count from a built sketch: min over the
    key's ``depth`` buckets. The sketch is tiny (d·w rows) and is
    broadcast; probes never shuffle. Missing buckets count 0 (a key the
    sketch never saw estimates 0 unless every one of its buckets
    collided). Output: probe columns + ``est_count``."""
    pb = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (_h32(F.col(key_col), f"cms{j}|") % width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_jb"),
    ).select("*", "_jb.j", "_jb.bucket").drop("_jb")
    joined = pb.join(F.broadcast(sketch), ["j", "bucket"], "left").withColumn(
        "_c", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return (
        joined.groupBy(key_col)
        .agg(F.min("_c").alias("est_count"))
    )


def hll_rho(c: Column, p: int) -> tuple[Column, Column]:
    """(bucket, ρ) for one value under the md5 hash family.

    The 32-bit hash splits as bucket = h mod 2^p and w = h div 2^p; ρ is
    the number of leading zeros of w in its (32−p)-bit window plus one,
    i.e. ``33 − p − bitlength(w)`` (and 33 − p when w = 0). Bit length is
    taken as the length of the minimal base-2 string — `conv(…, 10, 2)`
    here, `bin()` in DuckDB — which both engines render identically, so
    ρ itself is engine-portable integer math.
    """
    h = _h32(c)
    m = 1 << p
    bucket = (h % m).alias("bucket")
    w = F.floor(h / m).cast("long")
    bits = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(33 - p)).otherwise(F.lit(33 - p) - bits)
    return bucket, rho.cast("int").alias("rho")


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 10
) -> DataFrame:
    """Per-group HLL register table: (group_cols…, bucket, M=max ρ).

    One shuffle, map-side partial max, ≤ 2^p rows per group regardless
    of input size. Mergeable by per-bucket max — unioning two corpora's
    register tables and re-maxing equals sketching the union, which is
    what makes incremental / cross-shard cardinality tracking free.
    """
    bucket, rho = hll_rho(F.col(value_col), p)
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("M"))
    )


#: Fold exponent for the exact-integer harmonic sum: ρ ≤ 33 < K, and
#: m·2^K ≤ 2^10·2^40 = 2^50 fits a long with room to spare.
_HLL_K = 40


def hll_estimate(regs: DataFrame, group_cols: list[str], p: int = 10) -> DataFrame:
    """Distinct-count estimate from a register table.

    The harmonic sum Σ 2^−M_j (absent buckets contribute 2^0 = 1) is
    computed as the exact integer T = Σ 2^(K−M_j) + (m − present)·2^K,
    so E_raw = α_m·m²·2^K / T is one double division of two exact
    integers — bit-identical on any engine. Below the 2.5m small-range
    threshold with empty buckets left, the standard linear-counting
    branch m·ln(m/V) applies instead. Output: group_cols +
    ``est_distinct`` (double, rounded 2).
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    t_term = F.pow(F.lit(2.0), F.lit(_HLL_K) - F.col("M")).cast("long")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(t_term).alias("_tp"),
        F.count("*").alias("_present"),
    )
    two_k = 1 << _HLL_K
    t = F.col("_tp") + (F.lit(m) - F.col("_present")) * F.lit(two_k)
    v_zero = (F.lit(m) - F.col("_present")).cast("double")
    e_raw = F.lit(alpha * m * m * float(two_k)) / t.cast("double")
    e_lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero)
    est = F.when((e_raw <= 2.5 * m) & (v_zero > 0), e_lin).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 2).alias("est_distinct"))


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 10
) -> DataFrame:
    """HLL distinct estimate per group, with the exact count alongside
    (the exact pass exists for quality visibility in the declared query;
    the sketch itself never needs it). Output: group_cols +
    ``est_distinct`` + ``exact_distinct``."""
    est = hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    return est.join(exact, group_cols)


def cms_heavy_hitters(
    items: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 8192,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Exact counts of every key occurring ≥ ``min_count`` times,
    without a full-keyspace shuffle.

    The straight formulation (groupBy → HAVING) partially aggregates
    map-side, but with a near-unique key space (5-gram shingles, URLs —
    the 100 TB norm) partial aggregation barely collapses anything and
    the exchange still carries ~|keys| rows. Here the count-min sketch
    gates the shuffle instead:

    1. one bounded pass builds the d×w sketch (≤ partitions·d·w rows);
    2. each item row looks up its d buckets via d broadcast joins —
       map-side, no exchange — and is dropped unless EVERY bucket
       reached ``min_count``. CMS never underestimates, so no true
       heavy hitter is dropped (no false negatives);
    3. the exact count + HAVING runs over surviving rows only — the
       one keyspace-scale exchange carries candidate keys' occurrences,
       a vanishing fraction under a Zipfian key distribution.

    Result is bit-identical to the straight formulation (step 3 removes
    the sketch's false positives), which is how the declared query
    hash-verifies against a plain GROUP BY/HAVING oracle.
    """
    bucket = _bucket_fn(hash_family, width)
    with_buckets = items.select(
        F.col(key_col),
        *[bucket(F.col(key_col), j).alias(f"_b{j}") for j in range(depth)],
    )
    # Materialize the (tiny, ≤ d·w rows) sketch ONCE: each of the d
    # broadcast legs below references it, and without the checkpoint
    # every leg would re-run the full corpus aggregation.
    sketch = cms_build(
        items, key_col, depth, width, None, hash_family=hash_family
    ).localCheckpoint(eager=True)
    gated = with_buckets
    for j in range(depth):
        row = (
            sketch.filter(F.col("j") == j)
            .select(F.col("bucket").alias(f"_b{j}"), F.col("cnt").alias(f"_c{j}"))
        )
        gated = gated.join(F.broadcast(row), f"_b{j}")
    cand = gated.filter(
        F.least(*[F.col(f"_c{j}") for j in range(depth)]) >= min_count
    )
    return (
        cand.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def hist_bins(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bin_width: float = 0.5,
) -> DataFrame:
    """Fixed-width histogram bins per group: ``(group..., bin, cnt)``
    with ``bin = floor(value / bin_width)``.

    The quantile-sketch member of the family (KMV=cardinality,
    CMS=frequency, HLL=registers, histogram=quantiles): state per group
    is the occupied-bin set — bounded by value-range/bin_width
    regardless of row count — and MERGEABLE by plain per-bin addition,
    which is what lets shards (or stream micro-batches) combine with no
    accuracy loss beyond the fixed grid. One map-side-combined shuffle.
    Bin assignment is exact integer math on the fixed grid, so estimates
    replay bit-identically in any SQL engine (unlike t-digest/GK whose
    merge order is engine-private).
    """
    bin_col = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    return (
        df.groupBy(*group_cols, bin_col.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bin_width: float = 0.5,
) -> DataFrame:
    """Per-group quantile estimates from the fixed-width histogram.

    The q-quantile estimate is the UPPER EDGE ``(bin+1)·bin_width`` of
    the first bin (ascending) whose running count reaches
    ``ceil(q·n)`` — a conservative, deterministic rule: the true
    quantile lies within one bin_width below the estimate, and every
    engine lands on the same bin because the rule is pure integer
    arithmetic on the grid.

    Plan: bins (one shuffle) → per-group cumulative window over the
    OCCUPIED bins only (range/bin_width rows per group, dimension-scale
    — never the input rows) → one row per group. Output columns:
    ``group..., n, p<q> for each q`` (e.g. p50, p90, p99), estimates
    rounded to 4.
    """
    bins = hist_bins(df, group_cols, value_col, bin_width)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bins.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("_n"),
    )
    aggs = [F.max("_n").alias("n")]
    for q in qs:
        # round, not int: int() truncates IEEE error (0.29*100 ->
        # 28.999… -> "p28"); round lands on the requested label for any q
        name = f"p{round(q * 100)}"
        # target rank ceil(q*n) in pure integer math: ceil(a/b) = -floor(-a/b)
        target = -F.floor(F.lit(-q) * F.col("_n"))
        hit_bin = F.min(F.when(F.col("_cum") >= target, F.col("bin")))
        aggs.append(
            F.round((hit_bin + 1) * F.lit(bin_width), 4).alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def kmv_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch as a SORTED ARRAY of the k smallest distinct
    value-hashes — the materialized form the set-algebra estimators
    consume. ``(group, _arr)``; collect_list is bounded at k elements
    per group by the rank filter that precedes it."""
    hv = (_h32(F.col(value_col)) + 1).alias("_hv")
    d = (
        df.select(group_col, value_col)
        .distinct()
        .select(group_col, hv)
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("_hv")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("_hv")).alias("_arr"))
    )


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    audit: bool = False,
) -> DataFrame:
    """Pairwise set-overlap estimates between groups from their KMV
    sketches — the sketch ALGEBRA that replaces pairwise
    count(DISTINCT)-intersection joins at 100 TB (Beyer et al. 2007,
    "On synopses for distinct-value estimation under multiset
    operations").

    For groups A, B with k-min sketches A_k, B_k:

    * union sketch  S = k smallest of A_k ∪ B_k (= k smallest of A ∪ B,
      the KMV closure property);
    * union estimate U from S's k-th value (exact when |A ∪ B| < k —
      the sketches never filled);
    * Jaccard estimate J = |S ∩ A_k ∩ B_k| / |S|;
    * intersection estimate = J · U.

    All array math on ≤ k-element arrays over a #groups² pair frame —
    the corpus is touched ONCE (sketch build); pairs cost nothing more.
    md5-deterministic, so the estimates themselves hash-verify against
    the oracle.

    ``audit=True`` additionally carries ``exact_intersection`` computed
    by a value self-equi-join — the corpus-scale pass the sketch exists
    to replace. It is GATED OFF by default so the production plan scans
    the corpus exactly once (asserted in
    tests/test_sketch_ops.py::test_kmv_overlap_default_scans_corpus_once);
    turn it on only for estimator-quality validation at test scale.
    """
    sk = kmv_sketches(df, group_col, value_col, k)
    # Pair generation WITHOUT a sketch self-join: a self-join would plan
    # two independent corpus scans (one per join side). Instead the
    # #groups sketch rows — bounded state, ≤ #groups·k longs — collapse
    # into ONE row and double-explode into the |G|² pair frame, so the
    # corpus scan appears exactly once in the physical plan (pinned by
    # the plan test). Pairwise overlap is inherently O(|G|²) output;
    # the single-task explode is the same mass the join would shuffle.
    one = sk.agg(
        F.collect_list(
            F.struct(F.col(group_col).alias("g"), F.col("_arr").alias("arr"))
        ).alias("_all")
    )
    pairs = (
        one.select(F.explode("_all").alias("_x"), "_all")
        .select("_x", F.explode("_all").alias("_y"))
        .filter(F.col("_x.g") < F.col("_y.g"))
        .select(
            F.col("_x.g").alias("ga"),
            F.col("_y.g").alias("gb"),
            F.col("_x.arr").alias("_aa"),
            F.col("_y.arr").alias("_ab"),
        )
    )
    merged = F.array_sort(F.array_union("_aa", "_ab"))
    s_arr = F.slice(merged, 1, k)
    s_size = F.size(s_arr)
    kth = F.element_at(s_arr, s_size)
    full_union = F.size(merged)
    u_est = F.when(
        full_union < F.lit(k), full_union.cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth.cast("double"))
    j_num = F.size(F.array_intersect(s_arr, F.array_intersect("_aa", "_ab")))
    j_est = j_num.cast("double") / s_size.cast("double")

    est = pairs.select(
        "ga",
        "gb",
        F.round(j_est, 4).alias("est_jaccard"),
        F.round(j_est * u_est, 2).alias("est_intersection"),
    )
    if not audit:
        return est

    exact = (
        df.select(group_col, value_col)
        .distinct()
        .withColumnRenamed(group_col, "ga")
    )
    exact_b = exact.withColumnRenamed("ga", "gb")
    exact_pairs = (
        exact.join(exact_b, value_col)
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("exact_intersection"))
    )
    return est.join(exact_pairs, ["ga", "gb"], "left").withColumn(
        "exact_intersection",
        F.coalesce(F.col("exact_intersection"), F.lit(0)).cast("long"),
    )
