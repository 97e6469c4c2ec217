#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Noise-proof measurement policy (round-6 hardening):

* Each query is timed THREE times and the reported figure is the
  MEDIAN — a single shot is at the mercy of episodic JVM stalls, and
  min-of-2 still let one lucky run mask a host-contended window.
* The timed thunk MATERIALIZES every output column (bit_xor of the
  64-bit row hash over all columns, one driver row), not ``count()`` — under
  count, Catalyst eliminates cardinality-preserving joins, windows and
  generates, so 22 of r10's 119 rows timed a cheaper plan than the
  declared query (asof_join lost 2 joins + 5 windows). A per-row plan
  audit (Join/Window/Generate counts, full vs timed optimized plan)
  runs before timing and ABORTS the regen on any deficit, so the
  artifact can never silently under-measure again. r11 numbers are
  therefore NOT comparable to ≤r10 numbers for the affected rows —
  BENCH_HONESTY_r11.json maps old-form to new-form times in one epoch.
* An A/A calibration pair brackets the suite: the SAME fixed CPU-bound
  reference job (no I/O, no shuffle) runs immediately before the first
  timed query and immediately after the last. Their ratio stamps the
  host window — if first/last disagree materially, the suite ran under
  shifting contention and round-over-round per-query deltas should be
  read against the calibration, not taken at face value (the round-5
  lesson: 12 apparent regressions on untouched code were host noise).
* The full parsed JSON is ALSO written to ``BENCH_LOCAL_r{N}.json`` in
  the repo root, so the per-query map survives even when the driver's
  tail-capture truncates the stdout line (r5's ``parsed: null``).

Warmup policy (standard steady-state benchmarking, JMH-style): before
timing, every headline query runs once at sf0.001 — same expression
trees, negligible data — so whole-stage-codegen/JIT compilation is
absorbed outside the measured section and timings reflect plan quality
at the target scale factor rather than first-run compiler latency
(measured: the LSH pipeline is 9.6 s cold vs 3.9 s compiled, identical
plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from egal_yet_another_earthquake_project_spark import workloads
from egal_yet_another_earthquake_project_spark.session import get_spark

#: Queries whose timings define the headline metric — chosen to cover scan+agg,
#: shuffle joins, window functions, dedup, and the temporal joins.
HEADLINE = [
    "pricing_summary",
    "flagship_region_counts",
    "distinct_rows",
    "latest_per_user",
    "numeric_stats",
    "minute_equijoin",
    "asof_join",
    "range_join",
    "region_dim_join",
    "top10_orders",
    "text_profile",
    "gopher_quality_flags",
    "minhash_lsh_pairs",
    # the ANN path you'd run at scale (trained-quantizer IVF); the
    # brute-force embedding_topk stays declared as the recall reference
    # but is not the headline plan.
    "embedding_ivf_topk",
    "simhash_neardup",
    "contamination",
    "revenue_by_region",
    "running_sum",
    "sessionize",
    "shipping_priority",
    "returned_revenue",
    "curation_pipeline",
    "event_electric_correlation",
    # round-2 additions: decision-support join shapes + corpus passes.
    "nation_trade_volume",
    "order_count_distribution",
    "large_orders",
    "doc_chunks",
    "repetition_profile",
    "bm25_search",
    # round-2 wave 2: six-way join with share ratio, window-folded Q21,
    # count-distinct over a derived link table, and the LM/PII text scans.
    "market_share",
    "lone_late_supplier",
    "supplier_cnt_by_part",
    "unigram_nll",
    "pii_profile",
    "semantic_neardup",
    # round-3 wave: bounded-state sketches and corpus-layout passes.
    "kmv_distinct_users",
    "sequence_packing",
    "embedding_quantize",
    "alpha_resample",
    "global_row_ids",
    # round-4 wave: winnowing substring dedup, shard payload
    # materialization, and the Zipf-head vocabulary cut.
    "substring_dup_pairs",
    "pack_texts",
    "vocab_coverage",
    "label_centroids",
    "retention_cohorts",
    "incremental_new_docs",
    "source_overlap",
    # round-4 wave 2: record linkage, keyword extraction, weighted
    # sampling, and the time-series repair pair.
    "fuzzy_matches",
    "tfidf_keywords",
    "weighted_sample",
    "interpolate_gaps",
    "zscore_outliers",
    # round-4 wave 3: the continuous-crawl near-dedup gate (incoming
    # bands joined against the existing corpus's band index only) and
    # the iterative Lloyd k-means over embeddings.
    "incremental_neardup",
    "kmeans_clusters",
    "token_ids",
    # round-4 wave 4: register/bit-array sketches, sketch-gated heavy
    # hitters, bloom-pruned join, graph centrality, funnel windows.
    "hll_distinct_users",
    "frequent_tokens",
    "bloom_pruned_join",
    "trade_pagerank",
    "funnel_conversion",
    "mixture_epochs",
    "containment_pairs",
    "media_neardup",
    "pack_append",
    "bpe_merges",
    "bpe_encoded_vocab",
    "corpus_diff",
    "embedding_project",
    "leakage_safe_split",
    "length_batches",
    "stratified_split_counts",
    "multitouch_attribution",
    "source_quality",
    "hourly_distinct_users",
    "hourly_bars",
    "event_transitions",
    # round-5 wave: Z-order layout round trip (write + pruned band scan),
    # the max_df-capped keyword variant, and the month-stitched
    # interpolation now that the carry windows are bucket-partitioned.
    "zordered_band_scan",
    "tfidf_keywords_capped",
    # round-5 wave 2: the histogram quantile sketch, KMV set algebra,
    # and SCD2 history reconstruction. (copurchase_triangles is
    # declared+oracle-checked at sf0.01 but stays out of the headline:
    # its wedge mass at sf0.1 is a ~10^8-row join by design.)
    "hist_quantiles",
    "kmv_overlap",
    "priority_history",
    "span_corruption",
    "line_dedup",
    "corpus_report",
    "bigram_nll",
    "source_drift",
    # round-6: held-out frozen-LM scoring (train 90% / score 10%).
    "frozen_lm_score",
    "perplexity_buckets",
    # round-7: DSIR importance weights + Gumbel-top-k selection, and
    # the overlap-fraction decontamination scorer.
    "dsir_weights",
    "dsir_resample",
    "contamination_fraction",
    "novelty_profile",
    "embedding_drift",
    # round-8: information-density and rank-frequency corpus health,
    # and SemDeDup cluster-blocked semantic pruning.
    "token_entropy",
    "zipf_alpha",
    "semdedup_prune",
    # round-9 additions: the real-decode media/audio paths, the
    # decode→resize→featurize lane, and the one-plan semantic
    # admission gate.
    "media_decode_features",
    "media_thumbnail",
    "audio_decode_features",
    "semantic_gate",
    # PQ/ADC compressed ANN scan (llm/pq.py).
    "pq_topk",
    # round-10 additions: the persisted IVF-PQ production path (encode
    # once, search many — the amortized twin of pq_topk), the ADC
    # recall audit, and the first compressed media container.
    "pq_index_topk",
    "pq_recall",
    "png_decode_features",
    # the second compressed container: a real LZW codec (GIF)
    "gif_decode_features",
    # train+infer NB language-ID in one Catalyst plan
    "nb_langid",
    # rank-sum AUC from grouped scores + bucketed cumsum (no global window)
    "nb_auc",
    # the persisted-model inference path (train once, score many)
    "nb_model_score",
    "nb_pr_auc",
    # Fightin-Words class keywords (log-odds + Dirichlet prior)
    "class_keywords",
    # video lane: multi-frame GIF decode + stride sampling
    "video_frame_features",
    # deequ-style expectations compiled to one scan per table
    "dq_report",
    "nb_class_prf",
    # binned interval-overlap join (first-common-bucket, no dedup pass)
    "interval_overlap",
    # PSI drift gate (frozen-reference equal-width bins)
    "psi_drift",
    # per-slice AUC (fairness/debug breakdown)
    "nb_auc_by_source",
    "dq_corpus",
    # round-11: lossy-codec decode lane (baseline JFIF, real Huffman)
    "jpeg_decode_features",
    # round-11: logistic-regression GD train + exact AUC (8 epochs,
    # two integer aggregations each, broadcastable 1025-row model)
    "lr_auc",
    # round-11: hybrid retrieval (BM25 + dense cosine, RRF fusion)
    "hybrid_search",
    # round-11: retrieval quality metric (nDCG@10 vs planted labels)
    "retrieval_ndcg",
    # round-12: per-query-text BM25 (terms extracted per query) and its
    # amortized twin against the persisted term-bucketed inverted index
    "bm25_per_query",
    "bm25_index_topk",
    # round-12: the fully-amortized hybrid stack (persisted BM25 index +
    # persisted IVF index + RRF)
    "hybrid_index_search",
    # round-12: incremental BM25 maintenance — base segment + O(delta)
    # update segment, searched through the atomic manifest commit —
    # and O(delta) deletes (tombstones + negative df/Σdl/N sidecars,
    # exact post-delete scores)
    "bm25_update_search",
    "bm25_delete_search",
    # round-12: IVF takedown — tombstoned ids anti-joined out of every
    # probed cell, physical purge deferred to the next rebuild
    "ivf_delete_topk",
    # round-12: HTML → text extraction (the crawl pipeline's first
    # stage) — render + real-parser strip + md5-verified text — and the
    # fused WARC → HTML → text front end over spec-shaped containers
    "html_extract",
    "warc_extract",
    # round-13: Common Crawl's per-record-gzip WARC framing and the
    # charset-sniffing (meta/Content-Type, strict fallback accounting)
    # extraction twin
    "warc_gzip_extract",
    "html_charset_extract",
    # round-13: RFC 9309 robots.txt admission gate (broadcast rule join,
    # URL side never shuffles)
    "robots_gate",
    # round-12: URL canonicalization — pure codegen expressions, the
    # crawl-dedup key derivation
    "url_canonical",
    # round-13: oracle-dialect + render probes — constant-input canaries
    # that pinpoint a driver-side DuckDB construct/rendering change
    "oracle_dialect_probe",
    "oracle_render_probe",
]

#: Declared-expensive AUDIT rows (VERDICT r11 #7): queries that pay
#: in-query training / brute-force ground truth BY DECLARATION so their
#: oracle can replay one statement (each has an amortized production
#: twin or is itself the quality audit). Flagged in the bench payload so
#: cross-round suite sums can be read with and without this class.
AUDIT_ROWS = {"pq_topk", "pq_recall", "lr_auc"}


#: Host-epoch probes (VERDICT r7 #5): queries whose PLAN has been
#: unchanged since early rounds, pinned to their round-6 committed
#: medians (BENCH_LOCAL_r06.json, sf0.1 — the anchor epoch). The VM's
#: throughput shifts 1.5-2.3x between rounds on identical plans; the
#: median now/anchor ratio over these rows is the epoch factor every
#: cross-round bench comparison must divide out (SCALE.md documents the
#: method; this makes it machine-readable per round).
EPOCH_ANCHOR_ROUND = 6
EPOCH_ANCHORS = {
    "flagship_region_counts": 0.189,
    "top10_orders": 0.134,
    "nation_trade_volume": 0.785,
    "embedding_quantize": 0.177,
    "distinct_rows": 0.328,
}
EPOCH_ANCHOR_CALIBRATION = 0.229


def _bench_curate_e2e(spark, sf_dir: str) -> None:
    """End-to-end curate job (gates → exact dedup → decontamination →
    MinHash-LSH near-dedup → α-resample → packing → sharded parquet
    write) — the composed product path, exercised with every optional
    stage ON so the bench times what a pipeline operator actually
    runs."""
    import shutil
    import tempfile

    from egal_yet_another_earthquake_project_spark import curate
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    result = curate.curate_corpus(
        docs,
        near_dedup=True,
        decontaminate=docs.filter(F.col("doc_id") < 3),
        alpha=0.7,
        budget=2000,
        ctx=256,
    )
    out_dir = tempfile.mkdtemp(prefix="bench_curate_")
    try:
        curate.write_shards(result, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        # curate_corpus persists its dedup/pack stages; release them so
        # the bench's later queries run uncontended.
        _release_storage(spark)


#: Realistic-merge-count BPE training bench (judged scale contract:
#: driver round trips = ceil(num_merges / batch_merges); the oracle-
#: paired bpe_merges query stays at 20 merges because its SQL oracle
#: unrolls per round). 200 merges @ batch 32 = 7 rounds.
BPE_BENCH_MERGES, BPE_BENCH_BATCH = 200, 32


def _bench_bpe200(spark, sf_dir: str):
    """Train 200 BPE merges (batch 32) on the corpus word-frequency
    table — times the batched-training contract at a realistic merge
    count; tests/test_corpus_ops.py asserts the round-trip count."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm import bpe as lbpe
    from egal_yet_another_earthquake_project_spark.llm import text as ltx
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    words = (
        ltx.tokenized(docs)
        .select(F.explode("_toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    merges = lbpe.bpe_train(
        spark,
        words,
        num_merges=BPE_BENCH_MERGES,
        batch_merges=BPE_BENCH_BATCH,
    )
    return merges.count()


def _force(df):
    """Materialize EVERY output column of ``df``: one aggregate over the
    64-bit row hash of all columns, collected to a single driver row.

    Why not ``count()``: Catalyst satisfies a count from the smallest
    subtree that preserves cardinality — cardinality-preserving joins
    (left joins to unique keys), windows, and generates are ELIMINATED
    under count (r10 judge plan-audit: 22 of 119 bench rows timed
    cheaper plans than the declared query; asof_join lost 2 joins + 5
    windows). The row hash references every output column, so every
    operator that produces any output column must execute; the BIT_XOR
    aggregate keeps the driver transfer at one row regardless of result
    size and cannot overflow under ANSI mode (a SUM of 64-bit hashes
    does). Map/variant columns (not hashable by xxhash64) are rendered
    through to_json first.
    """
    return _forced_form(df).collect()


def _plan_nodes(df) -> dict:
    """Join/Window/Generate node counts of the optimized logical plan —
    the audit signature used to prove the timed form executes the same
    heavy operators as the declared query."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return {
        "join": sum(line.strip().lstrip("+-: ").startswith("Join") for line in plan.splitlines()),
        "window": sum(line.strip().lstrip("+-: ").startswith("Window") for line in plan.splitlines()),
        "generate": sum(line.strip().lstrip("+-: ").startswith("Generate") for line in plan.splitlines()),
    }


def _forced_form(df):
    """The exact frame :func:`_force` aggregates — exposed so the plan
    audit inspects what the timed thunk will run."""
    from pyspark.sql import functions as F

    cols = []
    for name, dtype in df.dtypes:
        if dtype.startswith("map") or dtype.startswith("variant"):
            cols.append(F.to_json(F.col(name)))
        else:
            cols.append(F.col(name))
    return df.select(F.xxhash64(*cols).alias("_row_hash")).agg(
        F.expr("bit_xor(_row_hash)")
    )


def _release_storage(spark) -> None:
    """Drop every cached table AND every persistent RDD block.

    catalog.clearCache() misses localCheckpoint blocks — the iterative
    operators (components, k-means, PageRank) checkpoint per run, and
    those blocks pin executor storage until the Python frames are
    GC'd. Across a 60-query session the leak shows as 30-50% inflation
    of late rows vs the same query isolated.
    """
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Lean status-tracking confs for a 60-query single-session run: the
    # default UI/status store retains up to 1000 SQL executions with
    # their full plan strings — multi-KB per query here (literal-heavy
    # plans), which accretes driver heap across the suite and shows up
    # as GC inflation of the LAST rows (measured: the final 8 queries
    # ran 3-6x their isolated cost before this).
    spark = get_spark(
        "egal-spark-bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
            "spark.appStateStore.asyncTracking.enable": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: compile every headline query's codegen against tiny data,
    # then touch the target-SF fact table so FS caches are hot.
    warmup_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            continue
        try:
            _force(fn(spark, warmup_dir))
        except Exception:
            pass
        spark.catalog.clearCache()
    try:
        _bench_curate_e2e(spark, warmup_dir)
    except Exception:
        pass
    try:
        _bench_bpe200(spark, warmup_dir)
    except Exception:
        pass
    spark.catalog.clearCache()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # A/A calibration pair: a fixed CPU-bound reference job (no I/O, no
    # shuffle) whose cost is independent of the workload, run BEFORE the
    # first timed query and again AFTER the last. On this box it runs
    # ~0.10-0.25 s idle; a materially larger value means the run was
    # host-contended and every row is inflated; first/last DISAGREEING
    # means contention shifted mid-suite and round-over-round deltas are
    # not adjudicable from this run alone. (Observed: the same suite
    # measured 69 s idle and 212 s under transient host steal.)
    def _calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        return round(time.perf_counter() - t0, 3)

    calibration = _calibrate()

    RUNS = 3
    timings: dict[str, float] = {}
    runs_detail: dict[str, list[float]] = {}

    # Interleaved A/A contention probe (r14, VERDICT r13 #1): the
    # suite-bracketing calibration pair cannot see contention windows
    # that open and close MID-suite (r13: two disjoint blocks of rows
    # inflated 5-25x with a quiet aa_ratio of 0.977). A fixed CPU-bound
    # probe (no I/O, no shuffle, same thunk family as the calibration)
    # now runs immediately before and after EVERY timed row; a row whose
    # bracketing probes blow out against the suite-median probe is
    # flagged so cross-round comparisons can discount it. Probes run
    # OUTSIDE the timed sections and add ~0.05 s per row of untimed
    # work; the stdout line only grows by the (normally empty) flag
    # list, the full probe series lives in the local artifact.
    aa_brackets: dict[str, list[float]] = {}

    def _aa_probe() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id)").collect()
        return round(time.perf_counter() - t0, 4)

    def _timed(name: str, thunk) -> None:
        """Median of RUNS timed executions; storage released between
        runs, OUTSIDE the timed section, so one query's leftover pins
        never tax the next run's GC (measured: without the release,
        fuzzy_matches drifts 1.9 s -> 27.8 s as pins accumulate). The
        median of three absorbs the episodic JVM stall that min-of-two
        could still let a lucky pair mask — and unlike min, it moves
        when the host window genuinely shifts, which is exactly what
        the A/A pair is there to flag."""
        bracket = [_aa_probe()]
        aa_brackets[name] = bracket
        samples: list[float] = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            try:
                thunk()
            except Exception as exc:  # a bad query must not cost the run
                print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
                # release on the failure path too: a query that died
                # mid-plan may already have pinned blocks, and leaking
                # them re-creates the 1.9s->27.8s drift this release
                # exists to prevent — for every query after it
                _release_storage(spark)
                bracket.append(_aa_probe())
                return
            samples.append(time.perf_counter() - t0)
            _release_storage(spark)
        bracket.append(_aa_probe())
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        runs_detail[name] = [round(x, 3) for x in samples]

    # Per-row honesty audit: the timed form (hash-of-all-columns
    # aggregate) must carry at least as many Join/Window/Generate nodes
    # as the declared query's own optimized plan. A deficit means
    # Catalyst still eliminated work under the timed thunk — the r10
    # judge finding this materializer exists to close — and the row's
    # number would be a lie; the regen FAILS rather than emit it.
    plan_audit_failures: list[str] = []
    for name in HEADLINE:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            continue
        try:
            full = _plan_nodes(fn(spark, sf_dir))
            timed = _plan_nodes(_forced_form(fn(spark, sf_dir)))
        except Exception as exc:
            plan_audit_failures.append(f"{name}: audit error: {exc}")
            continue
        deficit = {k: (full[k], timed[k]) for k in full if timed[k] < full[k]}
        if deficit:
            plan_audit_failures.append(f"{name}: timed plan drops {deficit}")
    if plan_audit_failures:
        for msg in plan_audit_failures:
            print(f"bench: PLAN AUDIT FAILED: {msg}", file=sys.stderr)
        raise SystemExit(2)

    for name in HEADLINE:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            continue
        _timed(name, lambda fn=fn: _force(fn(spark, sf_dir)))

    # Host-epoch probes re-timed with the PINNED historical thunk —
    # count(), the exact form the r6 anchors were measured with. The
    # epoch factor measures the HOST, so anchor-series comparability
    # outranks the honest-materialization policy that governs the
    # headline rows above (count() eliminates e.g. embedding_quantize's
    # whole map-only projection — honest 3.1 s vs anchor-form 0.18 s —
    # which would poison the ratio with a plan change, not a host
    # change). Median of 3, same release discipline.
    epoch_timings: dict[str, float] = {}
    for name in EPOCH_ANCHORS:
        fn = workloads.QUERIES.get(name)
        if fn is None:
            continue
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
            except Exception:
                break
            samples.append(time.perf_counter() - t0)
            _release_storage(spark)
        if len(samples) == RUNS:
            samples.sort()
            epoch_timings[name] = round(samples[len(samples) // 2], 3)

    # The composed curate job: not a declared query (it writes shards),
    # timed as its own row so the end-to-end path the two round-3 scale
    # fixes live on (left_semi resample, ranged shard exchange) has a
    # bench number.
    _timed("curate_e2e", lambda: _bench_curate_e2e(spark, sf_dir))

    # BPE at a realistic merge count (200 merges, batch 32 → 7 driver
    # round trips): times the batched-training scale contract, not just
    # the 20-merge oracle-paired query.
    _timed("bpe_train_200", lambda: _bench_bpe200(spark, sf_dir))

    calibration_last = _calibrate()

    # Per-row contention verdicts from the interleaved probes: a row is
    # flagged when EITHER bracketing probe ran >3x the suite-median
    # probe (floored at 20 ms so py4j jitter on a sub-ms probe cannot
    # flag anything). An empty list = every row ran in a quiet window.
    probe_vals = sorted(v for pair in aa_brackets.values() for v in pair)
    aa_probe_med = probe_vals[len(probe_vals) // 2] if probe_vals else None
    if aa_probe_med is not None:
        aa_threshold = 3.0 * max(aa_probe_med, 0.02)
        aa_flagged = sorted(
            name
            for name, pair in aa_brackets.items()
            if max(pair) > aa_threshold
        )
    else:
        aa_flagged = []

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline-suite-runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "calibration_sec": calibration,
        "calibration_last_sec": calibration_last,
        # ≈1.0 = stable host window; >>1 or <<1 = contention shifted
        # mid-suite, read per-query deltas against the calibrations
        "calibration_aa_ratio": round(
            calibration_last / calibration, 3
        ) if calibration else None,
        "runs_per_query": RUNS,
        "stat": "median",
        # r11+: full-materialization timing (sum of row hashes over all
        # output columns) with a pre-flight plan audit; rows are not
        # comparable to <=r10 count()-form numbers where the audit
        # found eliminated subtrees (see BENCH_HONESTY_r11.json).
        "materialization": "xxhash64-all-columns-bitxor",
        "plan_audit": "pass",
        # declared-expensive audit rows (in-query training / brute-force
        # ground truth BY DESIGN; amortized twins exist) — subtract for
        # a production-shaped suite sum (VERDICT r11 #7)
        "audit_rows": sorted(AUDIT_ROWS & timings.keys()),
        "value_ex_audit_rows": round(
            total - sum(timings.get(n, 0.0) for n in AUDIT_ROWS), 3
        ),
        # r14: interleaved per-row A/A contention flags (probe series in
        # the local artifact; stdout stays one short line)
        "aa_probe_med": aa_probe_med,
        "aa_flagged": aa_flagged,
    }
    print(json.dumps(payload))

    # Committed local artifact: the full parsed JSON plus per-run
    # samples, immune to driver-side stdout truncation (r5's
    # BENCH_r05.json had parsed: null).
    here = os.path.dirname(os.path.abspath(__file__))
    rnd = _round_number(here)
    local = dict(payload, queries_runs=runs_detail, aa_brackets=aa_brackets)
    # sf tag in the filename for non-default SFs, so a fast sf0.001
    # probe can't clobber the round's committed sf0.1 artifact
    tag = "" if abs(float(sf) - 0.1) < 1e-9 else f"_sf{sf}"
    with open(
        os.path.join(here, f"BENCH_LOCAL_r{rnd:02d}{tag}.json"), "w"
    ) as f:
        json.dump(local, f, indent=1, sort_keys=True)

    # Machine-readable host-epoch record (anchors are sf0.1 medians, so
    # only the default-SF run emits it): the median now/anchor ratio of
    # the pinned plan-unchanged probes IS the epoch factor to divide out
    # of any cross-round comparison against round-6 numbers.
    if not tag:
        ratios = sorted(
            epoch_timings[name] / anchor
            for name, anchor in EPOCH_ANCHORS.items()
            if epoch_timings.get(name) is not None
        )
        if ratios:
            mid = len(ratios) // 2
            median = (
                ratios[mid]
                if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2
            )
            epoch_factor = round(median, 3)
        else:
            epoch_factor = None
        epoch = {
            "round": rnd,
            "anchor_round": EPOCH_ANCHOR_ROUND,
            "anchor_source": f"BENCH_LOCAL_r{EPOCH_ANCHOR_ROUND:02d}.json",
            "anchor_calibration_sec": EPOCH_ANCHOR_CALIBRATION,
            "calibration_sec": calibration,
            "calibration_last_sec": calibration_last,
            "probes": {
                name: {
                    "anchor_sec": anchor,
                    "now_sec": epoch_timings.get(name),
                    "ratio": (
                        round(epoch_timings[name] / anchor, 3)
                        if epoch_timings.get(name) is not None
                        else None
                    ),
                }
                for name, anchor in EPOCH_ANCHORS.items()
            },
            # r11+: probes are re-timed with the anchors' historical
            # count() thunk, NOT the headline materializer — see the
            # epoch_timings comment in main()
            "probe_thunk": "count",
            "epoch_factor_vs_anchor": epoch_factor,
        }
        with open(
            os.path.join(here, f"HOSTEPOCH_r{rnd:02d}.json"), "w"
        ) as f:
            json.dump(epoch, f, indent=1, sort_keys=True)
    spark.stop()


def _round_number(here: str) -> int:
    """Current build round: $ROUND if set, else one past the newest
    driver-recorded BENCH_r{N}.json (the driver writes r N's file only
    AFTER running this script, so max+1 is the in-flight round)."""
    if os.environ.get("ROUND"):
        return int(os.environ["ROUND"])
    import glob
    import re

    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r[0-9]*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return max(ns) + 1 if ns else 1


if __name__ == "__main__":
    main()
