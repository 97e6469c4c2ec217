"""Physical-plan property tests: the 100 TB questions as assertions.

If one of these fails, the query still returns correct rows — but the plan
has silently lost a property that matters at scale (pushdown, broadcast,
top-k heaps, column pruning). Keeping them in CI makes de-optimization a
test failure.
"""

from __future__ import annotations

from egal_yet_another_earthquake_project_spark import workloads
from egal_yet_another_earthquake_project_spark.plans import inspect

from tests.conftest import TESTDATA_SMOKE


def _q(spark, name):
    return workloads.QUERIES[name](spark, TESTDATA_SMOKE)


def test_pricing_summary_filter_pushed_to_scan(spark):
    filters = inspect.pushed_filters(_q(spark, "pricing_summary"))
    assert any("l_shipdate" in f for f in filters), filters


def test_pricing_summary_prunes_columns(spark):
    schemas = inspect.read_schemas(_q(spark, "pricing_summary"))
    # 6 of 11 lineitem columns needed; the scan must not read the rest.
    assert schemas and all("l_orderkey" not in s for s in schemas), schemas


def test_region_dim_join_broadcasts(spark):
    assert inspect.uses_broadcast_join(_q(spark, "region_dim_join"))


def test_revenue_join_broadcasts_dims(spark):
    df = _q(spark, "revenue_by_region")
    assert inspect.uses_broadcast_join(df)


def test_customer_join_never_hint_broadcast(spark):
    """customer is SF-proportional (TPC-H: 150k×SF rows): at 100× scale a
    forced broadcast OOMs. Disabling size-based autobroadcast simulates
    that scale — hinted joins (nation/region) must STILL broadcast, the
    un-hinted customer join must fall back to a shuffle join."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for qname in ("revenue_by_region", "shipping_priority", "returned_revenue"):
            nodes = inspect.join_key_nodes(_q(spark, qname))
            cust = [n for n, keys in nodes if "c_custkey" in keys]
            assert cust, f"{qname}: no c_custkey join found in plan"
            assert all(
                n in ("SortMergeJoin", "ShuffledHashJoin") for n in cust
            ), f"{qname}: customer join planned as {cust}"
        nodes = inspect.join_key_nodes(_q(spark, "revenue_by_region"))
        assert any(
            n == "BroadcastHashJoin" and "n_nationkey" in k for n, k in nodes
        ), nodes
        assert any(
            n == "BroadcastHashJoin" and "r_regionkey" in k for n, k in nodes
        ), nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_top10_uses_partial_topk(spark):
    assert inspect.uses_take_ordered(_q(spark, "top10_orders"))


def test_top_tokens_uses_partial_topk(spark):
    assert inspect.uses_take_ordered(_q(spark, "top_tokens"))


def test_contamination_broadcasts_eval_set(spark):
    """The corpus side must stream through a broadcast join — a shuffled
    join here would move the whole corpus shingle mass."""
    assert inspect.uses_broadcast_join(_q(spark, "contamination"))


def test_event_deltas_single_shuffle(spark):
    """Two window specs share the user_id partitioning: one hash exchange
    (plus sorts), not one per window."""
    df = _q(spark, "event_deltas")
    assert inspect.exchange_count(df) <= 1, inspect.formatted_plan(df)


def test_flagship_single_shuffle(spark):
    # filter + groupBy + orderBy: one hash exchange (+1 range for the sort).
    df = _q(spark, "flagship_region_counts")
    assert inspect.exchange_count(df) <= 2, inspect.formatted_plan(df)


def test_flagship_pushes_threshold(spark):
    filters = inspect.pushed_filters(_q(spark, "flagship_region_counts"))
    assert any("value" in f for f in filters), filters


def test_json_props_prunes_to_two_columns(spark):
    schemas = inspect.read_schemas(_q(spark, "json_props"))
    assert schemas and all(
        "event_type" not in s and "user_id" not in s for s in schemas
    ), schemas


def test_union_counts_collapse_to_single_scan(spark):
    # Catalyst folds union-of-filters over the same source; no more
    # exchanges than the straight flagship plan.
    u = inspect.exchange_count(_q(spark, "union_region_counts"))
    assert u <= 2, u


def test_whole_stage_codegen_active(spark):
    assert inspect.codegen_stage_count(_q(spark, "pricing_summary")) >= 1


#: Queries whose cross/nested-loop join is intentional: the brute-force
#: similarity baselines broadcast one tiny side by design, IVF's
#: centroid assignment scores rows against a broadcast ≤num_cells-row
#: centroid table (bounded by a parameter, not by data size), and the
#: Q11/Q22-shaped global-scalar thresholds broadcast a ONE-row aggregate
#: (sum/count over the whole input collapses to a single row before the
#: join, so the "cartesian" fans out 1×n — a scan, not a cliff).
_ALLOWED_NESTED_LOOP = {
    "embedding_topk",
    "trailing_week",
    "embedding_ivf_topk",
    # hybrid retrieval: the dense side IS brute_force_topk (the
    # embedding_topk shape), and the per-query lexical side joins the
    # one-row global (N, Σdl) statistics frame into the query-term
    # postings (bm25_search's bounded 1×n shape). nDCG rides the same
    # dense brute-force baseline.
    "hybrid_search",
    "retrieval_ndcg",
    # same 1×n stats broadcast as bm25_search, per query text
    "bm25_per_query",
    # persisted-index hybrid: assign_cells crossJoins the ≤num_cells
    # centroid frame (the embedding_ivf_topk bounded shape); both index
    # scans are statically pruned
    "hybrid_index_search",
    # same persisted-index search shape (assign_cells × ≤num_cells
    # centroid frame on the query batch); the tombstone anti-join is an
    # equi hash join and adds no nested loop
    "ivf_delete_topk",
    # Same quantizer shape as embedding_ivf_topk: assign_cells crossJoins
    # the ≤ num_cells centroid frame into both the corpus and the gated
    # batch — bounded K×n broadcast by construction.
    "semantic_gate",
    # ADC search broadcasts the (tiny, LUT-carrying) query frame into
    # the code scan — the embedding_topk bounded-small-side shape.
    "pq_topk",
    # Persisted-index twin: same broadcast-LUT shape over the probed
    # cell partitions; the recall audit additionally crosses three
    # one-row count frames (the lsh_recall shape).
    "pq_index_topk",
    "pq_recall",
    # NB classifier family: the ≤#classes constants frame and the
    # one-row vocabulary/total aggregates broadcast-cross into the
    # doc/token frames — bounded K×n / 1×n by construction; the eval
    # metrics additionally cross one-row count frames (lsh_recall
    # shape). Fightin-Words crosses the one-row corpus-total frame.
    "nb_langid",
    "nb_confusion",
    "nb_model_score",
    "nb_class_prf",
    "nb_auc",
    "nb_auc_by_source",
    "nb_pr_auc",
    "nb_calibration",
    "class_keywords",
    # The FK orphan-fraction rows cross two ONE-row count aggregates.
    "dq_report",
    "dq_corpus",
    # PSI crosses the ≤bins-row bin grid and the one-row reference
    # total into the per-group frame — bounded K×n / 1×n broadcasts.
    "psi_drift",
    "top_parts_by_value",
    "acctbal_opportunity",
    # BM25 joins the one-row global (N, Σdl) statistics frame into the
    # query-term postings — 1×n broadcast, bounded by construction.
    "bm25_search",
    # Unigram LM joins the one-row (N, V) corpus totals into the
    # term-frequency frame — same bounded 1×n broadcast shape (the
    # bigram model shares it).
    "unigram_nll",
    "bigram_nll",
    # Source drift joins the one-row top-K token total into the
    # per-(source, token) frame — same bounded 1×n broadcast shape.
    "source_drift",
    # The bloom probe filter joins the ONE-ROW broadcast word-array
    # frame into the probe scan (deliberately data-side, not a plan
    # literal) — bounded 1×n, and the whole point is to shrink the real
    # join's exchange.
    "bloom_pruned_join",
    # α resampling joins the one-row weight normalizer Σc^α into the
    # #sources-row quota table — bounded 1×n broadcast.
    "alpha_resample",
    # Vocabulary coverage joins the one-row corpus token total into the
    # distinct-token frame — bounded 1×n broadcast.
    "vocab_coverage",
    # ntile_exact joins the one-row total row count into the banded
    # frame (the SQL ntile formula needs n) — bounded 1×n broadcast.
    "ntile_bands",
    # TF-IDF joins the one-row document count into the per-(doc,term)
    # frequency frame — bounded 1×n broadcast (the capped variant also
    # joins it into the vocabulary-scale df filter).
    "tfidf_keywords",
    "tfidf_keywords_capped",
    # Triangle counting returns (n_triangles, n_edges, n_wedges) as a
    # cross of three ONE-ROW aggregate frames — bounded 1×1 broadcasts.
    "copurchase_triangles",
    # The corpus report card crosses TWO one-row aggregate frames —
    # bounded 1×1 broadcast.
    "corpus_report",
    # KMV set algebra crosses the #groups-row sketch table with itself
    # (≤ a few dozen rows, each a ≤k-element array) — bounded by the
    # group-key cardinality, never the corpus.
    "kmv_overlap",
    "kmv_overlap_audited",
    # The LSH recall audit crosses three ONE-ROW aggregate frames —
    # bounded 1×1 broadcasts.
    "lsh_recall",
    # Perplexity bucketing joins the ONE-ROW (c33, c67) cutoff frame
    # into the scored corpus — bounded 1×n broadcast; its dedicated
    # plan test additionally asserts it is the plan's ONLY nested loop.
    "perplexity_buckets",
    # DSIR joins the two ONE-ROW model totals (Nt, Nr) into the
    # doc-scale feature frame — bounded 1×n broadcasts; the bucket-
    # keyed model joins themselves are broadcast HASH joins
    # (test_dsir.py asserts both properties).
    "dsir_weights",
    "dsir_resample",
}


def test_no_accidental_cartesian_products(spark):
    """No declared query may plan an unbounded cartesian/nested-loop join
    (the O(n·m) cliff at scale) unless it is an explicit baseline."""
    offenders = {}
    for name in sorted(workloads.QUERIES):
        if name in _ALLOWED_NESTED_LOOP:
            continue
        plan = inspect.formatted_plan(workloads.QUERIES[name](spark, TESTDATA_SMOKE))
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders[name] = True
    assert not offenders, f"nested-loop plans in: {sorted(offenders)}"


def test_nation_trade_broadcasts_only_nations(spark):
    """Q7 shape: the two nation lookups are broadcast; the SF-proportional
    sides (orders, customer, supplier) must NOT be hint-broadcast in the
    static plan (AQE may still promote them at runtime from observed
    sizes, which is fine — a hint would force it at any scale)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = _q(spark, "nation_trade_volume")
        nodes = inspect.join_key_nodes(df)
        bcast = [k for n, k in nodes if n == "BroadcastHashJoin"]
        shuffled = [k for n, k in nodes if n in ("SortMergeJoin", "ShuffledHashJoin")]
        assert len(bcast) == 2 and all(
            "_ck" in k or "_sk" in k for k in bcast
        ), nodes
        # orders/customer/supplier joins stay shuffle joins without a hint.
        assert len(shuffled) == 3, nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_large_orders_limit_is_partial_topk(spark):
    """Q18 shape: the final ORDER BY ... LIMIT compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge), never a
    global sort."""
    assert inspect.uses_take_ordered(_q(spark, "large_orders"))


def test_small_quantity_agg_reuses_partkey_exchange(spark):
    """Q17 shape: the per-part aggregate and the join probe hash on the
    same key (l_partkey); the plan needs at most 3 exchanges (two scan
    sides + final single-row agg), proving the grouped side is not
    re-shuffled after aggregation."""
    n = inspect.exchange_count(_q(spark, "small_quantity_revenue"))
    assert n <= 3, n


def test_doc_chunks_is_shuffle_free(spark):
    """Chunking must stay co-partitioned with its input — an exchange here
    would shuffle the full corpus text for a per-row transform."""
    assert inspect.exchange_count(_q(spark, "doc_chunks")) == 0


def test_bm25_filters_terms_before_shuffle(spark):
    """The query-term filter must land under the postings shuffle: the
    exchanged frame carries only matching (doc, term) rows, never the
    whole token stream."""
    import re

    plan = inspect.formatted_plan(_q(spark, "bm25_search"))
    # Node ids number bottom-up: the IN-filter must sit DIRECTLY on the
    # explode Generate node (id + 1), i.e. below the postings shuffle.
    filt = re.search(r"\((\d+)\) Filter\nInput.*\nCondition :.*IN \(join", plan)
    assert filt, plan[:2000]
    gens = {int(m.group(1)) for m in re.finditer(r"\((\d+)\) Generate", plan)}
    assert int(filt.group(1)) - 1 in gens, (filt.group(1), gens)


def test_forecast_revenue_is_scan_only(spark):
    """Q6 shape: all three predicates reach the parquet scan, the scan
    reads only the needed columns, and the one-row aggregate needs no
    hash-partitioned exchange — the whole query runs at scan speed."""
    df = _q(spark, "forecast_revenue")
    filters = " ".join(inspect.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in filters, filters
    schemas = inspect.read_schemas(df)
    assert schemas and all("l_orderkey" not in s for s in schemas), schemas
    assert inspect.exchange_count(df) == 0


def test_priority_exists_is_semi_join_with_pushed_window(spark):
    """Q4 shape: the EXISTS compiles to ONE left-semi join (each order
    emitted at most once — no post-join distinct), and the quarter
    window prunes the orders scan."""
    df = _q(spark, "priority_order_exists")
    plan = inspect.formatted_plan(df)
    assert "LeftSemi" in plan, plan
    filters = " ".join(inspect.pushed_filters(df))
    assert "o_orderdate" in filters, filters


def test_disjunctive_revenue_prunes_both_scans(spark):
    """Q19 shape: the brand IN-list reaches the part scan and the
    quantity envelope reaches the lineitem scan, so both sides shrink
    BEFORE the join even though the full predicate is an OR."""
    filters = " ".join(inspect.pushed_filters(_q(spark, "disjunctive_revenue")))
    assert "p_brand" in filters, filters
    assert "l_quantity" in filters, filters


def test_market_share_broadcasts_only_dims(spark):
    """Q8 shape: with size-based autobroadcast off (the 100× simulation),
    only the hinted nation/region lookups broadcast; lineitem, orders,
    customer, supplier and the part filter all stay shuffle joins."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        nodes = inspect.join_key_nodes(_q(spark, "market_share"))
        bcast = [k for n, k in nodes if n == "BroadcastHashJoin"]
        assert len(bcast) == 3 and all(
            k & {"_cnk", "_crk", "_snk"} for k in bcast
        ), nodes
        shuffled = [k for n, k in nodes if n in ("SortMergeJoin", "ShuffledHashJoin")]
        assert len(shuffled) == 4, nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_min_cost_supplier_reuses_partkey_shuffle(spark):
    """Q2 shape: one lineitem scan, (part,supplier) aggregate, per-part
    window — exactly two hash exchanges; the final top-100 is
    per-partition heaps, not a global sort. (The aggregate+join-back
    formulation re-evaluated the offers subtree on both join sides:
    two scans, five exchanges.)"""
    df = _q(spark, "min_cost_supplier")
    assert inspect.uses_take_ordered(df)
    assert inspect.exchange_count(df) <= 2, inspect.exchange_count(df)


def test_lone_late_supplier_folds_exists_pair_into_window(spark):
    """Q21 shape: the EXISTS / NOT-EXISTS pair must come out as window
    aggregates over ONE pass of lineitem⋈orders — no anti/semi join, no
    self-join, and exactly three table scans (lineitem, orders,
    supplier); a duplicated flagged-subtree would show five."""
    plan = inspect.formatted_plan(_q(spark, "lone_late_supplier"))
    assert "LeftAnti" not in plan and "LeftSemi" not in plan, plan
    assert "Window" in plan, plan
    n_scans = sum(
        1 for line in plan.splitlines() if line.strip().startswith("(")
        and "Scan parquet" in line
    )
    assert n_scans == 3, plan


def test_quantize_is_shuffle_free(spark):
    """Int8 quantization is a pure projection: zero exchanges (the
    declared query adds only the output sort)."""
    from egal_yet_another_earthquake_project_spark.llm import quantize as lq
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    df = lq.quantize_int8(read_table(spark, TESTDATA_SMOKE, "embeddings"))
    assert inspect.exchange_count(df) == 0, inspect.formatted_plan(df)


def test_packing_single_shuffle(spark):
    """Sequence packing = one hash exchange for the per-group window; the
    pack-id floor adds no second shuffle."""
    from egal_yet_another_earthquake_project_spark.llm import packing as lpack
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    df = lpack.pack_sequences(
        read_table(spark, TESTDATA_SMOKE, "documents"), "doc_id", "source"
    )
    assert inspect.exchange_count(df) <= 1, inspect.formatted_plan(df)


def test_cms_probe_join_broadcasts_sketch(spark):
    """The d*w-row sketch must broadcast to the probes — the probe path
    never shuffles the corpus."""
    from egal_yet_another_earthquake_project_spark.llm import sketches as lsk
    from egal_yet_another_earthquake_project_spark.llm import text as ltx
    from egal_yet_another_earthquake_project_spark.sources.files import read_table
    from pyspark.sql import functions as F

    items = ltx.tokenized(read_table(spark, TESTDATA_SMOKE, "documents")).select(
        F.explode("_toks").alias("tok")
    )
    sketch = lsk.cms_build(items, "tok")
    probes = spark.createDataFrame([("join",), ("hash",)], "tok string")
    df = lsk.cms_estimate(sketch, probes, "tok")
    assert inspect.uses_broadcast_join(df), inspect.formatted_plan(df)


def test_unit_norm_not_inlined(spark):
    """The L2 norm behind `similarity.unit` must stay materialized in its
    own projection — CollapseProject inlining it into the transform
    lambda re-runs the O(dim) aggregate per element (O(dim^2)/row)."""
    from egal_yet_another_earthquake_project_spark.llm import similarity as lsim
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    df = lsim.unit(read_table(spark, TESTDATA_SMOKE, "embeddings"), "embedding", "u")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_nm" in plan, "norm projection collapsed into the lambda:\n" + plan[:2000]


def test_ingest_gate_seen_set_never_hint_broadcast(spark):
    """The incremental gate's seen-set is the corpus fingerprint index —
    corpus-sized, so it must reach the anti-join without a broadcast
    hint (AQE may still broadcast at small scale; a hint is forever).
    With size-based autobroadcast off, a surviving BroadcastHashJoin on
    fp could only come from a hint."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        nodes = inspect.join_key_nodes(_q(spark, "incremental_new_docs"))
        bad = [n for n, keys in nodes if n == "BroadcastHashJoin"]
        assert not bad, f"hint-broadcast join in ingest gate: {nodes}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_retention_firsts_never_hint_broadcast(spark):
    """The first-seen frame is users-scale (a corpus fraction), so the
    join back to events must carry no broadcast hint."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        nodes = inspect.join_key_nodes(_q(spark, "retention_cohorts"))
        bad = [n for n, keys in nodes if n == "BroadcastHashJoin"]
        assert not bad, f"hint-broadcast join in retention: {nodes}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_source_overlap_joins_on_fingerprint(spark):
    """The overlap matrix must self-join the DISTINCT (fp, source) frame
    on fp — per-fp fan-out bounded by #sources. A join keyed on anything
    else (or a nested-loop fallback) would be the doc-pair explosion."""
    nodes = inspect.join_key_nodes(_q(spark, "source_overlap"))
    assert any("fp" in keys for _, keys in nodes), nodes


def test_product_profit_broadcasts_only_nation(spark):
    """Q9 shape: nation is the only hint-broadcast side; the
    SF-proportional tables (part slice, supplier, orders) stay shuffle
    joins the static planner cannot force to the driver at any scale."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        nodes = inspect.join_key_nodes(_q(spark, "product_profit"))
        bcast = [k for n, k in nodes if n == "BroadcastHashJoin"]
        shuffled = [k for n, k in nodes if n in ("SortMergeJoin", "ShuffledHashJoin")]
        assert len(bcast) == 1 and any("n_nationkey" in k for k in bcast), nodes
        assert len(shuffled) == 3, nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_split_leakage_adds_no_join_beyond_lsh(spark):
    """Scoring each pair end's split must be pure column math on the id —
    the plan's join count has to equal the LSH pair pipeline's own (a
    regression that joins the corpus back in to look up splits would add
    a corpus-scale shuffle per end)."""
    lsh_joins = len(inspect.join_key_nodes(_q(spark, "minhash_lsh_pairs")))
    leak_joins = len(inspect.join_key_nodes(_q(spark, "split_leakage")))
    assert leak_joins == lsh_joins, (lsh_joins, leak_joins)


def test_winsorized_bounds_are_broadcast(spark):
    """The per-group percentile bounds frame is group-key scale; the
    clip join must broadcast it (3 exchanges total: bounds agg, summary
    agg, output sort — never a shuffle of events for the join)."""
    df = _q(spark, "winsorized_stats")
    assert inspect.uses_broadcast_join(df)
    assert inspect.exchange_count(df) <= 3, inspect.exchange_count(df)


def test_token_ids_vocab_is_broadcast(spark):
    """The encode join's vocab side is FIXED-SIZE (vocab_size rows), so
    it must broadcast — re-shuffling the exploded token stream to meet
    a shuffle join here would be the corpus-scale mistake."""
    df = _q(spark, "token_ids")
    assert inspect.uses_broadcast_join(df)
    assert inspect.exchange_count(df) <= 3, inspect.exchange_count(df)


def test_funnel_conversion_is_single_exchange(spark):
    """The three funnel stages are chained window minimums over one user
    partitioning, the per-user rollup reuses it, and the final global
    aggregate partial-aggregates — one exchange for the whole funnel."""
    from egal_yet_another_earthquake_project_spark.workloads_ext import (
        q_funnel_conversion,
    )

    df = q_funnel_conversion(spark, TESTDATA_SMOKE)
    assert inspect.exchange_count(df) == 1


def test_tfidf_term_join_never_hint_broadcast(spark):
    """The tf⋈df join key is vocabulary-scale on BOTH sides (Zipf-headed
    term frequencies): neither side may be hint-broadcast — at 100 TB the
    vocabulary is far beyond broadcast size. Only the one-row ndocs
    scalar broadcasts. Applies to both the plain and max_df-capped
    variants (the cap filters dfreq BEFORE the join, under the same
    shuffle)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for qname in ("tfidf_keywords", "tfidf_keywords_capped"):
            nodes = inspect.join_key_nodes(_q(spark, qname))
            term = [n for n, keys in nodes if "term" in keys]
            assert term, f"{qname}: no term join found in plan"
            assert all(
                n in ("SortMergeJoin", "ShuffledHashJoin") for n in term
            ), f"{qname}: term join planned as {term}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_gopher_flags_report_is_one_exchange(spark):
    """The Gopher rule pass is map-only (flags fused into the scan); the
    per-source report's only shuffle carries (source, rule-vector)
    partial aggregates — one exchange before the output sort."""
    df = _q(spark, "gopher_quality_flags")
    plan = inspect.formatted_plan(df)
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    # partial agg -> one hash exchange on source -> final agg -> sort
    assert inspect.exchange_count(df) <= 2, inspect.exchange_count(df)


def test_perplexity_buckets_never_sorts_or_cartesians_the_corpus(spark):
    """The tercile cutoffs must come from the histogram grid, never a
    global sort/percentile of the scored corpus, and the cutoff join
    must be the one-row broadcast (the only nested-loop in the plan) —
    a real cartesian or a corpus-wide Sort here is the scale killer."""
    df = _q(spark, "perplexity_buckets")
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the single BroadcastNestedLoopJoin is the one-row cutoffs frame
    # (formatted plans print each node twice: tree + detail header)
    assert plan.count(") BroadcastNestedLoopJoin") == 1
    # bin-cum window sorts OCCUPIED BINS (dimension-scale) and the output
    # sorts <=3 bucket rows; the scored corpus itself must never feed a
    # rangepartitioning exchange
    import re

    for m in re.finditer(r"Exchange rangepartitioning\(([^)]*)\)", plan):
        assert "bucket" in m.group(1), m.group(0)


def test_bench_materializer_preserves_count_eliminated_subtrees(spark):
    """The r10 bench-honesty hole and its fix, pinned as a plan
    property: under count() Catalyst eliminates asof_join's
    cardinality-preserving joins and windows (so a count-timed bench
    row measured a cheaper plan than the declared query), while the
    bit_xor-of-row-hash materializer bench.py now times references
    every output column and preserves every heavy node."""
    import bench

    df = _q(spark, "asof_join")
    full = bench._plan_nodes(df)
    counted = bench._plan_nodes(df.groupBy().count())
    forced = bench._plan_nodes(bench._forced_form(df))
    assert full["join"] > 0 and full["window"] > 0
    # the hole: count() drops joins AND windows from the plan
    assert counted["join"] < full["join"]
    assert counted["window"] < full["window"]
    # the fix: the timed form carries them all
    assert all(forced[k] >= full[k] for k in full), (forced, full)


def test_bm25_score_sum_is_partial_aggregated(spark):
    """Round 13: quantized_score_sum replaced the collect_list +
    ordered-fold accumulation with an integer-grid long SUM — the plan
    property that matters at 100 TB is that the per-(query, doc) score
    aggregation now PARTIALLY aggregates map-side (partial_sum of the
    floored grid) before its exchange, where collect_list forced every
    (doc, term) contribution row through the shuffle un-combined. Also
    assert the buffer-heavy ObjectHashAggregate (the collect_list
    executor) is gone from the whole query."""
    plan = inspect.formatted_plan(_q(spark, "bm25_per_query"))
    assert "partial_sum(FLOOR(" in plan, plan[:2000]
    assert "collect_list" not in plan
    assert "ObjectHashAggregate" not in plan
