"""Partition-count invariance: declared queries must produce identical
values at any parallelism (the decimal-routing / rounding rules exist for
exactly this — a 100 TB run uses thousands of partitions, the oracle one).
"""

from __future__ import annotations

import pytest

from egal_yet_another_earthquake_project_spark import workloads

from tests.conftest import TESTDATA_SMOKE

CHECKED = [
    "pricing_summary",
    "gap_series",
    "numeric_stats",
    "revenue_by_region",
    # round-2 partition-sensitive additions: salted decimal merges, the
    # promo ratio, banded simhash, and the rounded-rank IVF path.
    "salted_sums",
    "promo_revenue",
    "simhash_neardup",
    "embedding_ivf_topk",
    # this session's partition-sensitive additions: decimal thresholds
    # against global scalars, the BM25 float pipeline, nation-pair
    # decimal rollup.
    "top_parts_by_value",
    "acctbal_opportunity",
    "small_quantity_revenue",
    "nation_trade_volume",
    "bm25_search",
    "repetition_profile",
    # round-2 wave 3: the share-ratio division, double NLL sums, hybrid
    # jaccard verify, scalar-max ties, and window-folded Q21 — all
    # partition-order-sensitive if the decimal/rounding rules slip.
    "market_share",
    "unigram_nll",
    "semantic_neardup",
    "top_supplier",
    "lone_late_supplier",
    # round-3 sketch wave: hash-rank estimators and window cumsums are
    # the classic partition-order traps; these must not care.
    "kmv_distinct_users",
    "cms_token_counts",
    "alpha_resample",
    "sequence_packing",
    "embedding_quantize",
    "global_row_ids",
    # round-4 wave: interpolated-percentile clipping, floor-grid means,
    # the integer-grid k-means, decimal quality means over clusters,
    # TF-IDF float scores, and the Q9 decimal profit rollup.
    "winsorized_stats",
    "kmeans_clusters",
    "canonical_best",
    "tfidf_keywords",
    "product_profit",
    "token_ids",
    "lsh_recall",
    "interpolate_gaps",
    "zscore_outliers",
    # round-5 wave: grid-rule quantiles, sketch set algebra (hash-rank
    # arrays), batched BPE (top-K tie-breaks), SCD2 window collapse,
    # Z-order rewrite round trip (approxQuantile boundaries vary with
    # partitioning but the band RESULT must not), degree-ordered
    # triangles, capped TF-IDF.
    "hist_quantiles",
    "kmv_overlap",
    "bpe_merges",
    "priority_history",
    "zordered_band_scan",
    "copurchase_triangles",
    "tfidf_keywords_capped",
    "span_corruption",
    "line_dedup",
    "corpus_report",
    "bigram_nll",
    "source_drift",
    # round-6: frozen-model scoring (model scalars collected via first()
    # — must not vary with partitioning).
    "frozen_lm_score",
]


@pytest.mark.parametrize("name", CHECKED)
def test_partition_count_invariance(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows_low = sorted(
            tuple(r) for r in workloads.QUERIES[name](spark, TESTDATA_SMOKE).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        rows_high = sorted(
            tuple(r) for r in workloads.QUERIES[name](spark, TESTDATA_SMOKE).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert rows_low == rows_high
