"""Persisted BM25 inverted index: build once, search many — the product
form of ``llm.search.bm25_scores_per_query`` (VERDICT r11 ask #4).

The from-scratch scorer re-tokenizes the corpus and rebuilds postings on
EVERY call — at 100 TB each keyword query pays a full corpus scan. A
search stack tokenizes once:

* **build** (once per corpus version): tokenize, compute the
  (doc_id, term, tf) postings with each doc's length ``dl`` denormalized
  inline (search then needs NO corpus-scale lens join), the per-term
  document frequencies, and the global (Σdl, N) statistics; write the
  postings PARTITIONED BY a term hash-bucket — the layout IS the index.
* **search** (per query batch): tokenize the query side, map its terms
  to their buckets (≤ |query terms| values however large the corpus is),
  and scan ONLY those buckets' directories via a STATIC partition filter;
  a broadcast semi-join on the exact terms prunes the rest of the bucket.
  df/stats come from the tiny sidecars — broadcast, never shuffled.

Versioned layout — the same CURRENT/``_COMPLETE`` machinery as
``llm.ann_index`` (its helpers are imported, not re-implemented), so a
reader always resolves one complete (postings, dfreq, stats) triple and
a crash mid-rebuild leaves the live version untouched::

    {index_dir}/CURRENT            "v=N", written LAST via atomic replace
    {index_dir}/v=N/postings/      (doc_id, term, tf, dl) partitioned by
                                   _tb = pmod(xxhash64(term), n_buckets)
    {index_dir}/v=N/dfreq/         (term, df)   — the DF sidecar
    {index_dir}/v=N/stats.json     {"sdl", "ndocs", "n_buckets", "k1", "b"}
    {index_dir}/v=N/_COMPLETE      staged-complete marker

At 100 TB: search-side corpus bytes = the probed buckets' postings (a
|query terms| / n_buckets fraction, further min/max-pruned by the term
semi-join), one candidate-scale shuffle for the per-(query, doc) fold,
zero corpus shuffles. ``n_buckets`` sizes like any hash layout: high
enough that one bucket fits a task, low enough that tiny queries don't
fan out over thousands of directories (√(corpus terms) is a fine rule).

Scores are BIT-IDENTICAL to the from-scratch path: same tokenizer, same
contribution arithmetic, same term-sorted left fold — asserted by the
``bm25_index_topk`` declared query hash-matching ``bm25_per_query``'s
oracle, and by tests/test_search_index.py's staleness/rebuild checks.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark import fsutil
from egal_yet_another_earthquake_project_spark.llm import text as ltx
from egal_yet_another_earthquake_project_spark.llm.ann_index import (
    _list_versions,
    _set_current,
    resolve_index_dir,
)
from egal_yet_another_earthquake_project_spark.llm.search import (
    DEFAULT_B,
    DEFAULT_K1,
)

DEFAULT_TERM_BUCKETS = 64


def _term_bucket(term, n_buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(int(n_buckets))).cast("int")


def build_bm25_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> None:
    """Tokenize once, persist the inverted index as the next version
    under ``index_dir`` (v=1 for a fresh dir), then flip CURRENT.
    Build cost: one corpus scan + one (doc, term) grouping shuffle +
    one bucket-partitioned write — entirely linear."""
    version = (_list_versions(index_dir) or [0])[-1] + 1
    root = f"{index_dir}/v={version}"
    spark = docs.sparkSession

    tokd = ltx.tokenized(docs, text_col).select(
        F.col(id_col).alias("doc_id"), F.col("_toks")
    )
    lens = tokd.select("doc_id", F.size("_toks").alias("dl"))
    tf = (
        tokd.select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    postings = tf.join(lens, "doc_id").withColumn(
        "_tb", _term_bucket(F.col("term"), n_buckets)
    )
    (
        postings.write.mode("overwrite")
        .partitionBy("_tb")
        .parquet(f"{root}/postings")
    )
    # df over the PERSISTED postings (one row per (doc, term), so a
    # count per term) — tiny relative to the corpus, its own sidecar so
    # search never aggregates corpus-scale data
    (
        spark.read.parquet(f"{root}/postings")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .write.mode("overwrite")
        .parquet(f"{root}/dfreq")
    )
    stats = lens.agg(
        F.sum("dl").alias("sdl"), F.count("*").alias("ndocs")
    ).collect()[0]
    fsutil.write_text_overwrite(
        spark,
        f"{root}/stats.json",
        json.dumps(
            {
                "sdl": int(stats["sdl"]),
                "ndocs": int(stats["ndocs"]),
                "n_buckets": int(n_buckets),
                "k1": float(k1),
                "b": float(b),
            }
        )
        + "\n",
    )
    fsutil.write_text_overwrite(spark, f"{root}/_COMPLETE", "complete\n")
    _set_current(index_dir, version)
    # GC: keep the new version and its immediate predecessor (grace for
    # in-flight readers that resolved before the pointer flip) — the
    # ann_index rebuild discipline, so repeated rebuilds don't accrete
    # dead postings copies
    keep = {version, version - 1}
    for v in _list_versions(index_dir):
        if v not in keep:
            fsutil.delete(spark, f"{index_dir}/v={v}")


def search_bm25_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Per-query BM25 scores for a query batch against the persisted
    index — (query_id, doc_id, score, n_terms), bit-identical to
    ``bm25_scores_per_query`` over the same corpus.

    One CURRENT resolve pins the (postings, dfreq, stats) triple. The
    probed-bucket set is ≤ the query batch's distinct terms (collected —
    bounded by the batch, never the corpus) and becomes a STATIC
    partition filter on the postings scan; the exact-term broadcast
    semi-join prunes within the probed buckets map-side.
    """
    root = resolve_index_dir(index_dir)
    text = fsutil.read_text(spark, f"{root}/stats.json")
    if text is None:
        raise ValueError(f"no stats.json under {root} — index not built?")
    stats = json.loads(text)
    k1, b = float(stats["k1"]), float(stats["b"])

    qterms = (
        ltx.tokenized(queries, query_text_col)
        .select(F.col(query_id_col), F.explode("_toks").alias("term"))
        .distinct()
    )
    buckets = sorted(
        {
            r["_tb"]
            for r in qterms.select(
                _term_bucket(F.col("term"), stats["n_buckets"]).alias("_tb")
            )
            .distinct()
            .collect()
        }
    )
    bucket_filter = (
        F.col("_tb").isin(buckets) if buckets else F.lit(False)
    )
    postings = (
        spark.read.parquet(f"{root}/postings")
        .filter(bucket_filter)
        .join(F.broadcast(qterms.select("term").distinct()), "term", "semi")
    )
    dfreq = spark.read.parquet(f"{root}/dfreq").join(
        F.broadcast(qterms.select("term").distinct()), "term", "semi"
    )
    scored = postings.join(F.broadcast(dfreq), "term")
    idf = F.log(
        (F.lit(stats["ndocs"]) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm_len = (
        F.col("dl").cast("double") * F.lit(stats["ndocs"]) / F.lit(stats["sdl"])
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * norm_len)
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    per_doc_term = scored.select("doc_id", "term", contrib.alias("_c"))
    return (
        per_doc_term.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, "doc_id")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("term"), F.col("_c")))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["_c"],
                ),
                4,
            ).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )
