"""Record-linkage and keyword workload: blocked fuzzy matching, TF-IDF
keyword extraction, and weighted priority sampling over the documents
table — entity-resolution and data-mixing passes a training pipeline
runs beyond the shingle/MinHash dedup family.

Oracles reuse the canonical normalization SQL from ``workloads_llm``
(imported, not re-derived) so Spark and DuckDB see identical text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from egal_yet_another_earthquake_project_spark.llm import linkage as llk
from egal_yet_another_earthquake_project_spark.llm import sampling as lsamp
from egal_yet_another_earthquake_project_spark.sources.files import read_table
from egal_yet_another_earthquake_project_spark.workloads_llm import _NORM

FUZZY_BLOCK_CHARS = 16
FUZZY_PROBE_CHARS = 64
FUZZY_MAX_DIST = 8
FUZZY_MAX_BLOCK = 50

TFIDF_TOP_N = 3

WRS_K = 100
WRS_SALT = "wrs"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def q_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: doc pairs whose normalized-text
    64-char prefixes are within 8 edits, blocked on the 16-char prefix
    (equi-join, never all-pairs) with quadratic-hot-block cap."""
    return llk.blocked_fuzzy_pairs(
        _docs(spark, sf_dir),
        block_chars=FUZZY_BLOCK_CHARS,
        probe_chars=FUZZY_PROBE_CHARS,
        max_dist=FUZZY_MAX_DIST,
        max_block=FUZZY_MAX_BLOCK,
    ).orderBy("doc_a", "doc_b")


_FUZZY_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS doc,
         substring({_NORM}, 1, {FUZZY_BLOCK_CHARS}) AS blk,
         substring({_NORM}, 1, {FUZZY_PROBE_CHARS}) AS probe
  FROM documents
),
ok AS (
  SELECT blk FROM base GROUP BY blk HAVING count(*) <= {FUZZY_MAX_BLOCK}
),
c AS (SELECT base.* FROM base JOIN ok USING (blk))
SELECT a.doc AS doc_a, b.doc AS doc_b,
       CAST(levenshtein(a.probe, b.probe) AS INTEGER) AS edit_dist
FROM c a JOIN c b ON a.blk = b.blk AND a.doc < b.doc
WHERE levenshtein(a.probe, b.probe) <= {FUZZY_MAX_DIST}
ORDER BY doc_a, doc_b
"""


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document, ranked on the rounded score
    with term as tiebreak (stable across engines)."""
    return llk.tfidf_keywords(_docs(spark, sf_dir), top_n=TFIDF_TOP_N).orderBy(
        "doc_id", "rank"
    )


# _TOKS-equivalent inline: unnest of the normalized token split; empty
# docs contribute no rows (explode semantics on both engines).
_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents
  WHERE length({_NORM}) > 0
),
tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY doc, term),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
stats AS (SELECT count(DISTINCT doc_id) AS ndocs FROM documents),
scored AS (
  SELECT doc, term,
         round(tf * ln((ndocs + 1.0) / (df_t + 1.0)), 4) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
ranked AS (
  SELECT doc, term, score,
         row_number() OVER (PARTITION BY doc
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc AS doc_id, term, score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TFIDF_TOP_N}
ORDER BY doc_id, rank
"""


#: max_df cap for the capped keyword variant: terms in more than half
#: the corpus are stopwords-by-construction and never surface.
TFIDF_MAX_DF = 0.5


def q_tfidf_keywords_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tfidf_keywords with the Zipf-head cap on (max_df_frac=0.5):
    corpus-stopword terms are dropped before the tf⋈df join, removing
    the head fan at its source — the 100 TB-default configuration."""
    return llk.tfidf_keywords(
        _docs(spark, sf_dir), top_n=TFIDF_TOP_N, max_df_frac=TFIDF_MAX_DF
    ).orderBy("doc_id", "rank")


_TFIDF_CAPPED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents
  WHERE length({_NORM}) > 0
),
tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY doc, term),
stats AS (SELECT count(DISTINCT doc_id) AS ndocs FROM documents),
dfreq AS (
  SELECT term, count(*) AS df_t FROM tf GROUP BY term
  HAVING count(*) <= (SELECT {TFIDF_MAX_DF} * ndocs FROM stats)
),
scored AS (
  SELECT doc, term,
         round(tf * ln((ndocs + 1.0) / (df_t + 1.0)), 4) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
ranked AS (
  SELECT doc, term, score,
         row_number() OVER (PARTITION BY doc
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc AS doc_id, term, score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TFIDF_TOP_N}
ORDER BY doc_id, rank
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-Res priorities,
    md5-deterministic): the 100 documents with the largest u^(1/w) for
    w = n_chars — partial top-k per partition, no input shuffle."""
    return lsamp.weighted_priority_sample(
        _docs(spark, sf_dir), "doc_id", "n_chars", k=WRS_K, salt=WRS_SALT
    ).orderBy("doc_id")


_WRS_ORACLE = f"""
WITH b AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         pow((CAST('0x' || substring(md5('{WRS_SALT}' ||
                 CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1.0)
             / 4294967296.0,
             1.0 / n_chars) AS key
  FROM documents
),
top AS (
  SELECT doc_id, weight, round(key, 4) AS priority
  FROM b ORDER BY key DESC, doc_id ASC LIMIT {WRS_K}
)
SELECT doc_id, weight, priority FROM top ORDER BY doc_id
"""




def q_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-grid weighted PageRank (3 rounds, d=0.85) over the
    customer↔supplier trade graph (edge weight = lineitem count via
    orders, symmetric so no vertex dangles) — random-walk centrality as
    the authority signal. Every step is integer arithmetic, so the
    DuckDB oracle replays the unrolled iterations and the ranks
    hash-match exactly. See ``llm/graph.py``."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm.graph import pagerank

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eo = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").alias("w"))
    )
    # Symmetrize with one explode instead of a self-union: a union of
    # two selects over `eo` evaluates the fact-table join + aggregate
    # TWICE (Catalyst doesn't dedupe common subplans) — measured ~1 s of
    # the query at sf0.1.
    c_node = F.concat(F.lit("c"), F.col("o_custkey"))
    s_node = F.concat(F.lit("s"), F.col("l_suppkey"))
    edges = eo.select(
        F.explode(
            F.array(
                F.struct(c_node.alias("src"), s_node.alias("dst"), F.col("w")),
                F.struct(s_node.alias("src"), c_node.alias("dst"), F.col("w")),
            )
        ).alias("_e")
    ).select("_e.*")
    return pagerank(edges, iterations=3).orderBy("node")


_PR_EDGES = """
eo AS (
  SELECT o_custkey AS c, l_suppkey AS s, count(*) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT 'c' || CAST(c AS VARCHAR) AS src, 's' || CAST(s AS VARCHAR) AS dst, w
  FROM eo
  UNION ALL
  SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR), w FROM eo
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
tot AS (SELECT src, sum(w) AS wt FROM edges GROUP BY src),
e AS (SELECT src, dst, w, wt FROM edges JOIN tot USING (src))
"""


def _pr_round(prev: str, this: str) -> str:
    return f"""
{this} AS (
  SELECT node,
         ((CAST(1000000000 AS BIGINT) * 15) // (100 * n))
           + (coalesce(x.s85, 0) * 85) // 100 AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT dst, sum((rank * w) // wt) AS s85
    FROM e JOIN {prev} ON {prev}.node = e.src
    GROUP BY dst
  ) x ON x.dst = nodes.node
)"""


_PAGERANK_ORACLE = (
    "WITH "
    + _PR_EDGES.strip().rstrip()
    + ",\nr0 AS (SELECT node, CAST(1000000000 AS BIGINT) // n AS rank FROM nodes CROSS JOIN nn),"
    + _pr_round("r0", "r1")
    + ","
    + _pr_round("r1", "r2")
    + ","
    + _pr_round("r2", "r3")
    + "\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node"
)


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts sharing an
    order are connected) via degree-ordered edge orientation — the
    O(m^1.5) community-density census (llm/graph.py:triangle_count).
    The per-order self-join fan is bounded by items-per-order (≤7 in
    this schema); orientation bounds every wedge-join key at O(√m) even
    for hub parts. The oracle replays the identical orientation (string
    comparisons mirrored) so all three counts hash-match."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm.graph import triangle_count

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    x = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    y = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    edges = (
        x.join(y, "o")
        .filter(F.col("p1") != F.col("p2"))
        .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
    )
    return triangle_count(edges)


# String comparisons mirror triangle_count's cast-to-string
# canonicalization exactly (lexicographic on both engines).
_TRIANGLE_ORACLE = """
WITH raw AS (
  SELECT CAST(a.l_partkey AS VARCHAR) AS p1, CAST(b.l_partkey AS VARCHAR) AS p2
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
und AS MATERIALIZED (
  SELECT DISTINCT least(p1, p2) AS u, greatest(p1, p2) AS v FROM raw
),
deg AS MATERIALIZED (
  SELECT x, count(*) AS d
  FROM (SELECT u AS x FROM und UNION ALL SELECT v FROM und)
  GROUP BY x
),
o AS MATERIALIZED (
  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN u ELSE v END AS lo,
         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN v ELSE u END AS hi
  FROM und JOIN deg d1 ON d1.x = und.u JOIN deg d2 ON d2.x = und.v
),
w AS MATERIALIZED (
  SELECT e1.lo AS a, e2.hi AS c
  FROM o e1 JOIN o e2 ON e1.hi = e2.lo
  WHERE e1.lo <> e2.hi
),
t AS (
  SELECT count(*) AS n_triangles
  FROM w WHERE EXISTS (
    SELECT 1 FROM und
    WHERE und.u = least(w.a, w.c) AND und.v = greatest(w.a, w.c))
)
SELECT CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM w) AS BIGINT) AS n_wedges
FROM t
"""


QUERIES = {
    "copurchase_triangles": q_copurchase_triangles,
    "trade_pagerank": q_trade_pagerank,
    "fuzzy_matches": q_fuzzy_matches,
    "tfidf_keywords": q_tfidf_keywords,
    "tfidf_keywords_capped": q_tfidf_keywords_capped,
    "weighted_sample": q_weighted_sample,
}

ORACLES = {
    "copurchase_triangles": _TRIANGLE_ORACLE,
    "trade_pagerank": _PAGERANK_ORACLE,
    "fuzzy_matches": _FUZZY_ORACLE,
    "tfidf_keywords": _TFIDF_ORACLE,
    "tfidf_keywords_capped": _TFIDF_CAPPED_ORACLE,
    "weighted_sample": _WRS_ORACLE,
}
