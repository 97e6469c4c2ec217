"""Connected components — dedup-cluster assembly over near-dup pairs.

Pairwise near-dup detection (Jaccard/LSH/embedding) yields edges; picking
one representative per *transitive* group needs connected components: doc
A ~ B and B ~ C must collapse to one cluster even when A ~ C was never
emitted. Implemented as distributed min-label propagation — each
iteration is a join + aggregate (fully partition-parallel); the driver
loop only checks convergence counts. Rounds needed = graph diameter,
which for near-dup clusters is tiny (copies of a common original form
stars). This is the engine's representative *iterative* algorithm: not
expressible as one SQL query in Spark, but oracle-checkable via a
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Label every vertex of the undirected edge set with the minimum
    vertex id reachable from it. Output: ``node, component``.

    Min-label propagation: labels only decrease, so convergence is
    monotone; iteration stops when no label changed. Each round shuffles
    by vertex id — at scale, pre-partition the edge list on ``src``.

    Scale-adaptive fast path: near-dup edge sets are usually a tiny
    corpus fraction, and the distributed loop's per-round fixed cost
    (join + aggregate + checkpoint + convergence count ≈ 3 jobs) then
    dominates the actual work. When the symmetric edge count is ≤
    ``driver_threshold`` (2 M pairs ≈ 32 MB — the same bounded-driver
    argument as the k-means centroid collect), the edges are collected
    into a union-find with min-representatives, which is BIT-IDENTICAL
    to the converged propagation (both compute min reachable id).
    Measured in the curate job at sf0.1: 2.75 s → ~0.6 s. Pass
    ``driver_threshold=0`` to force the distributed loop.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    if driver_threshold and sym.count() <= 2 * driver_threshold:
        return _driver_union_find(sym)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    # localCheckpoint truncates lineage each round — without it the logical
    # plan doubles per iteration (join referencing the previous round's
    # plan) and analysis itself blows up long before the data does.
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Carry the previous label through the update so convergence is
        # a filter on the checkpointed frame — not a second join of new
        # vs old labels (labels only decrease, so changed ⇔ label <
        # previous). Two jobs per round instead of three; the count
        # reads checkpointed data, re-shuffling nothing.
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.col("label").alias("_prev"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("label") < F.col("_prev")).count()
        labels = stepped.drop("_prev")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Union-find over a collected (already size-gated) symmetric edge
    list; each set's representative is its MINIMUM member, matching the
    propagation loop's fixed point exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in sym.collect():
        a, b = row.a, row.b
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN so the root is always the set minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    spark = sym.sparkSession
    node_type = sym.schema["a"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("component", node_type, False),
        ]
    )
    return spark.createDataFrame(rows, schema)
