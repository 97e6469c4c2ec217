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


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every vertex of the undirected edge set with the minimum
    vertex id reachable from it. Output: ``node, component``.

    Min-label propagation: labels only decrease, so convergence is
    monotone; iteration stops when no label changed. Each round shuffles
    by vertex id — at scale, pre-partition the edge list on ``src``.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
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
