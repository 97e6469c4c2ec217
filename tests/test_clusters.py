"""Connected-components unit tests: chains, disjoint groups, convergence."""

from __future__ import annotations

from egal_yet_another_earthquake_project_spark.llm.clusters import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_chain_collapses_to_one_component(spark):
    # A-B, B-C, C-D: transitive closure even though A-D never emitted
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_apart(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(5, 1)]) == {1: 1, 5: 1}


def test_long_chain_within_iteration_budget(spark):
    # diameter 12 chain — min-label propagation halves distance per round
    edges = [(i, i + 1) for i in range(1, 13)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}


def test_kmeans_partition_invariant(spark):
    """The integer-grid k-means must produce IDENTICAL summaries however
    the input is partitioned — the property float k-means lacks (ulp
    drift through argmin) and the reason the grid exists."""
    from egal_yet_another_earthquake_project_spark.llm.clustering import (
        kmeans_clusters,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_clusters(emb, k=4, iters=2).collect()
    b = kmeans_clusters(emb.repartition(13), k=4, iters=2).collect()
    assert a == b
    assert sum(r.n for r in a) == emb.count()


def test_kmeans_assignment_is_shuffle_free(spark):
    """The assignment pass is a pure projection against literal
    centroids — zero exchanges; only the update step may shuffle."""
    from egal_yet_another_earthquake_project_spark.llm.clustering import (
        _assign,
        _quantized,
    )
    from egal_yet_another_earthquake_project_spark.plans import inspect

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _quantized(emb, "vec_id", "embedding")
    seed = [(i, list(r.qv)) for i, r in enumerate(q.orderBy("vid").limit(4).collect())]
    assigned = _assign(q, seed)
    assert inspect.exchange_count(assigned) == 0, inspect.formatted_plan(assigned)


def test_pagerank_star_graph_matches_hand_iteration(spark):
    """Symmetric 5-leaf star, 3 rounds from uniform: the hand-rolled
    integer iteration gives center 661083330 and leaves 67783333 μ-units
    (oscillating toward the 0.473 stationary center mass); mass loss to
    integer flooring stays under 10 μ-units per round."""
    from egal_yet_another_earthquake_project_spark.llm.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i, 1) for i in range(1, 6)] + [(i, 0, 1) for i in range(1, 6)],
        "src int, dst int, w int",
    )
    got = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}
    assert got[0] == 661_083_330
    assert all(got[i] == 67_783_333 for i in range(1, 6))
    assert 10**9 - sum(got.values()) < 30


def test_pagerank_partition_invariant(spark):
    from egal_yet_another_earthquake_project_spark.llm.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23, 1 + i % 4) for i in range(23)]
        + [((i * 7 + 3) % 23, i, 1 + i % 4) for i in range(23)],
        "src int, dst int, w int",
    )
    a = sorted(map(tuple, pagerank(edges, iterations=4).collect()))
    b = sorted(map(tuple, pagerank(edges.repartition(11), iterations=4).collect()))
    assert a == b


def test_pagerank_weight_pull(spark):
    """A vertex receiving the heavier edge from a common source must
    outrank the lighter sibling."""
    from egal_yet_another_earthquake_project_spark.llm.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)],
        "src int, dst int, w int",
    )
    got = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}
    assert got[1] > got[2]


def test_components_driver_and_distributed_paths_agree(spark):
    """The union-find fast path and the propagation loop are
    bit-identical on a graph with chains, stars, and singleton-free
    isolates — both compute min-reachable-id."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(edges, "doc_a int, doc_b int")
    fast = sorted(map(tuple, connected_components(df).collect()))
    loop = sorted(
        map(tuple, connected_components(df, driver_threshold=0).collect())
    )
    assert fast == loop


def test_components_distributed_loop_still_converges(spark):
    """Pin the distributed path explicitly (the default would take the
    driver fast path at test scale): a 15-node chain propagates one hop
    per round (within the 20-round default) and must collapse to one
    component."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc_a int, doc_b int"
    )
    out = connected_components(df, driver_threshold=0).collect()
    assert {r.component for r in out} == {0}


def test_triangle_count_hand_computed(spark):
    """K4 minus one edge = 2 triangles (abc, abd); plus a disjoint edge
    = still 2. Edges fed in mixed orientation with a duplicate —
    canonicalization dedupes to 6 distinct undirected edges."""
    from egal_yet_another_earthquake_project_spark.llm.graph import triangle_count

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),  # duplicate, reversed
            ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"),
            # c-d missing from the K4 → triangles: abc, abd
            ("x", "y"),
        ],
        "src string, dst string",
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_triangles, row.n_edges) == (2, 6)


def test_triangle_orientation_bounds_hub_fanout(spark):
    """A star (one hub, 40 leaves) has 0 triangles; with degree
    orientation every leaf points AT the hub, so the wedge join over the
    hub produces zero rows — n_wedges must be 0, not deg² ≈ 1600."""
    from egal_yet_another_earthquake_project_spark.llm.graph import triangle_count

    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(40)], "src string, dst string"
    )
    row = triangle_count(edges).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 0, "orientation failed: hub has out-wedges"


def test_semdedup_prune_drops_planted_near_twin_within_cluster(spark):
    """Two near-identical vectors (cosine ~1) must land in the same
    cluster and the HIGHER id must be dropped; well-separated vectors
    survive. Output accounting: n = n_dropped + n_kept per cluster."""
    from egal_yet_another_earthquake_project_spark.llm.clustering import (
        semdedup_prune,
    )

    dims = 64

    def vec(axis, eps=0.0):
        v = [0.01] * dims
        v[axis] = 1.0
        v[(axis + 1) % dims] += eps
        return v

    rows = [
        (1, vec(0)),          # seed + keeper (lowest id in its twin pair)
        (2, vec(20)),         # seed, far from everything
        (3, vec(40)),         # seed, far from everything
        (10, vec(0, 0.001)),  # near-twin of 1 -> same cluster, dropped
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semdedup_prune(emb, k=3, iters=1, cos_threshold=0.95).collect()
    assert sum(r.n for r in got) == 4
    assert sum(r.n_dropped for r in got) == 1
    for r in got:
        assert r.n == r.n_dropped + r.n_kept
    # the twin cluster holds 2 with exactly 1 dropped; a threshold above
    # the pair's (rounded) cosine keeps everything
    twin = [r for r in got if r.n == 2]
    assert twin and twin[0].n_dropped == 1 and twin[0].n_kept == 1
    got2 = semdedup_prune(emb, k=3, iters=1, cos_threshold=1.0001).collect()
    assert sum(r.n_dropped for r in got2) == 0


def _degenerate_corpus(spark, n_hot=30, n_rest=12, dims=16):
    """Most rows are ONE identical vector (mass-duplicated boilerplate,
    the degenerate-cluster case VERDICT r8 #2 names); every other row
    sits on its own unique axis so no non-degenerate twins exist. Ids
    are laid out so the k=3 seed is (axis-1, axis-2, hot): the hot mass
    lands alone in cluster 2, the unique-axis rest ties into cluster 0."""

    def axis(j):
        v = [0.01] * dims
        v[j] = 1.0
        return v

    rows = [(0, axis(1)), (1, axis(2))]
    rows += [(2 + i, axis(0)) for i in range(n_hot)]  # identical block
    rows += [(100 + i, axis(3 + i)) for i in range(min(n_rest, dims - 3))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_hot_cluster_cap_bounds_pair_mass(spark):
    """VERDICT r8 Next #1: a degenerate cluster holding 50% of rows must
    not pay |c|² candidate pairs. With the anchor cap the hot cluster's
    candidate mass is |c| × anchors; drop verdicts are UNCHANGED in the
    degenerate case because every member matches the min-id anchor."""
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm.clustering import (
        _assign,
        _capped_pair_candidates,
        _quantized,
        semdedup_prune,
    )

    emb = _degenerate_corpus(spark)
    # replicate the iters=1 final assignment (assign against the seed)
    q = _quantized(emb, "vec_id", "embedding")
    seed = q.orderBy("vid").limit(3).collect()
    assigned = _assign(q, [(i, list(r.qv)) for i, r in enumerate(seed)])
    n2 = F.aggregate(
        F.zip_with("qv", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    with_norm = assigned.select("cluster", "vid", "qv", n2.alias("n2"))
    sizes = {
        r.cluster: r.n
        for r in with_norm.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    hot = sorted(c for c, n in sizes.items() if n > 15)
    assert hot, "planted cluster failed to exceed the cap"
    hot_n = max(sizes[c] for c in hot)
    assert hot_n >= 30  # the planted degenerate mass landed in one cluster

    uncapped = _capped_pair_candidates(with_norm, [], 0).count()
    capped = _capped_pair_candidates(with_norm, hot, 2).count()
    assert uncapped >= hot_n * (hot_n - 1) // 2  # quadratic without cap
    assert capped < uncapped
    # hot cluster contributes <= |c| * anchors; the rest is unchanged
    rest_pairs = sum(
        n * (n - 1) // 2 for c, n in sizes.items() if c not in hot
    )
    assert capped <= rest_pairs + hot_n * 2

    # end-to-end: capped run returns the same per-cluster verdicts as
    # the uncapped run (degenerate members all match the min-id anchor)
    base = sorted(
        map(
            tuple,
            semdedup_prune(
                emb, k=3, iters=1, cos_threshold=0.95,
                max_cluster_size=1_000_000,
            ).collect(),
        )
    )
    guarded = sorted(
        map(
            tuple,
            semdedup_prune(
                emb, k=3, iters=1, cos_threshold=0.95,
                max_cluster_size=15, hot_cluster_anchors=2,
            ).collect(),
        )
    )
    assert guarded == base
    hot_row = [r for r in guarded if r[1] >= 30][0]
    assert hot_row[2] == hot_row[1] - 1  # all but the min-id keeper drop


def test_semdedup_prune_releases_all_cached_blocks(spark):
    """VERDICT r8 #1 / ADVICE: repeated semdedup_prune calls in a
    long-lived session must not accumulate cached blocks. Without a
    cache_registry the function materializes its (≤ k-row) result and
    unpersists before returning; with one, the caller releases."""
    from egal_yet_another_earthquake_project_spark.llm.clustering import (
        semdedup_prune,
    )

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    assert n_persistent() == 0

    emb = _degenerate_corpus(spark)
    for _ in range(3):
        out = semdedup_prune(emb, k=3, iters=1, cos_threshold=0.95)
        assert out.count() >= 1
    assert n_persistent() == 0, "semdedup_prune leaked cached blocks"

    registry = []
    out = semdedup_prune(
        emb, k=3, iters=1, cos_threshold=0.95, cache_registry=registry
    )
    assert out.count() >= 1
    assert registry and n_persistent() > 0  # caller owns the release
    for frame in registry:
        frame.unpersist()
    assert n_persistent() == 0
