#!/usr/bin/env python
"""In-epoch A/B probe for the semdedup_prune bench residual (VERDICT r9
"What's wrong" #1): interleaved timed runs, same session, same host
window, of

  A  the current guarded form exactly as the declared query runs it
     (hot-cluster guard + eager collect-release, cache_registry=None)
  B  a faithful inline replica of the round-8 body (no persist, no
     sizes job, no guard, lazy return -> .count())
  C  the current form with a cache_registry (guard + persist + sizes
     job, but NO eager collect-release) -- isolates the eager-collect
     suspect from the sizes-job suspect.

Within-session interleaving cancels the host-epoch factor (see
SCALE.md round-7/9 notes); medians of 3 per variant, A/A calibration
bracketing, exactly like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.session import get_spark
from egal_yet_another_earthquake_project_spark.sources.files import read_table
from egal_yet_another_earthquake_project_spark.llm import clustering as C
from egal_yet_another_earthquake_project_spark.workloads_llm import (
    SEMDEDUP_COS_THRESHOLD,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


def variant_a(spark):
    """Current guarded form, exactly the declared-query call."""
    C.semdedup_prune(
        _emb(spark), k=8, iters=2, cos_threshold=SEMDEDUP_COS_THRESHOLD
    ).count()


def variant_b(spark):
    """Round-8 body replica: no persist, no sizes job, no guard, lazy
    return counted by the harness (the pre-b9cd80f/3023472 shape)."""
    emb = _emb(spark)
    q = C._quantized(emb, "vec_id", "embedding").cache()
    seed = q.orderBy("vid").limit(8).collect()
    centroids = [(i, list(r.qv)) for i, r in enumerate(seed)]
    assigned = None
    for _ in range(2):
        assigned = C._assign(q, centroids)
        centroids = C._update(assigned)

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, d: acc + d,
        )

    with_norm = assigned.select(
        "cluster", "vid", "qv", dot(F.col("qv"), F.col("qv")).alias("n2")
    )
    a = with_norm.select(
        "cluster",
        F.col("vid").alias("va"),
        F.col("qv").alias("qa"),
        F.col("n2").alias("na2"),
    )
    b = with_norm.select(
        "cluster",
        F.col("vid").alias("vb"),
        F.col("qv").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    cos = F.round(
        dot(F.col("qa"), F.col("qb")).cast("double")
        / (
            F.sqrt(F.col("na2").cast("double"))
            * F.sqrt(F.col("nb2").cast("double"))
        ),
        4,
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("va") > F.col("vb"))
        .filter(cos >= F.lit(float(SEMDEDUP_COS_THRESHOLD)))
        .select("cluster", F.col("va").alias("vid"))
        .distinct()
        .groupBy("cluster")
        .agg(F.count("*").alias("n_dropped"))
    )
    out = (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .join(dropped, "cluster", "left")
        .withColumn("n_dropped", F.coalesce(F.col("n_dropped"), F.lit(0)))
        .withColumn("n_kept", F.col("n") - F.col("n_dropped"))
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "n",
            "n_dropped",
            "n_kept",
        )
        .orderBy("cluster")
    )
    q.unpersist()
    out.count()


def variant_c(spark):
    """Current form with a registry: guard + persist + sizes job kept,
    eager collect-release skipped."""
    reg: list = []
    C.semdedup_prune(
        _emb(spark),
        k=8,
        iters=2,
        cos_threshold=SEMDEDUP_COS_THRESHOLD,
        cache_registry=reg,
    ).count()
    for df in reg:
        df.unpersist()


def _release_storage(spark):
    for (_, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
        rdd.unpersist()
    spark.catalog.clearCache()


def main():
    spark = get_spark(app_name="probe-semdedup")

    def calibrate():
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        return round(time.perf_counter() - t0, 3)

    cal_first = calibrate()
    variants = {"A_guarded_eager": variant_a, "B_r8_replica": variant_b,
                "C_guarded_registry": variant_c}
    samples: dict[str, list[float]] = {k: [] for k in variants}
    # warmup each once (codegen/JIT), not timed
    for fn in variants.values():
        fn(spark)
        _release_storage(spark)
    for _ in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark)
            samples[name].append(round(time.perf_counter() - t0, 3))
            _release_storage(spark)
    cal_last = calibrate()
    med = {k: sorted(v)[1] for k, v in samples.items()}
    out = {
        "probe": "semdedup_prune_ab",
        "sf_dir": SF_DIR,
        "calibration": [cal_first, cal_last],
        "samples": samples,
        "median": med,
        "ratio_A_over_B": round(med["A_guarded_eager"] / med["B_r8_replica"], 3),
        "ratio_C_over_B": round(med["C_guarded_registry"] / med["B_r8_replica"], 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
