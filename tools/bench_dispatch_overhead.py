"""Focused measurement of the ann_search front-door overhead vs calling
the winning path directly (VERDICT r5 #1): 1M vectors, 256 cells,
nprobe=16 — dispatch_500q must track search_serving, dispatch_50q must
track the exact BLAS scan, both within ~10%.

Usage: python tools/bench_dispatch_overhead.py [n]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.config import HawkParams  # noqa: E402
from hawk_pack_spark.operators import hnsw  # noqa: E402
from hawk_pack_spark.operators.similarity import ivf_build, l2_topk_numpy  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cells, nprobe, n_queries = max(8, n // 4000), 16, 500
    spark = get_spark("bench-dispatch-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    params = HawkParams.new(64, 48, 16)
    vecs = (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: F.sin(F.col("id") * i * 0.7 + i * i * 1.3),
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    queries = (
        vecs.where(F.col("vec_id") % (n // n_queries) == 7)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    queries.count()
    q50 = queries.limit(50).localCheckpoint()
    q50.count()

    t0 = time.perf_counter()
    assigned, _ = ivf_build(vecs, n_clusters=cells, max_iter=5,
                            fit_fraction=min(1.0, 50_000 / n))
    asg = hnsw.balance_assignments(
        assigned.select("vec_id", F.col("cluster").alias("shard")),
        max_cell=(3 * n) // (2 * cells),
    ).localCheckpoint()
    num_shards = 1 + asg.agg(F.max("shard")).collect()[0][0]
    index = hnsw.build_index(
        vecs, metric="l2_sq", params=params, num_shards=num_shards,
        assignments=asg,
    ).localCheckpoint()
    index.count()
    print(f"build {time.perf_counter() - t0:.1f}s shards={num_shards}", flush=True)
    cents = hnsw.shard_centroids(index, "l2_sq").collect()
    slim = vecs.select("vec_id", F.col("embedding").alias("vec"))

    def t(name, thunk, reps=2):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            thunk().count()
            times.append(time.perf_counter() - t0)
        print(f"{name}: {[round(x, 2) for x in times]}", flush=True)

    t("serving_direct_500q", lambda: hnsw.search_serving(
        index, queries, k=10, metric="l2_sq", params=params,
        nprobe_shards=nprobe, centroids=cents))
    t("dispatch_500q", lambda: hnsw.ann_search(
        index, queries, k=10, metric="l2_sq", params=params,
        nprobe_shards=nprobe, centroids=cents, vectors_df=slim))
    t("blas_direct_50q", lambda: l2_topk_numpy(vecs, q50, k=10))
    t("dispatch_50q", lambda: hnsw.ann_search(
        index, q50, k=10, metric="l2_sq", params=params,
        nprobe_shards=nprobe, centroids=cents, vectors_df=slim))
    # the no-cache path: centroids memoized on the handle after call 1
    t("dispatch_500q_nocents", lambda: hnsw.ann_search(
        index, queries, k=10, metric="l2_sq", params=params,
        nprobe_shards=nprobe, vectors_df=slim), reps=3)
    spark.stop()


if __name__ == "__main__":
    main()
