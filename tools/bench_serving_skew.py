"""Hot-shard serving skew (VERDICT r5 #8): a query batch where every
query routes to the SAME nprobe shards serializes on those shards'
tasks, while uniform batches spread over all shards. Measure the
adversarial-vs-uniform gap at 1M and the effect of query-side
splitting if enabled.

Usage: python tools/bench_serving_skew.py [n] [n_queries]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.config import HawkParams  # noqa: E402
from hawk_pack_spark.operators import hnsw  # noqa: E402
from hawk_pack_spark.operators.similarity import ivf_build  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cells, nprobe = max(8, n // 4000), 16
    spark = get_spark("bench-serving-skew")
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
    cents = hnsw.shard_centroids(index, "l2_sq").collect()
    print(f"built {num_shards} shards", flush=True)

    # uniform: every query a distinct vector spread across the corpus
    uni = (
        vecs.where(F.col("vec_id") % (n // nq) == 7)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"))
        .localCheckpoint()
    )
    uni.count()
    # adversarial: nq jittered clones of ONE vector — all route to the
    # same nprobe shards
    v0 = vecs.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    rng = np.random.default_rng(7)
    adv_rows = [
        (i, (np.asarray(v0) + rng.normal(0, 1e-4, 64)).tolist())
        for i in range(nq)
    ]
    adv = spark.createDataFrame(
        adv_rows, "query_id long, query_vec array<double>"
    ).localCheckpoint()
    adv.count()

    for name, q in (("uniform", uni), ("adversarial", adv)):
        for rep in range(2):
            t0 = time.perf_counter()
            hnsw.search_serving(
                index, q, k=10, metric="l2_sq", params=params,
                nprobe_shards=nprobe, centroids=cents,
            ).count()
            print(f"serving_{name}_{nq}q rep{rep}: "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
