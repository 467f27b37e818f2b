"""knn_join scale ladder: wall time and sampled recall as the corpus
doubles with the operator's auto cell sizing (n_clusters = n/250, so
per-point candidate work is CONSTANT and total work should scale
~linearly — the 100 TB contract stated in the docstring, measured here).

Usage: python tools/bench_knn_join_scale.py [sizes...]  (default 25000
50000 100000). KNN_JOIN_ROUNDS overrides descent_rounds (default 1) —
the r8 verdict's designed recall lever for the drift at 200k.
Synthetic seeded vectors (64-d, mixture of 32 Gaussian
clusters + iid noise — harder than pure clusters, kinder than pure iid).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from hawk_pack_spark.operators.knn_exact import knn_exact  # noqa: E402
from hawk_pack_spark.operators.similarity import knn_join  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def make_vectors(spark, n: int, dim: int = 64, seed: int = 7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(32, dim))
    assign = rng.integers(0, 32, size=n)
    mat = centers[assign] + 0.6 * rng.normal(size=(n, dim))
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32).localCheckpoint(eager=True)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [25_000, 50_000, 100_000]
    rounds = int(os.environ.get("KNN_JOIN_ROUNDS", "1"))
    spark = get_spark("knn-join-ladder", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    print(f"descent_rounds={rounds}")
    print("n, n_clusters, build+join_sec, recall@10(64 anchors)")
    for n in sizes:
        vecs = make_vectors(spark, n)
        anchors = (
            vecs.orderBy(F.xxhash64("vec_id"), "vec_id")
            .limit(64)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
        )
        exact = knn_exact(vecs, anchors, k=10, metric="l2_sq").localCheckpoint(
            eager=True
        )
        t0 = time.perf_counter()
        g = knn_join(
            vecs, k=10, nprobe=6, replicas=2, descent_rounds=rounds,
            n_rows=n, dim=64,
        )
        g.count()
        dt = time.perf_counter() - t0
        hit = g.join(
            exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi"
        ).count()
        print(
            f"{n}, {max(16, n // 250)}, {dt:.1f}, {hit / 640:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
