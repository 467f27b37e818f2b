"""knn_join at 1M (VERDICT r8 #8, scaled to the box): one
cluster-realistic point above the 50k-200k ladder, anchoring the
linear-candidate-volume claim at 5x the previous max. Vectors are
expression-generated (spark.range + sin mixture, the tune_hnsw
clustered workload) — a 1M-row driver-side createDataFrame would be
the bottleneck, not the operator.

Usage: python tools/bench_knn_join_1m.py [n] [nprobe] [replicas] [rounds]
Defaults 1000000 6 2 1. Pass "auto" for nprobe/replicas to exercise the
DEFAULTED path (budget-aware derating, VERDICT r9 #3) — the operator
measures the candidate volume and picks the point itself. Prints one
JSON line for NOTES.md.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from hawk_pack_spark.operators.knn_exact import knn_exact  # noqa: E402
from hawk_pack_spark.operators.similarity import knn_join  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    def _arg(i: int, default):
        if len(sys.argv) <= i:
            return default
        return None if sys.argv[i] == "auto" else int(sys.argv[i])

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nprobe = _arg(2, 6)
    replicas = _arg(3, 2)
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    spark = get_spark("knn-join-1m", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    # 64-component mixture + per-point noise (tune_hnsw's clustered
    # workload — the realistic embedding shape)
    center = F.col("id") % 64
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.sin(center * i * 0.7 + i * i * 1.3)
        + F.sin(F.col("id") * i * 2.31 + i * 0.17) * 0.1,
    )
    vecs = (
        spark.range(n)
        .repartition(128)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .localCheckpoint(eager=True)
    )
    anchors = (
        vecs.where(F.col("vec_id") % (n // 64) == 11)
        .limit(64)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint(eager=True)
    )
    exact = knn_exact(vecs, anchors, k=10, metric="l2_sq").localCheckpoint(
        eager=True
    )
    t0 = time.perf_counter()
    g = knn_join(
        vecs, k=10, nprobe=nprobe, replicas=replicas,
        descent_rounds=rounds, n_rows=n, dim=64,
    )
    n_edges = g.count()
    dt = time.perf_counter() - t0
    hit = g.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi"
    ).count()
    print(json.dumps({
        "n": n,
        "nprobe": nprobe if nprobe is not None else "auto",
        "replicas": replicas if replicas is not None else "auto",
        "descent_rounds": rounds, "n_clusters": max(16, n // 250),
        "build_join_sec": round(dt, 1), "n_edges": n_edges,
        "recall_at_10_64anchors": round(hit / 640, 4),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
