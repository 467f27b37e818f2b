"""Resolve the 10M BLAS cross-round discrepancy (VERDICT r10 #2 /
NOTES r10 #6): the r10 ladder measured the exact BLAS 500q scan at 10M
as 57.0s where the r5-tail recorded 22.3s — self-consistent within each
run, so the open hypothesis is SESSION MEMORY PRESSURE from the ~2x
larger Algorithm-4 HNSW graph coexisting with the scan tiles (BLAS is
scan-bound; alg4 never touches it).

This tool measures the SAME scan both ways in one process, fresh first:

    python tools/bench_blas_memory_effect.py [n=10000000] [cells=2600]

  1. FRESH: vectors + queries only — BLAS 500q and 50q, 2 repeats each.
  2. RESIDENT: build the alg4-default sharded HNSW index (the exact
     bench_ann_scale.py recipe), keep it localCheckpointed (resident),
     re-run the identical scans.

Prints one JSON line. If resident >> fresh, the r10 number was the
resident artifact and the choose_ann_path crossover (fit on r10-style
numbers) needs re-fitting against the fresh scan.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.config import HawkParams  # noqa: E402
from hawk_pack_spark.operators import hnsw  # noqa: E402
from hawk_pack_spark.operators.similarity import (  # noqa: E402
    ivf_build,
    l2_topk_numpy,
)
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cells = int(sys.argv[2]) if len(sys.argv) > 2 else 2_600
    out: dict = {"n": n, "cells": cells}

    spark = get_spark("blas-memory-effect")
    spark.sparkContext.setLogLevel("ERROR")

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
        vecs.where(F.col("vec_id") % (n // 500) == 7)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    queries.count()
    q50 = queries.limit(50).localCheckpoint()
    q50.count()

    def scan(qdf, label):
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            l2_topk_numpy(vecs, qdf, k=10).count()
            times.append(round(time.perf_counter() - t0, 3))
        out[label] = times

    scan(queries, "fresh_blas_500q_sec")
    scan(q50, "fresh_blas_50q_sec")

    t0 = time.perf_counter()
    assigned, _ = ivf_build(
        vecs, n_clusters=cells, max_iter=5, fit_fraction=min(1.0, 50_000 / n)
    )
    asg = hnsw.balance_assignments(
        assigned.select("vec_id", F.col("cluster").alias("shard")),
        max_cell=max(2000, (3 * n) // (2 * cells)),
    ).localCheckpoint()
    num_shards = 1 + asg.agg(F.max("shard")).collect()[0][0]
    params = HawkParams.new(64, 48, 16)
    index = hnsw.build_index(
        vecs, metric="l2_sq", params=params, num_shards=num_shards,
        assignments=asg,
    ).localCheckpoint()
    index.count()
    out["build_sec"] = round(time.perf_counter() - t0, 3)
    out["num_shards"] = int(num_shards)

    scan(queries, "resident_blas_500q_sec")
    scan(q50, "resident_blas_50q_sec")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
