"""Calibrate the large-n ANN ladder (VERDICT r02 item 1).

Measures, at a given n (default 200k, target 1M):
  - content-sharded HNSW build time (k-means cells + balancing),
  - exact BLAS scan time (l2_topk_numpy, the strongest exact path),
  - routed HNSW search time at several nprobe values,
  - recall@10 of each routed run vs the exact scan.

Usage: python tools/bench_ann_scale.py [n] [cells] [nprobe,nprobe,...]
Prints one JSON line so runs can be tabulated in NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.config import HawkParams  # noqa: E402
from hawk_pack_spark.operators import hnsw  # noqa: E402
from hawk_pack_spark.operators.similarity import ivf_build, l2_topk_numpy  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nprobes = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [max(1, cells // 8), max(1, cells // 4), max(1, cells // 2)]
    )
    n_queries = 500
    out: dict = {"n": n, "cells": cells, "n_queries": n_queries}

    spark = get_spark("ann-scale")
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

    t0 = time.perf_counter()
    assigned, _ = ivf_build(
        vecs, n_clusters=cells, max_iter=5, fit_fraction=min(1.0, 50_000 / n)
    )
    # checkpoint: the k-means transform must not re-run inside the build
    # join, and oversized cells must be split (straggler shards dominate
    # a wave — per-shard insert cost is superlinear in shard size)
    asg = hnsw.balance_assignments(
        assigned.select("vec_id", F.col("cluster").alias("shard")),
        max_cell=max(2000, (3 * n) // (2 * cells)),
    ).localCheckpoint()
    num_shards = 1 + asg.agg(F.max("shard")).collect()[0][0]
    index = hnsw.build_index(
        vecs, metric="l2_sq", params=params, num_shards=num_shards,
        assignments=asg,
    ).localCheckpoint()
    index.count()
    out["build_sec"] = round(time.perf_counter() - t0, 3)
    out["num_shards"] = int(num_shards)

    t0 = time.perf_counter()
    exact = l2_topk_numpy(vecs, queries, k=10)
    exact_rows = exact.collect()
    out["exact_blas_sec"] = round(time.perf_counter() - t0, 3)
    truth: dict[int, set[int]] = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall_of(rows) -> float:
        hits: dict[int, set[int]] = {}
        for r in rows:
            hits.setdefault(r["query_id"], set()).add(r["vec_id"])
        return float(
            np.mean([
                len(truth[q] & hits.get(q, set())) / len(truth[q]) for q in truth
            ])
        )

    # build-time serving metadata: centroids collected once, outside the
    # per-search timings (this is what a serving deployment holds)
    t0 = time.perf_counter()
    cents = hnsw.shard_centroids(index, "l2_sq").collect()
    out["centroids_sec"] = round(time.perf_counter() - t0, 3)

    for nprobe in nprobes:
        t0 = time.perf_counter()
        got = hnsw.search_serving(
            index, queries, k=10, metric="l2_sq", params=params,
            nprobe_shards=nprobe, centroids=cents,
        ).collect()
        out[f"serving_nprobe_{nprobe}_sec"] = round(time.perf_counter() - t0, 3)
        out[f"serving_nprobe_{nprobe}_recall"] = round(recall_of(got), 4)

    for nprobe in nprobes[:1]:
        t0 = time.perf_counter()
        got = hnsw.search(
            index, queries, k=10, metric="l2_sq", params=params,
            num_shards=num_shards, nprobe_shards=nprobe,
        ).collect()
        out[f"routed_cogroup_nprobe_{nprobe}_sec"] = round(
            time.perf_counter() - t0, 3
        )
        out[f"routed_cogroup_nprobe_{nprobe}_recall"] = round(recall_of(got), 4)

    # small-batch contrast: the latency-sensitive serving shape where the
    # exact scan cannot amortize its O(n) pass over a big batch
    q50 = queries.limit(50).localCheckpoint()
    q50.count()
    t0 = time.perf_counter()
    l2_topk_numpy(vecs, q50, k=10).count()
    out["exact_blas_50q_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    hnsw.search_serving(
        index, q50, k=10, metric="l2_sq", params=params,
        nprobe_shards=nprobes[0], centroids=cents,
    ).count()
    out["serving_50q_sec"] = round(time.perf_counter() - t0, 3)

    # the SELECTIVE regime: a small batch probing a small union — the
    # third dispatch branch, where partition-pruned serving I/O beats
    # any full scan regardless of batch size
    q10 = queries.limit(10).localCheckpoint()
    q10.count()
    sel_nprobe = max(1, nprobes[0] // 4)
    t0 = time.perf_counter()
    hnsw.search_serving(
        index, q10, k=10, metric="l2_sq", params=params,
        nprobe_shards=sel_nprobe, centroids=cents,
    ).count()
    out["serving_10q_selective_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    l2_topk_numpy(vecs, q10, k=10).count()
    out["exact_blas_10q_sec"] = round(time.perf_counter() - t0, 3)

    # the front door: does the dispatcher pick the measured winner at
    # this n for both batch shapes? (vectors_df = the slim payload side)
    slim = vecs.selectExpr("vec_id", "embedding as vec").localCheckpoint()
    slim.count()
    for label, qdf in (("500q", queries), ("50q", q50)):
        dec: dict = {}
        t0 = time.perf_counter()
        hnsw.ann_search(
            index, qdf, k=10, metric="l2_sq", params=params,
            nprobe_shards=nprobes[0], centroids=cents,
            decision_out=dec, vectors_df=slim,
        ).count()
        out[f"dispatch_{label}_sec"] = round(time.perf_counter() - t0, 3)
        out[f"dispatch_{label}_path"] = dec.get("path")
        out[f"dispatch_{label}_qps"] = round(
            dec.get("queries_per_probed_shard") or -1, 2
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
