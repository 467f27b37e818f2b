"""Quantify Algorithm 4 neighbor selection (VERDICT r02 item 8, r4 #5):
build time and recall@10 with neighbor_heuristic on/off.

Two workloads:
- uniform: iid-smooth synthetic vectors (the reference's implicit
  assumption — plain M-nearest trim is its only neighbor selection);
- clustered: a 64-component mixture (tight deterministic clusters +
  small per-point noise), the shape of real embedding corpora and the
  one where M-nearest trim is known to strand edges inside clusters
  (NOTES round-4 multimodal lesson).

Two index shapes:
- hash: id-hashed shards searched via the cogroup fan-out;
- content: k-means cells + balanced salting + routed serving search
  (nprobe=16) — the 1M deployment shape from bench_ann_1m.

Usage: python tools/tune_hnsw.py [n] [uniform|clustered] [hash|content]
Prints one JSON line for NOTES.md.
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


def make_vectors(spark, n: int, workload: str):
    if workload == "uniform":
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.sin(F.col("id") * i * 0.7 + i * i * 1.3),
        )
    else:  # clustered: 64 mixture components, noise 1/10th of spread
        center = F.col("id") % 64
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.sin(center * i * 0.7 + i * i * 1.3)
            + F.sin(F.col("id") * i * 2.31 + i * 0.17) * 0.1,
        )
    return (
        spark.range(n)
        .repartition(64)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .localCheckpoint()
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    workload = sys.argv[2] if len(sys.argv) > 2 else "uniform"
    shape = sys.argv[3] if len(sys.argv) > 3 else "hash"
    out: dict = {"n": n, "workload": workload, "shape": shape}
    spark = get_spark("tune-hnsw")
    spark.sparkContext.setLogLevel("ERROR")
    params = HawkParams.new(64, 48, 16)
    vecs = make_vectors(spark, n, workload)
    queries = (
        vecs.where(F.col("vec_id") % (n // 500) == 7)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    queries.count()

    truth: dict[int, set[int]] = {}
    for r in l2_topk_numpy(vecs, queries, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    if shape == "content":
        cells = max(16, n // 4000)
        assigned, _ = ivf_build(
            vecs, n_clusters=cells, max_iter=5,
            fit_fraction=min(1.0, 50_000 / n),
        )
        asg = hnsw.balance_assignments(
            assigned.select("vec_id", F.col("cluster").alias("shard")),
            max_cell=(3 * n) // (2 * cells),
        ).localCheckpoint()
        num_shards = 1 + asg.agg(F.max("shard")).collect()[0][0]
        nprobe = max(4, num_shards // 16)
        out["num_shards"], out["nprobe"] = num_shards, nprobe
    else:
        asg, nprobe = None, None
        num_shards = max(8, n // 1500)

    for heuristic in (False, True):
        key = "alg4" if heuristic else "mnear"
        t0 = time.perf_counter()
        index = hnsw.build_index(
            vecs, metric="l2_sq", params=params, num_shards=num_shards,
            assignments=asg, neighbor_heuristic=heuristic,
        ).localCheckpoint()
        index.count()
        out[f"{key}_build_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        if shape == "content":
            cents = hnsw.shard_centroids(index, "l2_sq").collect()
            got = hnsw.search_serving(
                index, queries, k=10, metric="l2_sq", params=params,
                nprobe_shards=nprobe, centroids=cents,
            ).collect()
        else:
            got = hnsw.search(
                index, queries, k=10, metric="l2_sq", params=params,
                num_shards=num_shards,
            ).collect()
        out[f"{key}_search_sec"] = round(time.perf_counter() - t0, 3)
        hits: dict[int, set[int]] = {}
        for r in got:
            hits.setdefault(r["query_id"], set()).add(r["vec_id"])
        out[f"{key}_recall_at_10"] = round(
            float(
                np.mean(
                    [
                        len(truth[q] & hits.get(q, set())) / len(truth[q])
                        for q in truth
                    ]
                )
            ),
            4,
        )
        # mean layer-0 degree: Algorithm 4 keeps direction-diverse edges,
        # typically a sparser layer 0 than plain M-nearest
        deg = index.select(
            F.avg(
                F.size(F.filter("e_layer", lambda layer: layer == 0))
            ).alias("d")
        ).collect()[0]["d"]
        out[f"{key}_mean_degree_l0"] = round(float(deg), 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
