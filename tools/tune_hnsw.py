"""Quantify Algorithm 4 neighbor selection (VERDICT r02 item 8): build
time and recall@10 with neighbor_heuristic on/off, on the uniform
synthetic workload (where the reference's plain M-nearest trim is the
default) — so the default choice is evidence-backed, not anecdotal.

Usage: python tools/tune_hnsw.py [n]   (default 50000)
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
from hawk_pack_spark.operators.similarity import l2_topk_numpy  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out: dict = {"n": n}
    spark = get_spark("tune-hnsw")
    spark.sparkContext.setLogLevel("ERROR")
    params = HawkParams.new(64, 48, 16)
    vecs = (
        spark.range(n)
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

    truth: dict[int, set[int]] = {}
    for r in l2_topk_numpy(vecs, queries, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    num_shards = max(8, n // 1500)
    for heuristic in (False, True):
        key = "alg4" if heuristic else "mnear"
        t0 = time.perf_counter()
        index = hnsw.build_index(
            vecs, metric="l2_sq", params=params, num_shards=num_shards,
            neighbor_heuristic=heuristic,
        ).localCheckpoint()
        index.count()
        out[f"{key}_build_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
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
