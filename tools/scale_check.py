"""Scale smoke: build a 100k-code HNSW index, verify self-recall and
recall@10 vs the exact oracle, and print build/search timings.

Usage: python tools/scale_check.py [n_codes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    params = HawkParams.new(64, 32, 32)
    codes = spark.range(n).select(F.col("id").alias("vec_id"), F.col("id").alias("code"))

    t0 = time.perf_counter()
    idx = hnsw.build_index(
        codes, metric="hamming", params=params,
        num_shards=max(8, n // 3000), vec_col="code",
    ).localCheckpoint()
    idx.count()
    print(f"build {n}: {time.perf_counter()-t0:.1f}s")

    q = codes.where(F.pmod(F.col("vec_id"), F.lit(max(n // 300, 1))) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    nq = q.count()
    t0 = time.perf_counter()
    res = hnsw.search(idx, q, k=1, metric="hamming", params=params)
    ok = res.where((F.col("dist") == 0) & (F.col("query_id") == F.col("vec_id"))).count()
    print(f"self-recall@1: {ok}/{nq} in {time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(7)
    probes = [(int(i), int(rng.integers(0, 2**40))) for i in range(50)]
    qdf = spark.createDataFrame(probes, "query_id long, query_vec long")
    t0 = time.perf_counter()
    approx = {
        (r.query_id, r.vec_id)
        for r in hnsw.search(idx, qdf, k=10, metric="hamming", params=params).collect()
    }
    t_ann = time.perf_counter() - t0
    t0 = time.perf_counter()
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_exact(
            codes.select("vec_id", F.col("code").alias("embedding")),
            qdf, k=10, metric="hamming",
        ).collect()
    }
    t_exact = time.perf_counter() - t0
    recall = len(approx & exact) / len(exact)
    print(f"recall@10 vs exact: {recall:.3f}  ann={t_ann:.1f}s exact={t_exact:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
