"""HNSW tuning harness: recall@k and latency vs (ef_search, M, shards).

"Measure, don't guess": prints a table of recall against the exact
oracle plus wall-clock per configuration, on the embeddings fixture.

Usage: python tools/tune_hnsw.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.session import get_spark
from hawk_pack_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tune-hnsw")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )
    n = emb.count()
    queries = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_exact(emb, queries, k=10, metric="l2_sq").collect()
    }

    print(f"n={n}  queries=100  k=10")
    print(f"{'M':>4} {'ef_c':>5} {'ef_s':>5} {'shards':>6} {'build_s':>8} {'search_s':>8} {'recall':>7}")
    for M, ef_c, shards in [(8, 32, 8), (16, 64, 8), (16, 64, 16), (32, 96, 8)]:
        params = HawkParams.new(ef_c, 32, M)
        t0 = time.perf_counter()
        index = hnsw.build_index(
            emb, metric="l2_sq", params=params, num_shards=shards
        ).localCheckpoint()
        index.count()
        build_s = time.perf_counter() - t0
        for ef_s in (16, 32, 64):
            t0 = time.perf_counter()
            approx = {
                (r.query_id, r.vec_id)
                for r in hnsw.search(
                    index, queries, k=10, metric="l2_sq", params=params, ef_search=ef_s
                ).collect()
            }
            search_s = time.perf_counter() - t0
            recall = len(approx & exact) / len(exact)
            print(
                f"{M:>4} {ef_c:>5} {ef_s:>5} {shards:>6} {build_s:>8.2f} {search_s:>8.2f} {recall:>7.3f}"
            )
            build_s = 0.0  # billed once per index
    spark.stop()


if __name__ == "__main__":
    main()
