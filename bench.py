"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Replicates the reference bench's shape (benches/hnsw.rs: search/insert
against a prebuilt DB, HNSW vs brute-force contrast) plus the relational
headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from hawk_pack_spark.queries import CATALOG  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "top3_orders_per_customer",
    "events_hourly",
    "sessionization",
    "doc_token_stats",
    "exact_dedup_docs",
    "knn_exact_l2",
    "knn_exact_cosine",
    "simhash_hamming_knn",
    "embedding_near_dup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("hawk-pack-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # one throwaway action so JVM/codegen warmup isn't billed to the
    # first measured query
    from hawk_pack_spark.sources import load_table

    load_table(spark, "lineitem", sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = CATALOG.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
