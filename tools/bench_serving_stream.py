"""Streaming serving latency at 1M (VERDICT r11 #7): queries/sec
through `start_query_stream` against a saved+reloaded 1M serving
bundle — the correctness-proven online READ loop gets a published
number.

Flow: expression-generated 1M corpus → content-sharded Algorithm-4
build → save_serving_index → load_serving_index(materialize=True) (the
long-lived serving-process shape: one load-time shuffle, zero per-query
I/O) → N parquet query-batch files → ONE availableNow stream answering
each batch through the crossover-aware ann_search front door → wall
clock over the streamed span, split into per-epoch latencies via the
sink's epoch column mtimes.

Usage: python tools/bench_serving_stream.py [n] [n_batches] [batch_q]
Defaults 1000000 20 50. Prints one JSON line for NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.config import HawkParams  # noqa: E402
from hawk_pack_spark.operators import hnsw  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402
from hawk_pack_spark.sources.graph_io import (  # noqa: E402
    load_serving_index,
    save_serving_index,
)
from hawk_pack_spark.streaming.serve import start_query_stream  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    batch_q = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_spark("bench-serving-stream")
    spark.sparkContext.setLogLevel("ERROR")

    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.sin((F.col("id") % 64) * i * 0.7 + i * i * 1.3)
        + F.sin(F.col("id") * i * 2.31 + i * 0.17) * 0.1,
    )
    vecs = (
        spark.range(n)
        .repartition(128)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .localCheckpoint(eager=True)
    )
    params = HawkParams.new(48, 48, 16)
    t0 = time.perf_counter()
    index = hnsw.build_index(
        vecs, metric="l2_sq", params=params, num_shards=max(8, n // 2500)
    )
    tmp = tempfile.mkdtemp(prefix="hps_serving_stream_")
    try:
        save_serving_index(index, f"{tmp}/bundle", params=params)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        bundle = load_serving_index(spark, f"{tmp}/bundle", materialize=True)
        t_load = time.perf_counter() - t0

        # query batches: one parquet file per batch, ids spread over the
        # corpus so probed shards vary batch to batch
        for b in range(n_batches):
            (
                vecs.where(F.col("vec_id") % n_batches == b)
                .limit(batch_q)
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec"),
                )
                .coalesce(1)
                .write.parquet(f"{tmp}/queries/b{b:03d}")
            )

        decision_log: list = []
        t0 = time.perf_counter()
        q = start_query_stream(
            spark,
            f"{tmp}/queries/*",
            "query_id long, query_vec array<double>",
            bundle,
            output_dir=f"{tmp}/out",
            checkpoint_dir=f"{tmp}/ckpt",
            k=10,
            decision_log=decision_log,
        )
        ok = q.awaitTermination(1800)
        t_stream = time.perf_counter() - t0
        if not ok:
            q.stop()
            raise TimeoutError("stream exceeded 1800s")

        out = spark.read.parquet(f"{tmp}/out")
        n_rows = out.count()
        n_epochs = out.select("epoch").distinct().count()
        total_q = n_batches * batch_q
        routes = [d.get("path") for d in decision_log if d]
        print(
            json.dumps(
                {
                    "n": n,
                    "n_batches": n_batches,
                    "batch_q": batch_q,
                    "build_save_sec": round(t_build, 1),
                    "load_materialize_sec": round(t_load, 1),
                    "stream_sec": round(t_stream, 1),
                    "sec_per_batch": round(t_stream / n_batches, 2),
                    "queries_per_sec": round(total_q / t_stream, 1),
                    "result_rows": n_rows,
                    "epochs": n_epochs,
                    "routes": sorted(set(r for r in routes if r)),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
