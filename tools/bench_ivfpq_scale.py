"""IVF-PQ at ladder scale — does residual ADC win the mid-scale regime?

The r5 10M ladder showed full-union 500-query batches are scan-bound:
exact BLAS 22.3s BEATS serving-HNSW 44.6s, and flat PQ dies on recall
(0.16). IVF-PQ changes both terms: residual codebooks spend their
8 bytes on local structure (recall), and cell routing makes the scan
partition-prunable (bytes read track nprobe, not n). This ladder
measures build → routed ADC(+exact re-rank) → recall vs the exact BLAS
scan, on BOTH corpus shapes:

  clustered — n_centers well-separated centers, per-point jitter of
              ``radius`` relative scale (the realistic embedding shape,
              where r6 small-scale tests showed residual PQ winning)
  iid       — the dense sine fixture (the shape where flat PQ lost;
              an honest negative control)

Optionally (``disk=1``) re-runs the search from a cell-partitioned
parquet layout, where `cell IN (probed)` becomes PartitionFilters —
the 100 TB story: per-query I/O tracks nprobe, not corpus size.

Usage:
  python tools/bench_ivfpq_scale.py [n] [n_queries] [shape] [nprobes] [disk] [index: ivfpq|ivfsq8]
  e.g.  python tools/bench_ivfpq_scale.py 10000000 500 clustered 8,16,32 1

Prints one JSON line for NOTES.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.operators.pq import (  # noqa: E402
    ivfpq_build,
    ivfpq_search,
    ivfsq8_build,
    ivfsq8_search,
)
from hawk_pack_spark.operators.similarity import l2_topk_numpy  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402

N_CENTERS = 256
RADIUS = 0.15


def make_corpus(spark, n: int, shape: str):
    base = spark.range(n).repartition(64)
    i = F.sequence(F.lit(1), F.lit(64))
    if shape == "clustered":
        c = F.col("id") % N_CENTERS
        emb = F.transform(
            i,
            lambda j: F.sin(c * j * 0.7 + j * j * 1.3)
            + F.lit(RADIUS) * F.sin(F.col("id") * j * 2.1 + j * 0.5),
        )
    else:
        emb = F.transform(
            i, lambda j: F.sin(F.col("id") * j * 0.7 + j * j * 1.3)
        )
    return base.select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    ).localCheckpoint()


def recall_at_10(exact_rows, got_rows) -> float:
    truth: dict[int, set[int]] = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits: dict[int, set[int]] = {}
    for r in got_rows:
        hits.setdefault(r["query_id"], set()).add(r["vec_id"])
    return round(
        float(
            np.mean(
                [len(truth[q] & hits.get(q, set())) / len(truth[q]) for q in truth]
            )
        ),
        4,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    shape = sys.argv[3] if len(sys.argv) > 3 else "clustered"
    nprobes = [
        int(x) for x in (sys.argv[4] if len(sys.argv) > 4 else "8,16,32").split(",")
    ]
    disk = len(sys.argv) > 5 and sys.argv[5] == "1"
    index = sys.argv[6] if len(sys.argv) > 6 else "ivfpq"  # ivfpq | ivfsq8
    out: dict = {"n": n, "n_queries": nq, "shape": shape,
                 "n_cells": N_CENTERS, "index": index}

    spark = get_spark("ivfpq-scale")
    spark.sparkContext.setLogLevel("ERROR")

    vecs = make_corpus(spark, n, shape)
    queries = (
        vecs.where(F.col("vec_id") % (n // nq) == 7)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    queries.count()

    t0 = time.perf_counter()
    if index == "ivfsq8":
        encoded, centers, lo, scale = ivfsq8_build(
            vecs, n_clusters=N_CENTERS,
            fit_fraction=min(1.0, 2_000_000 / n), kmeans_iter=10,
        )

        def search(enc, qs, kth, nprobe, oversample):
            return ivfsq8_search(
                enc, centers, lo, scale, qs, kth=kth, nprobe=nprobe,
                rerank_with=vecs, oversample=oversample,
            )
    else:
        encoded, centers, codebooks = ivfpq_build(
            vecs, n_clusters=N_CENTERS, m=8, k=256,
            fit_fraction=min(1.0, 2_000_000 / n), kmeans_iter=10,
        )

        def search(enc, qs, kth, nprobe, oversample):
            return ivfpq_search(
                enc, centers, codebooks, qs, kth=kth, nprobe=nprobe,
                rerank_with=vecs, oversample=oversample,
            )
    encoded = encoded.localCheckpoint()
    encoded.count()
    out["build_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    exact_rows = l2_topk_numpy(vecs, queries, k=10).collect()
    out["exact_blas_sec"] = round(time.perf_counter() - t0, 3)

    for npb in nprobes:
        t0 = time.perf_counter()
        got = search(encoded, queries, 10, npb, 20).collect()
        out[f"adc_rerank_sec_np{npb}"] = round(time.perf_counter() - t0, 3)
        out[f"recall_np{npb}"] = recall_at_10(exact_rows, got)

    if disk:
        tmp = tempfile.mkdtemp(prefix="ivfpq_disk_")
        try:
            t0 = time.perf_counter()
            encoded.write.partitionBy("cell").parquet(f"{tmp}/codes")
            out["disk_write_sec"] = round(time.perf_counter() - t0, 3)
            ondisk = spark.read.parquet(f"{tmp}/codes")
            npb = nprobes[-1]
            t0 = time.perf_counter()
            got = search(ondisk, queries, 10, npb, 20).collect()
            out[f"disk_adc_rerank_sec_np{npb}"] = round(
                time.perf_counter() - t0, 3
            )
            out[f"disk_recall_np{npb}"] = recall_at_10(exact_rows, got)
            # selective regime: few queries → few probed cells → pruned I/O
            q50 = queries.limit(50).localCheckpoint()
            q50.count()
            exact50 = l2_topk_numpy(vecs, q50, k=10).collect()
            t0 = time.perf_counter()
            got50 = search(ondisk, q50, 10, 8, 20).collect()
            out["disk_selective_50q_np8_sec"] = round(
                time.perf_counter() - t0, 3
            )
            out["disk_selective_50q_recall"] = recall_at_10(exact50, got50)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
