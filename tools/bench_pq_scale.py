"""PQ-ADC at the 10M scale — the compressed mid-scale answer.

The 10M ladder (bench_ann_scale) showed full-union 500-query batches
are scan-bound for BOTH exact BLAS and serving-HNSW. PQ changes the
bytes scanned: 8-byte codes instead of 512-byte floats (64× compression)
with an exact re-rank on an oversampled shortlist. This measures
train → encode → ADC(+re-rank) → recall vs the exact scan at a given n.

Usage: python tools/bench_pq_scale.py [n] [n_queries] [oversample]
Prints one JSON line for NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.operators.pq import pq_encode, pq_search, pq_train  # noqa: E402
from hawk_pack_spark.operators.similarity import l2_topk_numpy  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    oversample = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    out: dict = {"n": n, "n_queries": nq, "oversample": oversample}

    spark = get_spark("pq-scale")
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
        vecs.where(F.col("vec_id") % (n // nq) == 7)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    queries.count()

    t0 = time.perf_counter()
    cb = pq_train(vecs, m=8, k=256)
    out["train_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    enc = pq_encode(vecs, cb).localCheckpoint()
    enc.count()
    out["encode_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    got = pq_search(
        enc, cb, queries, kth=10, rerank_with=vecs, oversample=oversample
    ).collect()
    out["adc_rerank_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    exact_rows = l2_topk_numpy(vecs, queries, k=10).collect()
    out["exact_blas_sec"] = round(time.perf_counter() - t0, 3)

    truth: dict[int, set[int]] = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits: dict[int, set[int]] = {}
    for r in got:
        hits.setdefault(r["query_id"], set()).add(r["vec_id"])
    out["recall_at_10"] = round(
        float(
            np.mean(
                [len(truth[q] & hits.get(q, set())) / len(truth[q]) for q in truth]
            )
        ),
        4,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
