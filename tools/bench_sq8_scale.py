"""SQ8 vs float-exact scan from DISK: the bytes-scanned ladder.

NOTES r6 §11d records the in-memory result (SQ8 is wall-clock-neutral
when the float corpus is resident — both paths are matmul-bound). This
tool measures the claim SQ8 actually makes: with the corpus on parquet,
the scan reads 1 byte/dim codes instead of float arrays, and wall-clock
follows bytes at scan scale.

Usage: python tools/bench_sq8_scale.py [n] [nq]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hawk_pack_spark.operators import similarity as S  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark("sq8-disk-ladder")
    tmp = tempfile.mkdtemp(prefix="sq8_ladder_")
    try:
        vecs = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    "transform(sequence(1, 64), j -> "
                    "cast(sin(id * j * 0.7) + cos(id + j) AS double))"
                ).alias("embedding"),
            )
            .repartition(32)
        )
        vecs.write.parquet(f"{tmp}/floats")
        floats = spark.read.parquet(f"{tmp}/floats")
        queries = (
            floats.where(F.col("vec_id") % (n // nq) == 7)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            .localCheckpoint()
        )
        lo, scale = S.sq8_train(floats)
        S.sq8_encode(floats, lo, scale).write.parquet(f"{tmp}/codes")
        codes = spark.read.parquet(f"{tmp}/codes")

        def du(path: str) -> int:
            total = 0
            for root, _, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            return total

        b_f, b_c = du(f"{tmp}/floats"), du(f"{tmp}/codes")

        t0 = time.perf_counter()
        r_sq8 = S.sq8_topk(codes, lo, scale, queries, k=10).collect()
        t_sq8 = time.perf_counter() - t0

        t0 = time.perf_counter()
        r_ex = S.l2_topk_numpy(floats, queries, k=10).collect()
        t_ex = time.perf_counter() - t0

        e = {(r.query_id, r.vec_id) for r in r_ex}
        a = {(r.query_id, r.vec_id) for r in r_sq8}
        print(
            f"n={n} nq={nq} floats_parquet={b_f/1e6:.0f}MB codes_parquet={b_c/1e6:.0f}MB "
            f"ratio={b_f/max(b_c,1):.1f}x | sq8_scan={t_sq8:.1f}s float_scan={t_ex:.1f}s "
            f"recall@10={len(a & e)/len(e):.4f}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
