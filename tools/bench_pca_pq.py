"""OPQ-lite experiment: does PCA rotation (+ balanced subspace
allocation) improve PQ recall on CORRELATED embeddings?

Three PQ variants, identical codebook budget (m=8, k=256), un-re-ranked
recall@10 so quantization quality is isolated:
  raw       — PQ on the original coordinates
  pca       — PQ after full-rank PCA rotation (energy-compacting:
              expected to HURT, variance piles into subspace 0)
  pca+bal   — PCA rotation, then dims permuted so each subspace gets
              equal total log-variance (linalg.balanced_subspace_
              permutation — the OPQ-lite allocation)

Run on two 100k×64 corpora: CORRELATED (x = z @ A, random mixing with a
decaying spectrum — the shape real text/image embeddings have) and IID
(PQ's best case; rotation should be a no-op within noise).

Usage: python tools/bench_pca_pq.py [n_base] [n_queries]
Prints one JSON line per (corpus, variant).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from hawk_pack_spark.operators.linalg import (  # noqa: E402
    balanced_subspace_permutation,
    fit_pca,
    project,
)
from hawk_pack_spark.operators.pq import pq_encode, pq_search, pq_train  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402

D, M, K, TOPK = 64, 8, 256, 10


def make_corpus(kind: str, n: int, rng: np.random.Generator) -> np.ndarray:
    z = rng.standard_normal((n, D))
    if kind == "iid":
        return z
    scales = np.exp(-np.arange(D) / 8.0)  # ~e^-8 dynamic range
    if kind == "axis":
        # eigen-aligned skewed spectrum: the case subspace balancing
        # exists for (all the energy lands in PQ subspace 0 otherwise)
        return z * scales
    # correlated: random orthogonal mixing of a steeply decaying spectrum
    q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    return (z * scales) @ q.T


def recall_at_k(approx: dict[int, list[int]], exact: dict[int, list[int]]) -> float:
    hits = sum(len(set(approx[q]) & set(exact[q])) for q in exact)
    return hits / (len(exact) * TOPK)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("bench-pca-pq")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)
    for kind in ("correlated", "axis", "iid"):
        x = make_corpus(kind, n_base + n_q, rng).astype(np.float64)
        base, qx = x[:n_base], x[n_base:]
        # exact ground truth (tool-side numpy; fine at bench scale)
        d2 = (
            (qx * qx).sum(1)[:, None]
            - 2.0 * qx @ base.T
            + (base * base).sum(1)[None, :]
        )
        exact = {
            i: np.argsort(d2[i], kind="stable")[:TOPK].tolist()
            for i in range(n_q)
        }
        bdf = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(base)],
            "vec_id long, embedding array<double>",
        ).repartition(16).cache()
        qdf = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(qx)],
            "query_id long, query_vec array<double>",
        ).cache()
        bdf.count(), qdf.count()

        model = fit_pca(bdf, k=D)
        variants: dict[str, np.ndarray | None] = {"raw": None}
        variants["pca"] = model.components
        perm = balanced_subspace_permutation(model.eigenvalues, M)
        variants["pca_balanced"] = model.components[perm]

        for name, basis in variants.items():
            if basis is None:
                b, q = bdf, qdf
            else:
                b = project(bdf, model.mean, basis, "embedding", "rot").select(
                    "vec_id", F_alias("rot", "embedding")
                )
                q = project(qdf, model.mean, basis, "query_vec", "rot").select(
                    "query_id", F_alias("rot", "query_vec")
                )
            t0 = time.perf_counter()
            cb = pq_train(b, m=M, k=K, vec_col="embedding")
            enc = pq_encode(b, cb).cache()
            enc.count()
            res = pq_search(enc, cb, q, kth=TOPK).collect()
            dt = time.perf_counter() - t0
            approx: dict[int, list[int]] = {}
            for r in res:
                approx.setdefault(r["query_id"], []).append(r["vec_id"])
            rec = recall_at_k(approx, exact)
            print(
                json.dumps(
                    {
                        "corpus": kind,
                        "variant": name,
                        "recall@10": round(rec, 4),
                        "sec": round(dt, 2),
                        "n_base": n_base,
                        "n_queries": n_q,
                    }
                ),
                flush=True,
            )
            enc.unpersist()
        bdf.unpersist()
        qdf.unpersist()


def F_alias(src: str, dst: str):
    from pyspark.sql import functions as F

    return F.col(src).alias(dst)


if __name__ == "__main__":
    main()
