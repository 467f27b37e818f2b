"""Hybrid retrieval — reciprocal-rank fusion of heterogeneous rankers.

The modern serving recipe: a lexical arm (BM25) and a semantic arm
(embedding kNN) each produce a per-query top-k, and RRF fuses them on
RANK alone — ``score(d) = Σ_r 1/(rrf_k + rank_r(d))`` (Cormack et al.,
SIGIR 2009) — so the arms' incomparable score scales never need
calibration. Spark shape: union the (query, doc, rank) lists, one
groupBy-sum, one top-k window; the fused candidate set is at most
``arms × k`` rows per query, so the fusion cost is negligible next to
the arms themselves, at any corpus size.

The reference has no retrieval surface — superset, composed from the
repo's own BM25 and hash-embedding arms.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hawk_pack_spark.operators.topk import topk_rows


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score_round: int = 9,
) -> DataFrame:
    """Fuse per-query rankings into one top-k. Each input needs
    (query_id, doc_id, rank); returns (query_id, doc_id, rrf, rank).

    With ≤2 arms the fused score is a sum of at most two doubles —
    commutative, so bit-reproducible regardless of aggregation order
    (the catalog float discipline)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [r.select(query_id, doc_id, "rank") for r in rankings]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    contrib = F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))
    scored = u.groupBy(query_id, doc_id).agg(
        F.round(F.sum(contrib), score_round).alias("rrf")
    )
    return topk_rows(
        scored, [query_id], "rrf", k, ascending=False, tie_cols=[doc_id]
    )
