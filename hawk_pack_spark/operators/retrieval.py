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


def hard_negatives(
    vectors: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    metric: str = "l2_sq",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id: str = "anchor_id",
    anchor_vec: str = "anchor_vec",
    anchor_label: str = "anchor_label",
) -> DataFrame:
    """Contrastive hard-negative mining: per anchor, the k NEAREST
    vectors whose label differs from the anchor's — the negatives that
    sit right at the decision boundary, which is what an embedding /
    reranker trainer actually wants (random negatives are too easy).

    Exact semantics (this is also the recall oracle): anchors broadcast
    against the distributed vector table, the per-anchor dynamic label
    predicate fuses into the scan, and a Window keeps the top-k per
    anchor (ties on vec_id). The corpus side never shuffles. At serving
    scale substitute an ANN over-fetch (`ann_search` with k·oversample,
    post-filter label≠anchor, exact completeness fallback — the
    `filtered_knn` dispatch pattern, knn_exact.py); the label filter is
    per-anchor, so pre-filtering the index is not an option.

    Returns (anchor_id, vec_id, label, dist, rank).
    """
    from hawk_pack_spark.functions.distance import distance_expr
    from hawk_pack_spark.operators.topk import topk_rows

    pairs = vectors.crossJoin(F.broadcast(anchors)).where(
        F.col(label_col) != F.col(anchor_label)
    )
    scored = pairs.select(
        F.col(anchor_id),
        F.col(vec_id),
        F.col(label_col).alias("label"),
        distance_expr(metric, F.col(anchor_vec), F.col(vec_col)).alias("dist"),
    )
    return topk_rows(
        scored, [anchor_id], "dist", k, ascending=True, tie_cols=[vec_id]
    )
