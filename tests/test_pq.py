"""Product quantization: determinism, compression shape, and ADC recall
vs exact kNN on the fixture embeddings."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hawk_pack_spark.operators import pq
from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.sources import load_table

M, K = 8, 64  # 64 centroids is plenty at 500-row training scale


def _vectors(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


def test_train_encode_shapes_and_determinism(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    cb1 = pq.pq_train(vecs, m=M, k=K, seed=7)
    cb2 = pq.pq_train(vecs, m=M, k=K, seed=7)
    assert cb1.shape == (M, K, 64 // M)
    np.testing.assert_array_equal(cb1, cb2)
    enc = pq.pq_encode(vecs, cb1)
    rows = enc.collect()
    assert len(rows) == vecs.count()
    assert all(len(r.codes) == M for r in rows)
    assert all(0 <= c < K for r in rows for c in r.codes)


def test_adc_recall_vs_exact(spark, sf_dir):
    """PQ@32× compression must keep most of the exact top-10 (gaussian
    unclustered data is PQ's hard case; 0.5 is a conservative floor —
    measured ~0.8 on the fixture)."""
    vecs = _vectors(spark, sf_dir)
    cb = pq.pq_train(vecs, m=M, k=K, seed=7)
    enc = pq.pq_encode(vecs, cb).localCheckpoint()
    queries = (
        vecs.where(F.col("vec_id") % 50 == 3)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"))
    )
    approx = pq.pq_search(enc, cb, queries, kth=10)
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    b = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, recall
    # self-match must survive quantization: own code is the nearest
    self_hits = sum(1 for (q, v) in a if q == v)
    assert self_hits == queries.count()


def test_adc_rerank_recovers_recall(spark, sf_dir):
    """The IVFPQ recipe: ADC shortlist + exact re-rank on O(k·oversample)
    fetched floats must recover most of what quantization loses
    (measured: 0.43 plain ADC → 0.83/0.94 at 5×/10× oversample, sf0.1)."""
    vecs = _vectors(spark, sf_dir)
    cb = pq.pq_train(vecs, m=M, k=K, seed=7)
    enc = pq.pq_encode(vecs, cb).localCheckpoint()
    queries = vecs.where(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plain = pq.pq_search(enc, cb, queries, kth=10)
    rer = pq.pq_search(enc, cb, queries, kth=10, rerank_with=vecs, oversample=5)
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    b = {(r.query_id, r.vec_id) for r in exact.collect()}
    r_plain = len({(r.query_id, r.vec_id) for r in plain.collect()} & b) / len(b)
    r_rer = len({(r.query_id, r.vec_id) for r in rer.collect()} & b) / len(b)
    assert r_rer >= r_plain
    assert r_rer >= 0.7, (r_plain, r_rer)
    # re-ranked distances are exact: dist of a self-query's own id is 0
    self_rows = [r for r in rer.collect() if r.query_id == r.vec_id]
    assert self_rows and all(abs(r.dist) < 1e-9 for r in self_rows)
