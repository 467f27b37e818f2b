"""SQ8 scalar quantization: reconstruction bound, determinism, recall
vs exact kNN, and the exact re-rank contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hawk_pack_spark.operators import similarity as S
from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.sources import load_table


def _vectors(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


def _queries(vecs):
    return vecs.where(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_sq8_reconstruction_bound_and_determinism(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    lo1, s1 = S.sq8_train(vecs)
    lo2, s2 = S.sq8_train(vecs)
    np.testing.assert_array_equal(lo1, lo2)
    np.testing.assert_array_equal(s1, s2)
    enc = S.sq8_encode(vecs, lo1, s1)
    sample = enc.join(vecs, "vec_id").limit(50).collect()
    assert len(sample) == 50
    for r in sample:
        v = np.asarray(r.embedding, dtype=np.float64)
        c = np.frombuffer(r.codes, dtype=np.uint8).astype(np.float64)
        vhat = lo1 + c * s1
        # rounding-to-nearest-code bounds the per-dim error by scale/2
        assert np.all(np.abs(v - vhat) <= s1 / 2 + 1e-12)
        assert len(r.codes) == len(v)  # 1 byte per dimension = 4x vs f32


def test_sq8_recall_vs_exact_without_rerank(spark, sf_dir):
    """8-bit per-dim quantization barely disturbs L2 ranks on any data
    shape (unlike PQ): recall@10 must be near-perfect already without
    the re-rank."""
    vecs = _vectors(spark, sf_dir)
    lo, s = S.sq8_train(vecs)
    enc = S.sq8_encode(vecs, lo, s).localCheckpoint()
    queries = _queries(vecs)
    ann = S.sq8_topk(enc, lo, s, queries, k=10)
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    a = {(r.query_id, r.vec_id) for r in ann.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.95, recall


def test_sq8_rerank_is_exact_topk(spark, sf_dir):
    """With the float re-rank, the final top-k must EQUAL the exact kNN
    set per query (oversample covers quantization rank noise)."""
    vecs = _vectors(spark, sf_dir)
    lo, s = S.sq8_train(vecs)
    enc = S.sq8_encode(vecs, lo, s).localCheckpoint()
    queries = _queries(vecs)
    ann = S.sq8_topk(enc, lo, s, queries, k=10, rerank_with=vecs, oversample=4)
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    a = {(r.query_id, r.vec_id) for r in ann.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.999, recall
