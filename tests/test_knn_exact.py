"""Exact kNN (LinearDb port) vs a numpy oracle.

Mirrors the reference's tests: distance unit truths
(lazy_memory_store.rs:94-107), dedup-on-ingest (linear_db.rs:43-52).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.operators.knn_exact import (
    exists_match,
    insert_unless_match,
    knn_exact,
)
from hawk_pack_spark.sources import load_table


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).cache()


def test_knn_exact_matches_numpy(spark, embeddings):
    emb = embeddings.orderBy("vec_id").toPandas()
    mat = np.array([np.array(e, dtype=np.float64) for e in emb["embedding"]])
    queries = embeddings.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = (
        knn_exact(embeddings, queries, k=10, metric="l2_sq")
        .orderBy("query_id", "rank")
        .collect()
    )
    for qid in range(5):
        d = ((mat - mat[qid]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(d)), d))[:10]
        mine = [r.vec_id for r in got if r.query_id == qid]
        assert mine == [int(i) for i in order], f"query {qid}"


def test_hamming_distance_unit_truths(spark):
    # d(x, x) == 0 is a match; d(11, 22) != 0 is not
    # (reference: lazy_memory_store.rs:94-107).
    df = spark.createDataFrame([(11, 11), (11, 22)], "a long, b long")
    from hawk_pack_spark.functions.distance import hamming

    rows = df.select(hamming("a", "b").alias("d")).collect()
    assert rows[0].d == 0
    assert rows[1].d == bin(11 ^ 22).count("1") and rows[1].d > 0


def test_exists_and_dedup_on_ingest(spark):
    vectors = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(100, [0.0, 0.0]), (101, [5.0, 5.0]), (102, [5.0, 5.0])],
        "query_id long, query_vec array<float>",
    )
    flags = {r.query_id: r.matched for r in exists_match(vectors, queries).collect()}
    assert flags == {100: True, 101: False, 102: False}

    # LinearDb::insert semantics: 100 rejected (dup of vec 0); 101 accepted;
    # 102 rejected (intra-batch dup of 101, first-wins by id).
    out = insert_unless_match(vectors, queries)
    assert sorted(r.vec_id for r in out.collect()) == [0, 1, 101]

    # inserting the same batch again adds nothing (linear_db.rs:43-52)
    out2 = insert_unless_match(out, queries)
    assert out2.count() == 3


def test_knn_self_duplicate_ties(spark):
    """knn_self under exact duplicates (ADVICE r01): with >= k+1 copies
    of one vector, the self row can tie at dist 0 behind lower-id
    duplicates; ranks must still come back dense 1..k per query with
    exactly k rows and no self rows."""
    from hawk_pack_spark.operators.knn_exact import knn_self

    k = 3
    # ids 0..4 all identical; 5..9 distinct
    rows = [(i, [1.0, 2.0]) for i in range(5)] + [
        (i, [float(i), float(i) + 1.0]) for i in range(5, 10)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_self(vecs, k=k, metric="l2_sq").collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.vec_id, "self row leaked"
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))
    for qid, rs in by_q.items():
        assert len(rs) == k, f"query {qid}: {len(rs)} rows"
        assert sorted(r.rank for r in rs) == list(range(1, k + 1))
        dists = [r.dist for r in sorted(rs, key=lambda r: r.rank)]
        assert dists == sorted(dists)
    # a duplicate's top-k is the other k duplicates at distance 0
    for qid in range(5):
        assert all(r.dist == 0.0 and r.vec_id < 5 for r in by_q[qid])


def test_hamming_topk_numpy_matches_exact(spark):
    """The XOR+popcount LUT scan must agree with the expression-based
    exact kNN (bit_count(a XOR b)) on codes with adversarial bit
    patterns: sign bit set, all-ones, zero."""
    from pyspark.sql import functions as F

    from hawk_pack_spark.operators.knn_exact import knn_exact
    from hawk_pack_spark.operators.similarity import hamming_topk_numpy

    codes = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") == 0, F.lit(0))
        .when(F.col("id") == 1, F.lit(-1))  # all 64 bits set
        .when(F.col("id") == 2, F.lit(-(2 ** 63)))  # sign bit only
        .otherwise(F.xxhash64(F.col("id")))
        .alias("code"),
    )
    queries = codes.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    got = hamming_topk_numpy(codes, queries, k=7)
    want = knn_exact(codes, queries, k=7, metric="hamming", vec_col="code")
    assert {(r.query_id, r.vec_id, r.dist) for r in got.collect()} == {
        (r.query_id, r.vec_id, r.dist) for r in want.collect()
    }


def test_ann_search_dispatches_hamming(spark):
    """The front door's exact-scan path now covers hamming: a small
    full-fan batch takes the scan (and matches the expression oracle);
    a large batch serves; both return the same schema."""
    from pyspark.sql import functions as F

    from hawk_pack_spark.config import HawkParams
    from hawk_pack_spark.operators import hnsw
    from hawk_pack_spark.operators.knn_exact import knn_exact

    params = HawkParams.new(32, 16, 8)
    codes = spark.range(800).select(
        F.col("id").alias("vec_id"), F.xxhash64(F.col("id")).alias("code")
    )
    index = hnsw.build_index(
        codes, metric="hamming", params=params, num_shards=4, vec_col="code"
    ).localCheckpoint()

    q_small = codes.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    dec = {}
    got = hnsw.ann_search(
        index, q_small, k=5, metric="hamming", params=params,
        decision_out=dec,
    )
    assert dec["path"] == "blas"
    want = knn_exact(codes, q_small, k=5, metric="hamming", vec_col="code")
    assert {(r.query_id, r.vec_id, r.dist) for r in got.collect()} == {
        (r.query_id, r.vec_id, r.dist) for r in want.collect()
    }

    q_big = codes.where(F.col("vec_id") < 300).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    dec = {}
    out = hnsw.ann_search(
        index, q_big, k=5, metric="hamming", params=params, decision_out=dec,
    )
    assert dec["path"] == "serving"
    assert out.columns == ["query_id", "vec_id", "dist", "rank"]
    assert out.count() == 300 * 5


def test_l2_topk_numpy_exact_zero_for_identical_vectors(spark):
    """The BLAS scan's expanded form q²-2q·v+v² rounds identical vectors
    to ~1e-16 POSITIVE, which broke exact dup gates (dist <= 0) — one of
    101 staged dups slipped a 1M gate before the top-k re-computation
    with the difference form. Self-queries must come back dist == 0.0
    exactly, every time."""
    from pyspark.sql import functions as F

    from hawk_pack_spark.operators.similarity import l2_topk_numpy

    vecs = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.sin(F.col("id") * i * 0.7 + i * i * 1.3),
        ).alias("embedding"),
    ).localCheckpoint()
    q = vecs.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = l2_topk_numpy(vecs, q, k=1).collect()
    assert len(got) == 2000
    assert all(r.query_id == r.vec_id and r.dist == 0.0 for r in got)


def test_exact_scan_overflow_falls_back_distributed(spark, embeddings):
    """VERDICT r7 #5: the *_topk_numpy primitives are the bulk exact
    fallbacks, so an oversized query batch must NOT be driver-collected
    (and must not error): it routes to the expression-join path with
    identical rows. Verified by setting max_driver_queries below the
    batch size and comparing against the in-bound result."""
    from hawk_pack_spark.operators.similarity import (
        cosine_topk_numpy,
        hamming_topk_numpy,
        l2_topk_numpy,
    )

    vecs = embeddings.limit(200).localCheckpoint()
    queries = vecs.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    small = l2_topk_numpy(vecs, queries, k=5)
    big = l2_topk_numpy(vecs, queries, k=5, max_driver_queries=3)
    s = {(r.query_id, r.rank): (r.vec_id, r.dist) for r in small.collect()}
    b = {(r.query_id, r.rank): (r.vec_id, r.dist) for r in big.collect()}
    assert s.keys() == b.keys()
    for key in s:  # same neighbors; dists differ only by fold associativity
        assert s[key][0] == b[key][0]
        assert abs(s[key][1] - b[key][1]) < 1e-9
    # the fallback plan really is the distributed join, not a collect
    assert "mapInPandas" not in big._jdf.queryExecution().optimizedPlan().toString()

    small_c = cosine_topk_numpy(vecs, queries, k=5)
    big_c = cosine_topk_numpy(vecs, queries, k=5, max_driver_queries=3)
    sc = {(r.query_id, r.rank): r.vec_id for r in small_c.collect()}
    bc = {(r.query_id, r.rank): r.vec_id for r in big_c.collect()}
    assert sc == bc

    codes = vecs.select(
        "vec_id", F.xxhash64(F.col("embedding").cast("string")).alias("code")
    ).localCheckpoint()
    qc = codes.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    small_h = hamming_topk_numpy(codes, qc, k=5, vec_col="code")
    big_h = hamming_topk_numpy(codes, qc, k=5, vec_col="code", max_driver_queries=3)
    sh = {(r.query_id, r.rank): (r.vec_id, r.dist) for r in small_h.collect()}
    bh = {(r.query_id, r.rank): (r.vec_id, r.dist) for r in big_h.collect()}
    assert sh == bh
