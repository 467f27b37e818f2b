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
