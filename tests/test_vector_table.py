"""Staging semantics round-trip (lazy_memory_store.rs:39-66): queries
and vectors share one ID space; insert is an acceptance bit-flip."""

from __future__ import annotations

from pyspark.sql import functions as F

from hawk_pack_spark import vector_table as V


def test_prepare_accept_flow(spark):
    vectors = V.empty_vectors(spark)
    raw1 = spark.createDataFrame([([1.0, 0.0],), ([0.0, 1.0],)], "embedding array<double>")
    vectors, staged1 = V.prepare_queries(vectors, raw1)
    ids1 = [r.vec_id for r in staged1.collect()]
    assert sorted(ids1) == [0, 1]
    assert V.pending(vectors).count() == 2 and V.persistent(vectors).count() == 0

    # accept one: same id, flag flipped, nothing copied
    vectors = V.accept(vectors, staged1.where(F.col("vec_id") == 0))
    assert V.persistent(vectors).count() == 1
    assert V.pending(vectors).count() == 1
    assert vectors.count() == 2

    # later staging continues the shared ID space
    raw2 = spark.createDataFrame([([5.0, 5.0],)], "embedding array<double>")
    vectors, staged2 = V.prepare_queries(vectors, raw2)
    assert [r.vec_id for r in staged2.collect()] == [2]
    assert vectors.count() == 3

    # double-accept is idempotent
    vectors = V.accept(vectors, staged1)
    vectors = V.accept(vectors, staged1)
    assert V.persistent(vectors).count() == 2
