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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_prepare_queries_two_phase_dispatch(spark):
    """Above the threshold, ID assignment routes through the two-phase
    range-partitioned rank: same IDs as the single-window path for
    distinct payloads, and no single-partition Window over the data
    stream in the plan (VERDICT r11 #3)."""
    vectors = V.empty_vectors(spark)
    raw = (
        spark.range(500)
        .select(
            F.array(
                (F.col("id") * 37 % 101).cast("double"),
                (F.col("id") * 53 % 97).cast("double"),
            ).alias("embedding")
        )
        .repartition(8)
    )
    _, small = V.prepare_queries(vectors, raw)
    _, big = V.prepare_queries(vectors, raw, threshold=0)
    a = sorted((r.vec_id, tuple(r.embedding)) for r in small.collect())
    b = sorted((r.vec_id, tuple(r.embedding)) for r in big.collect())
    assert a == b
    plan = _plan(big)
    assert "rangepartitioning" in plan, plan[:1500]
    for chunk in plan.split("Window [")[1:]:
        head = chunk[:500]
        part = head.split("]", 2)[1]
        if "_pid" not in part:
            # unpartitioned window only over the tiny offsets cumsum
            assert "_pid" in head, head
    # the small path still takes the one-window form
    assert "rangepartitioning" not in _plan(small)

    # staged batch composes with the table: IDs continue the space
    table, staged = V.prepare_queries(vectors, raw, threshold=0)
    assert table.count() == 500
    ids = [r.vec_id for r in staged.collect()]
    assert sorted(ids) == list(range(500))
