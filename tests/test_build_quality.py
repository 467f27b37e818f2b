"""SURVEY §7 watch-list #1: batch/incremental building vs the serial
reference semantics. HNSW quality depends on insertion order; our
micro-batched rounds insert against the previous rounds' graph. This
test MEASURES the deviation: recall vs the exact oracle must stay high
for both single-shot and 4-round incremental builds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.sources import load_table

PARAMS = HawkParams.new(64, 64, 16)


def _recall(spark, index, emb, k=10, n_queries=40):
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = hnsw.search(index, queries, k=k, metric="l2_sq", params=PARAMS)
    exact = knn_exact(emb, queries, k=k, metric="l2_sq")
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    return len(a & e) / len(e)


def test_incremental_build_matches_single_shot_quality(spark, sf_dir):
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )
    single = hnsw.build_index(emb, metric="l2_sq", params=PARAMS, num_shards=4)
    r_single = _recall(spark, single, emb)

    # 4 incremental rounds of 125 vectors each (insertion against the
    # frozen graph of earlier rounds — the batch-build semantic risk)
    incr = hnsw.build_index(
        emb.where(F.col("vec_id") < 125), metric="l2_sq", params=PARAMS, num_shards=4
    ).localCheckpoint()
    for lo in (125, 250, 375):
        batch = emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 125))
        incr = hnsw.insert_batch(
            incr, batch, metric="l2_sq", params=PARAMS
        ).localCheckpoint()
    assert incr.count() == emb.count()
    r_incr = _recall(spark, incr, emb)

    assert r_single > 0.95, f"single-shot recall {r_single}"
    assert r_incr > 0.95, f"incremental recall {r_incr}"
    # deviation between build strategies stays small
    assert abs(r_single - r_incr) < 0.05, (r_single, r_incr)
