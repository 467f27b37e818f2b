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


def test_driver_loop_build_quality_vs_kernel(spark):
    """Design (b) — the pure-dataflow driver-loop build with per-layer
    beam snapshots — must produce an index whose search recall matches
    the kernel build (design a) on the same vectors (VERDICT r01 item 5:
    measure (b) against (a), not just (b) alone)."""
    from hawk_pack_spark.operators.hnsw_driver import build_index_driver_loop

    n = 150
    params = HawkParams.new(32, 24, 8)
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.sin(F.col("id") * i * 0.9 + i * 2.17),
        ).alias("embedding"),
    ).localCheckpoint()
    queries = vecs.where(F.col("vec_id") % 10 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_exact(vecs, queries, k=5, metric="l2_sq")
    e = {(r.query_id, r.vec_id) for r in exact.collect()}

    kernel_idx = hnsw.build_index(vecs, metric="l2_sq", params=params, num_shards=2)
    dataflow_idx = build_index_driver_loop(
        vecs, metric="l2_sq", params=params, num_shards=2, bootstrap_size=40
    )

    recalls = {}
    for name, idx in (("kernel", kernel_idx), ("dataflow", dataflow_idx)):
        res = hnsw.search(idx, queries, k=5, metric="l2_sq", params=params)
        a = {(r.query_id, r.vec_id) for r in res.collect()}
        recalls[name] = len(a & e) / len(e)
    assert recalls["kernel"] > 0.9, recalls
    # batch-frozen rounds may deviate slightly from serial insertion,
    # but the two designs must be in the same quality class
    assert recalls["dataflow"] >= recalls["kernel"] - 0.1, recalls


def test_default_build_full_self_recall_on_clustered_copies(spark):
    """r9: the DEFAULT build (no flags) must hold complete self-recall
    on near-duplicate-clustered data — the connectivity pathology that
    broke the reference-faithful M-nearest trim three times (VERDICT r8
    #1). Same planted-copies shape as the alg4 catalog row, but
    exercising the default path a user actually gets."""
    n_base, copies_per = 60, 5
    params = HawkParams.new(32, 8, 8)  # small M: the capture-prone regime
    base = spark.range(n_base).select(
        F.col("id").alias("bid"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.sin(F.col("id") * i * 0.9 + i * 2.17),
        ).alias("emb"),
    )
    copies = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(copies_per - 1))).alias("c"),
        "bid", "emb",
    ).select(
        (F.col("bid") * 8 + F.col("c")).alias("vec_id"),
        F.transform(
            "emb",
            lambda x, i: x + F.sin(i.cast("double") * 1.7 + F.col("c")) * 1e-4,
        ).alias("embedding"),
    ).localCheckpoint()
    index = hnsw.build_index(
        copies, metric="l2_sq", params=params, num_shards=2
    ).localCheckpoint()
    q = copies.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    found = hnsw.search(
        index, q, k=1, metric="l2_sq", params=params, ef_search=48
    ).where((F.col("query_id") == F.col("vec_id")) & (F.col("dist") == 0))
    assert found.count() == n_base * copies_per
