"""Design (b) driver-loop search must reproduce kernel-search results
(batch expansion is a superset of serial — recall can only be ≥)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.hnsw_driver import search_driver_loop

PARAMS = HawkParams.new(32, 16, 8)


@pytest.fixture(scope="module")
def code_index(spark):
    codes = spark.range(80).select(F.col("id").alias("vec_id"), F.col("id").alias("code"))
    return hnsw.build_index(
        codes, metric="hamming", params=PARAMS, num_shards=2, vec_col="code"
    ).localCheckpoint()


def test_driver_loop_self_recall(spark, code_index):
    queries = spark.range(0, 80, 7).select(
        F.col("id").alias("query_id"), F.col("id").alias("query_vec")
    )
    res = search_driver_loop(
        code_index, queries, k=1, metric="hamming", params=PARAMS
    ).collect()
    assert len(res) == 12
    assert all(r.query_id == r.vec_id and r.dist == 0.0 for r in res)


def test_driver_loop_matches_kernel_topk(spark, code_index):
    queries = spark.range(3).select(
        F.col("id").alias("query_id"), (F.col("id") * 13 + 5).alias("query_vec")
    )
    a = search_driver_loop(code_index, queries, k=5, metric="hamming", params=PARAMS)
    b = hnsw.search(code_index, queries, k=5, metric="hamming", params=PARAMS)
    sa = {(r.query_id, r.vec_id) for r in a.collect()}
    sb = {(r.query_id, r.vec_id) for r in b.collect()}
    # batch beam ⊇ serial beam at equal ef; require ≥80% agreement
    assert len(sa & sb) / len(sb) >= 0.8, (sa, sb)


def test_op_stream_protocol(spark, code_index):
    """The scripted op-sequence check, mirroring coroutine.rs:218-304:
    the loop must issue GetEntryPoint first, then per-layer rounds of
    GetLinks → EvalDistanceBatch → LessThanBatch, ending SearchResult."""
    queries = spark.range(1).select(
        F.col("id").alias("query_id"), F.lit(5).alias("query_vec")
    )
    ops: list = []
    search_driver_loop(
        code_index, queries, k=1, metric="hamming", params=PARAMS, op_log=ops
    ).collect()
    names = [o[0] for o in ops]
    assert names[0] == "GetEntryPoint"
    assert names[-1] == "SearchResult"
    body = names[1:-1]
    assert body and len(body) % 3 == 0
    for i in range(0, len(body), 3):
        assert body[i : i + 3] == ["GetLinks", "EvalDistanceBatch", "LessThanBatch"]
    # layers descend monotonically across the round sequence
    layers = [kw["layer"] for op, kw in ops if op == "GetLinks"]
    assert layers == sorted(layers, reverse=True)


def test_insert_round_driver_loop(spark, code_index):
    """Design (b) batch insert: new codes become searchable via pure
    DataFrame link merging (no kernel)."""
    from hawk_pack_spark.operators.hnsw_driver import insert_round_driver_loop

    batch = spark.range(10).select(
        (F.col("id") + 500).alias("vec_id"), (F.col("id") + 200).alias("code")
    )
    updated = insert_round_driver_loop(
        code_index, batch, metric="hamming", params=PARAMS, vec_col="code"
    ).localCheckpoint()
    assert updated.count() == 90
    # every new vector searchable at distance 0
    q = batch.select(F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec"))
    res = hnsw.search(updated, q, k=1, metric="hamming", params=PARAMS).collect()
    assert len(res) == 10
    assert all(r.dist == 0.0 and r.vec_id >= 500 for r in res)
    # degree bounds hold after the dataflow merge
    links = hnsw.to_links(updated)
    over = links.where(
        (F.col("layer") == 0) & (F.size("nbrs") > PARAMS.get_M_max(0))
    ).count()
    over += links.where(
        (F.col("layer") > 0) & (F.size("nbrs") > PARAMS.get_M_max(1))
    ).count()
    assert over == 0


def test_build_index_driver_loop_from_scratch(spark):
    """Full design-(b) build: geometric rounds of pure-DataFrame inserts
    starting from an exact-linked bootstrap batch. The resulting index
    must satisfy the same invariants as a kernel build — full self-recall
    and bounded degrees — with the graph never leaving the cluster."""
    from hawk_pack_spark.operators.hnsw_driver import (
        build_index_driver_loop,
        search_driver_loop,
    )

    codes = spark.range(120).select(
        F.col("id").alias("vec_id"), (F.col("id") * 7).alias("code")
    )
    idx = build_index_driver_loop(
        codes, metric="hamming", params=PARAMS, num_shards=2,
        vec_col="code", bootstrap_size=16,
    ).localCheckpoint()
    assert idx.count() == 120
    # self-recall on a sample, searched by BOTH designs
    queries = spark.range(0, 120, 11).select(
        F.col("id").alias("query_id"), (F.col("id") * 7).alias("query_vec")
    )
    for search_fn in (hnsw.search, search_driver_loop):
        res = search_fn(idx, queries, k=1, metric="hamming", params=PARAMS).collect()
        assert len(res) == 11
        assert all(r.query_id == r.vec_id and r.dist == 0.0 for r in res)
    # degree bounds hold across every round's merge
    links = hnsw.to_links(idx)
    over = links.where(
        (F.col("layer") == 0) & (F.size("nbrs") > PARAMS.get_M_max(0))
    ).count()
    over += links.where(
        (F.col("layer") > 0) & (F.size("nbrs") > PARAMS.get_M_max(1))
    ).count()
    assert over == 0


def test_insert_op_stream_protocol(spark, code_index):
    """The insert-path op stream (coroutine.rs insert flow): the search
    phase's ops end with SearchResult, then the write phase emits
    SetEntryPoint (iff the batch raises the top layer) and SetLinks —
    the reference's two-phase insert protocol."""
    from hawk_pack_spark.operators.hnsw_driver import insert_round_driver_loop

    batch = spark.range(5).select(
        (F.col("id") + 900).alias("vec_id"), (F.col("id") + 77).alias("code")
    )
    ops: list = []
    insert_round_driver_loop(
        code_index, batch, metric="hamming", params=PARAMS,
        vec_col="code", op_log=ops,
    ).count()
    names = [o[0] for o in ops]
    assert names[0] == "GetEntryPoint"
    assert names[-1] == "SetLinks"
    assert "SearchResult" in names
    # write-phase ops come strictly after the search phase
    assert names.index("SearchResult") < names.index("SetLinks")
    if "SetEntryPoint" in names:
        assert names.index("SearchResult") < names.index("SetEntryPoint")


def test_driver_loop_large_batch_dedupe_path(spark):
    """A batch big enough to cross the in-plan dedupe threshold (the
    batch-traffic fix: payloads never per-edge, keys dedupe before the
    vectors probe) returns the same rows as per-query small batches —
    the hop plan variant must not change results."""
    import pyspark.sql.functions as F

    from hawk_pack_spark.operators import hnsw
    from hawk_pack_spark.operators.hnsw_driver import search_driver_loop
    from hawk_pack_spark.sources import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    idx = hnsw.build_index(emb, num_shards=2).localCheckpoint()
    big = emb.where(F.col("vec_id") < 300).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = search_driver_loop(idx, big, k=3)
    rows = got.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == big.count()
    assert all(len(v) == 3 for v in per_q.values())
    # self-recall through the big batch: every query's own vector is in
    # the index, so rank-1 must be itself at distance 0
    assert all(
        any(r.vec_id == q and r.dist == 0.0 for r in v)
        for q, v in per_q.items()
    )
