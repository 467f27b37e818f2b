"""RRF fusion unit semantics (the catalog row covers the end-to-end
hybrid against the DuckDB oracle)."""

from __future__ import annotations

import pytest

from hawk_pack_spark.operators.retrieval import rrf_fuse


def test_rrf_fuse_combines_ranks(spark):
    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 10, 3)], "query_id long, doc_id long, rank int"
    )
    out = {r.doc_id: (r.rrf, r.rank) for r in rrf_fuse([lex, sem], k=4).collect()}
    # doc 11: 1/62 + 1/61 > doc 10: 1/61 + 1/63 > 12: 1/63 > 13: 1/62
    assert out[11][1] == 1 and out[10][1] == 2
    assert out[13][1] == 3 and out[12][1] == 4  # 1/62 > 1/63
    assert abs(out[11][0] - round(1 / 62 + 1 / 61, 9)) < 1e-12


def test_rrf_fuse_single_arm_preserves_order(spark):
    lex = spark.createDataFrame(
        [(0, 5, 1), (0, 6, 2), (1, 7, 1)], "query_id long, doc_id long, rank int"
    )
    rows = rrf_fuse([lex], k=10).orderBy("query_id", "rank").collect()
    assert [(r.query_id, r.doc_id, r.rank) for r in rows] == [
        (0, 5, 1), (0, 6, 2), (1, 7, 1)
    ]


def test_rrf_fuse_empty_input_rejected(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_hard_negatives_excludes_same_label_and_ranks_by_dist(spark):
    from hawk_pack_spark.operators.retrieval import hard_negatives
    from pyspark.sql import functions as F

    vecs = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [0.1, 0.0], 0),   # same label as anchor — excluded
            (3, [0.2, 0.0], 1),   # nearest cross-label
            (4, [0.9, 0.0], 1),
            (5, [0.5, 0.0], 2),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    anchors = vecs.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    got = [
        (r.vec_id, r.rank)
        for r in hard_negatives(vecs, anchors, k=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(3, 1), (5, 2), (4, 3)]


def test_hard_negatives_index_postfilter_recall(spark, sf_dir):
    """The ANN over-fetch path: every anchor gets exactly k cross-label
    negatives (doubling rounds + exact fallback fill), no same-label
    hit survives, and recall vs the exact path is >= 0.9."""
    from pyspark.sql import functions as F

    from hawk_pack_spark.operators.hnsw import build_index
    from hawk_pack_spark.operators.retrieval import hard_negatives
    from hawk_pack_spark.sources import load_table

    vecs = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    ).localCheckpoint()
    anchors = vecs.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    index = build_index(vecs.select("vec_id", "embedding"), num_shards=2)
    dec = {}
    got = hard_negatives(
        vecs, anchors, k=5, index_df=index, decision_out=dec
    ).collect()
    assert dec["path"] == "index_postfilter"
    per_a = {}
    for r in got:
        per_a.setdefault(r.anchor_id, []).append(r)
    assert all(len(v) == 5 for v in per_a.values()) and len(per_a) == 6
    alab = {r.anchor_id: r.anchor_label for r in anchors.collect()}
    assert all(r.label != alab[r.anchor_id] for r in got)
    want = hard_negatives(vecs, anchors, k=5)
    ws = {(r.anchor_id, r.vec_id) for r in want.collect()}
    gs = {(r.anchor_id, r.vec_id) for r in got}
    assert len(gs & ws) / len(ws) >= 0.9
