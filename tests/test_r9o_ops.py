"""Round-9 batch 14: forward as-of, RFM segmentation, vocabulary
overlap — closed-form checks."""

from __future__ import annotations

import datetime


def _d(*a):
    return datetime.datetime(*a)


def test_asof_forward_picks_next_not_previous(spark):
    from hawk_pack_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 7, _d(2024, 1, 1, 12, 0, 0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, _d(2024, 1, 1, 11, 0, 0), 100.0),  # before: invisible
            (7, _d(2024, 1, 1, 13, 0, 0), 200.0),  # next: winner
            (7, _d(2024, 1, 1, 14, 0, 0), 300.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    (r,) = asof_join_forward(left, right, "user_id").collect()
    assert r.asof_value == 200.0


def test_asof_forward_equal_ts_visible_and_null_when_none(spark):
    from hawk_pack_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 7, _d(2024, 1, 1)), (2, 8, _d(2024, 1, 5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _d(2024, 1, 1), 50.0), (8, _d(2024, 1, 1), 60.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {r.event_id: r.asof_value for r in asof_join_forward(left, right, "user_id").collect()}
    assert out[1] == 50.0  # ts == left.ts is visible (>=)
    assert out[2] is None  # only earlier rows exist -> NULL


def test_rfm_segments_quintile_scores(spark):
    from hawk_pack_spark.operators.analytics import rfm_segments

    # 10 customers: recency 1..10, frequency 10..1, monetary 1..10
    rows = [(i, i, 11 - i, i * 100) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, r long, f long, m long")
    out = {x.id: x for x in rfm_segments(df, "id", "r", "f", "m").collect()}
    # thresholds at ranks 2,4,6,8 -> r-values 2,4,6,8
    # customer 1: recency 1 < all -> r=5; frequency 10 > all -> f=5;
    # monetary 100: not above any threshold -> m=1
    assert out[1].r_score == 5 and out[1].f_score == 5 and out[1].m_score == 1
    assert out[1].segment == 551
    # customer 10: recency 10 -> r=1; frequency 1 -> f=1; monetary top -> 5
    assert out[10].segment == 115
    # middle customer 5: r in (4,6] -> below t60,t80 only -> score 3
    assert out[5].r_score == 3


def test_vocab_overlap_hand_sets(spark):
    from hawk_pack_spark.operators.bm25 import vocab_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s2"),
            (3, "x y", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.class_a, r.class_b): r for r in vocab_overlap(docs).collect()}
    r = out[("s1", "s2")]
    assert r.n_common == 2 and r.n_union == 4 and r.jaccard == 0.5
    # disjoint vocabularies never meet the join -> absent (jaccard 0)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out
