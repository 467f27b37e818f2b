"""Round-9 batch 8: funnel latency, bounce rate, gap percentiles,
c-TF-IDF — closed-form checks."""

from __future__ import annotations

import datetime
import math


def _d(*a):
    return datetime.datetime(*a)


def test_funnel_latency_chained_min_semantics(spark):
    from hawk_pack_spark.operators.analytics import funnel_latency

    rows = [
        # user 1: signup t0, view t0+10, click t0+40
        (1, "signup", _d(2024, 1, 1, 0, 0, 0)),
        (1, "view", _d(2024, 1, 1, 0, 0, 10)),
        (1, "click", _d(2024, 1, 1, 0, 0, 40)),
        # user 2: view BEFORE signup must not count; the later view does
        (2, "view", _d(2024, 1, 1, 0, 0, 0)),
        (2, "signup", _d(2024, 1, 1, 0, 0, 5)),
        (2, "view", _d(2024, 1, 1, 0, 0, 25)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        (r.transition_idx, r.percentile): r
        for r in funnel_latency(ev, ["signup", "view", "click"], (50, 100)).collect()
    }
    # signup->view latencies: user1=10, user2=20 -> p50=10, p100=20
    assert out[(1, 50)].latency_s == 10 and out[(1, 100)].latency_s == 20
    assert out[(1, 50)].n_users == 2
    assert out[(1, 50)].from_stage == "signup" and out[(1, 50)].to_stage == "view"
    # view->click: only user1 (30s)
    assert out[(2, 50)].latency_s == 30 and out[(2, 50)].n_users == 1


def test_bounce_rate_hand_sessions(spark):
    from hawk_pack_spark.operators.analytics import bounce_rate

    rows = [
        # user 1, Jan 1: two events 10s apart = ONE session (no bounce)
        (1, 1, _d(2024, 1, 1, 10, 0, 0)),
        (1, 2, _d(2024, 1, 1, 10, 0, 10)),
        # user 1, Jan 1: one event 2h later = bounce
        (1, 3, _d(2024, 1, 1, 12, 30, 0)),
        # user 2, Jan 2: single event = bounce
        (2, 4, _d(2024, 1, 2, 9, 0, 0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {str(r.day): r for r in bounce_rate(ev).collect()}
    assert out["2024-01-01"].n_sessions == 2
    assert out["2024-01-01"].n_bounces == 1
    assert out["2024-01-01"].bounce_rate == 0.5
    assert out["2024-01-02"].n_sessions == 1 and out["2024-01-02"].n_bounces == 1


def test_gap_percentiles_selection(spark):
    from hawk_pack_spark.operators.analytics import gap_percentiles

    base = _d(2024, 1, 1)
    offsets = [0, 10, 30, 60, 100]  # gaps 10, 20, 30, 40
    rows = [
        ("a", i, base + datetime.timedelta(seconds=o))
        for i, o in enumerate(offsets)
    ]
    ev = spark.createDataFrame(rows, "g string, event_id long, ts timestamp")
    out = {
        r.percentile: r
        for r in gap_percentiles(ev, ["g"], "ts", "event_id", (50, 100)).collect()
    }
    assert out[50].gap_s == 20 and out[100].gap_s == 40
    assert out[50].n_gaps == 4


def test_ctfidf_separates_class_terms(spark):
    from hawk_pack_spark.operators.bm25 import ctfidf_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple shared", "fruit"),
            (2, "banana shared", "fruit"),
            (3, "carrot carrot carrot shared", "veg"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r["class"], r.rank): r for r in ctfidf_terms(docs, top_k=2).collect()}
    # 'shared' appears in both classes -> ln(2/2)=0 score; class-unique
    # terms rank first
    assert out[("fruit", 1)].term == "apple"
    assert out[("fruit", 1)].ctfidf == round(2 * math.log(2), 6)
    assert out[("veg", 1)].term == "carrot"
    assert out[("veg", 1)].ctfidf == round(3 * math.log(2), 6)
    shared = [r for r in out.values() if r.term == "shared"]
    assert all(r.ctfidf == 0.0 for r in shared)
