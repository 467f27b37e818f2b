"""Round-9 tail batch 3: retrieval eval metrics + winsorization."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F


def test_eval_metrics_hand_computed(spark):
    from hawk_pack_spark.operators.retrieval import eval_metrics

    # query 1: results docs 10,11,12 at ranks 1,2,3; judged: 11 (rel 2),
    # 12 (rel 1), 13 (rel 3, NOT retrieved)
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],   # query 2: nothing relevant retrieved
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 11, 2), (1, 12, 1), (1, 13, 3),
         (2, 99, 1),
         (3, 5, 1)],  # query 3 has no results rows at all
        "query_id long, doc_id long, rel long",
    )
    out = {r.query_id: r for r in eval_metrics(results, qrels, k=3).collect()}
    r1 = out[1]
    assert r1.n_judged == 3
    assert r1.recall_at_3 == round(2 / 3, 6)
    assert r1.precision_at_3 == round(2 / 3, 6)
    assert r1.reciprocal_rank == 0.5  # first relevant at rank 2
    dcg = 2 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert abs(r1.ndcg_at_3 - round(dcg / idcg, 6)) < 1e-9
    r2 = out[2]
    assert r2.recall_at_3 == 0.0 and r2.reciprocal_rank == 0.0
    assert r2.ndcg_at_3 == 0.0
    # query 3: judged but never retrieved -> no per-query row (its
    # results side is empty; the operator evaluates retrieved queries)
    assert 3 not in out


def test_eval_metrics_perfect_ranking(spark):
    from hawk_pack_spark.operators.retrieval import eval_metrics

    results = spark.createDataFrame(
        [(7, d, i + 1) for i, d in enumerate([3, 1, 2])],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(7, 3, 3), (7, 1, 2), (7, 2, 1)],
        "query_id long, doc_id long, rel long",
    )
    (row,) = eval_metrics(results, qrels, k=3).collect()
    assert row.ndcg_at_3 == 1.0 and row.recall_at_3 == 1.0
    assert row.reciprocal_rank == 1.0


def test_winsorize_nearest_rank_reference(spark):
    from hawk_pack_spark.functions.curation import winsorize

    rng = np.random.default_rng(13)
    vals = np.round(np.concatenate(
        [rng.normal(100, 10, 195), [500.0, 520.0, -50.0, -60.0, 480.0]]
    ), 2)
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)],
        "event_id long, g string, v double",
    )
    out = {
        r.event_id: r.value_winsorized
        for r in winsorize(df, ["g"], "v", 0.05, 0.95).collect()
    }
    cents = np.round(vals * 100).astype(np.int64)
    s = np.sort(cents)
    n = len(s)
    lo = s[math.ceil(0.05 * n) - 1]
    hi = s[math.ceil(0.95 * n) - 1]
    for i, c in enumerate(cents):
        want = min(max(c, lo), hi) / 100.0
        assert out[i] == want, (i, out[i], want)
    # the planted tails actually got clipped
    assert out[195] == hi / 100.0 and out[197] == lo / 100.0
