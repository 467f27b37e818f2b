"""Round-9 batch 9: top-p domain curation, cross-series correlations
— closed-form checks."""

from __future__ import annotations

import numpy as np


def test_domain_token_topp_cut_and_first_doc_guarantee(spark):
    from hawk_pack_spark.functions.curation import domain_token_topp

    # stratum A: quality 3,2,1 with 4 tokens each (total 12);
    # p=500 (50%) -> cum 4 (33%) keeps doc 1, cum 8 (66%) > 50% stops.
    # stratum B: one giant doc -> first-doc guarantee keeps it even
    # though it alone exceeds the budget.
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "A", 3),
            (2, "e f g h", "A", 2),
            (3, "i j k l", "A", 1),
            (4, "m n o p q r", "B", 9),
        ],
        "doc_id long, text string, source string, q long",
    )
    out = domain_token_topp(docs, p_permille=500, quality_col="q").collect()
    kept = {r.doc_id for r in out}
    assert kept == {1, 4}
    rows = {r.doc_id: r for r in out}
    assert rows[1].cum_tokens == 4 and rows[1].stratum_tokens == 12
    assert rows[4].cum_tokens == 6 and rows[4].stratum_tokens == 6


def test_domain_token_topp_deterministic_tie_order(spark):
    from hawk_pack_spark.functions.curation import domain_token_topp

    # equal quality -> lowest doc_id wins the budget
    docs = spark.createDataFrame(
        [(1, "a b", "A", 5), (2, "c d", "A", 5), (3, "e f", "A", 5)],
        "doc_id long, text string, source string, q long",
    )
    out = domain_token_topp(docs, p_permille=700, quality_col="q").collect()
    assert {r.doc_id for r in out} == {1, 2}  # 4 of 6 tokens = 66% <= 70%


def test_cross_correlations_matches_numpy(spark):
    from hawk_pack_spark.operators.analytics import cross_correlations

    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    ys = [2, 7, 1, 8, 2, 8, 1, 8]
    rows = [("a", t, x) for t, x in enumerate(xs)] + [
        ("b", t, y) for t, y in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "s string, t long, x long")
    (r,) = cross_correlations(df, "s", "t", "x").collect()
    assert (r.series_a, r.series_b) == ("a", "b")
    assert r.n_common == 8
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(r.pearson - round(want, 6)) < 1e-6


def test_cross_correlations_partial_overlap_and_constant_drop(spark):
    from hawk_pack_spark.operators.analytics import cross_correlations

    rows = (
        [("a", t, t) for t in range(5)]
        + [("b", t, 2 * t) for t in range(2, 9)]   # overlap t=2..4
        + [("c", t, 7) for t in range(5)]          # constant -> dropped
    )
    df = spark.createDataFrame(rows, "s string, t long, x long")
    out = {(r.series_a, r.series_b): r for r in cross_correlations(df, "s", "t", "x").collect()}
    assert ("a", "b") in out and out[("a", "b")].n_common == 3
    assert out[("a", "b")].pearson == 1.0  # both linear in t
    # any pair with the constant series has zero variance -> absent
    assert ("a", "c") not in out and ("b", "c") not in out
