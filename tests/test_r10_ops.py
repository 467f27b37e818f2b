"""Round-10 operator closed-form tests: join-key skew profiling,
Benford first-digit screening, degree assortativity, Jensen-Shannon
source divergence, seasonal decomposition, and the lossless all-pairs
weighted-cosine join (Bayardo WWW'07) vs numpy brute force."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def test_key_skew_profile_closed_form(spark):
    from hawk_pack_spark.operators.profile import key_skew_profile

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] + [(None,)] * 4
    df = spark.createDataFrame(rows, "k string")
    got = {r.key: r for r in key_skew_profile(df, "k", top_k=2).collect()}
    assert set(got) == {"a", "b"}  # top-2 only; NULLs excluded
    assert got["a"].n_rows == 6
    assert got["a"].share_ppm == 600000
    assert got["a"].skew_ratio == pytest.approx(1.8)  # 6 * 3 / 10
    assert got["b"].share_ppm == 300000
    assert got["b"].skew_ratio == pytest.approx(0.9)


def test_benford_first_digit_closed_form(spark):
    from hawk_pack_spark.operators.profile import benford_first_digit

    df = spark.createDataFrame(
        [(1.23,), (25.0,), (0.05,), (-3.0,), (None,)], "v double"
    )
    got = {r.digit: r for r in benford_first_digit(df, "v").collect()}
    # cents: 123 -> 1, 2500 -> 2, 5 -> 5; negatives and NULLs excluded
    assert set(got) == {1, 2, 5}
    assert all(r.n_values == 1 and r.share_ppm == 333333 for r in got.values())
    assert got[1].benford_ppm == 301030
    assert got[1].deviation_ppm == abs(333333 - 301030)


def test_degree_assortativity_star_and_regular(spark):
    from hawk_pack_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "a long, b long"
    )
    row = degree_assortativity(star).collect()[0]
    assert row.m_directed == 6
    assert row.assortativity == pytest.approx(-1.0)  # pure hub-to-leaf

    cycle = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "a long, b long"
    )
    row = degree_assortativity(cycle).collect()[0]
    assert row.assortativity is None  # regular graph: zero variance


def test_js_divergence_identical_and_disjoint(spark):
    from hawk_pack_spark.operators.bm25 import js_divergence

    docs = spark.createDataFrame(
        [
            (1, "A", "x x y"),
            (2, "B", "x x y"),
            (3, "C", "z z z"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r.class_a, r.class_b): r.js_divergence
        for r in js_divergence(docs, "source", "text").collect()
    }
    assert got[("A", "B")] == pytest.approx(0.0)  # identical dists
    assert got[("A", "C")] == pytest.approx(math.log(2), abs=1e-6)  # disjoint
    assert got[("B", "C")] == pytest.approx(math.log(2), abs=1e-6)


def test_js_divergence_residual_bucket(spark):
    """vocab_size smaller than the vocabulary forces out-of-vocab mass
    into the '' residual bucket; the measure must still be a valid JS
    (0 for identical inputs, > 0 otherwise) over the cut support."""
    from hawk_pack_spark.operators.bm25 import js_divergence

    docs = spark.createDataFrame(
        [
            (1, "A", "x x x y z w"),
            (2, "B", "x x x y z w"),
            (3, "C", "x q q q r r"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r.class_a, r.class_b): r
        for r in js_divergence(docs, "source", "text", vocab_size=2).collect()
    }
    assert got[("A", "B")].js_divergence == pytest.approx(0.0)
    assert got[("A", "C")].js_divergence > 0.0
    assert all(r.n_terms <= 3 for r in got.values())  # 2 vocab + residual


def test_seasonal_decompose_exact_recovery(spark):
    """A series built as linear trend + pure weekly pattern must be
    recovered exactly: trend = the line, seasonal = the phase effect
    (de-meaned by the MA), residual = 0 on every full-window row."""
    from hawk_pack_spark.operators.analytics import seasonal_decompose

    effect = [0, 70, 140, 210, 280, 350, 420]  # by epoch-day mod 7
    d0 = dt.date(2024, 1, 1)
    epoch = dt.date(1970, 1, 1)
    rows = []
    for i in range(21):
        day = d0 + dt.timedelta(days=i)
        ed = (day - epoch).days
        rows.append(("k", day, 10 * ed + effect[ed % 7]))
    df = spark.createDataFrame(rows, "g string, day date, v long")
    out = {
        r.day: r
        for r in seasonal_decompose(df, ["g"], "day", "v").collect()
    }
    assert len(out) == 21
    mean_effect = sum(effect) / 7.0
    for i in range(3, 18):  # full centered windows only
        day = d0 + dt.timedelta(days=i)
        ed = (day - epoch).days
        r = out[day]
        assert r.trend == pytest.approx(10 * ed + mean_effect)
        assert r.seasonal == pytest.approx(effect[ed % 7] - mean_effect)
        assert r.residual == pytest.approx(0.0, abs=1e-6)
    # edge rows: no full window -> NULL trend/residual
    assert out[d0].trend is None and out[d0].residual is None


def test_cosine_prefix_join_lossless_vs_brute_force(spark):
    """The Bayardo prefix filter must be LOSSLESS: the pair set equals
    the numpy brute-force tf-idf cosine pair set at the threshold, and
    the similarity values match."""
    import numpy as np

    from hawk_pack_spark.operators.dedup import cosine_prefix_join

    rng = np.random.default_rng(11)
    vocab = [f"t{j}" for j in range(25)]
    docs = []
    for i in range(40):
        k = rng.integers(3, 9)
        words = list(rng.choice(vocab, size=k, replace=True))
        if i % 7 == 0 and i > 0:  # plant near-dups of doc i-1
            words = docs[i - 1][1].split()[: max(2, k - 1)] + [vocab[0]]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # local brute force with the operator's exact weight definition
    n = len(docs)
    tf = [dict() for _ in range(n)]
    for i, (_, text) in enumerate(docs):
        for w_ in text.split():
            tf[i][w_] = tf[i].get(w_, 0) + 1
    dfreq = {}
    for row in tf:
        for t in row:
            dfreq[t] = dfreq.get(t, 0) + 1
    mats = []
    for row in tf:
        v = {
            t: c * math.log(n / dfreq[t])
            for t, c in row.items()
            if dfreq[t] < n
        }
        nrm = math.sqrt(sum(x * x for x in v.values()))
        mats.append({t: x / nrm for t, x in v.items()} if nrm > 0 else {})
    thr = 0.5
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            s = sum(mats[a][t] * mats[b][t] for t in mats[a] if t in mats[b])
            assert abs(s - thr) > 1e-6  # no boundary-ambiguous pair
            if s >= thr:
                want[(a, b)] = s

    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_prefix_join(df, threshold=thr).collect()
    }
    assert set(got) == set(want)
    for p, s in want.items():
        assert got[p] == pytest.approx(s, abs=1e-6)


def test_cosine_prefix_join_validates_threshold(spark):
    from hawk_pack_spark.operators.dedup import cosine_prefix_join

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        cosine_prefix_join(df, threshold=0.0)


def test_calibration_report_closed_form(spark):
    from hawk_pack_spark.operators.analytics import calibration_report

    df = spark.createDataFrame(
        [(0.05, 0), (0.15, 0), (0.95, 1), (0.95, 0), (1.0, 1), (None, 1),
         (0.5, None)],
        "p double, y int",
    )
    got = {r.bin: r for r in calibration_report(df, "p", "y").collect()}
    assert set(got) == {0, 1, 9}  # NULLs excluded; p=1.0 clamps to bin 9
    assert got[0].n == 1 and got[0].frac_pos == 0.0
    assert got[0].brier == pytest.approx(0.0025)
    assert got[1].brier == pytest.approx(0.0225)
    b9 = got[9]
    assert b9.n == 3 and b9.n_pos == 2
    assert b9.mean_pred == pytest.approx((0.95 + 0.95 + 1.0) / 3, abs=1e-6)
    assert b9.frac_pos == pytest.approx(2 / 3, abs=1e-6)
    assert b9.brier == pytest.approx(
        ((0.95 - 1) ** 2 + 0.95 ** 2 + 0.0) / 3, abs=1e-6
    )


def test_holt_forecast_matches_reference_loop(spark):
    from hawk_pack_spark.operators.analytics import holt_forecast

    ys = [10.0, 12.0, 15.0, 14.0, 18.0, 21.0]
    a, b = 0.5, 0.25
    l, t = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        l_new = a * y + (1 - a) * (l + t)
        t = b * (l_new - l) + (1 - b) * t
        l = l_new
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)] + [("solo", 0, 5.0)],
        "g string, o int, v double",
    )
    got = {
        r.g: r
        for r in holt_forecast(
            df, ["g"], "o", "v", alpha=a, beta=b, horizon=2
        ).collect()
    }
    assert got["k"].level == pytest.approx(l, abs=1e-6)
    assert got["k"].trend == pytest.approx(t, abs=1e-6)
    assert got["k"].forecast == pytest.approx(l + 2 * t, abs=1e-6)
    assert got["solo"].level is None  # < 2 points: no trend estimable


def test_rank_biased_overlap_identical_disjoint_partial(spark):
    from hawk_pack_spark.operators.retrieval import rank_biased_overlap

    def ranking(qid, doclist):
        return [(qid, d, i + 1) for i, d in enumerate(doclist)]

    k, p = 5, 0.8
    a = spark.createDataFrame(
        ranking(1, [10, 11, 12, 13, 14])
        + ranking(2, [10, 11, 12, 13, 14])
        + ranking(3, [10, 11, 12, 13, 14]),
        "query_id long, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        ranking(1, [10, 11, 12, 13, 14])      # identical
        + ranking(2, [20, 21, 22, 23, 24])    # disjoint
        + ranking(3, [11, 10, 12, 13, 14]),   # top-2 swapped
        "query_id long, doc_id long, rank long",
    )
    got = {
        r.query_id: r.rbo
        for r in rank_biased_overlap(a, b, k=k, p=p).collect()
    }
    assert got[1] == pytest.approx(1.0, abs=1e-6)
    assert got[2] == pytest.approx(0.0, abs=1e-6)
    # local reference for the swapped case
    la, lb = [10, 11, 12, 13, 14], [11, 10, 12, 13, 14]
    s = sum(
        p ** (d - 1) * len(set(la[:d]) & set(lb[:d])) / d
        for d in range(1, k + 1)
    )
    ref = (1 - p) * s + p ** k * (len(set(la) & set(lb)) / k)
    assert got[3] == pytest.approx(ref, abs=1e-6)


def test_rank_biased_overlap_validates_p(spark):
    from hawk_pack_spark.operators.retrieval import rank_biased_overlap

    df = spark.createDataFrame([(1, 2, 1)], "query_id long, doc_id long, rank long")
    with pytest.raises(ValueError, match="p must"):
        rank_biased_overlap(df, df, p=1.0)


def test_welch_ttest_matches_reference(spark):
    from hawk_pack_spark.operators.analytics import welch_ttest

    a = [10.25, 12.5, 11.0, 13.75, 12.25]
    b = [14.0, 15.5, 13.25, 16.75]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = welch_ttest(df, "grp", "v").collect()[0]

    import statistics as st

    m1, m2 = st.mean(a), st.mean(b)
    v1, v2 = st.variance(a), st.variance(b)
    n1, n2 = len(a), len(b)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    dof = se2 ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    assert got.group_a == "A" and got.group_b == "B"
    assert got.mean_a == pytest.approx(m1, abs=1e-6)
    assert got.t == pytest.approx(t, abs=1e-6)
    assert got.df == pytest.approx(dof, abs=1e-6)


def test_welch_ttest_rejects_wrong_group_count(spark):
    from hawk_pack_spark.operators.analytics import welch_ttest

    df = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("C", 3.0)], "grp string, v double"
    )
    with pytest.raises(Exception, match="two groups"):
        welch_ttest(df, "grp", "v").collect()


def test_mann_whitney_u_matches_scipy_formula(spark):
    from hawk_pack_spark.operators.analytics import mann_whitney_u

    a = [1.2, 3.4, 3.4, 5.0, 7.75]
    b = [2.2, 3.4, 6.1, 8.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = mann_whitney_u(df, "grp", "v").collect()[0]

    # local reference with midranks + tie correction
    import itertools

    allv = sorted(a + b)
    ranks = {}
    i = 0
    for v, grp_ in itertools.groupby(allv):
        t = len(list(grp_))
        ranks[v] = (2 * i + t + 1) / 2  # midrank of the tie block
        i += t
    r1 = sum(ranks[v] for v in a)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2
    tie = sum(
        t ** 3 - t
        for _, t in ((v, len(list(g))) for v, g in itertools.groupby(allv))
    )
    sigma2 = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(sigma2)
    assert got.u_a == pytest.approx(u1, abs=1e-6)
    assert got.z == pytest.approx(z, abs=1e-6)
    assert (got.n_a, got.n_b) == (5, 4)


def test_mann_whitney_u_rejects_wrong_group_count(spark):
    from hawk_pack_spark.operators.analytics import mann_whitney_u

    df = spark.createDataFrame([("A", 1.0)], "grp string, v double")
    with pytest.raises(Exception, match="two groups"):
        mann_whitney_u(df, "grp", "v").collect()


def test_ks_test_matches_scipy_style_reference(spark):
    from hawk_pack_spark.operators.analytics import ks_test_2samp

    a = [1.0, 2.0, 2.0, 3.5, 7.0, 9.25]
    b = [2.0, 4.0, 5.5, 8.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = ks_test_2samp(df, "grp", "v").collect()[0]

    vals = sorted(set(a + b))
    d = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in vals
    )
    assert got.d_stat == pytest.approx(d, abs=1e-6)
    assert (got.n_a, got.n_b) == (6, 4)
    assert got.threshold_scale == pytest.approx(
        math.sqrt((6 + 4) / (6 * 4)), abs=1e-6
    )


def test_ks_test_identical_distributions_zero(spark):
    from hawk_pack_spark.operators.analytics import ks_test_2samp

    rows = [("A", float(i % 5)) for i in range(50)] + [
        ("B", float(i % 5)) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = ks_test_2samp(df, "grp", "v").collect()[0]
    assert got.d_stat == 0.0


def test_ks_test_rejects_wrong_group_count(spark):
    from hawk_pack_spark.operators.analytics import ks_test_2samp

    df = spark.createDataFrame([("A", 1.0)], "grp string, v double")
    with pytest.raises(ValueError, match="two groups"):
        ks_test_2samp(df, "grp", "v")
