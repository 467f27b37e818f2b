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
