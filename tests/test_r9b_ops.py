"""Round-9 tail operators: Bloom semi-join reduction, entropy
profiling, Gini concentration, TWAP, linear interpolation, 2-D
skyline, CUSUM change points — local-reference checks (the catalog
rows carry the DuckDB parity)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F


def test_bloom_semi_join_equals_exact(spark):
    from hawk_pack_spark.operators.bloomjoin import bloom_semi_join

    fact = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    keys = spark.range(0, 10_000, 7).select(F.col("id").alias("k"))
    got = sorted(r.k for r in bloom_semi_join(fact, keys, "k").collect())
    exp = sorted(r.k for r in fact.join(keys, "k", "leftsemi").collect())
    assert got == exp


def test_bloom_unverified_is_superset_with_low_fp(spark):
    from hawk_pack_spark.operators.bloomjoin import bloom_semi_join

    fact = spark.range(10_000).select(F.col("id").alias("k"))
    keys = spark.range(0, 10_000, 7).select(F.col("id").alias("k"))
    approx = set(
        r.k
        for r in bloom_semi_join(fact, keys, "k", verify=False).collect()
    )
    exact = set(range(0, 10_000, 7))
    assert exact <= approx  # no false negatives, ever
    # 10 bits/key, 4 hashes → ~1-2% fp; allow generous 5% headroom
    assert len(approx) - len(exact) < 0.05 * 10_000


def test_bloom_null_and_distinct_key_semantics(spark):
    from hawk_pack_spark.operators.bloomjoin import bloom_semi_join

    fact = spark.createDataFrame(
        [(1,), (2,), (None,), (2,)], "k int"
    )
    keys = spark.createDataFrame([(2,), (2,), (None,)], "k int")
    got = sorted(r.k for r in bloom_semi_join(fact, keys, "k").collect())
    # semi-join: NULL never matches, duplicates on the fact side kept
    assert got == [2, 2]


def test_group_entropy_closed_form(spark):
    from hawk_pack_spark.operators.profile import group_entropy

    rows = (
        [("g1", c) for c in "aab"]
        + [("g2", c) for c in "abcd"]
        + [("g3", c) for c in "aaaa"]
        + [("g4", None)]
    )
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.g: r for r in group_entropy(df, ["g"], "c").collect()}

    def ent(cs):
        n = sum(cs)
        return math.log(n) - sum(c * math.log(c) for c in cs) / n

    assert abs(out["g1"].entropy - round(ent([2, 1]), 6)) < 1e-9
    assert out["g2"].entropy == round(math.log(4), 6)  # uniform max
    assert out["g2"].norm_entropy == 1.0
    assert abs(out["g2"].gini_impurity - 0.75) < 1e-9
    # single category: zero dispersion by definition, no div-by-zero
    assert out["g3"].entropy == 0.0 and out["g3"].norm_entropy == 0.0
    assert out["g3"].gini_impurity == 0.0
    assert "g4" not in out  # all-NULL group contributes nothing


def test_gini_concentration_closed_form(spark):
    from hawk_pack_spark.operators.analytics import gini_concentration

    vals = [("g", float(x)) for x in [1, 2, 3, 4]] + [
        ("h", 10.0),
        ("h", 0.0),
        ("u", 5.0),
        ("u", 5.0),
        ("u", 5.0),
    ]
    df = spark.createDataFrame(vals, "g string, v double")
    out = {r.g: r for r in gini_concentration(df, ["g"], "v").collect()}

    def gini(xs):
        xs = sorted(xs)
        n, s = len(xs), sum(xs)
        return (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s) / (n * s)

    assert abs(out["g"].gini - gini([1, 2, 3, 4])) < 1e-12
    assert abs(out["h"].gini - 0.5) < 1e-12  # one member holds all
    assert out["u"].gini == 0.0  # perfectly even
    assert out["g"].n_members == 4


def test_time_weighted_avg_step_integral(spark):
    from hawk_pack_spark.operators.analytics import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(seconds=10), 20.0),
        ("a", t0 + dt.timedelta(seconds=40), 99.0),  # no successor: weight 0
        ("b", t0, 7.0),  # single point: no interval, group dropped
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r.g: r.twap for r in time_weighted_avg(df, ["g"], "ts", "v").collect()}
    assert abs(out["a"] - (10 * 10 + 20 * 30) / 40) < 1e-9
    assert "b" not in out


def test_time_weighted_avg_microsecond_exact(spark):
    from hawk_pack_spark.operators.analytics import time_weighted_avg

    # sub-second spacing: weights must be exact micros, not floored s
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(microseconds=250_000), 3.0),
        ("a", t0 + dt.timedelta(microseconds=1_000_000), 0.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    (row,) = time_weighted_avg(df, ["g"], "ts", "v").collect()
    assert abs(row.twap - (1.0 * 0.25 + 3.0 * 0.75)) < 1e-9


def test_interpolate_linear_fills_and_edges(spark):
    from hawk_pack_spark.operators.analytics import interpolate_linear

    rows = [
        ("a", 1, 10.0),
        ("a", 2, None),
        ("a", 3, None),
        ("a", 4, 40.0),
        ("a", 5, None),  # trailing edge: stays NULL
        ("b", 1, None),  # leading edge: stays NULL
        ("b", 2, 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, i int, v double")
    out = {
        (r.g, r.i): r.value_filled
        for r in interpolate_linear(df, ["g"], ["i"], "v").collect()
    }
    assert out[("a", 2)] == 20.0 and out[("a", 3)] == 30.0
    assert out[("a", 1)] == 10.0 and out[("a", 4)] == 40.0
    assert out[("a", 5)] is None and out[("b", 1)] is None


def test_skyline_2d_equals_brute_force(spark):
    from hawk_pack_spark.operators.analytics import skyline_2d

    rng = np.random.default_rng(3)
    pts = [(int(x), int(y)) for x, y in rng.integers(0, 30, size=(200, 2))]
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    uniq = set(pts)

    def dom(a, b):
        return a[0] <= b[0] and a[1] <= b[1] and a != b

    exp = sorted(
        (float(x), float(y))
        for (x, y) in uniq
        if not any(dom(o, (x, y)) for o in uniq)
    )
    assert got == exp


def test_skyline_2d_extra_cols_semi_join(spark):
    from hawk_pack_spark.operators.analytics import skyline_2d

    rows = [(1.0, 5.0, "p1"), (2.0, 4.0, "p2"), (3.0, 6.0, "p3")]
    df = spark.createDataFrame(rows, "x double, y double, name string")
    got = sorted(
        (r.x, r.y, r.name)
        for r in skyline_2d(df, "x", "y", extra_cols=["name"]).collect()
    )
    assert got == [(1.0, 5.0, "p1"), (2.0, 4.0, "p2")]


def test_cusum_flags_match_sequential_reference(spark):
    from hawk_pack_spark.operators.analytics import cusum_flags

    rng = np.random.default_rng(11)
    series = list(np.round(rng.normal(10, 1, 60), 2)) + list(
        np.round(rng.normal(14, 1, 40), 2)
    )  # level shift at i=60
    rows = [("a", i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "g string, i int, v double")
    allowance, threshold = 1.0, 5.0
    out = sorted(
        (r.i, r.cusum)
        for r in cusum_flags(
            df, ["g"], ["i"], "v", allowance=allowance, threshold=threshold
        ).collect()
    )
    # sequential reference on exact cents, n-scaled like the operator
    cents = [round(v * 100) for v in series]
    n, sv = len(cents), sum(cents)
    s, exp = 0, []
    for i, c in enumerate(cents):
        s = max(0, s + (c * n - sv - round(allowance * 100) * n))
        if s > round(threshold * 100) * n:
            exp.append((i, s / n / 100.0))
    assert [i for i, _ in out] == [i for i, _ in exp]
    for (_, got_c), (_, exp_c) in zip(out, exp):
        assert abs(got_c - exp_c) < 1e-9
    # the shift region must actually be flagged
    assert any(i >= 60 for i, _ in out)
