"""Round-9 batch 13: classification report, chi-square, A/B z-test,
label-centroid similarity — closed-form checks."""

from __future__ import annotations

import math


def test_classification_report_hand_matrix(spark):
    from hawk_pack_spark.operators.analytics import classification_report

    # truth: a,a,a,b,b ; pred: a,a,b,b,c
    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c")]
    df = spark.createDataFrame(rows, "t string, p string")
    out = {r.label: r for r in classification_report(df, "t", "p").collect()}
    a = out["a"]
    assert a.support == 3 and a.n_predicted == 2 and a.tp == 2
    assert a.precision == 1.0 and a.recall == round(2 / 3, 6)
    b = out["b"]
    assert b.support == 2 and b.n_predicted == 2 and b.tp == 1
    assert b.precision == 0.5 and b.recall == 0.5 and b.f1 == 0.5
    # class c: predicted only, zero support -> recall 0, precision 0
    c = out["c"]
    assert c.support == 0 and c.n_predicted == 1 and c.tp == 0
    assert c.precision == 0.0 and c.recall == 0.0 and c.f1 == 0.0


def test_chi_square_independent_and_dependent(spark):
    from hawk_pack_spark.operators.analytics import chi_square_independence

    # perfectly independent 2x2 with equal cells -> chi2 = 0
    rows = [("x", 0)] * 10 + [("x", 1)] * 10 + [("y", 0)] * 10 + [("y", 1)] * 10
    df = spark.createDataFrame(rows, "a string, b long")
    (r,) = chi_square_independence(df, "a", "b").collect()
    assert r.chi2 == 0.0 and r.dof == 1 and r.n == 40
    # perfectly dependent 2x2 -> chi2 = n
    rows2 = [("x", 0)] * 10 + [("y", 1)] * 10
    df2 = spark.createDataFrame(rows2, "a string, b long")
    (r2,) = chi_square_independence(df2, "a", "b").collect()
    assert r2.chi2 == 20.0 and r2.dof == 1


def test_two_proportion_ztest_hand_value(spark):
    from hawk_pack_spark.operators.analytics import two_proportion_ztest

    rows = [(0, True)] * 30 + [(0, False)] * 70 + [(1, True)] * 50 + [(1, False)] * 50
    df = spark.createDataFrame(rows, "g long, s boolean")
    (r,) = two_proportion_ztest(df, "g", "s").collect()
    assert (r.group_a, r.group_b) == (0, 1)
    assert r.n_a == 100 and r.k_a == 30 and r.rate_a == 0.3
    p1, p2, pp = 0.3, 0.5, 0.4
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert abs(r.z - round(z, 6)) < 1e-9


def test_two_proportion_ztest_degenerate_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from hawk_pack_spark.operators.analytics import two_proportion_ztest

    df = spark.createDataFrame(
        [(0, True)] * 5 + [(1, True)] * 5, "g long, s boolean"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        two_proportion_ztest(df, "g", "s").collect()


def test_label_centroid_similarity_orthogonal_and_identical(spark):
    from hawk_pack_spark.operators.linalg import label_centroid_similarity

    # label 0 along e0, label 1 along e1 (orthogonal), label 2 == label 0
    def vec(axis, mag=2.0, dim=8):
        v = [0.0] * dim
        v[axis] = mag
        return v

    rows = (
        [(i, 0, vec(0)) for i in range(5)]
        + [(10 + i, 1, vec(1)) for i in range(5)]
        + [(20 + i, 2, vec(0)) for i in range(5)]
    )
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {
        (r.label_a, r.label_b): r.cosine
        for r in label_centroid_similarity(df).collect()
    }
    assert out[(0, 1)] == 0.0
    assert out[(0, 2)] == 1.0
    assert out[(1, 2)] == 0.0
