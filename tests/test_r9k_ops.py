"""Round-9 batch 10: period growth, ABC classification — closed-form
checks."""

from __future__ import annotations


def test_period_growth_rates_and_null_first(spark):
    from hawk_pack_spark.operators.analytics import period_growth

    rows = [
        ("x", 1, 100), ("x", 1, 100),  # period 1 total 200
        ("x", 2, 300),                  # +50%
        ("x", 3, 150),                  # -50%
        ("y", 1, 10),
    ]
    df = spark.createDataFrame(rows, "k string, p long, v long")
    out = {(r.k, r.period): r for r in period_growth(df, ["k"], "p", "v").collect()}
    assert out[("x", 1)].growth is None and out[("x", 1)].prev_value is None
    assert out[("x", 2)].growth == 0.5
    assert out[("x", 3)].growth == -0.5
    assert out[("y", 1)].growth is None


def test_abc_classes_boundaries(spark):
    from hawk_pack_spark.operators.analytics import abc_classes

    # values 50, 30, 15, 5 (total 100): cum shares 50, 80, 95, 100
    rows = [(1, 50), (2, 30), (3, 15), (4, 5)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {r.key: r for r in abc_classes(df, "k", "v", 800, 950).collect()}
    assert out[1].abc_class == "A" and out[1].rank == 1
    assert out[2].abc_class == "A"   # cum 80% <= 80%
    assert out[3].abc_class == "B"   # cum 95% <= 95%
    assert out[4].abc_class == "C"
    assert out[4].cum_value == 100 and out[4].total_value == 100


def test_abc_top_entity_always_a(spark):
    from hawk_pack_spark.operators.analytics import abc_classes

    # one whale holding 99% of value: its own cum share (99%) exceeds
    # the A boundary but the top entity is A by contract
    df = spark.createDataFrame([(1, 990), (2, 10)], "k long, v long")
    out = {r.key: r.abc_class for r in abc_classes(df, "k", "v").collect()}
    assert out[1] == "A" and out[2] == "C"
