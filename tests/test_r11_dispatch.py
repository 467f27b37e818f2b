"""Cardinality dispatch for the bounded-contract global windows
(VERDICT r10 #5): abc_classes, skyline_2d, and kaplan_meier route
through two-phase range-partitioned forms when the pre-reduced frame
exceeds a threshold — automatically, not by docstring. These tests
force the two-phase path (threshold=0), pin value equality against the
single-window path, and pin the plan shape (range partitioning engaged;
the data stream never crosses a single-partition window)."""

from __future__ import annotations

import random


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _data_windows_partitioned(plan: str) -> None:
    """Every Window over the DATA stream must be partitioned by _pid;
    empty-partition-spec windows are allowed only over the
    #partitions-row totals/offsets tables (their input is a
    HashAggregate on _pid)."""
    for chunk in plan.split("Window [")[1:]:
        head = chunk[:500]
        spec = head.split("]", 2)
        # partition spec is the second bracket group: Window [exprs], [part], [order]
        assert len(spec) >= 2
        part = spec[1]
        if "_pid" not in part:
            # unpartitioned window: must be the tiny offsets cumsum —
            # its order key is _pid itself
            assert "_pid" in head, head


def test_abc_two_phase_equals_window_path(spark):
    from hawk_pack_spark.operators.analytics import abc_classes

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 50)) for i in range(300)]
    # include heavy ties and zero values
    rows += [(1000 + i, 7) for i in range(20)] + [(2000, 0)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    small = abc_classes(df, "k", "v", 800, 950)
    big = abc_classes(df, "k", "v", 800, 950, max_window_entities=0)
    a = sorted(map(tuple, small.collect()))
    b = sorted(map(tuple, big.collect()))
    assert a == b
    plan = _plan(big)
    assert "rangepartitioning" in plan, plan[:1500]
    _data_windows_partitioned(plan)
    assert "rangepartitioning" not in _plan(small)


def test_skyline_two_phase_equals_window_path(spark):
    from hawk_pack_spark.operators.analytics import skyline_2d

    rng = random.Random(11)
    rows = [(rng.randrange(0, 100), rng.randrange(0, 100)) for _ in range(500)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    small = skyline_2d(df, "x", "y")
    big = skyline_2d(df, "x", "y", max_window_pairs=0)
    a = sorted(map(tuple, small.collect()))
    b = sorted(map(tuple, big.collect()))
    assert a == b
    # brute-force frontier check on the two-phase result
    pts = set(rows)
    frontier = {
        (x, y)
        for (x, y) in pts
        if not any(
            (ox <= x and oy <= y and (ox < x or oy < y))
            for (ox, oy) in pts
        )
    }
    assert set(b) == frontier
    plan = _plan(big)
    assert "rangepartitioning" in plan, plan[:1500]
    _data_windows_partitioned(plan)


def test_skyline_two_phase_extra_cols(spark):
    from hawk_pack_spark.operators.analytics import skyline_2d

    rows = [(1, 5, "a"), (2, 3, "b"), (3, 3, "c"), (2, 3, "b2"), (4, 1, "d")]
    df = spark.createDataFrame(rows, "x long, y long, name string")
    small = skyline_2d(df, "x", "y", extra_cols=["name"])
    big = skyline_2d(df, "x", "y", extra_cols=["name"], max_window_pairs=0)
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )


def test_kaplan_meier_two_phase_equals_window_path(spark):
    from hawk_pack_spark.operators.analytics import kaplan_meier

    rng = random.Random(13)
    rows = [
        (rng.randrange(1, 40), rng.random() < 0.7) for _ in range(600)
    ]
    # a zero-survival tail: every subject at the max time has the event
    tmax = 50
    rows += [(tmax, True), (tmax, True)]
    df = spark.createDataFrame(rows, "time long, observed boolean").repartition(8)
    small = kaplan_meier(df)
    big = kaplan_meier(df, max_window_times=0)
    a = {r["time"]: r for r in small.collect()}
    b = {r["time"]: r for r in big.collect()}
    assert set(a) == set(b)
    for t in a:
        assert (a[t]["d"], a[t]["c"], a[t]["n_at_risk"]) == (
            b[t]["d"], b[t]["c"], b[t]["n_at_risk"]
        )
        assert a[t]["hazard"] == b[t]["hazard"]
        # survival: two-phase re-associates the float product across
        # partitions; round(6) output must agree within one ulp-step
        assert abs(a[t]["survival"] - b[t]["survival"]) <= 1e-6, t
    assert b[tmax]["survival"] == 0.0  # zero tail survives the product


def test_dispatch_probe_is_limit_count(spark):
    """The probe must never run a full count: _exceeds_rows(df, t)
    plans a LocalLimit t+1."""
    from hawk_pack_spark.operators.analytics import _exceeds_rows

    df = spark.range(10_000)
    assert _exceeds_rows(df, 100)
    assert not _exceeds_rows(df, 10_000)
    probe = df.limit(101)
    assert "Limit 101" in _plan(probe)  # CollectLimit/GlobalLimit 101
