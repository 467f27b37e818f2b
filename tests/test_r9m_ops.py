"""Round-9 batch 12: rolling z-score, component census — closed-form
checks."""

from __future__ import annotations

import datetime

import numpy as np


def test_rolling_zscore_flags_spike_not_level_shift(spark):
    from hawk_pack_spark.operators.analytics import rolling_zscore

    base = datetime.datetime(2024, 1, 1)
    vals = [100 + (i % 3) for i in range(30)]  # stable around 100
    vals[25] = 500  # spike
    rows = [
        ("a", base + datetime.timedelta(minutes=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long, x long")
    out = {r.event_ref: r for r in rolling_zscore(df, ["g"], "ts", "id", "x").collect()}
    assert out[25].outlier == 1
    normal = [r for i, r in out.items() if i != 25 and i < 25]
    assert all(r.outlier == 0 for r in normal)
    # rows before min_window=10 observations are withheld
    assert 0 not in out and 8 not in out
    assert 9 in out  # the 10th row has a full min window


def test_rolling_zscore_matches_numpy(spark):
    from hawk_pack_spark.operators.analytics import rolling_zscore

    base = datetime.datetime(2024, 1, 1)
    rng = np.random.default_rng(5)
    vals = [int(x) for x in rng.integers(50, 150, size=25)]
    rows = [
        ("a", base + datetime.timedelta(minutes=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long, x long")
    out = {
        r.event_ref: r.z
        for r in rolling_zscore(
            df, ["g"], "ts", "id", "x", window_rows=10, min_window=5
        ).collect()
    }
    for i in (10, 20):
        w = np.array(vals[max(0, i - 9) : i + 1], dtype=float)
        want = (w[-1] - w.mean()) / w.std()  # population std
        assert abs(out[i] - round(want, 6)) < 1e-6


def test_component_sizes_census(spark):
    from hawk_pack_spark.operators.graph import component_sizes

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    out = {r.component: r.n_nodes for r in component_sizes(pairs, "id_a", "id_b").collect()}
    assert out == {1: 3, 10: 2, 20: 3}
