"""Unit semantics for operators/analytics.py — the parity rows prove
engine equivalence; these pin the OPERATOR contracts on hand-built
fixtures where the right answer is known by construction."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from hawk_pack_spark.operators.analytics import (
    agg_state,
    cohort_retention,
    finalize_agg,
    funnel,
    gapfill_daily,
    merge_agg_states,
    weighted_sample,
    zscore_outliers,
)

_T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, _T0 + dt.timedelta(hours=h), u, t, v)
            for i, (u, t, h, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_requires_stage_order(spark):
    # u1 converts fully; u2 clicks BEFORE viewing → stops at view;
    # u3 only signs up. Same-timestamp follow-up counts (weakly after).
    ev = _ev(
        spark,
        [
            (1, "signup", 0, 0.0), (1, "view", 1, 0.0), (1, "click", 1, 0.0),
            (2, "click", 0, 0.0), (2, "signup", 1, 0.0), (2, "view", 2, 0.0),
            (3, "signup", 0, 0.0),
        ],
    )
    got = {
        r["stage"]: r["n_users"]
        for r in funnel(ev, ["signup", "view", "click"]).collect()
    }
    assert got == {"signup": 3, "view": 2, "click": 1}


def test_cohort_retention_offsets(spark):
    # u1 active weeks 0 and 2 (twice — distinct-counted once),
    # u2 first appears week 1, returns week 2.
    ev = _ev(
        spark,
        [
            (1, "view", 0, 0.0), (1, "view", 14 * 24, 0.0),
            (1, "click", 14 * 24 + 1, 0.0),
            (2, "view", 7 * 24, 0.0), (2, "view", 14 * 24, 0.0),
        ],
    )
    rows = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    base = min(c for c, _ in rows)
    norm = {(c - base, o): n for (c, o), n in rows.items()}
    assert norm == {(0, 0): 1, (0, 2): 1, (1, 0): 1, (1, 1): 1}


def test_gapfill_fills_missing_days_with_neutral(spark):
    ev = _ev(
        spark,
        [(1, "view", 0, 2.5), (1, "view", 48, 1.0), (2, "view", 24, 3.0)],
    )
    out = gapfill_daily(
        ev,
        ["user_id"],
        "ts",
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")],
        {"n": 0, "s": 0.0},
    ).collect()
    assert len(out) == 6  # 2 users x 3-day global span
    m = {(r["user_id"], r["day"].day): (r["n"], r["s"]) for r in out}
    assert m[(1, 2)] == (0, 0.0)  # u1's gap day zero-filled
    assert m[(2, 1)] == (0, 0.0) and m[(2, 3)] == (0, 0.0)
    assert m[(1, 1)] == (1, 2.5) and m[(2, 2)] == (1, 3.0)


def test_incremental_state_merge_equals_full_recompute(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 101).cast("double").alias("v"),
    )
    parts = [
        df.where(F.col("id") % 3 == i)
        for i in range(3)
    ]
    merged = finalize_agg(
        merge_agg_states([agg_state(p, ["k"], "v") for p in parts], ["k"]),
        ["k"],
    )
    direct = finalize_agg(agg_state(df, ["k"], "v"), ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_weighted_sample_deterministic_and_weight_biased(spark):
    df = spark.range(1, 2001).select(
        F.col("id"),
        F.when(F.col("id") <= 100, 1000.0).otherwise(1.0).alias("w"),
    )
    s1 = {r["id"] for r in weighted_sample(df, 50, "id", "w").collect()}
    s2 = {r["id"] for r in weighted_sample(df, 50, "id", "w").collect()}
    assert s1 == s2 and len(s1) == 50  # reproducible, exact size
    # the 100 heavy rows (1000x weight) must dominate the sample
    assert sum(1 for i in s1 if i <= 100) >= 40


def test_weighted_sample_matches_local_reference(spark):
    rows = [(i, float(i % 13 + 1)) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "id long, w double")
    mult, mod, premod = 2654435761, 4294967291, 2147483647
    keyed = sorted(
        rows,
        key=lambda r: (
            -math.log((((r[0] % premod) * mult) % mod + 1) / (mod + 1)) / r[1],
            r[0],
        ),
    )
    expect = {r[0] for r in keyed[:25]}
    got = {r["id"] for r in weighted_sample(df, 25, "id", "w").collect()}
    assert got == expect


def test_zscore_outliers_flags_planted_spike(spark):
    rows = [(i, "a", 10.0 + (i % 5) * 0.01) for i in range(200)]
    rows += [(900, "a", 500.0)]  # the planted spike
    rows += [(i + 1000, "b", 400.0 + (i % 3) * 0.5) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = zscore_outliers(df, ["event_type"], "value", z=3.0).collect()
    assert {r["event_id"] for r in out} == {900}


def test_scd2_collapses_and_bounds(spark):
    rows = [
        # u1: a a b a  -> intervals a[0,2) b[2,3) a[3,None)
        (0, 1, "a", 0), (1, 1, "a", 1), (2, 1, "b", 2), (3, 1, "a", 3),
        # u2: single state, two events -> one open interval
        (4, 2, "x", 5), (5, 2, "x", 9),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, st string, sec long")
    from hawk_pack_spark.operators.analytics import scd2

    out = scd2(df, ["user_id"], ["sec", "event_id"], ["st"], valid_from_col="sec")
    got = {
        (r["user_id"], r["st"], r["valid_from"]): r["valid_to"]
        for r in out.collect()
    }
    assert got == {
        (1, "a", 0): 2, (1, "b", 2): 3, (1, "a", 3): None,
        (2, "x", 5): None,
    }


def test_streaming_agg_maintenance_equals_direct(spark, tmp_path):
    import pyspark.sql.functions as F

    from hawk_pack_spark.operators.analytics import agg_state, finalize_agg
    from hawk_pack_spark.streaming.maintenance import StreamingAggMaintenance

    df = spark.range(999).select(
        (F.col("id") % 5).alias("k"), (F.col("id") % 83).cast("double").alias("v")
    )
    for i in range(3):
        df.where(F.col("id") % 3 == i).coalesce(1).write.parquet(
            str(tmp_path / "src" / f"b{i}")
        )
    m = StreamingAggMaintenance(spark, ["k"], "v")
    schema = spark.read.parquet(str(tmp_path / "src" / "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src" / "*"))
    )
    q = (
        m.attach(stream)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert m.n_batches >= 3
    got = sorted(map(tuple, m.view().collect()))
    want = sorted(map(tuple, finalize_agg(agg_state(df, ["k"], "v"), ["k"]).collect()))
    assert got == want


def test_funnel_single_scan_plan(spark):
    ev = _ev(spark, [(1, "signup", 0, 0.0), (1, "view", 1, 0.0)])
    plan = (
        funnel(ev, ["signup", "view", "click"])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the chained-min fold reads the source exactly once (the join-chain
    # alternative scanned it k(k+1)/2 times)
    assert plan.count("LogicalRDD") == 1


def test_zscore_outliers_all_null_group_is_quietly_empty(spark):
    """The overflow guard (ADVICE r7) fails loudly on NULL sums over
    non-null values; a group whose values are ALL NULL is not overflow
    and must pass through silently with zero outliers."""
    from hawk_pack_spark.operators.analytics import zscore_outliers

    df = spark.createDataFrame(
        [("g", None), ("g", None), ("h", 1.0), ("h", 1.2), ("h", 99.0)],
        "k string, v double",
    )
    got = zscore_outliers(df, ["k"], "v", z=1.0)
    assert {r.k for r in got.collect()} <= {"h"}
