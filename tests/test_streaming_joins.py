"""Stream-stream interval join + watermarked streaming exact dedup.

The attribution join is proven equal to the batch range-join semantics
(same rows, same micro sums) on a single-pass stream; the chained
stateful pipeline (join -> windowed agg) emits each purchase exactly
once. Dedup: a replayed batch is dropped while keys are inside the
watermark horizon."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hawk_pack_spark.streaming.joins import (
    attribution_join_stream,
    dedup_exact_stream,
)

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(minute, second=0, hour=12):
    return dt.datetime(2024, 1, 1, hour, minute, second)


def _write(spark, rows, path):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(path)


def _run(spark, tmp_path, build, name):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src/*"))
    )
    q = (
        build(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_attribution_join_matches_batch_semantics(spark, tmp_path):
    # user 7: purchase at 12:10; clicks at 12:10:30, 12:20 (in window),
    # 12:26 (outside 900s). user 8: purchase at 12:00 with no follow-ups
    # (must NOT emit); a view at 11:59 precedes it (not attributed).
    # boundary: user 9 purchase at 12:00:00.700 (floors to 12:00:00),
    # click at 12:00:00.200 (floors to the same second -> attributed,
    # the floored-second contract).
    b1 = [
        (100, _t(10), 7, "purchase", 0.0),
        (1, _t(10, 30), 7, "click", 1.25),
        (2, _t(20), 7, "click", 0.5),
        (3, _t(26), 7, "click", 99.0),
        (101, _t(0), 8, "purchase", 0.0),
        (4, _t(59, hour=11), 8, "view", 2.0),
        (102, dt.datetime(2024, 1, 1, 12, 0, 0, 700000), 9, "purchase", 0.0),
        (5, dt.datetime(2024, 1, 1, 12, 0, 0, 200000), 9, "view", 3.25),
    ]
    # sentinels must advance BOTH sides' watermarks (the global
    # watermark is the min across them); distinct users so they never join
    s1 = [(900, _t(0, hour=18), -1, "click", 0.0),
          (902, _t(0, hour=18), -2, "purchase", 0.0)]
    s2 = [(901, _t(0, hour=23), -1, "click", 0.0),
          (903, _t(0, hour=23), -2, "purchase", 0.0)]
    for i, rows in enumerate([b1, s1, s2]):
        _write(spark, rows, str(tmp_path / f"src/b{i}"))

    out = _run(
        spark,
        tmp_path,
        lambda s: attribution_join_stream(s, window_s=900),
        "attr_out",
    )
    got = {
        r.purchase_id: (r.n_follow, r.sum_value_micro) for r in out.collect()
    }
    assert got == {
        100: (2, 1_750_000),   # clicks 1+2; click 3 outside the window
        102: (1, 3_250_000),   # same-floored-second boundary attribution
    }


def test_attribution_join_equals_batch_range_join(spark, tmp_path):
    # randomized-ish spread: stream result must equal the batch
    # inner-range-join aggregation of the same rows
    rows, eid = [], 0
    for u in range(6):
        base = dt.datetime(2024, 1, 1, 8 + u)
        for m in (0, 3, 7, 14, 16, 31, 44):
            rows.append((eid, base + dt.timedelta(minutes=m), u, "click", 0.25 + m))
            eid += 1
        for m in (2, 15, 40):
            rows.append((1000 + eid, base + dt.timedelta(minutes=m), u, "purchase", 0.0))
            eid += 1
    s1 = [(9000, dt.datetime(2024, 1, 2), -1, "click", 0.0),
          (9002, dt.datetime(2024, 1, 2), -2, "purchase", 0.0)]
    s2 = [(9001, dt.datetime(2024, 1, 3), -1, "click", 0.0),
          (9003, dt.datetime(2024, 1, 3), -2, "purchase", 0.0)]
    for i, batch in enumerate([rows, s1, s2]):
        _write(spark, batch, str(tmp_path / f"src/b{i}"))

    out = _run(
        spark,
        tmp_path,
        lambda s: attribution_join_stream(s, window_s=900),
        "attr_eq",
    )
    got = sorted(
        (r.purchase_id, r.n_follow, r.sum_value_micro) for r in out.collect()
    )

    ev = spark.createDataFrame(rows, _SCHEMA)
    sec = F.unix_timestamp("ts")
    pts = ev.where(F.col("event_type") == "click").select(
        "user_id", sec.alias("sec"),
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        sec.alias("p_sec"),
    )
    want = sorted(
        (r.purchase_id, r.n_follow, r.sum_value_micro)
        for r in (
            pts.join(
                pur,
                (F.col("user_id") == F.col("p_user"))
                & (F.col("sec") >= F.col("p_sec"))
                & (F.col("sec") < F.col("p_sec") + 900),
            )
            .groupBy("purchase_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_follow"),
                F.sum("vm").alias("sum_value_micro"),
            )
        ).collect()
    )
    assert got == want and len(got) > 0


def test_dedup_exact_stream_drops_replayed_batch(spark, tmp_path):
    b1 = [
        (1, _t(1), 7, "click", 1.0),
        (2, _t(2), 8, "view", 2.0),
        (3, _t(3), 7, "click", 3.0),
    ]
    b2 = list(b1) + [(4, _t(4), 9, "click", 4.0)]  # full replay + 1 new
    for i, rows in enumerate([b1, b2]):
        _write(spark, rows, str(tmp_path / f"src/b{i}"))
    out = _run(
        spark,
        tmp_path,
        lambda s: dedup_exact_stream(s, ("event_id",), watermark="2 hours"),
        "dedup_out",
    )
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3, 4]
