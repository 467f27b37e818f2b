"""Watermarked event-time windows + stateful sessionization.

Late-data semantics pinned deterministically: one parquet file per
micro-batch (maxFilesPerTrigger=1, availableNow), so the watermark at
batch N is derived from data through batch N-1 — a planted row older
than the watermark MUST be dropped, and append-mode windows emit
exactly once, after the watermark passes their end."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hawk_pack_spark.streaming.windows import (
    sessionize_stream,
    windowed_event_counts,
)

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(minute, second=0, hour=12, day=1):
    return dt.datetime(2024, 1, day, hour, minute, second)


def _write(spark, rows, path):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(path)


def _run_stream(spark, tmp_path, build, name):
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


def test_windowed_counts_drop_late_and_emit_once(spark, tmp_path):
    # batch 1: two 10-min windows' worth of events; max ts 12:25
    b1 = [
        (1, _t(1), 7, "click", 1.25),
        (2, _t(4), 7, "click", 0.5),
        (3, _t(7), 8, "view", 2.0),
        (4, _t(25), 8, "click", 1.0),
    ]
    # batch 2 runs with eviction watermark 12:25-5min = 12:20 (window
    # [12:00,12:10) is finalized + emitted here), but Spark's LATE
    # filter uses the PREVIOUS batch's watermark (watermarkForLateEvents
    # — two-watermark semantics since 3.4), still epoch 0 in batch 1.
    # So the 12:26 row rides batch 1 and the truly-late 12:02 row is
    # planted one batch LATER, where the late watermark is 12:20 and
    # the engine must drop it.
    b2 = [(6, _t(26), 8, "click", 3.5)]
    b3 = [(5, _t(2), 7, "click", 99.0)]  # late — must not count
    # two sentinel batches: the first advances the watermark past every
    # real window, the second gives the engine a batch in which to emit
    # the remaining finalized windows.
    s1 = [(7, _t(0, hour=18), 99, "__sentinel__", 0.0)]
    s2 = [(8, _t(0, hour=23), 99, "__sentinel__", 0.0)]
    for i, rows in enumerate([b1, b2, b3, s1, s2]):
        _write(spark, rows, str(tmp_path / f"src/b{i}"))

    out = _run_stream(
        spark,
        tmp_path,
        lambda s: windowed_event_counts(
            s, window="10 minutes", watermark="5 minutes"
        ),
        "win_out",
    )
    rows = {
        (r.win_start % 86400 // 60, r.event_type): (
            r.n_events,
            r.sum_value_micro,
        )
        for r in out.collect()
        if r.event_type != "__sentinel__"
    }
    # minutes-of-day window starts: 720=12:00, 740=12:20
    assert rows == {
        (720, "click"): (2, 1_750_000),     # late event 5 NOT counted
        (720, "view"): (1, 2_000_000),
        (740, "click"): (2, 4_500_000),     # events 4 + 6 merged
    }


def test_windowed_counts_append_mode_rows_are_final(spark, tmp_path):
    # the same window key never appears twice in the append output
    b1 = [(1, _t(1), 7, "click", 1.0), (2, _t(40), 7, "click", 1.0)]
    s1 = [(3, _t(0, hour=18), 99, "__sentinel__", 0.0)]
    s2 = [(4, _t(0, hour=23), 99, "__sentinel__", 0.0)]
    for i, rows in enumerate([b1, s1, s2]):
        _write(spark, rows, str(tmp_path / f"src/b{i}"))
    out = _run_stream(
        spark,
        tmp_path,
        lambda s: windowed_event_counts(
            s, window="10 minutes", watermark="5 minutes"
        ),
        "win_final",
    )
    keys = [
        (r.win_start, r.event_type)
        for r in out.collect()
        if r.event_type != "__sentinel__"
    ]
    assert len(keys) == len(set(keys)) == 2


def test_sessionize_stream_matches_batch_sessionization(spark, tmp_path):
    # user 7: events at 12:00/12:10 (one session), then 13:30 (gap>30min
    # -> new session) arriving in a LATER batch: the open-session state
    # must close via the in-batch gap proof. user 8: single event whose
    # session closes only via the event-time TIMEOUT (sentinel batches).
    b1 = [
        (1, _t(0), 7, "click", 0.0),
        (2, _t(10), 7, "click", 0.0),
        (3, _t(5), 8, "view", 0.0),
    ]
    b2 = [
        (4, _t(30, hour=13), 7, "click", 0.0),
        (5, _t(31, hour=13), 7, "click", 0.0),
    ]
    s1 = [(6, _t(0, hour=20), -1, "__sentinel__", 0.0)]
    s2 = [(7, _t(0, hour=23), -1, "__sentinel__", 0.0)]
    for i, rows in enumerate([b1, b2, s1, s2]):
        _write(spark, rows, str(tmp_path / f"src/b{i}"))

    out = _run_stream(
        spark,
        tmp_path,
        lambda s: sessionize_stream(s, gap_seconds=1800),
        "sess_out",
    )
    got = sorted(
        (r.user_id, r.sess_start % 86400 // 60, r.sess_end % 86400 // 60,
         r.n_events)
        for r in out.collect()
        if r.user_id >= 0
    )
    assert got == [
        (7, 720, 730, 2),          # 12:00-12:10
        (7, 810, 811, 2),          # 13:30-13:31 closed by timeout
        (8, 725, 725, 1),          # closed by timeout
    ]


def test_sessionize_single_pass_equals_batch_operator(spark, tmp_path):
    # a spread of synthetic per-user event times; stream result must
    # equal the batch lag/cumsum sessionization of the same rows
    rows = []
    eid = 0
    for u in range(5):
        base = dt.datetime(2024, 1, 1, 8 + u)
        offs = [0, 5, 12, 50, 55, 120, 124, 126]
        for m in offs:
            rows.append((eid, base + dt.timedelta(minutes=m), u, "e", 0.0))
            eid += 1
    s1 = [(eid, dt.datetime(2024, 1, 2), -1, "__sentinel__", 0.0)]
    s2 = [(eid + 1, dt.datetime(2024, 1, 3), -1, "__sentinel__", 0.0)]
    for i, batch in enumerate([rows, s1, s2]):
        _write(spark, batch, str(tmp_path / f"src/b{i}"))

    out = _run_stream(
        spark,
        tmp_path,
        lambda s: sessionize_stream(s, gap_seconds=1800),
        "sess_eq",
    )
    got = sorted(
        (r.user_id, r.sess_start, r.sess_end, r.n_events)
        for r in out.collect()
        if r.user_id >= 0
    )

    ev = spark.createDataFrame(rows, _SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    batch = (
        ev.withColumn("sec", sec)
        .withColumn(
            "new_sess",
            (F.col("sec") - F.lag("sec").over(w) > 1800).cast("int"),
        )
        .withColumn(
            "sess_id",
            F.sum(F.coalesce("new_sess", F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("sec").alias("sess_start"),
            F.max("sec").alias("sess_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = sorted(
        (r.user_id, r.sess_start, r.sess_end, r.n_events)
        for r in batch.collect()
    )
    assert got == want


def test_sliding_windows_overlap_under_watermark(spark, tmp_path):
    # slide 5m / window 15m: each event lands in exactly 3 windows, all
    # finalized once the sentinel pushes the watermark past their ends
    b1 = [(1, _t(17), 7, "click", 1.0), (2, _t(21), 8, "click", 1.0)]
    s1 = [(3, _t(0, hour=18), 99, "__sentinel__", 0.0)]
    s2 = [(4, _t(0, hour=23), 99, "__sentinel__", 0.0)]
    for i, rows in enumerate([b1, s1, s2]):
        _write(spark, rows, str(tmp_path / f"src/b{i}"))
    out = _run_stream(
        spark,
        tmp_path,
        lambda s: windowed_event_counts(
            s, window="15 minutes", slide="5 minutes", watermark="5 minutes"
        ),
        "win_slide",
    )
    rows = [
        (r.win_start % 86400 // 60, r.n_events)
        for r in out.collect()
        if r.event_type != "__sentinel__"
    ]
    # event 1 (12:17) -> windows starting 725, 730, 735; event 2 (12:21)
    # -> 730, 735, 740; the 730/735 windows hold both
    got = dict(rows)
    assert len(rows) == len(got) == 4  # exactly-once per window
    assert got == {725: 1, 730: 2, 735: 2, 740: 1}


def test_sessionize_admitted_late_event_does_not_regress_session_end(
    spark, tmp_path
):
    """ADVICE r6 (medium): with watermark > 0, a cross-batch late event
    (t < the open session's end) must MERGE into the session, not move
    its end backwards — the old `end_ms = t` regression made the next
    event split off a spurious session."""
    b1 = [
        (1, _t(0), 7, "click", 0.0),
        (2, _t(20), 7, "click", 0.0),
    ]
    # 12:10 is admitted-late (watermark after b1 = 12:20 - 30min);
    # 12:45 is 25min after the TRUE end (12:20) -> same session, but
    # 35min after the late event -> the buggy code split here
    b2 = [
        (3, _t(10), 7, "click", 0.0),
        (4, _t(45), 7, "click", 0.0),
    ]
    s1 = [(5, _t(0, hour=20), -1, "__sentinel__", 0.0)]
    s2 = [(6, _t(0, hour=23), -1, "__sentinel__", 0.0)]
    for i, rows in enumerate([b1, b2, s1, s2]):
        _write(spark, rows, str(tmp_path / f"src/b{i}"))

    out = _run_stream(
        spark,
        tmp_path,
        lambda s: sessionize_stream(
            s, gap_seconds=1800, watermark="30 minutes"
        ),
        "sess_late_out",
    )
    got = sorted(
        (r.user_id, r.sess_start % 86400 // 60, r.sess_end % 86400 // 60,
         r.n_events)
        for r in out.collect()
        if r.user_id >= 0
    )
    assert got == [(7, 720, 765, 4)]  # ONE session 12:00-12:45, 4 events
