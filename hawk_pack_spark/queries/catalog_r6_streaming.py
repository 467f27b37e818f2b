"""round-6 event-time streaming rows

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



# ---------------------------------------------------------------------------
# round-6 tail: event-time streaming surface (streaming/windows.py) as
# DATA-LEVEL driver rows — the stream result is compared row-for-row
# against the batch SQL answer, not summarized into invariants.


def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve math, data-level (operators/layout.py
    `zorder_value` — the interleave behind `zorder_layout`'s
    multi-dimensional file clustering): the 20-bit z-value of
    (o_custkey mod 1024, epoch-day(o_orderdate) mod 1024) for every
    order, reproduced bit-for-bit by the oracle's unrolled shift/mask
    arithmetic. The pruning claim itself (a 2-D box filter touches
    fewer files under z-layout than a linear sort) is measured in
    tests/test_layout.py."""
    from hawk_pack_spark.operators.layout import zorder_value

    orders = load_table(spark, "orders", sf_dir)
    a = F.pmod(F.col("o_custkey"), F.lit(1024)).cast("long")
    b = F.pmod(
        F.floor(F.unix_timestamp("o_orderdate") / 86400), F.lit(1024)
    ).cast("long")
    return orders.select(
        "o_orderkey",
        a.alias("dim_cust"),
        b.alias("dim_day"),
        zorder_value([a, b], bits=10).alias("zval"),
    )


def _zorder_sql(bits: int = 10) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"(((dim_cust >> {j}) & 1) << {2 * j})")
        terms.append(f"(((dim_day >> {j}) & 1) << {2 * j + 1})")
    z = " | ".join(terms)
    return f"""
WITH dims AS (
  SELECT o_orderkey,
         CAST(o_custkey % 1024 AS BIGINT) AS dim_cust,
         CAST(CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT) % 1024
              AS BIGINT) AS dim_day
  FROM orders)
SELECT o_orderkey, dim_cust, dim_day, CAST({z} AS BIGINT) AS zval FROM dims
"""


ZORDER_SQL = _zorder_sql()


def _run_stream_to_memory(spark, tmp: str, build, name: str) -> DataFrame:
    """Shared availableNow → memory-sink harness for the streaming
    catalog rows. Asserts the query actually FINISHED before the caller
    reads the sink (and before the caller's finally removes {tmp}) — a
    timeout would otherwise silently return partial windows/sessions
    while executors still read the source."""
    schema = spark.read.parquet(f"{tmp}/src/b0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*")
    )
    q = (
        build(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(f"streaming catalog query {name} exceeded 600s")
    return spark.sql(f"SELECT * FROM {name}")


@low_stream_shuffle
def q_streaming_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming/windows.py
    `windowed_event_counts`) ≡ the batch GROUP BY, row-for-row. The
    events table streams as three micro-batches split on event time (so
    the watermark advances monotonically and no real row is ever late),
    plus a far-future sentinel batch that pushes the watermark past every
    real window; append mode then emits each window exactly once. The
    1-hour/30-minute watermark pipeline is the one a 100 TB event
    pipeline runs; late-drop semantics are pinned separately in
    tests/test_streaming_windows.py."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.windows import windowed_event_counts

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    split = "2024-01-16 00:00:00"
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_win_")
    try:
        ev.where(F.col("ts") < F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b0")
        ev.where(F.col("ts") >= F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b1")
        sentinel = ev.limit(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.lit(max_ts) + F.expr("INTERVAL 2 HOURS")).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
        )
        sentinel.coalesce(1).write.parquet(f"{tmp}/src/b2")
        out = _run_stream_to_memory(
            spark,
            tmp,
            lambda st: windowed_event_counts(
                st, window="1 hour", watermark="30 minutes"
            ),
            "hps_stream_win_q",
        )
        return out.where(F.col("event_type") != "__sentinel__")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_WINDOWS_SQL = """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS win_start,
       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 + 3600 AS win_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro
FROM events
GROUP BY 1, 2, 3
"""


@low_stream_shuffle
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization (streaming/windows.py
    `sessionize_stream`: applyInPandasWithState + EventTimeTimeout) ≡
    the batch lag/cumsum sessionization, row-for-row. Events stream as
    two event-time halves (cross-batch open-session state carried
    between them) plus two sentinel batches whose watermark advance
    fires the event-time timeout that closes every remaining open
    session. Gap = 6 hours."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.windows import sessionize_stream

    gap = 21600
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    split = "2024-01-16 00:00:00"
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_sess_")
    try:
        ev.where(F.col("ts") < F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b0")
        ev.where(F.col("ts") >= F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b1")
        for i, hours in enumerate([gap // 3600 + 1, 2 * (gap // 3600) + 2]):
            ev.limit(1).select(
                F.lit(-1 - i).cast("long").alias("event_id"),
                (F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS")).alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("__sentinel__").alias("event_type"),
                F.lit(0.0).alias("value"),
            ).coalesce(1).write.parquet(f"{tmp}/src/s{i}")
        out = _run_stream_to_memory(
            spark,
            tmp,
            lambda st: sessionize_stream(st, gap_seconds=gap),
            "hps_stream_sess_q",
        )
        return out.where(F.col("user_id") >= 0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 21600
         THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, sec,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
)
SELECT user_id, MIN(sec) AS sess_start, MAX(sec) AS sess_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sess_id
"""


@low_stream_shuffle
def q_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/joins.py
    `attribution_join_stream`: watermarked two-sided-bounded inner join
    chained into a windowed per-purchase aggregation) ≡ the batch
    range-join aggregation, row-for-row. The events table streams as two
    event-time halves; sentinel batches carry BOTH a point and a
    purchase row (the global watermark is the min across the two
    watermarked sides) under non-joining users, pushing every
    aggregation window closed."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.joins import attribution_join_stream

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    split = "2024-01-16 00:00:00"
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_attr_")
    try:
        ev.where(F.col("ts") < F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b0")
        ev.where(F.col("ts") >= F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b1")
        for i, hours in enumerate([2, 4]):
            base = ev.limit(1)
            pt = base.select(
                F.lit(-1 - 2 * i).cast("long").alias("event_id"),
                (F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS")).alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("click").alias("event_type"),
                F.lit(0.0).alias("value"),
            )
            pu = base.select(
                F.lit(-2 - 2 * i).cast("long").alias("event_id"),
                (F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS")).alias("ts"),
                F.lit(-2).cast("long").alias("user_id"),
                F.lit("purchase").alias("event_type"),
                F.lit(0.0).alias("value"),
            )
            pt.unionByName(pu).coalesce(1).write.parquet(f"{tmp}/src/s{i}")
        out = _run_stream_to_memory(
            spark,
            tmp,
            lambda st: attribution_join_stream(st, window_s=900),
            "hps_stream_attr_q",
        )
        return out.where(F.col("purchase_id") >= 0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_ATTRIBUTION_SQL = """
WITH pts AS (
  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
         CAST(ROUND(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE event_type IN ('click', 'view')
), pur AS (
  SELECT event_id AS purchase_id, user_id AS p_user,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS p_sec
  FROM events WHERE event_type = 'purchase'
)
SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_follow,
       CAST(SUM(vm) AS BIGINT) AS sum_value_micro
FROM pts JOIN pur ON pts.user_id = pur.p_user
  AND pts.sec >= pur.p_sec AND pts.sec < pur.p_sec + 900
GROUP BY purchase_id
"""


@low_stream_shuffle
def q_streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming exact dedup (streaming/joins.py
    `dedup_exact_stream` = dropDuplicatesWithinWatermark): the events
    table streams twice — a full batch, then a full REPLAY batch — and
    the replay is dropped key-for-key because every event_id is still
    inside the watermark horizon (sized to cover the replay window, the
    documented contract). Output ≡ SELECT DISTINCT of the table."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.joins import dedup_exact_stream

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_dedup_")
    try:
        ev.coalesce(1).write.parquet(f"{tmp}/src/b0")
        ev.coalesce(1).write.parquet(f"{tmp}/src/b1")  # full replay
        return _run_stream_to_memory(
            spark,
            tmp,
            lambda st: dedup_exact_stream(
                st, ("event_id",), watermark="40 days"
            ).select("event_id", "user_id", "event_type"),
            "hps_stream_dedup_q",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_DEDUP_SQL = """
SELECT event_id, user_id, event_type FROM events
"""
