"""from_links bulk import, as-of join semantics, skew helpers,
streaming windowed aggregation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.asof import asof_join_backward
from hawk_pack_spark.operators.skew import salted_count_sum, salted_join

PARAMS = HawkParams.new(32, 16, 8)


def test_from_links_bulk_import(spark):
    codes = spark.range(60).select(F.col("id").alias("vec_id"), F.col("id").alias("code"))
    index = hnsw.build_index(
        codes, metric="hamming", params=PARAMS, num_shards=2, vec_col="code"
    ).localCheckpoint()
    links = hnsw.to_links(index)
    rebuilt = hnsw.from_links(links, codes, metric="hamming", vec_col="code")
    queries = spark.range(0, 60, 5).select(
        F.col("id").alias("query_id"), F.col("id").alias("query_vec")
    )
    a = hnsw.search(index, queries, k=3, metric="hamming", params=PARAMS)
    b = hnsw.search(rebuilt, queries, k=3, metric="hamming", params=PARAMS)
    assert {(r.query_id, r.vec_id, r.dist) for r in a.collect()} == {
        (r.query_id, r.vec_id, r.dist) for r in b.collect()
    }


def test_asof_join_semantics(spark):
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, 10, T(2024, 1, 1, 10)), (2, 10, T(2024, 1, 1, 12)), (3, 20, T(2024, 1, 1, 9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, T(2024, 1, 1, 9), 5.0), (10, T(2024, 1, 1, 11), 7.0), (10, T(2024, 1, 1, 12), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {r.event_id: r.asof_value for r in
           asof_join_backward(left, right, key="user_id").collect()}
    # event 1 at 10:00 → 9:00 purchase (5.0); event 2 at 12:00 → tie is
    # inclusive (9.0); event 3: user 20 has no purchases → NULL
    assert out == {1: 5.0, 2: 9.0, 3: None}


def test_salted_aggregation_exact(spark):
    # hot key: 9000 of 10000 rows share key 1
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9000, 1).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    salted = salted_count_sum(df, ["k"], "v", n_salts=8)
    naive = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sum_v"),
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in naive.collect()}


def test_salted_join_exact(spark):
    big = spark.range(5_000).select(
        F.when(F.col("id") < 4000, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val"))
    a = salted_join(big, dim, "k", n_salts=4)
    b = big.join(dim, "k")
    assert a.count() == b.count()
    assert a.agg(F.sum("dim_val")).collect()[0][0] == b.agg(F.sum("dim_val")).collect()[0][0]


def test_streaming_windowed_agg(spark, sf_dir, tmp_path):
    """Watermarked tumbling-window aggregation over a parquet stream must
    reproduce the batch computation (guide: Structured Streaming)."""
    from hawk_pack_spark.sources import load_table

    ev = load_table(spark, "events", sf_dir).select("ts", "event_type", "value")
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window"]["start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r["window"]["start"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState: per-user cumulative stats across
    micro-batches must equal the batch aggregate."""
    from hawk_pack_spark.streaming.stateful import running_user_stats

    b1 = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "user_id long, value double"
    )
    b2 = spark.createDataFrame(
        [(1, 30.0), (2, 5.0), (3, 1.0)], "user_id long, value double"
    )
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(src + "/b1")
    b2.coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_out").collect()
    # last emitted row per user carries the final cumulative state
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.sum_value)
    assert final[1] == (3, 60.0)
    assert final[2] == (2, 10.0)
    assert final[3] == (1, 1.0)


def test_stateful_seen_filter(spark, tmp_path):
    """Streaming exact dedup via per-key state: only first-seen codes
    pass; duplicates across micro-batches are dropped."""
    from hawk_pack_spark.streaming.stateful import stateful_seen_filter

    spark.createDataFrame([(1,), (2,), (3,)], "code long").coalesce(1).write.parquet(
        str(tmp_path / "src/b1")
    )
    spark.createDataFrame([(2,), (3,), (4,)], "code long").coalesce(1).write.parquet(
        str(tmp_path / "src/b2")
    )
    stream = (
        spark.readStream.schema("code long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src/*"))
    )
    q = (
        stateful_seen_filter(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("seen_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    passed = sorted(r.code for r in spark.sql("SELECT * FROM seen_out").collect())
    assert passed == [1, 2, 3, 4]  # each code exactly once, dups dropped
