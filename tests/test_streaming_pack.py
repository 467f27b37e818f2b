"""Streaming sequence packing: open-bin state must survive micro-batch
boundaries and reproduce the batch operator on a single-batch stream."""

from __future__ import annotations

from hawk_pack_spark.operators.packing import pack_reference
from hawk_pack_spark.streaming.stateful import streaming_pack


def _write_batch(spark, rows, path):
    spark.createDataFrame(
        rows, "stream string, doc_id long, n_tokens long"
    ).coalesce(1).write.parquet(path)


def _run(spark, tmp_path, name):
    stream = (
        spark.readStream.schema("stream string, doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src/*"))
    )
    q = (
        streaming_pack(stream, budget=100)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_streaming_pack_resumes_open_bin(spark, tmp_path):
    # batch 1 leaves bin 2 open at fill 60; batch 2's first doc (30)
    # must JOIN bin 2, not fragment into a new bin
    _write_batch(spark, [("s", 1, 80), ("s", 2, 60)], str(tmp_path / "src/b1"))
    _write_batch(spark, [("s", 3, 30), ("s", 4, 90)], str(tmp_path / "src/b2"))
    rows = _run(spark, tmp_path, "pack_out")
    got = {r.doc_id: r.bin_id for r in rows}
    assert got == {1: 1, 2: 2, 3: 2, 4: 3}


def test_streaming_pack_single_batch_matches_batch_operator(spark, tmp_path):
    rows = [("a", i, 10 + (i * 37) % 80) for i in range(40)]
    _write_batch(spark, rows, str(tmp_path / "src/b1"))
    out = _run(spark, tmp_path, "pack_one")
    items = sorted((r.doc_id, r.n_tokens, r.bin_id) for r in out)
    want = pack_reference([(d, t) for d, t, _ in items], budget=100)
    assert [b for _, _, b in items] == want
