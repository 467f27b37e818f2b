"""Streaming query serving: readStream → ann_search front door → sink.

The online READ half of the reference's serving loop (coroutine.rs
query ops), as foreachBatch over a restartable ServingIndex bundle.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.sources.graph_io import load_serving_index, save_serving_index
from hawk_pack_spark.streaming.serve import serve_query_batch, start_query_stream

QUERY_SCHEMA = "query_id long, query_vec array<double>"


def _emb(col, dim=16):
    return F.transform(
        F.sequence(F.lit(1), F.lit(dim)), lambda i: F.sin(col * i * 0.77 + i)
    )


def _bundle(spark, tmp_path, n=500, shards=5):
    params = HawkParams.new(32, 16, 8)
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"), _emb(F.col("id")).alias("embedding")
    )
    index = hnsw.build_index(
        vecs, metric="l2_sq", params=params, num_shards=shards
    ).localCheckpoint()
    path = str(tmp_path / "bundle")
    save_serving_index(index, path, params=params)
    return load_serving_index(spark, path)


def _queries(spark, ids):
    return spark.createDataFrame(
        [(i,) for i in ids], "query_id long"
    ).select("query_id", _emb(F.col("query_id")).alias("query_vec"))


def test_query_stream_answers_batches_and_checkpoints(spark, tmp_path):
    """Two query files → two epochs in the sink; each epoch's rows equal
    a direct ann_search of that batch; self-queries hit at dist 0; a
    restarted stream on the same checkpoint reprocesses NOTHING until a
    new file arrives, then appends only the new epoch."""
    bundle = _bundle(spark, tmp_path)
    src = tmp_path / "qsrc"
    sink = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")

    b1_ids = list(range(0, 200, 23))
    b2_ids = list(range(200, 480, 31))
    _queries(spark, b1_ids).coalesce(1).write.parquet(f"{src}/b1")
    _queries(spark, b2_ids).coalesce(1).write.parquet(f"{src}/b2")

    decisions: list = []
    q = start_query_stream(
        spark, f"{src}/*", QUERY_SCHEMA, bundle, sink, ckpt,
        k=3, nprobe_shards=2, decision_log=decisions,
    )
    q.awaitTermination(300)

    got = spark.read.parquet(sink)
    epochs = sorted(r.epoch for r in got.select("epoch").distinct().collect())
    assert len(epochs) == 2
    assert got.count() == 3 * (len(b1_ids) + len(b2_ids))
    assert decisions and all("path" in d for d in decisions)

    # per-epoch rows ≡ direct front-door call on the same batch
    by_epoch = {
        e: sorted(
            (r.query_id, r.rank, r.vec_id, round(r.dist, 9))
            for r in got.where(F.col("epoch") == e).collect()
        )
        for e in epochs
    }
    direct = {}
    for e, ids in zip(epochs, (b1_ids, b2_ids)):
        direct[e] = sorted(
            (r.query_id, r.rank, r.vec_id, round(r.dist, 9))
            for r in hnsw.ann_search(
                bundle, _queries(spark, ids), k=3, nprobe_shards=2
            ).collect()
        )
    assert by_epoch == direct

    # queries are corpus members: rank-1 self at distance 0
    self_hits = got.where(
        (F.col("rank") == 1)
        & (F.col("query_id") == F.col("vec_id"))
        & (F.col("dist") == 0)
    ).count()
    assert self_hits == len(b1_ids) + len(b2_ids)

    # restart on the same checkpoint: nothing new → no new rows
    q2 = start_query_stream(
        spark, f"{src}/*", QUERY_SCHEMA, bundle, sink, ckpt,
        k=3, nprobe_shards=2,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(sink).count() == got.count()

    # a third file arrives → exactly one more epoch appended
    b3_ids = [7, 133, 304]
    _queries(spark, b3_ids).coalesce(1).write.parquet(f"{src}/b3")
    q3 = start_query_stream(
        spark, f"{src}/*", QUERY_SCHEMA, bundle, sink, ckpt,
        k=3, nprobe_shards=2,
    )
    q3.awaitTermination(300)
    after = spark.read.parquet(sink)
    assert after.count() == got.count() + 3 * len(b3_ids)
    assert after.select("epoch").distinct().count() == 3


def test_serve_query_batch_direct_and_empty(spark, tmp_path):
    """The foreachBatch body is callable directly (backfill shape):
    returns the result frame, honors the sink, and no-ops on empty."""
    bundle = _bundle(spark, tmp_path, n=300, shards=3)
    sink = str(tmp_path / "direct_results")
    out = serve_query_batch(
        bundle, _queries(spark, [5, 50, 123]), k=2, epoch_id=9,
        output_dir=sink, nprobe_shards=2,
    )
    assert out is not None and out.count() == 6
    sunk = spark.read.parquet(sink)
    assert sunk.count() == 6
    assert set(r.epoch for r in sunk.select("epoch").collect()) == {9}

    empty = _queries(spark, [5]).where(F.col("query_id") < 0)
    assert serve_query_batch(bundle, empty, k=2, output_dir=sink) is None
    assert spark.read.parquet(sink).count() == 6
