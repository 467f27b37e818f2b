"""Structured-Streaming query serving — the online half of the engine.

The reference's runtime is an online loop: queries arrive, the store
answers via the coroutine op-stream (reference src/coroutine.rs:21-39,
hawk_searcher.rs search entry points). `ingest.py` renders the WRITE
half of that loop (micro-batch inserts); this module renders the READ
half: a stream of query batches answered against a restartable
`ServingIndex` bundle through the crossover-aware `ann_search` front
door, results appended to a parquet sink.

Spark shape: ``readStream`` → ``foreachBatch(ann_search)`` →
append-mode parquet. Each micro-batch is one serving batch — exactly
the bounded-collect shape `ann_search` dispatches on (serving-HNSW vs
exact scan per batch, chosen by the measured crossover). The bundle's
centroids and params ride along, so no per-batch index scans happen
(the r6 dispatch-overhead fix applies verbatim to the streaming loop).

At 100 TB the same plan holds: the bundle's index stays lazy on disk
(partition-pruned per probed shard) or pinned via
``load_serving_index(materialize=True)``; either way per-batch I/O
tracks nprobe and batch size, never corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def serve_query_batch(
    bundle,
    batch: DataFrame,
    k: int = 10,
    epoch_id: int | None = None,
    output_dir: str | None = None,
    decision_log: list | None = None,
    **ann_kwargs,
) -> DataFrame | None:
    """Answer ONE query micro-batch through the dispatch front door.

    Returns the result DataFrame (query_id, vec_id, dist, rank[, epoch])
    and, when ``output_dir`` is set, appends it to the parquet sink —
    the foreachBatch body, callable directly for tests and backfills."""
    from hawk_pack_spark.operators.hnsw import ann_search

    if batch.isEmpty():
        return None
    decision: dict = {}
    out = ann_search(bundle, batch, k=k, decision_out=decision, **ann_kwargs)
    if decision_log is not None:
        decision_log.append(decision)
    if output_dir is not None:
        sunk = out if epoch_id is None else out.withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        )
        sunk.write.mode("append").parquet(output_dir)
    return out


def start_query_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    bundle,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    trigger_once: bool = True,
    files_per_trigger: int = 1,
    decision_log: list | None = None,
    **ann_kwargs,
):
    """Stream parquet query batches from ``source_dir`` and answer each
    against ``bundle`` (a `ServingIndex` from `load_serving_index`, or a
    raw index DataFrame), appending (query_id, vec_id, dist, rank,
    epoch) to ``output_dir``.

    ``checkpoint_dir`` must live OUTSIDE any glob matched by
    ``source_dir``. ``files_per_trigger`` sets the serving-batch
    granularity (one file = one batch by default, mirroring
    `start_parquet_ingest`). Returns the StreamingQuery — exactly-once
    per micro-batch comes from the stream checkpoint; the parquet sink
    is append-only, so a replayed epoch after a crash can duplicate its
    rows (dedupe on (epoch, query_id, rank) downstream if the sink must
    be exactly-once, the standard foreachBatch contract)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(
        lambda df, epoch: serve_query_batch(
            bundle, df, k=k, epoch_id=epoch, output_dir=output_dir,
            decision_log=decision_log, **ann_kwargs,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
