"""Structured Streaming vector ingest — the op-stream surface.

The reference externalizes insertion as a stream of store ops consumed
by the caller (coroutine.rs:21-39, SURVEY §2.6); the Spark analog is
``foreachBatch``: each micro-batch is one op batch, executed as the
two-phase insert (search → is_match dedup gate → connect) against the
accumulated index — exactly the reference's insert-unless-duplicate
lifecycle (SURVEY §3 EP2), scaled to micro-batches.

State lives in the index DataFrame; between batches it is
localCheckpoint()ed so lineage never grows across the stream (the
GraphFrames iterative-plan lesson, SURVEY §7)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from hawk_pack_spark.config import DEFAULT_PARAMS, HawkParams
from hawk_pack_spark.operators import hnsw


@dataclass
class StreamingIndex:
    """Mutable holder for the index evolved by a stream of inserts."""

    metric: str = "hamming"
    params: HawkParams = field(default_factory=lambda: DEFAULT_PARAMS)
    match_threshold: float | None = 0.0
    id_col: str = "vec_id"
    vec_col: str = "code"
    num_shards: int = 4
    index_df: DataFrame | None = None

    def ingest_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """foreachBatch sink: two-phase insert of one micro-batch."""
        if batch.isEmpty():
            return
        if self.index_df is None:
            if self.match_threshold is not None:
                # bootstrap batch: intra-batch exact dedup (first id wins)
                from hawk_pack_spark.operators.dedup import exact_dedup

                batch = exact_dedup(batch, self.vec_col, self.id_col)
            self.index_df = hnsw.build_index(
                batch,
                metric=self.metric,
                params=self.params,
                num_shards=self.num_shards,
                id_col=self.id_col,
                vec_col=self.vec_col,
            ).localCheckpoint()
            return
        self.index_df = hnsw.insert_batch(
            self.index_df,
            batch,
            metric=self.metric,
            params=self.params,
            id_col=self.id_col,
            vec_col=self.vec_col,
            match_threshold=self.match_threshold,
        ).localCheckpoint()

    def count(self) -> int:
        return 0 if self.index_df is None else self.index_df.count()


def start_parquet_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    sink: StreamingIndex,
    checkpoint_dir: str,
    trigger_once: bool = True,
    files_per_trigger: int = 1,
):
    """Stream parquet files from source_dir into the index via
    foreachBatch. checkpoint_dir must live OUTSIDE any glob matched by
    source_dir (or the stream reads its own metadata as data).
    files_per_trigger chunks availableNow processing into one micro-batch
    per file (the op-batch granularity of the reference's stream).
    Returns the StreamingQuery (caller awaits/stops)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(
        lambda df, epoch: sink.ingest_batch(df, epoch)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
