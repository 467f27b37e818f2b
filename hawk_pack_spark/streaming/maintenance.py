"""Streaming materialized-view maintenance.

The streaming rendering of operators/analytics.py's mergeable aggregate
state: each micro-batch contributes agg_state(batch) — |groups| rows,
never |rows| — merged into the running rollup inside foreachBatch. A
100 TB rollup is thereby maintained at DELTA cost per trigger; the base
table is never rescanned.

State size is the group count. It is held as collected rows here (the
local-mode rendering, bounded metadata exactly like the serving-path
centroid collects); swapping the snapshot for a parquet table write per
epoch (the StreamingIvfIngest pattern) changes none of the merge
semantics and is the restart-durable deployment shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from hawk_pack_spark.operators.analytics import (
    agg_state,
    finalize_agg,
    merge_agg_states,
)


class StreamingAggMaintenance:
    """foreachBatch handler maintaining a per-key aggregate rollup."""

    def __init__(
        self,
        spark: SparkSession,
        keys: Sequence[str],
        value_col: str,
        scale: int = 2,
    ) -> None:
        self.spark = spark
        self.keys = list(keys)
        self.value_col = value_col
        self.scale = scale
        self._rows: list | None = None
        self._schema = None
        self.n_batches = 0

    def update(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        s = agg_state(batch_df, self.keys, self.value_col, self.scale)
        if self._rows is not None:
            prev = self.spark.createDataFrame(self._rows, self._schema)
            s = merge_agg_states([prev, s], self.keys)
        self._rows = s.collect()  # state-sized (|groups|), bounded
        self._schema = s.schema
        self.n_batches += 1

    def attach(self, stream_df: DataFrame):
        """writeStream handle: caller sets trigger/checkpoint/start."""
        return stream_df.writeStream.foreachBatch(self.update)

    def view(self) -> DataFrame:
        """The maintained rollup, rendered with the batch finalizer —
        identical schema and float discipline to the batch operator."""
        if self._rows is None:
            raise ValueError("no batches processed yet")
        prev = self.spark.createDataFrame(self._rows, self._schema)
        return finalize_agg(prev, self.keys)
