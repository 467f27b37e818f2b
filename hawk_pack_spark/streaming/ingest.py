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
    # micro-batches are small relative to the accumulated index by
    # definition, so the duplicate gate takes the serving shape
    # (broadcast batch, zero index movement) — see insert_batch
    serving_gate: bool = True
    # optional durable store: after each micro-batch, the TOUCHED shards'
    # graph rows are row-level-upserted into the reference's two-table
    # Postgres layout (graph_pg.rs:111-115 ON CONFLICT semantics via
    # upsert_graph_jdbc) — the stream's write amplification tracks the
    # batch, not the index
    jdbc_url: str | None = None
    jdbc_driver: str | None = None

    def _persist_delta(self, shards: list[int] | None) -> None:
        if self.jdbc_url is None or self.index_df is None:
            return
        from pyspark.sql import functions as F

        from hawk_pack_spark.sources.graph_io import upsert_graph_jdbc

        delta = (
            self.index_df
            if shards is None
            else self.index_df.where(F.col("shard").isin(shards))
        )
        upsert_graph_jdbc(
            hnsw.to_links(delta),
            hnsw.entry_points(delta),
            url=self.jdbc_url,
            driver=self.jdbc_driver,
        )

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
            self._persist_delta(None)  # bootstrap: every shard is new
            return
        touched: dict = {}
        self.index_df = hnsw.insert_batch(
            self.index_df,
            batch,
            metric=self.metric,
            params=self.params,
            id_col=self.id_col,
            vec_col=self.vec_col,
            match_threshold=self.match_threshold,
            serving_gate=self.serving_gate,
            touched_out=touched,
        ).localCheckpoint()
        self._persist_delta(touched.get("shards", []))

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


@dataclass
class StreamingNearDup:
    """Streaming MinHash-LSH near-dup gate — the near-dup analog of the
    two-phase insert's is_match gate, for document streams.

    State = the accumulated band-bucket table of every ACCEPTED doc
    (band, band_key), localCheckpoint()ed between batches. Per
    micro-batch:

      1. incoming docs whose any band bucket already exists in the
         store are rejected (near-dup of an accepted doc);
      2. among the survivors, bucket collisions inside the batch keep
         the lowest doc_id (one pass of the serial first-wins rule; a
         chain A~B, B~C where B loses can over-reject C in the same
         batch — the standard batch-LSH approximation, exact again at
         the next batch boundary);
      3. survivors' bands join the store.

    Everything is equi-joins on (band, band_key) — no per-row Python,
    no growing driver state.

    Durability: with ``store_path`` set, the band-bucket store and the
    accepted-id log are parquet tables — each batch APPENDS its new
    buckets/ids (step 3 is an append, never a rewrite), and a fresh gate
    constructed on the same path resumes exactly where the last process
    stopped (restart ≡ continuation; test-pinned). The in-memory
    localCheckpoint copy remains the join side, so the per-batch reject
    joins never re-read the parquet history."""

    num_hashes: int = 8
    bands: int = 4
    id_col: str = "doc_id"
    text_col: str = "text"
    store: DataFrame | None = None
    accepted_ids: DataFrame | None = None
    store_path: str | None = None

    def _resume_from_path(self, spark: SparkSession) -> None:
        """Load the persisted store once, lazily, on the first batch of
        a resumed process (missing path = fresh store)."""
        from pyspark.errors import AnalysisException

        try:
            self.store = spark.read.parquet(
                f"{self.store_path}/buckets"
            ).localCheckpoint()
            self.accepted_ids = spark.read.parquet(
                f"{self.store_path}/accepted"
            ).localCheckpoint()
        except AnalysisException:
            self.store = None
            self.accepted_ids = None

    def ingest_batch(self, docs: DataFrame, epoch_id: int | None = None) -> None:
        from pyspark.sql import functions as F

        from hawk_pack_spark.operators.dedup import minhash_bands, minhash_signature

        if docs.isEmpty():
            return
        if self.store is None and self.store_path is not None:
            self._resume_from_path(docs.sparkSession)
        b = minhash_bands(
            minhash_signature(docs, self.id_col, self.text_col, self.num_hashes),
            self.id_col,
            self.num_hashes,
            self.bands,
        )
        if self.store is not None:
            hit = (
                b.join(self.store, ["band", "band_key"], "leftsemi")
                .select(self.id_col)
                .distinct()
            )
            b = b.join(hit, self.id_col, "left_anti")
        # intra-batch first-wins: lowest id per colliding bucket survives
        mins = b.groupBy("band", "band_key").agg(
            F.min(self.id_col).alias("_w")
        )
        losers = (
            b.join(mins, ["band", "band_key"])
            .where(F.col(self.id_col) != F.col("_w"))
            .select(self.id_col)
            .distinct()
        )
        b = b.join(losers, self.id_col, "left_anti")
        new_buckets = b.select("band", "band_key").distinct()
        new_ids = b.select(self.id_col).distinct()
        if self.store_path is not None:
            # durable form: history is append-only parquet; only THIS
            # batch's rows are written (write cost tracks the batch)
            new_buckets = new_buckets.localCheckpoint()
            new_ids = new_ids.localCheckpoint()
            new_buckets.write.mode("append").parquet(f"{self.store_path}/buckets")
            new_ids.write.mode("append").parquet(f"{self.store_path}/accepted")
        self.store = (
            new_buckets
            if self.store is None
            else self.store.unionByName(new_buckets).distinct()
        ).localCheckpoint()
        self.accepted_ids = (
            new_ids
            if self.accepted_ids is None
            else self.accepted_ids.unionByName(new_ids)
        ).localCheckpoint()

    def n_accepted(self) -> int:
        return 0 if self.accepted_ids is None else self.accepted_ids.count()


@dataclass
class StreamingIvfIngest:
    """Micro-batch appends into an IVF serving bundle (`save_ivf_index`
    layout) — the compressed-index counterpart of `StreamingIndex`.

    Each micro-batch: assign every new vector to its nearest coarse
    cell with the FROZEN routing model (`ivf_assign`, partition-local,
    zero shuffles), encode with the FROZEN quantizer (SQ8 lo/scale or
    PQ codebooks over residuals), and APPEND cell-partitioned parquet
    under `<path>/codes` — write amplification tracks the batch, never
    the index, and the appended files land inside the existing
    `cell=<i>` partitions so the probed-cell scan pruning is unchanged.

    Drift signal (the churn-detect analog for IVF): the running
    fraction of ingested vectors whose centroid distance exceeds their
    cell's build-time covering radius. A frozen quantizer encodes
    drifted vectors with growing error — when `drift_fraction()`
    crosses the caller's threshold, re-train (rebuild) the bundle.
    Requires the bundle to carry `cell_radii` (pass
    `ivf_cell_stats(...)` to `save_ivf_index`); without radii the
    counter stays at 0 and only volume is tracked.
    """

    path: str
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    index: object = None  # loaded IvfIndex (lazy-loaded from path)
    n_seen: int = 0
    n_drifted: int = 0

    def _load(self, spark):
        if self.index is None:
            from hawk_pack_spark.sources.graph_io import load_ivf_index

            self.index = load_ivf_index(spark, self.path)
        return self.index

    def ingest_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        import os

        import numpy as np
        from pyspark.sql import functions as F

        from hawk_pack_spark.operators.similarity import (
            ivf_assign,
            sq8_encode,
        )

        if batch.isEmpty():
            return
        spark = batch.sparkSession
        idx = self._load(spark)
        assigned = ivf_assign(
            batch, idx.centers, id_col=self.id_col, vec_col=self.vec_col
        ).localCheckpoint()  # assignment reused by drift + encode paths

        # drift accounting: one tiny agg per batch
        if idx.cell_radii is not None:
            radii_df = spark.createDataFrame(
                [(i, float(r)) for i, r in enumerate(idx.cell_radii)],
                "cell int, cell_r double",
            )
            row = (
                assigned.join(F.broadcast(radii_df), "cell")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_if(F.col("cdist_l2") > F.col("cell_r")).alias("d"),
                )
                .collect()[0]
            )
            self.n_seen += row["n"]
            self.n_drifted += row["d"]
        else:
            self.n_seen += assigned.count()

        # residual encode with the frozen quantizer
        centers_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(idx.centers)],
            "cell int, _center array<double>",
        )
        resid = assigned.join(F.broadcast(centers_df), "cell").select(
            F.col("vec_id"),
            F.col("cell"),
            F.zip_with(
                F.col(self.vec_col).cast("array<double>"), "_center",
                lambda v, c: v - c,
            ).alias("_resid"),
        )
        if idx.kind == "ivfsq8":
            enc = sq8_encode(
                resid, np.asarray(idx.lo), np.asarray(idx.scale),
                vec_id="vec_id", vec_col="_resid",
            )
            cols = ["vec_id", "cell", "codes", "cnorm"]
        else:
            from hawk_pack_spark.operators.pq import pq_encode

            enc = pq_encode(resid, idx.codebooks, id_col="vec_id", vec_col="_resid")
            cols = ["vec_id", "cell", "codes"]
        out = enc.join(resid.select("vec_id", "cell"), "vec_id").select(*cols)
        out.write.mode("append").partitionBy("cell").parquet(
            os.path.join(self.path, "codes")
        )

    def drift_fraction(self) -> float:
        return (self.n_drifted / self.n_seen) if self.n_seen else 0.0

    def reload(self, spark=None):
        """Fresh lazy handle over the appended codes (search sees every
        ingested batch)."""
        from pyspark.sql import SparkSession

        from hawk_pack_spark.sources.graph_io import load_ivf_index

        spark = spark or SparkSession.getActiveSession()
        self.index = load_ivf_index(spark, self.path)
        return self.index
