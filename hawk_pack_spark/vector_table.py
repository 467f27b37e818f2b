"""The vector table with staging semantics — the literal VectorStore
data model.

Reference (src/vector_store/lazy_memory_store.rs:10-66): one table holds
pending queries AND accepted vectors, distinguished by ``is_persistent``;
``prepare_query`` appends a non-persistent point (same ID space), and
``insert`` flips the flag in place — acceptance is a bit-flip, not a
copy (the "clone-free ID reuse" device, SURVEY §4 row 11).

Spark rendering: an append plus a flag update expressed as a column
rewrite — no data movement, one narrow transformation. ID assignment is
max(id)+row_number over a stable order, the distributed analog of
positional PointIds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VECTORS_SCHEMA = "vec_id long, embedding array<double>, is_persistent boolean"


def empty_vectors(spark, payload_type: str = "array<double>") -> DataFrame:
    return spark.createDataFrame(
        [], f"vec_id long, embedding {payload_type}, is_persistent boolean"
    )


# Cardinality-dispatch threshold (same recipe as the analytics global
# windows, VERDICT r10 #5 / r11 #2): staged batches at or under this
# count take one ordered window (query batches are beam/batch sized by
# the documented contract); above it, IDs are assigned via a two-phase
# range-partitioned rank so no single-partition data-stream Window
# exists at any batch size.
_STAGE_WINDOW_THRESHOLD = 2_000_000


def _exceeds_rows(df: DataFrame, threshold: int) -> bool:
    """Counts at most threshold+1 rows (LocalLimit early-exit)."""
    return df.limit(threshold + 1).count() > threshold


def _stage_two_phase(raw: DataFrame, payload_col: str, max_id: int) -> DataFrame:
    """Distributed global row_number over the content order for a
    staged batch too large for one ordered window: range partition on
    the payload (Spark array ordering is lexicographic, so the range
    key IS the window key — equal payloads land in one partition and
    global order is exact), rank locally per partition, add each
    partition's row-count prefix offset (cumsum over the
    #partitions-row totals table, broadcast back). Same ID assignment
    as the single-window path up to ties between identical payloads,
    which are arbitrary in both forms."""
    ranged = raw.select(F.col(payload_col).alias("embedding")).repartitionByRange(
        F.col("embedding")
    )
    pid = ranged.withColumn("_pid", F.spark_partition_id())
    wl = Window.partitionBy("_pid").orderBy("embedding")
    local = pid.withColumn("_lr", F.row_number().over(wl))
    counts = pid.groupBy("_pid").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off")
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        (F.lit(max_id) + F.col("_off") + F.col("_lr")).cast("long").alias("vec_id"),
        "embedding",
        F.lit(False).alias("is_persistent"),
    )


def prepare_queries(
    vectors: DataFrame,
    raw: DataFrame,
    payload_col: str = "embedding",
    threshold: int = _STAGE_WINDOW_THRESHOLD,
) -> tuple[DataFrame, DataFrame]:
    """Stage raw payloads as pending points: assign IDs continuing the
    table's ID space, append with is_persistent = false.

    Returns (updated table, staged rows with their new IDs) — the
    VectorRef handles the caller passes to search/insert.

    ID assignment is max(id)+rank over a stable content-derived order.
    Batches above ``threshold`` rows route through a two-phase
    range-partitioned rank (no single-partition Window at any size)."""
    max_id = vectors.agg(F.coalesce(F.max("vec_id"), F.lit(-1))).collect()[0][0]
    if _exceeds_rows(raw, threshold):
        staged = _stage_two_phase(raw, payload_col, max_id)
    else:
        w = Window.orderBy(payload_col)  # stable, content-derived order
        staged = raw.select(
            (F.lit(max_id) + F.row_number().over(w)).alias("vec_id"),
            F.col(payload_col).alias("embedding"),
            F.lit(False).alias("is_persistent"),
        )
    return vectors.unionByName(staged), staged


def accept(vectors: DataFrame, ids: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """``insert``: flip is_persistent for the given ids — same row, same
    ID, no copy (a column rewrite, not a shuffle)."""
    flagged = ids.select(F.col(id_col).alias("vec_id")).withColumn("_acc", F.lit(True))
    return (
        vectors.join(F.broadcast(flagged), "vec_id", "left")
        .withColumn(
            "is_persistent", F.col("is_persistent") | F.coalesce(F.col("_acc"), F.lit(False))
        )
        .drop("_acc")
    )


def persistent(vectors: DataFrame) -> DataFrame:
    """The accepted subset — what search indexes are built over."""
    return vectors.where(F.col("is_persistent"))


def pending(vectors: DataFrame) -> DataFrame:
    return vectors.where(~F.col("is_persistent"))
