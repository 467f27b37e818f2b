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


def prepare_queries(
    vectors: DataFrame, raw: DataFrame, payload_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Stage raw payloads as pending points: assign IDs continuing the
    table's ID space, append with is_persistent = false.

    Returns (updated table, staged rows with their new IDs) — the
    VectorRef handles the caller passes to search/insert."""
    max_id = vectors.agg(F.coalesce(F.max("vec_id"), F.lit(-1))).collect()[0][0]
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
