"""Source/sink format breadth: parquet (default), ORC, CSV, JSON, and
partitioned layouts.

Parquet/ORC are the scan paths with predicate pushdown + column pruning;
CSV/JSON are interchange formats (schema ALWAYS supplied — inference
scans the data twice and guesses types, both wrong at 100 TB).
Partitioned writes put the partition column in the directory layout so
partition pruning skips whole directories at planning time
(`PartitionFilters` in the scan node, verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

READERS = ("parquet", "orc", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    getattr(w, fmt)(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table.

    Bucketing is THE shuffle eliminator at 100 TB: two tables bucketed
    on the join key with the same bucket count join with NO Exchange on
    either side (and with matching sort order, no Sort either) — the
    co-location is done once at write time and amortized over every
    subsequent join/aggregate on that key. Requires `saveAsTable`
    (bucket metadata lives in the catalog, not the files)."""
    w = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(
            f"{fmt} requires an explicit schema — inference double-scans "
            "and mistypes at scale"
        )
    if fmt == "csv":
        r = r.option("header", "true")
    return getattr(r, fmt)(path)
