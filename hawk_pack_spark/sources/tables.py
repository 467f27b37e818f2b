"""Fixture table loaders.

The driver provides deterministic parquet fixtures (TESTDATA.md):
TPC-H-ish relational tables plus ``events`` (stream-shaped),
``documents`` (text pipeline) and ``embeddings`` (vector pipeline).

Parquet is the scan path: Catalyst pushes filters and prunes columns at
the source (verify with ``.explain`` → ``PushedFilters`` / ``ReadSchema``),
so loaders never pre-select columns — callers' projections reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # The events fixture's ts physical type has varied across testdata
    # generations: TIMESTAMP(NANOS) (read as raw nanos under
    # legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) with
    # isAdjustedToUTC=false (read as TIMESTAMP_NTZ by Spark 4, while
    # DuckDB reads it as a naive TIMESTAMP). Normalize both to the
    # session-UTC instant type the catalog's epoch-second convention is
    # written against — under a UTC session the NTZ wall-clock IS the
    # instant, matching DuckDB's EPOCH() on the naive value.
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture as a temp view so ``spark.sql`` queries run
    against the same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
