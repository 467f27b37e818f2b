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
    # The events fixture is TIMESTAMP(NANOS) which Spark reads as raw
    # nanos (legacy.parquet.nanosAsLong). Reconstruct micros-precision
    # timestamps with floor division — DuckDB truncates nanos the same way.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture as a temp view so ``spark.sql`` queries run
    against the same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
