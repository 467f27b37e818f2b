"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every setting is chosen to also be
the right default on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — the knob that makes one config work
  from sf0.001 to 100 TB.
- Arrow on — every pandas UDF crosses the JVM/Python boundary batched.
- UTC session timezone — parity with DuckDB/parquet timestamps.
- shuffle.partitions defaults to cores locally; on a real cluster AQE
  coalesces from a high initial number, so we leave initialPartitionNum
  generous.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hawk_pack_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else all
    cores). On a real cluster pass ``master=None`` with a pre-set
    spark.master, or leave spark-submit in charge.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus)
        except ValueError:
            shuffle_partitions = os.cpu_count() or 8

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # bucketed tables (write_bucketed) need a catalog warehouse;
        # keep it out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/hawk_pack_warehouse"),
        )
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # the events fixture stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as raw nanos and reconstruct (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
