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
        # Worker-side BLAS must be SINGLE-threaded: Spark's task
        # parallelism already saturates the cores, and un-pinned
        # OpenBLAS spawns a full thread pool PER python worker — with
        # 32 workers that is 32x32 spin-yielding threads (measured on
        # one 600x40k assignment chunk: 86s sys vs 13s user; the 10M
        # knn_join assignment stage ran ~7x slow purely on sched_yield
        # churn, r12). Same rule on a real cluster: cores-per-executor
        # is Spark's knob, not the BLAS pool's.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
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
