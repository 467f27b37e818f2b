"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting handles most cases (enabled in session.py);
these helpers cover the two patterns AQE can't fix:

- a hot-key AGGREGATION (one reducer key swamps a task): two-stage
  salted aggregation — partial agg on (key, salt), final agg on key.
- a hot-key JOIN against a mid-sized dim (too big to broadcast): the
  big side salts randomly, the dim side replicates across all salts.

Both preserve exact results for decomposable aggregates."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    sum_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key).agg(count, sum) computed skew-safely in two stages.

    Stage 1 groups on (key, salt) — the hot key's rows spread over
    n_salts reducers; stage 2 combines the ≤ n_salts partials per key.
    count/sum are decomposable, so the result is exactly the naive one."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial_aggs = [F.count(F.lit(1)).alias("_n")]
    if sum_col is not None:
        partial_aggs.append(
            F.sum(F.col(sum_col).cast("decimal(18,2)")).alias("_s")
        )
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
    )
    final_aggs = [F.sum("_n").alias("n")]
    if sum_col is not None:
        final_aggs.append(F.sum("_s").cast("double").alias(f"sum_{sum_col}"))
    return stage1.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where `big` has hot keys and `dim` is too large to
    broadcast: big rows get a random salt, dim rows replicate across all
    n_salts, and the join key becomes (key, salt) — the hot key's rows
    land on n_salts different reducers instead of one."""
    spark = big.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    dim_replicated = dim.crossJoin(salts)
    return big_salted.join(dim_replicated, [key, "_salt"]).drop("_salt")
