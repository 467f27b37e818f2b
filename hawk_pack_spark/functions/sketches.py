"""Approximate (sketch) aggregates — the sub-linear layer for 100 TB.

Exact distinct counts, quantiles, and frequency tables all shuffle
data proportional to the number of distinct keys; at 100 TB that is the
dominant cost. These wrappers expose Spark's mergeable sketches (each
is a bounded-size partial aggregate combined map-side, so the shuffle
carries sketch bytes, not keys):

- HyperLogLog++ / Datasketches HLL (`approx_count_distinct`,
  `hll_sketch_agg` + `hll_union_agg`) — distinct counts, and
  PRE-AGGREGATED distinct counts: persist one sketch per partition/day,
  union later for any rollup without re-reading data.
- KLL / Greenwald-Khanna (`kll_sketch_agg_double`,
  `percentile_approx`) — quantiles with bounded rank error.
- Datasketches frequent-items (`approx_top_k`) — heavy hitters in one
  aggregate, no per-key shuffle.

Error bounds are asserted against exact answers in tests; results are
deterministic for fixed input and parameters but NOT reproducible in
other engines, so these stay out of the hash-parity catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_count(col, rsd: float = 0.02) -> Column:
    """HyperLogLog++ distinct count with target relative std deviation."""
    return F.approx_count_distinct(col, rsd=rsd)


def hll_presketch(df: DataFrame, key_col, group_cols: list[str]) -> DataFrame:
    """One mergeable HLL sketch per group — the persistable form.

    Write these per ingest batch/partition; any later rollup unions the
    binary sketches (`hll_merge_count`) instead of rescanning raw data.
    """
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({key_col})").alias("hll_sketch")
    )


def hll_merge_count(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union pre-built sketches (optionally regrouped coarser) and
    estimate the distinct count of the merged population."""
    agg = F.expr("hll_sketch_estimate(hll_union_agg(hll_sketch))").alias(
        "distinct_estimate"
    )
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def quantile_summary(
    df: DataFrame,
    value_col: str,
    probs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
    accuracy: int = 10_000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate quantiles per group (rank error ≤ 1/accuracy)."""
    agg = F.percentile_approx(
        value_col, F.array(*[F.lit(float(p)) for p in probs]), accuracy
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def kll_presketch(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """Mergeable KLL quantile sketch per group (double values)."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"kll_sketch_agg_double({value_col})").alias("kll_sketch")
    )


def kll_merge_quantile(sketches: DataFrame, prob: float) -> DataFrame:
    """Merge KLL sketches across all groups and read one quantile.

    `kll_sketch_merge_double` is a binary scalar merge (no union
    aggregate exists for KLL), so the sketches fold pairwise over a
    collected array — fine at any group count that fits a row (each
    sketch is ~KB)."""
    return sketches.agg(F.collect_list("kll_sketch").alias("ss")).select(
        F.expr(
            "kll_sketch_get_quantile_double("
            "reduce(slice(ss, 2, size(ss) - 1), ss[0],"
            " (a, x) -> kll_sketch_merge_double(a, x)), "
            f"{float(prob)})"
        ).alias("quantile")
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int = 10,
                  max_tracked: int = 10_000) -> DataFrame:
    """Top-k most frequent keys via the Datasketches frequent-items
    sketch: one bounded-size aggregate, no per-key shuffle. Estimated
    counts are exact when the key cardinality fits `max_tracked`."""
    return (
        df.agg(
            F.expr(f"approx_top_k({key_col}, {k}, {max_tracked})").alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias(key_col),
            F.col("e.count").alias("est_count"),
        )
    )
