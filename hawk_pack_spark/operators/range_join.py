"""Scalable range join: points-in-intervals as a binned equi-join.

Spark has no native range-join strategy — a bare
``ts BETWEEN start AND end`` condition plans as
BroadcastNestedLoopJoin (O(|L|·|R|) comparisons), which is unusable at
100 TB. The standard fix (the range-join/bin technique of interval
joins in stream processors) is to discretize time into fixed-width bins
so the range condition becomes an equi-join key:

- each point belongs to exactly ONE bin: ``floor(ts / w)``;
- each interval is exploded to EVERY bin it overlaps:
  ``sequence(floor(start/w), floor(end/w))``;
- the join is a plain hash equi-join on ``(keys…, bin)``, followed by
  the residual ``start <= ts < end`` filter.

Because a point has a single bin, a (point, interval) pair can meet in
at most one bin — no post-join dedup is needed. Bin width trades
interval fan-out (rows ≈ len/width per interval) against candidate
density per bin; pick it near the median interval length so fan-out is
O(1) while each bin stays selective. The equi-join shuffles both sides
on (keys, bin) — fully partitionable, AQE-skew-splittable, and
broadcastable when the exploded interval side is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_s(col: Column) -> Column:
    """Epoch seconds as DOUBLE (timestamps cast to seconds-since-epoch;
    numerics pass through the same cast unchanged)."""
    return col.cast("double")


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width_s: int,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (half-open, the unambiguous convention) and
    equal values on ``keys``. Timestamp columns may be TIMESTAMP or
    numeric epoch seconds.

    ``how``: "inner" returns all columns of both inputs (minus the
    duplicated key columns); "left_semi" returns point rows that fall
    in at least one interval.
    """
    keys = keys or []
    p = points.withColumn(
        "_bin", F.floor(_epoch_s(F.col(point_ts)) / bin_width_s)
    ).alias("p")
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_s(F.col(start_col)) / bin_width_s),
                F.floor(_epoch_s(F.col(end_col)) / bin_width_s),
            )
        ),
    ).alias("i")
    cond = F.col("p._bin") == F.col("i._bin")
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    residual = (
        (_epoch_s(F.col(f"p.{point_ts}")) >= _epoch_s(F.col(f"i.{start_col}")))
        & (_epoch_s(F.col(f"p.{point_ts}")) < _epoch_s(F.col(f"i.{end_col}")))
    )
    if how == "left_semi":
        return points.withColumn(
            "_bin", F.floor(_epoch_s(F.col(point_ts)) / bin_width_s)
        ).alias("p").join(i, cond & residual, "left_semi").drop("_bin")
    joined = p.join(i, cond & residual, "inner")
    drop = [F.col("p._bin"), F.col("i._bin")] + [F.col(f"i.{k}") for k in keys]
    return joined.drop(*drop)
