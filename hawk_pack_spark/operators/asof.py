"""As-of (temporal) join — Spark lacks a native one; rendered as the
union + ordered-window carry-forward pattern (no range crossJoin, one
shuffle on (key, ts)).

For each left row, attach the latest right row with right.ts <= left.ts
within the same key — the standard backward as-of. At 100 TB both sides
shuffle once on the key and the window scans each partition in ts order;
skewed keys split via AQE."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
) -> DataFrame:
    """Left rows + carried right values (NULL when no earlier right row).

    Tie rule: right rows at exactly left.ts ARE visible (<=), matching
    DuckDB's ASOF JOIN; among equal-ts right rows the highest-ordered
    one wins deterministically."""
    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    for v in value_cols:
        l_tagged = l_tagged.withColumn(f"_r_{v}", F.lit(None).cast(dict(right.dtypes)[v]))
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
    )
    l_aligned = l_tagged.select(
        *[F.col(c) for c in left.columns],
        "_ts", "_is_left", *[f"_r_{v}" for v in value_cols],
    )
    r_aligned = r_tagged.select(
        *[
            F.col(c) if c in (key,) else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
        ],
        "_ts", "_is_left", *[f"_r_{v}" for v in value_cols],
    )
    u = l_aligned.unionByName(r_aligned)
    # right rows sort before left at equal ts → visible to them (<=).
    # The value columns join the orderBy as the final keys: without them
    # two right rows with equal (key, ts) have no defined relative order
    # and last(ignorenulls) would pick whichever landed last in partition
    # order — varying across shuffles. With them, the largest value tuple
    # wins, deterministically.
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_left").asc(),
            *[F.col(f"_r_{v}").asc_nulls_first() for v in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u
    for v in value_cols:
        carried = carried.withColumn(
            f"asof_{v}", F.last(f"_r_{v}", ignorenulls=True).over(w)
        )
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"asof_{v}") for v in value_cols],
    )
