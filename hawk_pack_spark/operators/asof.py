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
    one wins deterministically.

    Row atomicity: all value columns travel as ONE struct through a
    single last(ignorenulls), so the carried result is always a single
    winning right row — carrying each column through its own
    last(ignorenulls) would stitch values from different right rows
    whenever some value columns are NULL in the winner."""
    rtypes = dict(right.dtypes)
    vals_type = (
        "struct<" + ",".join(f"`{v}`:{rtypes[v]}" for v in value_cols) + ">"
    )
    l_aligned = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(vals_type).alias("_rvals"),
    )
    r_aligned = right.select(
        *[
            F.col(c) if c == key else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(v).alias(v) for v in value_cols]).alias("_rvals"),
    )
    u = l_aligned.unionByName(r_aligned)
    # right rows sort before left at equal ts → visible to them (<=).
    # The value struct joins the orderBy as the final key: without it
    # two right rows with equal (key, ts) have no defined relative order
    # and last(ignorenulls) would pick whichever landed last in partition
    # order — varying across shuffles. With it, the largest value tuple
    # (field-wise struct comparison) wins, deterministically and as a
    # whole row.
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_left").asc(),
            F.col("_rvals").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_won", F.last("_rvals", ignorenulls=True).over(w))
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("_won")[v].alias(f"asof_{v}") for v in value_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
) -> DataFrame:
    """Forward as-of: each left row + the EARLIEST right row with
    right.ts >= left.ts in the same key (NULL when no later right
    row) — "the next purchase after this error", the look-ahead dual
    of `asof_join_backward` and DuckDB's ``ASOF ... ON r.ts >= l.ts``.

    Same union + ordered-window carry pattern (one shuffle on the
    key, no range crossJoin) run in REVERSE time order: right rows
    sort before left at equal ts (>= keeps them visible), and the
    carried struct travels whole (row atomicity — per-column carries
    could stitch different right rows). Among equal-(key, ts) right
    rows the SMALLEST value tuple wins deterministically (the mirror
    of backward's largest-wins: the window's last() takes the final
    row of the descending-_rvals order).
    """
    rtypes = dict(right.dtypes)
    vals_type = (
        "struct<" + ",".join(f"`{v}`:{rtypes[v]}" for v in value_cols) + ">"
    )
    l_aligned = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(vals_type).alias("_rvals"),
    )
    r_aligned = right.select(
        *[
            F.col(c) if c == key else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(v).alias(v) for v in value_cols]).alias("_rvals"),
    )
    u = l_aligned.unionByName(r_aligned)
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts").desc(),
            F.col("_is_left").asc(),
            F.col("_rvals").desc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_won", F.last("_rvals", ignorenulls=True).over(w))
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("_won")[v].alias(f"asof_{v}") for v in value_cols],
    )
