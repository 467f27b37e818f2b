"""Group-wise top-k — the Spark rendering of the reference's sorted
candidate queues.

``FurthestQueue``/``NearestQueue`` (reference: src/data_structures/
queue.rs:12-16,116-120) are ascending/descending ``(vector, distance)``
lists with trim-to-k (queue.rs:59-65). Declaratively that is exactly
``row_number() OVER (PARTITION BY group ORDER BY dist, id) <= k`` — the
canonical distributed top-k: map-side partial top-k via the sort-based
window, no driver involvement, no full sort of the child.

Two physical forms, matching SURVEY.md §1.5:
- exploded rows (join-friendly) → ``topk_rows``
- nested ARRAY<STRUCT> per group (storage-friendly, the links-table
  layout) → ``topk_array`` / ``trim_sorted_array``
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_rows(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str | Column,
    k: int,
    ascending: bool = True,
    tie_cols: Sequence[str] = (),
    rank_name: str = "rank",
) -> DataFrame:
    """k best rows per group, deterministic via tie columns."""
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    keys = [order.asc() if ascending else order.desc()] + [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*keys)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .where(F.col(rank_name) <= k)
    )


def collect_sorted_neighbors(
    df: DataFrame,
    group_cols: Sequence[str],
    dst_col: str = "dst",
    dist_col: str = "dist",
    k: int | None = None,
    out_col: str = "nbrs",
) -> DataFrame:
    """Exploded (group, dst, dist) rows → one row per group carrying the
    distance-ascending neighbor array ``ARRAY<STRUCT<dist,dst>>``, trimmed
    to k. Struct field order (dist first) makes ``array_sort`` order by
    distance with dst as tie-break — the FurthestQueue invariant."""
    nbr = F.struct(F.col(dist_col).alias("dist"), F.col(dst_col).alias("dst"))
    agg = df.groupBy(*group_cols).agg(F.array_sort(F.collect_list(nbr)).alias(out_col))
    if k is not None:
        agg = agg.withColumn(out_col, F.slice(F.col(out_col), 1, k))
    return agg


def trim_sorted_array(nbrs: Column | str, k: int) -> Column:
    """``trim_to_k_nearest`` on an already-sorted neighbor array
    (reference: src/data_structures/queue.rs:59-65)."""
    c = F.col(nbrs) if isinstance(nbrs, str) else nbrs
    return F.slice(c, 1, k)

