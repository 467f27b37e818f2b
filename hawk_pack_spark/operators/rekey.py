"""Graph re-keying — the ``GraphMem::from_another`` port.

Reference (src/graph_store/graph_mem.rs:43-76): convert a graph to a
different store by mapping every vector ref and distance ref, without
restructuring; "the distance metric is assumed to stay the same". Used
for the plaintext → secret-shared index handoff. Queue re-keying is
``FurthestQueue::map`` (src/data_structures/queue.rs:67-85).

Spark rendering: a broadcast-joined id remap on the exploded links table
plus a ``transform`` over the nbrs array — pure built-ins, one shuffle
to regroup."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hawk_pack_spark.operators.topk import collect_sorted_neighbors


def rekey_links(
    links: DataFrame,
    mapping: DataFrame,
    old_col: str = "old_id",
    new_col: str = "new_id",
    dist_scale: float = 1.0,
) -> DataFrame:
    """Remap (layer, src, nbrs[dist,dst]) through an id bijection.

    ``dist_scale`` mirrors the distance-map hook of from_another (the
    metric itself must not change, only its representation).

    Empty queues are rows too (a node's occupied-but-edgeless layers —
    see `hnsw.to_links`): from_another maps every queue including
    empties, so they remap src-only and rejoin rather than vanishing
    through the explode."""
    empties = links.where(F.size("nbrs") == 0)
    links = links.where(F.size("nbrs") > 0)
    exploded = links.select(
        "shard", "layer", "src", F.explode("nbrs").alias("nbr")
    ).select(
        "shard", "layer", "src",
        F.col("nbr.dst").alias("dst"),
        (F.col("nbr.dist") * F.lit(dist_scale)).alias("dist"),
    )
    m_src = F.broadcast(
        mapping.select(F.col(old_col).alias("src"), F.col(new_col).alias("new_src"))
    )
    m_dst = F.broadcast(
        mapping.select(F.col(old_col).alias("dst"), F.col(new_col).alias("new_dst"))
    )
    remapped = (
        exploded.join(m_src, "src")
        .join(m_dst, "dst")
        .select(
            "shard", "layer",
            F.col("new_src").alias("src"),
            F.col("new_dst").alias("dst"),
            "dist",
        )
    )
    out = collect_sorted_neighbors(remapped, ["shard", "layer", "src"])
    re_empty = empties.join(m_src, "src").select(
        "shard", "layer", F.col("new_src").alias("src"), "nbrs"
    )
    return out.unionByName(re_empty)


def rekey_entry(
    entry: DataFrame,
    mapping: DataFrame,
    old_col: str = "old_id",
    new_col: str = "new_id",
) -> DataFrame:
    m = F.broadcast(
        mapping.select(F.col(old_col).alias("point"), F.col(new_col).alias("new_point"))
    )
    return entry.join(m, "point").select(
        "shard", F.col("new_point").alias("point"), "layer"
    )
