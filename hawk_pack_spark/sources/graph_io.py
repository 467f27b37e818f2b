"""Index persistence — the GraphStore durability surface.

The reference persists the graph one row per (vector, layer) with a
JSONB neighbor queue plus a singleton entry-point row in Postgres
(migrations/20240909105321_init.up.sql; graph_pg.rs). Here the native
store is parquet, partitioned by shard so a reload co-locates each
shard's subgraph (one file group per kernel task — no shuffle on load).
A JDBC export mirrors the reference's Postgres layout for
interoperability; it is gated on a reachable JDBC driver.

Note graph_pg.rs leaves num_layers unimplemented (todo!) — implemented
here as max(layer)+1 over the links view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_index(index_df: DataFrame, path: str) -> None:
    index_df.write.mode("overwrite").partitionBy("shard").parquet(path)


def load_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def num_layers(links: DataFrame) -> int:
    """Count of layers (graph_pg.rs:125-127 todo!, graph_mem.rs:123-126)."""
    top = links.agg(F.max("layer")).collect()[0][0]
    return 0 if top is None else int(top) + 1


def export_links_jdbc(
    links: DataFrame,
    url: str | None = None,
    table: str = "hawk_graph_links",
    mode: str = "overwrite",
) -> bool:
    """Export the normalized links view to the reference's Postgres
    layout: (source_ref TEXT, layer INT, links JSON-as-TEXT). Returns
    False (no-op) when no JDBC URL is configured — this container has
    no database; the path is exercised against any reachable JDBC
    endpoint in production."""
    url = url or os.environ.get("HAWK_PACK_JDBC_URL")
    if not url:
        return False
    rows = links.select(
        F.col("src").cast("string").alias("source_ref"),
        F.col("layer"),
        F.to_json(F.col("nbrs")).alias("links"),
    )
    rows.write.format("jdbc").option("url", url).option("dbtable", table).mode(
        mode
    ).save()
    return True
