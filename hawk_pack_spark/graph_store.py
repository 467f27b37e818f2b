"""The GraphStore contract surface over normalized DataFrames.

Implements §2.3 of SURVEY.md operator-for-operator on the
links/entry table layouts (reference: src/traits.rs:97-116 with the
GraphMem/GraphPg behaviors):

- ``get_links``   : neighbor queue of (base, layer); EMPTY when absent
                    (graph_mem.rs:100-111 — not an error)
- ``set_links``   : unconditional whole-queue upsert
                    (graph_mem.rs:113-121; Postgres ON CONFLICT DO
                    UPDATE, graph_pg.rs:109-123)
- ``get_entry_point`` / ``set_entry_point`` : singleton per shard;
                    a new entry point must sit on a strictly higher
                    layer (assert at graph_mem.rs:86-91)
- ``num_layers``  : max(layer)+1 (graph_mem.rs:123-126; implemented
                    where graph_pg.rs:125-127 left todo!)

Spark is immutable, so mutators return the updated table; callers
persist via sources/graph_io. Each upsert is one anti-join + union —
the MERGE pattern without a table format dependency."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINKS_SCHEMA = (
    "shard int, layer int, src long, "
    "nbrs array<struct<dist: double, dst: long>>"
)
ENTRY_SCHEMA = "shard int, point long, layer int"


def empty_links(spark) -> DataFrame:
    return spark.createDataFrame([], LINKS_SCHEMA)


def empty_entry(spark) -> DataFrame:
    return spark.createDataFrame([], ENTRY_SCHEMA)


def get_links(links: DataFrame, base: int, lc: int, shard: int = 0) -> list:
    """The neighbor queue of `base` at layer `lc` — empty list when the
    key is absent, mirroring the reference's non-erroring miss."""
    rows = (
        links.where(
            (F.col("shard") == shard)
            & (F.col("layer") == lc)
            & (F.col("src") == base)
        )
        .select("nbrs")
        .collect()
    )
    if not rows:
        return []
    return [(n["dist"], n["dst"]) for n in rows[0].nbrs]


def set_links(
    links: DataFrame, updates: DataFrame
) -> DataFrame:
    """Upsert whole neighbor queues: rows in `updates` replace any
    existing (shard, layer, src) rows — ON CONFLICT DO UPDATE as
    anti-join + union."""
    kept = links.join(
        updates.select("shard", "layer", "src"), ["shard", "layer", "src"], "left_anti"
    )
    return kept.unionByName(updates)


def get_entry_point(entry: DataFrame, shard: int = 0):
    rows = entry.where(F.col("shard") == shard).collect()
    return (rows[0].point, rows[0].layer) if rows else None


def set_entry_point(
    entry: DataFrame, point: int, layer: int, shard: int = 0
) -> DataFrame:
    """Upsert the singleton entry row, enforcing the monotone-layer
    contract of the in-memory store."""
    current = get_entry_point(entry, shard)
    if current is not None and layer <= current[1]:
        raise ValueError(
            f"entry point layer must increase (shard {shard}: {layer} <= {current[1]})"
        )
    spark = entry.sparkSession
    new_row = spark.createDataFrame([(shard, point, layer)], ENTRY_SCHEMA)
    return entry.where(F.col("shard") != shard).unionByName(new_row)


def num_layers(links: DataFrame, shard: int | None = None) -> int:
    df = links if shard is None else links.where(F.col("shard") == shard)
    top = df.agg(F.max("layer")).collect()[0][0]
    return 0 if top is None else int(top) + 1
