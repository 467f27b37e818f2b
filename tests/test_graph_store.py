"""GraphStore contract round-trips, mirroring the reference's store
tests (graph_pg.rs:231-286 test_db): entry upsert/read-back equality,
set_links/get_links round-trip, missing key → empty."""

from __future__ import annotations

import pytest

from hawk_pack_spark import graph_store as G


def test_links_roundtrip_and_upsert(spark):
    links = G.empty_links(spark)
    up1 = spark.createDataFrame(
        [(0, 0, 5, [(0.5, 6), (1.5, 7)])], G.LINKS_SCHEMA
    )
    links = G.set_links(links, up1)
    assert G.get_links(links, 5, 0) == [(0.5, 6), (1.5, 7)]
    # missing key → empty, not an error
    assert G.get_links(links, 99, 0) == []
    assert G.get_links(links, 5, 3) == []
    # unconditional whole-queue replacement
    up2 = spark.createDataFrame([(0, 0, 5, [(0.25, 9)])], G.LINKS_SCHEMA)
    links = G.set_links(links, up2)
    assert G.get_links(links, 5, 0) == [(0.25, 9)]
    assert links.count() == 1


def test_entry_point_contract(spark):
    entry = G.empty_entry(spark)
    assert G.get_entry_point(entry) is None
    entry = G.set_entry_point(entry, point=3, layer=0)
    assert G.get_entry_point(entry) == (3, 0)
    entry = G.set_entry_point(entry, point=8, layer=2)
    assert G.get_entry_point(entry) == (8, 2)
    with pytest.raises(ValueError):
        G.set_entry_point(entry, point=1, layer=2)  # not strictly higher
    # independent per shard
    entry = G.set_entry_point(entry, point=4, layer=0, shard=1)
    assert G.get_entry_point(entry, shard=1) == (4, 0)
    assert G.get_entry_point(entry, shard=0) == (8, 2)


def test_num_layers(spark):
    links = spark.createDataFrame(
        [(0, 0, 1, [(0.1, 2)]), (0, 2, 1, [(0.2, 3)]), (1, 0, 4, [(0.3, 5)])],
        G.LINKS_SCHEMA,
    )
    assert G.num_layers(links) == 3
    assert G.num_layers(links, shard=1) == 1
    assert G.num_layers(G.empty_links(spark)) == 0
