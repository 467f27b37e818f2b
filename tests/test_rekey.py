"""Re-key equivalence tests, mirroring graph_mem.rs:232-331: identity
map preserves the graph exactly; a bijection preserves structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.rekey import rekey_entry, rekey_links

PARAMS = HawkParams.new(64, 32, 8)


@pytest.fixture(scope="module")
def graph(spark):
    codes = spark.range(60).select(F.col("id").alias("vec_id"), F.col("id").alias("code"))
    index = hnsw.build_index(codes, metric="hamming", params=PARAMS, num_shards=2, vec_col="code")
    return hnsw.to_links(index).cache(), hnsw.entry_points(index).cache()


def _links_set(links_df):
    return {
        (r.shard, r.layer, r.src, tuple((n.dist, n.dst) for n in r.nbrs))
        for r in links_df.collect()
    }


def test_identity_rekey(spark, graph):
    links, entry = graph
    ident = spark.range(60).select(F.col("id").alias("old_id"), F.col("id").alias("new_id"))
    assert _links_set(rekey_links(links, ident)) == _links_set(links)
    assert {tuple(r) for r in rekey_entry(entry, ident).collect()} == {
        tuple(r) for r in entry.collect()
    }


def test_bijection_rekey(spark, graph):
    links, entry = graph
    double = spark.range(60).select(
        F.col("id").alias("old_id"), (F.col("id") * 2 + 1).alias("new_id")
    )
    re = rekey_links(links, double)
    orig = _links_set(links)
    back = {
        (s, l, (src - 1) // 2, tuple((d, (dst - 1) // 2) for d, dst in nbrs))
        for s, l, src, nbrs in _links_set(re)
    }
    assert back == orig
    # doubling map produces a *different* graph than identity (graph_mem.rs:252-264)
    assert _links_set(re) != orig
