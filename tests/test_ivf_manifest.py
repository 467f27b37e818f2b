"""IVF-family serving manifest: save → load → search equals in-memory
search, codes stay lazy and cell-pruned (PartitionFilters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hawk_pack_spark.operators.pq import (
    ivfpq_build,
    ivfpq_search,
    ivfsq8_build,
    ivfsq8_search,
)
from hawk_pack_spark.sources import load_table
from hawk_pack_spark.sources.graph_io import load_ivf_index, save_ivf_index


def _vectors(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _queries(vecs, n=6):
    return vecs.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _rows(df):
    return sorted(
        (r.query_id, r.vec_id, round(r.dist, 9), r.rank) for r in df.collect()
    )


def test_ivfsq8_manifest_roundtrip(spark, sf_dir, tmp_path):
    vecs = _vectors(spark, sf_dir)
    queries = _queries(vecs)
    encoded, centers, lo, scale = ivfsq8_build(vecs, n_clusters=8)
    direct = ivfsq8_search(
        encoded, centers, lo, scale, queries, kth=5, nprobe=4, rerank_with=vecs
    )
    path = str(tmp_path / "ivfsq8_bundle")
    save_ivf_index(path, encoded, centers, "ivfsq8", lo=lo, scale=scale)
    idx = load_ivf_index(spark, path)
    assert idx.kind == "ivfsq8"
    reloaded = idx.search(queries, k=5, nprobe=4, rerank_with=vecs)
    assert _rows(direct) == _rows(reloaded) and len(_rows(direct)) > 0
    # the loaded scan is partition-pruned on the probed cells
    plan = reloaded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_ivfpq_manifest_roundtrip(spark, sf_dir, tmp_path):
    vecs = _vectors(spark, sf_dir)
    queries = _queries(vecs)
    encoded, centers, codebooks = ivfpq_build(vecs, n_clusters=8, m=8)
    direct = ivfpq_search(
        encoded, centers, codebooks, queries, kth=5, nprobe=4, rerank_with=vecs
    )
    path = str(tmp_path / "ivfpq_bundle")
    save_ivf_index(path, encoded, centers, "ivfpq", codebooks=codebooks)
    idx = load_ivf_index(spark, path)
    reloaded = idx.search(queries, k=5, nprobe=4, rerank_with=vecs)
    assert _rows(direct) == _rows(reloaded) and len(_rows(direct)) > 0


def test_save_ivf_index_validates_model(spark, sf_dir, tmp_path):
    import pytest

    vecs = _vectors(spark, sf_dir)
    encoded, centers, lo, scale = ivfsq8_build(vecs, n_clusters=4)
    with pytest.raises(ValueError, match="codebooks"):
        save_ivf_index(str(tmp_path / "x"), encoded, centers, "ivfpq")
    with pytest.raises(ValueError, match="lo and scale"):
        save_ivf_index(str(tmp_path / "y"), encoded, centers, "ivfsq8")
    with pytest.raises(ValueError, match="kind"):
        save_ivf_index(str(tmp_path / "z"), encoded, centers, "flat")
