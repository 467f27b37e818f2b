"""Range search (radius queries) + filtered ANN search.

range_search is the set-valued relational form of the reference's
``is_match`` single-pair threshold test (src/traits.rs:46-49);
range_search_ivf adds LOSSLESS triangle-inequality cell pruning.
filtered_knn is the metadata-predicate + top-k serving surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hawk_pack_spark.operators import similarity as S
from hawk_pack_spark.operators.knn_exact import filtered_knn, knn_exact, range_search
from hawk_pack_spark.sources import load_table


def _vectors(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )


def _queries(vecs, n=8):
    return vecs.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _numpy_sides(vecs, queries):
    vr = vecs.orderBy("vec_id").collect()
    qr = queries.orderBy("query_id").collect()
    X = np.array([r.embedding for r in vr], dtype=np.float64)
    ids = np.array([r.vec_id for r in vr])
    Q = np.array([r.query_vec for r in qr], dtype=np.float64)
    qids = np.array([r.query_id for r in qr])
    return X, ids, Q, qids


def test_range_search_matches_numpy_reference(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    queries = _queries(vecs)
    X, ids, Q, qids = _numpy_sides(vecs, queries)
    d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    radius = float(np.median(d2))  # ~half of all pairs match
    got = {
        (r.query_id, r.vec_id)
        for r in range_search(vecs, queries, radius).collect()
    }
    want = {
        (int(qids[i]), int(ids[j]))
        for i, j in zip(*np.where(d2 <= radius))
    }
    assert got == want and len(want) > 0


def test_range_search_empty_on_tiny_radius(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    # queries displaced far from every stored vector
    queries = _queries(vecs).select(
        "query_id",
        F.transform("query_vec", lambda x: x + F.lit(1e6)).alias("query_vec"),
    )
    out = range_search(vecs, queries, 1e-6)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "vec_id", "dist"]


def test_range_search_ivf_exact_and_prunes(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    queries = _queries(vecs)
    assigned, centers = S.ivf_build(vecs, n_clusters=8)
    radii = S.ivf_cell_stats(assigned, centers)
    assert len(radii) == len(centers) and all(r >= 0 for r in radii)

    X, ids, Q, qids = _numpy_sides(vecs, queries)
    d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    radius = float(np.quantile(d2, 0.02))  # selective radius → real pruning

    brute = range_search(vecs, queries, radius)
    pruned = S.range_search_ivf(assigned, centers, radii, queries, radius)
    bs = {(r.query_id, r.vec_id, round(r.dist, 9)) for r in brute.collect()}
    ps = {(r.query_id, r.vec_id, round(r.dist, 9)) for r in pruned.collect()}
    assert bs == ps and len(bs) > 0  # lossless: identical to brute force

    # the cell prune actually prunes — asserted on PLANTED clusters, where
    # pruning is geometrically possible. (On the iid-uniform fixture every
    # balanced cell's radius ≈ the data diameter, so a well-converged fit
    # legitimately probes everything; the old pyspark.ml fit only "pruned"
    # there via an artifact — singleton outlier cells with radius 0. Its
    # measured inertia was 468.8 vs 463.0 for the current fit, r12.)
    n_planted = 8
    planted = spark.range(25 * n_planted).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.lit(10.0) * (F.col("id") % n_planted).cast("double")
                * F.when(i == F.lit(1), F.lit(1.0)).otherwise(F.lit(0.0))
                + F.sin(F.col("id") * i * 0.7) * F.lit(0.01)
            ),
        ).alias("embedding"),
    )
    p_assigned, p_centers = S.ivf_build(planted, n_clusters=n_planted)
    p_radii = S.ivf_cell_stats(p_assigned, p_centers)
    p_queries = planted.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    p_radius = 0.5  # covers a planted cluster's jitter, not the 10.0 gaps
    p_brute = range_search(
        planted.select("vec_id", "embedding"), p_queries, p_radius
    )
    p_pruned = S.range_search_ivf(p_assigned, p_centers, p_radii, p_queries, p_radius)
    pbs = {(r.query_id, r.vec_id, round(r.dist, 9)) for r in p_brute.collect()}
    pps = {(r.query_id, r.vec_id, round(r.dist, 9)) for r in p_pruned.collect()}
    assert pbs == pps and len(pbs) > 0  # still lossless on clustered data

    n_queries = p_queries.count()
    centers_df = spark.createDataFrame(
        [
            (i, [float(x) for x in c], float(p_radii[i]))
            for i, c in enumerate(p_centers)
        ],
        "cluster int, center array<double>, cell_r double",
    )
    from hawk_pack_spark.functions.distance import distance_expr

    cdist = F.sqrt(distance_expr("l2_sq", F.col("query_vec"), F.col("center")))
    n_probes = (
        p_queries.crossJoin(F.broadcast(centers_df))
        .where(cdist - F.col("cell_r") <= F.lit(p_radius ** 0.5))
        .count()
    )
    # well-separated clusters: each query probes ~its own cell only
    assert n_probes < n_queries * len(p_centers) // 2


def test_range_search_ivf_rejects_unsupported_metric(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    queries = _queries(vecs)
    assigned, centers = S.ivf_build(vecs, n_clusters=4)
    radii = S.ivf_cell_stats(assigned, centers)
    import pytest

    with pytest.raises(ValueError, match="l2"):
        S.range_search_ivf(assigned, centers, radii, queries, 0.5, metric="cosine")


def test_filtered_knn_prefilter_exact(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    queries = _queries(vecs)
    dec = {}
    got = filtered_knn(
        vecs, queries, k=5, predicate=F.col("label") == 3, decision_out=dec
    )
    assert dec["path"] == "prefilter_exact"
    want = knn_exact(vecs.where(F.col("label") == 3), queries, k=5)
    gs = [(r.query_id, r.vec_id, r.rank) for r in got.orderBy("query_id", "rank").collect()]
    ws = [(r.query_id, r.vec_id, r.rank) for r in want.orderBy("query_id", "rank").collect()]
    assert gs == ws and len(gs) > 0
    # every returned vec satisfies the predicate
    bad = got.join(vecs.where(F.col("label") != 3).select("vec_id"), "vec_id", "leftsemi")
    assert bad.count() == 0


def test_filtered_knn_index_postfilter_recall(spark, sf_dir):
    from hawk_pack_spark.operators.hnsw import build_index

    vecs = _vectors(spark, sf_dir)
    queries = _queries(vecs, n=6)
    # broad predicate (~2/3 of rows) → the index post-filter path
    pred = F.col("label") % 3 != 0
    index = build_index(vecs.select("vec_id", "embedding"), num_shards=2)
    dec = {}
    got = filtered_knn(
        vecs, queries, k=5, predicate=pred, index_df=index,
        selective_fraction=0.10, decision_out=dec,
    )
    assert dec["path"] == "index_postfilter"
    assert dec["selectivity"] > 0.10
    rows = got.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    # every query gets exactly k rows (over-fetch + exact fallback fills)
    assert all(len(v) == 5 for v in per_q.values()) and len(per_q) == 6
    # all results satisfy the predicate
    allowed = {r.vec_id for r in vecs.where(pred).select("vec_id").collect()}
    assert all(r.vec_id in allowed for r in rows)
    # recall vs filtered exact
    want = knn_exact(vecs.where(pred), queries, k=5)
    ws = {(r.query_id, r.vec_id) for r in want.collect()}
    gs = {(r.query_id, r.vec_id) for r in rows}
    assert len(gs & ws) / len(ws) >= 0.9
