"""Round-9 batch 7: personalized PageRank, clustering coefficients,
nearest-rank percentiles — closed-form checks."""

from __future__ import annotations


def _sym(spark, und):
    return spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )


def test_personalized_pagerank_localizes_mass(spark):
    from hawk_pack_spark.operators.graph import personalized_pagerank

    # two disconnected triangles; sources only in the first -> the
    # second component's rank is exactly 0.
    und = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    edges = _sym(spark, und)
    src = spark.createDataFrame([(1,)], "node long")
    r = {x.node: x.rank for x in personalized_pagerank(edges, src, iters=6).collect()}
    assert r[10] == 0.0 and r[11] == 0.0 and r[12] == 0.0
    assert r[1] > r[2] > 0  # source holds the teleport mass
    assert abs(r[2] - r[3]) < 1e-12  # symmetry


def test_personalized_pagerank_hand_rolled_iteration(spark):
    from hawk_pack_spark.operators.graph import personalized_pagerank

    und = [(1, 2), (2, 3)]
    edges = _sym(spark, und)
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        x.node: x.rank
        for x in personalized_pagerank(edges, src, iters=3, damping=0.85).collect()
    }
    # replicate r(v) = 0.15*b + 0.85*sum(r(u)/deg(u)) by hand
    deg = {1: 1, 2: 2, 3: 1}
    r = {1: 1.0, 2: 0.0, 3: 0.0}
    adj = {1: [2], 2: [1, 3], 3: [2]}
    for _ in range(3):
        nxt = {}
        for v in deg:
            c = sum(r[u] / deg[u] for u in deg if v in adj[u])
            nxt[v] = (1 - 0.85) * (1.0 if v == 1 else 0.0) + 0.85 * c
        r = nxt
    for v in r:
        assert abs(got[v] - r[v]) < 1e-12


def test_clustering_coefficient_triangle_plus_tail(spark):
    from hawk_pack_spark.operators.graph import clustering_coefficient

    # triangle 1-2-3 with a pendant 4 hanging off 1
    und = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "a long, b long"
    )
    out = {r.node: r for r in clustering_coefficient(und).collect()}
    # node 1: deg 3, 1 triangle -> cc = 2/(3*2) = 1/3
    assert out[1].degree == 3 and out[1].n_triangles == 1
    assert out[1].clustering == round(1 / 3, 6)
    assert out[2].clustering == 1.0 and out[3].clustering == 1.0
    assert 4 not in out  # degree 1 excluded


def test_clustering_coefficient_k4_all_one(spark):
    import itertools

    from hawk_pack_spark.operators.graph import clustering_coefficient

    und = spark.createDataFrame(
        list(itertools.combinations(range(4), 2)), "a long, b long"
    )
    rows = clustering_coefficient(und).collect()
    assert len(rows) == 4
    assert all(r.clustering == 1.0 and r.n_triangles == 3 for r in rows)


def test_nearest_rank_percentiles_selection(spark):
    from hawk_pack_spark.operators.analytics import nearest_rank_percentiles

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    out = {
        r.percentile: r
        for r in nearest_rank_percentiles(
            df, "v", (0, 50, 90, 100), tiebreak_col="id"
        ).collect()
    }
    assert out[0].value == 1.0 and out[0].rank == 1
    assert out[50].value == 50.0  # ceil(50*100/100) = rank 50
    assert out[90].value == 90.0
    assert out[100].value == 100.0 and out[100].n_rows == 100


def test_nearest_rank_percentiles_small_n(spark):
    from hawk_pack_spark.operators.analytics import nearest_rank_percentiles

    df = spark.createDataFrame([(1, 7.0), (2, 3.0)], "id long, v double")
    out = {
        r.percentile: r.value
        for r in nearest_rank_percentiles(
            df, "v", (0, 50, 100), tiebreak_col="id"
        ).collect()
    }
    assert out == {0: 3.0, 50: 3.0, 100: 7.0}
