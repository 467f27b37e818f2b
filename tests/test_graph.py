"""Triangle counting + co-purchase mining vs local references."""

from __future__ import annotations

import itertools

import numpy as np

from hawk_pack_spark.operators.graph import copurchase_pairs, triangle_count


def _local_triangles(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n = 0
    for u, v in edges:
        n += len(adj[u] & adj[v])
    return n // 3  # each triangle seen from its 3 edges


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles; adding a pendant vertex changes nothing
    k4 = list(itertools.combinations(range(4), 2)) + [(3, 9)]
    df = spark.createDataFrame(k4, "a long, b long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4
    # triangle-free bipartite graph
    bip = [(i, 10 + j) for i in range(3) for j in range(3)]
    df2 = spark.createDataFrame(bip, "a long, b long")
    assert triangle_count(df2).collect()[0]["n_triangles"] == 0


def test_triangle_count_random_graph_vs_local(spark):
    rng = np.random.default_rng(3)
    edges = {
        tuple(sorted((int(p[0]), int(p[1]))))
        for p in rng.integers(0, 40, (300, 2))
        if p[0] != p[1]
    }
    edges = sorted(edges)
    df = spark.createDataFrame(edges, "a long, b long")
    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == _local_triangles(edges)
    # skew robustness: add a hub connected to everyone — local ref again
    hub = [(100, i) for i in range(40)]
    all_e = edges + hub
    df3 = spark.createDataFrame(all_e, "a long, b long")
    assert (
        triangle_count(df3).collect()[0]["n_triangles"]
        == _local_triangles(all_e)
    )


def test_copurchase_pairs_support(spark):
    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"), (3, "z"),
        (4, "z"), (4, "w"),
        (5, "x"), (5, "x"),  # duplicate item in one basket counts once
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in copurchase_pairs(df, "basket", "item", min_support=2).collect()
    }
    assert got == {("x", "y"): 3, ("x", "z"): 2, ("y", "z"): 2}


def test_pagerank_matches_local_power_iteration(spark):
    from hawk_pack_spark.operators.graph import pagerank

    # small directed graph, every node with out-degree >= 1
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()
    }
    # local reference: identical recurrence
    nodes = sorted({u for e in edges for u in e})
    out = {u: [v for a, v in edges if a == u] for u in nodes}
    r = {u: 1.0 for u in nodes}
    for _ in range(10):
        c = {u: 0.0 for u in nodes}
        for u in nodes:
            for v in out[u]:
                c[v] += r[u] / len(out[u])
        r = {u: (1.0 - 0.85) + 0.85 * c[u] for u in nodes}
    assert set(got) == set(nodes)
    for u in nodes:
        assert abs(got[u] - r[u]) < 1e-9
    # hub dominance sanity: node 0 and 1 receive more than the base
    assert got[0] > 0.16 and got[1] > 0.16


def test_pagerank_checkpoint_identical(spark):
    from hawk_pack_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = {r["node"]: r["rank"] for r in pagerank(df, iters=9).collect()}
    ckpt = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=9, checkpoint_every=3).collect()
    }
    assert plain == ckpt  # bit-identical: only the plan is truncated


def test_pagerank_loop_invariants_scanned_once(spark, tmp_path):
    """VERDICT r7 #2: before the fix, a 5-iteration plan over a parquet
    edge list held 32 FileScans (edges⋈degree, degree, and the distinct
    node set all re-derived inside every iteration). After the eager
    localCheckpoint of the two loop invariants, the returned plan must
    contain ZERO parquet scans — the base table is read exactly twice,
    at checkpoint time, independent of the iteration count."""
    from hawk_pack_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3), (3, 1)]
    path = str(tmp_path / "edges.parquet")
    spark.createDataFrame(edges, "src long, dst long").write.parquet(path)
    df = spark.read.parquet(path)

    plan = (
        pagerank(df, iters=5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Relation" not in plan or "parquet" not in plan.lower(), plan
    # every iteration joins against the checkpointed RDDs, nothing else
    assert plan.count("LogicalRDD") >= 2
    assert "parquet" not in plan.lower()
