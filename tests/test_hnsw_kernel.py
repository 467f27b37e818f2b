"""Unit tests for the numpy HNSW kernel (no Spark — milliseconds).

Replicates the reference's test strategy (SURVEY.md §5): seeded
determinism, self-recall E2E, dedup via is_match, entry monotonicity.
"""

from __future__ import annotations

import numpy as np
import pytest

from hawk_pack_spark.config import HawkParams, layer_probability_from_m_l, m_l_from_layer_probability
from hawk_pack_spark.operators import _hnsw_kernel as K


def test_param_formulas():
    p = HawkParams.new(64, 32, 32)
    assert p.M == 32 and p.get_M_max(0) == 64 and p.get_M_max(1) == 32
    assert abs(p.m_L - 1 / np.log(32)) < 1e-12
    # inverse pair (reference hawk_searcher.rs:80-94)
    assert abs(m_l_from_layer_probability(layer_probability_from_m_l(p.m_L)) - p.m_L) < 1e-12
    # clamped beyond N_PARAM_LAYERS
    assert p.get_M(99) == 32 and p.get_ef_search(99) == 1


def test_layer_assignment_distribution():
    ids = np.arange(100_000, dtype=np.int64)
    u = K.uniform_from_ids(ids)
    layers = K.assign_layer(u, HawkParams.new(M=32).m_L)
    # geometric with p = 1/32: ~96.9% at layer 0
    frac0 = (layers == 0).mean()
    assert 0.95 < frac0 < 0.98
    assert layers.min() == 0
    # deterministic under permutation
    perm = np.random.permutation(ids)
    assert (K.uniform_from_ids(perm) == u[perm]).all()


def test_popcount():
    x = np.array([0, 1, 3, (1 << 63) | 1, 2**64 - 1], dtype=np.uint64)
    assert K.popcount64(x).tolist() == [0, 1, 2, 2, 64]


def _build_codes(n=199, params=None):
    ids = np.arange(n, dtype=np.int64)
    data = ids.astype(np.uint64)  # codes = consecutive ints, like the reference bench
    params = params or HawkParams.new(64, 32, 32)
    return ids, data, K.build_local(ids, data, "hamming", params)


def test_self_recall_hamming_199():
    """The reference's flagship E2E (hawk_searcher.rs:441-479): insert 199
    u64 codes, search each at k=1, every query must match itself."""
    ids, data, index = _build_codes(199)
    for i in range(199):
        res = index.search(i, 1)
        assert res and res[0][1] == i and res[0][0] == 0.0, f"query {i}: {res}"
        assert index.is_match(i, 0.0)


def test_knn_recall_vs_bruteforce_l2():
    rng = np.random.default_rng(42)
    data = rng.standard_normal((500, 32))
    ids = np.arange(500, dtype=np.int64)
    index = K.build_local(ids, data, "l2_sq", HawkParams.new(64, 64, 16))
    hits = total = 0
    for q in range(0, 100):
        got = {n for _, n in index.search(q, 10)}
        d = ((data - data[q]) ** 2).sum(axis=1)
        truth = set(np.argsort(d, kind="stable")[:10].tolist())
        hits += len(got & truth)
        total += 10
    assert hits / total > 0.95, f"recall {hits/total}"


def test_entry_monotonicity():
    ids, data, index = _build_codes(10)
    with pytest.raises(ValueError):
        index.set_entry_point(0, index.entry_layer)  # same layer must fail


def test_degree_bounds():
    params = HawkParams.new(64, 32, 8)
    ids = np.arange(300, dtype=np.int64)
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2**63, 300).astype(np.uint64)
    index = K.build_local(ids, data, "hamming", params)
    for lc, nodes in index.adj.items():
        bound = params.get_M_max(lc)
        for node, nbrs in nodes.items():
            assert len(nbrs) <= bound, f"layer {lc} node {node}: {len(nbrs)} > {bound}"
            dists = [d for d, _ in nbrs]
            assert dists == sorted(dists)


def test_roundtrip_through_arrays():
    """Persist → rehydrate must preserve search behavior and entry rule."""
    ids, data, index = _build_codes(50)
    e_layer, e_dst, e_dist = K.adjacency_arrays(index, ids)
    back = K.index_from_arrays(ids, data, "hamming", HawkParams.new(64, 32, 32),
                               e_layer, e_dst, e_dist)
    assert back.entry_layer == index.entry_layer
    assert back.entry == index.entry
    for q in range(50):
        assert index.search(q, 3) == back.search(q, 3)


def test_roundtrip_lone_high_layer_node():
    """A node alone on a new top layer has EMPTY queues there (padded per
    hawk_searcher.rs:380-386), so it has no adjacency at that layer; the
    stored per-node layer column must still restore the exact entry point
    and num_layers across persist → rehydrate (graph_mem.rs:86-98)."""
    params = HawkParams.new(64, 32, 8)
    ids = np.arange(30, dtype=np.int64)
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2**63, 30).astype(np.uint64)
    layers = K.assign_layer(K.uniform_from_ids(ids), params.m_L)
    # force one node far above everything: empty top-layer queue guaranteed
    layers[13] = int(layers.max()) + 3
    index = K.build_local(ids, data, "hamming", params, layers=layers)
    assert index.entry == 13 and index.entry_layer == layers[13]

    e_layer, e_dst, e_dist = K.adjacency_arrays(index, ids)
    back = K.index_from_arrays(ids, data, "hamming", params,
                               e_layer, e_dst, e_dist, layers=layers)
    assert back.entry == index.entry
    assert back.entry_layer == index.entry_layer
    assert back.num_layers() == index.num_layers()
    for q in range(30):
        assert index.search(q, 3) == back.search(q, 3)


def test_is_match_dedup():
    """LinearDb-style dedup via HNSW is_match (linear_db.rs:43-52)."""
    ids, data, index = _build_codes(20)
    # staged duplicate of code 7 at local index 20
    data2 = np.concatenate([data, np.array([7], dtype=np.uint64)])
    index2 = K.LocalHNSW(K.Metric("hamming", data2), index.params)
    index2.adj, index2.entry, index2.entry_layer = index.adj, index.entry, index.entry_layer
    assert index2.is_match(20, 0.0)
    # a fresh code far from everything is not a match
    data3 = np.concatenate([data, np.array([0xFFFF_FFFF_0000_0000], dtype=np.uint64)])
    index3 = K.LocalHNSW(K.Metric("hamming", data3), index.params)
    index3.adj, index3.entry, index3.entry_layer = index.adj, index.entry, index.entry_layer
    assert not index3.is_match(20, 0.0)


def test_neighbor_heuristic_keeps_clustered_graph_connected():
    """Near-duplicate clusters + scattered points: the reference's
    M-nearest trim lets each tight cluster capture every edge slot,
    stranding scattered vectors (observed with real multimodal
    features). Algorithm 4 neighbor selection must keep every vector
    reachable — 100% self-recall — while the default path stays
    reference-faithful."""
    import numpy as np

    from hawk_pack_spark.config import HawkParams
    from hawk_pack_spark.operators import _hnsw_kernel as K

    rng = np.random.default_rng(17)
    clusters = []
    for c in range(3):  # 3 tight clusters of 60 near-identical vectors
        center = rng.standard_normal(16) * 5
        clusters.append(center + rng.standard_normal((60, 16)) * 1e-3)
    scattered = rng.standard_normal((20, 16)) * 5
    data = np.vstack(clusters + [scattered])
    ids = np.arange(len(data))
    params = HawkParams.new(16, 16, 8)

    index = K.build_local(ids, data, "cosine", params, neighbor_heuristic=True)
    misses = sum(
        1 for i in range(len(data))
        if not (res := index.search(int(i), 1)) or res[0][1] != i
    )
    assert misses == 0, f"{misses} unreachable vectors with heuristic"

    # degree bounds still hold under heuristic selection
    for lc, nodes in index.adj.items():
        for node, nbrs in nodes.items():
            assert len(nbrs) <= params.get_M_max(lc)


def test_frozen_rehydration_searches_identically():
    """frozen=True (CSR, search-only) must return byte-identical search
    results to the dict-form rehydration at every k/ef — the serving
    paths run frozen, the mutation paths run dict, and they must agree."""
    import numpy as np

    from hawk_pack_spark.config import HawkParams
    from hawk_pack_spark.operators import _hnsw_kernel as K

    params = HawkParams.new(32, 16, 8)
    n, dim = 700, 24
    rng = np.random.default_rng(7)
    data = rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64) * 3 + 11
    built = K.build_local(ids, data, "l2_sq", params)
    la, ds, di = K.adjacency_arrays(built, ids)
    node_layers = np.array(
        [max([lc for lc in built.adj if loc in built.adj[lc]], default=0)
         for loc in range(n)],
        dtype=np.int32,
    )
    q = rng.standard_normal((40, dim))
    full = np.vstack([data, q])
    slow = K.index_from_arrays(
        ids, full, "l2_sq", params, la, ds, di, layers=node_layers
    )
    fast = K.index_from_arrays(
        ids, full, "l2_sq", params, la, ds, di, layers=node_layers, frozen=True
    )
    assert fast.entry == slow.entry and fast.entry_layer == slow.entry_layer
    for j in range(40):
        for k in (1, 5, 10):
            assert fast.search(n + j, k, None) == slow.search(n + j, k, None)
    # frozen requires layers (entry cannot be derived from CSR presence)
    import pytest

    with pytest.raises(ValueError, match="layers"):
        K.index_from_arrays(ids, full, "l2_sq", params, la, ds, di, frozen=True)
    # the whole-shard error contract survives the vectorized path
    bad_ds = [list(x) for x in ds]
    for x in bad_ds:
        if x:
            x[0] = 10**9  # id not in this slice
            break
    with pytest.raises(ValueError, match="whole\\s+shard|whole shard"):
        K.index_from_arrays(
            ids, full, "l2_sq", params, la, bad_ds, di, layers=node_layers,
            frozen=True,
        )
