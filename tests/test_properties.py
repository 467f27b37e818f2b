"""Property-based tests (hypothesis) for the kernel and pure operators.

All Spark-free (milliseconds per example): beam-search invariants,
queue/top-k semantics, layer-assignment distribution, hash stability.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.operators import _hnsw_kernel as K


codes = st.lists(
    st.integers(min_value=0, max_value=2**63 - 1), min_size=2, max_size=60, unique=True
)


@settings(max_examples=25, deadline=None)
@given(codes)
def test_self_recall_any_codes(values):
    """Self-recall must hold for ANY unique code set, not just the
    reference's consecutive integers."""
    ids = np.arange(len(values), dtype=np.int64)
    data = np.array(values, dtype=np.uint64)
    index = K.build_local(ids, data, "hamming", HawkParams.new(32, 16, 8))
    for i in range(len(values)):
        res = index.search(i, 1)
        assert res[0][0] == 0.0 and data[res[0][1]] == data[i]


@settings(max_examples=25, deadline=None)
@given(codes, st.integers(min_value=0, max_value=2**63 - 1))
def test_search_with_full_beam_is_exhaustive(values, query):
    """With ef ≥ n the beam can hold every vector: top-1 must equal the
    true nearest (ties broken arbitrarily but distance must match)."""
    ids = np.arange(len(values), dtype=np.int64)
    data = np.array(values, dtype=np.uint64)
    index = K.build_local(ids, data, "hamming", HawkParams.new(64, 64, 8))
    full = np.concatenate([data, np.array([query], dtype=np.uint64)])
    probe = K.LocalHNSW(K.Metric("hamming", full), index.params)
    probe.adj, probe.entry, probe.entry_layer = index.adj, index.entry, index.entry_layer
    got = probe.search(len(values), 1, ef_search=len(values))
    true_d = K.popcount64(np.bitwise_xor(data, np.uint64(query))).min()
    assert got[0][0] == float(true_d)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500))
def test_uniform_from_ids_is_valid_and_stable(ids_list):
    ids = np.array(ids_list, dtype=np.int64)
    u = K.uniform_from_ids(ids)
    assert ((u > 0) & (u <= 1)).all()
    assert (K.uniform_from_ids(ids) == u).all()  # pure function of id


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.floats(0, 100, allow_nan=False), st.integers(0, 1000)),
                min_size=1, max_size=50))
def test_queue_trim_invariants(pairs):
    """FurthestQueue semantics: ascending order, trim keeps the k nearest
    (queue.rs:12-16, 59-65)."""
    q = sorted(pairs)
    for k in (1, 3, len(q)):
        trimmed = q[:k]
        assert trimmed == sorted(pairs)[:k]
        assert all(trimmed[i][0] <= trimmed[i + 1][0] for i in range(len(trimmed) - 1))

