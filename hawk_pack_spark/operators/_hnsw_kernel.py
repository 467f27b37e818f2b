"""Partition-local HNSW kernel: pure numpy, runs inside applyInPandas.

Implements the HNSW algorithm (Malkov & Yashunin 2016, arXiv:1603.09320,
cited by the reference's README) for one index shard held in memory.
Semantics follow the reference engine (SURVEY.md §2.4): best-first beam
search with a visited set and early exit; insertion trims forward edges
to M and back-edges to M_max (2M at layer 0); the entry point only moves
to a strictly higher layer; queries and vectors share one ID space.

This file is deliberately Spark-free: plain numpy in / numpy out, so it
unit-tests in milliseconds and the Spark layer (operators/hnsw.py) stays
a thin orchestration shell.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from hawk_pack_spark.config import HawkParams

_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

# user-registered eval_distance_batch kernels (functions/distance.py::
# register_metric — the VectorStore-trait plug-in point). Keyed by metric
# name; signature (data (n, dim) float64, q_idx, cand) -> list[float].
CUSTOM_BATCH: dict = {}


def popcount64(arr: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no bitwise_count)."""
    return _POPCOUNT_LUT[arr.view(np.uint8).reshape(-1, 8)].sum(axis=1)


class Metric:
    """Batch distance evaluator: one query against many stored vectors —
    the shape of the reference's ``eval_distance_batch`` hot path.

    Candidate batches inside beam search are tiny (≤ M_max), where numpy
    per-call overhead dominates — so hamming runs on native Python ints
    (3.11's C-level ``int.bit_count``), ~5× faster at this batch size;
    float metrics stay vectorized. Returns plain lists."""

    def __init__(self, name: str, data: np.ndarray):
        self.name = name
        self.data = data  # (n, dim) float64 for l2/cosine; (n,) uint64 for hamming
        self.size = len(data)
        if name == "hamming":
            self._ints: list[int] = data.tolist()
        if name == "cosine":
            norms = np.linalg.norm(data, axis=1)
            norms[norms == 0.0] = 1.0
            self._unit = data / norms[:, None]

    def batch(self, q_idx: int, cand) -> list[float]:
        if self.name == "hamming":
            ints = self._ints
            qv = ints[q_idx]
            return [float((ints[c] ^ qv).bit_count()) for c in cand]
        if self.name == "l2_sq":
            diff = self.data[cand] - self.data[q_idx]
            return np.einsum("ij,ij->i", diff, diff).tolist()
        if self.name == "cosine":
            return (1.0 - self._unit[cand] @ self._unit[q_idx]).tolist()
        if self.name == "dot":
            # distance = negative inner product (functions/distance.py
            # METRICS["dot"]) so less_than stays the native <
            return (-(self.data[cand] @ self.data[q_idx])).tolist()
        if self.name in CUSTOM_BATCH:
            return CUSTOM_BATCH[self.name](self.data, q_idx, list(cand))
        raise KeyError(f"unknown metric {self.name!r}")


class LocalHNSW:
    """One in-memory HNSW graph over local indices 0..n-1."""

    def __init__(
        self,
        metric: Metric,
        params: HawkParams,
        neighbor_heuristic: bool = True,
    ):
        self.metric = metric
        self.params = params
        # Algorithm 4 neighbor selection (Malkov & Yashunin 2016) with
        # keepPrunedConnections backfill is the DEFAULT since r9. The
        # reference trims to the M NEAREST (connect_bidir), which on
        # near-duplicate-clustered data lets a tight cluster capture all
        # M slots and partitions the graph into unreachable islands —
        # observed three times (multimodal features r2, the sf1 rebuild
        # fixture r8, and a Hypothesis counterexample where layer 0
        # reached only 10 of 21 nodes, breaking self-recall; pinned in
        # tests/test_properties.py). The heuristic keeps
        # direction-diverse edges instead, restoring the self-recall
        # guarantee the reference's own flagship test asserts
        # (hawk_searcher.rs:441-479). Pass False for strict
        # reference connect_bidir parity (safe only on uniform-ish,
        # cluster-free data).
        self.neighbor_heuristic = neighbor_heuristic
        # adjacency: layer -> node -> ascending [(dist, nbr), ...]
        self.adj: dict[int, dict[int, list[tuple[float, int]]]] = {}
        # frozen search-only overlay: layer -> (indptr, nbrs) CSR with
        # neighbors dist-ascending per node. Search never reads stored
        # edge distances, so a rehydrated serving index can skip
        # materializing the per-node tuple lists entirely (the measured
        # hot cost of index_from_arrays). Mutation paths require adj.
        self.csr: dict[int, tuple[np.ndarray, np.ndarray]] | None = None
        self.entry: int | None = None
        self.entry_layer: int = -1

    # -- storage-facing ----------------------------------------------------
    def num_layers(self) -> int:
        return self.entry_layer + 1

    def neighbors(self, lc: int, node: int) -> list[tuple[float, int]]:
        """get_links semantics: missing key → empty (graph_mem.rs:100-111)."""
        return self.adj.get(lc, {}).get(node, [])

    def set_entry_point(self, node: int, layer: int) -> None:
        """Monotonicity contract: a new entry point must sit on a higher
        layer (graph_mem.rs:86-91)."""
        if layer <= self.entry_layer:
            raise ValueError(
                f"entry point layer must increase ({layer} <= {self.entry_layer})"
            )
        self.entry, self.entry_layer = node, layer

    # -- search ------------------------------------------------------------
    def search_layer(
        self, q_idx: int, entry_points: list[tuple[float, int]], ef: int, lc: int
    ) -> list[tuple[float, int]]:
        """Best-first beam search in one layer. entry_points are (dist,
        node) seeds; returns ascending (dist, node), at most ef.

        The visited set is a bytearray indexed by node (O(1) membership,
        no hashing) — the hot line of the whole kernel."""
        visited = bytearray(self.metric.size)
        for _, n in entry_points:
            visited[n] = 1
        # C: nearest-first candidate heap; W: beam as max-heap via negation
        cand = list(entry_points)
        heapq.heapify(cand)
        beam = [(-d, n) for d, n in entry_points]
        heapq.heapify(beam)
        while len(beam) > ef:
            heapq.heappop(beam)
        csr = self.csr.get(lc) if self.csr is not None else None
        layer_adj = self.adj.get(lc) if csr is None else None
        vis_np = np.frombuffer(visited, dtype=np.uint8) if csr is not None else None
        while cand:
            c_dist, c_node = heapq.heappop(cand)
            if c_dist > -beam[0][0]:
                break  # nearest candidate is beyond the beam's furthest
            if csr is not None:
                indptr, flat = csr
                sl = flat[indptr[c_node]:indptr[c_node + 1]]
                if len(sl) == 0:
                    continue
                nbrs_arr = sl[vis_np[sl] == 0]
                if len(nbrs_arr) == 0:
                    continue
                vis_np[nbrs_arr] = 1
                nbrs = nbrs_arr.tolist()
            else:
                lst = layer_adj.get(c_node) if layer_adj else None
                if not lst:
                    continue
                nbrs = []
                for _, nb in lst:
                    if not visited[nb]:
                        visited[nb] = 1
                        nbrs.append(nb)
                if not nbrs:
                    continue
            dists = self.metric.batch(q_idx, nbrs)
            for d, n in zip(dists, nbrs):
                if len(beam) < ef:
                    heapq.heappush(beam, (-d, n))
                    heapq.heappush(cand, (d, n))
                elif d < -beam[0][0]:
                    heapq.heapreplace(beam, (-d, n))
                    heapq.heappush(cand, (d, n))
        return sorted((-nd, n) for nd, n in beam)

    def _descend(
        self, q_idx: int, from_layer: int, to_layer: int, ef_for_layer
    ) -> list[tuple[float, int]]:
        """Greedy/beam descent from from_layer down to to_layer (exclusive
        bound below), carrying the beam between layers."""
        d0 = float(self.metric.batch(q_idx, [self.entry])[0])
        w = [(d0, self.entry)]
        for lc in range(from_layer, to_layer, -1):
            w = self.search_layer(q_idx, w, ef_for_layer(lc), lc)
        return w

    def search(self, q_idx: int, k: int, ef_search: int | None = None) -> list[tuple[float, int]]:
        """kNN query: greedy upper layers, beam ef_search at layer 0."""
        if self.entry is None:
            return []
        p = self.params
        w = self._descend(q_idx, self.entry_layer, 0, lambda lc: p.get_ef_search(lc))
        ef0 = max(ef_search or p.get_ef_search(0), k)
        w = self.search_layer(q_idx, w, ef0, 0)
        return w[:k]

    # -- insert ------------------------------------------------------------
    def insert(self, q_idx: int, insertion_layer: int) -> None:
        """Full insert: two-phase (search then connect), like the
        reference's search_to_insert + insert_from_search_results split."""
        per_layer = self.search_to_insert(q_idx, insertion_layer)
        self.insert_from_search_results(q_idx, insertion_layer, per_layer)

    def search_to_insert(
        self, q_idx: int, insertion_layer: int
    ) -> list[list[tuple[float, int]]]:
        """Phase 1: candidate neighbor queues for layers 0..insertion_layer
        (index = layer). Empty lists pad layers above the current top."""
        p = self.params
        if self.entry is None:
            return [[] for _ in range(insertion_layer + 1)]
        L = self.entry_layer
        w = self._descend(
            q_idx, L, min(L, insertion_layer), lambda lc: p.get_ef_constr_search(lc)
        )
        out: list[list[tuple[float, int]]] = []
        for lc in range(min(L, insertion_layer), -1, -1):
            w = self.search_layer(q_idx, w, p.get_ef_constr_insert(lc), lc)
            out.append(list(w))
        out.reverse()  # now out[lc] = candidates at layer lc
        while len(out) <= insertion_layer:
            out.append([])  # new top layers have no neighbors yet
        return out

    def insert_from_search_results(
        self,
        q_idx: int,
        insertion_layer: int,
        per_layer: list[list[tuple[float, int]]],
    ) -> None:
        """Phase 2: connect bidirectionally per layer; move the entry point
        only if the insertion created a higher layer."""
        p = self.params
        for lc in range(min(insertion_layer, len(per_layer) - 1), -1, -1):
            self._connect_bidir(q_idx, per_layer[lc], lc)
        if insertion_layer > self.entry_layer:
            self.set_entry_point(q_idx, insertion_layer)

    def _select_neighbors(
        self, node: int, candidates: list[tuple[float, int]], m: int
    ) -> list[tuple[float, int]]:
        """Neighbor selection for `node` from distance-ascending
        `candidates`. Default (neighbor_heuristic=True): Algorithm 4 —
        keep a candidate only if it is closer to `node` than to every
        already-kept neighbor (edges span directions instead of piling
        into one tight cluster), then backfill with the remaining
        nearest (keepPrunedConnections). With neighbor_heuristic=False:
        the reference's M-nearest trim.

        The heuristic runs in FORWARD-DOMINATION form for the built-in
        (symmetric) metrics: each newly selected neighbor s marks every
        remaining candidate c with d(c,s) <= d(c,node) as dominated in
        ONE vectorized batch call — <= m batch calls over shrinking
        candidate sets instead of len(candidates) calls of size <= m.
        Output is identical to the per-candidate scan (same predicate,
        same ascending order); custom registered metrics may be
        asymmetric, so they keep the d(c, selected) orientation."""
        if not self.neighbor_heuristic or len(candidates) <= m:
            return candidates[:m]
        selected: list[tuple[float, int]] = []
        if self.metric.name in ("hamming", "l2_sq", "cosine", "dot"):
            alive = list(candidates)
            while alive and len(selected) < m:
                d_s, s = alive[0]
                selected.append((d_s, s))
                rest = alive[1:]
                if not rest:
                    break
                d_to_s = self.metric.batch(s, [c for _, c in rest])
                alive = [
                    rc for rc, dcs in zip(rest, d_to_s) if rc[0] < dcs
                ]
        else:
            for d, c in candidates:
                if len(selected) >= m:
                    break
                sel_ids = [s for _, s in selected]
                if not sel_ids or all(
                    d < dcs for dcs in self.metric.batch(c, sel_ids)
                ):
                    selected.append((d, c))
        if len(selected) < m:
            kept = {c for _, c in selected}
            for d, c in candidates:
                if len(selected) >= m:
                    break
                if c not in kept:
                    selected.append((d, c))
            selected.sort()
        return selected

    def _connect_bidir(
        self, q_idx: int, candidates: list[tuple[float, int]], lc: int
    ) -> None:
        p = self.params
        chosen = self._select_neighbors(q_idx, candidates, p.get_M(lc))
        layer = self.adj.setdefault(lc, {})
        layer[q_idx] = list(chosen)
        m_max = p.get_M_max(lc)
        for d, n in chosen:
            q = layer.get(n, [])
            # ordered insert, then degree-bound trim (connect_bidir)
            q.append((d, q_idx))
            q.sort()
            if len(q) > m_max:
                q[:] = self._select_neighbors(n, q, m_max)
            layer[n] = q

    def is_match(self, q_idx: int, threshold: float = 0.0) -> bool:
        """Duplicate probe: nearest bottom-layer neighbor within threshold
        (reference hawk_searcher.rs:417-429); empty graph → False."""
        res = self.search(q_idx, 1)
        return bool(res) and res[0][0] <= threshold


# ---------------------------------------------------------------------------
# deterministic layer assignment


def assign_layer(u: np.ndarray, m_l: float) -> np.ndarray:
    """Geometric layer from uniform(0,1]: floor(-ln(u) * m_L) — the
    standard HNSW sample, vectorized. u must avoid exact 0."""
    return np.floor(-np.log(u) * m_l).astype(np.int32)


def uniform_from_ids(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    """Deterministic per-id uniform in (0,1]: splitmix64 of (id ^ seed).
    Stable under any partitioning / insertion batching."""
    offset = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    x = ids.astype(np.uint64) + offset
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x.astype(np.float64) + 1.0) / 18446744073709551616.0


def build_local(
    ids: np.ndarray,
    data: np.ndarray,
    metric_name: str,
    params: HawkParams,
    layers: np.ndarray | None = None,
    seed: int = 42,
    neighbor_heuristic: bool = True,
) -> LocalHNSW:
    """Build one shard's index by sequential insertion in id order (the
    reference engine is serial by design; order fixed for determinism).

    neighbor_heuristic defaults True (Algorithm 4): connectivity-safe on
    clustered/near-dup data; False = strict reference connect_bidir."""
    order = np.argsort(ids, kind="stable")
    metric = Metric(metric_name, data)
    index = LocalHNSW(metric, params, neighbor_heuristic=neighbor_heuristic)
    if layers is None:
        layers = assign_layer(uniform_from_ids(ids, seed), params.m_L)
    if _try_native_build(
        index, data, metric_name, layers, order, params, neighbor_heuristic
    ):
        return index
    for pos in order.tolist():
        index.insert(int(pos), int(layers[pos]))
    return index


def _try_native_build(
    index: LocalHNSW,
    data: np.ndarray,
    metric_name: str,
    layers: np.ndarray,
    order: np.ndarray,
    params: HawkParams,
    neighbor_heuristic: bool,
) -> bool:
    """Populate ``index`` from the gcc-compiled build kernel (same
    algorithm, same tie-breaking — see operators/_native.py). Returns
    False when the native path is unavailable, leaving the caller on
    the pure-Python insert loop above. The reconstructed ``adj``
    replicates the Python kernel's dict layout exactly: layer keys in
    creation order (descending runs as the top layer rises), node keys
    in insertion order, every (node, lc <= node_layer) entry present
    even when its queue is empty (to_links emits those rows), neighbor
    lists (dist, local) ascending — so adjacency_arrays() output is
    byte-for-byte the order the Python insert loop would produce."""
    from hawk_pack_spark.operators import _native as NAT

    if len(layers) == 0 or not NAT.usable(metric_name, params):
        return False
    res = NAT.build(data, metric_name, layers, order, params, neighbor_heuristic)
    if res is None:
        return False
    e_node, e_layer, e_dst, e_dist, entry, entry_layer = res
    order_l = order.tolist()
    adj = index.adj
    top = -1
    for pos in order_l:
        node_l = int(layers[pos])
        if node_l > top:
            for lc in range(node_l, top, -1):
                adj[lc] = {}
            top = node_l
    for pos in order_l:
        for lc in range(int(layers[pos]), -1, -1):
            adj[lc][pos] = []
    en = e_node.tolist()
    el = e_layer.tolist()
    ed = e_dst.tolist()
    edist = e_dist.tolist()
    for i in range(len(en)):
        adj[el[i]][en[i]].append((edist[i], ed[i]))
    if entry >= 0:
        index.entry, index.entry_layer = int(entry), int(entry_layer)
    return True


def adjacency_arrays(index: LocalHNSW, ids: np.ndarray):
    """Flatten the graph to per-node parallel arrays (e_layer, e_dst,
    e_dist) in GLOBAL ids — the Arrow-friendly index storage layout."""
    n = len(ids)
    out_layers: list[list[int]] = [[] for _ in range(n)]
    out_dsts: list[list[int]] = [[] for _ in range(n)]
    out_dists: list[list[float]] = [[] for _ in range(n)]
    for lc, nodes in index.adj.items():
        for node, nbrs in nodes.items():
            for d, nbr in nbrs:
                out_layers[node].append(lc)
                out_dsts[node].append(int(ids[nbr]))
                out_dists[node].append(float(d))
    return out_layers, out_dsts, out_dists


def index_from_arrays(
    ids: np.ndarray,
    data: np.ndarray,
    metric_name: str,
    params: HawkParams,
    e_layers: list,
    e_dsts: list,
    e_dists: list,
    layers: np.ndarray | None = None,
    neighbor_heuristic: bool = True,
    frozen: bool = False,
) -> LocalHNSW:
    """Rehydrate a LocalHNSW from stored parallel-array adjacency (global
    ids → local indices).

    ``layers`` is the stored per-node assigned max layer (the index
    DataFrame's ``layer`` column). The entry point is the lowest id at
    the max stored layer — the build's monotone rule exactly, so a node
    alone on a new top layer (whose queues there are empty and therefore
    absent from adjacency, per hawk_searcher.rs:380-386 padding) keeps
    its layer across a round-trip. Without ``layers`` (legacy callers)
    the layer is derived from adjacency presence, which can under-report
    exactly that case.

    ``frozen=True`` builds a SEARCH-ONLY index: adjacency stays in
    numpy CSR form (one indptr/nbrs pair per layer, dist-ascending per
    node) and the per-node tuple lists — the measured hot cost of
    rehydration — are never materialized. The serving search paths use
    this; anything that mutates or re-serializes the graph (insert,
    delete/repair, to_links) needs the default dict form. Requires
    ``layers`` (the entry point cannot be derived from CSR presence)."""
    metric = Metric(metric_name, data)
    index = LocalHNSW(metric, params, neighbor_heuristic=neighbor_heuristic)
    # Vectorized rehydration (the serving hot path: measured 74ms/shard
    # interpreted vs ~6ms of actual searching at the 10M-ladder shape).
    # Flatten the per-node ragged adjacency, map global→local ids with
    # one searchsorted, lexsort by (layer, src, dist, dst) and slice the
    # groups back into the kernel's sorted neighbor lists.
    n_nodes = len(ids)
    lens = np.fromiter((len(x) for x in e_dsts), dtype=np.int64, count=n_nodes)
    total = int(lens.sum())
    if total:
        flat_src = np.repeat(np.arange(n_nodes, dtype=np.int64), lens)
        flat_lay = np.concatenate([np.asarray(x, dtype=np.int64) for x in e_layers if len(x)])
        flat_dst = np.concatenate([np.asarray(x, dtype=np.int64) for x in e_dsts if len(x)])
        flat_dist = np.concatenate([np.asarray(x, dtype=np.float64) for x in e_dists if len(x)])
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        pos = np.searchsorted(sorted_ids, flat_dst)
        ok = (pos < n_nodes) & (sorted_ids[np.minimum(pos, n_nodes - 1)] == flat_dst)
        if not bool(ok.all()):
            bad = int(flat_dst[~ok][0])
            raise ValueError(
                f"edge destination vec_id={bad} is not in this slice "
                "of the index: the partition does not contain its whole "
                "shard. Index partitions must hold complete shards — after "
                "reading a saved index from parquet (file-split "
                "partitions), repartition(num_shards, 'shard') before "
                "searching."
            )
        flat_dst_local = order[pos]
        perm = np.lexsort((flat_dst_local, flat_dist, flat_src, flat_lay))
        flat_lay = flat_lay[perm]
        flat_src = flat_src[perm]
        flat_dist = flat_dist[perm]
        flat_dst_local = flat_dst_local[perm]
        if frozen:
            if layers is None:
                raise ValueError("frozen=True requires the stored layers column")
            index.csr = {}
            for lc in np.unique(flat_lay).tolist():
                m = flat_lay == lc
                counts = np.bincount(flat_src[m], minlength=n_nodes)
                indptr = np.zeros(n_nodes + 1, dtype=np.int64)
                np.cumsum(counts, out=indptr[1:])
                index.csr[int(lc)] = (indptr, flat_dst_local[m])
        else:
            # group boundaries on the (layer, src) composite
            key = flat_lay * n_nodes + flat_src
            starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
            bounds = np.r_[starts, total]
            d_list = flat_dist.tolist()
            l_list = flat_dst_local.tolist()
            for gi in range(len(starts)):
                a, b = bounds[gi], bounds[gi + 1]
                index.adj.setdefault(int(flat_lay[a]), {})[int(flat_src[a])] = list(
                    zip(d_list[a:b], l_list[a:b])
                )
    elif frozen:
        if layers is None:
            raise ValueError("frozen=True requires the stored layers column")
        index.csr = {}
    top_layer, entry = -1, None
    for local in range(len(ids)):
        if layers is not None:
            node_top = int(layers[local])
        else:
            # a node "is on" layer lc if it has a queue there (layer 0 holds all)
            node_top = max([lc for lc in index.adj if local in index.adj[lc]], default=0)
        gid = int(ids[local])
        if node_top > top_layer or (node_top == top_layer and (entry is None or gid < entry[1])):
            top_layer, entry = node_top, (local, gid)
    if entry is not None:
        index.entry, index.entry_layer = entry[0], top_layer
    return index
