"""HNSW parameters — same arithmetic as the reference's param object.

Reference (src/hawk_searcher.rs):
- `HawkerParams::new(ef_constr, ef_search, M)` (:39-57): M_max = M on
  upper layers, M_max0 = 2M on layer 0, greedy ef=1 descent above the
  working layer, m_L = 1/ln(M).
- `new_uniform` (:59-78): one ef everywhere.
- `m_L_from_layer_probability` / inverse (:80-94): m_L = -1/ln(p),
  p = exp(-1/m_L).
- Per-layer getters clamp the layer index to N_PARAM_LAYERS-1 (:96-129,
  N_PARAM_LAYERS = 5 at :12-14).
- Defaults ef_constr=64, ef_search=32, M=32 (:143-149).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

N_PARAM_LAYERS = 5


def m_l_from_layer_probability(p: float) -> float:
    return -1.0 / math.log(p)


def layer_probability_from_m_l(m_l: float) -> float:
    return math.exp(-1.0 / m_l)


def _clamped(values: list, lc: int):
    """Layer-indexed lookup clamped to the last entry (reference get_val)."""
    return values[min(lc, len(values) - 1)]


@dataclass(frozen=True)
class HawkParams:
    M: int = 32
    ef_construction: int = 64
    ef_search: int = 32
    # per-layer schedules, index clamped at N_PARAM_LAYERS-1
    M_per_layer: tuple = ()
    M_max_per_layer: tuple = ()
    ef_constr_search_per_layer: tuple = ()
    ef_constr_insert_per_layer: tuple = ()
    ef_search_per_layer: tuple = ()
    m_L: float = field(default=0.0)

    @staticmethod
    def new(ef_construction: int = 64, ef_search: int = 32, M: int = 32) -> "HawkParams":
        """Standard HNSW schedule: layer 0 gets the full beam and 2M
        degree bound; upper layers run greedy (ef=1) with degree M."""
        n = N_PARAM_LAYERS
        return HawkParams(
            M=M,
            ef_construction=ef_construction,
            ef_search=ef_search,
            M_per_layer=tuple([M] * n),
            M_max_per_layer=tuple([2 * M] + [M] * (n - 1)),
            ef_constr_search_per_layer=tuple([ef_construction] + [1] * (n - 1)),
            ef_constr_insert_per_layer=tuple([ef_construction] * n),
            ef_search_per_layer=tuple([ef_search] + [1] * (n - 1)),
            m_L=1.0 / math.log(M),
        )

    @staticmethod
    def new_uniform(ef: int = 64, M: int = 32) -> "HawkParams":
        n = N_PARAM_LAYERS
        return HawkParams(
            M=M,
            ef_construction=ef,
            ef_search=ef,
            M_per_layer=tuple([M] * n),
            M_max_per_layer=tuple([2 * M] + [M] * (n - 1)),
            ef_constr_search_per_layer=tuple([ef] * n),
            ef_constr_insert_per_layer=tuple([ef] * n),
            ef_search_per_layer=tuple([ef] * n),
            m_L=1.0 / math.log(M),
        )

    @property
    def layer_probability(self) -> float:
        return layer_probability_from_m_l(self.m_L)

    def get_M(self, lc: int) -> int:
        return _clamped(list(self.M_per_layer), lc)

    def get_M_max(self, lc: int) -> int:
        return _clamped(list(self.M_max_per_layer), lc)

    def get_ef_constr_search(self, lc: int) -> int:
        return _clamped(list(self.ef_constr_search_per_layer), lc)

    def get_ef_constr_insert(self, lc: int) -> int:
        return _clamped(list(self.ef_constr_insert_per_layer), lc)

    def get_ef_search(self, lc: int) -> int:
        return _clamped(list(self.ef_search_per_layer), lc)


DEFAULT_PARAMS = HawkParams.new()
