"""Round-12 guards: the centroid-axis tile merge in _assign_top_cells
(ADVICE r11 — the 8-row floor alone can't hold the ~190 MB tile bound
past 3M cells; the centroid axis tiles too and the merged order is
pinned bit-identical to the one-tile stable argsort)."""

from __future__ import annotations

import numpy as np
import pytest


def test_assign_top_cells_centroid_tiling_identical(spark, monkeypatch):
    from hawk_pack_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    n, dim, n_cells, m = 200, 8, 50, 5
    vecs = rng.normal(size=(n, dim))
    # force exact distance ties so the (distance, id) merge order is
    # actually exercised: duplicate centroid rows
    centers = rng.normal(size=(n_cells, dim))
    centers[10] = centers[40]
    centers[3] = centers[7]
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    cl = [[float(x) for x in c] for c in centers]

    one_tile = sorted(
        map(tuple, S._assign_top_cells(df, cl, m).collect())
    )
    # shrink the budget so rows AND cells tile on this tiny input:
    # rows_per_tile = max(8, 80//50) = 8; cells_per_tile = 80//8 = 10
    monkeypatch.setattr(S, "_TILE_DOUBLES", 80)
    tiled = sorted(map(tuple, S._assign_top_cells(df, cl, m).collect()))
    assert tiled == one_tile


def test_assign_top_cells_ties_prefer_lower_cell(spark, monkeypatch):
    from hawk_pack_spark.operators import similarity as S

    # two identical centroids: every vector must rank the LOWER cell id
    # first, in both the one-tile and tiled forms
    centers = [[0.0, 0.0], [1.0, 1.0], [1.0, 1.0]]
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [0.9, 1.1])],
        "vec_id long, embedding array<double>",
    )
    for tile in (None, 4):
        if tile is not None:
            monkeypatch.setattr(S, "_TILE_DOUBLES", tile)
        out = {
            (r.vec_id, r.crank): r.cluster
            for r in S._assign_top_cells(df, centers, 2).collect()
        }
        assert out[(0, 1)] == 1 and out[(0, 2)] == 2
        assert out[(1, 1)] == 1 and out[(1, 2)] == 2


def test_exact_topm_bit_identical_to_stable_argsort():
    """_exact_topm (argpartition + tie-complete refine — the r12
    assignment-stage kernel) must match stable argsort exactly,
    including heavy planted value ties at the selection boundary."""
    import numpy as np

    from hawk_pack_spark.operators.similarity import _exact_topm

    rng = np.random.default_rng(7)
    for _ in range(40):
        rows = int(rng.integers(1, 40))
        cols = int(rng.integers(2, 300))
        m = int(rng.integers(1, 9))
        # small integer grid => frequent exact float ties
        d = rng.integers(0, 12, size=(rows, cols)).astype(np.float64)
        want = np.argsort(d, axis=1, kind="stable")[:, :m]
        assert np.array_equal(_exact_topm(d, m)[:, :m], want)
    # degenerate: ALL values tied -> indices 0..m-1
    d = np.full((3, 50), 2.5)
    assert np.array_equal(
        _exact_topm(d, 4)[:, :4], np.tile(np.arange(4), (3, 1))
    )
