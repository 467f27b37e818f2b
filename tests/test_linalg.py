"""Distributed PCA / random projection vs local numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from hawk_pack_spark.operators.linalg import (
    fit_pca,
    pca_project,
    random_project,
    random_projection_basis,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(42)
    # anisotropic data: known dominant directions
    base = rng.standard_normal((400, 6))
    scales = np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    x = base * scales + np.array([1.0, -2.0, 0.0, 3.0, 0.0, 0.5])
    rows = [(i, v.tolist()) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(5), x


def test_fit_pca_matches_local_eigh(vec_df):
    df, x = vec_df
    model = fit_pca(df, k=6)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    w_desc = w[::-1]
    assert model.n == len(x)
    np.testing.assert_allclose(model.mean, x.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(model.eigenvalues, w_desc, rtol=1e-8)
    # components match the local basis up to per-component sign
    local = v[:, ::-1].T
    dots = np.abs(np.sum(model.components * local, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)


def test_projection_variance_is_spectrum(vec_df):
    df, x = vec_df
    model = fit_pca(df, k=3)
    proj = np.array(
        [r["proj"] for r in pca_project(df, model).orderBy("vec_id").collect()]
    )
    np.testing.assert_allclose(proj.var(axis=0), model.eigenvalues, rtol=1e-8)
    # reconstruction with full rank is exact
    full = fit_pca(df, k=6)
    p = np.array(
        [r["proj"] for r in pca_project(df, full).orderBy("vec_id").collect()]
    )
    recon = p @ full.components + full.mean
    np.testing.assert_allclose(recon, x, atol=1e-8)


def test_random_projection_deterministic_and_jl(vec_df):
    df, x = vec_df
    a = np.array(
        [r["proj"] for r in random_project(df, 4, seed=11).orderBy("vec_id").collect()]
    )
    b = np.array(
        [r["proj"] for r in random_project(df, 4, seed=11).orderBy("vec_id").collect()]
    )
    np.testing.assert_array_equal(a, b)
    # the basis is the seeded closure, identical to the local one
    basis = random_projection_basis(6, 4, seed=11)
    np.testing.assert_allclose(a, x @ basis.T, atol=1e-10)
    # JL sanity: the per-seed ratio has variance ~2/out_dim (wide at
    # k=4), but its expectation is 1 — check the mean over seeds.
    d_hi = np.sum((x[:50, None] - x[None, :50]) ** 2, axis=-1).mean()
    ratios = []
    for seed in range(1, 9):
        p = x @ random_projection_basis(6, 4, seed=seed).T
        d_lo = np.sum((p[:50, None] - p[None, :50]) ** 2, axis=-1).mean()
        ratios.append(d_lo / d_hi)
    assert 0.7 < np.mean(ratios) < 1.3


def test_balanced_subspace_permutation():
    from hawk_pack_spark.operators.linalg import balanced_subspace_permutation

    v = np.array([100.0, 50.0, 10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    perm = balanced_subspace_permutation(v, m=4)
    assert sorted(perm.tolist()) == list(range(8))
    # per-bucket log-variance loads are closer than the naive split's
    loads = [np.log(v[perm[2 * i : 2 * i + 2]]).sum() for i in range(4)]
    naive = [np.log(v[2 * i : 2 * i + 2]).sum() for i in range(4)]
    assert max(loads) - min(loads) < max(naive) - min(naive)


def test_project_overwrites_existing_out_col(spark):
    """ADVICE r7: an input already carrying `out_col` used to list the
    field twice in the mapInPandas schema while the pandas frame had it
    once — a runtime arity mismatch. It must overwrite cleanly."""
    import numpy as np

    from hawk_pack_spark.operators.linalg import project

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [9.0]), (2, [3.0, 4.0], [9.0])],
        "id long, embedding array<double>, proj array<double>",
    )
    basis = np.array([[1.0, 0.0]])
    got = {r.id: r.proj for r in
           project(df, np.zeros(2), basis, "embedding", "proj").collect()}
    assert got == {1: [1.0], 2: [3.0]}
