"""Round-9 tail batch 2: k-core peeling, PSI drift, embedding
standardization, linear attribution — local-reference checks (the
catalog rows carry the DuckDB parity)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_k_core_peels_tendrils(spark):
    from hawk_pack_spark.operators.graph import k_core

    # K4 on {1,2,3,4} plus a path 4-5-6 hanging off it
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = _sym(spark, k4 + [(4, 5), (5, 6)])
    out = {r.node: r.degree for r in k_core(edges, k=3).collect()}
    # 5 and 6 peel (degree < 3), then 4's degree drops to 3 — K4 stays
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_cascade_requires_multiple_rounds(spark):
    from hawk_pack_spark.operators.graph import k_core

    # chain 1-2-3-4-5: 2-core is empty, but only after cascading peels
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert k_core(edges, k=2, max_iters=10).count() == 0
    # triangle survives k=2 exactly
    tri = _sym(spark, [(1, 2), (2, 3), (1, 3)])
    out = {r.node: r.degree for r in k_core(tri, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_psi_bins_matches_local_reference(spark):
    from hawk_pack_spark.operators.profile import psi_bins

    rng = np.random.default_rng(5)
    a = np.round(rng.normal(50, 10, 2000), 2)
    b = np.round(rng.normal(58, 12, 1500), 2)  # shifted: drift
    ref = spark.createDataFrame([(float(x),) for x in a], "v double")
    cur = spark.createDataFrame([(float(x),) for x in b], "v double")
    n_bins = 10
    rows = {r.bin: r for r in psi_bins(ref, cur, "v", n_bins=n_bins).collect()}
    assert sorted(rows) == list(range(n_bins))
    # local reference on exact cents
    ca = np.round(a * 100).astype(np.int64)
    cb = np.round(b * 100).astype(np.int64)
    lo, hi = ca.min(), ca.max()

    def bins(c):
        x = np.floor((c - lo) * n_bins / (hi - lo + 1)).astype(np.int64)
        return np.clip(x, 0, n_bins - 1)

    na = np.bincount(bins(ca), minlength=n_bins)
    nb = np.bincount(bins(cb), minlength=n_bins)
    psi_total = 0.0
    for i in range(n_bins):
        r = rows[i]
        assert (r.n_ref, r.n_cur) == (na[i], nb[i])
        p = (2 * na[i] + 1) / (2 * len(ca) + n_bins)
        q = (2 * nb[i] + 1) / (2 * len(cb) + n_bins)
        assert abs(r.psi_term - round((p - q) * math.log(p / q), 6)) < 1e-9
        psi_total += r.psi_term
    assert psi_total > 0.1  # the planted shift is visible drift
    # every count is represented: mass never disappears in clamping
    assert sum(rows[i].n_cur for i in range(n_bins)) == len(cb)


def test_standardize_embeddings_zero_mean_unit_var(spark):
    from hawk_pack_spark.operators.linalg import standardize_embeddings

    rng = np.random.default_rng(9)
    mat = rng.normal(3.0, 2.0, size=(500, 4))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(500)],
        "vec_id long, embedding array<double>",
    )
    out = standardize_embeddings(df, "embedding", "vec_id", dim=4)
    rows = out.collect()
    assert len(rows) == 500 * 4
    z = np.zeros((500, 4))
    for r in rows:
        z[r.vec_id, r.dim] = r.z
    # z-scores: per-dim mean ~0, var ~1 (μ/σ from 1e-6-quantized sums)
    assert np.abs(z.mean(axis=0)).max() < 1e-4
    assert np.abs(z.var(axis=0) - 1.0).max() < 1e-4
    # spot value against the quantized-accumulator definition
    q = np.round(mat * 1e6)
    mu = q.sum(axis=0) / 500 / 1e6
    var = (q * q).sum(axis=0) / 500 - (q.sum(axis=0) / 500) ** 2
    var /= 1e12
    want = (mat[7, 2] - mu[2]) / math.sqrt(max(var[2], 1e-12))
    assert abs(z[7, 2] - want) < 1e-9


def test_standardize_constant_dim_eps_guard(spark):
    from hawk_pack_spark.operators.linalg import standardize_embeddings

    df = spark.createDataFrame(
        [(i, [1.5, float(i)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = standardize_embeddings(df, "embedding", "vec_id", dim=2).collect()
    const = [r.z for r in out if r.dim == 0]
    assert all(abs(z) < 1e-3 for z in const)  # 0/eps-ish, no NaN/inf
    assert all(not math.isnan(z) and not math.isinf(z) for z in const)


def test_attribute_linear_equal_split_and_window(spark):
    from hawk_pack_spark.operators.analytics import attribute_linear

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, u, typ, offset_s, val=0.0):
        return (eid, u, typ, t0 + dt.timedelta(seconds=offset_s), val)

    rows = [
        ev(1, 7, "click", -3600),
        ev(2, 7, "view", -100),
        ev(3, 7, "purchase", 0, 30.0),
        ev(4, 7, "click", 0),       # AT the conversion instant: excluded
        ev(5, 7, "click", -90000),  # outside the 24h window
        ev(6, 8, "purchase", 0, 10.0),  # no touches: drops out
        ev(7, 9, "click", -10),         # other user: never attributed
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    out = sorted(
        (r.conversion_id, r.touch_id, r.share)
        for r in attribute_linear(
            df, "purchase", ["click", "view"], 86400
        ).collect()
    )
    assert out == [(3, 1, 15.0), (3, 2, 15.0)]
