"""One-pass distributed linear algebra over embedding columns.

PCA at 100 TB is a one-scan problem: the d×d second-moment matrix is a
sum of per-batch outer products (mergeable partials, exactly like the
sketch operators), so the data pass is a mapInPandas over Arrow batches
emitting (n, Σx, ΣxxT) partials, merged by a distributed per-position
sum — the only driver materialization is the d + d² moment cells
(bounded metadata, independent of row count). The eigendecomposition is
d×d on the driver (d = embedding width, 64 here; trivial at any corpus
size), and projection is a vectorized closure over the broadcast
component matrix.

Random projection (Johnson–Lindenstrauss) shares the projection path
with a seeded Gaussian matrix — no data pass needed to fit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PcaModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows orthonormal, variance-descending
    eigenvalues: np.ndarray   # (k,) descending
    total_variance: float     # trace of the covariance
    n: int


def _moment_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-Arrow-batch (n, Σx, flat ΣxxT) partials — one data pass."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0)],
                    "g": [(x.T @ x).reshape(-1)],
                }
            )

    schema = f"n long, s array<double>, g array<double>"
    return df.select(vec_col).mapInPandas(gen, schema)


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8,
            dim: int | None = None) -> PcaModel:
    """Exact PCA via distributed moments: one mapInPandas scan, one
    per-position shuffle merge of the partials, a d×d `eigh` on the
    driver. The collect is d + d² + 1 cells — bounded by the embedding
    width, never by the corpus."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    parts = _moment_partials(df, vec_col, dim)
    n_total = parts.agg(F.sum("n")).collect()[0][0]
    if not n_total:
        raise ValueError("fit_pca: empty input")
    s_rows = (
        parts.select(F.posexplode("s").alias("i", "v"))
        .groupBy("i").agg(F.sum("v").alias("v")).collect()
    )
    g_rows = (
        parts.select(F.posexplode("g").alias("i", "v"))
        .groupBy("i").agg(F.sum("v").alias("v")).collect()
    )
    s = np.zeros(dim)
    for r in s_rows:
        s[r["i"]] = r["v"]
    g = np.zeros(dim * dim)
    for r in g_rows:
        g[r["i"]] = r["v"]
    mean = s / n_total
    cov = g.reshape(dim, dim) / n_total - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize fp noise before eigh
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    return PcaModel(
        mean=mean,
        components=v[:, order].T.copy(),
        eigenvalues=w[order].copy(),
        total_variance=float(np.trace(cov)),
        n=int(n_total),
    )


def project(df: DataFrame, model_mean: np.ndarray, basis: np.ndarray,
            vec_col: str = "embedding", out_col: str = "proj") -> DataFrame:
    """Project vectors onto a (k, d) basis: (x − mean) · basisᵀ as a
    vectorized closure over the broadcast matrix — one matmul per Arrow
    batch, no shuffle, no per-row Python."""
    mean = np.asarray(model_mean, dtype=np.float64)
    b_t = np.asarray(basis, dtype=np.float64).T  # (d, k)
    cols = df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            p = (x - mean) @ b_t
            out = pdf.drop(columns=[c for c in pdf.columns if c == out_col])
            out[out_col] = list(p)
            yield out

    # exclude a pre-existing out_col from the carried fields (the pandas
    # side drops then re-adds it — listing it twice would be a runtime
    # schema/arity mismatch; ADVICE r7)
    schema = ", ".join(
        [
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != out_col
        ]
        + [f"`{out_col}` array<double>"]
    )
    return df.mapInPandas(gen, schema)


def pca_project(df: DataFrame, model: PcaModel,
                vec_col: str = "embedding", out_col: str = "proj") -> DataFrame:
    return project(df, model.mean, model.components, vec_col, out_col)


def random_projection_basis(dim: int, out_dim: int, seed: int = 7) -> np.ndarray:
    """Seeded Gaussian JL basis, rows scaled by 1/sqrt(out_dim) so
    expected pairwise distances are preserved. Deterministic: the same
    (dim, out_dim, seed) yields the same matrix on every
    executor/run — the model ships as a closure, there is nothing to
    fit."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((out_dim, dim)) / np.sqrt(out_dim)


def random_project(df: DataFrame, out_dim: int, vec_col: str = "embedding",
                   out_col: str = "proj", seed: int = 7,
                   dim: int | None = None) -> DataFrame:
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    basis = random_projection_basis(dim, out_dim, seed)
    return project(df, np.zeros(dim), basis, vec_col, out_col)


def balanced_subspace_permutation(variances: np.ndarray, m: int) -> np.ndarray:
    """OPQ-lite dimension allocation: distribute PCA-rotated dims across
    the m PQ subspaces so each gets (nearly) equal total log-variance.

    Plain PCA rotation CONCENTRATES energy in the first dims — exactly
    wrong for product quantization, whose per-subspace codebooks want
    BALANCED information. Greedy: dims in descending variance, each to
    the least-loaded (Σ log var) bucket that still has room; buckets
    hold exactly d/m dims. Returns the permutation (bucket-major dim
    order) to apply to the rotated basis rows."""
    v = np.asarray(variances, dtype=np.float64)
    d = len(v)
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    cap = d // m
    loads = np.zeros(m)
    fill: list[list[int]] = [[] for _ in range(m)]
    for dim in np.argsort(-v):
        open_b = [b for b in range(m) if len(fill[b]) < cap]
        b = min(open_b, key=lambda i: loads[i])
        fill[b].append(int(dim))
        loads[b] += np.log(max(v[dim], 1e-30))
    return np.concatenate([np.asarray(f, dtype=np.int64) for f in fill])
