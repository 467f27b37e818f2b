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


def standardize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    micros: int = 6,
    eps: float = 1e-12,
) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column —
    the feature-scaling pass before PCA/k-means/quantization when
    dimensions live on different scales. Returns one row per
    (id, dim) with the standardized value: z = (x − μ_d)/σ_d
    (population σ; near-constant dimensions guard with `eps`).

    Determinism discipline: μ and σ come from EXACT integer
    accumulators — each component is captured at 10^micros scaled
    units and summed as decimal(38,0) (a float shuffle-order sum would
    differ run to run and engine to engine) — while x itself keeps
    full precision in the final (x − μ)/σ, which is two IEEE ops on
    deterministic inputs. One pass: the per-dim stats fold in a
    single agg with 2·d expressions (no explode — the corpus never
    fans out ×d for the stats), then z rides a posexplode projection
    with the 1-row stats broadcast.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    unit = 10 ** micros
    v = F.col(vec_col)
    sums = [
        F.sum(
            F.round(v[i].cast("double") * unit).cast("decimal(38,0)")
        ).alias(f"_s{i}")
        for i in range(dim)
    ]
    sqs = [
        F.sum(
            (
                F.round(v[i].cast("double") * unit).cast("decimal(19,0)")
                * F.round(v[i].cast("double") * unit).cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias(f"_q{i}")
        for i in range(dim)
    ]
    stats = df.agg(F.count(F.lit(1)).alias("_n"), *sums, *sqs)
    n = F.col("_n").cast("double")
    mu = F.array(
        *[F.col(f"_s{i}").cast("double") / n / unit for i in range(dim)]
    )
    var = F.array(
        *[
            (
                F.col(f"_q{i}").cast("double") / n
                - (F.col(f"_s{i}").cast("double") / n)
                * (F.col(f"_s{i}").cast("double") / n)
            )
            / F.lit(float(unit) * unit)
            for i in range(dim)
        ]
    )
    stats = stats.select(mu.alias("_mu"), var.alias("_var"))
    exploded = df.join(F.broadcast(stats)).select(
        F.col(id_col),
        F.posexplode(v).alias("dim", "_x"),
        "_mu",
        "_var",
    )
    z = (
        F.col("_x").cast("double")
        - F.element_at("_mu", F.col("dim") + 1)
    ) / F.sqrt(
        F.greatest(F.element_at("_var", F.col("dim") + 1), F.lit(eps))
    )
    return exploded.select(id_col, "dim", z.alias("z"))


def label_centroid_similarity(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroid
    embeddings — the class-geometry diagnostic (which labels' regions
    overlap; near-1 centroid pairs predict classifier confusion and
    semdedup over-merging). One row per unordered label pair.

    Float discipline: per-(label, dim) sums accumulate in EXACT
    decimal(38,0) over scale-quantized components (the standardize
    convention — never a shuffle-order float sum); each centroid mean
    is one double division; the cosine folds over the DIM-SORTED mean
    list in both engines, rounded 6 dp. Shape: one posexplode
    (×dim fan-out, linear), one (label, dim) groupBy, one per-label
    list assembly, one bounded pair self-join (labels², never
    corpus²).
    """
    per_dim = (
        vectors.select(
            F.col(label_col).alias("_lab"),
            F.posexplode(F.col(vec_col)).alias("_d", "_v"),
        )
        .groupBy("_lab", "_d")
        .agg(
            F.sum(F.round(F.col("_v") * scale).cast("decimal(38,0)")).alias("_s"),
            F.count(F.lit(1)).cast("bigint").alias("_n"),
        )
    )
    means = per_dim.select(
        "_lab",
        "_d",
        (F.col("_s").cast("string").cast("double") / F.col("_n").cast("double")).alias(
            "_m"
        ),
    )
    lists = means.groupBy("_lab").agg(
        F.array_sort(F.collect_list(F.struct("_d", "_m"))).alias("_ml")
    )
    a = lists.select(F.col("_lab").alias("label_a"), F.col("_ml").alias("_ma"))
    b = lists.select(F.col("_lab").alias("label_b"), F.col("_ml").alias("_mb"))
    pairs = a.crossJoin(b).where(F.col("label_a") < F.col("label_b"))
    dot = F.aggregate(
        F.zip_with("_ma", "_mb", lambda x, y: x["_m"] * y["_m"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.col("_ma"), F.lit(0.0), lambda acc, x: acc + x["_m"] * x["_m"]
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.col("_mb"), F.lit(0.0), lambda acc, x: acc + x["_m"] * x["_m"]
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(dot / (na * nb), 6).alias("cosine"),
    )
