"""Product quantization (PQ): compressed vectors + asymmetric-distance
search — the memory-side scale path for vector stores.

At 100 TB a float embedding column (64-d float32 = 256 B/row) dwarfs
executor memory; PQ stores M uint8 codes per vector (here 8 B/row, a
32× compression) and still answers kNN by table lookup:

- TRAIN: split each vector into M subvectors, k-means each subspace to
  256 centroids. Training runs on a driver-side SAMPLE (codebooks are
  M×256×(D/M) floats — k-means over a bounded sample is the standard
  recipe; the full data never leaves the cluster).
- ENCODE: per row, each subvector's nearest-centroid id. Distributed,
  one Arrow-batched pandas UDF with the codebooks in a broadcast.
- SEARCH (ADC): per query, precompute an M×256 lookup table of
  subspace distances, then every candidate's approximate distance is
  `sum_m LUT[m, code[m]]` — a numpy gather-sum over the codes matrix,
  no float vectors read at all. Partial top-k per partition, global
  top-k merge: the same two-stage pattern as every exact kNN here.

All stages are seeded and deterministic. Recall vs exact kNN is
asserted in tests on the fixture embeddings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hawk_pack_spark.operators.topk import topk_rows


def _kmeans_np(x: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Seeded Lloyd's k-means (numpy). Deterministic; empty clusters
    re-seeded from the farthest points."""
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    if len(centers) < k:  # fewer points than centroids: pad by repeats
        centers = np.vstack([centers] * (k // len(centers) + 1))[:k]
    xx = (x * x).sum(1, keepdims=True)
    for _ in range(iters):
        # ||x-c||² = ||x||² - 2 x·c + ||c||² via one matmul — never
        # materializes the (n, k, d) broadcast tensor
        d = xx - 2.0 * x @ centers.T + (centers * centers).sum(1)[None, :]
        assign = d.argmin(1)
        # mean per cluster with one scatter-add instead of a k-loop
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.zeros_like(centers)
        np.add.at(sums, assign, x)
        nonempty = counts > 0
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        if not nonempty.all():
            far = np.argsort(-d.min(1))  # farthest points re-seed empties
            centers[~nonempty] = x[far[: (~nonempty).sum()]]
    return centers


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 256,
    vec_col: str = "embedding",
    sample_size: int = 20_000,
    seed: int = 42,
    iters: int = 20,
) -> np.ndarray:
    """Fit codebooks on a driver-side sample. Returns (m, k, d/m)."""
    n = vectors.count()
    frac = min(1.0, sample_size / max(n, 1))
    sample = (
        vectors.sample(fraction=frac, seed=seed) if frac < 1.0 else vectors
    ).select(F.col(vec_col).cast("array<float>").alias("v")).collect()
    x = np.asarray([r.v for r in sample], dtype=np.float32)
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    return np.stack(
        [
            _kmeans_np(x[:, i * sub : (i + 1) * sub].astype(np.float64),
                       k, seed + i, iters)
            for i in range(m)
        ]
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes ARRAY<SMALLINT>[m]) — 1 byte of information per code."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<smallint>")
    def encode(vs):
        import pandas as pd

        cb = bc.value  # (m, k, sub)
        m, _, sub = cb.shape
        x = np.asarray(list(vs), dtype=np.float64)
        codes = np.empty((len(x), m), dtype=np.int16)
        for i in range(m):
            part = x[:, i * sub : (i + 1) * sub]
            # ||p - c||² = ||p||² - 2 p·c + ||c||²; argmin over c
            d = (
                (part * part).sum(1, keepdims=True)
                - 2.0 * part @ cb[i].T
                + (cb[i] * cb[i]).sum(1)[None, :]
            )
            codes[:, i] = d.argmin(1)
        return pd.Series(list(codes))

    return vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        encode(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def ivfpq_build(
    vectors: DataFrame,
    n_clusters: int = 64,
    m: int = 8,
    k: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    kmeans_iter: int = 10,
    fit_fraction: float | None = None,
    sample_size: int = 20_000,
    pq_iters: int = 20,
):
    """IVF-PQ: coarse k-means cells + PQ over RESIDUALS (v − centroid)
    — the byte-budgeted disk/memory index. The r5 10M ladder measured
    flat PQ losing on dense iid vectors (recall 0.16: quantization
    distortion vs shrinking NN separations); residual encoding is the
    standard fix — cell centroids absorb the coarse position so the
    codebooks spend their 8 bytes on LOCAL structure — and cell routing
    makes the scan partition-prunable (per-query I/O tracks nprobe,
    like the serving path).

    Measured domain (r6, same byte budget as flat PQ): on a CLUSTERED
    corpus (40 clusters, radius 0.12 vs spread 1.0) residual ADC recall
    0.358 vs flat 0.235, re-rank 0.84 probing 4/32 cells; on near-iid
    fixtures residual does NOT beat flat (0.36 vs 0.52 — per-cell LUTs
    make cross-cell ranking noisier; same physics family as the r5
    negative result), where ivfpq's value is the pruned scan, not
    recall. Both pinned in tests/test_pq.py.

    10M ladder (r6 tail, tools/bench_ivfpq_scale.py, nprobe 8/256,
    oversample 20): clustered-shape search 7.2s/500q with recall@10
    1.000 vs exact BLAS 17.7s — the mid-scale full-union winner — and
    the build is 6× cheaper than serving-HNSW at the same n (81.8s vs
    486s); cell-partitioned disk codes hold recall 1.0 at 18.0s. On
    iid the collapse deepens with n (recall 0.849 at 1M → 0.262 at
    10M, flat across nprobe, so it is quantization distortion, not
    routing). IVF-PQ is therefore an EXPLICITLY-chosen index for
    clustered corpora, not a `choose_ann_path` default: recall is
    corpus-shape-dependent, which the dispatcher cannot observe a
    priori. Full table in NOTES.md round-6 §11.

    Returns (encoded, centers, codebooks): ``encoded`` is
    (vec_id, cell, codes ARRAY<SMALLINT>[m]) — write it
    ``partitionBy("cell")`` for a pruned on-disk layout; ``centers``
    the coarse centroid list (driver-held routing metadata, same shape
    as `ivf_build`'s); ``codebooks`` the (m, k, d/m) numpy array."""
    from hawk_pack_spark.operators.materialize import materialize
    from hawk_pack_spark.operators.similarity import ivf_build

    assigned, centers = ivf_build(
        vectors, n_clusters=n_clusters, id_col=id_col, vec_col=vec_col,
        seed=seed, max_iter=kmeans_iter, fit_fraction=fit_fraction,
    )
    spark = vectors.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cluster int, _center array<double>",
    )
    resid = assigned.join(F.broadcast(centers_df), "cluster").select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col("cluster").cast("int").alias("cell"),
        F.zip_with(
            F.col(vec_col).cast("array<double>"), "_center",
            lambda v, c: v - c,
        ).alias("_resid"),
        # materialize once: pq_train reads this twice (count + sample
        # collect), pq_encode a third time and the cell re-join a
        # fourth — each pass otherwise re-runs the k-means assignment
        # UDF over the corpus (guide §5: reuse beats recompute; an
        # index build materializes its input exactly once). The
        # residual frame is CORPUS-sized, so the barrier is the
        # size-gated dispatch (r13): localCheckpoint at bounded scale,
        # lineage-keeping DISK_ONLY persist when corpus-sized.
    )
    resid = materialize(resid)
    codebooks = pq_train(
        resid, m=m, k=k, vec_col="_resid", sample_size=sample_size,
        seed=seed, iters=pq_iters,
    )
    enc = pq_encode(resid, codebooks, id_col="vec_id", vec_col="_resid")
    encoded = enc.join(resid.select("vec_id", "cell"), "vec_id").select(
        "vec_id", "cell", "codes"
    )
    return encoded, centers, codebooks


def ivfpq_search(
    encoded: DataFrame,
    centers: list,
    codebooks: np.ndarray,
    queries: DataFrame,
    kth: int = 10,
    nprobe: int = 8,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    rerank_with: DataFrame | None = None,
    oversample: int = 5,
    rerank_id_col: str = "vec_id",
    rerank_vec_col: str = "embedding",
    max_driver_queries: int = 100_000,
) -> DataFrame:
    """ADC top-k over an IVF-PQ index: route each query to its nprobe
    nearest cells driver-side (numpy over the tiny centroid matrix),
    JVM-filter the scan to the probed-cell union (PartitionFilters when
    the codes are cell-partitioned on disk), and gather-sum residual
    LUTs per (cell, routed-query block) — the LUT absorbs the
    query-minus-centroid offset, so ADC stays an 8-byte-per-row scan,
    and the whole block's LUTs build in m small matmuls (no per-query
    Python loop). Optional exact re-rank on an ``oversample``·k
    shortlist, same as `pq_search`; ``rerank_id_col``/``rerank_vec_col``
    name the float table's columns (mirroring `ivfpq_build`'s
    id_col/vec_col — an index built from custom-named columns re-ranks
    without renaming). Returns (query_id, vec_id, dist, rank).

    The query collect is BOUNDED (``max_driver_queries``, the same
    serving-surface discipline as `ann_search`, hnsw.py): a caller
    feeding a huge query DataFrame gets a clear error instead of a
    driver OOM — IVF-PQ routing is a serving decision; bulk analytics
    batches belong on the exact scan or the cogroup HNSW path."""
    spark = encoded.sparkSession
    q_rows = (
        queries.select(
            F.col(query_id).cast("long"), F.col(query_col).cast("array<double>")
        )
        .limit(max_driver_queries + 1)
        .collect()
    )
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, dist double, rank int"
        )
    if len(q_rows) > max_driver_queries:
        raise ValueError(
            f"query batch exceeds max_driver_queries={max_driver_queries}: "
            "ivfpq_search routes queries driver-side (a serving surface). "
            "Split the batch, raise max_driver_queries explicitly, or use "
            "the fully-distributed exact path (knn_exact, which never "
            "collects the query side) for bulk batches — l2_topk_numpy "
            "also accepts oversized batches and falls back to it."
        )
    qids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    qx = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    c_mat = np.asarray(centers, dtype=np.float64)
    cd = (
        (qx * qx).sum(1, keepdims=True)
        - 2.0 * qx @ c_mat.T
        + (c_mat * c_mat).sum(1)[None, :]
    )
    npb = min(nprobe, len(c_mat))
    order = np.argsort(cd, axis=1, kind="stable")[:, :npb]
    routed: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in order[qi]:
            routed.setdefault(int(c), []).append(qi)
    shortlist_k = kth * oversample if rerank_with is not None else kth
    bc = spark.sparkContext.broadcast(
        (qids, qx, c_mat, codebooks, routed, shortlist_k)
    )
    scan = encoded.where(F.col("cell").isin(list(routed)))

    def part_topk(batches):
        import pandas as pd

        qids_, qx_, c_mat_, cb, routed_, kth_ = bc.value
        m_, k_, sub = cb.shape
        cb_norms = (cb * cb).sum(2)  # (m, k), shared by every cell
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True)
        out = []
        for cell, pdf in whole.groupby("cell", sort=False):
            q_idx = routed_.get(int(cell))
            if not q_idx:
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            # residual queries for this cell; LUTs for the WHOLE routed
            # block in m small matmuls (VERDICT r6 #1 — no per-query
            # Python loop): lut[j, i, :] = ||rq[j, sub_i] - cb[i]||²
            rq = qx_[q_idx] - c_mat_[int(cell)][None, :]  # (nq_c, d)
            nq_c = len(q_idx)
            lut = np.empty((nq_c, m_, k_), dtype=np.float64)
            for i in range(m_):
                part = rq[:, i * sub : (i + 1) * sub]  # (nq_c, sub)
                lut[:, i, :] = (
                    (part * part).sum(1)[:, None]
                    - 2.0 * part @ cb[i].T
                    + cb_norms[i][None, :]
                )
            # ADC gather-sum, vectorized over (query, row): m gathers
            d = np.zeros((nq_c, len(ids)), dtype=np.float64)
            for i in range(m_):
                d += lut[:, i, codes[:, i]]
            take = min(kth_, d.shape[1])
            idx = np.argpartition(d, take - 1, axis=1)[:, :take]  # (nq_c, take)
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.repeat(qids_[q_idx], take),
                        "vec_id": ids[idx].ravel(),
                        "dist": np.take_along_axis(d, idx, axis=1).ravel(),
                    }
                )
            )
        if out:
            yield pd.concat(out, ignore_index=True)

    partial = scan.mapInPandas(
        part_topk, "query_id long, vec_id long, dist double"
    )
    adc = topk_rows(
        partial, ["query_id"], "dist", shortlist_k, tie_cols=["vec_id"]
    ).select("query_id", "vec_id", "dist", "rank")
    if rerank_with is None:
        return adc

    from hawk_pack_spark.functions.distance import distance_expr

    qdf = F.broadcast(
        queries.select(
            F.col(query_id).cast("long").alias("query_id"),
            F.col(query_col).cast("array<double>").alias("qv"),
        )
    )
    exact = (
        adc.select("query_id", "vec_id")
        .join(rerank_with.select(
            F.col(rerank_id_col).cast("long").alias("vec_id"),
            F.col(rerank_vec_col).cast("array<double>").alias("v"),
        ), "vec_id")
        .join(qdf, "query_id")
        .select(
            "query_id", "vec_id",
            distance_expr("l2_sq", F.col("qv"), F.col("v")).alias("dist"),
        )
    )
    return topk_rows(exact, ["query_id"], "dist", kth, tie_cols=["vec_id"]).select(
        "query_id", "vec_id", "dist", "rank"
    )


def pq_search(
    encoded: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    kth: int = 10,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    rerank_with: DataFrame | None = None,
    oversample: int = 5,
    rerank_id_col: str = "vec_id",
    rerank_vec_col: str = "embedding",
    max_driver_queries: int = 100_000,
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, dist, rank) with approximate L2²
    distances. Queries are collected to a broadcast (the standard
    many-vectors × few-queries shape); the collect is bounded by
    ``max_driver_queries`` (serving-surface discipline — see
    `ivfpq_search`); candidates never materialize float vectors.

    ``rerank_with``: the float-vector table (``rerank_id_col``,
    ``rerank_vec_col``). When given, ADC produces an ``oversample``·k
    shortlist and the final top-k is exact-ranked on the shortlist —
    the IVFPQ+re-rank recipe: the full scan stays on 8-byte codes,
    floats are fetched for only O(oversample·k) rows per query via an
    equi-join."""
    spark = encoded.sparkSession
    q_rows = (
        queries.select(
            F.col(query_id).cast("long"), F.col(query_col).cast("array<double>")
        )
        .limit(max_driver_queries + 1)
        .collect()
    )
    if len(q_rows) > max_driver_queries:
        raise ValueError(
            f"query batch exceeds max_driver_queries={max_driver_queries}: "
            "pq_search builds per-query LUT broadcasts (a serving surface). "
            "Split the batch or raise max_driver_queries explicitly."
        )
    cb = codebooks  # (m, k, sub)
    m, _, sub = cb.shape
    qids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    qx = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    # LUT[q, m, k]: distance of query-subvector to each centroid
    lut = np.empty((len(qids), m, cb.shape[1]), dtype=np.float64)
    for i in range(m):
        part = qx[:, i * sub : (i + 1) * sub]
        lut[:, i, :] = (
            (part * part).sum(1, keepdims=True)
            - 2.0 * part @ cb[i].T
            + (cb[i] * cb[i]).sum(1)[None, :]
        )
    shortlist_k = kth * oversample if rerank_with is not None else kth
    bc = spark.sparkContext.broadcast((qids, lut, shortlist_k))

    def part_topk(batches):
        import pandas as pd

        qids_, lut_, kth_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            # ADC gather-sum: dists[q, n] = Σ_m LUT[q, m, codes[n, m]]
            out = []
            for qi in range(len(qids_)):
                d = lut_[qi, np.arange(codes.shape[1])[None, :], codes].sum(1)
                take = min(kth_, len(d))
                idx = np.argpartition(d, take - 1)[:take]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids_[qi],
                            "vec_id": ids[idx],
                            "dist": d[idx],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    partial = encoded.mapInPandas(
        part_topk, "query_id long, vec_id long, dist double"
    )
    adc = topk_rows(
        partial, ["query_id"], "dist", shortlist_k, tie_cols=["vec_id"]
    ).select("query_id", "vec_id", "dist", "rank")
    if rerank_with is None:
        return adc

    from hawk_pack_spark.functions.distance import distance_expr

    qdf = F.broadcast(
        queries.select(
            F.col(query_id).cast("long").alias("query_id"),
            F.col(query_col).cast("array<double>").alias("qv"),
        )
    )
    exact = (
        adc.select("query_id", "vec_id")
        .join(rerank_with.select(
            F.col(rerank_id_col).cast("long").alias("vec_id"),
            F.col(rerank_vec_col).cast("array<double>").alias("v"),
        ), "vec_id")
        .join(qdf, "query_id")
        .select(
            "query_id", "vec_id",
            distance_expr("l2_sq", F.col("qv"), F.col("v")).alias("dist"),
        )
    )
    return topk_rows(exact, ["query_id"], "dist", kth, tie_cols=["vec_id"]).select(
        "query_id", "vec_id", "dist", "rank"
    )


def ivfsq8_build(
    vectors: DataFrame,
    n_clusters: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    kmeans_iter: int = 10,
    fit_fraction: float | None = None,
):
    """IVF-SQ8: coarse k-means cells + SQ8 scalar quantization over
    RESIDUALS (v − centroid) — IVF-PQ's pruned-I/O cell structure with
    SQ8's shape-independent recall (VERDICT r6 #7). The natural default
    for clustered-or-unknown corpora: per-query scan bytes track nprobe
    (cells are partition-prunable on disk, like ivfpq), while recall is
    bounded by 8-bit-per-dim quantization error alone — it does NOT
    collapse on iid data the way PQ's 256-centroid subspaces do (the
    measured 10M iid recall 0.262; NOTES r6 §11). Cost: 1 byte/dim
    (4× compression) instead of PQ's 1 byte/subspace (32×) — the
    middle rung of the capacity ladder.

    Residual encoding tightens the quantization grid: the global
    (lo, scale) bounds span the residual range (≈ cell radius), not the
    corpus range, so each of the 256 levels covers a finer interval.

    Returns (encoded, centers, lo, scale): ``encoded`` is
    (vec_id, cell, codes binary, cnorm) — write it
    ``partitionBy("cell")`` for the pruned on-disk layout; ``cnorm``
    is the query-independent code-norm term Σ_j scale_j²·c_j²,
    precomputed at encode time so the scan is one matmul per cell."""
    from hawk_pack_spark.operators.materialize import materialize
    from hawk_pack_spark.operators.similarity import (
        ivf_build,
        sq8_encode,
        sq8_train,
    )

    assigned, centers = ivf_build(
        vectors, n_clusters=n_clusters, id_col=id_col, vec_col=vec_col,
        seed=seed, max_iter=kmeans_iter, fit_fraction=fit_fraction,
    )
    spark = vectors.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cluster int, _center array<double>",
    )
    resid = assigned.join(F.broadcast(centers_df), "cluster").select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col("cluster").cast("int").alias("cell"),
        F.zip_with(
            F.col(vec_col).cast("array<double>"), "_center",
            lambda v, c: v - c,
        ).alias("_resid"),
        # same materialize-once rationale as ivfpq_build: sq8_train,
        # sq8_encode and the cell re-join each re-derive the k-means
        # assignment otherwise; size-gated barrier (r13), see ivfpq_build
    )
    resid = materialize(resid)
    lo, scale = sq8_train(resid, vec_col="_resid")
    enc = sq8_encode(resid, lo, scale, vec_id="vec_id", vec_col="_resid")
    encoded = enc.join(resid.select("vec_id", "cell"), "vec_id").select(
        "vec_id", "cell", "codes", "cnorm"
    )
    return encoded, centers, lo, scale


def ivfsq8_search(
    encoded: DataFrame,
    centers: list,
    lo: np.ndarray,
    scale: np.ndarray,
    queries: DataFrame,
    kth: int = 10,
    nprobe: int = 8,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    rerank_with: DataFrame | None = None,
    oversample: int = 5,
    rerank_id_col: str = "vec_id",
    rerank_vec_col: str = "embedding",
    max_driver_queries: int = 100_000,
) -> DataFrame:
    """Asymmetric SQ8 top-k over an IVF-SQ8 index: route each query to
    its nprobe nearest cells driver-side, JVM-filter the scan to the
    probed-cell union (PartitionFilters when cell-partitioned on disk),
    and per (cell, routed-query block) run the expanded-form decode
    matmul of sq8_topk on residual queries (q − centroid) — one float32
    matmul per cell over the 8×-smaller code tile, cnorm precomputed.
    Optional exact re-rank on an ``oversample``·k shortlist. Bounded
    driver collect (``max_driver_queries``), same serving-surface
    discipline as ivfpq_search. Returns (query_id, vec_id, dist, rank)
    with squared-L2 distances."""
    spark = encoded.sparkSession
    q_rows = (
        queries.select(
            F.col(query_id).cast("long"), F.col(query_col).cast("array<double>")
        )
        .limit(max_driver_queries + 1)
        .collect()
    )
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, dist double, rank int"
        )
    if len(q_rows) > max_driver_queries:
        raise ValueError(
            f"query batch exceeds max_driver_queries={max_driver_queries}: "
            "ivfsq8_search routes queries driver-side (a serving surface). "
            "Split the batch or raise max_driver_queries explicitly."
        )
    qids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    qx = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    c_mat = np.asarray(centers, dtype=np.float64)
    cd = (
        (qx * qx).sum(1, keepdims=True)
        - 2.0 * qx @ c_mat.T
        + (c_mat * c_mat).sum(1)[None, :]
    )
    npb = min(nprobe, len(c_mat))
    order = np.argsort(cd, axis=1, kind="stable")[:, :npb]
    routed: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in order[qi]:
            routed.setdefault(int(c), []).append(qi)
    shortlist_k = kth * oversample if rerank_with is not None else kth
    bc = spark.sparkContext.broadcast(
        (qids, qx, c_mat, lo, scale, routed, shortlist_k)
    )
    scan = encoded.where(F.col("cell").isin(list(routed)))

    def part_topk(batches):
        import pandas as pd

        qids_, qx_, c_mat_, lo_, scale_, routed_, kth_ = bc.value
        dim = lo_.shape[0]
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True)
        out = []
        for cell, pdf in whole.groupby("cell", sort=False):
            q_idx = routed_.get(int(cell))
            if not q_idx:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            C = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(len(pdf), dim).astype(np.float32)
            cn = pdf["cnorm"].to_numpy(dtype=np.float64)[None, :]
            # residual queries for this cell; same expanded form as
            # sq8_topk: d = ||r||² − 2 (r·s)·C + Σ s²c² (cnorm)
            r = (qx_[q_idx] - c_mat_[int(cell)][None, :]) - lo_[None, :]
            r_sq = (r * r).sum(1)[:, None]
            ws32 = (r * scale_[None, :]).astype(np.float32)
            d = r_sq - 2.0 * (ws32 @ C.T).astype(np.float64) + cn
            take = min(kth_, d.shape[1])
            idx = np.argpartition(d, take - 1, axis=1)[:, :take]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.repeat(qids_[q_idx], take),
                        "vec_id": ids[idx].ravel(),
                        "dist": np.take_along_axis(d, idx, axis=1).ravel(),
                    }
                )
            )
        if out:
            yield pd.concat(out, ignore_index=True)

    partial = scan.mapInPandas(
        part_topk, "query_id long, vec_id long, dist double"
    )
    adc = topk_rows(
        partial, ["query_id"], "dist", shortlist_k, tie_cols=["vec_id"]
    ).select("query_id", "vec_id", "dist", "rank")
    if rerank_with is None:
        return adc

    from hawk_pack_spark.functions.distance import distance_expr

    qdf = F.broadcast(
        queries.select(
            F.col(query_id).cast("long").alias("query_id"),
            F.col(query_col).cast("array<double>").alias("qv"),
        )
    )
    exact = (
        adc.select("query_id", "vec_id")
        .join(rerank_with.select(
            F.col(rerank_id_col).cast("long").alias("vec_id"),
            F.col(rerank_vec_col).cast("array<double>").alias("v"),
        ), "vec_id")
        .join(qdf, "query_id")
        .select(
            "query_id", "vec_id",
            distance_expr("l2_sq", F.col("qv"), F.col("v")).alias("dist"),
        )
    )
    return topk_rows(exact, ["query_id"], "dist", kth, tie_cols=["vec_id"]).select(
        "query_id", "vec_id", "dist", "rank"
    )
