"""Round-13 guards (ADVICE r12 closures on the driver-side k-means fit
and the knn_join broadcast-waiver band):

- `_kmeans_fit_np` must not crash when the empty-cell re-seed needs
  more rows than the sample has (k > ~2n after the n<k padding —
  reachable via knn_join auto-sizing above ~12.5M rows);
- `ivf_build` with no caller fraction must fit on a SEEDED sample, not
  a partition-order `limit()` prefix, once the corpus exceeds fit_cap
  (and stay byte-identical to the old full-table fit below the cap);
- an empty drawn sample falls back to the bounded full-table collect
  instead of raising;
- the sort-merge pin waiver keys on the COUNTED corpus size too, not
  only the caller hint.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_kmeans_fit_reseed_clamps_to_sample():
    """k=250 on a 100-row sample: most cells are empty every Lloyd's
    round, the re-seed wants 150 rows from a 100-row sample — the r12
    ADVICE repro ('shape mismatch (100,8) vs (150,8)'). The clamp must
    cycle the farthest points instead of crashing, deterministically."""
    from hawk_pack_spark.operators.similarity import _kmeans_fit_np

    rng = np.random.default_rng(7)
    x = rng.normal(size=(100, 8))
    c1 = _kmeans_fit_np(x, 250, seed=42, iters=5)
    c2 = _kmeans_fit_np(x, 250, seed=42, iters=5)
    assert c1.shape == (250, 8)
    assert np.isfinite(c1).all()
    assert np.array_equal(c1, c2)


def test_kmeans_fit_below_crash_threshold_unchanged():
    """The clamp is a no-op whenever need <= n (every pre-r13 regime):
    same fixture, k < n — identical path, sanity-pinned deterministic."""
    from hawk_pack_spark.operators.similarity import _kmeans_fit_np

    rng = np.random.default_rng(11)
    x = rng.normal(size=(200, 8))
    c = _kmeans_fit_np(x, 16, seed=42, iters=10)
    assert c.shape == (16, 8)
    assert len(np.unique(c.round(9), axis=0)) == 16


def test_ivf_build_above_cap_seeded_sample_deterministic(spark):
    """Above fit_cap with fit_fraction=None the fit re-draws a seeded
    sample (not the limit() prefix): two runs give identical centroids,
    and the assignment still covers every row with in-range cells."""
    from hawk_pack_spark.operators.similarity import ivf_build

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(300, 6))
    df = spark.createDataFrame(
        [(i, [float(v) for v in mat[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    a1, c1 = ivf_build(df, n_clusters=4, fit_cap=100)
    a2, c2 = ivf_build(df, n_clusters=4, fit_cap=100)
    assert c1 == c2
    rows = a1.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in rows) == 300
    assert all(0 <= r["cluster"] < 4 for r in rows)


def test_ivf_build_below_cap_fit_sees_whole_table(spark):
    """Below the cap the fit must keep seeing every row exactly as the
    pre-r13 limit(fit_cap) path did (fixture parity depends on it): a
    cap far above the table yields the same centroids as cap=n."""
    from hawk_pack_spark.operators.similarity import ivf_build

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(120, 5))
    df = spark.createDataFrame(
        [(i, [float(v) for v in mat[i]]) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    _, c_big = ivf_build(df, n_clusters=3, fit_cap=262_144)
    _, c_eq = ivf_build(df, n_clusters=3, fit_cap=120)
    assert c_big == c_eq


def test_ivf_build_empty_sample_falls_back(spark):
    """A tiny table x tiny fraction draws an empty sample; the fit must
    fall back to the bounded full-table collect instead of raising."""
    from hawk_pack_spark.operators.similarity import ivf_build

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assigned, centers = ivf_build(
        df, n_clusters=2, fit_fraction=1e-9
    )
    assert len(centers) == 2
    assert assigned.count() == 5


def test_knn_join_waiver_uses_counted_n(spark, monkeypatch):
    """ADVICE r12: when auto-sizing already ran vectors.count(), the
    broadcast-waiver band must key on that counted n — an unhinted
    corpus inside the band gets the measured ~2x broadcast win too.
    Band shrunk by monkeypatch so a 400-row fixture sits inside it."""
    from hawk_pack_spark.operators import similarity

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(400, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )

    def hinted(**kw):
        # fit_fraction left defaulted so auto-sizing runs the count()
        # (the regime ADVICE r12 describes); at 400 rows it stays None
        # and the fit uses the bounded full-table path
        g = similarity.knn_join(
            df, k=3, n_clusters=4, nprobe=2, replicas=1,
            descent_rounds=0, dim=8, **kw,
        )
        return "merge" in g._jdf.queryExecution().optimizedPlan().toString().lower()

    # default band: counted n=400 is below 25k -> pinned either way
    assert hinted()
    monkeypatch.setattr(similarity, "_BCAST_WAIVE_MIN_ROWS", 100)
    monkeypatch.setattr(similarity, "_MERGE_PIN_MIN_ROWS", 1000)
    assert not hinted()            # counted path now waives inside the band
    assert not hinted(n_rows=400)  # hinted path unchanged
    assert hinted(n_rows=5_000)    # above the (shrunk) band: pinned


def test_knn_join_descent_pin_waived_at_known_small_n(spark):
    """r13: the NN-descent rescore joins waive the sort-merge pin at
    ANY known n <= 200k (their build side is the bare corpus
    projection, honestly sized — broadcast measured ~1.2 s faster at
    the sf0.1 fixture), while the candidate join keeps the r12
    [25k, 200k] band. Pinned as strictly fewer merge hints in the
    optimized plan at known-small n than above the band."""
    import numpy as np

    from hawk_pack_spark.operators.similarity import knn_join

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(400, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )

    def hints(n_rows):
        g = knn_join(
            df, k=3, n_clusters=4, nprobe=2, replicas=1,
            descent_rounds=1, n_rows=n_rows, dim=8, fit_fraction=1.0,
        )
        return g._jdf.queryExecution().optimizedPlan().toString().lower().count("merge")

    small, large = hints(400), hints(300_000)
    assert 0 < small < large


def test_let_bound_text_functions_identical(spark):
    """r13: word_ngrams/char_ngrams/lang_id/stopword_ratio/hash_embedding
    let-bind their token arrays (interpreted-HOF closures re-evaluate a
    captured subtree per array element — word_ngrams re-tokenized the
    doc once per output gram, measured 8x the stage). Values must be
    IDENTICAL to the naive non-bound forms, including the short-doc /
    empty / null edges."""
    from pyspark.sql import functions as F

    from hawk_pack_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a b"),                       # shorter than gram width
            (3, ""),                          # empty
            (4, None),                        # null
            (5, "  le la   et est  "),        # fr markers, ragged spaces
            (6, "x " * 200),                  # long repeated
        ],
        "doc_id long, text string",
    )

    def naive_word_ngrams(col, n=3):
        ts = T.tokens(col)
        idx = F.sequence(F.lit(0), F.greatest(F.size(ts) - n, F.lit(-1)))
        return F.when(
            F.size(ts) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ts, i + 1, n))),
        ).otherwise(F.array())

    def naive_char_ngrams(col, n=5):
        s = F.lower(F.col(col) if isinstance(col, str) else col)
        idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
        return F.when(
            F.length(s) >= n, F.transform(idx, lambda i: s.substr(i, F.lit(n)))
        ).otherwise(F.array().cast("array<string>"))

    rows = docs.select(
        (T.word_ngrams("text", 3) == naive_word_ngrams("text", 3)).alias("w"),
        (T.char_ngrams("text", 5) == naive_char_ngrams("text", 5)).alias("c"),
        T.word_ngrams("text", 3).isNull().alias("wn"),
        F.col("text").isNull().alias("tn"),
    ).collect()
    for r in rows:
        # null text -> null grams on both sides (== yields NULL there)
        assert r["w"] or (r["wn"] and r["tn"])
        assert r["c"] or r["tn"]
    out = docs.where("text is not null").select(
        T.lang_id("text").alias("lang"),
        F.round(T.stopword_ratio("text"), 6).alias("swr"),
        T.hash_embedding("text", 8).alias("emb"),
    ).collect()
    assert len(out) == 5
    fr = [r for r in out if r["lang"] == "fr"]
    assert len(fr) == 1  # row 5's markers still classify french
    assert all(len(r["emb"]) == 8 for r in out)


def test_materialize_size_gated_dispatch(spark, sf_dir, monkeypatch):
    """r13 (VERDICT r12 item 2): the materialize-once barrier dispatches
    — localCheckpoint when bounded (fixture default), lineage-keeping
    DISK_ONLY persist when corpus-sized (row hint / plan estimate /
    env), and garbage join-cardinality estimates are treated as
    unknown, not huge. Values identical on every path."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from hawk_pack_spark.operators import materialize as M
    from hawk_pack_spark.sources import load_table

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = sorted(r["doc_id"] for r in d.collect())

    # fixture default: localCheckpoint (plan truncated to an RDD scan)
    loc = M.materialize(d)
    assert "LogicalRDD" in loc._jdf.queryExecution().logical().toString()

    # explicit row hint above the threshold: reliable persist, lineage
    # KEPT (the logical plan still reaches the parquet relation)
    rel = M.materialize(d, rows=60_000_000)
    assert rel.storageLevel == StorageLevel.DISK_ONLY
    assert "LogicalRDD" not in rel._jdf.queryExecution().logical().toString()
    assert sorted(r["doc_id"] for r in rel.collect()) == base
    rel.unpersist()

    # estimate-driven: drop the byte gate to zero — the scan-backed
    # frame has an honest estimate and goes reliable...
    monkeypatch.setattr(M, "_RELIABLE_MIN_BYTES", 0)
    rel2 = M.materialize(d)
    assert rel2.storageLevel == StorageLevel.DISK_ONLY
    rel2.unpersist()
    # ...but a frame whose estimate is join-cardinality garbage
    # (above _GARBAGE_MIN) stays on the local path
    monkeypatch.setattr(M, "_GARBAGE_MIN", 1)
    loc2 = M.materialize(d)
    assert "LogicalRDD" in loc2._jdf.queryExecution().logical().toString()

    # env override wins both ways
    monkeypatch.setenv("HAWK_PACK_MATERIALIZE", "reliable")
    rel3 = M.materialize(d)
    assert rel3.storageLevel == StorageLevel.DISK_ONLY
    rel3.unpersist()
    monkeypatch.setenv("HAWK_PACK_MATERIALIZE", "local")
    loc3 = M.materialize(d, rows=60_000_000)
    assert "LogicalRDD" in loc3._jdf.queryExecution().logical().toString()


def test_prefix_joins_identical_under_reliable_materialize(spark, sf_dir, monkeypatch):
    """The jaccard/containment/cosine prefix joins produce identical
    pairs under both materialization modes (both are pure barriers)."""
    from hawk_pack_spark.operators.dedup import (
        cosine_prefix_join,
        jaccard_prefix_join,
    )
    from hawk_pack_spark.sources import load_table

    d = load_table(spark, "documents", sf_dir)
    j_loc = sorted(map(tuple, jaccard_prefix_join(d, 0.5, gram_n=3).collect()))
    c_loc = sorted(map(tuple, cosine_prefix_join(d, 0.8, gram_n=3).collect()))
    monkeypatch.setenv("HAWK_PACK_MATERIALIZE", "reliable")
    j_rel = sorted(map(tuple, jaccard_prefix_join(d, 0.5, gram_n=3).collect()))
    c_rel = sorted(map(tuple, cosine_prefix_join(d, 0.8, gram_n=3).collect()))
    assert j_loc == j_rel and len(j_loc) > 0
    assert c_loc == c_rel


def test_kmeans_fit_tiled_assignment_matches_single_shot(monkeypatch):
    """The Lloyd's score matrix tiles above _FIT_TILE_ENTRIES (the 10M
    defaults run OOM-killed the driver at 78 GB RSS on the single-shot
    160k x 40k matmul). Tiling must not change the fit: per-row argmax/
    max are independent of row blocking, so a tiny forced tile bound
    must reproduce the single-shot centers on the same (sample, seed)."""
    import hawk_pack_spark.operators.similarity as S

    rng = np.random.default_rng(3)
    x = rng.normal(size=(3000, 16))
    ref = S._kmeans_fit_np(x, 64, seed=42, iters=6)
    monkeypatch.setattr(S, "_FIT_TILE_ENTRIES", 4096)  # ~64-row tiles
    tiled = S._kmeans_fit_np(x, 64, seed=42, iters=6)
    assert np.allclose(ref, tiled, rtol=0, atol=1e-12)


def test_kmeans_fit_large_k_seeding_bounded_and_deterministic():
    """Above _PP_SEED_MAX_K cells the seeding is a uniform distinct
    draw (k-means++'s k sequential O(pool) steps measured ~8 min alone
    at the 10M auto-sizing); the fit must stay deterministic, return
    k centers, and keep every center finite. k=4200 > the 4096 gate
    with n=9000 keeps the test CPU-bounded."""
    from hawk_pack_spark.operators.similarity import _kmeans_fit_np

    rng = np.random.default_rng(13)
    x = rng.normal(size=(9000, 8))
    c1 = _kmeans_fit_np(x, 4200, seed=42, iters=3)
    c2 = _kmeans_fit_np(x, 4200, seed=42, iters=3)
    assert c1.shape == (4200, 8)
    assert np.isfinite(c1).all()
    assert np.array_equal(c1, c2)


def test_kmeans_fit_dispatch_thresholds_clear_current_regimes():
    """Static pin: every fixture/bench fit regime stays on the exact
    pre-r13 paths — the largest current sample x cells product (the 1M
    family: 50k x 256) sits under the tile gate, and the largest
    current cell count (the r11 1M knn_join receipt: 4000) under the
    seeding gate."""
    import hawk_pack_spark.operators.similarity as S

    assert 50_000 * 256 <= S._FIT_TILE_ENTRIES
    assert 4000 <= S._PP_SEED_MAX_K
