"""SemDeDup cluster-pruned near-dup: subset-of-exact and twin recall."""

from __future__ import annotations

import random

from hawk_pack_spark.operators.dedup import semdedup_pairs
from hawk_pack_spark.operators.similarity import all_pairs_cosine_numpy


def _vectors(spark, n=240, dim=16, n_twins=40, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
    for i in range(n_twins):  # near-identical copy of vector i
        base = rows[i][1]
        rows.append((1_000_000 + i, [x + 0.001 * (j + 1) for j, x in enumerate(base)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_subset_and_twin_recall(spark):
    vecs = _vectors(spark)
    exact = all_pairs_cosine_numpy(vecs, threshold=0.99)
    pruned = semdedup_pairs(vecs, threshold=0.99, n_clusters=6)
    exact_set = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    pruned_set = {(r["id_a"], r["id_b"]) for r in pruned.collect()}
    assert pruned_set <= exact_set
    # every planted twin pair is found: twins are ~0 apart, so k-means
    # must co-cluster them and the within-cell sweep must emit the pair
    twins = {(i, 1_000_000 + i) for i in range(40)}
    assert twins <= pruned_set
    # determinism across evaluations (seeded k-means, seeded hashing)
    again = {(r["id_a"], r["id_b"]) for r in semdedup_pairs(
        vecs, threshold=0.99, n_clusters=6).collect()}
    assert again == pruned_set


def test_semdedup_singleton_cluster_ok(spark):
    # 3 points far apart with 3+ clusters requested: cells of size <= 1
    # must not crash the kernel (empty-frame branch)
    rows = [(0, [100.0, 0.0]), (1, [0.0, 100.0]), (2, [-100.0, -100.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert semdedup_pairs(vecs, threshold=0.9, n_clusters=3).count() == 0
