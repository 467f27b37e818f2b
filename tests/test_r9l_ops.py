"""Round-9 batch 11: 1-bit binary quantization kNN — closed-form
checks."""

from __future__ import annotations

import numpy as np


def test_binary_quantize_packs_sign_bits(spark):
    from hawk_pack_spark.operators.similarity import binary_quantize

    vec = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<double>"
    )
    (r,) = binary_quantize(df, 64).collect()
    # alternating bits 1010... per 32-bit word = 0b1010...10
    want_word = int("10" * 16, 2)
    assert r.bq_code == [want_word, want_word]


def test_binary_quantize_word_boundary_and_zero(spark):
    from hawk_pack_spark.operators.similarity import binary_quantize

    # only dim 0 and dim 32 positive; zeros pack as 0 bits
    vec = [0.0] * 64
    vec[0] = 5.0
    vec[32] = 5.0
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<double>"
    )
    (r,) = binary_quantize(df, 64).collect()
    assert r.bq_code == [1 << 31, 1 << 31]


def test_binary_quant_knn_recall_on_separated_clusters(spark):
    from hawk_pack_spark.operators.knn_exact import knn_exact
    from hawk_pack_spark.operators.similarity import binary_quant_knn

    rng = np.random.default_rng(7)
    # two well-separated sign-pattern clusters: BQ prefilter is
    # near-perfect, so BQ top-k should equal exact top-k
    base = np.sign(rng.normal(size=(2, 64))) * 2.0
    mat = np.vstack(
        [base[i % 2] + rng.normal(scale=0.1, size=64) for i in range(100)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    queries = df.where("vec_id < 5").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    # oversample must cover the query's whole cluster (~50 points):
    # within a cluster the sign codes are near-identical, so Hamming
    # cannot rank INSIDE it — the exact re-rank does that. 5*12=60
    # candidates ⊇ the 50-point cluster ⇒ BQ top-k == exact top-k.
    got = binary_quant_knn(df, queries, k=5, dim=64, oversample=12)
    exact = knn_exact(df, queries, k=5, metric="l2_sq")
    g = {(r.query_id, r.vec_id) for r in got.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    assert g == e
    counts = {}
    for q, _ in g:
        counts[q] = counts.get(q, 0) + 1
    assert all(v == 5 for v in counts.values())
