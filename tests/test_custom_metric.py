"""User-supplied metrics — the VectorStore trait as a plug-in surface.

The reference's only extension point IS the store: a user implements
eval_distance/is_match/less_than and plugs it into the fixed engine
(src/traits.rs:34-52; README.md:26 "bring your own store"). Here the
analog is `register_metric(name, expr_fn, batch_fn)`: the expression
half powers every declarative surface, the numpy half powers the
partition-local kernel, and the two must agree numerically."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.functions.distance import distance_expr, register_metric
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.knn_exact import knn_exact


def _l1_expr(a, b):
    from pyspark.sql import functions as F

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            a.cast("array<double>"), b.cast("array<double>"),
            lambda x, y: F.abs(x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# the batch half ships to Python workers inside the kernel closures; a
# lambda pickles BY VALUE (a named function in a non-importable module
# would pickle by reference and fail on the worker — user modules are
# importable via --py-files in a real deployment, test modules are not)
register_metric(
    "l1",
    _l1_expr,
    lambda data, q_idx, cand: np.abs(data[cand] - data[q_idx]).sum(axis=1).tolist(),
)


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.sin(F.col("id") * i * 0.9 + i),
        ).alias("embedding"),
    ).localCheckpoint()


def test_custom_metric_expression_surfaces(spark, vecs):
    """distance_expr / knn_exact / is_match all speak the new metric."""
    q = vecs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = knn_exact(vecs, q, k=3, metric="l1").collect()
    assert len(res) == 15
    assert all(r.dist == 0.0 for r in res if r.rank == 1)  # self at rank 1
    # spot-check one pair against numpy
    a = vecs.where(F.col("vec_id") == 1).collect()[0].embedding
    b = vecs.where(F.col("vec_id") == 2).collect()[0].embedding
    want = float(np.abs(np.array(a) - np.array(b)).sum())
    got = (
        vecs.where(F.col("vec_id") == 1)
        .crossJoin(
            vecs.where(F.col("vec_id") == 2).select(
                F.col("embedding").alias("other")
            )
        )
        .select(distance_expr("l1", F.col("embedding"), F.col("other")).alias("d"))
        .collect()[0]
        .d
    )
    assert abs(got - want) < 1e-9


def test_custom_metric_hnsw_end_to_end(spark, vecs):
    """build_index + search + insert dup gate run on the registered
    metric, and the ANN results agree with the exact expression path."""
    params = HawkParams.new(32, 24, 12)
    index = hnsw.build_index(
        vecs, metric="l1", params=params, num_shards=4
    ).localCheckpoint()
    q = vecs.where(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = hnsw.search(index, q, k=5, metric="l1", params=params)
    exact = knn_exact(vecs, q, k=5, metric="l1")
    a = {(r.query_id, r.vec_id) for r in ann.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.95
    # dup gate through the custom metric: exact copies must all reject
    dups = vecs.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
    )
    updated = hnsw.insert_batch(
        index, dups, metric="l1", params=params, match_threshold=0.0
    )
    assert updated.count() == 400
    # ann_search has no exact-scan contrast for a custom metric: serves
    dec = {}
    out = hnsw.ann_search(index, q.limit(2), k=3, metric="l1", params=params,
                          decision_out=dec)
    assert dec["path"] == "serving" and out.count() == 6


def test_unknown_metric_still_raises(spark, vecs):
    with pytest.raises(KeyError, match="unknown metric"):
        knn_exact(
            vecs,
            vecs.limit(1).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=1,
            metric="chebyshev",
        ).collect()
