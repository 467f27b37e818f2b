"""Exact brute-force kNN — the ``LinearDb`` port and the recall oracle.

Reference semantics (src/linear_db.rs):
- ``exists(query)``: scan all stored vectors, match iff any distance is
  within threshold (linear_db.rs:27-35).
- ``insert(query)``: insert iff no existing match — dedup-on-ingest
  (linear_db.rs:17-25).

Spark rendering: the scan-all is a join of queries × vectors. At fixture
scale that is a broadcast of the query side (no shuffle of the big vector
table at all — the plan is scan + BroadcastNestedLoopJoin/codegen'd
distance + partial top-k). At 100 TB the vector side stays partitioned,
queries broadcast in chunks; the global top-k merge is a Window over
(query, dist) which AQE keeps shuffle-light because the candidate set is
already reduced to k per partition by the window's partial sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hawk_pack_spark.functions.distance import distance_expr
from hawk_pack_spark.operators.topk import topk_rows


def knn_exact(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2_sq",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "query_vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k nearest stored vectors per query, exact.

    Returns (query_id, vec_id, dist, rank) with rank 1..k ascending
    distance, ties broken on vec_id (deterministic for oracle hashing).
    """
    q = F.broadcast(queries) if broadcast_queries else queries
    pairs = vectors.crossJoin(q)
    scored = pairs.select(
        F.col(query_id),
        F.col(vec_id),
        distance_expr(metric, F.col(query_col), F.col(vec_col)).alias("dist"),
    )
    return topk_rows(scored, [query_id], "dist", k, ascending=True, tie_cols=[vec_id])


def knn_self(
    vectors: DataFrame,
    k: int,
    metric: str = "l2_sq",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """All-pairs self-kNN of one table (every vector queries the rest)."""
    queries = vectors.select(
        F.col(vec_id).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    out = knn_exact(
        vectors, queries, k + (1 if exclude_self else 0), metric, vec_id, vec_col
    )
    if exclude_self:
        # re-rank with a fresh row_number after dropping the self row:
        # blanket rank-1 would gap ranks (and over-return) when another
        # vector ties the self row at dist 0 with a lower id — exactly
        # the duplicate-heavy case this engine targets
        w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col(vec_id).asc())
        out = (
            out.where(F.col("query_id") != F.col(vec_id))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
    return out


def exists_match(
    vectors: DataFrame,
    queries: DataFrame,
    threshold: float = 0.0,
    metric: str = "l2_sq",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "query_vec",
) -> DataFrame:
    """``LinearDb::exists`` batched: per query, does any stored vector
    match (dist <= threshold)? Returns (query_id, matched BOOLEAN).

    Uses min-aggregation rather than a semi-join so non-matching queries
    come back with ``matched = false`` (the reference returns a bool, not
    a filtered set)."""
    pairs = vectors.crossJoin(F.broadcast(queries))
    dist = distance_expr(metric, F.col(query_col), F.col(vec_col))
    per_q = pairs.groupBy(query_id).agg(F.min(dist).alias("min_dist"))
    return queries.select(query_id).join(per_q, query_id, "left").select(
        F.col(query_id),
        F.coalesce(F.col("min_dist") <= F.lit(threshold), F.lit(False)).alias("matched"),
    )


def insert_unless_match(
    vectors: DataFrame,
    queries: DataFrame,
    threshold: float = 0.0,
    metric: str = "l2_sq",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "query_vec",
) -> DataFrame:
    """``LinearDb::insert`` batched: append the queries that match no
    existing vector AND no earlier query in the same batch (dedup-on-
    ingest, preserving the reference's serial first-wins semantics via
    ascending query_id priority). Returns the new vectors table."""
    flags = exists_match(vectors, queries, threshold, metric, vec_col, query_id, query_col)
    fresh = queries.join(flags.where(~F.col("matched")), query_id, "leftsemi")

    # intra-batch first-wins dedup: a query loses iff an earlier accepted
    # query matches it; with an exact threshold this reduces to grouping
    # by the vector value and keeping the lowest id.
    canon = F.col(query_col).cast("array<double>") if metric != "hamming" else F.col(query_col)
    fresh = (
        fresh.withColumn("_canon", canon)
        .withColumn(
            "_rk",
            F.row_number().over(Window.partitionBy("_canon").orderBy(query_id)),
        )
        .where(F.col("_rk") == 1)
        .drop("_canon", "_rk")
    )
    accepted = fresh.select(F.col(query_id).alias(vec_id), F.col(query_col).alias(vec_col))
    return vectors.select(vec_id, vec_col).unionByName(accepted)
