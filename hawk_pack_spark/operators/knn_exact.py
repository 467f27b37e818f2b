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
    dim: int | None = None,
) -> DataFrame:
    """Top-k nearest stored vectors per query, exact.

    Returns (query_id, vec_id, dist, rank) with rank 1..k ascending
    distance, ties broken on vec_id (deterministic for oracle hashing).

    ``dim``: for l2_sq, a known vector dimension switches the distance
    to the UNROLLED codegen fold — bit-identical doubles (same
    left-to-right fold, pinned by test), ~12× on the queries×corpus
    scoring that dominates this operator (NOTES r8). Auto-detection is
    deliberately NOT done here (it would add a driver action to every
    call site); bulk callers pass it.
    """
    q = F.broadcast(queries) if broadcast_queries else queries
    pairs = vectors.crossJoin(q)
    if metric == "l2_sq" and dim:
        from hawk_pack_spark.functions.distance import l2_sq_unrolled

        dist = l2_sq_unrolled(F.col(query_col), F.col(vec_col), dim)
    else:
        dist = distance_expr(metric, F.col(query_col), F.col(vec_col))
    scored = pairs.select(F.col(query_id), F.col(vec_id), dist.alias("dist"))
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


def range_search(
    vectors: DataFrame,
    queries: DataFrame,
    radius: float,
    metric: str = "l2_sq",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "query_vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """All stored vectors within ``radius`` of each query — the
    set-valued relational form of ``is_match`` (reference
    src/traits.rs:46-49 tests ONE pair against the store threshold;
    this returns the whole matching set per query).

    Returns (query_id, vec_id, dist), dist <= radius. Exact.

    Plan shape: distributed scan of the vector side, broadcast of the
    query side, distance + radius predicate fused into the codegen'd
    projection — no top-k Window, no shuffle at all; output is
    match-sized, never cross-product-sized. At 100 TB the vector side
    stays partitioned and the cost is one pass, like ``exists_match``.
    """
    q = F.broadcast(queries) if broadcast_queries else queries
    pairs = vectors.crossJoin(q)
    dist = distance_expr(metric, F.col(query_col), F.col(vec_col))
    return (
        pairs.select(F.col(query_id), F.col(vec_id), dist.alias("dist"))
        .where(F.col("dist") <= F.lit(float(radius)))
    )


def filtered_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    predicate,
    metric: str = "l2_sq",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "query_vec",
    index_df: DataFrame | None = None,
    selective_fraction: float = 0.10,
    overfetch: int = 4,
    max_rounds: int = 3,
    decision_out: dict | None = None,
    **ann_kwargs,
) -> DataFrame:
    """Top-k nearest per query AMONG rows satisfying ``predicate`` —
    the metadata-filtered vector search every production serving stack
    needs (predicate + top-k in one call; the reference has no
    equivalent, superset surface).

    Two strategies, dispatched on measured selectivity (the standard
    vector-DB rule):

    - **pre-filter exact** (selective predicate, or no index given):
      push the predicate into the scan, brute-force the survivors.
      EXACT at any selectivity; cost is one pass over the filtered
      rows, and the filter reaches the parquet scan (PushedFilters).
    - **post-filter over-fetch** (broad predicate + an ANN index):
      ``ann_search`` with k·overfetch, keep survivors, and double the
      over-fetch for the starved queries only, up to ``max_rounds``;
      any query still short after that falls back to pre-filter exact
      for completeness. Approximate exactly where the index is.

    Selectivity is ONE cheap aggregate over the predicate column —
    at scale that is a metadata/statistics read, not a full pass over
    the vectors (column pruning keeps the embedding column unread).
    """
    filtered = vectors.where(predicate)
    if index_df is None:
        if decision_out is not None:
            decision_out["path"] = "prefilter_exact"
        return knn_exact(
            filtered, queries, k, metric, vec_id, vec_col, query_id, query_col
        )

    counts = vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(predicate).alias("n_match"),
    ).collect()[0]
    sel = (counts["n_match"] / counts["n"]) if counts["n"] else 0.0
    if sel <= selective_fraction:
        if decision_out is not None:
            decision_out["path"] = "prefilter_exact"
            decision_out["selectivity"] = sel
        return knn_exact(
            filtered, queries, k, metric, vec_id, vec_col, query_id, query_col
        )

    from hawk_pack_spark.operators.hnsw import ann_search

    if decision_out is not None:
        decision_out["path"] = "index_postfilter"
        decision_out["selectivity"] = sel
    allowed = filtered.select(F.col(vec_id))
    pending = queries
    kept_parts: list[DataFrame] = []
    fetch = k * overfetch
    for _ in range(max_rounds):
        hits = ann_search(
            index_df, pending, k=fetch, metric=metric,
            query_id=query_id, query_col=query_col, **ann_kwargs,
        )
        # broadcast the allowed-id set only when it is absolutely small
        # (relative selectivity is the wrong gate: 40% of 10^9 rows is
        # 400M ids — never driver/executor-broadcastable)
        small_allowed = counts["n_match"] <= 2_000_000
        surv = hits.join(F.broadcast(allowed) if small_allowed else allowed, vec_id)
        got = surv.groupBy(query_id).agg(F.count(F.lit(1)).alias("_got"))
        full_q = got.where(F.col("_got") >= k).select(query_id)
        kept_parts.append(surv.join(full_q, query_id, "leftsemi"))
        pending = pending.join(full_q, query_id, "leftanti")
        if pending.limit(1).count() == 0:
            pending = None
            break
        fetch *= 2
    if pending is not None and pending.limit(1).count() > 0:
        # completeness fallback: the starved remainder goes exact
        kept_parts.append(
            knn_exact(filtered, pending, k, metric, vec_id, vec_col,
                      query_id, query_col).drop("rank")
        )
    out = kept_parts[0]
    for p in kept_parts[1:]:
        out = out.unionByName(p)
    return topk_rows(
        out.select(query_id, vec_id, "dist"),
        [query_id], "dist", k, ascending=True, tie_cols=[vec_id],
    )
