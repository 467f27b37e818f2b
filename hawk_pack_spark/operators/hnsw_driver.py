"""Design (b): whole-cluster HNSW search as a driver-orchestrated loop
of DataFrame joins — the Spark rendering of the reference's coroutine
op-stream (src/coroutine.rs, SURVEY §2.6/§2.4b).

Each reference store op becomes one batch DataFrame op per iteration:

    GetLinks          → frontier ⋈ links on (shard, layer, src)
    EvalDistanceBatch → candidates ⋈ vectors + distance expression
    LessThanBatch     → Window top-ef admission (beam trim)
    visited-set       → anti-join against the accumulated visited DF

Used when one shard's subgraph exceeds a single worker's memory — the
graph never leaves the cluster; only loop control runs on the driver
(the GraphFrames/connected-components pattern). Lineage is cut with
localCheckpoint every iteration, the known failure mode of iterative
plans (SURVEY §7 watch-list).

Semantics: batch beam search expands the whole frontier per iteration —
a superset of the serial engine's one-candidate-at-a-time expansion, so
recall is ≥ the serial kernel's at equal ef. Layers descend top→0 with
greedy ef=1 above layer 0, exactly the reference's schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hawk_pack_spark.config import DEFAULT_PARAMS, HawkParams
from hawk_pack_spark.functions.distance import distance_expr
from hawk_pack_spark.operators import hnsw as H


def _exploded_links(index_df: DataFrame) -> DataFrame:
    return (
        index_df.select(
            "shard",
            F.col("vec_id").alias("src"),
            F.explode(F.arrays_zip("e_layer", "e_dst")).alias("e"),
        )
        .select(
            "shard",
            F.col("e.e_layer").alias("layer"),
            "src",
            F.col("e.e_dst").alias("dst"),
        )
    )


def search_driver_loop(
    index_df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "l2_sq",
    params: HawkParams = DEFAULT_PARAMS,
    ef_search: int | None = None,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    max_iters_per_layer: int = 25,
    op_log: list | None = None,
) -> DataFrame:
    """kNN over the index without any partition-local kernel: pure
    DataFrame joins in a driver loop. Returns (query_id, vec_id, dist,
    rank) like `hnsw.search`.

    ``op_log``, when provided, records the store-op sequence the loop
    issues (GetEntryPoint, GetLinks, EvalDistanceBatch, LessThanBatch,
    SearchResult) — the observable protocol of the reference's coroutine
    stream (coroutine.rs:43-86), testable the same way its scripted
    op-sequence tests are (coroutine.rs:218-304)."""
    spark = index_df.sparkSession
    payload_col = "code" if metric == "hamming" else "vec"
    vectors = index_df.select(
        "shard", F.col("vec_id").alias("dst"), F.col(payload_col).alias("v")
    ).localCheckpoint()
    links = _exploded_links(index_df).localCheckpoint()
    entries = H.entry_points(index_df).localCheckpoint()
    qn = H._normalize_vectors(queries, query_id, query_col, metric, out_id="query_id")
    qv = F.broadcast(
        qn.select("query_id", F.col(payload_col).alias("qv"))
    )

    def log(op: str, **kw) -> None:
        if op_log is not None:
            op_log.append((op, kw))

    log("GetEntryPoint")
    top_layer = entries.agg(F.max("layer")).collect()[0][0]
    if top_layer is None:
        return spark.createDataFrame([], "query_id long, vec_id long, dist double, rank int")

    def score(cand: DataFrame) -> DataFrame:
        """EvalDistanceBatch: candidates (query_id, shard, dst) → +dist."""
        return (
            cand.join(vectors, ["shard", "dst"])
            .join(qv, "query_id")
            .select(
                "query_id", "shard", "dst",
                distance_expr(metric, F.col("qv"), F.col("v")).alias("dist"),
            )
        )

    # seed: every (query, shard-entry) pair, scored
    seeds = score(
        qn.select("query_id")
        .crossJoin(F.broadcast(entries.select("shard", F.col("point").alias("dst"))))
    ).localCheckpoint()
    beam = seeds.withColumn("expanded", F.lit(False))
    visited = seeds.select("query_id", "shard", "dst")

    ef0 = max(ef_search or params.get_ef_search(0), k)
    for lc in range(top_layer, -1, -1):
        ef = ef0 if lc == 0 else params.get_ef_search(lc)
        layer_links = links.where(F.col("layer") == lc)
        for _ in range(max_iters_per_layer):
            frontier = beam.where(~F.col("expanded"))
            if frontier.isEmpty():
                break
            # GetLinks batch
            log("GetLinks", layer=lc)
            cand = (
                frontier.select("query_id", "shard", F.col("dst").alias("src"))
                .join(layer_links, ["shard", "src"])
                .select("query_id", "shard", "dst")
                .distinct()
                .join(visited, ["query_id", "shard", "dst"], "left_anti")
            )
            log("EvalDistanceBatch", layer=lc)
            scored = score(cand)
            visited = visited.unionByName(
                scored.select("query_id", "shard", "dst")
            ).localCheckpoint()
            merged = beam.withColumn("expanded", F.lit(True)).unionByName(
                scored.withColumn("expanded", F.lit(False))
            )
            log("LessThanBatch", layer=lc, ef=ef)
            w = Window.partitionBy("query_id", "shard").orderBy(
                F.col("dist").asc(), F.col("dst").asc()
            )
            beam = (
                merged.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= ef)
                .drop("_rn")
                .localCheckpoint()
            )
        # next layer: allow re-expansion of the carried beam
        beam = beam.withColumn("expanded", F.lit(False)).localCheckpoint()

    log("SearchResult")
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("dst").asc())
    return (
        beam.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("dst").alias("vec_id"), "dist", "rank")
    )
