"""Design (b): whole-cluster HNSW search as a driver-orchestrated op
loop — the Spark rendering of the reference's coroutine op-stream
(src/coroutine.rs, SURVEY §2.6/§2.4b).

The division of labor mirrors the coroutine exactly: the DRIVER owns
the queue state (W/visited — FurthestQueue semantics, O(queries × ef ×
shards) rows), the CLUSTER owns the store and answers ops. Each hop is
ONE shuffle-free Spark job:

    GetLinks          → frontier keys broadcast-probe links@(layer)
    EvalDistanceBatch → candidate edges broadcast-probe vectors, with
                        the distance evaluated JVM-side (distance_expr)
    LessThanBatch     → driver-side top-ef admission over the returned
                        beam-sized batch (queue.rs trim semantics)
    visited-set       → driver-side key set

The index (links + vectors, localCheckpointed once) never leaves the
cluster and never re-shuffles; the driver boundary carries only the
beam-sized traffic the reference's coroutine channel carries.

Semantics: batch beam search expands the whole frontier per iteration —
a superset of the serial engine's one-candidate-at-a-time expansion, so
recall is ≥ the serial kernel's at equal ef. Layers descend top→0 with
greedy ef=1 above layer 0, exactly the reference's schedule.

NOT A SERVING PATH. This module is (1) the executable rendering of the
reference's coroutine protocol (the op-stream tests pin the op
sequence) and (2) the last-resort fallback for a graph whose single
shard exceeds one worker. Per-hop cost is batch-invariant (NOTES r4:
500 queries cost 1.18× of 12) and now ~1 job/hop (VERDICT r7 #6 —
loop suite 88s → 43s), but the per-op floor still makes it orders of
magnitude slower than the kernel paths at serving scale. Nothing in
the serving API (`ann_search` / `search_serving` / `search`) can reach
it; callers must opt in by importing this module directly.
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


def insert_round_driver_loop(
    index_df: DataFrame,
    batch: DataFrame,
    metric: str = "l2_sq",
    params: HawkParams = DEFAULT_PARAMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    op_log: list | None = None,
) -> DataFrame:
    """Design (b) insert: one micro-batch round entirely as DataFrame
    ops — `connect_bidir` rendered as union + group-wise top-k
    (SURVEY §2.4 connect_bidir row: "explode, flip, union with existing
    links, Window top-M_max per (layer, src)").

    Semantics: the whole batch searches the FROZEN pre-batch graph, then
    all links merge at once (the batch-build strategy of SURVEY §7's
    watch-list, measured in test_build_quality). Layers are assigned by
    the same splitmix64(vec_id) sample, so kernel and driver-loop builds
    agree on the graph skeleton.

    Candidates come from PER-LAYER beam snapshots of the descent
    (hawk_searcher.rs:371-374): layer lc's queue is the beam as of layer
    lc searched at ef_constr_insert(lc), not a single bottom-layer beam
    reused everywhere. An edge at layer lc is kept only if the neighbor's
    own assigned layer is >= lc (HNSW layer membership — a node only
    exists on layers up to its sampled top). Entry points per shard
    update by the monotone max-layer rule."""
    from hawk_pack_spark.operators import _hnsw_kernel as K

    num_shards = 1 + (index_df.agg(F.max("shard")).collect()[0][0] or 0)
    prepped = H._normalize_vectors(batch, id_col, vec_col, metric).withColumn(
        "shard", F.pmod(F.xxhash64("vec_id"), F.lit(num_shards)).cast("int")
    )

    # deterministic layer assignment (same sample as the kernel build)
    @F.pandas_udf("int")
    def assign(ids):
        import numpy as np

        arr = ids.to_numpy(dtype="int64")
        return __import__("pandas").Series(
            K.assign_layer(K.uniform_from_ids(arr, seed), params.m_L)
        )

    staged = prepped.withColumn("new_layer", assign(F.col("vec_id"))).localCheckpoint()

    # phase 1: per-layer candidate queues from the frozen graph — the
    # descent's beam snapshot at each layer, ef_constr_insert schedule
    as_queries = staged.select(
        F.col("vec_id").alias("query_id"),
        (F.col("code") if metric == "hamming" else F.col("vec")).alias("query_vec"),
    )
    cand = search_driver_loop(
        index_df, as_queries, k=params.get_ef_constr_insert(0),
        metric=metric, params=params,
        return_layer_snapshots=True,
        ef_per_layer=lambda lc: params.get_ef_constr_insert(lc),
        op_log=op_log,
    ).localCheckpoint()

    # phase 2: connect_bidir as dataflow on exploded links
    old_edges = (
        index_df.select(
            "shard", F.col("vec_id").alias("src"),
            F.explode(F.arrays_zip("e_layer", "e_dst", "e_dist")).alias("e"),
        ).select(
            "shard", F.col("e.e_layer").alias("layer"), "src",
            F.col("e.e_dst").alias("dst"), F.col("e.e_dist").alias("dist"),
        )
    )
    meta = staged.select(
        F.col("vec_id").alias("query_id"), "shard", "new_layer"
    )
    # forward edges: per new vector, the snapshot of ITS shard at each
    # layer 0..new_layer (layers above the old top have no snapshot and
    # get no edges — the reference pads empty queues there,
    # hawk_searcher.rs:380-386), filtered to layer members only: a
    # neighbor participates at layer lc iff its own layer >= lc
    node_layers = index_df.select(
        F.col("vec_id").alias("dst"), F.col("layer").alias("dst_layer")
    )
    # the batch's snapshot set is micro-batch-sized; node_layers is the
    # index — broadcast the batch side so the index never shuffles here
    layers = (
        F.broadcast(
            cand.join(meta, ["query_id", "shard"])
            .where(F.col("layer") <= F.col("new_layer"))
        )
        .join(node_layers, "dst")
        .where(F.col("dst_layer") >= F.col("layer"))
        .select("shard", "layer", F.col("query_id").alias("src"),
                F.col("dst"), "dist")
    )
    w = Window.partitionBy("shard", "layer", "src").orderBy(
        F.col("dist").asc(), F.col("dst").asc()
    )
    # per-layer M trim (connect_bidir, hawk_searcher.rs:164); the clamped
    # 5-entry schedule renders as a CASE over the layer column
    from hawk_pack_spark.config import N_PARAM_LAYERS

    m_expr = F.lit(params.get_M(N_PARAM_LAYERS - 1))
    for _lc in range(N_PARAM_LAYERS - 2, -1, -1):
        m_expr = F.when(F.col("layer") == _lc, F.lit(params.get_M(_lc))).otherwise(m_expr)
    fwd = (
        layers.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= m_expr)
        .drop("_rn")
    )
    # back edges: flip, union with existing, re-trim to M_max per (layer, src)
    back = fwd.select("shard", "layer", F.col("dst").alias("src"),
                      F.col("src").alias("dst"), "dist")
    merged = old_edges.unionByName(back).unionByName(fwd)
    wm = Window.partitionBy("shard", "layer", "src").orderBy(
        F.col("dist").asc(), F.col("dst").asc()
    )
    m_max0, m_max = params.get_M_max(0), params.get_M_max(1)
    bounded = (
        merged.withColumn("_rn", F.row_number().over(wm))
        .where(
            F.col("_rn")
            <= F.when(F.col("layer") == 0, F.lit(m_max0)).otherwise(F.lit(m_max))
        )
        .drop("_rn")
    )
    # reassemble the index rows (old + new vectors, parallel-array edges)
    if op_log is not None:
        # the write-phase ops of the reference's insert stream
        # (coroutine.rs Op::SetEntryPoint / Op::SetLinks): entry point
        # moves iff the batch's max layer exceeds the current top
        new_top = staged.agg(F.max("new_layer")).collect()[0][0] or 0
        old_top = index_df.agg(F.max("layer")).collect()[0][0] or 0
        if new_top > old_top:
            op_log.append(("SetEntryPoint", {"layer": new_top}))
        op_log.append(("SetLinks", {"batch": True}))
    vectors_all = index_df.select(
        "shard", "vec_id", "layer", "code", "vec"
    ).unionByName(
        staged.select("shard", "vec_id", F.col("new_layer").alias("layer"),
                      "code", "vec")
    )
    return _assemble_index(vectors_all, bounded)


def _assemble_index(vectors_all: DataFrame, edges: DataFrame) -> DataFrame:
    """(shard, vec_id, layer, code, vec) × exploded edges (shard, layer,
    src, dst, dist) → the parallel-array index schema."""
    per_node = (
        edges.groupBy("shard", F.col("src").alias("vec_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("layer").alias("l"),
                                        F.col("dist").alias("d"),
                                        F.col("dst").alias("t")))
            ).alias("es")
        )
        .select(
            "vec_id",
            F.transform("es", lambda e: e["l"]).cast("array<int>").alias("e_layer"),
            F.transform("es", lambda e: e["t"]).alias("e_dst"),
            F.transform("es", lambda e: e["d"]).alias("e_dist"),
        )
    )
    return vectors_all.join(per_node, "vec_id", "left").select(
        "shard", "vec_id", "layer", "code", "vec",
        F.coalesce("e_layer", F.array().cast("array<int>")).alias("e_layer"),
        F.coalesce("e_dst", F.array().cast("array<bigint>")).alias("e_dst"),
        F.coalesce("e_dist", F.array().cast("array<double>")).alias("e_dist"),
    )


def build_index_driver_loop(
    vectors: DataFrame,
    metric: str = "l2_sq",
    params: HawkParams = DEFAULT_PARAMS,
    num_shards: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    bootstrap_size: int = 32,
    growth: float = 2.0,
) -> DataFrame:
    """Full from-scratch design-(b) build: no partition-local kernel
    anywhere — the whole graph lives in DataFrames and every round is
    `insert_round_driver_loop` against the frozen previous round.

    Mirrors the reference's incremental build (hawk_searcher.rs:308-332)
    the way a cluster would run it: geometric micro-batch rounds (each
    round grows the index by `growth`×), so the number of driver
    round-trips is O(log N) while per-round work is one batched
    search + link merge. The bootstrap batch gets EXACT links (crossjoin
    within shard, top-M_max per node) — at `bootstrap_size` rows the
    crossjoin is trivial and seeds every shard with a well-formed graph.

    Layer assignment uses the same splitmix64(vec_id) sample as the
    kernel build, so the two designs agree on the graph skeleton.
    Insertion order is ascending vec_id (the reference inserts in caller
    order; a stable order keeps the build deterministic)."""
    from hawk_pack_spark.operators import _hnsw_kernel as K

    prepped = (
        H._normalize_vectors(vectors, id_col, vec_col, metric)
        .withColumn(
            "shard", F.pmod(F.xxhash64("vec_id"), F.lit(num_shards)).cast("int")
        )
        .localCheckpoint()
    )
    total = prepped.count()
    if total == 0:
        return _assemble_index(
            prepped.withColumn("layer", F.lit(0).cast("int")),
            prepped.sparkSession.createDataFrame(
                [], "shard int, layer int, src long, dst long, dist double"
            ),
        )

    @F.pandas_udf("int")
    def assign(ids):
        import numpy as np
        import pandas as pd

        arr = ids.to_numpy(dtype="int64")
        return pd.Series(K.assign_layer(K.uniform_from_ids(arr, seed), params.m_L))

    # deterministic insertion order: rank by vec_id. (Window without
    # partition keys is fine here: ranking N ids is a sort, the cheapest
    # full-shuffle op in the build; at 100 TB replace with range
    # boundaries from approxQuantile over vec_id.)
    w = Window.orderBy("vec_id")
    ranked = (
        prepped.withColumn("_rank", F.row_number().over(w))
        .withColumn("new_layer", assign(F.col("vec_id")))
        .localCheckpoint()
    )

    # --- bootstrap: exact links for the first batch -----------------------
    boot_n = min(bootstrap_size, total)
    boot = ranked.where(F.col("_rank") <= boot_n)
    payload = "code" if metric == "hamming" else "vec"
    a = boot.select("shard", F.col("vec_id").alias("src"),
                    F.col("new_layer").alias("src_layer"),
                    F.col(payload).alias("pa"))
    b = boot.select("shard", F.col("vec_id").alias("dst"),
                    F.col("new_layer").alias("dst_layer"),
                    F.col(payload).alias("pb"))
    pairs = (
        a.join(b, "shard")
        .where(F.col("src") != F.col("dst"))
        .select(
            "shard", "src", "dst",
            distance_expr(metric, F.col("pa"), F.col("pb")).alias("dist"),
            F.explode(
                F.sequence(F.lit(0), F.least("src_layer", "dst_layer"))
            ).alias("layer"),
        )
    )
    m_max0, m_max = params.get_M_max(0), params.get_M_max(1)
    wb = Window.partitionBy("shard", "layer", "src").orderBy(
        F.col("dist").asc(), F.col("dst").asc()
    )
    boot_edges = (
        pairs.withColumn("_rn", F.row_number().over(wb))
        .where(
            F.col("_rn")
            <= F.when(F.col("layer") == 0, F.lit(m_max0)).otherwise(F.lit(m_max))
        )
        .drop("_rn")
    )
    index_df = _assemble_index(
        boot.select("shard", "vec_id", F.col("new_layer").alias("layer"),
                    "code", "vec"),
        boot_edges,
    ).localCheckpoint()

    # --- geometric insert rounds against the frozen previous graph -------
    done = boot_n
    while done < total:
        step = max(boot_n, int(done * (growth - 1.0)))
        batch = ranked.where(
            (F.col("_rank") > done) & (F.col("_rank") <= done + step)
        ).select("vec_id", "code", "vec")
        index_df = insert_round_driver_loop(
            index_df, batch, metric=metric, params=params,
            id_col="vec_id", vec_col=payload, seed=seed,
        ).localCheckpoint()
        done += step
    return index_df


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
    return_per_shard: bool = False,
    return_layer_snapshots: bool = False,
    ef_per_layer=None,
) -> DataFrame:
    """kNN over the index without any partition-local kernel: pure
    DataFrame joins in a driver loop. Returns (query_id, vec_id, dist,
    rank) like `hnsw.search`.

    ``op_log``, when provided, records the store-op sequence the loop
    issues (GetEntryPoint, GetLinks, EvalDistanceBatch, LessThanBatch,
    SearchResult) — the observable protocol of the reference's coroutine
    stream (coroutine.rs:43-86), testable the same way its scripted
    op-sequence tests are (coroutine.rs:218-304).

    ``return_layer_snapshots`` returns the beam AS OF each layer of the
    descent — (query_id, shard, dst, dist, layer) — the per-layer W
    snapshots of the reference's search_to_insert (hawk_searcher.rs:
    371-374), which the insert round consumes as per-layer candidate
    queues. ``ef_per_layer`` overrides the ef schedule (insert uses
    ef_constr_insert per layer, hawk_searcher.rs:362-369).

    Execution model (VERDICT r7 #6 — the per-hop job-count fix): the
    queue state (beam + visited set, O(queries × ef × shards) rows)
    lives on the DRIVER, exactly where the reference's coroutine keeps
    its FurthestQueues while the store executes ops (coroutine.rs:
    43-86 — the caller owns W, the store answers GetLinks/
    EvalDistanceBatch). Each hop is then ONE shuffle-free Spark job:
    the frontier keys (tiny) broadcast-probe the distributed links
    table at the current layer, the candidate edges broadcast-probe
    the distributed vectors table, distances evaluate JVM-side via
    `distance_expr`, and only the beam-sized result returns. The
    visited-set anti-join, the ef trim (LessThanBatch), and the
    convergence test are O(beam) driver work — no Window shuffle, no
    distinct, no checkpoint, no count job per hop. The index (links +
    vectors) never leaves the cluster and never re-shuffles; what
    crosses the driver boundary is the same beam-sized traffic the
    reference's coroutine channel carries. Measured: the prior
    all-DataFrame state (1 checkpoint+count job + 3 broadcasts per
    hop) cost ~0.75 s/hop on an idle local[32]; this form is ~4×
    cheaper per hop at identical results."""
    import pandas as pd

    spark = index_df.sparkSession
    payload_col = "code" if metric == "hamming" else "vec"
    payload_sql = "bigint" if metric == "hamming" else "array<double>"
    vectors = index_df.select(
        "shard", F.col("vec_id").alias("dst"), F.col(payload_col).alias("v")
    ).localCheckpoint()
    links = _exploded_links(index_df).localCheckpoint()
    qn = H._normalize_vectors(queries, query_id, query_col, metric, out_id="query_id")
    q_rows = qn.select("query_id", F.col(payload_col).alias("qv")).collect()

    def log(op: str, **kw) -> None:
        if op_log is not None:
            op_log.append((op, kw))

    log("GetEntryPoint")
    ent = H.entry_points(index_df).collect()
    top_layer = max((r["layer"] for r in ent), default=None)
    empty_res = spark.createDataFrame(
        [], "query_id long, vec_id long, dist double, rank int"
    )
    if top_layer is None or not q_rows:
        if return_layer_snapshots:
            return spark.createDataFrame(
                [], "query_id long, shard int, dst long, dist double, layer int"
            )
        if return_per_shard:
            return spark.createDataFrame(
                [], "query_id long, shard int, dst long, dist double"
            )
        return empty_res

    qv_of = {r["query_id"]: r["qv"] for r in q_rows}
    # the query payloads travel as ONE small broadcast table joined by
    # query_id at the end of each hop's plan — never per-frontier-row
    # (carrying a 512-byte vector on every candidate edge was the 500-
    # query batch's driver-OOM: frontier×M payload copies per hop)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            [(qid, qv) for qid, qv in qv_of.items()],
            columns=["query_id", "qv"],
        ),
        f"query_id long, qv {payload_sql}",
    ).localCheckpoint()
    # above this frontier size, dedupe candidate keys IN-PLAN before the
    # vectors probe: a big batch reaches the same dst from many frontier
    # nodes, and the duplicates would multiply both the second broadcast
    # and the collect (3-int rows, AQE-coalesced — cheap); tiny op-
    # protocol batches skip the extra shuffle
    dedupe_above = 2000

    def _score_keys(keys_pdf, dst_col: str, lc: int | None) -> "pd.DataFrame":
        """GetLinks (when lc is not None) + EvalDistanceBatch as ONE
        job: key rows broadcast-probe links@layer, candidate keys
        broadcast-probe vectors, the query payload joins as its own
        broadcast, distance evaluates JVM-side. Arrow-collects
        (query_id, shard, dst, dist) — keys and dists only, no
        payloads ever reach the driver."""
        in_cols = ["query_id", "shard", dst_col]
        kdf = spark.createDataFrame(
            keys_pdf[in_cols],
            f"query_id long, shard int, {dst_col} long",
        )
        if lc is not None:
            cand = (
                F.broadcast(kdf)
                .join(links.where(F.col("layer") == lc), ["shard", "src"])
                .select("query_id", "shard", "dst")
            )
            if len(keys_pdf) > dedupe_above:
                cand = cand.dropDuplicates(["query_id", "shard", "dst"])
        else:
            cand = kdf
        scored = (
            F.broadcast(cand)
            .join(vectors, ["shard", "dst"])
            .join(F.broadcast(qdf), "query_id")
            .select(
                "query_id", "shard", "dst",
                distance_expr(metric, F.col("qv"), F.col("v"))
                .cast("double").alias("dist"),
            )
        )
        return scored.toPandas()

    # ---- seed: every query starts at every shard's entry point ----------
    seed_pdf = pd.DataFrame(
        [(qid, r["shard"], r["point"]) for qid in qv_of for r in ent],
        columns=["query_id", "shard", "dst"],
    )
    seeds = _score_keys(seed_pdf, "dst", None)
    seed_rows = list(
        zip(seeds["query_id"], seeds["shard"], seeds["dst"], seeds["dist"])
    )

    # Driver-side queue state — the coroutine caller's W/visited:
    #   beams[(query_id, shard)] = [(dist, dst), ...] live rows
    #   expanded / visited: key sets. A row trimmed out of the top-ef
    #   is dropped permanently (the candidate set only grows, so
    #   out-of-top-ef can never re-enter — identical semantics to the
    #   previous dataflow rendering's `dropped` flag).
    beams: dict[tuple, list] = {}
    visited: set = set()
    expanded: set = set()
    for qid, sh, dst, dist in seed_rows:
        beams.setdefault((qid, sh), []).append((dist, dst))
        visited.add((qid, sh, dst))

    ef0 = max(ef_search or params.get_ef_search(0), k)
    snapshots: list[tuple] = []  # (query_id, shard, dst, dist, layer)
    for lc in range(top_layer, -1, -1):
        if ef_per_layer is not None:
            ef = ef_per_layer(lc)
        else:
            ef = ef0 if lc == 0 else params.get_ef_search(lc)
        # entering a layer re-opens the carried beam for expansion
        expanded.clear()
        for _ in range(max_iters_per_layer):
            frontier = [
                (qid, sh, dst)
                for (qid, sh), rows in beams.items()
                for (dist, dst) in rows
                if (qid, sh, dst) not in expanded
            ]
            if not frontier:
                break
            log("GetLinks", layer=lc)
            log("EvalDistanceBatch", layer=lc)
            got = _score_keys(
                pd.DataFrame(frontier, columns=["query_id", "shard", "src"]),
                "src", lc,
            )
            expanded.update(frontier)
            log("LessThanBatch", layer=lc, ef=ef)
            for qid, sh, dst, dist in zip(
                got["query_id"], got["shard"], got["dst"], got["dist"]
            ):
                kk = (qid, sh, dst)
                if kk in visited:
                    continue
                visited.add(kk)
                beams.setdefault((qid, sh), []).append((dist, dst))
            # trim each beam to top-ef (dist, dst) — the LessThanBatch
            # admission; trimmed rows stay in `visited`, never re-enter
            for bk, rows in beams.items():
                if len(rows) > ef:
                    rows.sort()
                    del rows[ef:]
        if return_layer_snapshots:
            # W snapshot for this layer (hawk_searcher.rs:371-374): the
            # insert round reads out[lc] as layer lc's candidate queue
            for (qid, sh), rows in beams.items():
                for dist, dst in rows:
                    snapshots.append((qid, sh, dst, dist, lc))

    log("SearchResult")
    if return_layer_snapshots:
        return spark.createDataFrame(
            pd.DataFrame(
                snapshots,
                columns=["query_id", "shard", "dst", "dist", "layer"],
            ),
            "query_id long, shard int, dst long, dist double, layer int",
        )
    if return_per_shard:
        # pre-merge beam: (query_id, shard, dst, dist) — the per-shard
        # candidate sets an insert round needs (each shard is its own graph)
        flat = [
            (qid, sh, dst, dist)
            for (qid, sh), rows in beams.items()
            for dist, dst in rows
        ]
        return spark.createDataFrame(
            pd.DataFrame(flat, columns=["query_id", "shard", "dst", "dist"]),
            "query_id long, shard int, dst long, dist double",
        )
    # merge shards per query, rank by (dist, dst) — same determinism as
    # the Window rendering
    per_q: dict[int, list] = {}
    for (qid, sh), rows in beams.items():
        per_q.setdefault(qid, []).extend(rows)
    out = []
    for qid, rows in per_q.items():
        rows.sort()
        for rank, (dist, dst) in enumerate(rows[:k], start=1):
            out.append((qid, dst, dist, rank))
    if not out:
        return empty_res
    return spark.createDataFrame(
        pd.DataFrame(out, columns=["query_id", "vec_id", "dist", "rank"]),
        "query_id long, vec_id long, dist double, rank int",
    )
