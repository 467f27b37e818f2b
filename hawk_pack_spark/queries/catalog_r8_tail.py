"""round-8 tail rows

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



# ---------------------------------------------------------------------------
# round-8 tail: CDC apply, bar resample, boolean retrieval, BFS, kNN
# self-join, dense histogram


def q_cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics (operators/diff.py apply_changes): a
    deterministic changeset — deletes (key%97=0), status/price updates
    (key%13=0, not deleted), inserts (key%17=0 re-keyed +1e8) — applied
    to the orders snapshot. ONE shuffle on the key: survivors
    anti-join the change keys, upserts union in. Full merged table,
    data-level. o_totalprice+1000.0 is the same single double add in
    both engines — bit-identical."""
    from hawk_pack_spark.operators.diff import apply_changes

    o = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    deletes = o.where(k % 97 == 0).withColumn("op", F.lit("delete"))
    updates = (
        o.where((k % 13 == 0) & (k % 97 != 0))
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("op", F.lit("upsert"))
    )
    inserts = (
        o.where(k % 17 == 0)
        .withColumn("o_orderkey", k + F.lit(100000000))
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("op", F.lit("upsert"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return apply_changes(o, changes, ["o_orderkey"])


CDC_APPLY_SQL = """
WITH chg_keys AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000 FROM orders WHERE o_orderkey % 17 = 0
)
SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg_keys)
UNION ALL
SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
       o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 97 <> 0
UNION ALL
SELECT o_orderkey + 100000000, o_custkey, 'N',
       o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 17 = 0
"""


def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bar resample (analytics.resample_ohlc): hourly
    open/high/low/close/volume per event type in ONE groupBy —
    open/close ride the min/max shuffle as struct(ts, event_id, value)
    extrema, so first/last are deterministic under the 10× fixture's
    exact ts ties (event_id is the unique tiebreak), data-level."""
    from hawk_pack_spark.operators.analytics import resample_ohlc

    ev = load_table(spark, "events", sf_dir)
    return resample_ohlc(
        ev, "ts", ["event_type"], "value", "event_id", "1 hour"
    )


OHLC_SQL = """
SELECT event_type, date_trunc('hour', ts) AS bucket_start,
  (min({'t': ts, 'i': event_id, 'v': value})).v AS open_v,
  max(value) AS high_v,
  min(value) AS low_v,
  (max({'t': ts, 'i': event_id, 'v': value})).v AS close_v,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events GROUP BY 1, 2
"""


def q_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND/OR/NOT retrieval (operators/retrieval.py) over the
    whitespace-token inverted index: three fixed queries probe the
    postings with ONE broadcast-hash join + one (query, doc) groupBy;
    NOT resolves inside the same aggregate (no anti-join pass),
    data-level."""
    from hawk_pack_spark.operators.retrieval import (
        boolean_retrieval,
        build_postings,
    )

    docs = load_table(spark, "documents", sf_dir)
    postings = build_postings(docs)
    queries = spark.createDataFrame(
        [
            (1, ["spark", "join"], [], []),
            (2, ["table"], ["vector", "stream"], ["slow"]),
            (3, ["scan"], [], ["merge", "batch"]),
        ],
        "query_id int, must array<string>, any array<string>, none array<string>",
    )
    return boolean_retrieval(postings, queries)


BOOLEAN_RETRIEVAL_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
)
SELECT CAST(1 AS INTEGER) AS query_id, doc_id FROM toks
WHERE list_contains(ts, 'spark') AND list_contains(ts, 'join')
UNION ALL
SELECT CAST(2 AS INTEGER), doc_id FROM toks
WHERE list_contains(ts, 'table')
  AND (list_contains(ts, 'vector') OR list_contains(ts, 'stream'))
  AND NOT list_contains(ts, 'slow')
UNION ALL
SELECT CAST(3 AS INTEGER), doc_id FROM toks
WHERE list_contains(ts, 'scan')
  AND NOT list_contains(ts, 'merge') AND NOT list_contains(ts, 'batch')
"""


def q_copurchase_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted shortest paths (graph.bfs_distances) from the
    minimum-id part over the symmetrized co-purchase graph, 4 hops —
    the iterative-dataflow BFS with loop invariants localCheckpointed
    once (the PageRank discipline). Oracle: bounded recursive CTE with
    UNION dedupe + MIN(dist) — states capped at nodes × hops, safe on
    cycles. Data-level (node, dist)."""
    from hawk_pack_spark.operators.graph import bfs_distances, copurchase_pairs

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    # materialized once (r13): the sources aggregate and bfs_distances'
    # own edge checkpoint otherwise each re-run the co-purchase
    # self-join aggregation (~2 s per extra run at sf0.1); the edge
    # list is the already-reduced pair table, orders of magnitude
    # smaller than lineitem
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    ).localCheckpoint(eager=True)
    sources = edges.agg(F.min("src").alias("node"))
    return bfs_distances(edges, sources, max_hops=4).select(
        F.col("node").alias("part"), F.col("dist").cast("int").alias("dist")
    )


COPURCHASE_BFS_SQL = """
WITH RECURSIVE t AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS (
  SELECT a.p AS pa, b.p AS pb FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS (SELECT pa AS s, pb AS d FROM und UNION ALL SELECT pb, pa FROM und),
walk(node, dist) AS (
  SELECT MIN(s), 0 FROM e
  UNION
  SELECT e.d, walk.dist + 1 FROM walk JOIN e ON e.s = walk.node
  WHERE walk.dist < 4
)
SELECT node AS part, CAST(MIN(dist) AS INTEGER) AS dist
FROM walk GROUP BY node
"""


def q_knn_join_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked k-NN self-join (similarity.knn_join): every embedding's
    top-10 neighbors — candidates meet in a cell-co-partitioned JOIN
    (nprobe=10 probes × 3-cell boundary replication), refined by one
    NN-descent round; nothing corpus-sized broadcasts. ANN evidence
    contract (invariant row): no self-matches, every degree == k, and
    recall ≥ 0.75 on a 64-anchor hash-deterministic sample against the
    exact kNN join. The near-iid 64-d fixture is the HARD shape for
    space partitioning — the full measured parameter/recall curve at
    n=500-20k is in NOTES r8 (0.78-0.92 depending on coverage; this
    config clears the gate with ≥0.09 margin at every fixture scale)."""
    from hawk_pack_spark.operators.similarity import knn_join

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    k = 10
    # dim=64 is the fixture's embedding width (TESTDATA.md): the hint
    # skips the dim-sniff first() probe (VERDICT r8 #3)
    # the invariant row reads `g` through three branches (degree agg,
    # self-count, recall semi-join); without a checkpoint each branch
    # re-runs the whole blocked-join + NN-descent pipeline. The result
    # is bounded (n x k rows), values unchanged.
    # n_rows: knn_join runs this same count itself when the hint is
    # absent (auto-sizing); passing it from here costs nothing extra and
    # lets the operator drop its sort-merge pin below 200k rows (its own
    # measured 2x win: AQE broadcast-joins the salted candidate stage
    # instead of full-sorting both corpus-sized sides). Same n_clusters
    # / fit_fraction at any fixture SF — results identical.
    g = knn_join(
        emb, k=k, nprobe=10, replicas=3, descent_rounds=1, dim=64,
        n_rows=emb.count(),
    ).localCheckpoint()
    deg = g.groupBy("query_id").agg(F.count(F.lit(1)).alias("deg"))
    anchors = (
        emb.orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(64)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    exact = knn_exact(emb, anchors, k=k, metric="l2_sq")
    hits = g.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi"
    )
    return (
        emb.agg(F.count(F.lit(1)).alias("n_points"))
        .crossJoin(g.agg(F.sum((F.col("query_id") == F.col("vec_id")).cast("int")).alias("_self")))
        .crossJoin(
            deg.agg(
                F.min("deg").alias("_dmin"), F.max("deg").alias("_dmax")
            )
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("_hit")))
        .select(
            "n_points",
            (F.col("_self") == 0).alias("no_self"),
            ((F.col("_dmin") == k) & (F.col("_dmax") == k)).alias("degrees_ok"),
            (F.col("_hit") >= 0.75 * 64 * k).alias("recall_ok"),
        )
    )


KNN_JOIN_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_points, TRUE AS no_self,
       TRUE AS degrees_ok, TRUE AS recall_ok
FROM embeddings
"""


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense equi-width histogram (analytics.histogram): 20 bins over
    [0, 500) per event type, empty bins zero-filled via the broadcast
    bin spine (fixed 100-row schema at any corpus size). Bin assignment
    is one double expression with identical operand order in both
    engines — bit-deterministic, data-level."""
    from hawk_pack_spark.operators.analytics import histogram

    ev = load_table(spark, "events", sf_dir)
    return histogram(
        ev, "value", bins=20, lo=0.0, hi=500.0, group_cols=["event_type"]
    )


HISTOGRAM_SQL = """
WITH b AS (SELECT CAST(UNNEST(range(20)) AS BIGINT) AS bin),
g AS (SELECT DISTINCT event_type FROM events),
a AS (
  SELECT event_type,
    CAST(LEAST(GREATEST(FLOOR((value - 0.0) * 20.0 / 500.0), 0), 19) AS BIGINT) AS bin,
    COUNT(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT g.event_type, b.bin,
  CAST(0.0 AS DOUBLE) + b.bin * CAST(25.0 AS DOUBLE) AS bin_lo,
  CAST(0.0 AS DOUBLE) + (b.bin + 1) * CAST(25.0 AS DOUBLE) AS bin_hi,
  CAST(COALESCE(a.n, 0) AS BIGINT) AS n
FROM g CROSS JOIN b
LEFT JOIN a ON a.event_type = g.event_type AND a.bin = b.bin
"""


def q_events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of event value over time
    (analytics.trend_slopes): ONE aggregation pass over exact
    decimal(38,0) accumulators (x = epoch seconds from 2024-01-01,
    y = value in exact micro-units); the only float ops are the two
    final divisions, identical operand order in both engines.
    Data-level."""
    from hawk_pack_spark.operators.analytics import trend_slopes

    ev = load_table(spark, "events", sf_dir)
    return trend_slopes(
        ev.select(
            "event_type",
            F.unix_timestamp("ts").alias("sec"),
            F.round(F.col("value") * 1000000).cast("bigint").alias("vm"),
        ),
        ["event_type"],
        F.col("sec"),
        F.col("vm"),
        x_origin=1704067200,
    )


TREND_SQL = """
WITH b AS (
  SELECT event_type,
    CAST(COUNT(*) AS DECIMAL(38,0)) AS n0,
    SUM(CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(38,0))) AS sx,
    SUM(CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0))) AS sy,
    SUM(CAST(CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(38,0))
          * CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS sxy,
    SUM(CAST(CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(38,0))
          * CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS sxx
  FROM events GROUP BY 1)
SELECT event_type, CAST(n0 AS BIGINT) AS n,
  ROUND(CAST(CAST(CAST(n0*sxy - sx*sy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
      / CAST(CAST(CAST(n0*sxx - sx*sx AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE), 6) AS slope,
  ROUND((CAST(CAST(sy AS VARCHAR) AS DOUBLE)
      - (CAST(CAST(CAST(n0*sxy - sx*sy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(n0*sxx - sx*sx AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE))
        * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
      / CAST(CAST(n0 AS VARCHAR) AS DOUBLE), 6) AS intercept
FROM b
"""


def q_orders_lineitem_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-size prediction WITHOUT running the join
    (profile.join_cardinality): orders ⋈ lineitem on the order key,
    computed from two (key, count) reductions — the planner-side
    primitive that detects an accidental many-to-many before a 100 TB
    join executes. Data-level one-row result incl. key-overlap split
    and per-side max fan-out (the skew signal)."""
    from hawk_pack_spark.operators.profile import join_cardinality

    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return join_cardinality(o, li, "o_orderkey", "l_orderkey")


JOIN_CARDINALITY_SQL = """
WITH lc AS (SELECT o_orderkey AS k, COUNT(*) AS cl FROM orders
            WHERE o_orderkey IS NOT NULL GROUP BY 1),
rc AS (SELECT l_orderkey AS k, COUNT(*) AS cr FROM lineitem
       WHERE l_orderkey IS NOT NULL GROUP BY 1),
j AS (SELECT lc.k AS kl, rc.k AS kr, lc.cl, rc.cr
      FROM lc FULL OUTER JOIN rc ON lc.k = rc.k)
SELECT
  CAST(CAST(SUM(CAST(COALESCE(cl, 0) AS DECIMAL(38,0))
                * CAST(COALESCE(cr, 0) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS n_pairs,
  CAST(SUM(CASE WHEN kl IS NOT NULL AND kr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS keys_both,
  CAST(SUM(CASE WHEN kr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS keys_left_only,
  CAST(SUM(CASE WHEN kl IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS keys_right_only,
  CAST(MAX(COALESCE(cl, 0)) AS BIGINT) AS max_left_fanout,
  CAST(MAX(COALESCE(cr, 0)) AS BIGINT) AS max_right_fanout
FROM j
"""


def q_jaccard_docs_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS set-similarity self-join (dedup.jaccard_prefix_join):
    every doc pair with word-3-gram-set Jaccard ≥ 0.8 via PPJoin
    prefix filtering (rare-first global order; losslessness is the
    prefix-filter theorem) + integer-exact threshold verification
    (5·|a∩b| ≥ 4·|a∪b| — no float compare). The exact complement of
    the approximate MinHash row; 3-gram elements keep the fixture's
    tiny shared vocabulary from saturating the sets (single-token
    Jaccard ≥ 0.8 matched 24% of ALL pairs — measured, NOTES r8).
    Oracle: TRUE brute-force cross join — quadratic by nature, hence
    spark-only at the 10× gate (the ngram_jaccard_uncapped precedent);
    the driver gate at sf0.01 runs the full brute force. Data-level."""
    from hawk_pack_spark.operators.dedup import jaccard_prefix_join

    docs = load_table(spark, "documents", sf_dir)
    return jaccard_prefix_join(docs, threshold=0.8, gram_n=3)


JACCARD_LOSSLESS_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
g AS (
  SELECT doc_id,
    list_sort(list_distinct(CASE WHEN len(ts) >= 3
      THEN list_transform(range(1, len(ts) - 1),
           i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])
      ELSE [] END)) AS gs
  FROM toks),
ne AS (SELECT doc_id, gs FROM g WHERE len(gs) > 0),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.gs, b.gs)) AS i,
         len(a.gs) AS la, len(b.gs) AS lb
  FROM ne a JOIN ne b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / (la + lb - i), 6) AS jaccard
FROM p WHERE 5 * i >= 4 * (la + lb - i)
"""


def q_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (graph.label_propagation, 4
    rounds) over the symmetrized co-purchase graph — deterministic
    (integer mode with min-label ties), so the oracle UNROLLS the same
    four rounds as chained CTEs and the result is bit-identical.
    Data-level (part, label)."""
    from hawk_pack_spark.operators.graph import copurchase_pairs, label_propagation

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    out = label_propagation(edges, iters=4)
    return out.select(F.col("node").alias("part"), "label")


def _label_propagation_sql(iters: int = 4) -> str:
    sql = """
WITH t AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS MATERIALIZED (
  SELECT pa AS s, dd FROM (SELECT pa, pb AS dd FROM und
                           UNION ALL SELECT pb, pa FROM und) q(pa, dd)),
nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM e),
l0 AS (SELECT node, node AS lab FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
v{i} AS (SELECT e.dd AS node, l{i - 1}.lab AS lab, COUNT(*) AS c
  FROM e JOIN l{i - 1} ON e.s = l{i - 1}.node GROUP BY 1, 2),
l{i} AS MATERIALIZED (
  SELECT node, (min({{'nc': -c, 'l': lab}})).l AS lab
  FROM v{i} GROUP BY node)"""
    sql += f"\nSELECT node AS part, lab AS label FROM l{iters}"
    return sql


def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent user-day event paths (analytics.top_event_paths):
    first 4 event types per (user, day) in deterministic (ts, event_id)
    order, '>'-joined, top-20 by (count desc, path). Path assembly
    sorts struct(step, type) INSIDE the aggregate — collect order never
    matters. Data-level."""
    from hawk_pack_spark.operators.analytics import top_event_paths

    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        "ts",
        "event_id",
    )
    return top_event_paths(
        ev,
        ["user_id", "day"],
        "event_type",
        ["ts", "event_id"],
        max_steps=4,
        k=20,
    )


TOP_PATHS_SQL = """
WITH stepped AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, day,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM stepped WHERE rn <= 4 GROUP BY user_id, day
),
counted AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_entities FROM paths GROUP BY path
)
SELECT path, n_entities,
       CAST(ROW_NUMBER() OVER (ORDER BY n_entities DESC, path) AS INTEGER) AS rank
FROM counted
QUALIFY rank <= 20
"""


def q_events_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type EWMA smoothing (analytics.ewma, α=0.5, span 8): the
    bounded span unrolls into 8 lag() calls sharing one window sort;
    weights are exact powers of two, num/den fold left-to-right
    identically in both engines. Data-level over every event row."""
    from hawk_pack_spark.operators.analytics import ewma

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "ts", "value"
    )
    out = ewma(ev, ["event_type"], "value", ["ts", "event_id"], alpha=0.5, span=8)
    return out.select("event_id", "event_type", "ewma")


def _ewma_sql(alpha: float = 0.5, span: int = 8) -> str:
    num, den = [], []
    for d in range(span):
        wt = repr(float((1.0 - alpha) ** d))
        x = f"lag(value, {d}) OVER w"
        num.append(
            f"CASE WHEN {x} IS NOT NULL THEN {x} * {wt} ELSE 0.0 END"
        )
        den.append(f"CASE WHEN {x} IS NOT NULL THEN {wt} ELSE 0.0 END")
    return f"""
SELECT event_id, event_type,
       ROUND(({' + '.join(num)}) / ({' + '.join(den)}), 6) AS ewma
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
"""


def q_fk_inclusion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK discovery (profile.inclusion_profile): inclusion coefficient
    for four candidate child→parent column pairs — the TPC-H FKs score
    1.0, the deliberately reversed pair scores < 1 (orders without
    lineitems). Two DISTINCT reductions + one key semi-join per pair;
    the join moves one row per distinct value. Data-level."""
    from hawk_pack_spark.operators.profile import inclusion_profile

    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    p = load_table(spark, "part", sf_dir)
    return inclusion_profile(
        [
            (li, "lineitem", "l_orderkey", o, "orders", "o_orderkey"),
            (o, "orders", "o_custkey", c, "customer", "c_custkey"),
            (li, "lineitem", "l_partkey", p, "part", "p_partkey"),
            (o, "orders", "o_orderkey", li, "lineitem", "l_orderkey"),
        ]
    )


FK_INCLUSION_SQL = """
WITH pair1 AS (
  SELECT 'lineitem.l_orderkey' AS child, 'orders.o_orderkey' AS parent,
    (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem WHERE l_orderkey IS NOT NULL) AS n_child_distinct,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) x
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = x.l_orderkey)) AS n_shared),
pair2 AS (
  SELECT 'orders.o_custkey', 'customer.c_custkey',
    (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders WHERE o_custkey IS NOT NULL),
    (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL) x
      WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = x.o_custkey))),
pair3 AS (
  SELECT 'lineitem.l_partkey', 'part.p_partkey',
    (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem WHERE l_partkey IS NOT NULL),
    (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey IS NOT NULL) x
      WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = x.l_partkey))),
pair4 AS (
  SELECT 'orders.o_orderkey', 'lineitem.l_orderkey',
    (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders WHERE o_orderkey IS NOT NULL),
    (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL) x
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = x.o_orderkey))),
u AS (SELECT * FROM pair1 UNION ALL SELECT * FROM pair2
      UNION ALL SELECT * FROM pair3 UNION ALL SELECT * FROM pair4)
SELECT child, parent, n_child_distinct, n_shared,
       ROUND(CAST(n_shared AS DOUBLE) / n_child_distinct, 6) AS inclusion
FROM u
"""


def q_mmr_diversify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (retrieval.mmr_rerank, λ=0.5) over each
    query's exact cosine top-24 — invariant row (greedy selection is
    not SQL-expressible; the booleans are the contract, computed live):
    every query returns exactly k=8 picks ⊆ its candidates; pick #1 is
    the relevance argmax (tie → min id); and the DISTRIBUTED
    applyInPandas result equals an INDEPENDENT local numpy greedy over
    the same candidates, pick-for-pick in rank order (the
    execution-equivalence contract). A mean-pairwise-diversity gate was
    tried first and removed: MMR penalizes the MAX similarity to the
    selected set, so mean-pairwise ≤ plain-top-k is NOT a theorem — it
    failed on the real fixture (NOTES r8). Any violation fails the
    hash."""
    from hawk_pack_spark.operators.retrieval import mmr_rerank

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    anchors = (
        emb.orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    # cand is read four times (rerank, subset audit, top-rel audit, the
    # driver-side recompute) and picked five times — materialize both
    # bounded frames once instead of re-running kNN + rerank per branch
    cand = knn_exact(emb, anchors, k=24, metric="cosine").select(
        "query_id",
        "vec_id",
        (F.lit(1.0) - F.col("dist")).alias("rel"),
        "rank",
    ).join(emb, "vec_id").localCheckpoint()
    picked = mmr_rerank(cand, k=8, lam=0.5).localCheckpoint()
    k_ok = picked.groupBy("query_id").agg(F.count(F.lit(1)).alias("_k"))
    subset_viol = picked.join(
        cand.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti"
    )
    top_rel = topk_rows(
        cand.select("query_id", "vec_id", "rel"),
        ["query_id"], "rel", 1, ascending=False, tie_cols=["vec_id"],
    ).select("query_id", F.col("vec_id").alias("_best"))
    first_viol = (
        picked.where(F.col("mmr_rank") == 1)
        .join(top_rel, "query_id")
        .where(F.col("vec_id") != F.col("_best"))
    )

    # independent local greedy over the SAME candidates (8×24 rows —
    # a driver-trivial recompute, the execution-equivalence oracle)
    import numpy as _np

    local = {}
    for row in cand.select("query_id", "vec_id", "rel", "embedding").collect():
        local.setdefault(row.query_id, []).append(
            (row.vec_id, row.rel, _np.asarray(row.embedding, dtype=_np.float64))
        )
    expect = []
    for qid, items in local.items():
        items.sort(key=lambda t: t[0])
        V = _np.array([v for _, _, v in items])
        nrm = _np.linalg.norm(V, axis=1)
        nrm[nrm == 0] = 1.0
        U = V / nrm[:, None]
        sim = U @ U.T
        rel = _np.array([r for _, r, _ in items])
        chosen, avail = [], _np.ones(len(items), dtype=bool)
        for rank in range(1, 9):
            penal = sim[:, chosen].max(axis=1) if chosen else _np.zeros(len(items))
            mmr = _np.where(avail, 0.5 * rel - 0.5 * penal, -_np.inf)
            best = int(_np.argmax(mmr))
            chosen.append(best)
            avail[best] = False
            expect.append((qid, items[best][0], rank))
    expect_df = spark.createDataFrame(
        expect, "query_id long, vec_id long, mmr_rank int"
    )
    mism = (
        picked.select("query_id", "vec_id", "mmr_rank")
        .exceptAll(expect_df)
        .unionAll(
            expect_df.exceptAll(picked.select("query_id", "vec_id", "mmr_rank"))
        )
    )
    return (
        anchors.agg(F.count(F.lit(1)).alias("n_queries"))
        .crossJoin(
            k_ok.agg(
                F.min("_k").alias("_kmin"), F.max("_k").alias("_kmax")
            )
        )
        .crossJoin(subset_viol.agg(F.count(F.lit(1)).alias("_sv")))
        .crossJoin(first_viol.agg(F.count(F.lit(1)).alias("_fv")))
        .crossJoin(mism.agg(F.count(F.lit(1)).alias("_mm")))
        .select(
            "n_queries",
            ((F.col("_kmin") == 8) & (F.col("_kmax") == 8)).alias("k_exact_ok"),
            (F.col("_sv") == 0).alias("subset_ok"),
            (F.col("_fv") == 0).alias("first_pick_ok"),
            (F.col("_mm") == 0).alias("matches_local_greedy"),
        )
    )


MMR_SQL = """
SELECT CAST(8 AS BIGINT) AS n_queries, TRUE AS k_exact_ok,
       TRUE AS subset_ok, TRUE AS first_pick_ok, TRUE AS matches_local_greedy
"""


def q_tfidf_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction (bm25.tfidf_top_terms): every document's
    top-3 terms by tf·ln(N/df), ties by term — one explode, two
    groupBys, one postings-sized equi-join, one per-doc window.
    Data-level (the ln-after-ROUND(6) parity pattern bm25_topk has
    held green since r2)."""
    from hawk_pack_spark.operators.bm25 import tfidf_top_terms

    docs = load_table(spark, "documents", sf_dir)
    return tfidf_top_terms(docs, k=3)


TFIDF_KEYWORDS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
    string_split(lower(text), ' '), t -> t <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
s AS (
  SELECT doc_id, term, tf,
         ROUND(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN nd)
SELECT doc_id, term, tf, score, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn FROM s)
WHERE rn <= 3
"""


def q_copurchase_item_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine recommender (graph.item_similarity): top-5
    neighbors per part by n_ab/√(n_a·n_b) over order baskets — the
    pair mining's one wide shuffle plus two degree joins and a window,
    nothing quadratic in the item count. Data-level."""
    from hawk_pack_spark.operators.graph import item_similarity

    li = load_table(spark, "lineitem", sf_dir)
    return item_similarity(li, "l_orderkey", "l_partkey", min_support=2, k=5)


ITEM_SIM_SQL = """
WITH t AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS (
  SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT p, COUNT(*) AS n FROM t GROUP BY 1),
sym AS (
  SELECT pa AS item, pb AS other, n_ab FROM und
  UNION ALL SELECT pb, pa, n_ab FROM und),
s AS (
  SELECT sym.item, sym.other, sym.n_ab,
         ROUND(sym.n_ab / sqrt(CAST(da.n AS DOUBLE) * db.n), 6) AS sim
  FROM sym JOIN deg da ON da.p = sym.item JOIN deg db ON db.p = sym.other)
SELECT item, other, n_ab, sim, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
                                   ORDER BY sim DESC, other) AS rn FROM s)
WHERE rn <= 5
"""


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules A→B (graph.association_rules) over per-user
    event-type baskets ("users who view also click"):
    support/confidence/lift from ONE pair-mining shuffle plus two
    degree joins and a broadcast 1-row basket total — nothing
    quadratic in the item count, no driver action. (TPC-H part
    baskets are key-uniform by construction — every rule's confidence
    is ~1/|parts|, an empty result at any threshold — so the events
    table is the fixture with real co-occurrence structure.)
    Data-level: every qualifying rule row."""
    from hawk_pack_spark.operators.graph import association_rules

    ev = load_table(spark, "events", sf_dir)
    return association_rules(
        ev, "user_id", "event_type", min_support=2, min_confidence=0.5
    )


BASKET_RULES_SQL = """
WITH t AS (SELECT DISTINCT user_id AS b, event_type AS i FROM events),
pairs AS (
  SELECT a.i AS item_a, bb.i AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM t a JOIN t bb ON a.b = bb.b AND a.i < bb.i
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
tot AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets FROM t),
sym AS (
  SELECT item_a AS antecedent, item_b AS consequent, n_ab FROM pairs
  UNION ALL SELECT item_b, item_a, n_ab FROM pairs)
SELECT antecedent, consequent, n_ab, da.n AS n_a, db.n AS n_b,
       ROUND(CAST(n_ab AS DOUBLE) / da.n, 6) AS confidence,
       ROUND((CAST(n_ab AS DOUBLE) / da.n)
             / (CAST(db.n AS DOUBLE) / tot.n_baskets), 6) AS lift
FROM sym JOIN deg da ON sym.antecedent = da.i
         JOIN deg db ON sym.consequent = db.i, tot
WHERE ROUND(CAST(n_ab AS DOUBLE) / da.n, 6) >= 0.5
"""


def q_events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-row EXACT rolling median per event type
    (analytics.rolling_median): ONE window sort, per-row state bounded
    by the frame. Integer-cents capture + interpolated middle +
    round-free IEEE division keep every value engine-identical.
    Data-level over all event rows."""
    from hawk_pack_spark.operators.analytics import rolling_median

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "ts", "value"
    )
    out = rolling_median(
        ev, ["event_type"], ["ts", "event_id"], "value", window_rows=10
    )
    return out.select("event_id", "event_type", "rolling_median")


ROLLING_MEDIAN_SQL = """
SELECT event_id, event_type,
       median(CAST(ROUND(value * 100) AS BIGINT)) OVER (
         PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) / 100 AS rolling_median
FROM events
"""


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier flag via median absolute deviation
    (analytics.mad_outliers, k=3): immune to the masking that breaks
    z-scores when the spike itself inflates σ. Two same-key groupBy
    passes over (key, cents); the k·MAD boundary compares exact
    half-integer doubles, engine-identical. Data-level."""
    from hawk_pack_spark.operators.analytics import mad_outliers

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    out = mad_outliers(ev, ["event_type"], "value", k=3.0)
    return out.select("event_id", "event_type", "value")


MAD_OUTLIERS_SQL = """
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events),
med AS (SELECT event_type, median(c) AS m FROM v GROUP BY 1),
mad AS (
  SELECT v.event_type, median(ABS(v.c - med.m)) AS md
  FROM v JOIN med USING (event_type) GROUP BY 1)
SELECT v.event_id, v.event_type, v.value
FROM v JOIN med USING (event_type) JOIN mad USING (event_type)
WHERE mad.md > 0 AND ABS(v.c - med.m) > 3.0 * mad.md
"""


def q_token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (bm25.pmi_pairs): top-50 token pairs by
    doc-level pointwise mutual information, per-doc term cap 128 (the
    pair fan-out bound that keeps the doc self-join linear in the
    corpus), min co-occurrence 5. Data-level."""
    from hawk_pack_spark.operators.bm25 import pmi_pairs

    docs = load_table(spark, "documents", sf_dir)
    return pmi_pairs(docs, min_pairs=5, max_terms_per_doc=128, k=50)


TOKEN_PMI_SQL = """
WITH toks AS (
  SELECT doc_id AS d,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x != '')) AS term
  FROM documents),
tf AS (SELECT d, term, COUNT(*) AS _tf FROM toks GROUP BY 1, 2),
capped AS (
  SELECT d, term FROM (
    SELECT d, term,
           ROW_NUMBER() OVER (PARTITION BY d
                              ORDER BY _tf DESC, term ASC) AS rn
    FROM tf)
  WHERE rn <= 128),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM documents),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS _df
          FROM capped GROUP BY 1),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM capped a JOIN capped b ON a.d = b.d AND a.term < b.term
  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
scored AS (
  SELECT term_a, term_b, n_ab, da._df AS n_a, db._df AS n_b,
         ROUND(LN(CAST(n_ab AS DOUBLE) * nd.n_docs
                  / (CAST(da._df AS DOUBLE) * db._df)), 6) AS pmi
  FROM pairs JOIN dfreq da ON pairs.term_a = da.term
             JOIN dfreq db ON pairs.term_b = db.term, nd)
SELECT term_a, term_b, n_ab, n_a, n_b, pmi,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, term_a, term_b)
            AS INTEGER) AS rank
FROM scored
ORDER BY pmi DESC, term_a, term_b
LIMIT 50
"""


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (bloomjoin.bloom_semi_join):
    prune lineitem against the URGENT-order key set with a broadcast
    bit array (~10 bits/key — broadcastable where a 100M-key hash set
    is not), then verify exactly over the survivors only. The oracle
    is the PLAIN semi-join: the operator's whole contract is that the
    probabilistic phase changes nothing. Data-level over every
    surviving lineitem row."""
    from hawk_pack_spark.operators.bloomjoin import bloom_semi_join

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    out = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    return out.select("l_orderkey", "l_linenumber", "l_quantity")


BLOOM_SEMI_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_orderkey IN
      (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def q_user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user categorical dispersion of event_type
    (profile.group_entropy): Shannon entropy, normalized entropy, Gini
    impurity — the domain-mix diagnostics run before/after sampling.
    Entropy's float sum folds over the CATEGORY-SORTED count list on
    both engines (deterministic IEEE order, the repo's no-shuffle-
    order-float-sums discipline); Gini impurity divides an exact
    integer Σc². Data-level, one row per user."""
    from hawk_pack_spark.operators.profile import group_entropy

    ev = load_table(spark, "events", sf_dir)
    return group_entropy(ev, ["user_id"], "event_type")


GROUP_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
g AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_categories,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(SUM(n * n) AS BIGINT) AS ss,
         list(CAST(n AS DOUBLE) ORDER BY event_type) AS l
  FROM c GROUP BY 1),
h AS (
  SELECT *,
         LN(n_rows) - list_reduce(list_transform(l, x -> x * LN(x)),
                                  (a, b) -> a + b) / n_rows AS ent
  FROM g)
SELECT user_id, n_categories, n_rows,
       ROUND(ent, 6) AS entropy,
       CASE WHEN n_categories > 1
            THEN ROUND(ent / LN(CAST(n_categories AS DOUBLE)), 6)
            ELSE 0.0 END AS norm_entropy,
       ROUND(1.0 - CAST(ss AS DOUBLE)
                   / (CAST(n_rows AS DOUBLE) * n_rows), 6)
         AS gini_impurity
FROM h
"""


def q_nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile (analytics.gini_concentration):
    Gini coefficient of per-customer total spend within each nation —
    0 = spend spread evenly, →1 = one whale. One groupBy for spend
    cents, one ranked window + groupBy per nation; exact decimal
    accumulators, two final float divisions. Data-level, one row per
    nation."""
    from hawk_pack_spark.operators.analytics import gini_concentration

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)"))
        .cast("double")
        .alias("spend_cents")
    )
    j = (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "spend_cents")
    )
    return gini_concentration(j, ["n_name"], "spend_cents", decimals=0)
