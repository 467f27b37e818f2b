"""remaining TPC-H shapes + assorted relational

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price
from hawk_pack_spark.queries.catalog_ann import _ann_summary  # noqa: F401
from hawk_pack_spark.queries.catalog_vector import _embeddings_vectors  # noqa: F401



MULTIMODAL_SQL = """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_media,
       CAST(3 AS BIGINT) AS n_kinds,
       TRUE AS dim_ok,
       TRUE AS unit_norm_ok,
       (SELECT CAST(SUM(((n_chars % 30 + 1) - 1) // 5 + 1) AS BIGINT)
        FROM documents WHERE doc_id % 3 = 2) AS n_frames_sampled,
       TRUE AS ann_self_ok
"""


# ---------------------------------------------------------------------------
# registry

def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filter + global aggregate. The whole
    query should collapse to one parquet scan with every predicate in
    PushedFilters and a two-column ReadSchema."""
    li = load_table(spark, "lineitem", sf_dir)
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_discount").cast("decimal(12,6)")
    ).cast("decimal(24,8)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(revenue).cast("string").cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q06_SQL = """
SELECT
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * CAST(l_discount AS DECIMAL(12,6)) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24
"""


def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: no l_commitdate in the fixture — the
    EXISTS correlates on returned lineitems instead): quarterly order
    counts per priority where a matching lineitem exists. Left-semi join
    keeps the probe side unduplicated, the Spark rendering of EXISTS."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio over a broadcast
    dimension join (promo revenue share for one ship-month)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
            F.lit(0).cast("decimal(24,8)")
        )
    ).cast("string").cast("double")
    total = F.sum(_disc_price()).cast("string").cast("double")
    return joined.agg(
        F.round(F.lit(100.0) * promo / total, 6).alias("promo_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q14_SQL = """
SELECT
  ROUND(100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))
      ELSE CAST(0 AS DECIMAL(24,8)) END) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE),
    6) AS promo_share,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a HAVING aggregate (large-
    quantity orders), then a 3-way join for the report. The HAVING
    filter runs map-side-combinable before the join — at 100 TB the
    aggregate output (few keys) broadcasts back onto orders."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), "sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunct groups across the join
    (brand × size × quantity bands). Catalyst extracts the common
    `l_partkey = p_partkey` equi-condition and pushes the OR residual as
    a post-join filter; per-branch p_brand/p_size conjuncts still prune
    the broadcast side."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    branch1 = (
        (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)
    )
    return joined.where(branch1 | branch2 | branch3).agg(
        F.sum(_disc_price()).cast("string").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority) — all four grouping sets, the
    complement of the ROLLUP query's prefix sets."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             _dec_sum(F.col("o_totalprice"), "sum_total"))
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp in the fixture): correlated
    scalar-subquery equality — suppliers whose balance equals their
    nation's maximum. Spark renders the correlation as a broadcast join
    against the tiny per-nation aggregate."""
    sup = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    max_bal = sup.groupBy(F.col("s_nationkey").alias("mk")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    return (
        sup.join(F.broadcast(max_bal),
                 (F.col("s_nationkey") == F.col("mk"))
                 & (F.col("s_acctbal") == F.col("max_bal")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", F.col("s_acctbal").alias("acctbal"))
    )


TOP_SUPPLIER_SQL = """
SELECT n_name, s_name, s_acctbal AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = supplier.s_nationkey)
"""


def q_purchase_window_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (points-in-intervals): engagement events attributed to
    the 15-minute window after each purchase by the same user. Runs as a
    binned equi-join (operators/range_join.py) — never a
    BroadcastNestedLoopJoin. Window math on floor-truncated epoch
    seconds (the catalog's cross-engine timestamp convention)."""
    from hawk_pack_spark.operators.range_join import range_join_points

    ev = load_table(spark, "events", sf_dir)
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    pts = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_id", sec.alias("sec"), "value"
    )
    iv = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        sec.alias("w_start"),
        (sec + 900).alias("w_end"),
    )
    joined = range_join_points(
        pts, iv, "sec", "w_start", "w_end", bin_width_s=900, keys=["user_id"]
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        _dec_sum(F.col("value"), "sum_value", scale=6),
    )


RANGE_JOIN_SQL = """
WITH pts AS (
  SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec, value
  FROM events WHERE event_type IN ('click', 'view')
), iv AS (
  SELECT user_id, event_id AS purchase_id,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS w_start,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) + 900 AS w_end
  FROM events WHERE event_type = 'purchase'
)
SELECT purchase_id, COUNT(*) AS n_follow,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM pts JOIN iv ON pts.user_id = iv.user_id
 AND pts.sec >= iv.w_start AND pts.sec < iv.w_end
GROUP BY purchase_id
"""




NGRAM_JACCARD_CAPPED_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
g AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ts) >= 3
      THEN list_transform(range(1, len(ts) - 1),
           i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])
      ELSE [] END) AS gs
  FROM toks),
e0 AS (SELECT doc_id, unnest(gs) AS gram FROM g),
keep AS (SELECT gram FROM e0 GROUP BY gram HAVING COUNT(*) <= 20),
ef AS (SELECT e0.doc_id, e0.gram FROM e0 JOIN keep USING (gram)),
sz AS (SELECT doc_id, COUNT(*) AS ng FROM ef GROUP BY doc_id),
e AS (SELECT ef.doc_id, sz.ng, ef.gram FROM ef JOIN sz USING (doc_id)),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
    COUNT(*) AS inter
  FROM e a JOIN e b USING (gram)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
j AS (
  SELECT id_a, id_b,
    ROUND(inter * 1.0 / (na + nb - inter), 6) AS jaccard
  FROM shared)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.01
"""


def q_customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth in one pass: quartile (ntile),
    percent_rank, cume_dist, and dense_rank over account balance within
    each market segment — one Window, one shuffle."""
    cust = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


RANKS_SQL = """
SELECT c_mktsegment, c_custkey,
  NTILE(4)        OVER w AS quartile,
  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
  ROUND(CUME_DIST()    OVER w, 6) AS cume,
  DENSE_RANK()    OVER w AS drank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def q_nation_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (the record-linkage primitive):
    nation-name pairs within Levenshtein distance 1. The 25-row dim
    crossjoins trivially; at scale the same verify step runs on
    LSH/band-bucketed candidates instead of the full cross product."""
    nation = load_table(spark, "nation", sf_dir)
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    return (
        a.crossJoin(b)
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= 1)
    )


FUZZY_SQL = """
SELECT a.n_name AS name_a, b.n_name AS name_b,
       levenshtein(a.n_name, b.n_name) AS edit_dist
FROM nation a JOIN nation b ON a.n_name < b.n_name
WHERE levenshtein(a.n_name, b.n_name) <= 1
"""


def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in `session_window` (the streaming-native session
    operator, here in batch): per (user, session) event counts and value
    sums with a 30-min gap. Merge rule is strict (`next.ts < prev.ts +
    gap`), mirrored in the oracle as a break on `diff >= 1800`; window
    bounds reported as floor-epoch seconds (catalog convention)."""
    ev = load_table(spark, "events", sf_dir)
    per = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n_events"),
        _dec_sum(F.col("value"), "sum_value"),
    )
    return per.select(
        "user_id",
        F.floor(F.col("session_window.start").cast("double")).cast("long").alias("sess_start"),
        F.floor(F.col("session_window.end").cast("double")).cast("long").alias("sess_end"),
        "n_events",
        "sum_value",
    )


SESSION_WINDOW_SQL = """
WITH g AS (
  SELECT user_id, ts, value, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR EPOCH(ts) - EPOCH(lag(ts) OVER w) >= 1800
         THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
    -- tie key (event_id) in BOTH windows: with duplicate timestamps the
    -- two windows would otherwise order the tie group independently and
    -- the brk flag could land mid-group, splitting a session Spark's
    -- value-based session_window never splits (caught at the sf1 gate,
    -- whose 10x replication creates exact-tie timestamps)
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
  CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS sess_start,
  CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) + 1800 AS sess_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
"""


def q_events_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation computed skew-safely (operators/skew.py):
    events has only 5 event types, the degenerate key distribution where
    one reducer would take 20% of all rows. Two-stage salted aggregation
    spreads each hot key over 16 reducers; count/sum are decomposable so
    the result equals the naive groupBy — which is exactly the oracle."""
    from hawk_pack_spark.operators.skew import salted_count_sum

    ev = load_table(spark, "events", sf_dir)
    return salted_count_sum(ev, ["event_type"], sum_col="value")


SALTED_AGG_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction — the id-assignment step of every
    tokenizer pipeline: corpus-wide token counts, top-200 by frequency,
    dense ids in (count desc, token asc) order. One explode + one
    partial-aggregated groupBy; the top-k and id assignment run on the
    tiny aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    counts = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("token_id", F.row_number().over(w))
        .where(F.col("token_id") <= 200)
        .select("token_id", "token", "n")
    )


VOCAB_SQL = """
WITH ex AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x != '')) AS token
  FROM documents),
counts AS (SELECT token, COUNT(*) AS n FROM ex GROUP BY token)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS INT) AS token_id,
       token, n
FROM counts
QUALIFY token_id <= 200
"""


def q_pq_ann_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN with exact re-rank (operators/pq.py): the
    32×-compressed scan path, summarized against the exact kNN computed
    in the same job (k-means training isn't SQL; the summary row is —
    recall vs exact is additionally asserted in tests/test_pq.py)."""
    from hawk_pack_spark.operators import pq

    vecs = _embeddings_vectors(spark, sf_dir)
    cb = pq.pq_train(vecs, m=8, k=64, seed=7)
    enc = pq.pq_encode(vecs, cb)
    queries = vecs.where(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # oversample=20: measured recall@10 is 1.00 at sf0.01 and 0.91 at
    # sf0.1 (vs 0.76/0.66 at 5×) — the shortlist re-rank still touches
    # only 200 float rows per query
    ann = pq.pq_search(enc, cb, queries, kth=10, rerank_with=vecs, oversample=20)
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    return _ann_summary(ann, exact, k=10, min_recall=0.8)


PQ_SUMMARY_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(10 * COUNT(*) AS BIGINT) AS n_results,
       TRUE AS ranks_ok, TRUE AS recall_ok
FROM embeddings WHERE vec_id % 100 = 3
"""


def q_ivfpq_ann_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (r6, operators/pq.py ivfpq_build/ivfpq_search): coarse
    cells + PQ over residuals, routed ADC + exact re-rank — the
    byte-budgeted, partition-prunable index. Summarized against the
    exact kNN in the same job; nprobe covers every cell here so the
    gate tests the residual-ADC + re-rank pipeline, not routing loss
    (routing/pruning is pinned in tests/test_pq.py)."""
    from hawk_pack_spark.operators import pq

    vecs = _embeddings_vectors(spark, sf_dir)
    encoded, centers, cb = pq.ivfpq_build(
        vecs, n_clusters=8, m=8, k=64, seed=7
    )
    queries = vecs.where(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = pq.ivfpq_search(
        encoded, centers, cb, queries, kth=10, nprobe=8,
        rerank_with=vecs, oversample=20,
    )
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    return _ann_summary(ann, exact, k=10, min_recall=0.8)


def q_sq8_ann_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN (operators/similarity.py sq8_*): the
    4×-compressed near-exact scan path between the float BLAS scan and
    PQ's 32× codes — per-dimension uint8 affine codes, asymmetric
    decode-tile matmul, exact float re-rank on an oversampled
    shortlist. Summarized against the exact kNN computed in the same
    job (min/max training isn't SQL; recall + reconstruction bounds are
    additionally pinned in tests/test_sq8.py). min_recall 0.95: SQ8's
    recall is data-shape independent, unlike PQ's."""
    from hawk_pack_spark.operators import similarity as S

    vecs = _embeddings_vectors(spark, sf_dir)
    lo, scale = S.sq8_train(vecs)
    enc = S.sq8_encode(vecs, lo, scale)
    queries = vecs.where(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = S.sq8_topk(enc, lo, scale, queries, k=10, rerank_with=vecs, oversample=4)
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    return _ann_summary(ann, exact, k=10, min_recall=0.95)


def q_ivfsq8_ann_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 (r7, operators/pq.py ivfsq8_build/ivfsq8_search —
    VERDICT r6 #7): coarse cells + SQ8 over residuals — IVF-PQ's
    partition-prunable cell structure with SQ8's shape-independent
    recall, the natural default for clustered-or-unknown corpora.
    Summarized against the exact kNN in the same job; nprobe covers
    every cell so the gate tests residual quantization + re-rank, not
    routing loss (routing/pruning/recall-by-shape pinned in
    tests/test_pq.py). min_recall 0.95: like flat SQ8, recall is
    bounded by 8-bit quantization error alone."""
    from hawk_pack_spark.operators import pq

    vecs = _embeddings_vectors(spark, sf_dir)
    encoded, centers, lo, scale = pq.ivfsq8_build(vecs, n_clusters=8, seed=7)
    queries = vecs.where(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = pq.ivfsq8_search(
        encoded, centers, lo, scale, queries, kth=10, nprobe=8,
        rerank_with=vecs, oversample=4,
    )
    exact = knn_exact(vecs, queries, k=10, metric="l2_sq")
    return _ann_summary(ann, exact, k=10, min_recall=0.95)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over the documents fixture (operators/bm25.py):
    postings + idf + length-normalized tf scoring, top-10 per query.
    Two queries of exactly TWO terms each: a two-operand float sum is
    order-independent (fp addition commutes; only associativity breaks),
    so the score hash-matches the oracle. Both engines rank on the
    score ROUNDED to 6 decimals (score_round=6 here, ROUND(SUM(s),6)
    in the oracle) so sub-quantum score differences can't swap ranks."""
    from hawk_pack_spark.operators.bm25 import bm25_build, bm25_search

    docs = load_table(spark, "documents", sf_dir)
    index = bm25_build(docs)
    qs = spark.createDataFrame(
        [(0, ["scan", "merge"]), (1, ["window", "join"])],
        "query_id long, terms array<string>",
    )
    return bm25_search(index, qs, k=10, score_round=6).select(
        "query_id", "doc_id", "score", "rank"
    )


BM25_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
ex AS (SELECT doc_id, unnest(ts) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM ex GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
q AS (
  SELECT 0 AS query_id, unnest(['scan', 'merge']) AS term
  UNION ALL
  SELECT 1 AS query_id, unnest(['window', 'join']) AS term),
s AS (
  SELECT q.query_id, tf.doc_id,
    ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
  FROM q
  JOIN tf USING (term)
  JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, corpus),
sc AS (SELECT query_id, doc_id, ROUND(SUM(s), 6) AS score
       FROM s GROUP BY query_id, doc_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      FROM sc)
SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 10
"""



def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate (Rae et al. 2021, Table A1), word
    level: per-lang totals of top-2-gram concentration and duplicated
    5-gram mass, plus how many docs the gate rejects. Integer-only
    (fractions compared by cross-multiplication) so parity is exact."""
    from hawk_pack_spark.functions.curation import repetition_stats

    docs = load_table(spark, "documents", sf_dir)
    per_doc = repetition_stats(docs)
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("repetitive").alias("n_repetitive"),
        F.sum("max_short").alias("sum_max2"),
        F.sum("n_short").alias("sum_n2"),
        F.sum("dup_long").alias("sum_dup5"),
        F.sum("n_long").alias("sum_n5"),
    )


REPETITION_SQL = """
WITH toks AS (
  SELECT lang, doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
g2 AS (
  SELECT lang, doc_id, unnest(CASE WHEN len(ts) >= 2
    THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
    ELSE [] END) AS gram
  FROM toks),
c2 AS (SELECT lang, doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2, 3),
d2 AS (SELECT lang, doc_id, MAX(c) AS max_short,
         CAST(SUM(c) AS BIGINT) AS n_short FROM c2 GROUP BY 1, 2),
g5 AS (
  SELECT lang, doc_id, unnest(CASE WHEN len(ts) >= 5
    THEN list_transform(range(1, len(ts) - 3),
         i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] || ' '
              || ts[i + 3] || ' ' || ts[i + 4])
    ELSE [] END) AS gram
  FROM toks),
c5 AS (SELECT lang, doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY 1, 2, 3),
d5 AS (SELECT lang, doc_id,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_long,
         CAST(SUM(c) AS BIGINT) AS n_long FROM c5 GROUP BY 1, 2),
per_doc AS (
  SELECT d2.lang, d2.doc_id, max_short, n_short,
    COALESCE(dup_long, 0) AS dup_long, COALESCE(n_long, 0) AS n_long,
    CASE WHEN max_short * 1000 > n_short * 200
           OR COALESCE(dup_long, 0) * 1000 > COALESCE(n_long, 0) * 100
         THEN 1 ELSE 0 END AS repetitive
  FROM d2 LEFT JOIN d5 ON d2.lang = d5.lang AND d2.doc_id = d5.doc_id)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(repetitive) AS BIGINT) AS n_repetitive,
  CAST(SUM(max_short) AS BIGINT) AS sum_max2,
  CAST(SUM(n_short) AS BIGINT) AS sum_n2,
  CAST(SUM(dup_long) AS BIGINT) AS sum_dup5,
  CAST(SUM(n_long) AS BIGINT) AS sum_n5
FROM per_doc GROUP BY lang
"""


def q_decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (GPT-3 App. C): docs with doc_id % 37 = 0
    stand in for the benchmark; every other doc is flagged when >= 3 of
    its distinct word 3-grams appear in the eval gram set. The eval gram
    set is broadcast — the corpus side never shuffles for the join."""
    from hawk_pack_spark.functions.curation import decontaminate

    docs = load_table(spark, "documents", sf_dir)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    tr = docs.where(F.col("doc_id") % 37 != 0)
    flagged = decontaminate(tr, ev, n=3, min_hits=3)
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum("contaminated").alias("n_contaminated"),
        F.sum("hits").alias("sum_hits"),
    )


DECONTAMINATE_SQL = """
WITH toks AS (
  SELECT lang, doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
g AS (
  SELECT lang, doc_id, unnest(list_distinct(CASE WHEN len(ts) >= 3
    THEN list_transform(range(1, len(ts) - 1),
         i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])
    ELSE [] END)) AS gram
  FROM toks),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
hits AS (
  SELECT g.lang, g.doc_id, COUNT(*) AS hits
  FROM g JOIN ev USING (gram)
  WHERE g.doc_id % 37 != 0
  GROUP BY 1, 2),
flagged AS (
  SELECT d.lang, d.doc_id, COALESCE(h.hits, 0) AS hits,
    CASE WHEN COALESCE(h.hits, 0) >= 3 THEN 1 ELSE 0 END AS contaminated
  FROM documents d LEFT JOIN hits h
    ON d.lang = h.lang AND d.doc_id = h.doc_id
  WHERE d.doc_id % 37 != 0)
SELECT lang, COUNT(*) AS n_train,
  CAST(SUM(contaminated) AS BIGINT) AS n_contaminated,
  CAST(SUM(hits) AS BIGINT) AS sum_hits
FROM flagged GROUP BY lang
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixing gate: per-language keep rates applied
    as hash64(salt || doc_id) mod 1000 < rate — reproducible across
    runs, engines, and partitionings (no RNG state). Reports per-lang
    kept doc and token counts."""
    from hawk_pack_spark.functions.curation import stratified_keep

    docs = load_table(spark, "documents", sf_dir)
    rates = {"en": 800, "de": 500, "fr": 500, "es": 250, "zh": 250}
    kept = F.when(
        stratified_keep("doc_id", "lang", rates, default_permille=100), F.lit(1)
    ).otherwise(F.lit(0))
    d = docs.select("lang", kept.alias("keep"), T.token_count("text").alias("t"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("keep").alias("n_kept"),
        F.sum(F.col("keep") * F.col("t")).alias("kept_tokens"),
    )


STRATIFIED_SQL = """
WITH d AS (
  SELECT lang,
    CASE WHEN CAST(concat('0x', substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
         < (CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500 WHEN 'fr' THEN 500
                      WHEN 'es' THEN 250 WHEN 'zh' THEN 250 ELSE 100 END)
         THEN 1 ELSE 0 END AS keep,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS t
  FROM documents)
SELECT lang, COUNT(*) AS n_total,
  CAST(SUM(keep) AS BIGINT) AS n_kept,
  CAST(SUM(keep * t) AS BIGINT) AS kept_tokens
FROM d GROUP BY lang
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context-window packing (budget 128 tokens) per language
    stream, the pre-tokenization stage of a training pipeline. The
    per-stream recurrence runs in an applyInPandas kernel (a running
    total with conditional reset is not expressible as a window
    function); streams fan out across executors. Oracle: the identical
    recurrence as a recursive CTE."""
    from hawk_pack_spark.operators.packing import pack_sequences

    docs = load_table(spark, "documents", sf_dir).select(
        "lang", "doc_id", T.token_count("text").cast("long").alias("n_tokens")
    )
    packed = pack_sequences(docs, budget=128)
    bins = packed.groupBy("lang", "bin_id").agg(
        F.sum("n_tokens").alias("bt"), F.count(F.lit(1)).alias("nd")
    )
    return bins.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("nd").alias("n_docs"),
        F.sum("bt").alias("total_tokens"),
        F.max("bt").alias("max_bin_tokens"),
    )


PACK_SQL = """
WITH RECURSIVE toks AS (
  SELECT lang, doc_id,
    CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x != '')) AS BIGINT) AS t,
    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents),
pack AS (
  SELECT lang, rn, t, t AS fill, CAST(1 AS BIGINT) AS bin
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT k.lang, k.rn, k.t,
    CASE WHEN p.fill + k.t > 128 THEN k.t ELSE p.fill + k.t END,
    CASE WHEN p.fill + k.t > 128 THEN p.bin + 1 ELSE p.bin END
  FROM toks k JOIN pack p ON k.lang = p.lang AND k.rn = p.rn + 1),
bins AS (
  SELECT lang, bin, CAST(SUM(t) AS BIGINT) AS bt, COUNT(*) AS nd
  FROM pack GROUP BY 1, 2)
SELECT lang, COUNT(*) AS n_bins, CAST(SUM(nd) AS BIGINT) AS n_docs,
  CAST(SUM(bt) AS BIGINT) AS total_tokens, MAX(bt) AS max_bin_tokens
FROM bins GROUP BY lang
"""


def q_semdedup_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding near-dup restricted to
    k-means cells — the published scale path that replaces the O(n²)
    all-pairs sweep with Σ|cell|² work. The fixture's embeddings are iid
    (max natural cosine 0.60 at every sf), so the query PLANTS the
    near-dups it must find: every vec_id < 200 gets a deterministic
    perturbed twin (cos ≈ 0.999) at vec_id + 1e6. At threshold 0.9 the
    exact pair set is then precisely the 200 planted pairs — a count
    the DuckDB oracle derives from the table — and the summary checks
    (a) cluster-pruned pairs ⊆ exact pairs (computed in-engine by the
    block-partitioned exact verifier) and (b) recall >= 95% (twins must
    co-cluster)."""
    from hawk_pack_spark.operators.dedup import semdedup_pairs
    from hawk_pack_spark.operators.similarity import all_pairs_cosine_numpy

    emb = _embeddings_vectors(spark, sf_dir)
    base_id = F.col("vec_id")
    twins = emb.where(base_id < 200).select(
        (base_id + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.lit(0.01) * F.sin(base_id * (i.cast("double") + F.lit(1.0))),
        ).alias("embedding"),
    )
    aug = emb.unionByName(twins)
    # both pair sets feed TWO consumers each (the subset anti-join and
    # their count aggregates) — materialize once so the k-means-backed
    # pruned pipeline and the blocked exact verifier each run a single
    # time (bounded: pair-count rows; values unchanged)
    pruned = semdedup_pairs(aug, threshold=0.9, n_clusters=8).localCheckpoint()
    exact = all_pairs_cosine_numpy(aug, threshold=0.9).localCheckpoint()
    viol = pruned.join(exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
        .crossJoin(pruned.agg(F.count(F.lit(1)).alias("_np")))
        .crossJoin(viol.agg(F.count(F.lit(1)).alias("_nv")))
        .select(
            "n_exact_pairs",
            (F.col("_nv") == 0).alias("subset_ok"),
            (F.col("_np") * 100 >= F.col("n_exact_pairs") * 95).alias("recall_ok"),
        )
    )


SEMDEDUP_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS subset_ok, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 200
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate (the second filtering tier of GPT-3
    App. A / FineWeb): a seeded logistic regression over cheap per-doc
    features, trained to separate spam from natural text and applied to
    a held-out split. The fixture has no spam, so the query PLANTS it:
    every doc_id % 4 == 0 gets a twin (id + 1e6) whose text is its
    first 3 tokens repeated 12 times. The hash-gate split (80/20) is
    engine-portable, so the oracle derives n_train/n_holdout exactly;
    the learned gate must reach 95% holdout accuracy (boolean).
    Training is LBFGS treeAggregates — scale-safe; score is one
    codegen'd projection + model transform."""
    from hawk_pack_spark.functions.curation import (
        fit_quality_model,
        quality_features,
        stratified_keep,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ts = T.tokens("text")
    spam_text = F.concat_ws(
        " ", F.flatten(F.array_repeat(F.slice(ts, 1, 3), 12))
    )
    spam = docs.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        spam_text.alias("text"),
    )
    aug = docs.unionByName(spam).withColumn(
        "label", (F.col("doc_id") >= 1_000_000).cast("int")
    )
    feats = quality_features("text")
    featured = aug.select(
        "doc_id", "label", *[expr.alias(name) for name, expr in feats.items()]
    )
    # 80/20 deterministic hash split (rates_permille={} -> default 800)
    is_train = stratified_keep("doc_id", F.lit("x"), {}, default_permille=800, salt="split")
    featured = featured.withColumn("is_train", is_train).localCheckpoint()
    model = fit_quality_model(featured.where(F.col("is_train")), label_col="label")
    scored = model.transform(featured.where(~F.col("is_train")))
    correct = (F.col("prediction") == F.col("label")).cast("int")
    return (
        featured.agg(
            F.sum(F.col("is_train").cast("int")).alias("n_train"),
            F.sum((~F.col("is_train")).cast("int")).alias("n_holdout"),
        )
        .crossJoin(
            scored.agg(
                F.sum(correct).alias("_ok"), F.count(F.lit(1)).alias("_n")
            )
        )
        .select(
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_holdout").cast("long").alias("n_holdout"),
            (F.col("_ok") * 100 >= F.col("_n") * 95).alias("acc_ok"),
        )
    )


QUALITY_CLASSIFIER_SQL = """
WITH aug AS (
  SELECT doc_id FROM documents
  UNION ALL
  SELECT doc_id + 1000000 FROM documents WHERE doc_id % 4 = 0),
s AS (
  SELECT CASE WHEN CAST(concat('0x', substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 800
         THEN 1 ELSE 0 END AS tr
  FROM aug)
SELECT CAST(SUM(tr) AS BIGINT) AS n_train,
       CAST(COUNT(*) - SUM(tr) AS BIGINT) AS n_holdout,
       TRUE AS acc_ok
FROM s
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit (the CCNet/FineWeb release stage). The
    fixture contains no PII, so the query PLANTS it deterministically
    (doc_id % 5 picks email/phone/ipv4 contamination), scrubs with the
    engine-portable patterns, and reports per-lang integer counts of
    each redaction type plus the residual-match count over the scrubbed
    text — which must be 0 (the oracle recomputes the identical plant +
    scrub in DuckDB). One codegen'd projection; no joins, no UDFs."""
    from hawk_pack_spark.functions.curation import PII_PATTERNS, scrub_pii

    docs = load_table(spark, "documents", sf_dir).select("lang", "doc_id", "text")
    d = F.col("doc_id")
    planted = docs.withColumn(
        "ptext",
        F.when(
            d % 5 == 1,
            F.concat(F.col("text"), F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
        )
        .when(
            d % 5 == 2,
            F.concat(F.col("text"), F.lit(" call 555-010-"), F.lpad((d % 10000).cast("string"), 4, "0")),
        )
        .when(
            d % 5 == 3,
            F.concat(F.col("text"), F.lit(" from 10."), (d % 200).cast("string"), F.lit(".0."), (d % 250).cast("string")),
        )
        .otherwise(F.col("text")),
    )
    scrubbed, counts = scrub_pii("ptext")
    residual = sum(
        (F.size(F.regexp_extract_all(scrubbed, F.lit(p), 0)) for p in PII_PATTERNS.values()),
        F.lit(0),
    )
    per_doc = planted.select(
        "lang",
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ipv4"].alias("i"),
        residual.alias("r"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("e").alias("n_emails"),
        F.sum("p").alias("n_phones"),
        F.sum("i").alias("n_ips"),
        F.sum("r").alias("n_residual"),
    )


PII_SCRUB_SQL = r"""
WITH planted AS (
  SELECT lang,
    CASE
      WHEN doc_id % 5 = 1 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      WHEN doc_id % 5 = 2 THEN text || ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      WHEN doc_id % 5 = 3 THEN text || ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)
      ELSE text END AS ptext
  FROM documents),
s1 AS (
  SELECT lang,
    len(regexp_extract_all(ptext, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS e,
    regexp_replace(ptext, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM planted),
s2 AS (
  SELECT lang, e,
    len(regexp_extract_all(t1, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS p,
    regexp_replace(t1, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT lang, e, p,
    len(regexp_extract_all(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS i,
    regexp_replace(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g') AS t3
  FROM s2),
r AS (
  SELECT lang, e, p, i,
    len(regexp_extract_all(t3, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
    + len(regexp_extract_all(t3, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
    + len(regexp_extract_all(t3, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS res
  FROM s3)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(e) AS BIGINT) AS n_emails,
  CAST(SUM(p) AS BIGINT) AS n_phones,
  CAST(SUM(i) AS BIGINT) AS n_ips,
  CAST(SUM(res) AS BIGINT) AS n_residual
FROM r GROUP BY lang
"""


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity filtering (CCNet): train an add-1 bigram LM on the
    corpus, score every doc in micro-nats (integer accounting — ln() is
    the only float op, applied to identical operands in both engines),
    and flag the high-perplexity tail (avg > 3.45 nats, compared by
    integer cross-multiplication). Reports per-lang doc/flag counts and
    exact micro-nat totals."""
    from hawk_pack_spark.functions.curation import bigram_lm_scores

    docs = load_table(spark, "documents", sf_dir)
    sc = bigram_lm_scores(docs)
    flagged = F.when(
        F.col("sum_lp_micro") > F.col("n_bigrams") * F.lit(3_450_000), 1
    ).otherwise(0)
    return sc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(flagged).alias("n_flagged"),
        F.sum("n_bigrams").alias("sum_bigrams"),
        F.sum("sum_lp_micro").alias("sum_lp_micro"),
    )


PERPLEXITY_SQL = """
WITH toks AS (
  SELECT lang, doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
g AS (
  SELECT lang, doc_id, unnest(CASE WHEN len(ts) >= 2
    THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
    ELSE [] END) AS gram
  FROM toks),
cab AS (SELECT gram, COUNT(*) AS c_ab FROM g GROUP BY gram),
uni AS (SELECT unnest(ts) AS tok FROM toks),
ca AS (SELECT tok, COUNT(*) AS c_a FROM uni GROUP BY tok),
v AS (SELECT COUNT(DISTINCT tok) AS v FROM uni),
model AS (
  SELECT gram,
    CAST(ROUND(-ln((c_ab + 1.0) / (c_a + v)) * 1e6) AS BIGINT) AS lp_micro
  FROM cab JOIN ca ON string_split(cab.gram, ' ')[1] = ca.tok, v),
sc AS (
  SELECT lang, doc_id, COUNT(*) AS nb,
    CAST(SUM(lp_micro) AS BIGINT) AS lp
  FROM g JOIN model USING (gram) GROUP BY 1, 2)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN lp > nb * 3450000 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(SUM(nb) AS BIGINT) AS sum_bigrams,
  CAST(SUM(lp) AS BIGINT) AS sum_lp_micro
FROM sc GROUP BY lang
"""


def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline, end to end, as ONE declarative
    plan: repetition gate (Gopher) → perplexity gate (CCNet bigram LM)
    → eval-set decontamination (GPT-3) → exact dedup (min-id wins) →
    stratified mixing sample → greedy context-window packing. Reports
    per-lang survivor counts at every stage plus packed-bin totals —
    the funnel a data engineer actually monitors. Every stage is the
    already-oracle-checked operator; this query proves they COMPOSE
    (flags computed on original text, applied jointly; dedup among
    gate-survivors; packing over the sampled stream)."""
    from hawk_pack_spark.functions.curation import (
        bigram_lm_scores,
        decontaminate,
        repetition_stats,
        stratified_keep,
    )
    from hawk_pack_spark.operators.packing import pack_sequences

    docs = load_table(spark, "documents", sf_dir)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    tr = docs.where(F.col("doc_id") % 37 != 0)

    rep = repetition_stats(docs).select("lang", "doc_id", "repetitive")
    ppl = bigram_lm_scores(docs).select(
        "lang",
        "doc_id",
        (F.col("sum_lp_micro") > F.col("n_bigrams") * F.lit(3_450_000))
        .cast("int")
        .alias("high_ppl"),
    )
    con = decontaminate(tr, ev, n=3, min_hits=3).select(
        "lang", "doc_id", "contaminated"
    )
    flags = (
        tr.select("lang", "doc_id", "text", T.token_count("text").alias("n_tokens"))
        .join(rep, ["lang", "doc_id"], "left")
        .join(ppl, ["lang", "doc_id"], "left")
        .join(con, ["lang", "doc_id"], "left")
        .withColumn("repetitive", F.coalesce("repetitive", F.lit(0)))
        .withColumn("high_ppl", F.coalesce("high_ppl", F.lit(0)))
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(0)))
    )
    gated = flags.where(
        (F.col("repetitive") == 0)
        & (F.col("high_ppl") == 0)
        & (F.col("contaminated") == 0)
    )
    # compute the dedup key early, drop the text payload, and
    # materialize ONCE: the gate pipeline above (two repetition passes
    # + bigram LM + decontamination) is otherwise re-run for the dedup
    # branch and each funnel aggregate (guide §5; §2.3 — carry
    # metadata, not payloads). Values unchanged: h is the same md5 and
    # nothing downstream reads text.
    keyed = (
        gated.withColumn("h", F.md5(F.lower(F.col("text"))))
        .drop("text")
        .localCheckpoint()
    )
    keep = keyed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    deduped = keyed.join(keep, "h").where(F.col("doc_id") == F.col("keep_id"))
    rates = {"en": 800, "de": 500, "fr": 500, "es": 250, "zh": 250}
    sampled = deduped.where(
        stratified_keep("doc_id", "lang", rates, default_permille=100)
    ).localCheckpoint()
    packed = pack_sequences(
        sampled.select("lang", "doc_id", F.col("n_tokens").cast("long")), budget=128
    )
    bins = packed.groupBy("lang").agg(
        F.count_distinct("bin_id").alias("n_bins"),
        F.sum("n_tokens").alias("sum_tokens_packed"),
    )
    funnel = (
        tr.groupBy("lang").agg(F.count(F.lit(1)).alias("n_input"))
        .join(keyed.groupBy("lang").agg(F.count(F.lit(1)).alias("n_gated")), "lang", "left")
        .join(deduped.groupBy("lang").agg(F.count(F.lit(1)).alias("n_deduped")), "lang", "left")
        .join(sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled")), "lang", "left")
        .join(bins, "lang", "left")
    )
    return funnel.select(
        "lang",
        "n_input",
        F.coalesce("n_gated", F.lit(0)).alias("n_gated"),
        F.coalesce("n_deduped", F.lit(0)).alias("n_deduped"),
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        F.coalesce("n_bins", F.lit(0)).alias("n_bins"),
        F.coalesce("sum_tokens_packed", F.lit(0)).alias("sum_tokens_packed"),
    )


TRAINING_PIPELINE_SQL = """
WITH RECURSIVE toks AS (
  SELECT lang, doc_id, text,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
g2 AS (
  SELECT lang, doc_id, unnest(CASE WHEN len(ts) >= 2
    THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
    ELSE [] END) AS gram FROM toks),
c2 AS (SELECT lang, doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2, 3),
d2 AS (SELECT lang, doc_id, MAX(c) AS max_short,
         CAST(SUM(c) AS BIGINT) AS n_short FROM c2 GROUP BY 1, 2),
g5 AS (
  SELECT lang, doc_id, unnest(CASE WHEN len(ts) >= 5
    THEN list_transform(range(1, len(ts) - 3),
         i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] || ' '
              || ts[i + 3] || ' ' || ts[i + 4])
    ELSE [] END) AS gram FROM toks),
c5 AS (SELECT lang, doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY 1, 2, 3),
d5 AS (SELECT lang, doc_id,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_long,
         CAST(SUM(c) AS BIGINT) AS n_long FROM c5 GROUP BY 1, 2),
repdoc AS (
  SELECT d2.lang, d2.doc_id,
    CASE WHEN max_short * 1000 > n_short * 200
           OR COALESCE(dup_long, 0) * 1000 > COALESCE(n_long, 0) * 100
         THEN 1 ELSE 0 END AS repetitive
  FROM d2 LEFT JOIN d5 ON d2.lang = d5.lang AND d2.doc_id = d5.doc_id),
cab AS (SELECT gram, COUNT(*) AS c_ab FROM g2 GROUP BY gram),
uni AS (SELECT unnest(ts) AS tok FROM toks),
ca AS (SELECT tok, COUNT(*) AS c_a FROM uni GROUP BY tok),
vv AS (SELECT COUNT(DISTINCT tok) AS v FROM uni),
model AS (
  SELECT gram,
    CAST(ROUND(-ln((c_ab + 1.0) / (c_a + v)) * 1e6) AS BIGINT) AS lp_micro
  FROM cab JOIN ca ON string_split(cab.gram, ' ')[1] = ca.tok, vv),
ppl AS (
  SELECT lang, doc_id,
    CASE WHEN CAST(SUM(lp_micro) AS BIGINT) > COUNT(*) * 3450000
         THEN 1 ELSE 0 END AS high_ppl
  FROM g2 JOIN model USING (gram) GROUP BY 1, 2),
g3 AS (
  SELECT lang, doc_id, unnest(list_distinct(CASE WHEN len(ts) >= 3
    THEN list_transform(range(1, len(ts) - 1),
         i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])
    ELSE [] END)) AS gram FROM toks),
evg AS (SELECT DISTINCT gram FROM g3 WHERE doc_id % 37 = 0),
hits AS (
  SELECT g3.lang, g3.doc_id, COUNT(*) AS hits
  FROM g3 JOIN evg USING (gram)
  WHERE g3.doc_id % 37 != 0 GROUP BY 1, 2),
tr AS (SELECT lang, doc_id, text, CAST(len(ts) AS BIGINT) AS n_tokens
       FROM toks WHERE doc_id % 37 != 0),
gated AS (
  SELECT tr.lang, tr.doc_id, tr.text, tr.n_tokens
  FROM tr
  LEFT JOIN repdoc ON tr.lang = repdoc.lang AND tr.doc_id = repdoc.doc_id
  LEFT JOIN ppl ON tr.lang = ppl.lang AND tr.doc_id = ppl.doc_id
  LEFT JOIN hits ON tr.lang = hits.lang AND tr.doc_id = hits.doc_id
  WHERE COALESCE(repetitive, 0) = 0 AND COALESCE(high_ppl, 0) = 0
    AND CASE WHEN COALESCE(hits.hits, 0) >= 3 THEN 1 ELSE 0 END = 0),
keyed AS (SELECT *, md5(lower(text)) AS h FROM gated),
keep AS (SELECT h, MIN(doc_id) AS keep_id FROM keyed GROUP BY h),
deduped AS (
  SELECT keyed.* FROM keyed JOIN keep USING (h) WHERE doc_id = keep_id),
sampled AS (
  SELECT lang, doc_id, n_tokens FROM deduped
  WHERE CAST(concat('0x', substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
        < (CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500 WHEN 'fr' THEN 500
                     WHEN 'es' THEN 250 WHEN 'zh' THEN 250 ELSE 100 END)),
rn AS (
  SELECT lang, doc_id, n_tokens,
    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM sampled),
pack AS (
  SELECT lang, rn, n_tokens AS t, n_tokens AS fill, CAST(1 AS BIGINT) AS bin
  FROM rn WHERE rn = 1
  UNION ALL
  SELECT k.lang, k.rn, k.n_tokens,
    CASE WHEN p.fill + k.n_tokens > 128 THEN k.n_tokens ELSE p.fill + k.n_tokens END,
    CASE WHEN p.fill + k.n_tokens > 128 THEN p.bin + 1 ELSE p.bin END
  FROM rn k JOIN pack p ON k.lang = p.lang AND k.rn = p.rn + 1),
bins AS (
  SELECT lang, COUNT(DISTINCT bin) AS n_bins,
    CAST(SUM(t) AS BIGINT) AS sum_tokens_packed
  FROM pack GROUP BY lang),
funnel AS (
  SELECT t.lang,
    (SELECT COUNT(*) FROM tr WHERE tr.lang = t.lang) AS n_input,
    (SELECT COUNT(*) FROM gated g WHERE g.lang = t.lang) AS n_gated,
    (SELECT COUNT(*) FROM deduped d WHERE d.lang = t.lang) AS n_deduped,
    (SELECT COUNT(*) FROM sampled s WHERE s.lang = t.lang) AS n_sampled
  FROM (SELECT DISTINCT lang FROM tr) t)
SELECT funnel.lang, n_input, n_gated, n_deduped, n_sampled,
  COALESCE(n_bins, 0) AS n_bins,
  COALESCE(sum_tokens_packed, 0) AS sum_tokens_packed
FROM funnel LEFT JOIN bins ON funnel.lang = bins.lang
"""
