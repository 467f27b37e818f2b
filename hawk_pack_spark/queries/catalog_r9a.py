"""round-9 rows (first batch)

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price
from hawk_pack_spark.queries.catalog_vector import _embeddings_vectors  # noqa: F401



NATION_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
j AS (
  SELECT n.n_name, rev.cents
  FROM rev JOIN customer ON c_custkey = o_custkey
           JOIN nation n ON c_nationkey = n_nationkey),
r AS (
  SELECT n_name, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cents)
              AS BIGINT) AS i
  FROM j),
a AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sx,
         CAST(SUM(i * cents) AS BIGINT) AS six
  FROM r GROUP BY 1)
SELECT n_name, n AS n_members,
       CAST(2 * six - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE)
         AS gini
FROM a WHERE sx > 0
"""


def q_events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, day) time-weighted average value
    (analytics.time_weighted_avg): Σ(v·Δt)/ΣΔt with Δt in exact
    integer MICROSECONDS (unix_micros ≡ DuckDB epoch_us — a seconds
    cast would floor on one engine and round on the other). One window
    sort + one same-key groupBy; exact decimal(38,0) accumulators,
    two final float divisions. Data-level, one row per (type, day)
    with ≥2 observations."""
    from hawk_pack_spark.operators.analytics import time_weighted_avg

    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.to_date("ts")
    )
    return time_weighted_avg(
        ev,
        ["event_type", "day"],
        "ts",
        "value",
        order_cols=["ts", "event_id"],
    )


EVENTS_TWAP_SQL = """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         LEAD(epoch_us(ts)) OVER (
             PARTITION BY event_type, CAST(ts AS DATE)
             ORDER BY ts, event_id) - epoch_us(ts) AS dt
  FROM events),
a AS (
  SELECT event_type, day,
         CAST(COUNT(dt) AS BIGINT) AS n,
         CAST(SUM(c * dt) AS DOUBLE) AS svdt,
         CAST(SUM(dt) AS DOUBLE) AS sdt
  FROM s GROUP BY 1, 2)
SELECT event_type, day, svdt / sdt / 100.0 AS twap
FROM a WHERE sdt > 0
"""


def q_events_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear interpolation of masked-out values
    (analytics.interpolate_linear — fills missing VALUES where
    gapfill_daily fills missing ROWS): every 7th event's value is
    nulled deterministically (event_id % 7), then reconstructed from
    the nearest observed neighbors in (ts, event_id) order; edge gaps
    stay NULL. One (key, order) shuffle, two window passes over the
    shared sort; the interpolation arithmetic is the identical IEEE
    multiply-add on both engines. Data-level over every event row."""
    from hawk_pack_spark.operators.analytics import interpolate_linear

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = interpolate_linear(ev, ["event_type"], ["ts", "event_id"], "v")
    return out.select("event_id", "event_type", "value_filled")


EVENTS_INTERPOLATE_SQL = """
WITH b AS (
  SELECT event_id, event_type, ts,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
  FROM events),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM b),
s AS (
  SELECT *,
         MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER wf AS prev_rn,
         LAST_VALUE(v IGNORE NULLS) OVER wf AS prev_v,
         MIN(CASE WHEN v IS NOT NULL THEN rn END) OVER wb AS next_rn,
         FIRST_VALUE(v IGNORE NULLS) OVER wb AS next_v
  FROM r
  WINDOW wf AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wb AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT event_id, event_type,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_rn IS NOT NULL AND next_rn IS NOT NULL
            THEN prev_v + (next_v - prev_v)
                 * (CAST(rn - prev_rn AS DOUBLE)
                    / CAST(next_rn - prev_rn AS DOUBLE))
       END AS value_filled
FROM s
"""


def q_parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (analytics.skyline_2d) over
    (rounded-dollar retail price, size), minimizing both: the
    cheapest-per-smallest trade-off set. Sort-based linear form —
    one (x, min y) reduction then a running-min window over the
    bounded distinct-x set; the oracle is the INDEPENDENT O(n²)
    NOT-EXISTS domination definition (tractable because the distinct
    pair set stays constant as SF grows). Data-level frontier rows."""
    from hawk_pack_spark.operators.analytics import skyline_2d

    part = load_table(spark, "part", sf_dir).select(
        F.round(F.col("p_retailprice")).cast("long").alias("price_dollars"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    return skyline_2d(part, "price_dollars", "p_size")


PARTS_SKYLINE_SQL = """
WITH p AS (
  SELECT DISTINCT CAST(ROUND(p_retailprice) AS BIGINT) AS x,
                  CAST(p_size AS BIGINT) AS y
  FROM part),
m AS (SELECT x, MIN(y) AS y FROM p GROUP BY 1)
SELECT x AS price_dollars, y AS p_size
FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y))
"""


def q_events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM level-shift flags per event type
    (analytics.cusum_flags, Page 1954): rows where the clamped
    cumulative excursion above (μ + allowance) exceeds the threshold.
    The max(0,·) recurrence runs as its closed window form (cumsum −
    running min) — ONE sorted window pass, no sequential loop; the
    flag gate compares n-scaled exact integers, so no float division
    enters the decision. Data-level over flagged rows."""
    from hawk_pack_spark.operators.analytics import cusum_flags

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "ts", "value"
    )
    out = cusum_flags(
        ev,
        ["event_type"],
        ["ts", "event_id"],
        "value",
        allowance=5.0,
        threshold=200.0,
    )
    return out.select("event_id", "event_type", "cusum")


EVENTS_CUSUM_SQL = """
WITH v AS (
  SELECT event_id, event_type, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events),
st AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS sv,
         CAST(COUNT(c) AS BIGINT) AS n
  FROM v GROUP BY 1),
sp AS (
  SELECT v.*, st.n,
         v.c * st.n - st.sv - 500 * st.n AS step
  FROM v JOIN st USING (event_type)),
cm AS (
  SELECT *, CAST(SUM(step) OVER w AS BIGINT) AS cum
  FROM sp
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
sx AS (
  SELECT *, cum - LEAST(CAST(0 AS BIGINT), MIN(cum) OVER w) AS s_plus
  FROM cm
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_id, event_type,
       CAST(s_plus AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS cusum
FROM sx WHERE s_plus > 20000 * n
"""


def q_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (graph.k_core, k=3, ≤8 peeling rounds)
    over the symmetrized co-purchase graph: the dense sub-network
    survives, the tendrils peel away. Synchronous integer peeling is
    bit-deterministic, so the oracle UNROLLS the same rounds as
    chained CTEs — early exit on the engine side is provably
    equivalent (the peeled set is a fixpoint: extra rounds are
    no-ops). Data-level (part, within-core degree)."""
    from hawk_pack_spark.operators.graph import copurchase_pairs, k_core

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    out = k_core(edges, k=3, max_iters=8)
    return out.select(F.col("node").alias("part"), "degree")


def _k_core_sql(k: int = 3, iters: int = 8) -> str:
    sql = """
WITH t AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e0 AS MATERIALIZED (
  SELECT pa AS s, pb AS d FROM und UNION ALL SELECT pb, pa FROM und)"""
    for i in range(1, iters + 1):
        sql += f""",
k{i} AS MATERIALIZED (
  SELECT s FROM e{i - 1} GROUP BY s HAVING COUNT(*) >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{i - 1} e
  JOIN k{i} a ON e.s = a.s JOIN k{i} b ON e.d = b.s)"""
    sql += f"""
SELECT s AS part, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{iters} GROUP BY s HAVING COUNT(*) >= {k}"""
    return sql


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability drift profile (profile.psi_bins, 20 bins)
    of event values, first half of the month vs second half: one row
    per bin with exact counts, Laplace-smoothed shares ((2c+1)/(2n+B)
    exact integer ratios — ln is undefined on empty bins), and the
    (p−q)·ln(p/q) PSI term. Bins are equi-width over the REFERENCE
    min/max with edge clamping; all bin math exact integer cents.
    Data-level, 20 rows."""
    from hawk_pack_spark.operators.profile import psi_bins

    ev = load_table(spark, "events", sf_dir)
    split = "2024-01-16"
    ref = ev.where(F.col("ts") < F.lit(split).cast("timestamp"))
    cur = ev.where(F.col("ts") >= F.lit(split).cast("timestamp"))
    return psi_bins(ref, cur, "value", n_bins=20)


EVENTS_PSI_SQL = """
WITH ref AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
             WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL),
cur AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
        WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL),
st AS (SELECT MIN(c) AS lo, MAX(c) AS hi FROM ref),
rb AS (
  SELECT GREATEST(0, LEAST(19,
           FLOOR((c - lo) * 20 / (hi - lo + 1)))) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_ref
  FROM ref, st GROUP BY 1),
cb AS (
  SELECT GREATEST(0, LEAST(19,
           FLOOR((c - lo) * 20 / (hi - lo + 1)))) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_cur
  FROM cur, st GROUP BY 1),
tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM ref),
tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cur),
spine AS (SELECT unnest(generate_series(0, 19)) AS bin),
j AS (
  SELECT spine.bin,
         COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur,
         tr.t AS _tr, tc.t AS _tc
  FROM spine LEFT JOIN rb ON spine.bin = rb.bin
             LEFT JOIN cb ON spine.bin = cb.bin, tr, tc)
SELECT CAST(bin AS INT) AS bin, n_ref, n_cur,
       ROUND(CAST(2 * n_ref + 1 AS DOUBLE) / CAST(2 * _tr + 20 AS DOUBLE),
             6) AS p_ref,
       ROUND(CAST(2 * n_cur + 1 AS DOUBLE) / CAST(2 * _tc + 20 AS DOUBLE),
             6) AS p_cur,
       ROUND((CAST(2 * n_ref + 1 AS DOUBLE) / CAST(2 * _tr + 20 AS DOUBLE)
              - CAST(2 * n_cur + 1 AS DOUBLE) / CAST(2 * _tc + 20 AS DOUBLE))
             * LN((CAST(2 * n_ref + 1 AS DOUBLE)
                   / CAST(2 * _tr + 20 AS DOUBLE))
                  / (CAST(2 * n_cur + 1 AS DOUBLE)
                     / CAST(2 * _tc + 20 AS DOUBLE))), 6) AS psi_term
FROM j
"""


def q_embeddings_standardized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embeddings table
    (linalg.standardize_embeddings): μ/σ from EXACT integer
    micro-unit accumulators folded in ONE agg (no explode for the
    stats, no shuffle-order float sums), z = (x − μ)/σ at full input
    precision. Data-level, one row per (vec_id, dim)."""
    from hawk_pack_spark.operators.linalg import standardize_embeddings

    emb = load_table(spark, "embeddings", sf_dir)
    return standardize_embeddings(emb, "embedding", "vec_id", dim=64)


def _standardize_sql(dim: int = 64) -> str:
    s_exprs = ",\n".join(
        f"  CAST(SUM(CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000)"
        f" AS BIGINT)) AS BIGINT) AS s{i},"
        f" CAST(SUM(CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000)"
        f" AS BIGINT) * CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE)"
        f" * 1000000) AS BIGINT)) AS BIGINT) AS q{i}"
        for i in range(dim)
    )
    mu_arr = ", ".join(
        f"CAST(s{i} AS DOUBLE) / n / 1000000" for i in range(dim)
    )
    var_arr = ", ".join(
        f"(CAST(q{i} AS DOUBLE) / n - (CAST(s{i} AS DOUBLE) / n)"
        f" * (CAST(s{i} AS DOUBLE) / n)) / 1e12"
        for i in range(dim)
    )
    return f"""
WITH st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
{s_exprs}
  FROM embeddings),
m AS (SELECT [{mu_arr}] AS mu, [{var_arr}] AS vr FROM st)
SELECT vec_id,
       CAST(unnest(generate_series(0, {dim - 1})) AS INT) AS dim,
       (CAST(unnest(embedding) AS DOUBLE)
        - mu[unnest(generate_series(0, {dim - 1})) + 1])
       / SQRT(GREATEST(vr[unnest(generate_series(0, {dim - 1})) + 1],
                       1e-12)) AS z
FROM embeddings, m
"""


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (analytics.attribute_linear):
    each purchase's value splits equally across the user's click/view
    touches in the preceding 24h (strictly-before, exact integer
    micros). ONE user-key equi-join with the range predicate as a
    join filter + one COUNT window on the conversion key. Data-level,
    one row per (conversion, touch)."""
    from hawk_pack_spark.operators.analytics import attribute_linear

    ev = load_table(spark, "events", sf_dir)
    return attribute_linear(
        ev, "purchase", ["click", "view"], window_seconds=86400
    )


PURCHASE_ATTRIBUTION_SQL = """
WITH conv AS (
  SELECT user_id AS u, event_id AS cid, epoch_us(ts) AS ct,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
tch AS (
  SELECT user_id AS u, event_id AS tid, event_type AS tt,
         epoch_us(ts) AS t
  FROM events WHERE event_type IN ('click', 'view')),
j AS (
  SELECT conv.u, cid, tid, tt, cents
  FROM conv JOIN tch ON conv.u = tch.u
       AND tch.t < conv.ct AND tch.t >= conv.ct - 86400000000)
SELECT cid AS conversion_id, tid AS touch_id, u AS user_id,
       tt AS touch_type,
       CAST(cents AS DOUBLE)
       / CAST(COUNT(*) OVER (PARTITION BY cid) AS DOUBLE) / 100.0
         AS share
FROM j
"""


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation metrics (retrieval.eval_metrics): per-query
    recall@10 / precision@10 / reciprocal rank / nDCG@10 of the exact
    L2 kNN results against label-derived graded judgments (same label
    = relevant, grade 1 + vec_id%2). The eval half of the ANN family —
    one judgments equi-join + one groupBy per side, DCG/IDCG folded
    over rank-sorted term lists (deterministic IEEE order).
    Data-level, one row per judged query."""
    from hawk_pack_spark.operators.retrieval import eval_metrics

    emb = _embeddings_vectors(spark, sf_dir)
    lab = load_table(spark, "embeddings", sf_dir).select("vec_id", "label")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    results = knn_exact(emb, queries, k=10, metric="l2_sq").select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    qlab = lab.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
    )
    qrels = (
        qlab.join(lab, lab["label"] == qlab["_ql"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            (1 + F.col("vec_id") % 2).cast("long").alias("rel"),
        )
    )
    return eval_metrics(results, qrels, k=10)


RETRIEVAL_EVAL_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv, label AS qlab FROM e
      WHERE vec_id < 20),
d AS (
  SELECT qid, vec_id,
    list_sum(list_transform(range(1, 65),
             i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e),
r AS (
  SELECT qid, vec_id, CAST(ROW_NUMBER() OVER (
      PARTITION BY qid ORDER BY dist ASC, vec_id ASC) AS BIGINT) AS rnk
  FROM d),
res AS (SELECT qid, vec_id, rnk FROM r WHERE rnk <= 10),
qr AS (
  SELECT q.qid, e.vec_id AS doc, CAST(1 + e.vec_id % 2 AS BIGINT) AS rel
  FROM q JOIN e ON e.label = q.qlab AND e.vec_id != q.qid),
hits AS (
  SELECT res.qid, res.rnk, COALESCE(qr.rel, 0) AS rel
  FROM res LEFT JOIN qr ON res.qid = qr.qid AND res.vec_id = qr.doc),
perq AS (
  SELECT qid,
    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nrelret,
    MIN(CASE WHEN rel > 0 THEN rnk END) AS fst,
    list_reduce(
      list_prepend(0.0,
        list_transform(list({'r': rnk, 'rel': rel} ORDER BY rnk),
                       x -> CAST(x.rel AS DOUBLE) / log2(x.r + 1))),
      (a, b) -> a + b) AS dcg
  FROM hits GROUP BY qid),
ideal AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_judged,
    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nrel,
    list_reduce(
      list_prepend(0.0,
        list_transform(
          range(1, LEAST(CAST(COUNT(*) AS BIGINT), 10) + 1),
          i -> CAST(list(rel ORDER BY rel DESC, doc ASC)[i] AS DOUBLE)
               / log2(i + 1))),
      (a, b) -> a + b) AS idcg
  FROM qr GROUP BY qid)
SELECT perq.qid AS query_id, n_judged,
  ROUND(CAST(nrelret AS DOUBLE) / CAST(nrel AS DOUBLE), 6) AS recall_at_10,
  ROUND(CAST(nrelret AS DOUBLE) / 10.0, 6) AS precision_at_10,
  ROUND(COALESCE(1.0 / CAST(fst AS DOUBLE), 0.0), 6) AS reciprocal_rank,
  ROUND(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg_at_10
FROM perq JOIN ideal ON perq.qid = ideal.qid
WHERE nrel > 0
"""


def q_events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type percentile winsorization (curation.winsorize,
    [p05, p95] nearest-rank): heavy tails clipped to ACTUAL data
    values — exact integers in cents, so the clip decision and output
    are engine-identical bit for bit (an interpolated percentile
    boundary would be ulp-fuzzy between engines). One window sort +
    one broadcast bounds join. Data-level over every event row."""
    from hawk_pack_spark.functions.curation import winsorize

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    out = winsorize(ev, ["event_type"], "value", lower=0.05, upper=0.95)
    return out.select("event_id", "event_type", "value", "value_winsorized")


EVENTS_WINSORIZE_SQL = """
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c)
                 AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM v),
b AS (
  SELECT event_type,
         MIN(CASE WHEN rn = CEIL(0.05 * n) THEN c END) AS lo,
         MAX(CASE WHEN rn = CEIL(0.95 * n) THEN c END) AS hi
  FROM r WHERE rn = CEIL(0.05 * n) OR rn = CEIL(0.95 * n)
  GROUP BY 1)
SELECT event_id, event_type, value,
       CAST(LEAST(GREATEST(c, lo), hi) AS DOUBLE) / 100.0
         AS value_winsorized
FROM v JOIN b USING (event_type)
"""


def q_copurchase_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction (graph.link_prediction): for non-adjacent part
    pairs of the co-purchase graph sharing a common neighbor, the three
    classic proximity scores — common neighbors, Jaccard, Adamic-Adar
    (Liben-Nowell & Kleinberg CIKM'03) — the "customers also bought"
    candidate generator. One wedge self-join (hub intermediates with
    degree > 10000 excluded from wedge generation, part of the
    contract) + one pair groupBy; Adamic-Adar folds 1/ln(deg) over the
    (degree, id)-sorted neighbor list (sorted-fold float discipline).
    Data-level, one row per predicted pair."""
    from hawk_pack_spark.operators.graph import copurchase_pairs, link_prediction

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    return link_prediction(edges, min_common=1, max_hub_degree=10_000)


LINK_PRED_SQL = """
WITH t AS MATERIALIZED (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
und AS MATERIALIZED (
  SELECT a.i AS x, b.i AS y
  FROM t a JOIN t b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS MATERIALIZED (SELECT x AS s, y AS d FROM und UNION ALL SELECT y AS s, x AS d FROM und),
deg AS MATERIALIZED (SELECT s AS n, CAST(COUNT(*) AS BIGINT) AS dg FROM e GROUP BY 1),
adj AS MATERIALIZED (SELECT e.s, e.d, deg.dg AS zdeg
        FROM e JOIN deg ON e.d = deg.n WHERE deg.dg <= 10000),
w AS (
  SELECT a.s AS na, b.s AS nb, a.d AS z, a.zdeg
  FROM adj a JOIN adj b ON a.d = b.d AND a.s < b.s),
p AS (
  SELECT na, nb, CAST(COUNT(*) AS BIGINT) AS cn,
         list({'zd': zdeg, 'z': z} ORDER BY zdeg, z) AS zs
  FROM w GROUP BY 1, 2 HAVING COUNT(*) >= 1),
np AS (SELECT p.* FROM p
       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.s = p.na AND e.d = p.nb)),
j AS (SELECT np.*, da.dg AS dga, db.dg AS dgb
      FROM np JOIN deg da ON np.na = da.n JOIN deg db ON np.nb = db.n)
SELECT na AS node_a, nb AS node_b, cn AS common_neighbors,
       dga AS degree_a, dgb AS degree_b,
       ROUND(CAST(cn AS DOUBLE) / CAST(dga + dgb - cn AS DOUBLE), 6) AS jaccard,
       ROUND(list_reduce(list_prepend(0.0,
             list_transform(zs, x -> 1.0 / LN(CAST(x.zd AS DOUBLE)))),
             (acc, v) -> acc + v), 6) AS adamic_adar
FROM j
"""


def q_orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery (profile.candidate_keys): per-column
    exact row/null/distinct counts + uniqueness over orders in ONE
    aggregate (Spark plans the multi-DISTINCT via a single Expand —
    linear in cols x rows, one shuffle, never a per-column scan).
    Data-level, one row per column."""
    from hawk_pack_spark.operators.profile import candidate_keys

    o = load_table(spark, "orders", sf_dir)
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    out = candidate_keys(o, cols)
    return out.select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_non_null",
        "n_distinct",
        F.col("is_candidate_key").cast("int").cast("bigint").alias("is_candidate_key"),
        "uniqueness",
    )


COLUMN_PROFILE_SQL = """
WITH s AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(COUNT(o_orderkey) AS BIGINT) AS nn1, CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd1,
    CAST(COUNT(o_custkey) AS BIGINT) AS nn2, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd2,
    CAST(COUNT(o_orderstatus) AS BIGINT) AS nn3, CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
    CAST(COUNT(o_totalprice) AS BIGINT) AS nn4, CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd4,
    CAST(COUNT(o_orderdate) AS BIGINT) AS nn5, CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd5,
    CAST(COUNT(o_orderpriority) AS BIGINT) AS nn6, CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd6
  FROM orders),
u AS (
  SELECT 'o_orderkey' AS column_name, n, nn1 AS nn, nd1 AS nd FROM s
  UNION ALL SELECT 'o_custkey', n, nn2, nd2 FROM s
  UNION ALL SELECT 'o_orderstatus', n, nn3, nd3 FROM s
  UNION ALL SELECT 'o_totalprice', n, nn4, nd4 FROM s
  UNION ALL SELECT 'o_orderdate', n, nn5, nd5 FROM s
  UNION ALL SELECT 'o_orderpriority', n, nn6, nd6 FROM s)
SELECT column_name, n AS n_rows, n - nn AS n_nulls, nn AS n_non_null,
       nd AS n_distinct,
       CAST(CASE WHEN nd = nn AND nn = n THEN 1 ELSE 0 END AS BIGINT)
         AS is_candidate_key,
       ROUND(CAST(nd AS DOUBLE) / CAST(GREATEST(nn, 1) AS DOUBLE), 6)
         AS uniqueness
FROM u
"""


def q_lineitem_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency mining (profile.fd_violations): does
    l_partkey determine l_suppkey? (It does not — TPC-H gives each
    part several suppliers; every multi-supplier part is a violation
    row with sorted evidence values.) One distinct reduction + one
    same-key groupBy, the TANE-style single-FD check. Data-level.

    The evidence list leaves the operator as ARRAY<STRING> but the
    catalog row emits it comma-joined: the driver's pandas hasher
    cannot sort list cells (r9's only driver failure), so no catalog
    output column may be ARRAY/MAP/STRUCT — enforced by
    oracle.lint_spark_result_types + the ALL_SPECS sweep test."""
    from hawk_pack_spark.operators.profile import fd_violations

    li = load_table(spark, "lineitem", sf_dir)
    v = fd_violations(li, "l_partkey", "l_suppkey", max_examples=2)
    return v.withColumn("examples", F.array_join(F.col("examples"), ","))


FD_VIOLATIONS_SQL = """
WITH p AS (SELECT DISTINCT l_partkey AS determinant,
                           l_suppkey AS dependent
           FROM lineitem WHERE l_partkey IS NOT NULL),
g AS (
  SELECT determinant, CAST(COUNT(*) AS BIGINT) AS n_dependents,
         array_to_string(
           list(CAST(dependent AS VARCHAR) ORDER BY CAST(dependent AS VARCHAR))[1:2],
           ',') AS examples
  FROM p GROUP BY 1)
SELECT determinant, n_dependents, examples FROM g WHERE n_dependents > 1
"""


def q_events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (analytics.acf): lag-1..3 Pearson
    correlogram of each event type's daily value series (exact
    integer micro-units) — the seasonality/memory diagnostic. One
    window sort computes all lags, one (type, lag) groupBy of exact
    decimal(38,0) accumulators with the overflow guard; r = num /
    (sqrt(d1)*sqrt(d2)) via the wide-decimal string hop. Data-level,
    one row per (type, lag)."""
    from hawk_pack_spark.operators.analytics import acf

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("micros")
    )
    return acf(daily, ["event_type"], "day", "micros", max_lag=3)


ACF_SQL = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS micros
  FROM events GROUP BY 1, 2),
l AS MATERIALIZED (
  SELECT event_type, micros AS x,
         LAG(micros, 1) OVER w AS y1,
         LAG(micros, 2) OVER w AS y2,
         LAG(micros, 3) OVER w AS y3
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
u AS (
  SELECT event_type, 1 AS lag, x, y1 AS y FROM l WHERE y1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2 AS lag, x, y2 AS y FROM l WHERE y2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3 AS lag, x, y3 AS y FROM l WHERE y3 IS NOT NULL),
a AS (
  SELECT event_type, lag,
    CAST(COUNT(*) AS DECIMAL(38,0)) AS n0,
    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
    SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS sxy,
    SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS sxx,
    SUM(CAST(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS syy
  FROM u GROUP BY 1, 2),
f AS (
  SELECT event_type, lag, CAST(n0 AS BIGINT) AS n_pairs,
    CAST(CAST(CAST(n0*sxy - sx*sy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS num,
    CAST(CAST(CAST(n0*sxx - sx*sx AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS d1,
    CAST(CAST(CAST(n0*syy - sy*sy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS d2
  FROM a)
SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
       ROUND(num / (SQRT(d1) * SQRT(d2)), 6) AS acf
FROM f WHERE d1 > 0 AND d2 > 0
"""


def q_events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend (analytics.theil_sen): lower-median of
    all pairwise slopes of each type's daily series — the
    outlier-immune alternative to events_value_trend's OLS. The
    O(n^2) pair join is per GROUP (days per type, bounded by the data
    model); medians are nearest-rank value selections, never
    interpolated. Data-level, one row per type."""
    from hawk_pack_spark.operators.analytics import theil_sen

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("micros")
    ).select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias("x"),
        F.col("micros").alias("y"),
    )
    return theil_sen(daily, ["event_type"], "x", "y")


THEILSEN_SQL = """
WITH d AS MATERIALIZED (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, CAST(ts AS DATE)),
p AS (SELECT a.event_type, a.x AS xi, a.y AS yi, b.x AS xj, b.y AS yj
      FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x),
s AS (SELECT event_type, xi, xj,
             CAST(yj - yi AS DOUBLE) / CAST(xj - xi AS DOUBLE) AS slope
      FROM p),
r AS (SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, xi, xj) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
      FROM s),
m AS (SELECT event_type, slope AS mslope, np FROM r
      WHERE rn = CAST(FLOOR((np + 1) / 2) AS BIGINT)),
resid AS (
  SELECT d.event_type, m.np, m.mslope,
         CAST(d.y AS DOUBLE) - m.mslope * CAST(d.x AS DOUBLE) AS b
  FROM d JOIN m ON d.event_type = m.event_type),
rr AS (SELECT event_type, np, mslope, b,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
       FROM resid)
SELECT event_type, nn AS n_points, np AS n_pairs,
       ROUND(mslope, 6) AS slope, ROUND(b, 6) AS intercept
FROM rr WHERE rn = CAST(FLOOR((nn + 1) / 2) AS BIGINT)
"""


def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring (text.readability): Flesch-style word /
    sentence / heuristic-syllable counts and the composite score, pure
    column algebra (regexp counts + one in-order list fold, no UDF) —
    the document-difficulty feature a curation pipeline bins on.
    Data-level, one row per document."""
    from hawk_pack_spark.functions.text import readability

    docs = load_table(spark, "documents", sf_dir)
    feats = readability(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["n_sentences"].alias("n_sentences"),
        feats["n_syllables"].alias("n_syllables"),
        F.round(feats["flesch"], 6).alias("flesch"),
    )


READABILITY_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t != '') AS wl,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS ns
  FROM documents),
c AS (
  SELECT doc_id,
         CAST(GREATEST(len(wl), 1) AS BIGINT) AS nw,
         CAST(ns AS BIGINT) AS ns,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(wl,
               t -> CAST(GREATEST(len(regexp_extract_all(t, '[aeiouy]+')), 1)
                         AS BIGINT))),
           (acc, v) -> acc + v) AS syl
  FROM w)
SELECT doc_id, nw AS n_words, ns AS n_sentences, syl AS n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(nw AS DOUBLE) / CAST(ns AS DOUBLE))
             - 84.6 * (CAST(syl AS DOUBLE) / CAST(nw AS DOUBLE)), 6)
         AS flesch
FROM c
"""


def q_leakage_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware train/val/test split (curation.
    leakage_safe_split): identical-content documents always land in
    the same split (group by md5(text), split by the representative
    id's Knuth bucket) — the split-contamination guard. Derandomized:
    a replay yields the identical assignment. Data-level, one row per
    document."""
    from hawk_pack_spark.functions.curation import leakage_safe_split

    docs = load_table(spark, "documents", sf_dir)
    return leakage_safe_split(docs, fractions=(80, 10))


LEAKAGE_SPLIT_SQL = """
WITH g AS (
  SELECT doc_id,
         MIN(doc_id) OVER (
           PARTITION BY CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
         ) AS group_rep_id
  FROM documents),
b AS (
  SELECT doc_id, group_rep_id,
         CAST(((group_rep_id % 2147483647) * 2654435761) % 4294967291 % 100
              AS INTEGER) AS bucket
  FROM g)
SELECT doc_id, group_rep_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def q_dup_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-substring coverage (dedup.
    dup_ngram_spans, the Lee et al. 2022 exact-substring signal at
    8-gram granularity): per doc, the union-of-spans size of 8-grams
    shared with >= 2 distinct docs. Two high-cardinality shuffles
    (gram groupBy on 8-byte hashes, per-doc interval sweep); exact
    integer coverage, one final division. Data-level, one row per doc
    with >= 8 tokens."""
    from hawk_pack_spark.operators.dedup import dup_ngram_spans

    docs = load_table(spark, "documents", sf_dir)
    return dup_ngram_spans(docs, n=8, min_docs=2)


DUP_NGRAM_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t != '') AS w
  FROM documents),
base AS MATERIALIZED (SELECT doc_id, len(w) AS nt, w FROM tok WHERE len(w) >= 8),
occ AS (
  SELECT doc_id, nt, UNNEST(range(1, nt - 8 + 2)) AS pos, w
  FROM base),
g AS MATERIALIZED (
  SELECT doc_id, pos,
         CAST(concat('0x', substr(md5(array_to_string(w[pos:pos+7], ' ')),
                                  1, 15)) AS BIGINT) AS gh
  FROM occ),
dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
docc AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
cov AS (
  SELECT doc_id, pos,
         GREATEST(0, pos + 8 - GREATEST(pos,
           COALESCE(MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos))) AS c
  FROM docc),
perdoc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
         CAST(SUM(c) AS BIGINT) AS dup_tokens
  FROM cov GROUP BY 1)
SELECT b.doc_id, CAST(b.nt AS BIGINT) AS n_tokens,
       CAST(b.nt - 8 + 1 AS BIGINT) AS n_grams,
       COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
       COALESCE(p.dup_tokens, 0) AS dup_tokens,
       ROUND(CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
             / CAST(b.nt AS DOUBLE), 6) AS dup_fraction
FROM base b LEFT JOIN perdoc p USING (doc_id)
"""


def q_phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search (retrieval.phrase_search): docs containing
    the token sequence 'fast sort', with match count and first
    position — SHUFFLE-FREE positional matching (one filtered
    position scan per doc, no explode/join/agg). Data-level, one row
    per matching doc."""
    from hawk_pack_spark.operators.retrieval import phrase_search

    docs = load_table(spark, "documents", sf_dir)
    return phrase_search(docs, "fast sort")


PHRASE_SEARCH_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t != '') AS w
  FROM documents),
m AS (
  SELECT doc_id,
         list_filter(range(1, len(w) - 2 + 2),
                     i -> w[i:i+1] = ['fast', 'sort']) AS hits
  FROM tok WHERE len(w) >= 2)
SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_matches,
       CAST(list_min(hits) AS BIGINT) AS first_pos
FROM m WHERE len(hits) > 0
"""


def q_user_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-purchase (analytics.kaplan_meier):
    per-user duration from first event to first purchase, RIGHT-
    CENSORED at the 2024-01-05 analysis cutoff (users who hadn't
    converted by then are censored at cutoff − first, not counted as
    events — the bias K-M removes). One per-user reduction, one tiny
    per-time groupBy, survival folded over the time-sorted (d, n)
    list. Data-level, one row per distinct duration."""
    from hawk_pack_spark.operators.analytics import kaplan_meier

    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit("2024-01-05").cast("date")
    pu = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("_purch"),
    )
    subj = pu.where(F.col("_first") <= cutoff).select(
        F.when(
            F.col("_purch").isNotNull() & (F.col("_purch") <= cutoff),
            F.datediff("_purch", "_first"),
        )
        .otherwise(F.datediff(cutoff, F.col("_first")))
        .alias("time"),
        (F.col("_purch").isNotNull() & (F.col("_purch") <= cutoff)).alias(
            "observed"
        ),
    )
    return kaplan_meier(subj, "time", "observed")
