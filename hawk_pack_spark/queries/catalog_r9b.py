"""round-9 rows (second batch)

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price
from hawk_pack_spark.queries.catalog_dedup import _minhash_capped_sql  # noqa: F401
from hawk_pack_spark.queries.catalog_text import _LANG_STRUCTS  # noqa: F401
from hawk_pack_spark.queries.catalog_vector import _embeddings_vectors  # noqa: F401



KM_SURVIVAL_SQL = """
WITH pu AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
           AS p
  FROM events GROUP BY 1),
subj AS (
  SELECT CASE WHEN p IS NOT NULL AND p <= DATE '2024-01-05'
              THEN CAST(p - f AS BIGINT)
              ELSE CAST(DATE '2024-01-05' - f AS BIGINT) END AS time,
         (p IS NOT NULL AND p <= DATE '2024-01-05') AS ev
  FROM pu WHERE f <= DATE '2024-01-05'),
weekly AS (
  SELECT time,
         CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM subj GROUP BY 1),
tbl AS MATERIALIZED (
  SELECT time, d, c,
         CAST(SUM(d + c) OVER (ORDER BY time
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS n_at_risk
  FROM weekly),
lst AS (SELECT list({'t': time, 'd': d, 'n': n_at_risk} ORDER BY time) AS l
        FROM tbl)
SELECT time, d, c, n_at_risk,
       ROUND(CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 6) AS hazard,
       ROUND(list_reduce(
         list_prepend(1.0,
           list_transform(list_filter(l, x -> x.t <= time),
                          x -> 1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
         (acc, v) -> acc * v), 6) AS survival
FROM tbl, lst
"""


def q_containment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed set-containment join (dedup.containment_prefix_join):
    ordered doc pairs with >= 80% of A's word-3-gram set inside B —
    the asymmetric quote/subset-dedup signal Jaccard misses. LOSSLESS
    prefix filter (probe prefixes vs full postings), integer-exact
    verify (5·|A∩B| >= 4·|A|). The brute-force oracle is quadratic, so
    this row is spark-only at the 10x gate (jaccard_docs_lossless
    precedent). Data-level."""
    from hawk_pack_spark.operators.dedup import containment_prefix_join

    docs = load_table(spark, "documents", sf_dir)
    return containment_prefix_join(docs, 0.8, gram_n=3)


CONTAINMENT_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t != '') AS w
  FROM documents),
gs AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 3 + 2),
                       i -> array_to_string(w[i:i+2], ' '))) AS s
  FROM tok WHERE len(w) >= 3),
p AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib,
         len(list_intersect(a.s, b.s)) AS i, len(a.s) AS sa
  FROM gs a JOIN gs b ON a.doc_id != b.doc_id)
SELECT ia AS id_a, ib AS id_b, CAST(i AS BIGINT) AS n_common,
       CAST(sa AS BIGINT) AS size_a,
       ROUND(CAST(i AS DOUBLE) / CAST(sa AS DOUBLE), 6) AS containment
FROM p WHERE 5 * i >= 4 * sa
"""


def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage diagnostic (curation.oov_rate): per-doc
    out-of-vocabulary fraction against the corpus' own top-25 token
    vocabulary (deterministic count-then-token order; top-k cut is
    TakeOrderedAndProject — distributed partial top-k, never a
    one-partition sort of the frequency table). Data-level, one row
    per doc."""
    from hawk_pack_spark.functions.curation import oov_rate

    docs = load_table(spark, "documents", sf_dir)
    return oov_rate(docs, vocab_size=25)


OOV_RATE_SQL = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                t -> t != '')) AS tok
  FROM documents),
freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY 1),
vocab AS (SELECT tok FROM freq ORDER BY n DESC, tok ASC LIMIT 25),
tagged AS (
  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(oov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS oov_rate
FROM tagged GROUP BY 1
"""


def q_events_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (analytics.equal_frequency_bins):
    events.value into 10 rank-deciles with exact nearest-rank bounds
    (ties split by event_id, fully deterministic). The global rank is
    two-phase (range partition + local rank + prefix offsets), never
    a one-partition window. Data-level, one row per bin."""
    from hawk_pack_spark.operators.analytics import equal_frequency_bins

    ev = load_table(spark, "events", sf_dir)
    return equal_frequency_bins(
        ev.select("event_id", "value"), "value", n_bins=10,
        tiebreak_col="event_id",
    )


DECILE_BINS_SQL = """
WITH r AS (
  SELECT value,
         CAST(ROW_NUMBER() OVER (ORDER BY value, event_id) - 1 AS BIGINT)
           AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM events)
SELECT CAST(FLOOR(CAST(rn * 10 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(value) AS lo, MAX(value) AS hi
FROM r GROUP BY 1
"""


def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness (analytics.dau_mau): per-day DAU,
    trailing-7-day MAU, and the DAU/MAU ratio. One distinct
    (user, day) reduction; the trailing window is a bounded x7
    explode of that table (never a per-day rescan). Data-level, one
    row per day of the span."""
    from hawk_pack_spark.operators.analytics import dau_mau

    ev = load_table(spark, "events", sf_dir)
    return dau_mau(ev, window_days=7)


DAU_MAU_SQL = """
WITH ud AS MATERIALIZED (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
            FROM events),
span AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
         FROM events),
spine AS MATERIALIZED (SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
            AS day FROM span),
dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
        FROM ud GROUP BY 1),
mau AS (
  SELECT s.day, CAST(COUNT(DISTINCT ud.u) AS BIGINT) AS mau
  FROM spine s JOIN ud ON ud.d BETWEEN s.day - 6 AND s.day
  GROUP BY 1)
SELECT s.day, COALESCE(dau.dau, 0) AS dau, COALESCE(mau.mau, 0) AS mau,
       ROUND(CASE WHEN COALESCE(mau.mau, 0) > 0
                  THEN CAST(COALESCE(dau.dau, 0) AS DOUBLE)
                       / CAST(mau.mau AS DOUBLE)
                  ELSE 0.0 END, 6) AS stickiness
FROM spine s LEFT JOIN dau ON s.day = dau.day
             LEFT JOIN mau ON s.day = mau.day
"""


def q_copurchase_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (graph.personalized_pagerank, 8 rounds,
    d=0.85): teleport mass pinned to the part-key%50==0 source set —
    proximity-to-these-items scores, the 'related to THIS basket'
    recommender query. Loop invariants checkpointed once (the
    pagerank discipline); oracle unrolls the same 8 iterations as
    chained materialized CTEs. Data-level, one row per node."""
    from hawk_pack_spark.operators.graph import (
        copurchase_pairs,
        personalized_pagerank,
    )

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    sources = edges.select(F.col("src").alias("node")).where(
        F.col("node") % 50 == 0
    )
    r = personalized_pagerank(edges, sources, damping=0.85, iters=8)
    return r.select(
        F.col("node").alias("part"), F.round("rank", 6).alias("ppr")
    )


def _ppr_sql(iters: int = 8, damping: float = 0.85) -> str:
    # the _pagerank_sql conventions: repr'd double literals,
    # multi-referenced CTEs MATERIALIZED (inlining re-evaluates per
    # reference), one output ROUND(6)
    base, d = repr(1.0 - damping), repr(damping)
    sql = """
WITH t AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS MATERIALIZED (
  SELECT pa AS s, pb AS dd FROM und UNION ALL SELECT pb, pa FROM und),
deg AS MATERIALIZED (SELECT s, COUNT(*) AS deg FROM e GROUP BY 1),
nodes AS MATERIALIZED (
  SELECT DISTINCT s AS node,
         CASE WHEN s % 50 = 0 THEN 1.0 ELSE 0.0 END AS b
  FROM e),
it0 AS (SELECT node, b AS r FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
c{i} AS (SELECT e.dd AS node, SUM(it{i - 1}.r / deg.deg) AS c
  FROM e JOIN it{i - 1} ON e.s = it{i - 1}.node JOIN deg ON e.s = deg.s
  GROUP BY 1),
it{i} AS MATERIALIZED (
  SELECT n.node, {base} * n.b + {d} * COALESCE(c{i}.c, 0.0) AS r
  FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node)"""
    sql += f"\nSELECT node AS part, ROUND(r, 6) AS ppr FROM it{iters}"
    return sql


def q_copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients (graph.clustering_coefficient):
    per-part triangle density of the co-purchase graph — degree
    orientation keeps the wedge fan-out O(sqrt(m)) under any skew;
    each triangle attributes to its three members through one bounded
    x3 explode. Exact integer t/deg, one division. Data-level, one
    row per node with degree >= 2."""
    from hawk_pack_spark.operators.graph import (
        clustering_coefficient,
        copurchase_pairs,
    )

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    return clustering_coefficient(und, "item_a", "item_b")


CLUSTERING_COEFF_SQL = """
WITH t AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS MATERIALIZED (
  SELECT a.p AS x, b.p AS y FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT x AS node FROM und UNION ALL SELECT y FROM und)
  GROUP BY 1),
o AS MATERIALIZED (
  SELECT CASE WHEN (dx.degree, und.x) < (dy.degree, und.y)
              THEN und.x ELSE und.y END AS s,
         CASE WHEN (dx.degree, und.x) < (dy.degree, und.y)
              THEN und.y ELSE und.x END AS d
  FROM und JOIN deg dx ON und.x = dx.node JOIN deg dy ON und.y = dy.node),
tris AS (
  SELECT e1.s AS a, e1.d AS b, e2.d AS c
  FROM o e1 JOIN o e2 ON e1.d = e2.s JOIN o e3
       ON e3.s = e1.s AND e3.d = e2.d),
pern AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS nt FROM (
    SELECT a AS node FROM tris UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris)
  GROUP BY 1)
SELECT deg.node, deg.degree,
       COALESCE(pern.nt, 0) AS n_triangles,
       ROUND(2.0 * COALESCE(pern.nt, 0)
             / CAST(deg.degree * (deg.degree - 1) AS DOUBLE), 6)
         AS clustering
FROM deg LEFT JOIN pern ON deg.node = pern.node
WHERE deg.degree >= 2
"""


def q_purchase_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution (analytics.
    nearest_rank_percentiles): exact nearest-rank percentiles of each
    user's first-signup→first-purchase seconds — selections of actual
    data values (bit-exact cross-engine), computed with the two-phase
    distributed rank. Data-level, one row per percentile."""
    from hawk_pack_spark.operators.analytics import nearest_rank_percentiles

    ev = load_table(spark, "events", sf_dir)
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_timestamp("ts"))
        ).alias("_s"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_timestamp("ts"))
        ).alias("_p"),
    )
    lat = pu.where(
        F.col("_s").isNotNull()
        & F.col("_p").isNotNull()
        & (F.col("_p") >= F.col("_s"))
    ).select("user_id", (F.col("_p") - F.col("_s")).alias("latency_s"))
    return nearest_rank_percentiles(
        lat, "latency_s", (0, 25, 50, 75, 90, 99, 100), tiebreak_col="user_id"
    )


LATENCY_PCTL_SQL = """
WITH pu AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS s,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS p
  FROM events GROUP BY 1),
lat AS (
  SELECT user_id, p - s AS v FROM pu
  WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s),
r AS (
  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, user_id) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM lat),
spine AS (SELECT UNNEST([0, 25, 50, 75, 90, 99, 100]) AS percentile)
SELECT CAST(spine.percentile AS INTEGER) AS percentile,
       r.rn AS rank, r.v AS value, r.n AS n_rows
FROM spine JOIN r
  ON r.rn = GREATEST(1, CAST(CEIL(spine.percentile * r.n / 100.0) AS BIGINT))
"""


def q_funnel_stage_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel transition latency (analytics.funnel_latency): median
    and p90 seconds between consecutive funnel stages under the SAME
    chained-min semantics as funnel_conversion (stage k+1 weakly after
    the user's stage-k time). Latencies differentiate inside the
    per-user stage array (no second shuffle); percentile selection is
    a per-transition window rank. Data-level, one row per
    (transition, percentile)."""
    from hawk_pack_spark.operators.analytics import funnel_latency

    ev = load_table(spark, "events", sf_dir)
    return funnel_latency(
        ev, ["signup", "view", "click", "purchase"], (50, 90)
    )


FUNNEL_LATENCY_SQL = """
WITH ev AS MATERIALIZED (
  SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
  FROM events),
s1 AS MATERIALIZED (SELECT user_id, MIN(sec) AS t FROM ev
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS MATERIALIZED (SELECT e.user_id, MIN(e.sec) AS t FROM ev e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'view' AND e.sec >= s1.t GROUP BY 1),
s3 AS MATERIALIZED (SELECT e.user_id, MIN(e.sec) AS t FROM ev e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'click' AND e.sec >= s2.t GROUP BY 1),
s4 AS MATERIALIZED (SELECT e.user_id, MIN(e.sec) AS t FROM ev e
       JOIN s3 ON e.user_id = s3.user_id
       WHERE e.event_type = 'purchase' AND e.sec >= s3.t GROUP BY 1),
lat AS (
  SELECT 1 AS i, 'signup' AS f, 'view' AS tto, s2.user_id AS u,
         s2.t - s1.t AS l
  FROM s2 JOIN s1 ON s2.user_id = s1.user_id
  UNION ALL
  SELECT 2, 'view', 'click', s3.user_id, s3.t - s2.t
  FROM s3 JOIN s2 ON s3.user_id = s2.user_id
  UNION ALL
  SELECT 3, 'click', 'purchase', s4.user_id, s4.t - s3.t
  FROM s4 JOIN s3 ON s4.user_id = s3.user_id),
r AS (
  SELECT i, f, tto, l,
         CAST(ROW_NUMBER() OVER (PARTITION BY i ORDER BY l, u) AS BIGINT)
           AS rn,
         CAST(COUNT(*) OVER (PARTITION BY i) AS BIGINT) AS n
  FROM lat),
spine AS (SELECT UNNEST([50, 90]) AS percentile)
SELECT CAST(r.i AS INTEGER) AS transition_idx, r.f AS from_stage,
       r.tto AS to_stage, CAST(spine.percentile AS INTEGER) AS percentile,
       r.n AS n_users, r.l AS latency_s
FROM spine JOIN r
  ON r.rn = GREATEST(1, CAST(CEIL(spine.percentile * r.n / 100.0) AS BIGINT))
"""


def q_daily_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate (analytics.bounce_rate): 30-min-gap sessions,
    single-event sessions are bounces, grouped by session-start day.
    One per-user window sort shared by gap flag and session id; exact
    counts, one division. Data-level, one row per day."""
    from hawk_pack_spark.operators.analytics import bounce_rate

    ev = load_table(spark, "events", sf_dir)
    return bounce_rate(ev, gap_s=1800)


BOUNCE_RATE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
per_sess AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS len,
         MIN(CAST(ts AS DATE)) AS day
  FROM s GROUP BY 1, 2)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       ROUND(CAST(SUM(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
FROM per_sess GROUP BY 1
"""


def q_event_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence (analytics.gap_percentiles): per event type,
    nearest-rank p50/p90 of the seconds between consecutive events —
    the watermark/session-gap tuning diagnostic. One shared per-group
    window sort; percentile values are actual observed gaps.
    Data-level, one row per (type, percentile)."""
    from hawk_pack_spark.operators.analytics import gap_percentiles

    ev = load_table(spark, "events", sf_dir)
    return gap_percentiles(ev, ["event_type"], "ts", "event_id", (50, 90))


GAP_PCTL_SQL = """
WITH g AS (
  SELECT event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
r AS (
  SELECT event_type, gap, event_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY gap, event_id) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM g WHERE gap IS NOT NULL),
spine AS (SELECT UNNEST([50, 90]) AS percentile)
SELECT r.event_type, CAST(spine.percentile AS INTEGER) AS percentile,
       r.n AS n_gaps, r.gap AS gap_s
FROM spine JOIN r
  ON r.rn = GREATEST(1, CAST(CEIL(spine.percentile * r.n / 100.0) AS BIGINT))
"""


def q_source_ctfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF keywords (bm25.ctfidf_terms, the BERTopic
    c-TF-IDF idea): each source treated as one pseudo-document, score
    = tf x ln(n_classes/df_classes), top-3 terms per source
    (WindowGroupLimit, term-tiebroken). Data-level, one row per
    (source, rank)."""
    from hawk_pack_spark.operators.bm25 import ctfidf_terms

    docs = load_table(spark, "documents", sf_dir)
    return ctfidf_terms(docs, "source", top_k=3)


CTFIDF_SQL = r"""
WITH toks AS (
  SELECT source AS class,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                t -> t != '')) AS term
  FROM documents),
tf AS MATERIALIZED (SELECT class, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
nc AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS n FROM documents),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_classes
        FROM tf GROUP BY 1),
scored AS (
  SELECT tf.class, tf.term, tf.tf, dfq.df_classes,
         ROUND(CAST(tf.tf AS DOUBLE)
               * LN(nc.n / CAST(dfq.df_classes AS DOUBLE)), 6) AS ctfidf
  FROM tf JOIN dfq ON tf.term = dfq.term, nc),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY class
              ORDER BY ctfidf DESC, term ASC) AS INTEGER) AS rank
  FROM scored)
SELECT class, rank, term, tf, df_classes, ctfidf FROM r WHERE rank <= 3
"""


def q_domain_token_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus-style per-domain curation (curation.domain_token_topp):
    within each source, keep the highest-n_chars docs covering 80% of
    the domain's token mass — integer cross-multiplied threshold (no
    float compare), first doc always kept, derandomized. Data-level,
    one row per kept doc."""
    from hawk_pack_spark.functions.curation import domain_token_topp

    docs = load_table(spark, "documents", sf_dir)
    return domain_token_topp(docs, p_permille=800, quality_col="n_chars")


DOMAIN_TOPP_SQL = r"""
WITH t AS MATERIALIZED (
  SELECT doc_id, source, n_chars,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              x -> x != '')) AS BIGINT) AS n_tokens
  FROM documents),
tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total
        FROM t GROUP BY 1),
r AS (
  SELECT t.doc_id, t.source, t.n_chars, t.n_tokens, tot.total,
         CAST(SUM(t.n_tokens) OVER w AS BIGINT) AS cum,
         ROW_NUMBER() OVER w AS rn
  FROM t JOIN tot ON t.source = tot.source
  WINDOW w AS (PARTITION BY t.source ORDER BY t.n_chars DESC, t.doc_id
               ROWS UNBOUNDED PRECEDING))
SELECT doc_id, source, n_chars, n_tokens, cum AS cum_tokens,
       total AS stratum_tokens
FROM r WHERE rn = 1 OR 1000 * cum <= 800 * total
"""


def q_event_type_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series co-movement (analytics.cross_correlations):
    pairwise Pearson between event types' daily value series (exact
    integer micro-units) — one day-keyed self-join (fan-out bounded by
    the type cardinality), one pair groupBy of decimal accumulators,
    string-hop doubles. Data-level, one row per unordered type
    pair."""
    from hawk_pack_spark.operators.analytics import cross_correlations

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("micros")
    )
    return cross_correlations(daily, "event_type", "day", "micros")


CROSS_CORR_SQL = """
WITH d AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
           AS micros
  FROM events GROUP BY 1, 2),
p AS (
  SELECT a.event_type AS series_a, b.event_type AS series_b,
         a.micros AS x, b.micros AS y
  FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type),
agg AS (
  SELECT series_a, series_b,
    CAST(COUNT(*) AS DECIMAL(38,0)) AS n0,
    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
    SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS sxy,
    SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS sxx,
    SUM(CAST(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS syy
  FROM p GROUP BY 1, 2),
f AS (
  SELECT series_a, series_b, CAST(n0 AS BIGINT) AS n_common,
    CAST(CAST(CAST(n0*sxy - sx*sy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS num,
    CAST(CAST(CAST(n0*sxx - sx*sx AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS d1,
    CAST(CAST(CAST(n0*syy - sy*sy AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS d2
  FROM agg)
SELECT series_a, series_b, n_common,
       ROUND(num / (SQRT(d1) * SQRT(d2)), 6) AS pearson
FROM f WHERE d1 > 0 AND d2 > 0
"""


def q_orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth (analytics.period_growth):
    per-priority monthly cents totals with the previous month and the
    growth rate — exact integer totals, one division, NULL (not 0) on
    each series' first month. Data-level, one row per
    (priority, month)."""
    from hawk_pack_spark.operators.analytics import period_growth

    orders = load_table(spark, "orders", sf_dir)
    o = orders.select(
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return period_growth(o, ["o_orderpriority"], "month", "cents")


MOM_GROWTH_SQL = """
WITH m AS (
  SELECT o_orderpriority,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS value
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, period, value,
       LAG(value) OVER w AS prev_value,
       ROUND(CAST(value - LAG(value) OVER w AS DOUBLE)
             / CAST(LAG(value) OVER w AS DOUBLE), 6) AS growth
FROM m WINDOW w AS (PARTITION BY o_orderpriority ORDER BY period)
"""


def q_parts_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue classification (analytics.abc_classes):
    parts labeled A/B/C by running share of lineitem revenue cents
    (80/95 permille boundaries, integer cross-multiplied, top part
    always A). Data-level, one row per part."""
    from hawk_pack_spark.operators.analytics import abc_classes

    li = load_table(spark, "lineitem", sf_dir)
    rows = li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return abc_classes(rows, "l_partkey", "cents")


ABC_CLASSES_SQL = """
WITH agg AS MATERIALIZED (
  SELECT l_partkey AS key,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value
  FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(SUM(value) AS BIGINT) AS total FROM agg),
r AS (
  SELECT key, value, tot.total,
         CAST(SUM(value) OVER w AS BIGINT) AS cum,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank
  FROM agg, tot
  WINDOW w AS (ORDER BY value DESC, key ASC ROWS UNBOUNDED PRECEDING))
SELECT key, value, rank, cum AS cum_value, total AS total_value,
       CASE WHEN rank = 1 OR 1000 * cum <= 800 * total THEN 'A'
            WHEN 1000 * cum <= 950 * total THEN 'B'
            ELSE 'C' END AS abc_class
FROM r
"""


def q_binary_quant_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit binary-quantization kNN (similarity.binary_quant_knn):
    Hamming top-40 over sign-packed 32-bit code words prefilters,
    exact L2 re-ranks to top-10 — and unlike the PQ/IVF recall-gated
    rows this ANN row is FULL VALUE PARITY end to end (DuckDB
    xor/bit_count mirror the prefilter bit-for-bit). Data-level, one
    row per (query, rank)."""
    from hawk_pack_spark.operators.similarity import binary_quant_knn

    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = binary_quant_knn(emb, queries, k=10, dim=64, oversample=4)
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist"), "rank"
    )


BINARY_QUANT_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS MATERIALIZED (
  SELECT vec_id, v,
    [list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(range(1, 33),
         i -> CAST(CASE WHEN v[i] > 0 THEN 1 ELSE 0 END AS BIGINT))),
       (acc, b) -> acc * 2 + b),
     list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(range(33, 65),
         i -> CAST(CASE WHEN v[i] > 0 THEN 1 ELSE 0 END AS BIGINT))),
       (acc, b) -> acc * 2 + b)] AS code
  FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, code AS qcode
      FROM c WHERE vec_id < 20),
h AS (
  SELECT q.query_id, c.vec_id, c.v, q.qv,
         bit_count(xor(CAST(c.code[1] AS BIGINT), CAST(q.qcode[1] AS BIGINT)))
         + bit_count(xor(CAST(c.code[2] AS BIGINT), CAST(q.qcode[2] AS BIGINT)))
           AS hd
  FROM q, c),
pre AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY hd, vec_id) AS hr
    FROM h)
  WHERE hr <= 40),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65),
             i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM pre),
r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 10
"""


def q_events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores (analytics.rolling_zscore): each
    event's value z-scored against its type's last 20 observations —
    exact decimal frame sums, z = (n·x − Σx)/sqrt(n·Σx² − (Σx)²) via
    the string hop, one division, |z|≥3 gate on the rounded value.
    Data-level, one row per scored event."""
    from hawk_pack_spark.operators.analytics import rolling_zscore

    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1000000).cast("long").alias("micros"),
    )
    return rolling_zscore(
        ev, ["event_type"], "ts", "event_id", "micros",
        window_rows=20, z_gate_x10=30, min_window=10,
    )


ROLLING_ZSCORE_SQL = """
WITH f AS (
  SELECT event_type, event_id AS event_ref,
         CAST(ROUND(value * 1000000) AS BIGINT) AS x,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         SUM(CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0)))
           OVER w AS sx,
         SUM(CAST(CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0))
             * CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0))
             AS DECIMAL(38,0))) OVER w AS sxx
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
g AS (
  SELECT event_type, event_ref, x, n,
    CAST(CAST(CAST(CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) - sx
         AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS num,
    CAST(CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx * sx AS DECIMAL(38,0))
         AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS den2
  FROM f WHERE n >= 10)
SELECT event_type, event_ref, x, n AS n_window,
       ROUND(num / SQRT(den2), 6) AS z,
       CAST(ABS(ROUND(num / SQRT(den2), 6)) * 10 >= 30 AS INTEGER)
         AS outlier
FROM g WHERE den2 > 0
"""


def q_neardup_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component census (graph.component_sizes): hash-min
    label propagation over the MinHash-LSH near-dup pair graph (same
    capped pair set as dedup_clusters) — one row per duplicate
    cluster with its min-id representative and size, the
    cluster-size-distribution report a dedup run is judged by.
    Oracle: recursive-CTE transitive closure (quadratic in component
    size — the spark side is the scale path). Data-level."""
    from hawk_pack_spark.operators.dedup import minhash_near_dup
    from hawk_pack_spark.operators.graph import component_sizes

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_near_dup(
        docs, num_hashes=8, bands=4, threshold=0.9, max_bucket=20
    )
    return component_sizes(pairs, "id_a", "id_b")


def _component_sizes_sql() -> str:
    minhash = _minhash_capped_sql().strip().rstrip()
    return f"""
WITH RECURSIVE pairs AS ({minhash}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (
  SELECT a AS node, LEAST(MIN(b), a) AS component FROM reach GROUP BY a)
SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM comp GROUP BY 1
"""


def q_langid_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation (analytics.classification_report):
    per-class precision/recall/F1 of the deterministic lang-ID
    heuristic against documents.lang — one contingency reduction,
    tiny re-aggregations, sklearn zero_division=0 convention.
    Data-level, one row per class."""
    from hawk_pack_spark.operators.analytics import classification_report

    docs = load_table(spark, "documents", sf_dir)
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        T.lang_id("text").alias("pred_lang"),
    )
    return classification_report(pred, "true_lang", "pred_lang")


def _langid_report_sql() -> str:
    # the SAME lang-ID SQL expression the lang_id spec verifies
    return f"""
WITH toks AS (
  SELECT lang,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
pred AS (
  SELECT lang AS t, list_aggregate([{_LANG_STRUCTS}], 'max').lang AS p
  FROM toks),
cm AS (SELECT t, p, CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
tp AS (SELECT t AS label, n AS tp FROM cm WHERE t = p),
sup AS (SELECT t AS label, CAST(SUM(n) AS BIGINT) AS support
        FROM cm GROUP BY 1),
prd AS (SELECT p AS label, CAST(SUM(n) AS BIGINT) AS n_predicted
        FROM cm GROUP BY 1),
j AS (
  SELECT COALESCE(sup.label, prd.label) AS label,
         COALESCE(support, 0) AS support,
         COALESCE(n_predicted, 0) AS n_predicted,
         COALESCE(tp.tp, 0) AS tp
  FROM sup FULL OUTER JOIN prd ON sup.label = prd.label
  LEFT JOIN tp ON COALESCE(sup.label, prd.label) = tp.label),
r AS (
  SELECT label, support, n_predicted, tp,
    CASE WHEN n_predicted > 0
         THEN CAST(tp AS DOUBLE) / CAST(n_predicted AS DOUBLE)
         ELSE 0.0 END AS prec,
    CASE WHEN support > 0
         THEN CAST(tp AS DOUBLE) / CAST(support AS DOUBLE)
         ELSE 0.0 END AS rec
  FROM j)
SELECT label, support, n_predicted, tp,
       ROUND(prec, 6) AS precision, ROUND(rec, 6) AS recall,
       ROUND(CASE WHEN prec + rec > 0
                  THEN 2.0 * prec * rec / (prec + rec)
                  ELSE 0.0 END, 6) AS f1
FROM r
"""


def q_event_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (analytics.
    chi_square_independence): is event_type independent of the user's
    parity cohort? One contingency reduction; X² folds over the
    sorted cell list. Data-level single row (n, dof, chi2)."""
    from hawk_pack_spark.operators.analytics import chi_square_independence

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", (F.col("user_id") % 2).cast("bigint").alias("cohort")
    )
    return chi_square_independence(ev, "event_type", "cohort")


CHI_SQUARE_SQL = """
WITH cm AS (
  SELECT event_type AS a, CAST(user_id % 2 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  -- two-sided null filter mirrors chi_square_independence, which drops
  -- rows where EITHER column is NULL (ADVICE r9: GROUP BY would keep a
  -- NULL cohort group here while Spark discards it)
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2),
ra AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ra FROM cm GROUP BY 1),
rb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS rb FROM cm GROUP BY 1),
cells AS (SELECT ra.a, rb.b, COALESCE(cm.n, 0) AS n, ra.ra, rb.rb
          FROM ra CROSS JOIN rb
          LEFT JOIN cm ON cm.a = ra.a AND cm.b = rb.b),
one AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT a) AS BIGINT) AS nr,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS nc,
         list({'a': a, 'b': b, 'n': n, 'ra': ra, 'rb': rb}
              ORDER BY a, b) AS l
  FROM cells)
SELECT n, (nr - 1) * (nc - 1) AS dof,
  ROUND(list_reduce(list_prepend(0.0,
    list_transform(l, x ->
      (CAST(x.n AS DOUBLE)
         - CAST(x.ra AS DOUBLE) * CAST(x.rb AS DOUBLE) / CAST(n AS DOUBLE))
      * (CAST(x.n AS DOUBLE)
         - CAST(x.ra AS DOUBLE) * CAST(x.rb AS DOUBLE) / CAST(n AS DOUBLE))
      / (CAST(x.ra AS DOUBLE) * CAST(x.rb AS DOUBLE) / CAST(n AS DOUBLE)))),
    (acc, v) -> acc + v), 6) AS chi2
FROM one
"""


def q_ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (analytics.two_proportion_ztest): did
    the even-user cohort purchase at a different rate than the odd
    cohort? Per-user conversion flags from one reduction, pooled z
    from exact counts in a fixed-order expression. Data-level single
    row."""
    from hawk_pack_spark.operators.analytics import two_proportion_ztest

    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("_np"),
        F.sum((F.col("event_type") == "view").cast("int")).alias("_nv"),
    )
    # "engaged buyer": more purchases than views — non-degenerate on
    # this fixture (every user purchases at least once, so a bare
    # converted flag has pooled p = 1 and an undefined z)
    subj = per_user.select(
        (F.col("user_id") % 2).cast("bigint").alias("cohort"),
        (F.col("_np") > F.col("_nv")).alias("converted"),
    )
    return two_proportion_ztest(subj, "cohort", "converted")


AB_TEST_SQL = """
WITH pu AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              > SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS INT) AS conv
  FROM events GROUP BY 1),
g AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS k
  FROM pu GROUP BY 1),
w AS (
  SELECT MIN(grp) AS ga, MAX(grp) AS gb,
         MIN(CASE WHEN rn = 1 THEN n END) AS n1,
         MIN(CASE WHEN rn = 2 THEN n END) AS n2,
         MIN(CASE WHEN rn = 1 THEN k END) AS k1,
         MIN(CASE WHEN rn = 2 THEN k END) AS k2
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY grp) AS rn FROM g))
SELECT ga AS group_a, gb AS group_b, n1 AS n_a, n2 AS n_b,
       k1 AS k_a, k2 AS k_b,
       ROUND(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate_a,
       ROUND(CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS rate_b,
       ROUND((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / SQRT((CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                    * (1.0 - CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                    * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))),
             6) AS z
FROM w
"""
