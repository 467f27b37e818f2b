"""round-10 rows

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



def q_orders_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile (profile.key_skew_profile) of orders on
    o_custkey: the top-20 heavy-hitter report with exact ppm shares
    and the skew ratio vs a uniform key — the pre-join diagnostic that
    decides salting/AQE-skew handling. ONE (key,count) reduction + a
    broadcast total + TakeOrdered; never a full sort. Data-level."""
    from hawk_pack_spark.operators.profile import key_skew_profile

    o = load_table(spark, "orders", sf_dir)
    return key_skew_profile(o, "o_custkey", top_k=20)


KEY_SKEW_SQL = """
WITH c AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nd FROM c),
top AS (
  SELECT k, n_rows, total, nd FROM c CROSS JOIN t
  ORDER BY n_rows DESC, k ASC LIMIT 20)
SELECT CAST(k AS VARCHAR) AS key, n_rows,
  CAST((n_rows * 1000000) // total AS BIGINT) AS share_ppm,
  ROUND(CAST(n_rows * nd AS DOUBLE) / CAST(total AS DOUBLE), 6)
    AS skew_ratio
FROM top
"""


def q_orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit screen
    (profile.benford_first_digit) on o_totalprice — the monetary-
    column fabrication/anomaly diagnostic (Nigrini 1996). Digit
    extraction is engine-exact (first char of the integer cents
    string); expected shares are hardcoded integer ppm constants on
    BOTH engines (libm log10 is not engine-contractual). Data-level,
    one row per observed digit."""
    from hawk_pack_spark.operators.profile import benford_first_digit

    o = load_table(spark, "orders", sf_dir)
    return benford_first_digit(o, "o_totalprice")


BENFORD_SQL = """
WITH c AS (
  SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_values
  FROM orders WHERE o_totalprice IS NOT NULL
    AND CAST(ROUND(o_totalprice * 100) AS BIGINT) > 0
  GROUP BY 1),
t AS (SELECT CAST(SUM(n_values) AS BIGINT) AS total FROM c),
e AS (
  SELECT digit, n_values,
    CAST((n_values * 1000000) // total AS BIGINT) AS share_ppm,
    CAST(CASE digit
      WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
      WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
      WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757
    END AS BIGINT) AS benford_ppm
  FROM c CROSS JOIN t)
SELECT digit, n_values, share_ppm, benford_ppm,
       CAST(ABS(share_ppm - benford_ppm) AS BIGINT) AS deviation_ppm
FROM e
"""


def q_copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (graph.degree_assortativity, Newman PRL
    2002) of the co-purchase graph: ONE number — do high-degree parts
    co-occur with each other (r>0) or with leaves (r<0)? Exact
    decimal(38,0) Pearson accumulators over integer degrees; the
    single final division is the only float op. Data-level 1 row."""
    from hawk_pack_spark.operators.graph import (
        copurchase_pairs,
        degree_assortativity,
    )

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    return degree_assortativity(und, "item_a", "item_b")


ASSORTATIVITY_SQL = """
WITH t AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS MATERIALIZED (
  SELECT pa AS s, pb AS d FROM und UNION ALL SELECT pb, pa FROM und),
deg AS MATERIALIZED (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS dg FROM e GROUP BY 1),
xy AS (
  SELECT dx.dg AS x, dy.dg AS y
  FROM e JOIN deg dx ON e.s = dx.s JOIN deg dy ON e.d = dy.s),
agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx
  FROM xy)
SELECT CAST(m AS BIGINT) AS m_directed,
  CASE WHEN m * sxx - sx * sx <> 0 THEN
    ROUND(CAST(m * sxy - sx * sx AS DOUBLE)
          / CAST(m * sxx - sx * sx AS DOUBLE), 6)
  END AS assortativity
FROM agg
"""


def q_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (bm25.js_divergence, nats) between
    every source pair's unigram distribution over the corpus top-500
    vocabulary + ONE residual bucket — the frequency-aware domain-
    shift measure beside vocab_overlap's set Jaccard. Per-pair
    divergence folds over the token-SORTED list in fixed operand
    order (deterministic IEEE sums). Data-level, one row per source
    pair."""
    from hawk_pack_spark.operators.bm25 import js_divergence

    d = load_table(spark, "documents", sf_dir)
    return js_divergence(d, "source", "text", vocab_size=500)


JS_DIVERGENCE_SQL = """
WITH tok AS MATERIALIZED (
  SELECT source AS c,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x != '')) AS t
  FROM documents),
vocab AS MATERIALIZED (
  SELECT t FROM (
    SELECT t, COUNT(*) AS n FROM tok GROUP BY 1
    ORDER BY n DESC, t ASC LIMIT 500)),
b AS MATERIALIZED (
  SELECT c, CASE WHEN v.t IS NOT NULL THEN tok.t ELSE '' END AS t,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM tok LEFT JOIN vocab v ON tok.t = v.t GROUP BY 1, 2),
tot AS (SELECT c, CAST(SUM(n) AS BIGINT) AS tt FROM b GROUP BY 1),
pairs AS (
  SELECT a.c AS ca, b2.c AS cb FROM tot a JOIN tot b2 ON a.c < b2.c),
sup AS (SELECT DISTINCT t FROM b),
spine AS (SELECT ca, cb, t FROM pairs CROSS JOIN sup),
j AS (
  SELECT ca, cb, spine.t,
         COALESCE(x1.n, 0) AS n1, COALESCE(x2.n, 0) AS n2
  FROM spine
  LEFT JOIN b x1 ON x1.c = spine.ca AND x1.t = spine.t
  LEFT JOIN b x2 ON x2.c = spine.cb AND x2.t = spine.t),
l AS (
  SELECT ca, cb, list({'t': t, 'n1': n1, 'n2': n2} ORDER BY t) AS ll
  FROM j GROUP BY 1, 2),
w AS (
  SELECT l.ca, l.cb, ll, t1.tt AS t1, t2.tt AS t2
  FROM l JOIN tot t1 ON t1.c = l.ca JOIN tot t2 ON t2.c = l.cb)
SELECT ca AS class_a, cb AS class_b,
  CAST(len(ll) AS INT) AS n_terms,
  ROUND(0.5 * list_reduce(list_prepend(0.0, list_transform(ll, x ->
    CASE WHEN x.n1 > 0 THEN
      (CAST(x.n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
      * ln((CAST(x.n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
           / ((CAST(x.n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
               + CAST(x.n2 AS DOUBLE) / CAST(t2 AS DOUBLE)) / 2.0))
    ELSE 0.0 END
    + CASE WHEN x.n2 > 0 THEN
      (CAST(x.n2 AS DOUBLE) / CAST(t2 AS DOUBLE))
      * ln((CAST(x.n2 AS DOUBLE) / CAST(t2 AS DOUBLE))
           / ((CAST(x.n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
               + CAST(x.n2 AS DOUBLE) / CAST(t2 AS DOUBLE)) / 2.0))
    ELSE 0.0 END)),
    (acc, v) -> acc + v), 6) AS js_divergence
FROM w
"""


def q_events_seasonal_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition
    (analytics.seasonal_decompose, period 7) of each event type's
    daily value series (exact integer micros): value = trend
    (centered 7-row MA, NULL at edges) + seasonal (per-phase mean of
    the detrended series, phase = epoch-day mod 7) + residual. The
    trend/seasonality split upstream of the ACF/CUSUM battery.
    Daily totals capture in exact integer MILLI-units: at micro
    magnitude a 10x fixture's daily sums reach ~2e9, where round(6)
    sits below one double ulp and the engines' rounding may legally
    disagree (the sf1 gate caught exactly that); milli keeps the
    integer-exact MA with ulp ~1e-10 at any gated SF. Data-level,
    one row per (type, day)."""
    from hawk_pack_spark.operators.analytics import seasonal_decompose

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000).cast("long")).alias("millis")
    )
    return seasonal_decompose(daily, ["event_type"], "day", "millis", period=7)


SEASONAL_DECOMP_SQL = """
WITH daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT)
           AS millis
  FROM events GROUP BY 1, 2),
t AS MATERIALIZED (
  SELECT event_type, day, millis,
    CASE WHEN COUNT(*) OVER w = 7
         THEN CAST(SUM(millis) OVER w AS BIGINT) END AS tsum,
    CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS INT) AS phase
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
s AS (
  SELECT event_type, phase,
         CAST(SUM(7 * millis - tsum) AS BIGINT) AS snum,
         CAST(COUNT(*) AS BIGINT) AS scnt
  FROM t WHERE tsum IS NOT NULL GROUP BY 1, 2)
SELECT t.event_type, t.day, t.millis,
  ROUND(CAST(t.tsum AS DOUBLE) / 7.0, 6) AS trend,
  ROUND(CAST(s.snum AS DOUBLE) / (7.0 * CAST(s.scnt AS DOUBLE)), 6)
    AS seasonal,
  ROUND(CAST(t.millis AS DOUBLE) - CAST(t.tsum AS DOUBLE) / 7.0
        - CAST(s.snum AS DOUBLE) / (7.0 * CAST(s.scnt AS DOUBLE)), 6)
    AS residual
FROM t LEFT JOIN s ON t.event_type = s.event_type AND t.phase = s.phase
"""


def q_cosine_docs_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS all-pairs weighted-cosine self-join
    (dedup.cosine_prefix_join — Bayardo et al., WWW'07): every doc
    pair with tf-idf unit-vector cosine ≥ 0.8, via the canonical-order
    prefix filter (suffix-norm² < τ tail rule, Cauchy-Schwarz
    losslessness). The frequency-aware exact complement of
    jaccard_docs_lossless. Terms are word 3-grams (the jaccard lesson
    holds for weighted cosine: single tokens saturate on the fixture
    vocabulary, prefixes stop pruning — measured >600s at 10x on
    tokens, seconds on grams). The oracle is the TRUE brute-force over
    term-sharing pairs — quadratic by nature, so this row (like the
    jaccard precedent) is expected spark-only at the 10× gate.
    Data-level (id_a, id_b, cosine)."""
    from hawk_pack_spark.operators.dedup import cosine_prefix_join

    d = load_table(spark, "documents", sf_dir)
    return cosine_prefix_join(d, threshold=0.8, gram_n=3)


COSINE_LOSSLESS_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
tf AS MATERIALIZED (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id,
      unnest(CASE WHEN len(ts) >= 3
        THEN list_transform(range(1, len(ts) - 1),
             i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])
        ELSE [] END) AS t
    FROM toks) GROUP BY 1, 2),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
dfq AS MATERIALIZED (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
w AS MATERIALIZED (
  SELECT doc_id, t, wv FROM (
    SELECT tf.doc_id, tf.t,
           CAST(tf.tf AS DOUBLE)
             * ln(CAST(nd.n AS DOUBLE) / CAST(dfq.df AS DOUBLE)) AS wv
    FROM tf JOIN dfq USING (t) CROSS JOIN nd)
  WHERE wv > 0),
nrm AS MATERIALIZED (
  SELECT doc_id,
         sqrt(list_reduce(list_prepend(0.0, list(wv * wv ORDER BY t)),
                          (a, v) -> a + v)) AS nrm
  FROM w GROUP BY doc_id),
u AS MATERIALIZED (
  SELECT w.doc_id, t, w.wv / nrm.nrm AS u FROM w JOIN nrm USING (doc_id)),
prod AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, a.t, a.u * b.u AS p
  FROM u a JOIN u b ON a.t = b.t AND a.doc_id < b.doc_id),
sim AS (
  SELECT ia, ib,
         list_reduce(list_prepend(0.0, list(p ORDER BY t)),
                     (a, v) -> a + v) AS s
  FROM prod GROUP BY 1, 2)
SELECT ia AS id_a, ib AS id_b, ROUND(s, 6) AS cosine
FROM sim WHERE s >= 0.8
"""


def q_doc_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) report + per-bin Brier
    (analytics.calibration_report) of an engine-portable repetition
    scorer against planted spam labels: the quality_classifier fixture
    (doc_id % 4 twins whose text is the first 3 tokens ×12) scored by
    p = sigmoid(6·dup_ratio − 3), dup_ratio = 1 − distinct/total
    tokens. Probabilities quantize ONCE to integer micro-units, so all
    aggregates are exact integer sums (decimal(38,0) for the Brier
    squares) — "is 0.8 really 80%" as data-level rows per bin."""
    from hawk_pack_spark.operators.analytics import calibration_report

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ts = T.tokens("text")
    base = docs.select(ts.alias("_ts"), F.lit(0).alias("label")).unionAll(
        docs.where(F.col("doc_id") % 4 == 0).select(
            F.flatten(F.array_repeat(F.slice(ts, 1, 3), 12)).alias("_ts"),
            F.lit(1).alias("label"),
        )
    ).where(F.size("_ts") > 0)
    dup = F.lit(1.0) - (
        F.size(F.array_distinct("_ts")).cast("double")
        / F.size("_ts").cast("double")
    )
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(6.0) * dup - F.lit(3.0)))
    )
    scored = base.select(p.alias("p"), "label")
    return calibration_report(scored, "p", "label", n_bins=10)


CALIBRATION_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
base AS (
  SELECT ts, 0 AS label FROM toks
  UNION ALL
  SELECT flatten(list_transform(range(0, 12), i -> ts[1:3])), 1
  FROM toks WHERE doc_id % 4 = 0),
feat AS (
  SELECT label,
    1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / CAST(len(ts) AS DOUBLE)
      AS dup
  FROM base WHERE len(ts) > 0),
pr AS (
  SELECT CAST(label AS BIGINT) AS y,
         1.0 / (1.0 + exp(-(6.0 * dup - 3.0))) AS p
  FROM feat),
pm AS (SELECT y, CAST(ROUND(p * 1000000) AS BIGINT) AS pm FROM pr),
b AS (
  SELECT LEAST(CAST(FLOOR((pm * 10) / 1000000) AS INT), 9) AS bin, pm, y,
         CAST(pm - y * 1000000 AS HUGEINT)
           * CAST(pm - y * 1000000 AS HUGEINT) AS sq
  FROM pm),
g AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(pm) AS BIGINT) AS spm,
         CAST(SUM(sq) AS HUGEINT) AS ssq
  FROM b GROUP BY 1)
SELECT bin, n, n_pos,
  ROUND(CAST(spm AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)), 6)
    AS mean_pred,
  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
  ROUND(CAST(ssq AS DOUBLE) / (1000000000000.0 * CAST(n AS DOUBLE)), 6)
    AS brier
FROM g
"""


def q_events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (analytics.holt_forecast,
    α=0.5, β=0.25, h=1) over each event type's daily value series
    (exact integer micros): final level/trend state + one-step
    forecast — the trend-aware upgrade of the EWMA row. The recurrence
    folds over the day-SORTED list in fixed operand order (bounded
    series: 30 days/type). The exact-integer daily micros convert to
    UNITS (one identical /1e6 on both engines) before the fold: at
    micro magnitude (~3e9) round(6) sits BELOW one double ulp, where
    the two engines' rounding implementations may legally disagree —
    at unit magnitude the discipline is safe again. Data-level, one
    row per type."""
    from hawk_pack_spark.operators.analytics import holt_forecast

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("micros")
    ).select(
        "event_type", "day", (F.col("micros") / F.lit(1e6)).alias("units")
    )
    return holt_forecast(
        daily, ["event_type"], "day", "units", alpha=0.5, beta=0.25,
        horizon=1,
    )


# NOTE: a list_reduce with a STRUCT accumulator whose fields
# cross-reference was measured mis-folding in DuckDB (probe: fields see
# inconsistent accumulator snapshots across steps) — the recurrence is
# therefore rendered as a recursive CTE, one exact double step per row.
HOLT_SQL = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
           AS micros
  FROM events GROUP BY 1, 2),
ord AS MATERIALIZED (
  SELECT event_type,
         CAST(micros AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS y,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
              AS INT) AS rn
  FROM daily),
cnt AS (SELECT event_type, CAST(COUNT(*) AS INT) AS n
        FROM ord GROUP BY 1),
rec AS (
  SELECT a.event_type, 1 AS rn, a.y AS l, b.y - a.y AS b
  FROM ord a JOIN ord b
    ON a.event_type = b.event_type AND a.rn = 1 AND b.rn = 2
  UNION ALL
  SELECT r.event_type, r.rn + 1,
         0.5 * o.y + 0.5 * (r.l + r.b),
         0.25 * (0.5 * o.y + 0.5 * (r.l + r.b) - r.l) + 0.75 * r.b
  FROM rec r JOIN ord o
    ON o.event_type = r.event_type AND o.rn = r.rn + 1)
SELECT cnt.event_type, cnt.n,
  ROUND(rec.l, 6) AS level, ROUND(rec.b, 6) AS trend,
  ROUND(rec.l + 1.0 * rec.b, 6) AS forecast
FROM cnt LEFT JOIN rec
  ON rec.event_type = cnt.event_type AND rec.rn = cnt.n
"""


def q_retrieval_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (retrieval.rank_biased_overlap, Webber et
    al. TOIS 2010; k=10, p=0.9) between the BM25 lexical arm and the
    hash-embedding cosine arm of the hybrid retriever — are the two
    arms redundant (RBO→1) or complementary (RBO→0) before RRF fuses
    them? Arms reuse the proven BM25/HASH_EMB renderings; the fold is
    a fixed 10-term series with every float product in fixed operand
    order. Data-level, one row per query."""
    from hawk_pack_spark.operators.bm25 import bm25_build, bm25_search
    from hawk_pack_spark.operators.retrieval import rank_biased_overlap
    from hawk_pack_spark.operators.similarity import hash_embeddings

    docs = load_table(spark, "documents", sf_dir)
    qterms = spark.createDataFrame(
        [(0, ["scan", "merge"]), (1, ["window", "join"])],
        "query_id long, terms array<string>",
    )
    lex = bm25_search(bm25_build(docs), qterms, k=10, score_round=6).select(
        "query_id", "doc_id", "rank"
    )
    qtexts = spark.createDataFrame(
        [(0, "scan merge"), (1, "window join")], "query_id long, text string"
    )
    dvec = hash_embeddings(docs, "doc_id", "text", dim=32)
    qvec = hash_embeddings(qtexts, "query_id", "text", dim=32).select(
        "query_id", F.col("embedding").alias("qv")
    )
    pairs = dvec.crossJoin(F.broadcast(qvec))
    sim = F.round(D.cosine_sim(F.col("qv"), F.col("embedding")), 6)
    sem = topk_rows(
        pairs.select("query_id", "doc_id", sim.alias("sim")),
        ["query_id"], "sim", 10, ascending=False, tie_cols=["doc_id"],
    ).select("query_id", "doc_id", "rank")
    return rank_biased_overlap(lex, sem, k=10, p=0.9)


RANK_OVERLAP_SQL = """
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
lexr AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         FROM sc),
v AS (
  SELECT doc_id,
    list_transform(range(0, 32), i -> CAST(len(list_filter(ts,
      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 32 = i)) AS DOUBLE)) AS v
  FROM toks),
qt AS (
  SELECT 0 AS query_id, ['scan', 'merge'] AS ts
  UNION ALL
  SELECT 1 AS query_id, ['window', 'join'] AS ts),
qv AS (
  SELECT query_id,
    list_transform(range(0, 32), i -> CAST(len(list_filter(ts,
      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 32 = i)) AS DOUBLE)) AS qv
  FROM qt),
d AS (
  SELECT query_id, v.doc_id,
    ROUND(list_sum(list_transform(range(1, 33), i -> qv[i] * v.v[i]))
      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
         * sqrt(list_sum(list_transform(v.v, x -> x * x)))), 6) AS sim
  FROM qv, v),
semr AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS rank
         FROM d),
la AS (SELECT query_id, list(doc_id ORDER BY rank) AS la
       FROM lexr WHERE rank <= 10 GROUP BY 1),
lb AS (SELECT query_id, list(doc_id ORDER BY rank) AS lb
       FROM semr WHERE rank <= 10 GROUP BY 1),
j AS (SELECT la.query_id, la.la, lb.lb FROM la JOIN lb USING (query_id)),
r AS (
  SELECT query_id,
    list_reduce(list_prepend(0.0, list_transform(range(1, 11), dd ->
      pow(0.9, CAST(dd AS DOUBLE) - 1.0)
        * (CAST(len(list_intersect(la[1:dd], lb[1:dd])) AS DOUBLE)
           / CAST(dd AS DOUBLE)))),
      (acc, x) -> acc + x) AS series,
    CAST(len(list_intersect(la[1:10], lb[1:10])) AS DOUBLE)
      / CAST(10 AS DOUBLE) AS ak
  FROM j)
SELECT query_id,
  ROUND((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)) * series
        + pow(0.9, 10.0) * ak, 6) AS rbo
FROM r
"""


@low_stream_shuffle
def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Misra-Gries heavy hitters (streaming/stateful.py
    `streaming_heavy_hitters`) ≡ the batch GROUP BY when capacity ≥
    the group's distinct items (the EXACT regime — zero decrements by
    the MG guarantee): events stream as three event-time thirds, items
    are user-id buckets (mod 200) per event type, capacity 300. The
    final snapshot (max-n_seen rows per group) must equal exact batch
    counts with undercount_bound 0; the approximation-regime bounds
    are pinned in tests/test_streaming_heavy_hitters.py. Per-key state
    is O(capacity) forever — the scale contract."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.stateful import streaming_heavy_hitters

    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (F.col("user_id") % 200).cast("string").alias("item"),
        "ts",
    )
    s1, s2 = "2024-01-11 00:00:00", "2024-01-21 00:00:00"
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_hh_")
    try:
        ev.where(F.col("ts") < F.lit(s1).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b0")
        ev.where(
            (F.col("ts") >= F.lit(s1).cast("timestamp"))
            & (F.col("ts") < F.lit(s2).cast("timestamp"))
        ).coalesce(1).write.parquet(f"{tmp}/src/b1")
        ev.where(F.col("ts") >= F.lit(s2).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b2")
        schema = spark.read.parquet(f"{tmp}/src/b0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/src/*")
        )
        q = (
            streaming_heavy_hitters(
                stream.drop("ts"), "event_type", "item", capacity=300
            )
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("hps_stream_hh_q")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("streaming_heavy_hitters exceeded 600s")
        allrows = spark.sql("SELECT * FROM hps_stream_hh_q")
        wmax = Window.partitionBy("event_type")
        final = (
            allrows.withColumn("_m", F.max("n_seen").over(wmax))
            .where(F.col("n_seen") == F.col("_m"))
            .select(
                "event_type", "item", "est_count", "n_seen",
                "undercount_bound",
            )
        )
        return final.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_HH_SQL = """
WITH c AS (
  SELECT event_type, CAST(user_id % 200 AS VARCHAR) AS item,
         CAST(COUNT(*) AS BIGINT) AS est_count
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
t AS (
  SELECT event_type, CAST(SUM(est_count) AS BIGINT) AS n_seen FROM c
  GROUP BY 1)
SELECT c.event_type, c.item, c.est_count, t.n_seen,
       CAST(0 AS BIGINT) AS undercount_bound
FROM c JOIN t USING (event_type)
"""


def q_events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (analytics.welch_ttest,
    Welch 1947) on event value between the two user-parity cohorts —
    the continuous-metric A/B readout beside ab_test_conversion.
    Values capture as exact integer micros; (n, Σx, Σx²) are exact
    decimal accumulators and the t/df math is ONE fixed-operand-order
    double expression mirrored verbatim in the oracle. Data-level,
    one row."""
    from hawk_pack_spark.operators.analytics import welch_ttest

    ev = load_table(spark, "events", sf_dir).select(
        (F.col("user_id") % 2).cast("string").alias("cohort"), "value"
    )
    return welch_ttest(ev, "cohort", "value", decimals=6)


WELCH_SQL = """
WITH b AS (
  SELECT CAST(user_id % 2 AS VARCHAR) AS grp,
         CAST(ROUND(value * 1000000) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT)
           AS sxx
  FROM b GROUP BY 1),
aa AS (SELECT * FROM g ORDER BY grp ASC LIMIT 1),
bb AS (SELECT * FROM g ORDER BY grp DESC LIMIT 1),
m AS (
  SELECT
    aa.grp AS group_a, bb.grp AS group_b, aa.n AS n_a, bb.n AS n_b,
    CAST(aa.n AS DOUBLE) AS n1, CAST(bb.n AS DOUBLE) AS n2,
    CAST(aa.sx AS DOUBLE) / 1000000.0 AS sx1,
    CAST(bb.sx AS DOUBLE) / 1000000.0 AS sx2,
    CAST(aa.sxx AS DOUBLE) / 1000000000000.0 AS sxx1,
    CAST(bb.sxx AS DOUBLE) / 1000000000000.0 AS sxx2
  FROM aa CROSS JOIN bb),
s AS (
  SELECT group_a, group_b, n_a, n_b, n1, n2,
    sx1 / n1 AS m1, sx2 / n2 AS m2,
    (sxx1 - sx1 * sx1 / n1) / (n1 - 1.0) AS v1,
    (sxx2 - sx2 * sx2 / n2) / (n2 - 1.0) AS v2
  FROM m),
e AS (
  SELECT *, v1 / n1 + v2 / n2 AS se2 FROM s)
SELECT group_a, group_b, n_a, n_b,
  ROUND(m1, 6) AS mean_a, ROUND(m2, 6) AS mean_b,
  ROUND((m1 - m2) / sqrt(se2), 6) AS t,
  ROUND((se2 * se2) / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                       + (v2 / n2) * (v2 / n2) / (n2 - 1.0)), 6) AS df
FROM e
"""


def q_events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum (analytics.mann_whitney_u)
    on event value between the user-parity cohorts — the
    distribution-free complement of events_welch_ttest. Joint ranking
    through the distributed two-phase rank (never a one-partition
    window); midranks exact via doubled ranks; tie-corrected normal z.
    Data-level, one row."""
    from hawk_pack_spark.operators.analytics import mann_whitney_u

    ev = load_table(spark, "events", sf_dir).select(
        (F.col("user_id") % 2).cast("string").alias("cohort"), "value"
    )
    return mann_whitney_u(ev, "cohort", "value", decimals=6)


MANN_WHITNEY_SQL = """
WITH b AS (
  SELECT CAST(user_id % 2 AS VARCHAR) AS grp,
         CAST(ROUND(value * 1000000) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
vs AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM b GROUP BY 1),
vr AS (
  SELECT c, t,
    CAST(COALESCE(SUM(t) OVER (ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum
  FROM vs),
gv AS (SELECT grp, c, CAST(COUNT(*) AS BIGINT) AS ng FROM b GROUP BY 1, 2),
pg AS (
  SELECT grp, CAST(SUM(ng) AS HUGEINT) AS n,
         CAST(SUM(CAST(ng AS HUGEINT)
                  * CAST((vr.cum + 1) + (vr.cum + vr.t) AS HUGEINT))
              AS HUGEINT) AS r2
  FROM gv JOIN vr USING (c) GROUP BY 1),
tie AS (
  SELECT CAST(SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
                  * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS HUGEINT)
           AS tied
  FROM vs),
aa AS (SELECT * FROM pg ORDER BY grp ASC LIMIT 1),
bb AS (SELECT * FROM pg ORDER BY grp DESC LIMIT 1),
m AS (
  SELECT aa.grp AS ga, bb.grp AS gb, aa.n AS na, bb.n AS nb,
         aa.r2 AS r2a, tie.tied
  FROM aa CROSS JOIN bb CROSS JOIN tie),
s AS (
  SELECT ga, gb, na, nb,
    CAST(na AS DOUBLE) AS n1, CAST(nb AS DOUBLE) AS n2,
    (CAST(r2a AS DOUBLE) - CAST(na AS DOUBLE)
       * (CAST(na AS DOUBLE) + 1.0)) / 2.0 AS ua,
    CAST(tied AS DOUBLE) AS td
  FROM m)
SELECT ga AS group_a, gb AS group_b,
  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  ROUND(ua, 6) AS u_a,
  ROUND((ua - n1 * n2 / 2.0)
        / sqrt((n1 * n2 / 12.0)
               * ((n1 + n2 + 1.0) - td / ((n1 + n2) * (n1 + n2 - 1.0)))),
        6) AS z
FROM s
"""


def q_events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (analytics.ks_test_2samp)
    on event value between the user-parity cohorts — the
    whole-distribution member of the test battery (z: proportions,
    t: means, U: ranks, KS: shapes). Exact: the max ECDF gap is an
    integer maximum (|cum1·n2 − cum2·n1|) with ONE final division;
    cumulative counts run range-partitioned. Data-level, one row."""
    from hawk_pack_spark.operators.analytics import ks_test_2samp

    ev = load_table(spark, "events", sf_dir).select(
        (F.col("user_id") % 2).cast("string").alias("cohort"), "value"
    )
    return ks_test_2samp(ev, "cohort", "value", decimals=6)


KS_TEST_SQL = """
WITH b AS (
  SELECT CAST(user_id % 2 AS VARCHAR) AS grp,
         CAST(ROUND(value * 1000000) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
vs AS (
  SELECT c,
         CAST(SUM(CASE WHEN grp = '0' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN grp = '1' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM b GROUP BY 1),
cum AS (
  SELECT CAST(SUM(c1) OVER w AS HUGEINT) AS f1,
         CAST(SUM(c2) OVER w AS HUGEINT) AS f2
  FROM vs
  WINDOW w AS (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
t AS (SELECT CAST(SUM(c1) AS HUGEINT) AS n1,
             CAST(SUM(c2) AS HUGEINT) AS n2 FROM vs),
m AS (
  SELECT CAST(MAX(ABS(f1 * t.n2 - f2 * t.n1)) AS HUGEINT) AS mx,
         t.n1, t.n2
  FROM cum CROSS JOIN t GROUP BY t.n1, t.n2)
SELECT '0' AS group_a, '1' AS group_b,
  CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
  ROUND(CAST(mx AS DOUBLE)
        / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
  ROUND(sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 6)
    AS threshold_scale
FROM m
"""
