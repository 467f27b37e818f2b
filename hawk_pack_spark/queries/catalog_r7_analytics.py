"""round-7 product-analytics rows

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



# ---------------------------------------------------------------------------
# round-7 tail: product-analytics / pipeline-maintenance surface
# (operators/analytics.py) — funnel, cohort retention, calendar
# gap-fill, incremental aggregate maintenance, derandomized weighted
# sampling, bit-deterministic z-score outliers. All data-level oracles.


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-stage conversion funnel over the events table: users
    progressing signup → view → click → purchase, each stage weakly
    after the user's earliest completion of the previous one. The
    classic product-analytics sequence query; plan is ONE scan + ONE
    shuffle (per-user sorted fold of the chained-min recurrence — the
    join-chain alternative scanned the source k(k+1)/2 times)."""
    from hawk_pack_spark.operators.analytics import funnel

    ev = load_table(spark, "events", sf_dir)
    return funnel(ev, ["signup", "view", "click", "purchase"])


FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
  FROM events
),
s1 AS (SELECT user_id, MIN(sec) AS t FROM ev
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.sec) AS t FROM ev e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'view' AND e.sec >= s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.sec) AS t FROM ev e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'click' AND e.sec >= s2.t GROUP BY 1),
s4 AS (SELECT e.user_id, MIN(e.sec) AS t FROM ev e
       JOIN s3 ON e.user_id = s3.user_id
       WHERE e.event_type = 'purchase' AND e.sec >= s3.t GROUP BY 1)
SELECT 1 AS stage_idx, 'signup' AS stage,
       (SELECT COUNT(*) FROM s1) AS n_users
UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM s3)
UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users bucketed by
    first-activity week, counted per (cohort_week, week_offset) they
    were active again — all-integer epoch bucketing, engine-exact."""
    from hawk_pack_spark.operators.analytics import cohort_retention

    ev = load_table(spark, "events", sf_dir)
    return cohort_retention(ev, period_s=7 * 86400)


COHORT_SQL = """
WITH up AS (
  SELECT DISTINCT user_id,
    CAST((sec - (sec % 604800)) / 604800 AS BIGINT) AS p
  FROM (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
        FROM events)
),
f AS (SELECT user_id, MIN(p) AS c FROM up GROUP BY 1)
SELECT f.c AS cohort_period, up.p - f.c AS period_offset,
       COUNT(*) AS n_users
FROM up JOIN f ON up.user_id = f.user_id
GROUP BY 1, 2
"""


def q_user_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with calendar densification: per-user daily
    event count + exact micro-unit value sum over the users' global
    [min, max] day span, zero-filled on inactive days. The day spine is
    sequence()+explode from a one-row agg, broadcast against the key
    set — no driver round-trip, one real shuffle (the actuals agg)."""
    from hawk_pack_spark.operators.analytics import gapfill_daily

    ev = load_table(spark, "events", sf_dir).where(F.col("user_id") < 20)
    return gapfill_daily(
        ev,
        ["user_id"],
        "ts",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1000000).cast("long")).alias(
                "sum_value_micro"
            ),
        ],
        {"n_events": 0, "sum_value_micro": 0},
    )


GAPFILL_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(ROUND(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE user_id < 20
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
days AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
keys AS (SELECT DISTINCT user_id FROM ev),
actual AS (
  SELECT user_id, day, COUNT(*) AS n_events,
         CAST(SUM(vm) AS BIGINT) AS sum_value_micro
  FROM ev GROUP BY 1, 2
)
SELECT k.user_id, d.day,
       CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(a.sum_value_micro, 0) AS BIGINT) AS sum_value_micro
FROM keys k CROSS JOIN days d
LEFT JOIN actual a ON a.user_id = k.user_id AND a.day = d.day
"""


def q_incremental_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the orders rollup per
    priority is computed as agg_state(base before 1998) merged with
    agg_state(delta from 1998) — one pass over the DELTA plus a
    state-sized merge, never a base rescan — and must equal the oracle's
    full recompute over the union. The 100 TB story: a daily delta
    updates a petabyte rollup at delta cost."""
    from hawk_pack_spark.operators.analytics import (
        agg_state,
        finalize_agg,
        merge_agg_states,
    )

    orders = load_table(spark, "orders", sf_dir)
    split = F.lit("1998-01-01").cast("timestamp")
    base = orders.where(F.col("o_orderdate") < split)
    delta = orders.where(F.col("o_orderdate") >= split)
    keys = ["o_orderpriority"]
    merged = merge_agg_states(
        [
            agg_state(base, keys, "o_totalprice"),
            agg_state(delta, keys, "o_totalprice"),
        ],
        keys,
    )
    return finalize_agg(merged, keys)


INCREMENTAL_AGG_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_rows,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  MIN(o_totalprice) AS min_value, MAX(o_totalprice) AS max_value,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*), 6) AS avg_value
FROM orders GROUP BY 1
"""


def q_weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derandomized A-ES weighted sampling without replacement: 100
    orders drawn with probability proportional to o_totalprice, the
    uniform draw coming from a Knuth multiplicative hash of the order
    key — reproducible across engines/retries, global top-n by
    ln(u)/w is a TakeOrdered (no full sort)."""
    from hawk_pack_spark.operators.analytics import weighted_sample

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice"
    )
    return weighted_sample(orders, 100, "o_orderkey", "o_totalprice")


WEIGHTED_SAMPLE_SQL = """
SELECT o_orderkey, o_totalprice FROM (
  SELECT o_orderkey, o_totalprice,
    LN((((o_orderkey % 2147483647) * 2654435761) % 4294967291 + 1) / 4294967292.0)
      / o_totalprice AS k
  FROM orders
) ORDER BY k DESC, o_orderkey ASC LIMIT 100
"""


def q_events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flag (|v − μ| > 2.5σ) with
    bit-deterministic arithmetic: cents captured exactly, (n, Σ, Σ²)
    aggregated as sub-2^53 decimals, μ/σ derived by the identical
    operand fold in both engines — the boundary comparison is exact, so
    the flagged row set is engine-identical by construction."""
    from hawk_pack_spark.operators.analytics import zscore_outliers

    ev = load_table(spark, "events", sf_dir)
    return zscore_outliers(ev, ["event_type"], "value", z=2.5).select(
        "event_type", "event_id", "value"
    )


OUTLIERS_SQL = """
WITH s AS (
  SELECT event_type, event_id, value,
         CAST(ROUND(value * 100) AS DECIMAL(19,0)) AS c
  FROM events
),
a AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS DOUBLE) AS sv,
         CAST(SUM(CAST(c * c AS DECIMAL(38,0))) AS DOUBLE) AS svv
  FROM s GROUP BY 1
)
SELECT s.event_type, s.event_id, s.value
FROM s JOIN a ON s.event_type = a.event_type
WHERE ABS(CAST(s.c AS DOUBLE) - sv / n)
      > 2.5 * SQRT(svv / n - (sv / n) * (sv / n))
"""


def q_edit_distance_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PassJoin pigeonhole edit-distance self-join over document
    prefixes (operators/dedup.py `edit_distance_join`): the LOSSLESS
    segment/shifted-probe candidate scheme means the oracle can be a
    TRUE brute force — every DISTINCT key pair levenshtein'd (complete,
    no candidate scheme), expanded to id pairs by equi-join. The
    distinct-key form keeps the oracle itself scalable (sf1: 4,756
    distinct keys / 50k docs — 11M key pairs vs 1.25B id cross-pairs,
    which blew the sf1 gate's budget); the proof is identical since
    each id holds exactly one key. Engine side at sf1: 9.9s, 250,600
    pairs. Measured: 22.5k candidates vs 12.5M cross-pairs at 5k docs."""
    from hawk_pack_spark.operators.dedup import edit_distance_join

    docs = load_table(spark, "documents", sf_dir)
    return edit_distance_join(docs, prefix_len=32, max_dist=2)


EDIT_DIST_JOIN_SQL = """
WITH t AS (SELECT doc_id AS id, substr(text, 1, 32) AS key FROM documents),
d AS (SELECT DISTINCT key FROM t),
kp AS (
  SELECT a.key AS ka, b.key AS kb, levenshtein(a.key, b.key) AS ed
  FROM d a JOIN d b ON a.key <= b.key
  WHERE levenshtein(a.key, b.key) <= 2)
SELECT least(ta.id, tb.id) AS id_a, greatest(ta.id, tb.id) AS id_b,
       kp.ed AS edit_dist
FROM kp JOIN t ta ON ta.key = kp.ka JOIN t tb ON tb.key = kp.kb
WHERE (kp.ka < kp.kb) OR (kp.ka = kp.kb AND ta.id < tb.id)
"""


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact PCA over the embeddings table
    (operators/linalg.py): one mapInPandas moment scan (mergeable
    (n, Σx, ΣxxT) partials), d×d eigh on the driver, vectorized
    projection. Invariant row (the ANN-row pattern — approximate/
    engine-specific numerics can't hash data-level): orthonormal basis,
    variance-descending eigenvalues, DISTRIBUTED per-coordinate
    projection variance equal to the eigenvalues (the spectral
    contract, verified against the data, not the fit), and an explained-
    variance ratio inside (0, 1]. Any violation flips a boolean and
    fails the driver hash."""
    import numpy as np

    from hawk_pack_spark.operators.linalg import fit_pca, pca_project

    emb = load_table(spark, "embeddings", sf_dir)
    model = fit_pca(emb, "embedding", k=8)
    c = model.components
    orth = bool(np.max(np.abs(c @ c.T - np.eye(len(c)))) < 1e-8)
    desc = bool(np.all(np.diff(model.eigenvalues) <= 1e-12))
    pj = pca_project(emb, model).select(F.posexplode("proj").alias("j", "p"))
    var_rows = (
        pj.groupBy("j")
        .agg(
            (F.sum(F.col("p") * F.col("p")) / F.count(F.lit(1))).alias("ex2"),
            F.avg("p").alias("m"),
        )
        .collect()
    )
    var_ok = all(
        abs((r["ex2"] - r["m"] ** 2) - model.eigenvalues[r["j"]])
        <= 1e-6 * max(model.eigenvalues[r["j"]], 1e-9)
        for r in var_rows
    ) and len(var_rows) == len(model.eigenvalues)
    explained = float(model.eigenvalues.sum() / model.total_variance)
    expl_ok = 0.0 < explained <= 1.0 + 1e-12
    return spark.createDataFrame(
        [(model.n, orth, desc, var_ok, expl_ok)],
        "n_vectors long, orthonormal_ok boolean, eigs_desc_ok boolean, "
        "var_match_ok boolean, explained_ok boolean",
    )


EMBEDDING_PCA_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, TRUE AS orthonormal_ok,
       TRUE AS eigs_desc_ok, TRUE AS var_match_ok, TRUE AS explained_ok
FROM embeddings
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: one window (lag over the user key, deterministic
    (ts, event_id) order) + one groupBy — the sequence-mining primitive
    behind next-action prediction and anomaly scoring."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    t = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    return (
        t.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


EVENT_TRANSITIONS_SQL = """
WITH t AS (
  SELECT event_type AS next_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS prev_type
  FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n_transitions
FROM t WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations report (operators/expectations.py):
    five row-local rules fold into ONE aggregate pass over orders,
    uniqueness adds one groupBy, and the lineitem→orders foreign key is
    one anti-join — exact violation counts, the dbt-test/Great-
    Expectations shape at 1-scan cost. Mixed outcome by design: some
    rules pass (0), the range/domain rules count real violations."""
    from hawk_pack_spark.operators.expectations import (
        accepted_values,
        check_expectations,
        foreign_key,
        in_range,
        matches,
        not_null,
        unique,
    )

    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    rep_orders = check_expectations(
        orders,
        [
            not_null("orderkey_not_null", "o_orderkey"),
            in_range("totalprice_range", "o_totalprice", 0, 300000),
            accepted_values("status_domain", "o_orderstatus", ["O", "F"]),
            matches("priority_format", "o_orderpriority", "^[1-5]-"),
            unique("orderkey_unique", "o_orderkey"),
        ],
    )
    rep_li = check_expectations(
        lineitem,
        [foreign_key("lineitem_fk_orders", "l_orderkey", orders, "o_orderkey")],
    )
    return rep_orders.unionByName(rep_li)


DQ_EXPECTATIONS_SQL = """
SELECT 'orderkey_not_null' AS rule,
       CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_violations
FROM orders
UNION ALL
SELECT 'totalprice_range',
       CAST(SUM(CASE WHEN o_totalprice >= 0 AND o_totalprice <= 300000
                     THEN 0 ELSE 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'status_domain',
       CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F') THEN 0 ELSE 1 END)
            AS BIGINT)
FROM orders
UNION ALL
SELECT 'priority_format',
       CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                     THEN 0 ELSE 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderkey_unique', CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
-- NOT EXISTS (not NOT IN): a NULL child key must COUNT as an orphan, matching
-- the operator's left_anti contract (expectations.py) -- NOT IN would drop it.
SELECT 'lineitem_fk_orders', COUNT(*)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
"""


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining (operators/graph.py): parts appearing
    together in ≥2 orders. Fan-out is per-basket (w choose 2), bounded
    by the order width — never by corpus size."""
    from hawk_pack_spark.operators.graph import copurchase_pairs

    li = load_table(spark, "lineitem", sf_dir)
    return copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2).select(
        F.col("item_a").alias("part_a"),
        F.col("item_b").alias("part_b"),
        "n_baskets",
    )


COPURCHASE_SQL = """
WITH t AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS n_baskets
FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the co-purchase graph (support ≥ 2
    edges) via degree orientation — out-degree O(√m) regardless of item
    skew, every triangle counted once at its minimal apex. The oracle
    counts with the plain a<b<c triple join: the two orientations must
    agree exactly."""
    from hawk_pack_spark.operators.graph import copurchase_pairs, triangle_count

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    return triangle_count(edges, "item_a", "item_b")


COPURCHASE_TRI_SQL = """
WITH t AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM t a JOIN t b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT COUNT(*) AS n_triangles
FROM e e1 JOIN e e2 ON e1.pb = e2.pa
JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
"""


def q_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (10 rounds, d=0.85) over the symmetrized
    co-purchase graph — the iterative-dataflow row: each round is one
    co-partitioned join + groupBy, plan static, no driver state. The
    oracle UNROLLS the same ten iterations as chained CTEs; doubles
    diverge only by summation order (≈1e-14), rounded once at the
    output (catalog derived-double convention)."""
    from hawk_pack_spark.operators.graph import copurchase_pairs, pagerank

    li = load_table(spark, "lineitem", sf_dir)
    und = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    r = pagerank(edges, iters=10, damping=0.85)
    return r.select(
        F.col("node").alias("part"), F.round("rank", 6).alias("pr")
    )


def _pagerank_sql(iters: int = 10, damping: float = 0.85) -> str:
    # literals via repr so the SQL uses the EXACT doubles Spark computes
    # with (1.0 - 0.85 is 0.15000000000000002, not 0.15). Multi-referenced
    # CTEs are MATERIALIZED: inlining re-evaluates the 6M-row self-join
    # once per reference (20+ recomputes over 10 iterations — measured
    # blowing DuckDB's temp storage at sf1); values are unchanged (the
    # single output ROUND(6) absorbs any summation-order ULPs).
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
nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM e),
it0 AS (SELECT node, 1.0 AS r FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
c{i} AS (SELECT e.dd AS node, SUM(it{i - 1}.r / deg.deg) AS c
  FROM e JOIN it{i - 1} ON e.s = it{i - 1}.node JOIN deg ON e.s = deg.s
  GROUP BY 1),
it{i} AS MATERIALIZED (
  SELECT n.node, {base} + {d} * COALESCE(c{i}.c, 0.0) AS r
  FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node)"""
    sql += f"\nSELECT node AS part, ROUND(r, 6) AS pr FROM it{iters}"
    return sql


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history build (analytics.scd2): each user's event-type
    change log becomes [valid_from, valid_to) intervals, consecutive
    unchanged states collapsed null-safely, valid_to open on the current
    state — the dimension-history primitive of warehouse maintenance.
    One shuffle: both window passes share the (user, sec, event_id)
    sort."""
    from hawk_pack_spark.operators.analytics import scd2

    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
    )
    out = scd2(
        ev,
        ["user_id"],
        ["sec", "event_id"],
        ["event_type"],
        valid_from_col="sec",
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )


SCD2_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
  FROM events
),
m AS (
  SELECT *, LAG(event_type) OVER (
    PARTITION BY user_id ORDER BY sec, event_id
  ) AS prev
  FROM ev
),
ch AS (
  SELECT user_id, sec, event_id, event_type
  FROM m WHERE prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type AS state, sec AS valid_from,
       LEAD(sec) OVER (
         PARTITION BY user_id ORDER BY sec, event_id
       ) AS valid_to
FROM ch
"""


@low_stream_shuffle
def q_streaming_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance
    (streaming/maintenance.py): orders stream as three micro-batches;
    foreachBatch merges each batch's agg_state into the running rollup
    (state-sized merge, delta cost per trigger, base never rescanned).
    The final view must equal the oracle's full recompute — the
    streaming twin of `incremental_orders_agg`."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.maintenance import StreamingAggMaintenance

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_mv_")
    try:
        splits = ["1996-01-01", "1999-01-01"]
        lo = orders.where(F.col("o_orderdate") < F.lit(splits[0]).cast("timestamp"))
        mid = orders.where(
            (F.col("o_orderdate") >= F.lit(splits[0]).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(splits[1]).cast("timestamp"))
        )
        hi = orders.where(F.col("o_orderdate") >= F.lit(splits[1]).cast("timestamp"))
        for i, part in enumerate([lo, mid, hi]):
            part.coalesce(1).write.parquet(f"{tmp}/src/b{i}")
        m = StreamingAggMaintenance(spark, ["o_orderpriority"], "o_totalprice")
        schema = spark.read.parquet(f"{tmp}/src/b0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/src/*")
        )
        q = (
            m.attach(stream)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("streaming_incremental_agg exceeded 600s")
        assert m.n_batches >= 3, f"expected >=3 micro-batches, got {m.n_batches}"
        return m.view()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
