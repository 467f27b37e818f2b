"""events: JSON, time windows, sessionization

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



# ---------------------------------------------------------------------------
# events: JSON, time windows, sessionization


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("value"), "sum_value"),
        )
    )


Q_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


Q_EVENTS_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (15-min window, 5-min slide): each event lands in
    3 overlapping windows. Oracle: epoch-aligned series join."""
    ev = load_table(spark, "events", sf_dir)
    win = F.window("ts", "15 minutes", "5 minutes")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n")
    )


SLIDING_SQL = """
WITH bounds AS (
  SELECT
    CAST(to_timestamp((CAST(floor(epoch(MIN(ts))) AS BIGINT) // 300) * 300 - 600) AS TIMESTAMP) AS lo,
    CAST(to_timestamp((CAST(floor(epoch(MAX(ts))) AS BIGINT) // 300) * 300) AS TIMESTAMP) AS hi
  FROM events),
starts AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS wstart FROM bounds),
joined AS (
  SELECT s.wstart, e.event_type
  FROM events e JOIN starts s
    ON e.ts >= s.wstart AND e.ts < s.wstart + INTERVAL 15 MINUTE)
SELECT wstart, event_type, COUNT(*) AS n FROM joined GROUP BY 1, 2
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap): per user, number of sessions
    and size of the largest session. Spark pattern: lag + cumulative sum
    over an ordered window (SURVEY §2.12 / pyspark guide 'Sessionization')."""
    ev = load_table(spark, "events", sf_dir)
    sec = F.unix_timestamp(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.select("user_id", "event_id", "ts").withColumn(
        "new_sess",
        F.when(sec - F.lag(sec).over(w) > 1800, F.lit(1)).otherwise(F.lit(0)),
    )
    with_sess = with_gap.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = with_sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("sess_len")
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("sess_len").alias("max_sess_len"),
    )


Q_SESSION_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
), per_sess AS (
  SELECT user_id, sess_id, COUNT(*) AS sess_len FROM s GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(sess_len) AS max_sess_len
FROM per_sess GROUP BY user_id
"""


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: for every error event, the value of the same
    user's most recent purchase at-or-before it (NULL if none)."""
    from hawk_pack_spark.operators.asof import asof_join_backward

    ev = load_table(spark, "events", sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join_backward(
        errors, purchases, key="user_id", value_cols=("value",)
    )
    return out.select("event_id", "user_id", F.col("asof_value"))


ASOF_SQL = """
SELECT e.event_id, e.user_id, p.value AS asof_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND p.ts <= e.ts
"""


def q_quantiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles of order totals per customer
    segment (percentile ≡ quantile_cont)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    j = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


QUANTILE_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
  ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot (conditional aggregation): order counts + totals per
    year × status, one column set per status."""
    orders = load_table(spark, "orders", sf_dir)
    y = F.year("o_orderdate").alias("yr")
    out_cols = []
    for s in ("O", "F", "P"):
        cond = F.when(F.col("o_orderstatus") == s, 1).otherwise(0)
        out_cols.append(F.sum(cond).alias(f"n_{s}"))
        out_cols.append(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == s,
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).cast("double").alias(f"total_{s}")
        )
    return load_table(spark, "orders", sf_dir).groupBy(y).agg(*out_cols)


PIVOT_SQL = """
SELECT year(o_orderdate) AS yr,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_O,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_F,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_P
FROM orders GROUP BY 1
"""


def q_part_type_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex predicates: parts whose type matches a pattern,
    aggregated by brand."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.where(F.col("p_type").rlike("^(STANDARD|SMALL)"))
        .where(F.col("p_name").contains("a"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("p_retailprice"), "sum_price"),
        )
    )


REGEX_SQL = """
SELECT p_brand, COUNT(*) AS n,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part
WHERE regexp_matches(p_type, '^(STANDARD|SMALL)') AND contains(p_name, 'a')
GROUP BY p_brand
"""


def q_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + semi-join shape: customers with ≥ 12 orders and their
    spend."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    agg = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "spend"),
        )
        .where(F.col("n_orders") >= 12)
    )
    return agg.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")).select(
        "c_custkey", "c_name", "n_orders", "spend"
    )


BIG_CUST_SQL = """
SELECT c_custkey, c_name, n_orders, spend FROM customer
JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
) ON o_custkey = c_custkey
"""


def q_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate shape: parts priced above their own brand's
    average (window-mean comparison — the decorrelated plan)."""
    part = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand")
    cnt = F.count(F.lit(1)).over(w)
    brand_sum = F.sum(F.col("p_retailprice").cast("decimal(18,2)")).over(w).cast("double")
    return (
        part.withColumn("brand_avg", F.round(brand_sum / cnt, 6))
        .where(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice", "brand_avg")
    )


ABOVE_AVG_SQL = """
WITH w AS (
  SELECT p_partkey, p_brand, p_retailprice,
    ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY p_brand), 6) AS brand_avg
  FROM part)
SELECT p_partkey, p_brand, p_retailprice, brand_avg
FROM w WHERE p_retailprice > brand_avg
"""


def q_nation_customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: alphabetical customer list per nation
    (collect_list + array_sort ≡ string_agg ORDER BY)."""
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    j = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("customers"),
    )


STRING_AGG_SQL = """
SELECT n_name, COUNT(*) AS n_customers,
  string_agg(c_name, ',' ORDER BY c_name) AS customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: nations having customers INTERSECT nations having
    suppliers, minus an EXCEPT branch."""
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    c_n = cust.select(F.col("c_nationkey").alias("nk")).distinct()
    s_n = supp.select(F.col("s_nationkey").alias("nk")).distinct()
    both = c_n.intersect(s_n)
    only_cust = c_n.exceptAll(s_n).distinct()
    tagged = both.withColumn("side", F.lit("both")).unionByName(
        only_cust.withColumn("side", F.lit("cust_only"))
    )
    return tagged.join(
        F.broadcast(nation), F.col("nk") == F.col("n_nationkey")
    ).select("side", "n_name")


SET_OPS_SQL = """
WITH c_n AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
s_n AS (SELECT DISTINCT s_nationkey AS nk FROM supplier),
tagged AS (
  SELECT nk, 'both' AS side FROM (SELECT nk FROM c_n INTERSECT SELECT nk FROM s_n)
  UNION ALL
  SELECT nk, 'cust_only' AS side FROM (SELECT nk FROM c_n EXCEPT SELECT nk FROM s_n)
)
SELECT side, n_name FROM tagged JOIN nation ON nk = n_nationkey
"""
