"""The query catalog: every driver-checkable operator, Spark + DuckDB oracle.

Each entry pairs a DataFrame program (the engine under test) with an
ANSI-SQL oracle DuckDB runs on the same parquet. The driver hash-compares
values order-insensitively, so parity conventions are strict:

- Money/quantity sums: cast to DECIMAL(18,2) per row, sum exactly, cast
  the total to DOUBLE — bit-identical in both engines at scale ≤ 2.
- Wide-decimal sums (the scale-8 disc_price/charge family): the direct
  DECIMAL→DOUBLE cast is NOT correctly rounded in at least one engine
  once the numerator exceeds 53 bits (one-ULP divergence observed at sf1
  magnitudes), and renormalizing the decimal scale creates half-way TIES
  that the engines round differently. The discipline is a STRING hop:
  `.cast("string").cast("double")` / `CAST(CAST(x AS VARCHAR) AS
  DOUBLE)` — decimal→string is exact in both engines and string→double
  is correctly rounded in both, so the doubles are bit-identical at any
  magnitude, with no tie hazard.
- Ratios/averages: exact-decimal numerator cast to DOUBLE, divided by the
  COUNT — one double division of identical operands.
- Derived doubles (distances, scores): computed with the same
  left-to-right fold in both engines, then ROUND(x, 6).
- String→int hashing: first 15 hex chars of md5 → BIGINT (`hash64`),
  identical in Spark (`conv`) and DuckDB (hex cast).
- Seconds: floor-truncated epoch in both engines.
- Every computed column aliased identically on both sides.

Queries cover SURVEY.md §2's inventory: the LinearDb/exact-kNN surface
(§2.5, §2.12), queue semantics as group-wise top-k (§2.2), plus the
north-star relational/text/dedup/similarity operators (§2.12).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawk_pack_spark.config import HawkParams
from hawk_pack_spark.functions import distance as D
from hawk_pack_spark.functions import text as T
from hawk_pack_spark.operators import hnsw
from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.operators.topk import topk_rows
from hawk_pack_spark.sources import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


def _dec_sum(col, alias: str, scale: int = 2):
    """Exact decimal sum cast back to DOUBLE (engine-parity aggregation).

    ONLY safe on base columns whose doubles are clean k-decimal values
    (prices, quantities): the nearest-decimal rounding is then unambiguous
    in both engines. Computed double products must NOT be cast — Spark
    rounds the shortest repr while DuckDB scales in binary, and they
    disagree on boundary values; use `_disc_price`/`_charge` decimals.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def _disc_price():
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic."""
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(12,6)")
    return (price * (F.lit(1).cast("decimal(12,6)") - disc)).cast("decimal(24,8)")


def _charge():
    """disc_price * (1 + l_tax), decimal-exact, renormalized to scale 8
    with half-up tie-handling (identical in Spark and DuckDB decimals)."""
    tax = F.col("l_tax").cast("decimal(12,6)")
    return (_disc_price() * (F.lit(1).cast("decimal(12,6)") + tax)).cast("decimal(24,8)")


def _avg_exact(col, cnt, alias: str, scale: int = 6):
    """sum(decimal)/count as one double division, rounded."""
    return F.round(
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / cnt, 6
    ).alias(alias)


# ---------------------------------------------------------------------------
# relational: TPC-H-shaped


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(_disc_price()).cast("string").cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("string").cast("double").alias("sum_charge"),
            _avg_exact(F.col("l_quantity"), cnt, "avg_qty"),
            _avg_exact(F.col("l_extendedprice"), cnt, "avg_price"),
            _avg_exact(F.col("l_discount"), cnt, "avg_disc"),
            cnt.alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))
        * (1 + CAST(l_tax AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        )
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_disc_price()).cast("string").cast("double").alias("revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


Q03_SQL = """
SELECT l_orderkey, o_orderdate,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.sum(_disc_price()).cast("string").cast("double").alias("revenue")
    )


Q05_SQL = """
SELECT r_name, n_name,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""


def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return topk_rows(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        "o_totalprice",
        3,
        ascending=False,
        tie_cols=["o_orderkey"],
        rank_name="rk",
    )


Q_TOP3_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders) t
WHERE rk <= 3
"""


def q_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _dec_sum(F.col("l_quantity"), "sum_qty"))
    )


Q_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


Q_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "sum_total"),
        )
    )


Q_MONTHLY_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders GROUP BY 1, 2
"""


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    cnt = F.count(F.lit(1))
    return part.groupBy("p_brand").agg(
        cnt.alias("n_parts"),
        _avg_exact(F.col("p_retailprice"), cnt, "avg_price"),
        F.max("p_size").alias("max_size"),
        F.min("p_size").alias("min_size"),
    )


Q_PART_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
  ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  MAX(p_size) AS max_size, MIN(p_size) AS min_size
FROM part GROUP BY p_brand
"""


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


# ---------------------------------------------------------------------------
# text analysis (documents)


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cnt = F.count(F.lit(1))
    return (
        docs.select(
            "lang",
            T.token_count("text").alias("n_tokens"),
            T.bpe_ish_token_count("text").alias("n_bpe"),
            F.col("n_chars"),
        )
        .groupBy("lang")
        .agg(
            cnt.alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(F.sum("n_tokens").cast("double") / cnt, 6).alias("avg_tokens"),
            F.sum("n_bpe").alias("sum_bpe_tokens"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


Q_TOKEN_SQL = """
WITH t AS (
  SELECT lang, n_chars,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS n_tokens,
    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe
  FROM documents)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
  CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe_tokens,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM t GROUP BY lang
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cnt = F.count(F.lit(1))
    # sum integer micro-units, not doubles — double summation order is
    # engine-nondeterministic and flips ROUND at boundaries
    micro = F.round(T.quality_score("text") * 1e6).cast("long")
    return (
        docs.select("source", micro.alias("qm"))
        .groupBy("source")
        .agg(
            cnt.alias("n_docs"),
            F.round(F.sum("qm") / (cnt * F.lit(1e6)), 6).alias("avg_quality"),
        )
    )


_SW = "', '".join(T.STOPWORDS)
Q_QUALITY_SQL = f"""
WITH toks AS (
  SELECT source, text,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents
), q AS (
  SELECT source,
    CAST(ROUND(ROUND((
      least(length(text) / 500.0, 1.0)
      + greatest(1.0 - 4.0 * (
          (length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / greatest(length(text), 1))
          + (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / greatest(length(text), 1))
        ), 0.0)
      + (1.0 - abs((len(list_filter(ts, t -> list_contains(['{_SW}'], t))) * 1.0
                    / greatest(len(ts), 1)) - 0.4))
    ) / 3.0, 6) * 1000000) AS BIGINT) AS qm
  FROM toks)
SELECT source, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(qm) AS BIGINT) / (COUNT(*) * 1000000.0), 6) AS avg_quality
FROM q GROUP BY source
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(T.lang_id("text").alias("predicted_lang"), "lang")
        .groupBy("predicted_lang", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_LANG_STRUCTS = ", ".join(
    "{'score': len(list_filter(ts, t -> list_contains([%s], t))), 'lang': '%s'}"
    % (", ".join(f"'{m}'" for m in markers), lang)
    for lang, markers in T.LANG_MARKERS.items()
)
Q_LANG_SQL = f"""
WITH toks AS (
  SELECT lang,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents
), pred AS (
  SELECT lang, list_aggregate([{_LANG_STRUCTS}], 'max').lang AS predicted_lang
  FROM toks)
SELECT predicted_lang, lang, COUNT(*) AS n FROM pred GROUP BY 1, 2
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both fingerprint flavors per source in one row: the order-
    insensitive token-SET fingerprint and the order-SENSITIVE rolling
    hash (a doc with permuted words keeps fp but changes rfp)."""
    docs = load_table(spark, "documents", sf_dir)
    set_fp = (
        docs.select("source", T.doc_fingerprint("text").alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("fp")).alias("n_distinct_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )
    roll_fp = (
        docs.select("source", T.rolling_hash("text").alias("rfp"))
        .groupBy("source")
        .agg(
            F.count_distinct("rfp").alias("n_distinct_rfp"),
            F.min("rfp").alias("min_rfp"),
            F.max("rfp").alias("max_rfp"),
        )
    )
    return set_fp.join(roll_fp, "source")


Q_FP_SQL = """
WITH fp AS (
  SELECT source,
    CAST(concat('0x', substr(md5(array_to_string(
      list_sort(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '\\s+'), x -> x != ''))), ' ')), 1, 15)) AS BIGINT) AS fp
  FROM documents),
sfp AS (
  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_distinct_fp,
    MIN(fp) AS min_fp, MAX(fp) AS max_fp
  FROM fp GROUP BY source),
toks AS (
  SELECT source,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
rfp0 AS (
  SELECT source,
    list_reduce(
      list_prepend(0::BIGINT,
        list_transform(ts, t ->
          CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
      (acc, h) -> (acc * 131 + h) % 2147483647) AS rfp
  FROM toks),
rfp AS (
  SELECT source, COUNT(DISTINCT rfp) AS n_distinct_rfp,
    MIN(rfp) AS min_rfp, MAX(rfp) AS max_rfp
  FROM rfp0 GROUP BY source)
SELECT sfp.source, n_docs, n_distinct_fp, min_fp, max_fp,
       n_distinct_rfp, min_rfp, max_rfp
FROM sfp JOIN rfp ON sfp.source = rfp.source
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data curation: quality-filter → token-set
    fingerprint dedup (keep lowest doc_id) → per (lang, source) counts
    and surviving token volume. The end-to-end shape of an LLM data
    pipeline, all in one declarative plan."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id", "lang", "source",
        T.quality_score("text").alias("q"),
        T.doc_fingerprint("text").alias("fp"),
        T.token_count("text").alias("n_tokens"),
    ).where(F.col("q") >= 0.5)
    # summing doubles is order-nondeterministic across engines; sum exact
    # integer micro-units instead (q is already rounded to 6 decimals)
    scored = scored.withColumn("q_micro", F.round(F.col("q") * 1e6).cast("long"))
    keep = scored.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    kept = scored.join(keep, "fp").where(F.col("doc_id") == F.col("keep_id"))
    cnt = F.count(F.lit(1))
    return kept.groupBy("lang", "source").agg(
        cnt.alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.round(F.sum("q_micro") / (cnt * F.lit(1e6)), 6).alias("avg_quality"),
    )


_Q_EXPR_SQL = f"""
    ROUND((
      least(length(text) / 500.0, 1.0)
      + greatest(1.0 - 4.0 * (
          (length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / greatest(length(text), 1))
          + (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / greatest(length(text), 1))
        ), 0.0)
      + (1.0 - abs((len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != ''), t -> list_contains(['{_SW}'], t))) * 1.0
                    / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')), 1)) - 0.4))
    ) / 3.0, 6)
"""

CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang, source,
    {_Q_EXPR_SQL} AS q,
    CAST(concat('0x', substr(md5(array_to_string(
      list_sort(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '\\s+'), x -> x != ''))), ' ')), 1, 15)) AS BIGINT) AS fp,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS n_tokens
  FROM documents),
filt AS (SELECT *, CAST(ROUND(q * 1000000) AS BIGINT) AS q_micro
         FROM scored WHERE q >= 0.5),
keep AS (SELECT fp, MIN(doc_id) AS keep_id FROM filt GROUP BY fp),
kept AS (SELECT filt.* FROM filt JOIN keep ON filt.fp = keep.fp AND filt.doc_id = keep.keep_id)
SELECT lang, source, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  ROUND(CAST(SUM(q_micro) AS BIGINT) / (COUNT(*) * 1000000.0), 6) AS avg_quality
FROM kept GROUP BY lang, source
"""


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprints per source (vs the
    set-based doc_fingerprint)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("source", T.rolling_hash("text").alias("rfp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("rfp").alias("n_distinct"),
            F.min("rfp").alias("min_rfp"),
            F.max("rfp").alias("max_rfp"),
        )
    )


ROLLING_FP_SQL = """
WITH toks AS (
  SELECT source,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
fp AS (
  SELECT source,
    list_reduce(
      list_prepend(0::BIGINT,
        list_transform(ts, t ->
          CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
      (acc, h) -> (acc * 131 + h) % 2147483647) AS rfp
  FROM toks)
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT rfp) AS n_distinct,
  MIN(rfp) AS min_rfp, MAX(rfp) AS max_rfp
FROM fp GROUP BY source
"""


def q_customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: per-customer order sequence with running
    spend (exact decimal), 3-order moving average, and days since the
    previous order (lag)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    last3 = w.rowsBetween(-2, 0)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    sec = F.unix_timestamp("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.sum(dec).over(run).cast("double").alias("cum_spend"),
        F.round(
            F.sum(dec).over(last3).cast("double") / F.count(F.lit(1)).over(last3), 6
        ).alias("avg_last3"),
        ((sec - F.lag(sec).over(w)) / F.lit(86400)).cast("long").alias("days_since_prev"),
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER w AS rn,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg_last3,
  CAST((CAST(floor(epoch(o_orderdate)) AS BIGINT)
    - CAST(floor(epoch(lag(o_orderdate) OVER w)) AS BIGINT)) / 86400 AS BIGINT)
    AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_doc_hash_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → hashed bag-of-words vectors → exact cosine top-3
    neighbors per query doc: the text→vector featurization bridge into
    the similarity operators, end to end."""
    from hawk_pack_spark.operators.similarity import hash_embeddings

    docs = load_table(spark, "documents", sf_dir)
    vecs = hash_embeddings(docs, "doc_id", "text", dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    queries = vecs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pairs = vecs.crossJoin(F.broadcast(queries)).where(
        F.col("query_id") != F.col("vec_id")
    )
    sim = D.cosine_sim(F.col("query_vec"), F.col("embedding"))
    scored = pairs.select("query_id", "vec_id", F.round(sim, 6).alias("sim"))
    return topk_rows(scored, ["query_id"], "sim", 3, ascending=False, tie_cols=["vec_id"])


HASH_EMB_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
v AS (
  SELECT doc_id AS vec_id,
    list_transform(range(0, 32), i -> CAST(len(list_filter(ts,
      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 32 = i)) AS DOUBLE)) AS v
  FROM toks),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5),
d AS (
  SELECT query_id, a.vec_id,
    ROUND(list_sum(list_transform(range(1, 33), i -> qv[i] * a.v[i]))
      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
         * sqrt(list_sum(list_transform(a.v, x -> x * x)))), 6) AS sim
  FROM q, v a WHERE a.vec_id <> query_id),
r AS (
  SELECT query_id, vec_id, sim,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, sim, rank FROM r WHERE rank <= 3
"""


def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: keep lowest doc_id per md5 group
    (LinearDb::insert dedup semantics, reference linear_db.rs:17-25,
    applied to documents). Returns survivors per lang."""
    docs = load_table(spark, "documents", sf_dir)
    keyed = docs.select("lang", "doc_id", F.md5(F.lower(F.col("text"))).alias("h"))
    # one shuffle: rank within hash group instead of groupBy + join-back
    w = Window.partitionBy("h").orderBy("doc_id")
    kept = keyed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


Q_DEDUP_SQL = """
WITH keyed AS (SELECT lang, doc_id, md5(lower(text)) AS h FROM documents),
keep AS (SELECT h, MIN(doc_id) AS keep_id FROM keyed GROUP BY h)
SELECT lang, COUNT(*) AS n_kept
FROM keyed JOIN keep ON keyed.h = keep.h AND keyed.doc_id = keep.keep_id
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# vector: exact kNN (LinearDb port) + derived codes


def _embeddings_vectors(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))


def q_knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_exact(emb, queries, k=10, metric="l2_sq")
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist"), "rank"
    )


KNN_L2_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, rank FROM r WHERE rank <= 10
"""


def q_knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pairs = emb.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        "query_id",
        "vec_id",
        D.cosine_sim(F.col("query_vec"), F.col("embedding")).alias("sim"),
    )
    top = topk_rows(scored, ["query_id"], "sim", 10, ascending=False, tie_cols=["vec_id"])
    return top.select("query_id", "vec_id", F.round(F.col("sim"), 6).alias("sim"), "rank")


KNN_COS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> qv[i] * v[i]))
      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
         * sqrt(list_sum(list_transform(v, x -> x * x)))) AS sim
  FROM q, e
), r AS (
  SELECT query_id, vec_id, sim,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rank FROM r WHERE rank <= 10
"""


def q_knn_exact_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS) — the fourth metric flavor
    (ranking by raw dot product, no normalization)."""
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pairs = emb.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        "query_id", "vec_id",
        D.dot(F.col("query_vec"), F.col("embedding")).alias("ip"),
    )
    top = topk_rows(scored, ["query_id"], "ip", 10, ascending=False, tie_cols=["vec_id"])
    return top.select("query_id", "vec_id", F.round(F.col("ip"), 6).alias("ip"), "rank")


KNN_DOT_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])) AS ip
  FROM q, e
), r AS (
  SELECT query_id, vec_id, ip,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(ip, 6) AS ip, rank FROM r WHERE rank <= 10
"""


def q_range_search_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius query — the set-valued relational form of ``is_match``
    (reference src/traits.rs:46-49 tests one pair; this returns every
    stored vector within the threshold, per query). Served through the
    IVF cell-pruned path (`range_search_ivf`): the triangle-inequality
    prune is LOSSLESS, so the row is data-level against the brute-force
    oracle — the clustering seed cannot change the answer, only the
    bytes probed."""
    from hawk_pack_spark.operators.similarity import (
        ivf_build, ivf_cell_stats, range_search_ivf,
    )

    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assigned, centers = ivf_build(emb, n_clusters=8)
    radii = ivf_cell_stats(assigned, centers)
    out = range_search_ivf(assigned, centers, radii, queries, radius=1.3)
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist")
    )


RANGE_SEARCH_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist FROM d WHERE dist <= 1.3
"""


def q_filtered_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: top-5 per query among vectors
    whose ``label`` = 3 — the predicate + top-k serving surface
    (superset; the reference has no filtered search). The selective
    predicate routes to the pre-filter exact path, so the row is
    data-level; the index post-filter path is pytest-gated
    (test_filtered_knn_index_postfilter_recall)."""
    from hawk_pack_spark.operators.knn_exact import filtered_knn

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = filtered_knn(emb, queries, k=5, predicate=F.col("label") == 3)
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist"), "rank"
    )


FILTERED_KNN_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, e.vec_id,
    list_sum(list_transform(range(1, 65), i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e WHERE e.label = 3
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, rank FROM r WHERE rank <= 5
"""


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiling (count / nulls / exact distinct /
    min / max / mean per column) over four lineitem columns — the
    stats-collection operator of a training-data pipeline, folded into
    ONE aggregate job (test_profile_is_one_job pins the single scan).
    Doubles stay out of the parity row (their mean is summation-order-
    nondeterministic — catalog header discipline); integer means are an
    exact integer sum / count, bit-reproducible in both engines."""
    from hawk_pack_spark.operators.profile import profile_table

    li = load_table(spark, "lineitem", sf_dir)
    out = profile_table(
        li,
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"],
        exact_distinct=True,
    )
    return out.select(
        F.col("column").alias("col_name"), "n", "n_null", "n_distinct",
        "min_val", "max_val", "mean_val",
    )


PROFILE_SQL = """
SELECT 'l_orderkey' AS col_name, COUNT(*) AS n,
  COUNT(*) - COUNT(l_orderkey) AS n_null,
  COUNT(DISTINCT l_orderkey) AS n_distinct,
  CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
  CAST(MAX(l_orderkey) AS VARCHAR) AS max_val,
  ROUND(AVG(l_orderkey), 6) AS mean_val
FROM lineitem
UNION ALL
SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
  COUNT(DISTINCT l_linenumber), CAST(MIN(l_linenumber) AS VARCHAR),
  CAST(MAX(l_linenumber) AS VARCHAR), ROUND(AVG(l_linenumber), 6)
FROM lineitem
UNION ALL
SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
  COUNT(DISTINCT l_returnflag), CAST(MIN(l_returnflag) AS VARCHAR),
  CAST(MAX(l_returnflag) AS VARCHAR), CAST(NULL AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
  COUNT(DISTINCT l_shipdate),
  strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
  strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S'),
  CAST(NULL AS DOUBLE)
FROM lineitem
"""


def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical arm + hash-embedding cosine
    semantic arm, fused by reciprocal-rank fusion (1/(60+rank), Cormack
    et al. 2009). Both arms reuse this catalog's proven oracle
    renderings (BM25_SQL, HASH_EMB_SQL); the fused score is a sum of at
    most two doubles (commutative → bit-reproducible), ranked on
    round-9 score with doc_id ties."""
    from hawk_pack_spark.operators.bm25 import bm25_build, bm25_search
    from hawk_pack_spark.operators.retrieval import rrf_fuse
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
    return rrf_fuse([lex, sem], k=10)


HYBRID_RRF_SQL = """
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
u AS (
  SELECT query_id, doc_id, rank FROM lexr WHERE rank <= 10
  UNION ALL
  SELECT query_id, doc_id, rank FROM semr WHERE rank <= 10),
f AS (SELECT query_id, doc_id, ROUND(SUM(1.0 / (60 + rank)), 9) AS rrf
      FROM u GROUP BY query_id, doc_id),
fr AS (SELECT query_id, doc_id, rrf, CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
       FROM f)
SELECT query_id, doc_id, rrf, rank FROM fr WHERE rank <= 10
"""


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (sort-based, linear interpolation) of document
    length per language — the distribution-shape row the window's KLL
    sketch (engine-specific, error-bound-tested) cannot hash-check.
    Spark `percentile` and DuckDB `quantile_cont` share the (n−1)·p
    interpolation definition; on integer inputs the interpolated value
    is one double op — bit-reproducible (verified before wiring)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.expr(f"percentile(n_chars, {p})"), 6).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.95)
        ],
    )


DOC_QUANTILES_SQL = """
SELECT lang, COUNT(*) AS n,
  ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
  ROUND(quantile_cont(n_chars, 0.50), 6) AS p50,
  ROUND(quantile_cont(n_chars, 0.75), 6) AS p75,
  ROUND(quantile_cont(n_chars, 0.95), 6) AS p95
FROM documents GROUP BY lang
"""


def q_table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC change detection): orders vs a derived
    next-day snapshot — every 97th key dropped (removed), every 101st
    status flipped (changed), every 103rd re-inserted under a shifted
    key (added). The operator joins (key, xxhash64) rows — payload
    never crosses the shuffle; the oracle classifies with column-wise
    IS DISTINCT FROM, so parity also proves the hash classification
    matches exact comparison on this data."""
    from hawk_pack_spark.operators.diff import table_diff

    orders = load_table(spark, "orders", sf_dir)
    changed = F.when(
        F.col("o_orderkey") % 101 == 1, F.lit("X")
    ).otherwise(F.col("o_orderstatus"))
    kept = orders.where(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_orderstatus", changed
    )
    added = orders.where(F.col("o_orderkey") % 103 == 2).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000_000)
    )
    new = kept.unionByName(added)
    return table_diff(orders, new, ["o_orderkey"])


TABLE_DIFF_SQL = """
WITH newsnap AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 101 = 1 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000000, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 103 = 2
), j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
    CASE WHEN o.o_orderkey IS NULL THEN 'added'
         WHEN n.o_orderkey IS NULL THEN 'removed'
         WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
           OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
           OR (o.o_orderdate IS DISTINCT FROM n.o_orderdate)
           OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
         THEN 'changed' END AS change
  FROM orders o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey)
SELECT o_orderkey, change FROM j WHERE change IS NOT NULL
"""


def q_knn_exact_cosine_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k under the two similarity orderings (cosine and raw
    inner product / MIPS) in one result, tagged by a metric column —
    the union keeps both metric flavors driver-checked in one catalog
    slot (the correctness window is 50 entries)."""
    cos = q_knn_exact_cosine(spark, sf_dir).select(
        F.lit("cosine").alias("metric"), "query_id", "vec_id",
        F.col("sim").alias("score"), "rank",
    )
    dot = q_knn_exact_dot(spark, sf_dir).select(
        F.lit("dot").alias("metric"), "query_id", "vec_id",
        F.col("ip").alias("score"), "rank",
    )
    return cos.unionByName(dot)


def _knn_cos_dot_sql() -> str:
    cos = KNN_COS_SQL.strip().replace(
        "SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rank FROM r WHERE rank <= 10",
        "SELECT 'cosine' AS metric, query_id, vec_id, ROUND(sim, 6) AS score, rank"
        " FROM r WHERE rank <= 10",
    )
    dot = KNN_DOT_SQL.strip().replace(
        "SELECT query_id, vec_id, ROUND(ip, 6) AS ip, rank FROM r WHERE rank <= 10",
        "SELECT 'dot' AS metric, query_id, vec_id, ROUND(ip, 6) AS score, rank"
        " FROM r WHERE rank <= 10",
    )
    return f"SELECT * FROM ({cos}) UNION ALL SELECT * FROM ({dot})"


def q_sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-API surface: same engine, expressed as spark.sql over
    registered views (Catalyst path identical to the DataFrame API)."""
    from hawk_pack_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
          COUNT(DISTINCT c_custkey) AS n_customers,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderstatus <> 'F'
        GROUP BY n_name
        """
    )


SQL_NATION_SQL = """
SELECT n_name,
  COUNT(DISTINCT c_custkey) AS n_customers,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus <> 'F'
GROUP BY n_name
"""


def q_simhash_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming kNN over sign-bit codes — the reference's canonical metric
    (popcount(a XOR b), lazy_memory_store.rs:49-54) applied to codes
    derived from the embedding fixtures."""
    emb = _embeddings_vectors(spark, sf_dir)
    coded = emb.select("vec_id", D.simhash_code("embedding").alias("code"))
    queries = coded.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_code")
    )
    pairs = coded.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        "query_id",
        "vec_id",
        D.hamming(F.col("query_code"), F.col("code")).cast("int").alias("dist"),
    )
    return topk_rows(scored, ["query_id"], "dist", 5, ascending=True, tie_cols=["vec_id"])


SIMHASH_KNN_SQL = """
WITH c AS (
  SELECT vec_id,
    CAST(list_sum(list_transform(range(0, 63),
      i -> CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS code
  FROM embeddings
), q AS (SELECT vec_id AS query_id, code AS qcode FROM c WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id, CAST(bit_count(xor(qcode, code)) AS INTEGER) AS dist
  FROM q, c
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, dist, rank FROM r WHERE rank <= 5
"""


def q_hamming_scan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized LinearDb scan — `hamming_topk_numpy`, the tiled
    XOR + 16-bit-LUT popcount kernel that holds at 100M codes
    (reference linear_db.rs: exact eval_distance over every stored iris
    code) — must return EXACTLY the brute-force SQL answer, boundary
    ties and all. Same codes and queries as simhash_hamming_knn, but
    through the numpy scan path instead of the expression path, so the
    two driver rows pin both implementations of the same contract."""
    from hawk_pack_spark.operators.similarity import hamming_topk_numpy

    emb = _embeddings_vectors(spark, sf_dir)
    coded = emb.select("vec_id", D.simhash_code("embedding").alias("code"))
    queries = coded.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    out = hamming_topk_numpy(coded, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.col("dist").cast("int").alias("dist"), "rank"
    )


# the scan path answers the identical question the expression path does —
# one oracle text, two engine paths
HAMMING_SCAN_SQL = SIMHASH_KNN_SQL


def _l1_expr(a, b):
    """Manhattan distance as a JVM-side fold — the catalog's USER-metric
    exhibit for `register_metric` (never pre-registered in METRICS)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            a.cast("array<double>"), b.cast("array<double>"),
            lambda x, y: F.abs(x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def q_custom_metric_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`register_metric` — the VectorStore trait as the engine's UDF
    surface (reference src/traits.rs:34-52: a store supplies
    eval_distance; is_match and less_than follow for free) — driven
    end-to-end with a metric the engine does NOT ship: L1, registered
    as a codegen-able expression and pulled through the standard
    `distance_expr` plumbing by exact kNN. Data-level oracle: DuckDB
    ranks by the same L1 sums."""
    D.register_metric("l1_catalog", _l1_expr)
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_exact(emb, queries, k=10, metric="l1_catalog")
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist"), "rank"
    )


CUSTOM_METRIC_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> abs(qv[i] - v[i]))) AS dist
  FROM q, e
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, rank FROM r WHERE rank <= 10
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-duplicate pairs (sim >= 0.3) — `is_match` thresholding
    (traits.rs:44-45) as a similarity self-join."""
    from hawk_pack_spark.operators.similarity import all_pairs_cosine_numpy

    emb = _embeddings_vectors(spark, sf_dir)
    return all_pairs_cosine_numpy(emb, threshold=0.3)


NEAR_DUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS sim
  FROM e a, e b
  WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, sim FROM p WHERE sim >= 0.3
"""


def q_vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cnt = F.count(F.lit(1))
    nrm = F.round(D.norm("embedding"), 6)
    return (
        emb.select(
            "label",
            nrm.alias("nrm"),
            F.round(nrm * 1e6).cast("long").alias("nm"),  # exact-summable
        )
        .groupBy("label")
        .agg(
            cnt.alias("n_vecs"),
            F.round(F.sum("nm") / (cnt * F.lit(1e6)), 6).alias("avg_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


NORM_SQL = """
WITH n AS (
  SELECT label,
    ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS nrm
  FROM embeddings)
SELECT label, COUNT(*) AS n_vecs,
  ROUND(CAST(SUM(CAST(ROUND(nrm * 1000000) AS BIGINT)) AS BIGINT)
    / (COUNT(*) * 1000000.0), 6) AS avg_norm,
  MAX(nrm) AS max_norm
FROM n GROUP BY label
"""


# ---------------------------------------------------------------------------
# dedup & similarity joins (SURVEY §2.12 north-star operators)

_HASH64 = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
_TOKS = (
    "list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),"
    " x -> x != ''))"
)


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup with the SCALE defaults: LSH buckets larger
    than max_bucket are dropped BEFORE the candidate self-join (a bucket
    of b docs emits b²/2 pairs — on a degenerate corpus the uncapped
    sweep is quadratic; dropped buckets are the no-signal ones). The cap
    is applied identically in the oracle, so parity holds at every SF.
    The uncapped variant lives in RETIRED (pytest parity only)."""
    from hawk_pack_spark.operators.dedup import minhash_near_dup

    docs = load_table(spark, "documents", sf_dir)
    return minhash_near_dup(
        docs, num_hashes=8, bands=4, threshold=0.9, max_bucket=20
    )


def q_minhash_near_dup_uncapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.dedup import minhash_near_dup

    docs = load_table(spark, "documents", sf_dir)
    return minhash_near_dup(docs, num_hashes=8, bands=4, threshold=0.9)


def _minhash_sql() -> str:
    sig_cols = ",\n    ".join(
        "min(" + _HASH64.format(expr=f"'{s}|' || tok") + f") AS h{s}" for s in range(8)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws(',', h{2*b}::VARCHAR, h{2*b+1}::VARCHAR)) AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
ex AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
sig AS (SELECT doc_id, {sig_cols} FROM ex GROUP BY doc_id),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_key)
  WHERE a.doc_id < b.doc_id),
ver AS (
  SELECT id_a, id_b,
    ROUND(len(list_intersect(ta.ts, tb.ts)) * 1.0
      / len(list_distinct(list_concat(ta.ts, tb.ts))), 6) AS jaccard
  FROM cand
  JOIN toks ta ON ta.doc_id = id_a
  JOIN toks tb ON tb.doc_id = id_b)
SELECT id_a, id_b, jaccard FROM ver WHERE jaccard >= 0.9
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup retention decision: MinHash-LSH pairs (scale-capped, same
    as minhash_near_dup) → connected components → per-doc (rep, keep).
    Pointer-jumping min-label propagation; oracle = recursive-CTE
    transitive closure over the identically-capped pair set."""
    from hawk_pack_spark.operators.components import dedup_clusters
    from hawk_pack_spark.operators.dedup import minhash_near_dup

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_near_dup(
        docs, num_hashes=8, bands=4, threshold=0.9, max_bucket=20
    )
    return dedup_clusters(pairs, docs.select("doc_id"))


def _dedup_clusters_sql() -> str:
    minhash = _minhash_capped_sql().strip().rstrip()
    return f"""
WITH RECURSIVE pairs AS ({minhash}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, LEAST(MIN(b), a) AS component FROM reach GROUP BY a
)
SELECT d.doc_id,
  COALESCE(comp.component, d.doc_id) AS rep,
  (d.doc_id = COALESCE(comp.component, d.doc_id)) AS keep
FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
"""


def q_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.dedup import simhash_groups

    docs = load_table(spark, "documents", sf_dir)
    return simhash_groups(docs)


def _simhash_sql(nbits: int = 60) -> str:
    h = _HASH64.format(expr="tok")
    bit_cols = ",\n    ".join(
        f"SUM(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(nbits)
    )
    terms = "\n    + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(nbits)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
ex AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
h AS (SELECT doc_id, {h} AS hv FROM ex),
bits AS (SELECT doc_id, {bit_cols} FROM h GROUP BY doc_id),
coded0 AS (SELECT doc_id, {terms} AS code FROM bits),
coded AS (
  SELECT d.doc_id, COALESCE(c.code, CAST(0 AS BIGINT)) AS code
  FROM documents d LEFT JOIN coded0 c USING (doc_id))
SELECT code, COUNT(*) AS n_docs, MIN(doc_id) AS min_id FROM coded GROUP BY code
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity join with the SCALE default: grams whose
    document frequency exceeds max_df are dropped before the self-join
    (a gram in d docs emits d²/2 pairs; ubiquitous grams carry no
    similarity signal — the stop-gram analog of stopwords). The cap is
    mirrored in the oracle. Uncapped variant in RETIRED."""
    from hawk_pack_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, n=3, threshold=0.01, max_df=20)


def q_ngram_jaccard_uncapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, n=3, threshold=0.01)


NGRAM_JACCARD_SQL = """
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
e AS (SELECT doc_id, len(gs) AS ng, unnest(gs) AS gram FROM g),
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


def q_lsh_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.similarity import lsh_hamming_near_pairs

    emb = _embeddings_vectors(spark, sf_dir)
    # 8-bit bands: on random sign codes, 16-bit bands essentially never
    # collide (0 candidate pairs = no check at all); 8 bands of 8 bits
    # yield a deterministic non-empty candidate set
    return lsh_hamming_near_pairs(emb, max_dist=22, band_bits=8, n_bands=8)


LSH_HAMMING_SQL = """
WITH c AS (
  SELECT vec_id,
    CAST(list_sum(list_transform(range(0, 63),
      i -> CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS code
  FROM embeddings),
bands AS (
  SELECT vec_id, code, b.band, (code >> (b.band * 8)) & 255 AS band_val
  FROM c, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
    a.code AS code_a, b.code AS code_b
  FROM bands a JOIN bands b USING (band, band_val)
  WHERE a.vec_id < b.vec_id),
d AS (
  SELECT id_a, id_b, CAST(bit_count(xor(code_a, code_b)) AS INTEGER) AS dist
  FROM cand)
SELECT id_a, id_b, dist FROM d WHERE dist <= 22
"""


# ---------------------------------------------------------------------------
# ANN-family summaries — approximate results aren't SQL-reproducible, but
# their CONTRACT is: each query below collapses an ANN operator into one
# invariant row (cardinalities derivable from the input table + booleans
# that must be TRUE), so the driver's hash check covers them instead of
# falling back to a rows-only check (VERDICT r01 item 2).


def _ann_summary(ann: DataFrame, exact: DataFrame, k: int, min_recall: float) -> DataFrame:
    """One-row quality summary of an approximate top-k result:

    - n_queries / n_results: exact cardinalities (oracle recomputes them
      from the input table);
    - ranks_ok: every query returned exactly k rows with ranks 1..k and
      distances non-decreasing in rank;
    - recall_ok: recall@k against the EXACT kNN (computed in the same
      Spark job) is >= min_recall.
    """
    hits = ann.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi"
    )
    wq = Window.partitionBy("query_id").orderBy("rank")
    viol = (
        ann.withColumn("_prev", F.lag("dist").over(wq))
        .where(F.col("_prev") > F.col("dist"))
    )
    bad_ranks = ann.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("rank").alias("_maxr"),
        F.min("rank").alias("_minr"),
    ).where((F.col("_n") != k) | (F.col("_maxr") != k) | (F.col("_minr") != 1))
    return (
        ann.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_results"),
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("_hits")))
        .crossJoin(bad_ranks.agg(F.count(F.lit(1)).alias("_badq")))
        .crossJoin(viol.agg(F.count(F.lit(1)).alias("_viol")))
        .select(
            "n_queries",
            "n_results",
            ((F.col("_badq") == 0) & (F.col("_viol") == 0)).alias("ranks_ok"),
            (F.col("_hits") >= F.lit(min_recall) * F.col("n_results")).alias("recall_ok"),
        )
    )


def q_ivf_ann_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (seeded k-means buckets, nprobe=8/16) ANN quality summary:
    recall@10 vs exact kNN computed in-engine; constant-style oracle.

    nprobe=8 measures recall 0.91 (sf0.01) / 0.90 (sf0.1) vs the 0.7
    gate — the synthetic embeddings are iid-uniform, the WORST case for
    coarse quantization (no cluster structure), so the probe count is
    deliberately generous; real corpora cluster and probe fewer."""
    from hawk_pack_spark.operators.similarity import ivf_build, ivf_search

    emb = _embeddings_vectors(spark, sf_dir)
    assigned, centers = ivf_build(emb, n_clusters=16)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = ivf_search(assigned, centers, queries, k=10, nprobe=8)
    exact = knn_exact(emb, queries, k=10, metric="l2_sq")
    return _ann_summary(ann, exact, k=10, min_recall=0.7)


IVF_SUMMARY_SQL = """
SELECT CAST(10 AS BIGINT) AS n_queries, CAST(100 AS BIGINT) AS n_results,
       TRUE AS ranks_ok, TRUE AS recall_ok
"""


# ---------------------------------------------------------------------------
# HNSW — summaries with table-derived oracles; recall also in tests

_HNSW_PARAMS = HawkParams.new(64, 64, 16)


_HNSW_CACHE: dict = {}
_HNSW_SHARDS: dict = {}


def _hnsw_index(spark, sf_dir):
    emb = _embeddings_vectors(spark, sf_dir)
    # 8 shards: smaller per-shard graphs build faster (beam cost grows
    # with shard size) and search still consults every shard, so recall
    # only improves. Memoized per (session, sf_dir): the three hnsw_*
    # catalog queries share one deterministic build.
    key = (id(spark), sf_dir)
    if key not in _HNSW_CACHE:
        # Two scale-robustness choices, measured at the r6 sf1 gate
        # (the scaled fixture is 10 near-duplicate replicas per base,
        # cos ≈ 0.5-0.72 clusters — tools/make_scale.py):
        # - Algorithm 4 neighbor selection: plain M-nearest trim lets
        #   clusters capture every edge slot — 21% self-recall loss at
        #   sf1; diverse edges recover it (NOTES round-3 mitigation).
        # - shard count ∝ corpus (~625 vectors per shard graph): fixed
        #   8 shards left 2500-row clustered graphs with 11 unreachable
        #   islands (ef-independent); 625-row graphs build FASTER and
        #   reach 20000/20000 self-recall. Search consults all shards,
        #   so recall only improves with more shards.
        n = emb.count()
        shards = max(8, n // 625)
        _HNSW_SHARDS[key] = shards
        _HNSW_CACHE[key] = hnsw.build_index(
            emb, metric="l2_sq", params=_HNSW_PARAMS, num_shards=shards,
            neighbor_heuristic=True,
        ).localCheckpoint()
    return emb, _HNSW_CACHE[key]


def _hnsw_num_shards(spark, sf_dir) -> int:
    """Shard count of the shared catalog index (valid after
    `_hnsw_index` has been called for this (session, sf_dir))."""
    return _HNSW_SHARDS[(id(spark), sf_dir)]


def q_hnsw_search_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via the sharded HNSW index (SURVEY §2.4 search),
    summarized against the exact kNN computed in the same job."""
    emb, index = _hnsw_index(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = hnsw.search(index, queries, k=10, metric="l2_sq", params=_HNSW_PARAMS)
    exact = knn_exact(emb, queries, k=10, metric="l2_sq")
    return _ann_summary(ann, exact, k=10, min_recall=0.9)


HNSW_SEARCH_SUMMARY_SQL = """
SELECT CAST(10 AS BIGINT) AS n_queries, CAST(100 AS BIGINT) AS n_results,
       TRUE AS ranks_ok, TRUE AS recall_ok
"""


def q_hnsw_serving_search_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-path ANN search (hnsw.search_serving: queries broadcast
    to the unmoved index, driver-side centroid routing — the zero-
    index-shuffle deployment shape that wins the 1M-vector crossover
    bench). Invariants in one row: the usual rank/recall summary of the
    fan-out serving result vs exact kNN, PLUS execution-path equality —
    serving must return exactly the cogroup path's rows, both fan-out
    and routed at the same nprobe (the tie-break contract)."""
    emb, index = _hnsw_index(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    serv = hnsw.search_serving(
        index, queries, k=10, metric="l2_sq", params=_HNSW_PARAMS
    )
    cog = hnsw.search(index, queries, k=10, metric="l2_sq", params=_HNSW_PARAMS)
    cents = hnsw.shard_centroids(index, "l2_sq").collect()
    serv_r = hnsw.search_serving(
        index, queries, k=10, metric="l2_sq", params=_HNSW_PARAMS,
        nprobe_shards=4, centroids=cents,
    )
    cog_r = hnsw.search(
        index, queries, k=10, metric="l2_sq", params=_HNSW_PARAMS,
        num_shards=_hnsw_num_shards(spark, sf_dir), nprobe_shards=4,
    )
    exact = knn_exact(emb, queries, k=10, metric="l2_sq")

    def n_diff(a: DataFrame, b: DataFrame, name: str) -> DataFrame:
        cols = ["query_id", "vec_id", "rank"]
        return (
            a.select(*cols).exceptAll(b.select(*cols))
            .unionByName(b.select(*cols).exceptAll(a.select(*cols)))
            .agg(F.count(F.lit(1)).alias(name))
        )

    return (
        _ann_summary(serv, exact, k=10, min_recall=0.9)
        .crossJoin(n_diff(serv, cog, "_d1"))
        .crossJoin(n_diff(serv_r, cog_r, "_d2"))
        .select(
            "n_queries", "n_results", "ranks_ok", "recall_ok",
            (F.col("_d1") == 0).alias("fanout_matches_cogroup"),
            (F.col("_d2") == 0).alias("routed_matches_cogroup"),
        )
    )


HNSW_SERVING_SUMMARY_SQL = """
SELECT CAST(10 AS BIGINT) AS n_queries, CAST(100 AS BIGINT) AS n_results,
       TRUE AS ranks_ok, TRUE AS recall_ok,
       TRUE AS fanout_matches_cogroup, TRUE AS routed_matches_cogroup
"""


def q_serving_restart_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The restartable-serving story as one driver row (VERDICT r5 #4):
    save_serving_index → load_serving_index → `ann_search` through the
    bundle — covering the serving manifest (graph + centroids + params
    in one directory), frozen-CSR rehydration (both serving call sites
    search frozen), and the crossover dispatch front door, oracle-
    checked. Reference analog: GraphPg's restartable-store premise
    (graph_pg.rs:24-50) with HawkerParams traveling as state.

    Booleans computed live; any violation flips one and fails the hash:
    - blas_exact_ok: a small full-fan batch through the MATERIALIZED
      bundle dispatches to the exact scan and returns exactly the exact
      kNN's rows;
    - selective_serving_ok: a selective probe (clones routed to 1 of 8
      shards) through the LAZY (file-backed, partition-prunable) bundle
      dispatches to serving and returns exactly the direct
      search_serving rows (no recall gate here: the shared catalog index
      is id-hash sharded, so a 1-of-8 probe legitimately misses true
      neighbors — routed-recall is gated where the index is
      content-sharded, tests/test_hnsw_spark.py);
    - params_roundtrip_ok: metric/params/num_shards survive the
      manifest round-trip."""
    import shutil
    import tempfile

    from hawk_pack_spark.sources.graph_io import (
        load_serving_index,
        save_serving_index,
    )

    emb, index = _hnsw_index(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    mdir = tempfile.mkdtemp(prefix="hawk_manifest_cat_")
    try:
        save_serving_index(index, mdir, params=_HNSW_PARAMS, metric="l2_sq")
        lazy = load_serving_index(spark, mdir)
        mat = load_serving_index(spark, mdir, materialize=True)

        def rows(df: DataFrame) -> set:
            return {(r.query_id, r.vec_id, r.rank) for r in df.collect()}

        # (a) materialized bundle, 10-query full fan → exact-scan path
        dec_a: dict = {}
        got_a = rows(hnsw.ann_search(mat, queries, k=10, decision_out=dec_a))
        exact_df = knn_exact(emb, queries, k=10, metric="l2_sq")
        exact = rows(exact_df)
        blas_exact_ok = dec_a["path"] == "blas" and got_a == exact

        # (b) lazy bundle, clone batch probing 1 of 8 shards → serving
        v0 = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
        clones = spark.createDataFrame(
            [(i, v0) for i in range(5)],
            "query_id long, query_vec array<double>",
        )
        dec_b: dict = {}
        got_b = rows(
            hnsw.ann_search(lazy, clones, k=10, nprobe_shards=1,
                            decision_out=dec_b)
        )
        direct_b = rows(
            hnsw.search_serving(
                lazy.index, clones, k=10, metric=lazy.metric,
                params=lazy.params, nprobe_shards=1, centroids=lazy.centroids,
            )
        )
        selective_serving_ok = (
            dec_b["path"] == "serving" and len(got_b) == 50
            and got_b == direct_b
        )

        params_roundtrip_ok = (
            lazy.metric == "l2_sq"
            and lazy.params == _HNSW_PARAMS
            and lazy.num_shards == _hnsw_num_shards(spark, sf_dir)
            and mat.params == _HNSW_PARAMS
        )
        return spark.createDataFrame(
            [(
                len({q for q, _, _ in got_a}), len(got_a),
                bool(blas_exact_ok),
                bool(selective_serving_ok), bool(params_roundtrip_ok),
            )],
            "n_queries long, n_results long, blas_exact_ok boolean, "
            "selective_serving_ok boolean, params_roundtrip_ok boolean",
        )
    finally:
        shutil.rmtree(mdir, ignore_errors=True)


SERVING_RESTART_SQL = """
SELECT CAST(10 AS BIGINT) AS n_queries, CAST(100 AS BIGINT) AS n_results,
       TRUE AS blas_exact_ok, TRUE AS selective_serving_ok,
       TRUE AS params_roundtrip_ok
"""


def q_hnsw_insert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MUTATION surface as one invariant row (reference insert
    lifecycle, SURVEY §3 EP2): 20 perturbed twins batch-insert into the
    shared index and must be findable at self-distance 0 afterwards;
    20 exact duplicates insert under the is_match(0) gate and must ALL
    be rejected (dedup-on-insert, the LinearDb::exists semantics). The
    oracle derives every count from the embeddings table."""
    emb, index = _hnsw_index(spark, sf_dir)
    twins = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(1e-4)).alias("embedding"),
    )
    updated = hnsw.insert_batch(
        index, twins, metric="l2_sq", params=_HNSW_PARAMS
    ).localCheckpoint()
    q = twins.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    found = hnsw.search(
        updated, q, k=1, metric="l2_sq", params=_HNSW_PARAMS
    ).where(
        (F.col("query_id") == F.col("vec_id")) & (F.col("dist") == 0)
    )
    dups = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    gated = hnsw.insert_batch(
        index, dups, metric="l2_sq", params=_HNSW_PARAMS,
        match_threshold=0.0, serving_gate=True,
    )
    return (
        emb.agg(F.count(F.lit(1)).alias("n_before"))
        .crossJoin(updated.agg(F.count(F.lit(1)).alias("n_after")))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_inserted_found")))
        .crossJoin(gated.agg(F.count(F.lit(1)).alias("n_after_dup_gate")))
        .select(
            "n_before",
            "n_after",
            "n_inserted_found",
            (F.col("n_after_dup_gate") == F.col("n_before")).alias("dups_all_rejected"),
        )
    )


HNSW_INSERT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(COUNT(*) + 20 AS BIGINT) AS n_after,
       CAST(20 AS BIGINT) AS n_inserted_found,
       TRUE AS dups_all_rejected
FROM embeddings
"""


def q_dup_gate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CROSS-SHARD intra-batch duplicate gate (insert_batch,
    hnsw.py — reference serial insert-unless-duplicate semantics,
    SURVEY §3 EP2) as a data-level row. Id-hashed shards mean an exact
    duplicate of a stored code usually lives in a DIFFERENT shard than
    the incoming id, and the two members of an intra-batch duplicate
    pair can hash to different shards too — both escapes the per-shard
    serial kernel cannot see, both caught by the global gate. One batch
    carries 20 cross-shard duplicates of stored codes (all rejected),
    5 intra-batch duplicate pairs under DIFFERENT ids (first id wins —
    the reference's serial outcome), and 10 new codes (all accepted).
    The surviving id set is checked exactly, and the serving-broadcast
    and cogroup gate shapes must agree row-for-row."""
    emb = _embeddings_vectors(spark, sf_dir)
    base = emb.where(F.col("vec_id") < 40).select(
        "vec_id", F.col("vec_id").cast("long").alias("code")
    )
    params = HawkParams.new(32, 16, 8)
    index = hnsw.build_index(
        base, metric="hamming", params=params, num_shards=4, vec_col="code"
    ).localCheckpoint()
    dups = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.col("vec_id").cast("long").alias("code"),
    )
    intra_win = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 2000).alias("vec_id"),
        (F.col("vec_id") + 100).cast("long").alias("code"),
    )
    intra_lose = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 3000).alias("vec_id"),
        (F.col("vec_id") + 100).cast("long").alias("code"),
    )
    news = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 4000).alias("vec_id"),
        (F.col("vec_id") + 200).cast("long").alias("code"),
    )
    batch = (
        dups.unionByName(intra_win).unionByName(intra_lose).unionByName(news)
    )
    gated = hnsw.insert_batch(
        index, batch, metric="hamming", params=params, vec_col="code",
        match_threshold=0.0, serving_gate=True,
    ).localCheckpoint()
    gated_cg = hnsw.insert_batch(
        index, batch, metric="hamming", params=params, vec_col="code",
        match_threshold=0.0, serving_gate=False,
    )
    expected_ids = (
        base.select("vec_id")
        .unionByName(intra_win.select("vec_id"))
        .unionByName(news.select("vec_id"))
    )
    got = gated.select("vec_id")
    got_cg = gated_cg.select("vec_id")
    ids_diff = got.exceptAll(expected_ids).unionByName(
        expected_ids.exceptAll(got)
    ).count()
    gates_diff = got.exceptAll(got_cg).unionByName(
        got_cg.exceptAll(got)
    ).count()
    return (
        emb.where(F.col("vec_id") < 40)
        .agg(F.count(F.lit(1)).cast("long").alias("n_before"))
        .crossJoin(gated.agg(F.count(F.lit(1)).cast("long").alias("n_after")))
        .select(
            "n_before",
            "n_after",
            F.lit(ids_diff == 0).alias("ids_exact"),
            F.lit(gates_diff == 0).alias("gates_agree"),
        )
    )


DUP_GATE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(COUNT(*) + 15 AS BIGINT) AS n_after,
       TRUE AS ids_exact, TRUE AS gates_agree
FROM embeddings WHERE vec_id < 40
"""


def q_hnsw_delete_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index maintenance as one invariant row: delete every 10th vector
    WITH bridge repair; deleted ids must vanish from rows AND from every
    surviving adjacency list (exact, immediate deletion), survivors must
    keep ≥ 99.9% self-recall through the repaired graph (matching the
    operator's contract: local bridge repair is APPROXIMATE — measured
    1 unreachable survivor in 18,000 on the sf1 clustered corpus, and
    the exact path for accumulated damage is fragmented_shards +
    rebuild_shards, oracle-checked by hnsw_rebuild_churned), and the
    M_max degree bounds must still hold after the re-trim. Oracle
    derives counts from the embeddings table; the recall gate is an
    integer cross-multiplication."""
    emb, index = _hnsw_index(spark, sf_dir)
    dels = emb.where(F.col("vec_id") % 10 == 0).select("vec_id")
    pruned = hnsw.delete_from_index(
        index, dels, metric="l2_sq", params=_HNSW_PARAMS
    ).localCheckpoint()
    dangling = (
        pruned.select(F.explode("e_dst").alias("dst"))
        .join(dels.select(F.col("vec_id").alias("dst")), "dst", "leftsemi")
    )
    m_max0 = _HNSW_PARAMS.get_M_max(0)
    m_max = _HNSW_PARAMS.get_M_max(1)
    links = hnsw.to_links(pruned)
    over = links.where(
        F.size("nbrs")
        > F.when(F.col("layer") == 0, F.lit(m_max0)).otherwise(F.lit(m_max))
    )
    survivors = emb.join(dels, "vec_id", "left_anti")
    q = survivors.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    self_found = hnsw.search(
        pruned, q, k=1, metric="l2_sq", params=_HNSW_PARAMS
    ).where((F.col("query_id") == F.col("vec_id")) & (F.col("dist") == 0))
    return (
        emb.agg(F.count(F.lit(1)).alias("n_before"))
        .crossJoin(pruned.agg(F.count(F.lit(1)).alias("n_survivors")))
        .crossJoin(dangling.agg(F.count(F.lit(1)).alias("_dangle")))
        .crossJoin(over.agg(F.count(F.lit(1)).alias("_over")))
        .crossJoin(self_found.agg(F.count(F.lit(1)).alias("n_self_found")))
        .select(
            "n_before",
            "n_survivors",
            (F.col("_dangle") == 0).alias("no_dangling_edges"),
            (F.col("_over") == 0).alias("degree_bounds_ok"),
            (
                F.col("n_self_found") * 1000 >= F.col("n_survivors") * 999
            ).alias("survivor_recall_ok"),
        )
    )


HNSW_DELETE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(SUM(CASE WHEN vec_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       TRUE AS no_dangling_edges,
       TRUE AS degree_bounds_ok,
       TRUE AS survivor_recall_ok
FROM embeddings
"""


def q_graph_rekey_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphMem::from_another as one invariant row (graph_mem.rs:43-76;
    queue re-key = FurthestQueue::map, queue.rs:67-85): remap every
    vector ref through a bijection (and double every distance through
    the dist-map hook), then remap back through the inverse — the graph
    must return byte-identical (same layers, same queues in the same
    order, same distances), and the forward map alone must have applied
    the distance scale exactly."""
    emb, index = _hnsw_index(spark, sf_dir)
    from hawk_pack_spark.operators.rekey import rekey_entry, rekey_links

    links = hnsw.to_links(index)
    entries = hnsw.entry_points(index)
    fwd = emb.select(
        F.col("vec_id").alias("old_id"),
        (F.col("vec_id") * 2 + 1).alias("new_id"),
    )
    inv = fwd.select(
        F.col("new_id").alias("old_id"), F.col("old_id").alias("new_id")
    )
    once = rekey_links(links, fwd, dist_scale=2.0)
    back = rekey_links(once, inv, dist_scale=0.5)
    key = ["shard", "layer", "src"]
    # canonical per-node row: queue rendered as text for exact comparison
    canon = lambda df: df.select(  # noqa: E731
        *key,
        F.to_json(
            F.transform(
                "nbrs",
                lambda x: F.struct(
                    F.round(x["dist"], 6).alias("d"), x["dst"].alias("t")
                ),
            )
        ).alias("q"),
    )
    diff = canon(links).exceptAll(canon(back)).unionByName(
        canon(back).exceptAll(canon(links))
    )
    scaled = (
        links.select(*key, F.explode("nbrs").alias("n"))
        .select(*[F.col(c) for c in ["layer"]],
                (F.col("src") * 2 + 1).alias("src"),
                (F.col("n.dst") * 2 + 1).alias("dst"),
                (F.col("n.dist") * 2).alias("want"))
    )
    got = once.select(
        "layer", "src", F.explode("nbrs").alias("n")
    ).select("layer", "src", F.col("n.dst").alias("dst"), F.col("n.dist").alias("got"))
    scale_bad = scaled.join(got, ["layer", "src", "dst"]).where(
        F.abs(F.col("want") - F.col("got")) > 1e-9
    )
    e_back = rekey_entry(rekey_entry(entries, fwd), inv)
    e_diff = entries.exceptAll(e_back).unionByName(e_back.exceptAll(entries))
    return (
        emb.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(diff.agg(F.count(F.lit(1)).alias("_d")))
        .crossJoin(scale_bad.agg(F.count(F.lit(1)).alias("_s")))
        .crossJoin(e_diff.agg(F.count(F.lit(1)).alias("_e")))
        .select(
            "n_nodes",
            (F.col("_d") == 0).alias("links_roundtrip_exact"),
            (F.col("_s") == 0).alias("dist_scale_exact"),
            (F.col("_e") == 0).alias("entry_roundtrip_exact"),
        )
    )


GRAPH_REKEY_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       TRUE AS links_roundtrip_exact,
       TRUE AS dist_scale_exact,
       TRUE AS entry_roundtrip_exact
FROM embeddings
"""


def q_hnsw_self_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship invariant (hawk_searcher.rs:441-479): every
    indexed vector, searched at k=1, must return itself at distance 0.
    The oracle derives both counts from the embeddings table — recall
    below 100% hash-mismatches."""
    emb, index = _hnsw_index(spark, sf_dir)
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = hnsw.search(index, queries, k=1, metric="l2_sq", params=_HNSW_PARAMS)
    return res.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            F.when((F.col("query_id") == F.col("vec_id")) & (F.col("dist") == 0), 1).otherwise(0)
        ).alias("n_self_matches"),
    )


HNSW_SELF_RECALL_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(COUNT(*) AS BIGINT) AS n_self_matches
FROM embeddings
"""


def q_hnsw_links_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph structural invariants as one checkable row: total node
    count, full layer-0 membership, and the M_max degree bounds that
    connect_bidir must maintain (hawk_searcher.rs:153-176)."""
    emb, index = _hnsw_index(spark, sf_dir)
    links = hnsw.to_links(index)
    m_max0 = _HNSW_PARAMS.get_M_max(0)
    m_max = _HNSW_PARAMS.get_M_max(1)
    bound = F.when(F.col("layer") == 0, F.lit(m_max0)).otherwise(F.lit(m_max))
    over = links.where(F.size("nbrs") > bound)
    l0_nodes = links.where(F.col("layer") == 0).select("src").distinct()
    return (
        index.agg(F.count(F.lit(1)).alias("n_vectors"))
        .crossJoin(l0_nodes.agg(F.count(F.lit(1)).alias("_l0")))
        .crossJoin(over.agg(F.count(F.lit(1)).alias("_over")))
        .crossJoin(
            links.agg(F.max("layer").alias("_top"))
        )
        .select(
            "n_vectors",
            (F.col("_l0") == F.col("n_vectors")).alias("layer0_complete"),
            (F.col("_over") == 0).alias("degree_ok"),
            (F.col("_top") >= 1).alias("has_upper_layers"),
        )
    )


HNSW_LINKS_STATS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors, TRUE AS layer0_complete,
       TRUE AS degree_ok, TRUE AS has_upper_layers
FROM embeddings
"""


def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal loop collapsed to one checkable row: binary
    media table → mapInPandas feature extraction → frame sampling →
    HNSW ANN over the features. synthetic_media emits REAL P6 PPM image
    and 16-bit PCM WAV audio payloads, and extract_features runs the
    real pure-numpy decode + feature paths for those rows (RGB grid +
    histogram; log-power FFT bands + RMS/ZCR); only the video rows fall
    back to the deterministic fake (no codec in this container).

    n_media / n_frames_sampled are EXACTLY derivable from the documents
    table (media metadata is a pure function of doc_id/n_chars), so the
    oracle recomputes them; the booleans assert feature-vector shape,
    unit norm, and ANN self-match@1 over the extracted features."""
    from hawk_pack_spark.functions.distance import norm
    from hawk_pack_spark.multimodal.ops import (
        extract_features,
        frame_sample,
        synthetic_media,
    )

    media = synthetic_media(spark, sf_dir)
    feats = extract_features(media).localCheckpoint()
    fstats = feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.count_distinct("kind").alias("n_kinds"),
        ((F.min(F.size("feature")) == 64) & (F.max(F.size("feature")) == 64)).alias(
            "dim_ok"
        ),
        (F.max(F.abs(norm(F.col("feature")) - 1)) < 1e-9).alias("unit_norm_ok"),
    )
    frames = frame_sample(media, every_nth=5).agg(
        F.count(F.lit(1)).alias("n_frames_sampled")
    )
    vecs = feats.select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    params = HawkParams.new(48, 48, 12)
    # real features form near-duplicate clusters (statistically similar
    # media) — Algorithm 4 neighbor selection keeps the graph connected.
    # Shard count scales with the table (~2.5k vectors per shard graph):
    # a fixed count let per-shard graphs grow 10x at sf1, where one
    # 12.5k-row graph of dense near-dup clusters cost a beam miss.
    n_media_rows = feats.count()
    index = hnsw.build_index(
        vecs, metric="cosine", params=params,
        num_shards=max(4, n_media_rows // 2500),
        neighbor_heuristic=True,
    )
    queries = vecs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = hnsw.search(index, queries, k=1, metric="cosine", params=params)
    self_ok = ann.agg(
        (
            F.sum(
                F.when(
                    (F.col("query_id") == F.col("vec_id")) & (F.col("dist") < 1e-9), 1
                ).otherwise(0)
            )
            == F.count(F.lit(1))
        ).alias("ann_self_ok")
    )
    return fstats.crossJoin(frames).crossJoin(self_ok).select(
        "n_media", "n_kinds", "dim_ok", "unit_norm_ok", "n_frames_sampled",
        "ann_self_ok",
    )


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


def _minhash_capped_sql(max_bucket: int = 20) -> str:
    base = _minhash_sql()
    return base.replace(
        """cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_key)""",
        f"""bands_capped AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, band_key) AS bsize FROM bands)
  WHERE bsize <= {max_bucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands_capped a JOIN bands_capped b USING (band, band_key)""",
    )


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
    pruned = semdedup_pairs(aug, threshold=0.9, n_clusters=8)
    exact = all_pairs_cosine_numpy(aug, threshold=0.9)
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
    keyed = gated.withColumn("h", F.md5(F.lower(F.col("text"))))
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
        .join(gated.groupBy("lang").agg(F.count(F.lit(1)).alias("n_gated")), "lang", "left")
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


# ---------------------------------------------------------------------------
# round-5 driver-gate block: invariant rows for the components that were
# pytest-only through r4 (VERDICT r4 item 3) — BPE training, the
# coroutine op-stream protocol, streaming ingest, JDBC persistence.


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training as one invariant row (VERDICT r4 #1): the
    driver-loop trainer (incremental heap, collected word table) and the
    distributed trainer (word table NEVER collects — per-merge
    distributed pair count + 1-row argmax + Catalyst fold rewrite) must
    learn byte-identical merge sequences on the documents corpus, and
    every final segmentation must concatenate back to its word. Word
    and token counts are table-derived in the oracle via the identical
    tokenizer. Reference analog: store-mediated batching is the
    engine's premise (src/traits.rs:56-95)."""
    from hawk_pack_spark.operators.bpe import (
        END,
        train_bpe,
        train_bpe_distributed,
        word_freq,
    )

    docs = load_table(spark, "documents", sf_dir)
    merges_driver, seg = train_bpe(docs, n_merges=12, max_driver_words=None)
    merges_dist, _ = train_bpe_distributed(docs, n_merges=12, checkpoint_every=4)
    bad_seg = seg.where(
        F.concat_ws("", F.col("syms")) != F.concat(F.col("w"), F.lit(END))
    ).agg(F.count(F.lit(1)).alias("_bad"))
    return (
        word_freq(docs)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("freq").cast("long").alias("total_tokens"),
        )
        .crossJoin(bad_seg)
        .select(
            "n_words",
            "total_tokens",
            F.lit(len(merges_driver) == 12).alias("learned_all"),
            F.lit(merges_driver == merges_dist).alias("paths_agree"),
            (F.col("_bad") == 0).alias("segmentation_exact"),
        )
    )


BPE_VOCAB_SQL = r"""
SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS total_tokens,
       TRUE AS learned_all, TRUE AS paths_agree, TRUE AS segmentation_exact
FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                x -> x != '')) AS w
      FROM documents)
"""


def q_op_stream_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The coroutine op-stream protocol (reference src/coroutine.rs:
    218-304) as one invariant row: the design-(b) driver loop over
    simhash codes of fixture embeddings must issue GetEntryPoint first,
    then per-layer triads GetLinks → EvalDistanceBatch → LessThanBatch
    with monotonically descending layers, ending SearchResult — and
    every query must find its own staged code at distance 0."""
    from hawk_pack_spark.operators.hnsw_driver import search_driver_loop

    emb = _embeddings_vectors(spark, sf_dir).where(F.col("vec_id") < 60)
    codes = emb.select(
        "vec_id", D.simhash_code(F.col("embedding")).alias("code")
    ).localCheckpoint()
    params = HawkParams.new(32, 16, 8)
    index = hnsw.build_index(
        codes, metric="hamming", params=params, num_shards=2, vec_col="code"
    ).localCheckpoint()
    queries = codes.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    ops: list = []
    res = search_driver_loop(
        index, queries, k=1, metric="hamming", params=params, op_log=ops
    ).collect()
    names = [o[0] for o in ops]
    body = names[1:-1]
    triads_ok = (
        bool(body)
        and len(body) % 3 == 0
        and all(
            body[i : i + 3] == ["GetLinks", "EvalDistanceBatch", "LessThanBatch"]
            for i in range(0, len(body), 3)
        )
    )
    layers = [kw["layer"] for op, kw in ops if op == "GetLinks"]
    protocol_ok = bool(
        names
        and names[0] == "GetEntryPoint"
        and names[-1] == "SearchResult"
        and triads_ok
        and layers == sorted(layers, reverse=True)
    )
    dist0 = sum(1 for r in res if r.dist == 0.0)
    return codes.agg(F.count(F.lit(1)).cast("long").alias("n_index")).select(
        "n_index",
        F.lit(len({r.query_id for r in res})).cast("long").alias("n_queries"),
        F.lit(protocol_ok).alias("protocol_ok"),
        F.lit(dist0 == 3).alias("all_found_dist0"),
    )


OP_STREAM_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_index, CAST(3 AS BIGINT) AS n_queries,
       TRUE AS protocol_ok, TRUE AS all_found_dist0
FROM embeddings WHERE vec_id < 60
"""


def q_streaming_ingest_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming ingest (§2.12; the reference's op-stream
    consumed as micro-batches) as one invariant row: two parquet
    micro-batches stream through the foreachBatch two-phase-insert sink
    (batch 1 bootstraps 40 codes; batch 2 carries 20 exact duplicates +
    10 new codes). The is_match(0) gate must reject exactly the
    duplicates, leaving the index holding exactly the distinct codes —
    counts table-derived from the embeddings ids that seeded them."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.ingest import StreamingIndex, start_parquet_ingest

    emb = _embeddings_vectors(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_")
    try:
        base = emb.where(F.col("vec_id") < 40).select(
            "vec_id", F.col("vec_id").cast("long").alias("code")
        )
        dups = emb.where(F.col("vec_id") < 20).select(
            (F.col("vec_id") + 1000).alias("vec_id"),
            F.col("vec_id").cast("long").alias("code"),
        )
        news = emb.where((F.col("vec_id") >= 40) & (F.col("vec_id") < 50)).select(
            "vec_id", F.col("vec_id").cast("long").alias("code")
        )
        base.coalesce(1).write.parquet(f"{tmp}/src/b1")
        dups.unionByName(news).coalesce(1).write.parquet(f"{tmp}/src/b2")
        sink = StreamingIndex(
            metric="hamming",
            params=HawkParams.new(32, 16, 8),
            match_threshold=0.0,
            num_shards=2,
        )
        q = start_parquet_ingest(
            spark, f"{tmp}/src/*", "vec_id long, code long", sink,
            checkpoint_dir=f"{tmp}/ckpt",
        )
        q.awaitTermination(300)
        n_final = sink.count()
        idx_codes = sink.index_df.select("code")
        expected = emb.where(F.col("vec_id") < 50).select(
            F.col("vec_id").cast("long").alias("code")
        )
        diff = (
            idx_codes.exceptAll(expected)
            .unionByName(expected.exceptAll(idx_codes))
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        return (
            emb.where(F.col("vec_id") < 50)
            .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_codes"))
            .crossJoin(diff)
            .select(
                "n_distinct_codes",
                F.lit(n_final).cast("long").alias("n_accepted"),
                (F.col("_d") == 0).alias("codes_exact"),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_INGEST_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_codes,
       CAST(COUNT(*) AS BIGINT) AS n_accepted,
       TRUE AS codes_exact
FROM embeddings WHERE vec_id < 50
"""


def q_streaming_durable_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DURABLE streaming near-dup store (StreamingNearDup with
    store_path: append-only parquet band buckets + accepted-id log) and
    its restart ≡ continuation contract, as one invariant row. Batch 1
    streams 30 documents through the MinHash band gate into the durable
    store; the process then 'dies' — a FRESH gate object on the same
    path ingests batch 2 (30 more docs, plus 10 re-sent batch-1 texts
    under new ids). Every re-sent text must be rejected by the
    REHYDRATED store (proof the bands persisted and reloaded), and the
    run's accepted-id set must equal a single-process continuous run's,
    exactly — both equalities computed live; a violation flips a
    boolean and fails the hash."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.ingest import StreamingNearDup

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    b1 = docs.where(F.col("doc_id") < 30)
    resent = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    b2 = docs.where(
        (F.col("doc_id") >= 30) & (F.col("doc_id") < 60)
    ).unionByName(resent)

    tmp = tempfile.mkdtemp(prefix="hps_q_durable_")
    try:
        cont = StreamingNearDup(store_path=f"{tmp}/cont")
        cont.ingest_batch(b1)
        cont.ingest_batch(b2)

        first = StreamingNearDup(store_path=f"{tmp}/restart")
        first.ingest_batch(b1)
        resumed = StreamingNearDup(store_path=f"{tmp}/restart")
        resumed.ingest_batch(b2)

        a, b = cont.accepted_ids, resumed.accepted_ids
        restart_diff = a.exceptAll(b).unionByName(b.exceptAll(a)).count()
        n_resent_accepted = b.where(F.col("doc_id") >= 100000).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        docs.where(F.col("doc_id") < 60)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "n_docs",
            F.lit(restart_diff == 0).alias("restart_matches_continuous"),
            F.lit(n_resent_accepted == 0).alias("resent_dups_rejected"),
        )
    )


STREAMING_DURABLE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       TRUE AS restart_matches_continuous,
       TRUE AS resent_dups_rejected
FROM documents WHERE doc_id < 60
"""


def q_streaming_delta_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming delta persistence (StreamingIndex(jdbc_url=...)): every
    micro-batch row-level-upserts the TOUCHED shards' graph rows into
    the reference's two-table layout (graph_pg.rs:111-115 ON CONFLICT
    semantics) — write amplification tracks the batch, yet after the
    stream drains the DATABASE must hold exactly the in-memory index's
    links and entry points. Checked by re-importing through the real
    JDBC source and requiring multiset equality of parsed queues."""
    import shutil
    import tempfile

    from hawk_pack_spark.sources.graph_io import import_graph_jdbc
    from hawk_pack_spark.streaming.ingest import StreamingIndex

    emb = _embeddings_vectors(spark, sf_dir)
    b1 = emb.where(F.col("vec_id") < 40).select(
        "vec_id", F.col("vec_id").cast("long").alias("code")
    )
    # batch 2: 10 new codes + 10 exact duplicates (gate must reject the
    # dups, and the delta upsert must still leave the DB == memory)
    b2 = emb.where((F.col("vec_id") >= 40) & (F.col("vec_id") < 50)).select(
        "vec_id", F.col("vec_id").cast("long").alias("code")
    ).unionByName(
        emb.where(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 5000).alias("vec_id"),
            F.col("vec_id").cast("long").alias("code"),
        )
    )

    def flat(l: DataFrame) -> DataFrame:
        return l.select(
            "layer", "src", F.posexplode_outer("nbrs").alias("pos", "nb")
        ).select(
            "layer", "src", "pos",
            F.col("nb.dist").alias("dist"), F.col("nb.dst").alias("dst"),
        )

    tmp = tempfile.mkdtemp(prefix="hps_q_sdelta_")
    try:
        url = f"jdbc:derby:{tmp}/hawk_derby;create=true"
        drv = "org.apache.derby.jdbc.EmbeddedDriver"
        sink = StreamingIndex(
            metric="hamming",
            params=HawkParams.new(32, 16, 8),
            match_threshold=0.0,
            num_shards=2,
            jdbc_url=url,
            jdbc_driver=drv,
        )
        sink.ingest_batch(b1)
        sink.ingest_batch(b2)
        links_db, entries_db = import_graph_jdbc(spark, url=url, driver=drv)
        links_mem = hnsw.to_links(sink.index_df)
        entries_mem = hnsw.entry_points(sink.index_df)
        l1, l2 = flat(links_mem), flat(links_db)
        ldiff = l1.exceptAll(l2).unionByName(l2.exceptAll(l1)).count()
        e1 = entries_mem.select("shard", "point", "layer")
        e2 = entries_db.select("shard", "point", "layer")
        ediff = e1.exceptAll(e2).unionByName(e2.exceptAll(e1)).count()
        n_index = sink.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        emb.where(F.col("vec_id") < 50)
        .agg(F.count(F.lit(1)).cast("long").alias("n_index_expected"))
        .select(
            "n_index_expected",
            F.lit(n_index).cast("long").alias("n_index"),
            F.lit(ldiff == 0).alias("db_links_match_memory"),
            F.lit(ediff == 0).alias("db_entries_match_memory"),
        )
    )


STREAMING_DELTA_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_index_expected,
       CAST(COUNT(*) AS BIGINT) AS n_index,
       TRUE AS db_links_match_memory,
       TRUE AS db_entries_match_memory
FROM embeddings WHERE vec_id < 50
"""


def q_streaming_query_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The online READ half of the reference's serving loop
    (coroutine.rs query ops) as one invariant row: a manifest bundle is
    saved and reloaded (the restartable serving unit), then TWO query
    micro-batches stream through `start_query_stream` — readStream →
    `ann_search` front door per batch → append sink. Each epoch's sunk
    rows must equal a direct `ann_search` of that batch, and every
    query (a corpus member) must find itself at rank 1, distance 0.
    Counts table-derived; equalities computed live — a violation flips
    a boolean and fails the hash."""
    import shutil
    import tempfile

    from hawk_pack_spark.sources.graph_io import (
        load_serving_index,
        save_serving_index,
    )
    from hawk_pack_spark.streaming.serve import start_query_stream

    emb, index = _hnsw_index(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="hps_q_qserve_")
    try:
        save_serving_index(index, f"{tmp}/bundle", params=_HNSW_PARAMS)
        bundle = load_serving_index(spark, f"{tmp}/bundle")
        batches = [
            emb.where(F.col("vec_id") < 15),
            emb.where((F.col("vec_id") >= 15) & (F.col("vec_id") < 30)),
        ]
        for i, b in enumerate(batches):
            b.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ).coalesce(1).write.parquet(f"{tmp}/qsrc/b{i}")
        q = start_query_stream(
            spark, f"{tmp}/qsrc/*", "query_id long, query_vec array<double>",
            bundle, f"{tmp}/results", f"{tmp}/ckpt", k=5,
        )
        q.awaitTermination(300)
        got = spark.read.parquet(f"{tmp}/results")
        epochs = sorted(
            r[0] for r in got.select("epoch").distinct().collect()
        )
        n_sunk = got.count()
        by_epoch = {
            e: sorted(
                (r.query_id, r.rank, r.vec_id, round(r.dist, 9))
                for r in got.where(F.col("epoch") == e).collect()
            )
            for e in epochs
        }
        direct = {
            e: sorted(
                (r.query_id, r.rank, r.vec_id, round(r.dist, 9))
                for r in hnsw.ann_search(
                    bundle,
                    b.select(
                        F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("query_vec"),
                    ),
                    k=5,
                ).collect()
            )
            for e, b in zip(epochs, batches)
        }
        self_hits = got.where(
            (F.col("rank") == 1)
            & (F.col("query_id") == F.col("vec_id"))
            & (F.col("dist") == 0)
        ).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    base = emb.where(F.col("vec_id") < 30).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    return base.select(
        "n_queries",
        F.lit(n_sunk).cast("long").alias("n_results"),
        F.lit(len(epochs) == 2).alias("epochs_ok"),
        F.lit(by_epoch == direct).alias("rows_equal_direct"),
        (F.lit(self_hits).cast("long") == F.col("n_queries")).alias("self_exact"),
    )


STREAMING_SERVE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(5 * COUNT(*) AS BIGINT) AS n_results,
       TRUE AS epochs_ok, TRUE AS rows_equal_direct, TRUE AS self_exact
FROM embeddings WHERE vec_id < 30
"""


def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphPg persistence (reference src/graph_store/graph_pg.rs:
    130-326, two-table layout) as one invariant row: export the links +
    entry views of a fixture-derived index through the REAL Spark JDBC
    source to embedded Derby, re-import, and require exact multiset
    equality of parsed neighbor queues (order-preserving via position)
    and entry points. Against Postgres only the URL changes."""
    import shutil
    import tempfile

    from hawk_pack_spark.sources.graph_io import (
        export_graph_jdbc,
        import_graph_jdbc,
    )

    emb = _embeddings_vectors(spark, sf_dir).where(F.col("vec_id") < 60)
    codes = emb.select("vec_id", D.simhash_code(F.col("embedding")).alias("code"))
    params = HawkParams.new(32, 16, 8)
    index = hnsw.build_index(
        codes, metric="hamming", params=params, num_shards=2, vec_col="code"
    ).localCheckpoint()
    links, entries = hnsw.to_links(index), hnsw.entry_points(index)

    def flat(l: DataFrame) -> DataFrame:
        return l.select(
            "layer", "src", F.posexplode_outer("nbrs").alias("pos", "nb")
        ).select(
            "layer", "src", "pos",
            F.col("nb.dist").alias("dist"), F.col("nb.dst").alias("dst"),
        )

    tmp = tempfile.mkdtemp(prefix="hps_q_jdbc_")
    try:
        url = f"jdbc:derby:{tmp}/hawk_derby;create=true"
        drv = "org.apache.derby.jdbc.EmbeddedDriver"
        ok = export_graph_jdbc(links, entries, url=url, driver=drv)
        links2, entries2 = import_graph_jdbc(spark, url=url, driver=drv)
        l1, l2 = flat(links), flat(links2)
        ldiff = (
            l1.exceptAll(l2).unionByName(l2.exceptAll(l1)).count()
        )
        e1 = entries.select("shard", "point", "layer")
        e2 = entries2.select("shard", "point", "layer")
        ediff = (
            e1.exceptAll(e2).unionByName(e2.exceptAll(e1)).count()
        )
    finally:
        # counts above are materialized; the Derby files can go
        shutil.rmtree(tmp, ignore_errors=True)
    return emb.agg(F.count(F.lit(1)).cast("long").alias("n_index")).select(
        "n_index",
        F.lit(bool(ok)).alias("exported"),
        F.lit(ldiff == 0).alias("links_roundtrip_exact"),
        F.lit(ediff == 0).alias("entries_roundtrip_exact"),
    )


JDBC_ROUNDTRIP_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_index, TRUE AS exported,
       TRUE AS links_roundtrip_exact, TRUE AS entries_roundtrip_exact
FROM embeddings WHERE vec_id < 60
"""


def q_jdbc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level JDBC upsert (graph_pg.rs:111-115 ON CONFLICT DO UPDATE;
    standard-SQL MERGE on Derby, the in-container database) as one
    invariant row: snapshot-upsert a fixture-derived graph into freshly
    created PK'd tables, mutate it (delete+repair), upsert ONLY the
    changed-row delta, re-import — changed rows must carry the NEW
    queues, unchanged and deleted-vector rows must retain their prior
    values (upsert never deletes), and entry rows update in place."""
    import shutil
    import tempfile

    from hawk_pack_spark.sources.graph_io import (
        ensure_graph_schema_jdbc,
        import_graph_jdbc,
        upsert_graph_jdbc,
    )

    emb = _embeddings_vectors(spark, sf_dir).where(F.col("vec_id") < 60)
    codes = emb.select("vec_id", D.simhash_code(F.col("embedding")).alias("code"))
    params = HawkParams.new(32, 16, 8)
    index = hnsw.build_index(
        codes, metric="hamming", params=params, num_shards=2, vec_col="code"
    ).localCheckpoint()
    links, entries = hnsw.to_links(index), hnsw.entry_points(index)

    tmp = tempfile.mkdtemp(prefix="hps_q_upsert_")
    try:
        url = f"jdbc:derby:{tmp}/hawk_derby;create=true"
        drv = "org.apache.derby.jdbc.EmbeddedDriver"
        ensure_graph_schema_jdbc(spark, url=url, driver=drv)
        ok1 = upsert_graph_jdbc(links, entries, url=url, driver=drv)

        dels = emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
        repaired = hnsw.delete_from_index(
            index, dels, metric="hamming", params=params
        ).localCheckpoint()
        new_links = hnsw.to_links(repaired)
        old_map = {(r.layer, r.src): [(n.dist, n.dst) for n in r.nbrs]
                   for r in links.collect()}
        new_map = {(r.layer, r.src): [(n.dist, n.dst) for n in r.nbrs]
                   for r in new_links.collect()}
        changed = [k for k in new_map if old_map.get(k) != new_map[k]]
        delta = new_links.join(
            spark.createDataFrame(changed or [(-1, -1)], "layer int, src long"),
            ["layer", "src"], "left_semi",
        )
        ok2 = upsert_graph_jdbc(
            delta, hnsw.entry_points(repaired), url=url, driver=drv
        )
        links_db, entries_db = import_graph_jdbc(spark, url=url, driver=drv)
        got = {(r.layer, r.src): [(n.dist, n.dst) for n in r.nbrs]
               for r in links_db.collect()}
        updated_ok = all(got.get(k) == new_map[k] for k in changed)
        retained_ok = all(
            got.get(k) == old_map[k] for k in old_map if k not in set(changed)
        )
        keys_ok = set(got) == set(old_map)
        entries_ok = {tuple(r) for r in entries_db.collect()} == {
            (r.shard, r.point, r.layer)
            for r in hnsw.entry_points(repaired).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return emb.agg(F.count(F.lit(1)).cast("long").alias("n_index")).select(
        "n_index",
        F.lit(bool(ok1) and bool(ok2)).alias("upserted"),
        F.lit(len(changed) > 0 and updated_ok).alias("changed_rows_updated"),
        F.lit(retained_ok and keys_ok).alias("untouched_rows_retained"),
        F.lit(entries_ok).alias("entries_updated_in_place"),
    )


JDBC_UPSERT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_index, TRUE AS upserted,
       TRUE AS changed_rows_updated, TRUE AS untouched_rows_retained,
       TRUE AS entries_updated_in_place
FROM embeddings WHERE vec_id < 60
"""


def q_graph_bulk_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphMem::from_precomputed (graph_mem.rs:25-37 — construct the
    operational index from externally built layers) as one invariant
    row: export the links view, bulk-import it with `from_links`, and
    require (a) row-for-row snapshot equality with the original index
    (layers, adjacency arrays, payloads) and (b) identical search
    results through both. Counts table-derived."""
    emb = _embeddings_vectors(spark, sf_dir).where(F.col("vec_id") < 120)
    codes = emb.select("vec_id", D.simhash_code(F.col("embedding")).alias("code"))
    params = HawkParams.new(32, 16, 8)
    index = hnsw.build_index(
        codes, metric="hamming", params=params, num_shards=2, vec_col="code"
    ).localCheckpoint()
    links = hnsw.to_links(index)
    imported = hnsw.from_links(links, codes, metric="hamming", vec_col="code")
    # adjacency is a SET per node: the kernel emits insertion order,
    # from_links emits (layer, dist, dst)-sorted — canonicalize by
    # sorting the zipped triples before comparing
    canon = lambda df: df.select(  # noqa: E731
        "shard", "vec_id", "layer",
        F.to_json(
            F.array_sort(
                F.transform(
                    F.arrays_zip("e_layer", "e_dst", "e_dist"),
                    lambda e: F.struct(
                        e["e_layer"].alias("l"),
                        F.round(e["e_dist"], 6).alias("w"),
                        e["e_dst"].alias("t"),
                    ),
                )
            )
        ).alias("adj"),
    )
    diff = canon(index).exceptAll(canon(imported)).unionByName(
        canon(imported).exceptAll(canon(index))
    )
    q = codes.select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    a = hnsw.search(index, q, k=3, metric="hamming", params=params)
    b = hnsw.search(imported, q, k=3, metric="hamming", params=params)
    sd = a.exceptAll(b).unionByName(b.exceptAll(a))
    return (
        emb.agg(F.count(F.lit(1)).cast("long").alias("n_index"))
        .crossJoin(diff.agg(F.count(F.lit(1)).alias("_g")))
        .crossJoin(sd.agg(F.count(F.lit(1)).alias("_s")))
        .select(
            "n_index",
            (F.col("_g") == 0).alias("import_snapshot_exact"),
            (F.col("_s") == 0).alias("search_results_identical"),
        )
    )


GRAPH_BULK_IMPORT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_index,
       TRUE AS import_snapshot_exact, TRUE AS search_results_identical
FROM embeddings WHERE vec_id < 120
"""


def q_nfc_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization with a DATA-LEVEL oracle (DuckDB ships
    nfc_normalize): plant a decomposed suffix (e + COMBINING ACUTE,
    U+0301) on every document, normalize, and hash-compare the full
    normalized text — composed vs decomposed codepoints are exactly the
    byte-identity hazard that breaks exact dedup across sources
    (functions/curation.py::nfc_normalize). char length drops by one
    per row as the combining pair composes."""
    from hawk_pack_spark.functions.curation import nfc_normalize

    docs = load_table(spark, "documents", sf_dir)
    planted = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" Cafe\u0301")).alias("text"),
    )
    normed = nfc_normalize(planted, "text")
    return (
        planted.select("doc_id", F.length("text").alias("len_before"))
        .join(
            normed.select(
                "doc_id", F.col("text").alias("norm_text"),
                F.length("text").alias("len_after"),
            ),
            "doc_id",
        )
        .select("doc_id", "norm_text", "len_before", "len_after")
        .orderBy("doc_id")
    )


NFC_NORMALIZE_SQL = """
SELECT doc_id,
       nfc_normalize(text || ' Cafe' || chr(769)) AS norm_text,
       length(text || ' Cafe' || chr(769)) AS len_before,
       length(nfc_normalize(text || ' Cafe' || chr(769))) AS len_after
FROM documents
ORDER BY doc_id
"""


def q_alg4_clustered_connectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algorithm 4 neighbor selection on clustered data (the NOTES r4
    multimodal lesson + the r5 1M ladder): plant 5 tight perturbed
    copies of each base embedding (pairwise-near clusters, the shape
    where the reference's plain M-nearest trim lets clusters capture
    every edge slot and strand the graph), build with
    ``neighbor_heuristic=True`` through the real Spark path, and
    require degree bounds AND complete self-recall — every vector finds
    itself at rank 1 / dist 0, i.e. no unreachable islands. Counts
    table-derived (5 copies per base vector)."""
    emb = _embeddings_vectors(spark, sf_dir).where(F.col("vec_id") < 150)
    copies = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("_c"),
        "embedding",
    ).select(
        (F.col("vec_id") * 8 + F.col("_c")).alias("vec_id"),
        F.transform(
            "embedding",
            # direction-varied perturbation: an equal shift on every dim
            # is a degenerate (collinear) cluster direction
            lambda x, i: x
            + F.sin(i.cast("double") * 1.7 + F.col("_c")) * F.lit(1e-4),
        ).alias("embedding"),
    )
    params = HawkParams.new(32, 8, 8)  # small M: the capture-prone regime
    index = hnsw.build_index(
        copies, metric="l2_sq", params=params, num_shards=2,
        neighbor_heuristic=True,
    ).localCheckpoint()
    m_max0, m_max = params.get_M_max(0), params.get_M_max(1)
    deg = (
        index.select(
            "vec_id", F.explode(F.arrays_zip("e_layer", "e_dst")).alias("e")
        )
        .groupBy("vec_id", F.col("e.e_layer").alias("layer"))
        .count()
        .where(
            F.col("count")
            > F.when(F.col("layer") == 0, F.lit(m_max0)).otherwise(F.lit(m_max))
        )
    )
    q = copies.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    found = hnsw.search(
        index, q, k=1, metric="l2_sq", params=params, ef_search=48
    ).where((F.col("query_id") == F.col("vec_id")) & (F.col("dist") == 0))
    return (
        emb.agg((F.count(F.lit(1)) * 5).cast("long").alias("n_vectors"))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("_over")))
        .crossJoin(found.agg(F.count(F.lit(1)).cast("long").alias("n_self_found")))
        .select(
            "n_vectors",
            (F.col("_over") == 0).alias("degree_bounds_ok"),
            "n_self_found",
            (F.col("n_self_found") == F.col("n_vectors")).alias("no_islands"),
        )
    )


ALG4_CLUSTERED_SQL = """
SELECT CAST(COUNT(*) * 5 AS BIGINT) AS n_vectors,
       TRUE AS degree_bounds_ok,
       CAST(COUNT(*) * 5 AS BIGINT) AS n_self_found,
       TRUE AS no_islands
FROM embeddings WHERE vec_id < 150
"""


def q_hnsw_rebuild_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn maintenance (r5): delete every 7th vector WITH bridge
    repair, detect the churned shards via the degree band (bridge
    re-trims saturate survivors toward M_max — measured signature, see
    hnsw.fragmented_shards), then rebuild_shards must restore EXACTLY
    the graph a fresh build over the survivor set produces (layer rule
    is splitmix64(vec_id), so rebuild ≡ fresh build is bit-exact, not
    just equivalent) with full self-recall. Counts table-derived."""
    emb, index = _hnsw_index(spark, sf_dir)
    dels = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    churned = hnsw.delete_from_index(
        index, dels, metric="l2_sq", params=_HNSW_PARAMS
    ).localCheckpoint()
    n_shards = _hnsw_num_shards(spark, sf_dir)
    frag = hnsw.fragmented_shards(churned, _HNSW_PARAMS)
    # neighbor_heuristic=True on BOTH builds, matching _hnsw_index: the
    # r8 sf1 gate caught this spec rebuilding WITHOUT Algorithm 4 while
    # the shared index uses it — plain M-nearest trim loses self-recall
    # on the scaled fixture's near-dup clusters (15996/17142 at sf1),
    # the exact pathology the r6 heuristic fix measured. rebuild ≡
    # fresh stays bit-exact either way; recall only holds with the
    # heuristic the serving build actually uses.
    rebuilt = hnsw.rebuild_shards(
        churned, list(range(n_shards)), metric="l2_sq", params=_HNSW_PARAMS,
        neighbor_heuristic=True,
    ).localCheckpoint()
    survivors = emb.join(dels, "vec_id", "left_anti")
    fresh = hnsw.build_index(
        survivors, metric="l2_sq", params=_HNSW_PARAMS, num_shards=n_shards,
        neighbor_heuristic=True,
    )
    canon = lambda df: df.select(  # noqa: E731
        "shard", "vec_id", "layer",
        F.to_json(
            F.struct(
                F.col("e_layer").alias("l"), F.col("e_dst").alias("d"),
                F.transform("e_dist", lambda x: F.round(x, 6)).alias("w"),
            )
        ).alias("adj"),
    )
    diff = canon(rebuilt).exceptAll(canon(fresh)).unionByName(
        canon(fresh).exceptAll(canon(rebuilt))
    )
    q = survivors.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    self_found = hnsw.search(
        rebuilt, q, k=1, metric="l2_sq", params=_HNSW_PARAMS
    ).where((F.col("query_id") == F.col("vec_id")) & (F.col("dist") == 0))
    return (
        emb.agg(F.count(F.lit(1)).cast("long").alias("n_before"))
        .crossJoin(rebuilt.agg(F.count(F.lit(1)).cast("long").alias("n_survivors")))
        .crossJoin(diff.agg(F.count(F.lit(1)).alias("_d")))
        .crossJoin(self_found.agg(F.count(F.lit(1)).cast("long").alias("n_self_found")))
        .select(
            "n_before",
            "n_survivors",
            F.lit(len(frag) > 0).alias("churn_detected"),
            (F.col("_d") == 0).alias("rebuild_matches_fresh"),
            "n_self_found",
        )
    )


HNSW_REBUILD_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(SUM(CASE WHEN vec_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       TRUE AS churn_detected,
       TRUE AS rebuild_matches_fresh,
       CAST(SUM(CASE WHEN vec_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_self_found
FROM embeddings
"""


def q_sketch_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch layer collapsed to one checkable row (functions/sketches.py
    — the sub-linear aggregates a 100 TB deployment runs instead of exact
    shuffles). Estimates themselves are engine-specific, so the row emits
    exact table-derived counts plus error-bound booleans the oracle can
    assert: HLL++ and the mergeable Datasketches pre-sketch→union path
    within rsd bounds of the exact distinct count, merged-KLL median
    within ±2% rank error, and the frequent-items top-k exactly equal to
    the true frequency table (key cardinality ≪ max_tracked ⇒ the sketch
    guarantees exactness). A bound violation flips a boolean and fails
    the hash — same gate design as the ANN invariant rows."""
    from hawk_pack_spark.functions import sketches as S

    ev = load_table(spark, "events", sf_dir)
    exact_users = ev.agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct_users")
    )
    hll = ev.agg(S.hll_count(F.col("user_id"), rsd=0.02).alias("_hll"))
    per_day = S.hll_presketch(
        ev.withColumn("day", F.to_date("ts")), "user_id", ["day", "event_type"]
    )
    merged = S.hll_merge_count(per_day).withColumnRenamed(
        "distinct_estimate", "_merged"
    )
    med = S.kll_merge_quantile(S.kll_presketch(
        ev.withColumn("day", F.to_date("ts")), "value", ["day"]
    ), 0.5).withColumnRenamed("quantile", "_med")
    # rank of the sketch median in the true value distribution
    rank = (
        ev.crossJoin(F.broadcast(med))
        .agg(
            (F.sum((F.col("value") <= F.col("_med")).cast("long"))
             / F.count(F.lit(1))).alias("_rank")
        )
    )
    hh = S.heavy_hitters(ev, "event_type", k=8)
    exact_freq = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    hh_diff = (
        hh.join(exact_freq, "event_type", "full_outer")
        .where(
            F.col("est_count").isNull()
            | F.col("exact_count").isNull()
            | (F.col("est_count") != F.col("exact_count"))
        )
    )
    bound = F.greatest(F.lit(3.0), F.lit(0.06) * F.col("exact_distinct_users"))
    return (
        ev.agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .crossJoin(exact_users)
        .crossJoin(hll)
        .crossJoin(merged)
        .crossJoin(rank)
        .crossJoin(hh_diff.agg(F.count(F.lit(1)).alias("_hhbad")))
        .select(
            "n_events",
            "exact_distinct_users",
            (F.abs(F.col("_hll") - F.col("exact_distinct_users")) <= bound
             ).alias("hll_within_bound"),
            (F.abs(F.col("_merged") - F.col("exact_distinct_users")) <= bound
             ).alias("presketch_merge_within_bound"),
            (F.abs(F.col("_rank") - 0.5) <= 0.02).alias("kll_median_rank_ok"),
            (F.col("_hhbad") == 0).alias("heavy_hitters_exact"),
        )
    )


SKETCH_SUMMARY_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
       TRUE AS hll_within_bound,
       TRUE AS presketch_merge_within_bound,
       TRUE AS kll_median_rank_ok,
       TRUE AS heavy_hitters_exact
FROM events
"""


# ---------------------------------------------------------------------------
# round-6 tail: the remaining classic TPC-H shapes expressible on this
# schema (no partsupp / commitdate / receiptdate / phone / container —
# q02/q09/q11/q12/q16/q20 are out; q07/q08/q10/q13/q15/q17/q21/q22 are
# adapted where a missing column forces it, with the adaptation noted).
# All follow the float-parity discipline at the top of this file.
# Broadcast policy: explicit hints ONLY on frames whose size is
# SF-invariant (nation=25, region=5, 1-row scalar aggregates) — customer/
# supplier/part scale with the data and are left to AQE, which broadcasts
# them at test SFs and shuffle-joins them at 100 TB.


def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional region-pair trade volume by year
    (nation pair adapted to region pair — at sf0.001 only 10 suppliers
    exist, so single-nation filters can be empty). Disjunctive pair
    predicate across two dimension joins; year extraction; decimal-exact
    revenue."""
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    nr = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", F.col("r_name").alias("rname"))
    supplier = load_table(spark, "supplier", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supp_r = supplier.join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("rname").alias("supp_region"))
    cust_r = cust.join(
        F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("rname").alias("cust_region"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_r, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust_r, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
            | ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
        )
        .groupBy(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("string").cast("double").alias("revenue"))
    )


Q07_SQL = """
WITH nr AS (
  SELECT n_nationkey, r_name AS rname FROM nation JOIN region ON n_regionkey = r_regionkey)
SELECT supp_region, cust_region, l_year,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM (
  SELECT sr.rname AS supp_region, cr.rname AS cust_region,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nr sr ON s_nationkey = sr.n_nationkey
  JOIN nr cr ON c_nationkey = cr.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND ((sr.rname = 'EUROPE' AND cr.rname = 'ASIA')
      OR (sr.rname = 'ASIA' AND cr.rname = 'EUROPE')))
GROUP BY supp_region, cust_region, l_year
"""


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per order-year share of PROMO-part volume to
    AMERICA customers that was supplied from EUROPE. Conditional-sum
    ratio over a 6-way join; both operands decimal-exact, one double
    division, round(6)."""
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    nr = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", F.col("r_name").alias("rname"))
    supplier = load_table(spark, "supplier", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supp_r = supplier.join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("rname").alias("supp_region"))
    cust_r = cust.join(
        F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("rname").alias("cust_region"))
    vol = _disc_price()
    zero = F.lit(0).cast("decimal(24,8)")
    return (
        li.join(part.where(F.col("p_type") == "PROMO"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_r, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust_r, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("cust_region") == "AMERICA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_region") == "EUROPE", vol).otherwise(zero)
                ).cast("string").cast("double")
                / F.sum(vol).cast("string").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


Q08_SQL = """
WITH nr AS (
  SELECT n_nationkey, r_name AS rname FROM nation JOIN region ON n_regionkey = r_regionkey)
SELECT o_year,
  ROUND(CAST(CAST(SUM(CASE WHEN supp_region = 'EUROPE' THEN vol
                      ELSE CAST(0 AS DECIMAL(24,8)) END) AS VARCHAR) AS DOUBLE)
        / CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year, sr.rname AS supp_region,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8)) AS vol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nr sr ON s_nationkey = sr.n_nationkey
  JOIN nr cr ON c_nationkey = cr.n_nationkey
  WHERE p_type = 'PROMO' AND cr.rname = 'AMERICA')
GROUP BY o_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    lineitems in a half-year of orders (phone/comment columns absent from
    the schema; acctbal kept). Join + filtered agg + deterministic
    top-k."""
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("string").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts via a
    predicated LEFT join (the comment NOT-LIKE filter adapted to
    o_orderpriority <> '1-URGENT' — the schema has no o_comment).
    Customers with zero qualifying orders land in the c_count=0 bucket."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier (the revenue
    view), then the supplier(s) whose revenue equals the scalar max —
    equality on decimal-exact doubles is engine-identical, so ties
    reproduce."""
    supplier = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast("string").cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(12,6))) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the per-part mean quantity) for one brand went
    unfilled (container predicate adapted to the p_brand filter alone —
    no p_container column). Correlated per-group average as groupBy +
    broadcast re-join."""
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    brand_parts = part.where(F.col("p_brand") == "Brand#12").select("p_partkey")
    li_b = li.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = li_b.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_qty")
    ).withColumnRenamed("l_partkey", "_pk")
    return (
        li_b.join(avg_qty, F.col("l_partkey") == F.col("_pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


Q17_SQL = """
WITH li_b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#12'),
avg_qty AS (
  SELECT l_partkey AS _pk,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS _avg_qty
  FROM li_b GROUP BY l_partkey)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
  AS avg_yearly
FROM li_b JOIN avg_qty ON l_partkey = _pk
WHERE l_quantity < 0.2 * _avg_qty
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT-EXISTS double correlation): in
    finalized multi-supplier orders, suppliers who were the ONLY supplier
    with returned items (the commitdate/receiptdate lateness predicate
    adapted to l_returnflag = 'R' — the schema carries no receipt dates).
    Spark renders the correlations as a hash semi-join and anti-join on
    the order key with a supplier-inequality residual."""
    supplier = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    cand = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "leftsemi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "leftanti",
    )
    return (
        cand.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar subquery + anti-join): above-average-
    balance customers with no urgent orders, by market segment (country
    code adapted to c_mktsegment — no c_phone column; the plain no-orders
    anti-join is empty on this data, so the anti side carries the
    priority predicate)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    thresh = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# round-6 tail: event-time streaming surface (streaming/windows.py) as
# DATA-LEVEL driver rows — the stream result is compared row-for-row
# against the batch SQL answer, not summarized into invariants.


def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve math, data-level (operators/layout.py
    `zorder_value` — the interleave behind `zorder_layout`'s
    multi-dimensional file clustering): the 20-bit z-value of
    (o_custkey mod 1024, epoch-day(o_orderdate) mod 1024) for every
    order, reproduced bit-for-bit by the oracle's unrolled shift/mask
    arithmetic. The pruning claim itself (a 2-D box filter touches
    fewer files under z-layout than a linear sort) is measured in
    tests/test_layout.py."""
    from hawk_pack_spark.operators.layout import zorder_value

    orders = load_table(spark, "orders", sf_dir)
    a = F.pmod(F.col("o_custkey"), F.lit(1024)).cast("long")
    b = F.pmod(
        F.floor(F.unix_timestamp("o_orderdate") / 86400), F.lit(1024)
    ).cast("long")
    return orders.select(
        "o_orderkey",
        a.alias("dim_cust"),
        b.alias("dim_day"),
        zorder_value([a, b], bits=10).alias("zval"),
    )


def _zorder_sql(bits: int = 10) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"(((dim_cust >> {j}) & 1) << {2 * j})")
        terms.append(f"(((dim_day >> {j}) & 1) << {2 * j + 1})")
    z = " | ".join(terms)
    return f"""
WITH dims AS (
  SELECT o_orderkey,
         CAST(o_custkey % 1024 AS BIGINT) AS dim_cust,
         CAST(CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT) % 1024
              AS BIGINT) AS dim_day
  FROM orders)
SELECT o_orderkey, dim_cust, dim_day, CAST({z} AS BIGINT) AS zval FROM dims
"""


ZORDER_SQL = _zorder_sql()


def _run_stream_to_memory(spark, tmp: str, build, name: str) -> DataFrame:
    """Shared availableNow → memory-sink harness for the streaming
    catalog rows. Asserts the query actually FINISHED before the caller
    reads the sink (and before the caller's finally removes {tmp}) — a
    timeout would otherwise silently return partial windows/sessions
    while executors still read the source."""
    schema = spark.read.parquet(f"{tmp}/src/b0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*")
    )
    q = (
        build(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(f"streaming catalog query {name} exceeded 600s")
    return spark.sql(f"SELECT * FROM {name}")


def q_streaming_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming/windows.py
    `windowed_event_counts`) ≡ the batch GROUP BY, row-for-row. The
    events table streams as three micro-batches split on event time (so
    the watermark advances monotonically and no real row is ever late),
    plus a far-future sentinel batch that pushes the watermark past every
    real window; append mode then emits each window exactly once. The
    1-hour/30-minute watermark pipeline is the one a 100 TB event
    pipeline runs; late-drop semantics are pinned separately in
    tests/test_streaming_windows.py."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.windows import windowed_event_counts

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    split = "2024-01-16 00:00:00"
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_win_")
    try:
        ev.where(F.col("ts") < F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b0")
        ev.where(F.col("ts") >= F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b1")
        sentinel = ev.limit(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.lit(max_ts) + F.expr("INTERVAL 2 HOURS")).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
        )
        sentinel.coalesce(1).write.parquet(f"{tmp}/src/b2")
        out = _run_stream_to_memory(
            spark,
            tmp,
            lambda st: windowed_event_counts(
                st, window="1 hour", watermark="30 minutes"
            ),
            "hps_stream_win_q",
        )
        return out.where(F.col("event_type") != "__sentinel__")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_WINDOWS_SQL = """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS win_start,
       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 + 3600 AS win_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro
FROM events
GROUP BY 1, 2, 3
"""


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization (streaming/windows.py
    `sessionize_stream`: applyInPandasWithState + EventTimeTimeout) ≡
    the batch lag/cumsum sessionization, row-for-row. Events stream as
    two event-time halves (cross-batch open-session state carried
    between them) plus two sentinel batches whose watermark advance
    fires the event-time timeout that closes every remaining open
    session. Gap = 6 hours."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.windows import sessionize_stream

    gap = 21600
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    split = "2024-01-16 00:00:00"
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_sess_")
    try:
        ev.where(F.col("ts") < F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b0")
        ev.where(F.col("ts") >= F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b1")
        for i, hours in enumerate([gap // 3600 + 1, 2 * (gap // 3600) + 2]):
            ev.limit(1).select(
                F.lit(-1 - i).cast("long").alias("event_id"),
                (F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS")).alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("__sentinel__").alias("event_type"),
                F.lit(0.0).alias("value"),
            ).coalesce(1).write.parquet(f"{tmp}/src/s{i}")
        out = _run_stream_to_memory(
            spark,
            tmp,
            lambda st: sessionize_stream(st, gap_seconds=gap),
            "hps_stream_sess_q",
        )
        return out.where(F.col("user_id") >= 0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 21600
         THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, sec,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
)
SELECT user_id, MIN(sec) AS sess_start, MAX(sec) AS sess_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sess_id
"""


def q_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/joins.py
    `attribution_join_stream`: watermarked two-sided-bounded inner join
    chained into a windowed per-purchase aggregation) ≡ the batch
    range-join aggregation, row-for-row. The events table streams as two
    event-time halves; sentinel batches carry BOTH a point and a
    purchase row (the global watermark is the min across the two
    watermarked sides) under non-joining users, pushing every
    aggregation window closed."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.joins import attribution_join_stream

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    split = "2024-01-16 00:00:00"
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_attr_")
    try:
        ev.where(F.col("ts") < F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b0")
        ev.where(F.col("ts") >= F.lit(split).cast("timestamp")).coalesce(
            1
        ).write.parquet(f"{tmp}/src/b1")
        for i, hours in enumerate([2, 4]):
            base = ev.limit(1)
            pt = base.select(
                F.lit(-1 - 2 * i).cast("long").alias("event_id"),
                (F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS")).alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("click").alias("event_type"),
                F.lit(0.0).alias("value"),
            )
            pu = base.select(
                F.lit(-2 - 2 * i).cast("long").alias("event_id"),
                (F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS")).alias("ts"),
                F.lit(-2).cast("long").alias("user_id"),
                F.lit("purchase").alias("event_type"),
                F.lit(0.0).alias("value"),
            )
            pt.unionByName(pu).coalesce(1).write.parquet(f"{tmp}/src/s{i}")
        out = _run_stream_to_memory(
            spark,
            tmp,
            lambda st: attribution_join_stream(st, window_s=900),
            "hps_stream_attr_q",
        )
        return out.where(F.col("purchase_id") >= 0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_ATTRIBUTION_SQL = """
WITH pts AS (
  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
         CAST(ROUND(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE event_type IN ('click', 'view')
), pur AS (
  SELECT event_id AS purchase_id, user_id AS p_user,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS p_sec
  FROM events WHERE event_type = 'purchase'
)
SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_follow,
       CAST(SUM(vm) AS BIGINT) AS sum_value_micro
FROM pts JOIN pur ON pts.user_id = pur.p_user
  AND pts.sec >= pur.p_sec AND pts.sec < pur.p_sec + 900
GROUP BY purchase_id
"""


def q_streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming exact dedup (streaming/joins.py
    `dedup_exact_stream` = dropDuplicatesWithinWatermark): the events
    table streams twice — a full batch, then a full REPLAY batch — and
    the replay is dropped key-for-key because every event_id is still
    inside the watermark horizon (sized to cover the replay window, the
    documented contract). Output ≡ SELECT DISTINCT of the table."""
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.joins import dedup_exact_stream

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    tmp = tempfile.mkdtemp(prefix="hps_q_stream_dedup_")
    try:
        ev.coalesce(1).write.parquet(f"{tmp}/src/b0")
        ev.coalesce(1).write.parquet(f"{tmp}/src/b1")  # full replay
        return _run_stream_to_memory(
            spark,
            tmp,
            lambda st: dedup_exact_stream(
                st, ("event_id",), watermark="40 days"
            ).select("event_id", "user_id", "event_type"),
            "hps_stream_dedup_q",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_DEDUP_SQL = """
SELECT event_id, user_id, event_type FROM events
"""


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




# ---------------------------------------------------------------------------
# round-8 additions: canonical-doc selection, hard-negative mining,
# per-domain token-budget sampling — the three curation decisions a
# pretraining pipeline makes after gates/dedup, each data-level.


def q_neardup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection on top of near-dup clustering
    (operators/components.py keep_best_per_cluster): every doc gets its
    MinHash-LSH cluster plus a flag marking the highest-quality member
    (quality = n_chars here; ties break on lowest doc_id). The
    retention policy real pipelines want: keep the BEST duplicate, not
    the min-id one. Same capped pair generation as minhash_near_dup, so
    the oracle reuses the dedup_clusters recursive-CTE closure."""
    from hawk_pack_spark.operators.components import keep_best_per_cluster
    from hawk_pack_spark.operators.dedup import minhash_near_dup

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_near_dup(
        docs, num_hashes=8, bands=4, threshold=0.9, max_bucket=20
    )
    out = keep_best_per_cluster(pairs, docs, "n_chars")
    return out.select("doc_id", "cluster", "canonical")


def _neardup_canonical_sql() -> str:
    minhash = _minhash_capped_sql().strip()
    return f"""
WITH RECURSIVE pairs AS ({minhash}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, LEAST(MIN(b), a) AS component FROM reach GROUP BY a
),
lab AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(comp.component, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
)
SELECT doc_id, cluster,
  (ROW_NUMBER() OVER (PARTITION BY cluster
                      ORDER BY n_chars DESC, doc_id ASC) = 1) AS canonical
FROM lab
"""


def q_hard_negatives_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (operators/retrieval.py
    hard_negatives): per anchor, the 5 nearest vectors whose label
    differs from the anchor's — the boundary negatives an embedding
    trainer mines after each epoch. Exact path is the oracle; the
    per-anchor dynamic label predicate fuses into the broadcast scan
    (corpus side never shuffles)."""
    from hawk_pack_spark.operators.retrieval import hard_negatives

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    anchors = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    out = hard_negatives(emb, anchors, k=5)
    return out.select(
        "anchor_id", "vec_id", "label",
        F.round(F.col("dist"), 6).alias("dist"), "rank",
    )


HARD_NEGATIVES_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS anchor_id, v AS qv, label AS al FROM e WHERE vec_id < 10),
d AS (
  SELECT anchor_id, e.vec_id, e.label,
    list_sum(list_transform(range(1, 65), i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e WHERE e.label <> q.al
), r AS (
  SELECT anchor_id, vec_id, label, dist,
    ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT anchor_id, vec_id, label, ROUND(dist, 6) AS dist, rank FROM r WHERE rank <= 5
"""


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget sampling (functions/curation.py
    sample_to_token_budget): within each source, docs ordered by the
    derandomized Knuth-hash key are kept while the running token count
    stays within 500 — 'N tokens per domain', the mixing contract a
    pretraining run actually specifies (rate gates overshoot on
    long-doc domains). Fully deterministic: same corpus on any retry,
    replay, or partitioning."""
    from hawk_pack_spark.functions.curation import sample_to_token_budget

    docs = load_table(spark, "documents", sf_dir)
    out = sample_to_token_budget(docs, budget_tokens=500,
                                 stratum_col="source")
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


TOKEN_BUDGET_SQL = """
WITH d AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x != '')) AS BIGINT) AS n_tokens,
    ((doc_id % 2147483647) * 2654435761) % 4294967291 AS h
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM d
)
SELECT doc_id, source, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 500
"""




def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (operators/packing.py chunk_documents):
    32-token chunks, 4-token overlap — the windowing stage before
    packing. Pure column algebra (tokenize once, posexplode a stride
    sequence, slice+join); fan-out bounded by document length."""
    from hawk_pack_spark.operators.packing import chunk_documents

    docs = load_table(spark, "documents", sf_dir)
    out = chunk_documents(docs, chunk_tokens=32, overlap=4)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk_text",
        "n_tokens",
    )


CHUNK_DOCS_SQL = """
WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents
), n AS (
  SELECT doc_id, ts, len(ts) AS nt FROM t
), st AS (
  SELECT doc_id, ts, nt,
    unnest(generate_series(0, greatest(nt - 4 - 1, 0), 28)) AS start
  FROM n
)
SELECT doc_id,
  CAST(start / 28 AS BIGINT) AS chunk_id,
  array_to_string(list_slice(ts, start + 1, start + 32), ' ') AS chunk_text,
  CAST(least(32, nt - start) AS BIGINT) AS n_tokens
FROM st
"""







def q_ivf_manifest_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-family restartable-serving story as one driver row (the
    IVF analog of serving_restart_dispatch; graph_io.py save_ivf_index/
    load_ivf_index): build IVF-SQ8 over the embeddings, persist the
    serving unit (cell-partitioned codes + routing/quantizer model),
    reload, and search through the LOADED bundle. Booleans computed
    live; any violation flips one and fails the hash:
    - rows_equal_ok: loaded-bundle search returns EXACTLY the in-memory
      search's (query, vec, rank) rows (re-ranked, so dist ties too);
    - pruned_ok: the loaded scan is partition-pruned to the probed
      cells (PartitionFilters — the mechanism cluster scan pruning
      consumes, asserted on the EXECUTED plan);
    - kind_ok: the quantizer model survives the round-trip.
    Reference analog: GraphPg's restartable-store premise
    (graph_pg.rs:24-50) applied to the cell-pruned index family."""
    import shutil
    import tempfile

    from hawk_pack_spark.operators.pq import ivfsq8_build, ivfsq8_search
    from hawk_pack_spark.sources.graph_io import (
        load_ivf_index,
        save_ivf_index,
    )

    vecs = _embeddings_vectors(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    encoded, centers, lo, scale = ivfsq8_build(vecs, n_clusters=8)
    direct = ivfsq8_search(
        encoded, centers, lo, scale, queries, kth=5, nprobe=4,
        rerank_with=vecs,
    )
    mdir = tempfile.mkdtemp(prefix="hawk_ivf_manifest_cat_")
    try:
        save_ivf_index(mdir, encoded, centers, "ivfsq8", lo=lo, scale=scale)
        idx = load_ivf_index(spark, mdir)
        reloaded = idx.search(queries, k=5, nprobe=4, rerank_with=vecs)
        rows = lambda df: {  # noqa: E731
            (r.query_id, r.vec_id, r.rank) for r in df.collect()
        }
        a, b = rows(direct), rows(reloaded)
        rows_equal_ok = bool(a) and a == b
        plan = reloaded._jdf.queryExecution().executedPlan().toString()
        pruned_ok = "PartitionFilters: [" in plan and "cell" in plan
        kind_ok = idx.kind == "ivfsq8" and idx.lo is not None
    finally:
        shutil.rmtree(mdir, ignore_errors=True)
    return spark.createDataFrame(
        [(len(a), bool(rows_equal_ok), bool(pruned_ok), bool(kind_ok))],
        "n_results long, rows_equal_ok boolean, pruned_ok boolean, kind_ok boolean",
    )


IVF_MANIFEST_SQL = """
SELECT CAST(40 AS BIGINT) AS n_results, TRUE AS rows_equal_ok,
       TRUE AS pruned_ok, TRUE AS kind_ok
"""


def q_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded JL random projection as one invariant row (operators/
    linalg.py random_project): 64-d embeddings project to 16-d with a
    seed-deterministic Gaussian basis. Booleans computed live:
    - deterministic_ok: two independent runs (same seed) produce
      IDENTICAL projected rows — the executor-identical-basis contract;
    - dims_ok: every output vector has exactly 16 dims;
    - ratio_ok: mean pairwise L2² among a fixed 40-vector sample is
      preserved in expectation — projected/original ratio within
      [0.6, 1.4] (JL scaling 1/√out_dim; wide bound because one seed is
      one draw, the in-expectation contract is tested statistically in
      tests/test_linalg.py over seeds)."""
    import numpy as np

    from hawk_pack_spark.operators.linalg import random_project

    vecs = _embeddings_vectors(spark, sf_dir).where(F.col("vec_id") < 40)
    p1 = random_project(vecs, 16, seed=7).select("vec_id", "proj")
    p2 = random_project(vecs, 16, seed=7).select("vec_id", "proj")
    r1 = {r.vec_id: tuple(r.proj) for r in p1.collect()}
    r2 = {r.vec_id: tuple(r.proj) for r in p2.collect()}
    deterministic_ok = r1 == r2 and len(r1) > 0
    dims_ok = all(len(v) == 16 for v in r1.values())
    orig = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in vecs.select("vec_id", "embedding").collect()}
    ids = sorted(orig)
    om = np.array([orig[i] for i in ids])
    pm = np.array([r1[i] for i in ids])
    d_o = ((om[:, None, :] - om[None, :, :]) ** 2).sum(-1)
    d_p = ((pm[:, None, :] - pm[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(len(ids), 1)
    ratio = float(d_p[iu].mean() / d_o[iu].mean())
    ratio_ok = 0.6 <= ratio <= 1.4
    return spark.createDataFrame(
        [(len(r1), bool(deterministic_ok), bool(dims_ok), bool(ratio_ok))],
        "n_vectors long, deterministic_ok boolean, dims_ok boolean, ratio_ok boolean",
    )


RANDOM_PROJECTION_SQL = """
SELECT CAST(40 AS BIGINT) AS n_vectors, TRUE AS deterministic_ok,
       TRUE AS dims_ok, TRUE AS ratio_ok
"""


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
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
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
    g = knn_join(emb, k=k, nprobe=10, replicas=3, descent_rounds=1, dim=64)
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
    cand = knn_exact(emb, anchors, k=24, metric="cosine").select(
        "query_id",
        "vec_id",
        (F.lit(1.0) - F.col("dist")).alias("rel"),
        "rank",
    ).join(emb, "vec_id")
    picked = mmr_rerank(cand, k=8, lam=0.5)
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


def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-geometry diagnostic (linalg.label_centroid_similarity):
    pairwise cosine between per-label centroid embeddings — exact
    decimal per-(label,dim) sums, dim-sorted cosine folds, bounded
    labels² pair join. Data-level, one row per unordered label
    pair."""
    from hawk_pack_spark.operators.linalg import label_centroid_similarity

    emb = _embeddings_vectors(spark, sf_dir).join(
        load_table(spark, "embeddings", sf_dir).select("vec_id", "label"),
        "vec_id",
    )
    # bounded pair count for the driver row: 8 labels -> 28 pairs
    sub = emb.where(F.col("label") < 8)
    return label_centroid_similarity(sub, "label", "embedding")


CENTROID_SIM_SQL = """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings WHERE label < 8),
pd AS (
  SELECT label, i.d AS d,
         CAST(SUM(CAST(ROUND(v[i.d] * 1000000) AS BIGINT) ) AS BIGINT)
           AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e, (SELECT UNNEST(range(1, 65)) AS d) i
  GROUP BY 1, 2),
m AS (
  SELECT label,
         list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY d) AS ml
  FROM pd GROUP BY 1),
p AS (
  SELECT a.label AS label_a, b.label AS label_b, a.ml AS ma, b.ml AS mb
  FROM m a JOIN m b ON a.label < b.label)
SELECT label_a, label_b,
  ROUND(
    list_reduce(list_prepend(0.0,
      list_transform(range(1, 65), i -> ma[i] * mb[i])), (x, y) -> x + y)
    / (SQRT(list_reduce(list_prepend(0.0,
         list_transform(ma, x -> x * x)), (x, y) -> x + y))
       * SQRT(list_reduce(list_prepend(0.0,
           list_transform(mb, x -> x * x)), (x, y) -> x + y))), 6)
    AS cosine
FROM p
"""


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (analytics.rfm_segments): every ordering
    customer scored 1-5 per dimension against nearest-rank quintile
    thresholds (broadcast 12-value row, comparison projection),
    segment = 100R+10F+M. Exact integer days/counts/cents.
    Data-level, one row per customer."""
    from hawk_pack_spark.operators.analytics import rfm_segments

    orders = load_table(spark, "orders", sf_dir)
    gmax = orders.agg(F.max(F.to_date("o_orderdate")).alias("_g"))
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("bigint")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "custkey",
            F.datediff("_g", "_last").cast("bigint").alias("recency"),
            "frequency",
            "monetary",
        )
    )
    return rfm_segments(per_cust, "custkey", "recency", "frequency", "monetary")


RFM_SQL = """
WITH g AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS gm FROM orders),
pc AS (
  SELECT o_custkey AS custkey,
         CAST(g.gm - MAX(CAST(o_orderdate AS DATE)) AS BIGINT) AS recency,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary
  FROM orders, g GROUP BY 1, g.gm),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pc),
th AS (
  SELECT
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(20 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r20,
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(40 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r40,
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(60 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r60,
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(80 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r80,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(20 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f20,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(40 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f40,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(60 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f60,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(80 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f80,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(20 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m20,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(40 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m40,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(60 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m60,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(80 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m80
  FROM (SELECT pc.*,
          ROW_NUMBER() OVER (ORDER BY recency, custkey) AS rr,
          ROW_NUMBER() OVER (ORDER BY frequency, custkey) AS rf,
          ROW_NUMBER() OVER (ORDER BY monetary, custkey) AS rm
        FROM pc), n),
s AS (
  SELECT pc.custkey, pc.recency, pc.frequency, pc.monetary,
    1 + CAST(recency < r20 AS INT) + CAST(recency < r40 AS INT)
      + CAST(recency < r60 AS INT) + CAST(recency < r80 AS INT) AS rs,
    1 + CAST(frequency > f20 AS INT) + CAST(frequency > f40 AS INT)
      + CAST(frequency > f60 AS INT) + CAST(frequency > f80 AS INT) AS fs,
    1 + CAST(monetary > m20 AS INT) + CAST(monetary > m40 AS INT)
      + CAST(monetary > m60 AS INT) + CAST(monetary > m80 AS INT) AS ms
  FROM pc, th)
SELECT custkey, recency, frequency, monetary,
       CAST(rs AS INTEGER) AS r_score, CAST(fs AS INTEGER) AS f_score,
       CAST(ms AS INTEGER) AS m_score,
       CAST(rs * 100 + fs * 10 + ms AS INTEGER) AS segment
FROM s
"""


def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix diagnostic (bm25.vocab_overlap): pairwise
    token-vocabulary Jaccard between sources — one (class, token)
    DISTINCT reduction, token-keyed self-join, exact integer counts.
    Data-level, one row per unordered source pair."""
    from hawk_pack_spark.operators.bm25 import vocab_overlap

    docs = load_table(spark, "documents", sf_dir)
    return vocab_overlap(docs, "source")


VOCAB_OVERLAP_SQL = r"""
WITH v AS MATERIALIZED (
  SELECT DISTINCT source AS c,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                t -> t != '')) AS t
  FROM documents),
sz AS MATERIALIZED (SELECT c, CAST(COUNT(*) AS BIGINT) AS sz
                    FROM v GROUP BY 1),
i AS (
  SELECT a.c AS class_a, b.c AS class_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM v a JOIN v b ON a.t = b.t AND a.c < b.c
  GROUP BY 1, 2)
SELECT i.class_a, i.class_b, i.n_common,
       sa.sz + sb.sz - i.n_common AS n_union,
       ROUND(CAST(i.n_common AS DOUBLE)
             / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE), 6) AS jaccard
FROM i JOIN sz sa ON i.class_a = sa.c JOIN sz sb ON i.class_b = sb.c
"""


def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (asof.asof_join_forward): for every error
    event, the value of the same user's NEXT purchase at-or-after it
    (NULL if none) — the look-ahead dual of asof_last_purchase, same
    union + ordered-window carry (one shuffle, no range crossJoin).
    Data-level, one row per error event."""
    from hawk_pack_spark.operators.asof import asof_join_forward

    ev = load_table(spark, "events", sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join_forward(errors, purchases, "user_id")
    return out.select(
        "event_id", "user_id", F.round("asof_value", 6).alias("asof_value")
    )


# Tie-explicit (ADVICE r9): asof_join_forward deterministically picks the
# SMALLEST value tuple among equal-(key, ts) right rows, while DuckDB's
# native ASOF leaves duplicate-right-timestamp ties unspecified. Reducing
# the right side to MIN(value) per (user_id, ts) BEFORE the ASOF join makes
# the oracle's tie rule identical to the operator's without changing which
# timestamp matches — parity no longer depends on the fixture having
# unique (user_id, ts) purchases.
ASOF_FWD_SQL = """
SELECT e.event_id, e.user_id, ROUND(p.value, 6) AS asof_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT user_id, ts, MIN(value) AS value FROM events
                WHERE event_type = 'purchase' GROUP BY user_id, ts) p
  ON e.user_id = p.user_id AND p.ts >= e.ts
"""


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


_STABLE_SPECS: dict[str, QuerySpec] = {
    # -- round-5 driver-gate block first: components that were
    # pytest-only through r4 earn their driver rows this round.
    "hnsw_rebuild_churned": QuerySpec(q_hnsw_rebuild_churned, HNSW_REBUILD_SQL, "churn detect (degree band) + shard rebuild ≡ fresh build, full self-recall"),
    "jdbc_upsert": QuerySpec(q_jdbc_upsert, JDBC_UPSERT_SQL, "row-level JDBC upsert (ON CONFLICT/MERGE): delta updates in place, untouched rows retained"),
    "graph_bulk_import": QuerySpec(q_graph_bulk_import, GRAPH_BULK_IMPORT_SQL, "GraphMem::from_precomputed: bulk links import, snapshot + search identity"),
    "nfc_normalize_docs": QuerySpec(q_nfc_normalize_docs, NFC_NORMALIZE_SQL, "Unicode NFC normalization, data-level parity vs DuckDB nfc_normalize"),
    "alg4_clustered_connectivity": QuerySpec(q_alg4_clustered_connectivity, ALG4_CLUSTERED_SQL, "Algorithm 4 on clustered near-dups: degree bounds + zero unreachable islands"),
    "bpe_vocab": QuerySpec(q_bpe_vocab, BPE_VOCAB_SQL, "BPE training: driver-loop ≡ distributed no-collect trainer + segmentation identity"),
    "op_stream_digest": QuerySpec(q_op_stream_digest, OP_STREAM_SQL, "coroutine op-stream protocol digest (GetEntryPoint → triads → SearchResult)"),
    "streaming_ingest_counts": QuerySpec(q_streaming_ingest_counts, STREAMING_INGEST_SQL, "Structured-Streaming micro-batch ingest through the is_match dedup gate"),
    "jdbc_roundtrip": QuerySpec(q_jdbc_roundtrip, JDBC_ROUNDTRIP_SQL, "GraphPg two-table layout over live JDBC (Derby): exact links+entries roundtrip"),
    "bm25_topk": QuerySpec(q_bm25_topk, BM25_SQL, "BM25 retrieval (postings + broadcast query join)"),
    "sketch_summary": QuerySpec(q_sketch_summary, SKETCH_SUMMARY_SQL, "mergeable sketches (HLL presketch-union, KLL merged median, frequent-items) within published error bounds"),
    # -- round-2 front block: entries that were unchecked (or whose
    # implementation changed) go FIRST so the driver's 50-entry
    # correctness window records them; every entry is oracle-backed.
    "minhash_near_dup": QuerySpec(q_minhash_near_dup, _minhash_capped_sql(), "MinHash-LSH near-dup (bucket-capped scale defaults)"),
    "simhash_groups": QuerySpec(q_simhash_groups, _simhash_sql(), "SimHash dedup groups (60-bit)"),
    "ngram_jaccard_pairs": QuerySpec(q_ngram_jaccard, NGRAM_JACCARD_CAPPED_SQL, "n-gram Jaccard similarity join (df-capped scale defaults)"),
    "dedup_clusters": QuerySpec(q_dedup_clusters, _dedup_clusters_sql(), "near-dup connected components"),
    "lsh_hamming_pairs": QuerySpec(q_lsh_hamming_pairs, LSH_HAMMING_SQL, "Hamming-LSH banded near pairs"),
    "hnsw_self_recall": QuerySpec(q_hnsw_self_recall, HNSW_SELF_RECALL_SQL, "HNSW self-recall invariant (flagship)"),
    "hnsw_links_stats": QuerySpec(q_hnsw_links_stats, HNSW_LINKS_STATS_SQL, "HNSW graph degree/membership invariants"),
    "hnsw_search_l2": QuerySpec(q_hnsw_search_l2, HNSW_SEARCH_SUMMARY_SQL, "sharded HNSW ANN search vs exact recall"),
    "hnsw_serving_search_l2": QuerySpec(q_hnsw_serving_search_l2, HNSW_SERVING_SUMMARY_SQL, "serving-path (broadcast-query, zero-shuffle) search ≡ cogroup path + recall gate"),
    "serving_restart_dispatch": QuerySpec(q_serving_restart_dispatch, SERVING_RESTART_SQL, "manifest save→load→ann_search: restartable serving unit + frozen-CSR rehydration + dispatch front door, path and row equality asserted live"),
    "ivfpq_ann_l2": QuerySpec(q_ivfpq_ann_l2, PQ_SUMMARY_SQL, "IVF-PQ (residual codebooks, routed ADC, exact re-rank): the byte-budgeted partition-prunable index vs exact kNN"),
    "hnsw_insert_roundtrip": QuerySpec(q_hnsw_insert_roundtrip, HNSW_INSERT_SQL, "two-phase batch insert + is_match dedup gate as one invariant row"),
    "hnsw_delete_repair": QuerySpec(q_hnsw_delete_repair, HNSW_DELETE_SQL, "exact delete + bridge repair: no dangling edges, degree bounds, survivor self-recall"),
    "graph_rekey_roundtrip": QuerySpec(q_graph_rekey_roundtrip, GRAPH_REKEY_SQL, "GraphMem::from_another re-key bijection roundtrip + dist-map hook as one invariant row"),
    "ivf_ann_l2": QuerySpec(q_ivf_ann_l2, IVF_SUMMARY_SQL, "IVF bucketed ANN vs exact recall"),
    "pq_ann_l2": QuerySpec(q_pq_ann_l2, PQ_SUMMARY_SQL, "product-quantized ANN + re-rank vs exact recall"),
    "multimodal_pipeline": QuerySpec(q_multimodal_pipeline, MULTIMODAL_SQL, "binary media -> features -> frames -> ANN loop"),
    "knn_exact_cosine_dot": QuerySpec(q_knn_exact_cosine_dot, _knn_cos_dot_sql(), "exact kNN, cosine + MIPS"),
    "doc_fingerprint": QuerySpec(q_doc_fingerprint, Q_FP_SQL, "set + rolling doc fingerprints"),
    # -- round-2 curation block: published training-data pipeline stages
    # (Gopher repetition gate, GPT-3 decontamination, mixing weights,
    # context-window packing) — new this round, so driver-window front.
    "doc_repetition": QuerySpec(q_doc_repetition, REPETITION_SQL, "Gopher word-ngram repetition gate"),
    "decontaminate_ngrams": QuerySpec(q_decontaminate_ngrams, DECONTAMINATE_SQL, "eval-set n-gram decontamination"),
    "stratified_sample": QuerySpec(q_stratified_sample, STRATIFIED_SQL, "deterministic hash-gate domain mixing"),
    "pack_sequences": QuerySpec(q_pack_sequences, PACK_SQL, "greedy context-window packing (applyInPandas vs recursive CTE)"),
    "semdedup_near_dup": QuerySpec(q_semdedup_near_dup, SEMDEDUP_SQL, "SemDeDup cluster-pruned near-dup vs exact (planted twins)"),
    "quality_classifier": QuerySpec(q_quality_classifier, QUALITY_CLASSIFIER_SQL, "model-based quality gate (LR distillation, planted spam)"),
    "pii_scrub": QuerySpec(q_pii_scrub, PII_SCRUB_SQL, "PII redaction audit (planted email/phone/ipv4, zero residual)"),
    "perplexity_filter": QuerySpec(q_perplexity_filter, PERPLEXITY_SQL, "CCNet perplexity filter (add-1 bigram LM, micro-nat accounting)"),
    "training_data_pipeline": QuerySpec(q_training_data_pipeline, TRAINING_PIPELINE_SQL, "end-to-end funnel: gates -> decontaminate -> dedup -> sample -> pack"),
    # -- round-6 tail: remaining expressible TPC-H shapes + the
    # event-time streaming surface as data-level rows.
    "q07_volume_shipping": QuerySpec(q07_volume_shipping, Q07_SQL, "TPC-H Q7 shape: bidirectional region-pair volume by year"),
    "q08_market_share": QuerySpec(q08_market_share, Q08_SQL, "TPC-H Q8 shape: conditional-sum market-share ratio per year"),
    "q10_returned_items": QuerySpec(q10_returned_items, Q10_SQL, "TPC-H Q10 shape: top-20 customers by returned revenue"),
    "q13_customer_distribution": QuerySpec(q13_customer_distribution, Q13_SQL, "TPC-H Q13 shape: predicated left join order-count distribution"),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL, "TPC-H Q15 shape: revenue view + scalar-max tie-exact select"),
    "q17_small_qty_revenue": QuerySpec(q17_small_qty_revenue, Q17_SQL, "TPC-H Q17 shape: correlated per-part average quantity gate"),
    "q21_waiting_supplier": QuerySpec(q21_waiting_supplier, Q21_SQL, "TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation"),
    "q22_dormant_customers": QuerySpec(q22_dormant_customers, Q22_SQL, "TPC-H Q22 shape: scalar-avg subquery + predicated anti-join"),
    "streaming_event_windows": QuerySpec(q_streaming_event_windows, STREAMING_WINDOWS_SQL, "watermarked tumbling windows (append mode, exactly-once emission) ≡ batch GROUP BY, data-level"),
    "streaming_sessionize": QuerySpec(q_streaming_sessionize, STREAMING_SESSIONIZE_SQL, "stateful streaming sessionization (applyInPandasWithState + event-time timeout) ≡ batch lag/cumsum, data-level"),
    "streaming_attribution": QuerySpec(q_streaming_attribution, STREAMING_ATTRIBUTION_SQL, "stream-stream interval join chained into windowed per-purchase agg ≡ batch range join, data-level"),
    "streaming_dedup_exact": QuerySpec(q_streaming_dedup_exact, STREAMING_DEDUP_SQL, "dropDuplicatesWithinWatermark: full replay batch dropped key-for-key ≡ SELECT DISTINCT, data-level"),
    "sq8_ann_l2": QuerySpec(q_sq8_ann_l2, PQ_SUMMARY_SQL, "SQ8 scalar-quantized ANN (4x codes, asymmetric scan, exact re-rank) vs exact recall"),
    "ivfsq8_ann_l2": QuerySpec(q_ivfsq8_ann_l2, PQ_SUMMARY_SQL, "IVF-SQ8 (residual scalar quantization, cell-pruned scan, exact re-rank): shape-independent recall in IVF-PQ's prunable layout"),
    "zorder_values": QuerySpec(q_zorder_values, ZORDER_SQL, "Z-order (Morton) curve values for multi-dim file clustering, bit-for-bit data-level"),
    # -- stable block: unchanged r01-green queries, original order.
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, Q01_SQL, "TPC-H Q1 shape"),
    "q04_order_priority": QuerySpec(q04_order_priority, Q04_SQL, "EXISTS semi-join counts"),
    "q06_revenue_forecast": QuerySpec(q06_revenue_forecast, Q06_SQL, "pushdown filter + global agg"),
    "q14_promo_revenue_share": QuerySpec(q14_promo_revenue_share, Q14_SQL, "conditional-agg ratio"),
    "q18_large_orders": QuerySpec(q18_large_orders, Q18_SQL, "HAVING subquery + 3-way join"),
    "q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, Q19_SQL, "disjunctive predicate join"),
    "cube_order_stats": QuerySpec(q_cube_order_stats, CUBE_SQL, "full CUBE grouping sets"),
    "top_supplier_per_nation": QuerySpec(q_top_supplier_per_nation, TOP_SUPPLIER_SQL, "correlated scalar max"),
    "q03_shipping_priority": QuerySpec(q03_shipping_priority, Q03_SQL, "3-way join + top-10"),
    "q05_local_supplier_volume": QuerySpec(q05_local_supplier_volume, Q05_SQL, "6-way star join"),
    "top3_orders_per_customer": QuerySpec(q_top3_orders_per_customer, Q_TOP3_SQL, "group-wise top-k (queue semantics)"),
    "asof_last_purchase": QuerySpec(q_asof_last_purchase, ASOF_SQL, "backward as-of join"),
    "purchase_window_attribution": QuerySpec(q_purchase_window_attribution, RANGE_JOIN_SQL, "binned range join"),
    "parts_above_brand_avg": QuerySpec(q_parts_above_brand_avg, ABOVE_AVG_SQL, "correlated-avg filter"),
    "events_type_stats_salted": QuerySpec(q_events_type_stats_salted, SALTED_AGG_SQL, "skew-safe salted aggregation"),
    "events_json": QuerySpec(q_events_json, Q_EVENTS_JSON_SQL, "JSON extraction"),
    "session_window_stats": QuerySpec(q_session_window_stats, SESSION_WINDOW_SQL, "built-in session_window"),
    "sliding_window_counts": QuerySpec(q_sliding_window_counts, SLIDING_SQL, "sliding windows"),
    "doc_token_stats": QuerySpec(q_doc_token_stats, Q_TOKEN_SQL, "tokenization"),
    "lang_id": QuerySpec(q_lang_id, Q_LANG_SQL, "language ID heuristic"),
    "customer_running_totals": QuerySpec(q_customer_running_totals, RUNNING_SQL, "running/moving/lag windows"),
    "nation_name_fuzzy_pairs": QuerySpec(q_nation_name_fuzzy_pairs, FUZZY_SQL, "Levenshtein fuzzy pairs"),
    "exact_dedup_docs": QuerySpec(q_exact_dedup_docs, Q_DEDUP_SQL, "exact dedup"),
    "curation_pipeline": QuerySpec(q_curation_pipeline, CURATION_SQL, "quality->dedup->stats composition"),
    "doc_hash_embedding_knn": QuerySpec(q_doc_hash_embedding_knn, HASH_EMB_SQL, "text->vector featurization + kNN"),
    "knn_exact_l2": QuerySpec(q_knn_exact_l2, KNN_L2_SQL, "LinearDb exact kNN, L2"),
    "simhash_hamming_knn": QuerySpec(q_simhash_hamming_knn, SIMHASH_KNN_SQL, "Hamming kNN on sign codes"),
    "hamming_scan_topk": QuerySpec(q_hamming_scan_topk, HAMMING_SCAN_SQL, "the 100M-scale tiled LUT-popcount scan kernel vs the brute-force SQL answer, exact"),
    "custom_metric_knn": QuerySpec(q_custom_metric_knn, CUSTOM_METRIC_SQL, "register_metric (VectorStore-trait UDF surface): user L1 metric through exact kNN, data-level"),
    "dup_gate_batch": QuerySpec(q_dup_gate_batch, DUP_GATE_SQL, "cross-shard + intra-batch exact-dup gate on insert_batch; serving and cogroup gates agree"),
    "streaming_durable_resume": QuerySpec(q_streaming_durable_resume, STREAMING_DURABLE_SQL, "durable near-dup band store: restart equals continuation, re-sent dups rejected by rehydrated store"),
    "streaming_delta_jdbc": QuerySpec(q_streaming_delta_jdbc, STREAMING_DELTA_SQL, "per-micro-batch JDBC delta upsert leaves database == in-memory graph"),
    "streaming_query_serving": QuerySpec(q_streaming_query_serving, STREAMING_SERVE_SQL, "readStream query batches through the ann_search front door against a reloaded manifest bundle; per-epoch rows equal direct calls"),
    "embedding_near_dup": QuerySpec(q_embedding_near_dup, NEAR_DUP_SQL, "cosine near-dup self-join"),
    "range_search_l2": QuerySpec(q_range_search_l2, RANGE_SEARCH_SQL, "radius query (set-valued is_match) through the LOSSLESS IVF cell-pruned path; data-level vs brute force"),
    "profile_lineitem": QuerySpec(q_profile_lineitem, PROFILE_SQL, "one-pass table profiling (count/nulls/distinct/min/max/mean per column in ONE agg job)"),
    "table_diff_orders": QuerySpec(q_table_diff_orders, TABLE_DIFF_SQL, "snapshot diff (CDC added/removed/changed): hash-classified join vs column-wise IS DISTINCT FROM oracle"),
    "doc_length_quantiles": QuerySpec(q_doc_length_quantiles, DOC_QUANTILES_SQL, "EXACT per-lang percentiles (sort-based, shared interpolation definition) — the data-level complement of the KLL sketch row"),
    "hybrid_rrf_retrieval": QuerySpec(q_hybrid_rrf_retrieval, HYBRID_RRF_SQL, "hybrid retrieval: BM25 + hash-embedding cosine arms fused by reciprocal-rank fusion, data-level"),
    "filtered_knn_label": QuerySpec(q_filtered_knn_label, FILTERED_KNN_SQL, "metadata-filtered vector search (predicate + top-k), selective pre-filter exact path, data-level"),
    # -- r7 tail: product-analytics / pipeline-maintenance surface
    "funnel_conversion": QuerySpec(q_funnel_conversion, FUNNEL_SQL, "ordered-stage conversion funnel (signup→view→click→purchase), shrinking user-key join chain, data-level"),
    "cohort_retention_weekly": QuerySpec(q_cohort_retention, COHORT_SQL, "weekly cohort-retention triangle, all-integer epoch bucketing, data-level"),
    "user_daily_gapfill": QuerySpec(q_user_daily_gapfill, GAPFILL_SQL, "calendar-dense daily resample (sequence+explode spine, broadcast grid, zero-fill), data-level"),
    "incremental_orders_agg": QuerySpec(q_incremental_orders_agg, INCREMENTAL_AGG_SQL, "incremental materialized-view maintenance: base⊕delta state merge ≡ full recompute, data-level"),
    "weighted_sample_orders": QuerySpec(q_weighted_sample_orders, WEIGHTED_SAMPLE_SQL, "derandomized A-ES weighted sampling without replacement (hash-uniform, TakeOrdered), data-level"),
    "events_value_outliers": QuerySpec(q_events_value_outliers, OUTLIERS_SQL, "per-group z-score anomaly flag with bit-deterministic μ/σ arithmetic, data-level"),
    "edit_distance_join_docs": QuerySpec(q_edit_distance_join_docs, EDIT_DIST_JOIN_SQL, "PassJoin pigeonhole edit-distance join (lossless segment candidates) ≡ brute-force cross join, data-level"),
    "embedding_pca": QuerySpec(q_embedding_pca, EMBEDDING_PCA_SQL, "distributed one-pass PCA (mergeable moment partials, d×d driver eigh): spectral contract verified against the data"),
    "event_transitions": QuerySpec(q_event_transitions, EVENT_TRANSITIONS_SQL, "first-order Markov transition counts (lag window + groupBy), deterministic sequence order, data-level"),
    "dq_expectations": QuerySpec(q_dq_expectations, DQ_EXPECTATIONS_SQL, "data-quality expectations report: row-local rules in ONE pass + uniqueness groupBy + FK anti-join, exact violation counts, data-level"),
    "copurchase_pairs": QuerySpec(q_copurchase_pairs, COPURCHASE_SQL, "market-basket pair mining (per-basket bounded fan-out), data-level"),
    "copurchase_triangles": QuerySpec(q_copurchase_triangles, COPURCHASE_TRI_SQL, "exact triangle count, degree-oriented wedge join ≡ plain a<b<c triple-join oracle, data-level"),
    "copurchase_pagerank": QuerySpec(q_copurchase_pagerank, _pagerank_sql(), "fixed-iteration PageRank (iterative dataflow, co-partitioned join+groupBy per round) ≡ 10-round unrolled-CTE oracle, data-level"),
    "scd2_user_state": QuerySpec(q_scd2_user_state, SCD2_SQL, "type-2 SCD interval build (null-safe change collapse, one shared sort), data-level"),
    "streaming_incremental_agg": QuerySpec(q_streaming_incremental_agg, INCREMENTAL_AGG_SQL, "streaming materialized-view maintenance: foreachBatch state merge at delta cost ≡ full-recompute oracle, data-level"),
    # -- round-8 additions: post-dedup curation decisions
    "neardup_canonical_docs": QuerySpec(q_neardup_canonical_docs, _neardup_canonical_sql(), "canonical-doc selection per near-dup cluster (keep best-quality member, not min-id), data-level"),
    "hard_negatives_l2": QuerySpec(q_hard_negatives_l2, HARD_NEGATIVES_SQL, "contrastive hard-negative mining: per-anchor top-k nearest with label != anchor, data-level"),
    "token_budget_sample": QuerySpec(q_token_budget_sample, TOKEN_BUDGET_SQL, "per-domain token-budget sampling (derandomized hash order + running token sum), data-level"),
    "chunk_documents": QuerySpec(q_chunk_documents, CHUNK_DOCS_SQL, "token-window chunking (32-token chunks, 4-token overlap, stride sequence explode), data-level"),
    "ivf_manifest_restart": QuerySpec(q_ivf_manifest_restart, IVF_MANIFEST_SQL, "IVF-SQ8 serving-manifest roundtrip: loaded-bundle search == in-memory rows + PartitionFilters pruning + model roundtrip, invariant row"),
    "random_projection_jl": QuerySpec(q_random_projection_jl, RANDOM_PROJECTION_SQL, "seeded JL projection: determinism + dims + in-expectation distance preservation, invariant row"),
    # -- round-8 tail: CDC apply, resample, retrieval, BFS, kNN join, histogram
    "cdc_apply_orders": QuerySpec(q_cdc_apply_orders, CDC_APPLY_SQL, "CDC MERGE apply (deletes/updates/inserts onto the snapshot, one key shuffle), full merged table, data-level"),
    "events_ohlc_hourly": QuerySpec(q_events_ohlc_hourly, OHLC_SQL, "hourly OHLC bar resample in ONE groupBy (struct-extrema open/close, tie-deterministic), data-level"),
    "boolean_retrieval_docs": QuerySpec(q_boolean_retrieval, BOOLEAN_RETRIEVAL_SQL, "boolean AND/OR/NOT retrieval over the inverted index (one broadcast probe + one groupBy), data-level"),
    "copurchase_bfs": QuerySpec(q_copurchase_bfs, COPURCHASE_BFS_SQL, "BFS shortest paths (4 hops) over the co-purchase graph, checkpointed iterative dataflow ≡ bounded recursive-CTE oracle, data-level"),
    "knn_join_graph": QuerySpec(q_knn_join_graph, KNN_JOIN_SQL, "blocked kNN SELF-join (cell-co-partitioned candidates): degrees == k, no self, sampled recall >= 0.75 vs exact (measured 0.85-0.90), invariant row"),
    "events_value_histogram": QuerySpec(q_events_value_histogram, HISTOGRAM_SQL, "dense equi-width histogram (20 bins, zero-filled spine, bit-deterministic bin math), data-level"),
    "events_value_trend": QuerySpec(q_events_value_trend, TREND_SQL, "per-group OLS trend (one agg pass, exact decimal(38,0) accumulators, two final float divisions), data-level"),
    "orders_lineitem_cardinality": QuerySpec(q_orders_lineitem_cardinality, JOIN_CARDINALITY_SQL, "exact join-size prediction without running the join (two (key,count) reductions + key join): pairs, overlap split, max fan-out, data-level"),
    "jaccard_docs_lossless": QuerySpec(q_jaccard_docs_lossless, JACCARD_LOSSLESS_SQL, "LOSSLESS set-similarity join (PPJoin prefix filter, integer-exact threshold) vs TRUE brute-force oracle, data-level"),
    "copurchase_communities": QuerySpec(q_copurchase_communities, _label_propagation_sql(), "synchronous label propagation (4 rounds, min-label ties, bit-deterministic) ≡ unrolled-CTE oracle, data-level"),
    "top_event_paths": QuerySpec(q_top_event_paths, TOP_PATHS_SQL, "most frequent first-4 event paths per user-day (in-aggregate ordered assembly, one corpus shuffle), data-level"),
    "events_value_ewma": QuerySpec(q_events_value_ewma, _ewma_sql(), "bounded-span EWMA smoothing (8 unrolled lags, one window sort, exact power-of-two weights), data-level"),
    "fk_inclusion_profile": QuerySpec(q_fk_inclusion_profile, FK_INCLUSION_SQL, "FK discovery via inclusion coefficients (distinct reductions + semi-join per pair), data-level"),
    "mmr_diversify_topk": QuerySpec(q_mmr_diversify_topk, MMR_SQL, "MMR diversity re-rank (applyInPandas greedy per query): k picks ⊆ candidates, relevance-argmax first pick, distributed ≡ independent local greedy — invariant row"),
    "tfidf_doc_keywords": QuerySpec(q_tfidf_doc_keywords, TFIDF_KEYWORDS_SQL, "TF-IDF keyword extraction (top-3 terms per doc, postings equi-join + window), data-level"),
    "copurchase_item_sim": QuerySpec(q_copurchase_item_sim, ITEM_SIM_SQL, "item-item cosine recommender (co-occurrence / sqrt degree product, top-5 per item), data-level"),
    # -- round-9 additions: rule mining, robust statistics, collocations
    "basket_rules": QuerySpec(q_basket_rules, BASKET_RULES_SQL, "association rules A->B (support/confidence/lift from one pair shuffle, conf >= 0.5), data-level"),
    "events_rolling_median": QuerySpec(q_events_rolling_median, ROLLING_MEDIAN_SQL, "trailing-10-row exact rolling median per type (one window sort, round-free IEEE parity), data-level"),
    "events_mad_outliers": QuerySpec(q_events_mad_outliers, MAD_OUTLIERS_SQL, "median-absolute-deviation outlier flag (masking-immune, two same-key passes), data-level"),
    "token_pmi_pairs": QuerySpec(q_token_pmi_pairs, TOKEN_PMI_SQL, "PMI collocation mining (doc-level co-occurrence, per-doc term cap bounds fan-out), data-level"),
    # -- round-9 tail: runtime filtering, dispersion/concentration
    #    profiling, irregular time series, skyline, change detection
    "bloom_semi_join_lineitem": QuerySpec(q_bloom_semi_join, BLOOM_SEMI_SQL, "Bloom-filter semi-join reduction (broadcast bit array + exact verify) ≡ plain semi-join, data-level"),
    "user_event_entropy": QuerySpec(q_user_event_entropy, GROUP_ENTROPY_SQL, "per-group Shannon/normalized entropy + Gini impurity (sorted-fold float discipline), data-level"),
    "nation_revenue_gini": QuerySpec(q_nation_revenue_gini, NATION_GINI_SQL, "Gini concentration of customer spend per nation (exact decimal accumulators, two final divisions), data-level"),
    "events_twap_daily": QuerySpec(q_events_twap_daily, EVENTS_TWAP_SQL, "time-weighted average over irregular samples (exact integer-microsecond weights), data-level"),
    "events_interpolated": QuerySpec(q_events_interpolated, EVENTS_INTERPOLATE_SQL, "per-group linear interpolation of masked values (two window passes, one shared sort), data-level"),
    "parts_skyline": QuerySpec(q_parts_skyline, PARTS_SKYLINE_SQL, "2-D Pareto frontier, sort-based linear form ≡ O(n²) NOT-EXISTS domination oracle, data-level"),
    "events_cusum_shift": QuerySpec(q_events_cusum_shift, EVENTS_CUSUM_SQL, "one-sided CUSUM change-point flags (closed window form of the max(0,·) recurrence, integer-exact gate), data-level"),
    "copurchase_kcore": QuerySpec(q_copurchase_kcore, _k_core_sql(), "k-core decomposition (synchronous peeling, early-exit ≡ unrolled-CTE fixpoint), data-level"),
    "events_psi_drift": QuerySpec(q_events_psi_drift, EVENTS_PSI_SQL, "PSI drift profile (Laplace-smoothed exact-integer shares per bin, reference-anchored equi-width bins), data-level"),
    "embeddings_standardized": QuerySpec(q_embeddings_standardized, _standardize_sql(), "per-dim z-score standardization (exact integer μ/σ accumulators in one agg, full-precision z), data-level"),
    "purchase_attribution": QuerySpec(q_purchase_attribution, PURCHASE_ATTRIBUTION_SQL, "linear multi-touch attribution (user-key range join, equal split by touch count), data-level"),
    "retrieval_eval_knn": QuerySpec(q_retrieval_eval, RETRIEVAL_EVAL_SQL, "retrieval evaluation (recall/precision@10, MRR, nDCG@10) vs label-derived graded judgments, rank-sorted DCG folds, data-level"),
    "events_winsorized": QuerySpec(q_events_winsorized, EVENTS_WINSORIZE_SQL, "nearest-rank percentile winsorization (clip bounds are actual data values, bit-exact), data-level"),
    # -- round-9 batch 4: link prediction, schema mining, robust/serial
    #    statistics, readability, leakage-safe splits
    "copurchase_link_pred": QuerySpec(q_copurchase_link_pred, LINK_PRED_SQL, "link prediction (common-neighbors / Jaccard / Adamic-Adar, hub-capped wedge join, sorted-fold AA), data-level"),
    "orders_column_profile": QuerySpec(q_orders_column_profile, COLUMN_PROFILE_SQL, "candidate-key profile: per-column null/distinct/uniqueness in ONE multi-distinct aggregate, data-level"),
    "lineitem_fd_violations": QuerySpec(q_lineitem_fd_violations, FD_VIOLATIONS_SQL, "functional-dependency check l_partkey->l_suppkey with sorted violation evidence, data-level"),
    "events_acf_daily": QuerySpec(q_events_acf_daily, ACF_SQL, "lag-1..3 autocorrelation per type (one window sort, exact decimal accumulators, string-hop doubles), data-level"),
    "events_theilsen_trend": QuerySpec(q_events_theilsen_trend, THEILSEN_SQL, "Theil-Sen robust trend (per-group pair join, nearest-rank medians, no interpolation), data-level"),
    "doc_readability": QuerySpec(q_doc_readability, READABILITY_SQL, "Flesch readability features (regexp counts + in-order syllable fold, no UDF), data-level"),
    "leakage_split_docs": QuerySpec(q_leakage_split_docs, LEAKAGE_SPLIT_SQL, "duplicate-aware train/val/test split (content-hash groups, Knuth bucket of the representative), data-level"),
    "dup_ngram_docs": QuerySpec(q_dup_ngram_docs, DUP_NGRAM_SQL, "duplicated-substring coverage per doc (cross-doc 8-gram union-of-spans sweep, Lee et al. 2022 signal), data-level"),
    "phrase_search_docs": QuerySpec(q_phrase_search_docs, PHRASE_SEARCH_SQL, "exact phrase search: shuffle-free positional matching (filtered position scan per doc), data-level"),
    "user_conversion_survival": QuerySpec(q_user_conversion_survival, KM_SURVIVAL_SQL, "Kaplan-Meier time-to-first-purchase with right-censoring at the analysis cutoff (sorted-fold product-limit), data-level"),
    "containment_docs_lossless": QuerySpec(q_containment_docs, CONTAINMENT_SQL, "LOSSLESS directed set-containment join (asymmetric prefix filter, integer-exact verify) vs brute-force oracle, data-level"),
    "doc_oov_rate": QuerySpec(q_doc_oov_rate, OOV_RATE_SQL, "per-doc OOV rate vs the corpus top-k vocabulary (distributed partial top-k cut, broadcast vocab), data-level"),
    "events_decile_bins": QuerySpec(q_events_decile_bins, DECILE_BINS_SQL, "equal-frequency decile binning (two-phase distributed rank, nearest-rank bounds, deterministic ties), data-level"),
    "events_dau_mau": QuerySpec(q_events_dau_mau, DAU_MAU_SQL, "DAU / trailing-7d MAU stickiness series (one distinct reduction + bounded explode, zero-filled spine), data-level"),
    "copurchase_ppr": QuerySpec(q_copurchase_ppr, _ppr_sql(), "personalized PageRank (teleport pinned to a source set, 8 checkpointed rounds) ≡ unrolled-CTE oracle, data-level"),
    "copurchase_clustering": QuerySpec(q_copurchase_clustering, CLUSTERING_COEFF_SQL, "local clustering coefficients (degree-oriented triangle attribution, exact integer t/deg), data-level"),
    "purchase_latency_percentiles": QuerySpec(q_purchase_latency_percentiles, LATENCY_PCTL_SQL, "nearest-rank conversion-latency percentiles (two-phase distributed rank, bit-exact value selections), data-level"),
    "funnel_stage_latency": QuerySpec(q_funnel_stage_latency, FUNNEL_LATENCY_SQL, "funnel transition latency p50/p90 (chained-min semantics, in-array differentiation, per-transition rank), data-level"),
    "daily_bounce_rate": QuerySpec(q_daily_bounce_rate, BOUNCE_RATE_SQL, "daily bounce rate over 30-min-gap sessions (one shared window sort, exact counts), data-level"),
    "event_gap_percentiles": QuerySpec(q_event_gap_percentiles, GAP_PCTL_SQL, "inter-event cadence p50/p90 per type (nearest-rank gap selections, shared window sort), data-level"),
    "source_ctfidf_terms": QuerySpec(q_source_ctfidf_terms, CTFIDF_SQL, "c-TF-IDF domain keywords (class pseudo-docs, tf x ln(N/df), top-3 per source), data-level"),
    "domain_token_topp": QuerySpec(q_domain_token_topp, DOMAIN_TOPP_SQL, "nucleus-style top-p token-mass curation per domain (integer cross-multiplied threshold, first-doc guarantee), data-level"),
    "event_type_correlations": QuerySpec(q_event_type_correlations, CROSS_CORR_SQL, "pairwise Pearson between type series (day-keyed self-join, decimal accumulators, string-hop doubles), data-level"),
    "orders_mom_growth": QuerySpec(q_orders_mom_growth, MOM_GROWTH_SQL, "month-over-month revenue growth per priority (exact cents, NULL first period), data-level"),
    "parts_abc_classes": QuerySpec(q_parts_abc_classes, ABC_CLASSES_SQL, "ABC/Pareto revenue classification (running-share boundaries by integer cross-multiplication), data-level"),
    "binary_quant_knn": QuerySpec(q_binary_quant_knn, BINARY_QUANT_SQL, "1-bit binary-quantized kNN (sign-packed 32-bit words, XOR+popcount prefilter, exact re-rank) — FULL value parity, data-level"),
    "events_rolling_zscore": QuerySpec(q_events_rolling_zscore, ROLLING_ZSCORE_SQL, "trailing-20-row z-score anomaly flags (exact decimal frame sums, one division, level-shift adaptive), data-level"),
    "neardup_component_sizes": QuerySpec(q_neardup_component_sizes, _component_sizes_sql(), "near-dup cluster-size census (hash-min label propagation ≡ recursive-closure oracle), data-level"),
    "langid_classification_report": QuerySpec(q_langid_report, _langid_report_sql(), "per-class precision/recall/F1 of the lang-ID heuristic (one contingency reduction, sklearn zero_division=0), data-level"),
    "events_chi_square": QuerySpec(q_event_chi_square, CHI_SQUARE_SQL, "chi-square independence test (sorted-cell fold, exact marginals), data-level single row"),
    "ab_test_conversion": QuerySpec(q_ab_test_conversion, AB_TEST_SQL, "two-proportion pooled z-test on per-user conversion (exact counts, fixed-order expression), data-level single row"),
    "label_centroid_similarity": QuerySpec(q_label_centroid_similarity, CENTROID_SIM_SQL, "pairwise cosine between per-label centroids (exact decimal dim sums, dim-sorted folds, labels^2 bounded), data-level"),
    "customer_rfm_segments": QuerySpec(q_customer_rfm, RFM_SQL, "RFM quintile segmentation (nearest-rank thresholds broadcast, comparison projection, 100R+10F+M), data-level"),
    "source_vocab_overlap": QuerySpec(q_source_vocab_overlap, VOCAB_OVERLAP_SQL, "pairwise source vocabulary Jaccard (distinct postings self-join, exact counts), data-level"),
    "asof_next_purchase": QuerySpec(q_asof_next_purchase, ASOF_FWD_SQL, "FORWARD as-of join (next purchase at-or-after each error; union + reverse-ordered window carry) vs native ASOF >= oracle, data-level"),
    # -- round-10 block
    "orders_key_skew": QuerySpec(q_orders_key_skew, KEY_SKEW_SQL, "join-key skew profile: top-20 heavy hitters with exact ppm share + skew ratio vs uniform, data-level"),
    "orders_benford_digits": QuerySpec(q_orders_benford_digits, BENFORD_SQL, "Benford first-digit screen on o_totalprice (integer-cents digit extraction, hardcoded expected ppm), data-level"),
    "copurchase_assortativity": QuerySpec(q_copurchase_assortativity, ASSORTATIVITY_SQL, "degree assortativity of the co-purchase graph (exact decimal Pearson accumulators, one final division), data-level"),
    "source_js_divergence": QuerySpec(q_source_js_divergence, JS_DIVERGENCE_SQL, "pairwise Jensen-Shannon divergence between source unigram distributions (top-500 vocab + residual bucket, token-sorted folds), data-level"),
    "events_seasonal_decomp": QuerySpec(q_events_seasonal_decomp, SEASONAL_DECOMP_SQL, "additive seasonal decomposition of daily event series (integer-exact centered MA + phase means, period 7), data-level"),
    "cosine_docs_lossless": QuerySpec(q_cosine_docs_lossless, COSINE_LOSSLESS_SQL, "LOSSLESS all-pairs tf-idf cosine self-join (Bayardo WWW'07 prefix filter) vs true brute-force oracle, data-level"),
    "doc_quality_calibration": QuerySpec(q_doc_quality_calibration, CALIBRATION_SQL, "calibration/reliability report + per-bin Brier of a repetition scorer vs planted spam (micro-unit quantized, exact integer sums), data-level"),
    "events_holt_forecast": QuerySpec(q_events_holt_forecast, HOLT_SQL, "Holt double exponential smoothing per event type (sorted-list fold, fixed operand order), data-level"),
    "retrieval_rank_overlap": QuerySpec(q_retrieval_rank_overlap, RANK_OVERLAP_SQL, "rank-biased overlap between BM25 and embedding arms (Webber 2010, fixed 10-term fold), data-level"),
    "streaming_heavy_hitters": QuerySpec(q_streaming_heavy_hitters, STREAMING_HH_SQL, "streaming Misra-Gries heavy hitters (O(capacity) state per key) == batch GROUP BY in the exact regime, data-level"),
    "events_welch_ttest": QuerySpec(q_events_welch_ttest, WELCH_SQL, "Welch unequal-variance t-test on event value by cohort (exact decimal accumulators, one double expression), data-level"),
    "events_mann_whitney": QuerySpec(q_events_mann_whitney, MANN_WHITNEY_SQL, "Mann-Whitney U rank-sum test by cohort (two-phase rank, exact doubled midranks, tie-corrected z), data-level"),
    "events_ks_test": QuerySpec(q_events_ks_test, KS_TEST_SQL, "two-sample Kolmogorov-Smirnov D by cohort (exact integer ECDF gap maximum, range-partitioned cumulatives), data-level"),
}

# Queries rotated out of the 50-entry driver window (it records at most
# 50 rows per round — see NOTES.md "catalog right-sizing"). Their
# operators stay in the engine and their parity stays verified: the
# pytest suite sweeps RETIRED against the same DuckDB oracles at
# sf0.001 (tests/test_retired_parity.py).
_ROTATED_OUT_SPECS: dict[str, QuerySpec] = {
    "rollup_returnflag": QuerySpec(q_rollup_returnflag, Q_ROLLUP_SQL, "grouping sets (CUBE kept in-catalog)"),
    "orders_monthly": QuerySpec(q_orders_monthly, Q_MONTHLY_SQL, "time bucketing (sliding windows kept)"),
    "part_brand_stats": QuerySpec(q_part_brand_stats, Q_PART_SQL, "agg + avg parity (brand-avg filter kept)"),
    "big_customers": QuerySpec(q_big_customers, BIG_CUST_SQL, "HAVING + join (q18 kept)"),
    "events_hourly": QuerySpec(q_events_hourly, Q_EVENTS_HOURLY_SQL, "hourly windows (sliding kept)"),
    "sessionization": QuerySpec(q_sessionization, Q_SESSION_SQL, "gap sessionization (session_window kept)"),
    "sql_nation_revenue": QuerySpec(q_sql_nation_revenue, SQL_NATION_SQL, "spark.sql surface"),
    "vector_norm_stats": QuerySpec(q_vector_norm_stats, NORM_SQL, "vector norms"),
    "rolling_fingerprint": QuerySpec(q_rolling_fingerprint, ROLLING_FP_SQL, "rolling hash (merged into doc_fingerprint)"),
    "knn_exact_cosine": QuerySpec(q_knn_exact_cosine, KNN_COS_SQL, "merged into knn_exact_cosine_dot"),
    "knn_exact_dot": QuerySpec(q_knn_exact_dot, KNN_DOT_SQL, "merged into knn_exact_cosine_dot"),
    "minhash_near_dup_uncapped": QuerySpec(q_minhash_near_dup_uncapped, _minhash_sql(), "uncapped MinHash-LSH (capped is the catalog default)"),
    "ngram_jaccard_uncapped": QuerySpec(q_ngram_jaccard_uncapped, NGRAM_JACCARD_SQL, "uncapped n-gram Jaccard"),
    # rotated out in favor of the round-2 curation block (operator shapes
    # covered elsewhere: conditional aggs by order_status_pivot's cousins
    # in q14/cube, regex by lang_id/events_json, window-rank breadth by
    # customer_running_totals, set algebra trivial at any scale).
    "order_status_pivot": QuerySpec(q_order_status_pivot, PIVOT_SQL, "conditional-agg pivot"),
    "part_type_regex": QuerySpec(q_part_type_regex, REGEX_SQL, "regex/string predicates"),
    "set_ops_nations": QuerySpec(q_set_ops_nations, SET_OPS_SQL, "INTERSECT/EXCEPT"),
    "customer_balance_ranks": QuerySpec(q_customer_balance_ranks, RANKS_SQL, "ntile/percent_rank/cume_dist"),
    "customers_without_orders": QuerySpec(q_customers_without_orders, Q_NO_ORDERS_SQL, "anti join (0-row result; shape used inside dedup/decontaminate)"),
    "vocab_top_tokens": QuerySpec(q_vocab_top_tokens, VOCAB_SQL, "vocabulary build (explode+count+rank shapes kept in-catalog elsewhere)"),
    "nation_customer_agg": QuerySpec(q_nation_customer_agg, STRING_AGG_SQL, "ordered string aggregation"),
    "quantiles_by_segment": QuerySpec(q_quantiles_by_segment, QUANTILE_SQL, "exact quantiles"),
    "doc_quality": QuerySpec(q_doc_quality, Q_QUALITY_SQL, "heuristic quality scoring (exercised in-catalog by curation_pipeline)"),
}


# ---------------------------------------------------------------------------
# Driver-window rotation (round-2 VERDICT item 5; widened r6, r7).
#
# The driver records at most 50 correctness rows per round, while the
# engine holds 131 oracle-backed specs. Eight PINNED entries — one per
# headline operator family (flagship TPC-H agg, HNSW search, exact kNN,
# LSH near-dup, exact dedup, multimodal, streaming ingest, and the
# coroutine op-stream protocol) — hold their slot every round; the other
# 42 slots cycle deterministically through the pool, never-recorded
# oracles first in _DEBUT_ORDER, then oldest-driver-row-first. Everything
# not currently windowed is still parity-swept by pytest every session
# (tests/test_retired_parity.py), so rotation trades WHICH rows get
# fresh driver evidence, never whether a spec stays verified.
#
# r7 widening rationale (VERDICT r6 #4 carried to its conclusion): the
# debut backlog reached 42 never-recorded specs against 12 slots — a
# 3.5-round wait for driver evidence on finished, multi-SF-verified
# work. Every formerly-pinned row already holds driver-green rows from
# r1-r6 and keeps earning fresh ones via oldest-first rotation from r8
# on; the 30 unpinned this round have family coverage inside the new
# pinned core or among the debuting specs themselves.
#
# The round number is inferred from the CORRECTNESS_r*.json artifacts the
# driver itself commits at the end of each round — deterministic within a
# round (the file for the current round doesn't exist yet while it runs)
# and needs no out-of-band signal.

_PINNED_NAMES = [
    "q01_pricing_summary",      # flagship TPC-H aggregate
    "hnsw_search_l2",           # ANN/HNSW core search
    "knn_exact_l2",             # exact-kNN baseline (LinearDb analog)
    "minhash_near_dup",         # LSH near-duplicate family
    "exact_dedup_docs",         # exact dedup family
    "multimodal_pipeline",      # multimodal decode/feature path
    "streaming_ingest_counts",  # structured-streaming ingest
    "op_stream_digest",         # reference coroutine op-log protocol
]
assert all(n in _STABLE_SPECS for n in _PINNED_NAMES)

_ROTATION_POOL: list[str] = list(_ROTATED_OUT_SPECS) + [
    n for n in _STABLE_SPECS if n not in set(_PINNED_NAMES)
]

_ALL_SPECS: dict[str, QuerySpec] = {**_STABLE_SPECS, **_ROTATED_OUT_SPECS}

_ROTATING_SLOTS = 50 - len(_PINNED_NAMES)


def _last_driver_rows() -> dict[str, int]:
    """name → latest round whose committed CORRECTNESS_r{N}.json recorded
    it GREEN (the driver commits the artifact at round end, so the set is
    fixed for the whole current round — deterministic, no out-of-band
    signal). Only fully-green rows count: a recorded FAIL must keep the
    spec at the front of the queue so it re-enters the window the very
    next round (r7's two hash failures would otherwise have rotated out
    unfixed, still never-green)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("rows_match", False)
                and row.get("schema_match", False)
                and row.get("hash_match", True)  # rows-only checks lack it
                and row.get("err") in (None, "")
            )
            if green:
                last[name] = max(last.get(name, -1), rnd)
    return last


# Debut order of never-recorded oracles: earlier debuts take rotating
# slots first (the r5-queued block earns its rows before the r6-tail
# block, which queues behind it for the next round). Append-only; a
# never-recorded name absent here sorts after the listed ones, by name.
_DEBUT_ORDER = [
    # queued in r5 (VERDICT r5 #3/#4)
    "minhash_near_dup_uncapped", "ngram_jaccard_uncapped",
    "nfc_normalize_docs", "sketch_summary", "serving_restart_dispatch",
    # r6
    "ivfpq_ann_l2",
    # r6 tail — the last test-only components earning oracle rows
    "hamming_scan_topk", "custom_metric_knn", "dup_gate_batch",
    "streaming_durable_resume", "streaming_delta_jdbc",
    "streaming_query_serving",
    # r6 tail, second wave — event-time streaming rows first (new
    # operator surface), then the TPC-H widening block
    "streaming_event_windows", "streaming_sessionize",
    "streaming_attribution", "streaming_dedup_exact", "sq8_ann_l2",
    "zorder_values",
    "q07_volume_shipping", "q08_market_share", "q10_returned_items",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_qty_revenue", "q21_waiting_supplier",
    "q22_dormant_customers",
    # r7 debuts
    "ivfsq8_ann_l2", "range_search_l2", "filtered_knn_label",
    "profile_lineitem", "table_diff_orders", "doc_length_quantiles",
    "hybrid_rrf_retrieval",
    # r7 tail — analytics / pipeline-maintenance block
    "funnel_conversion", "cohort_retention_weekly", "user_daily_gapfill",
    "incremental_orders_agg", "weighted_sample_orders",
    "events_value_outliers", "edit_distance_join_docs",
    "embedding_pca", "event_transitions", "dq_expectations",
    "copurchase_pairs", "copurchase_triangles", "copurchase_pagerank",
    "scd2_user_state", "streaming_incremental_agg",
    # r8 debuts
    "neardup_canonical_docs", "hard_negatives_l2", "token_budget_sample",
    "chunk_documents", "ivf_manifest_restart", "random_projection_jl",
    # r8 tail
    "cdc_apply_orders", "events_ohlc_hourly", "boolean_retrieval_docs",
    "copurchase_bfs", "knn_join_graph", "events_value_histogram",
    "events_value_trend", "orders_lineitem_cardinality",
    "jaccard_docs_lossless", "copurchase_communities",
    "top_event_paths", "events_value_ewma", "fk_inclusion_profile",
    "mmr_diversify_topk", "tfidf_doc_keywords", "copurchase_item_sim",
    # r9 debuts
    "basket_rules", "events_rolling_median", "events_mad_outliers",
    "token_pmi_pairs",
    # r9 rotation-overflow stragglers + the repaired fd row (VERDICT r9
    # #2/#1): these 11 must earn their FIRST driver rows in the r10
    # window before any r10 debut takes a slot
    "lineitem_fd_violations", "user_conversion_survival",
    "source_ctfidf_terms", "phrase_search_docs", "parts_skyline",
    "purchase_attribution", "retrieval_eval_knn", "user_event_entropy",
    "parts_abc_classes", "purchase_latency_percentiles",
    "source_vocab_overlap",
    # r10 debuts
    "orders_key_skew", "orders_benford_digits",
    "copurchase_assortativity", "source_js_divergence",
    "events_seasonal_decomp", "cosine_docs_lossless",
    "doc_quality_calibration", "events_holt_forecast",
    "retrieval_rank_overlap", "streaming_heavy_hitters",
    "events_welch_ttest", "events_mann_whitney", "events_ks_test",
]


def _rotate() -> tuple[dict[str, QuerySpec], dict[str, QuerySpec]]:
    """Fill the rotating slots with the pool names whose driver row is
    OLDEST (never-recorded first in debut order, then ties by name) —
    self-correcting round-robin: every oracle keeps earning fresh driver
    rows no matter how the pinned set or pool evolves between rounds."""
    last = _last_driver_rows()

    def _key(n: str):
        l = last.get(n, -1)
        debut = (
            _DEBUT_ORDER.index(n)
            if l < 0 and n in _DEBUT_ORDER
            else len(_DEBUT_ORDER)
        )
        return (l, debut, n)

    pool = sorted(_ROTATION_POOL, key=_key)
    rotating = pool[:_ROTATING_SLOTS]
    catalog = {n: _ALL_SPECS[n] for n in rotating}  # new names first: the
    catalog.update({n: _ALL_SPECS[n] for n in _PINNED_NAMES})  # driver caps at 50
    retired = {n: s for n, s in _ALL_SPECS.items() if n not in catalog}
    return catalog, retired


CATALOG, RETIRED = _rotate()

# Rotation-independent view for callers that key on names (bench.py's
# HEADLINE set must measure the same queries every round regardless of
# which slots they occupy).
ALL_SPECS = _ALL_SPECS
