"""round-6 TPC-H tail

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



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
