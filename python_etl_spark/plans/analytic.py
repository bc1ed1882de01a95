"""Analytic query suite — TPC-H shapes adapted to the test star schema.

Spark-first plans under the plans.common broadcast policy:
fixed-cardinality frames (region, nation, one-row thresholds) are
broadcast-hinted unconditionally via ``_bc``; SF-scaling dims
(customer, part, supplier — linear in SF, ~10^9 rows at a true
100 TB) go through ``_dim`` (= plans.common.bc_dim), which hints only
while Catalyst's file-size estimate fits the autoBroadcastJoinThreshold
and otherwise lets AQE choose. Fact joins shuffle on their keys under
AQE; aggregates are declared so Catalyst does partial (map-side)
aggregation. Each query has a DuckDB oracle built with the
decimal-exact helpers in plans.common.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_spark.plans.common import (
    REVENUE,
    REVENUE_SQL,
    davg_sql,
    dsum,
    dsum_sql,
    register,
    ts,
    ts_sql,
)
from python_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _bc(df: DataFrame) -> DataFrame:
    """Unconditional hint — fixed-cardinality frames only (region,
    nation, bounded aggregates); see the plans.common policy note."""
    return F.broadcast(df)


from python_etl_spark.plans.common import bc_dim as _dim  # noqa: E402


# --------------------------------------------------------------------------
# q01 — pricing summary report (TPC-H Q1)
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql(f'{REVENUE_SQL}')} AS sum_disc_price,
  {dsum_sql(f'{REVENUE_SQL} * (1 + l_tax)')} AS sum_charge,
  {dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
  {dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
  {dsum_sql('l_discount', scale=4)} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= {ts_sql('2001-09-01 00:00:00')}
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= ts("2001-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(REVENUE()).alias("sum_disc_price"),
            dsum(REVENUE() * (1 + F.col("l_tax"))).alias("sum_charge"),
            (dsum("l_quantity") / n).alias("avg_qty"),
            (dsum("l_extendedprice") / n).alias("avg_price"),
            (dsum("l_discount", scale=4) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q03 — shipping priority (TPC-H Q3)
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS l_orderkey,
  {dsum_sql(REVENUE_SQL)} AS revenue,
  o.o_orderdate AS o_orderdate,
  o.o_orderpriority AS o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < {ts_sql('1998-06-01 00:00:00')}
  AND l.l_shipdate > {ts_sql('1998-06-01 00:00:00')}
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < ts("1998-06-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > ts("1998-06-01 00:00:00")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_dim(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(REVENUE()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — order priority checking (TPC-H Q4): EXISTS semi-join
# --------------------------------------------------------------------------
@register(
    "q04_order_priority",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= {ts_sql('1997-01-01 00:00:00')}
  AND o.o_orderdate < {ts_sql('1997-04-01 00:00:00')}
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-04-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# q05 — local supplier volume (TPC-H Q5): 6-way join
# --------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    oracle=f"""
SELECT n.n_name AS n_name, {dsum_sql(REVENUE_SQL)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= {ts_sql('1997-01-01 00:00:00')}
  AND o.o_orderdate < {ts_sql('1998-01-01 00:00:00')}
GROUP BY n.n_name
""",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_dim(cust), orders.o_custkey == cust.c_custkey)
        .join(
            _dim(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(_bc(nation), supp.s_nationkey == nation.n_nationkey)
        .join(_bc(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(REVENUE()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q06 — forecast revenue change (TPC-H Q6): selective scan + sum
# --------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice * l_discount', scale=4)} AS revenue
FROM lineitem
WHERE l_shipdate >= {ts_sql('1997-01-01 00:00:00')}
  AND l_shipdate < {ts_sql('1998-01-01 00:00:00')}
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=4).alias(
            "revenue"
        )
    )


# --------------------------------------------------------------------------
# q07 — volume shipping between regions (TPC-H Q7, region-level)
# --------------------------------------------------------------------------
@register(
    "q07_volume_shipping",
    oracle=f"""
SELECT supp_region, cust_region, l_year, {dsum_sql('volume')} AS revenue
FROM (
  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
         {REVENUE_SQL} AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
      OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
    AND l.l_shipdate >= {ts_sql('1996-01-01 00:00:00')}
    AND l.l_shipdate < {ts_sql('1998-01-01 00:00:00')}
) shipping
GROUP BY supp_region, cust_region, l_year
""",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    r1 = region.select(
        F.col("r_regionkey").alias("r1_key"), F.col("r_name").alias("supp_region")
    )
    r2 = region.select(
        F.col("r_regionkey").alias("r2_key"), F.col("r_name").alias("cust_region")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_dim(cust), orders.o_custkey == cust.c_custkey)
        .join(_dim(supp), li.l_suppkey == supp.s_suppkey)
        .join(_bc(n1), supp.s_nationkey == F.col("n1.n_nationkey"))
        .join(_bc(r1), F.col("n1.n_regionkey") == F.col("r1_key"))
        .join(_bc(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .join(_bc(r2), F.col("n2.n_regionkey") == F.col("r2_key"))
        .where(
            ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
            | ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
        )
    )
    return (
        joined.select(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").alias("l_year"),
            REVENUE().alias("volume"),
        )
        .groupBy("supp_region", "cust_region", "l_year")
        .agg(dsum("volume").alias("revenue"))
    )


# --------------------------------------------------------------------------
# q08 — market share of a brand within a region (TPC-H Q8)
# --------------------------------------------------------------------------
@register(
    "q08_market_share",
    oracle=f"""
SELECT o_year,
  CAST(SUM(CASE WHEN p_brand = 'Brand#1'
                THEN CAST(volume AS DECIMAL(28,6))
                ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
  / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         {REVENUE_SQL} AS volume, p.p_brand AS p_brand
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'AMERICA'
) all_sales
GROUP BY o_year
""",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    sales = (
        li.join(_dim(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_dim(cust), orders.o_custkey == cust.c_custkey)
        .join(_bc(nation), cust.c_nationkey == nation.n_nationkey)
        .join(_bc(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            REVENUE().alias("volume"),
            "p_brand",
        )
    )
    vol_dec = F.col("volume").cast("decimal(28,6)")
    brand_dec = F.when(F.col("p_brand") == "Brand#1", vol_dec).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return sales.groupBy("o_year").agg(
        (
            F.sum(brand_dec).cast("double") / F.sum(vol_dec).cast("double")
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# q09 — product-type profit (TPC-H Q9 with retail-price cost proxy)
# --------------------------------------------------------------------------
@register(
    "q09_product_profit",
    oracle=f"""
SELECT nation, o_year, {dsum_sql('amount')} AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         {REVENUE_SQL} - p.p_retailprice * l.l_quantity * 0.1 AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_type LIKE '%M%'
) profit
GROUP BY nation, o_year
""",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type").like("%M%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    amount = REVENUE() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(_dim(part), li.l_partkey == part.p_partkey)
        .join(_dim(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_bc(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# q10 — returned-item reporting (TPC-H Q10)
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
  {dsum_sql(REVENUE_SQL)} AS revenue,
  c.c_acctbal AS c_acctbal, n.n_name AS n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= {ts_sql('1997-01-01 00:00:00')}
  AND o.o_orderdate < {ts_sql('1997-07-01 00:00:00')}
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-07-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_dim(cust), orders.o_custkey == cust.c_custkey)
        .join(_bc(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(REVENUE()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q11 — supplier balance share by nation (Q11 adapted: no partsupp)
# --------------------------------------------------------------------------
@register(
    "q11_supplier_balance_share",
    oracle=f"""
SELECT n.n_name AS n_name, {dsum_sql('s_acctbal')} AS total_bal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
HAVING {dsum_sql('s_acctbal')} > (
  SELECT {dsum_sql('s_acctbal')} * 0.05 FROM supplier)
""",
)
def q11_supplier_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adapted. Share threshold is 0.05 (not TPC-H's SF-scaled
    0.0001) because the synthetic generator spreads balances evenly
    over 25 nations (~4% each): 0.1 left the HAVING empty at sf0.1 —
    a vacuous hash — while 0.05 keeps 4-9 nations at every gate scale,
    so the grouped sum + scalar-subquery comparison is exercised."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    per_nation = (
        supp.join(_bc(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("s_acctbal").alias("total_bal"))
    )
    threshold = supp.agg((dsum("s_acctbal") * F.lit(0.05)).alias("thr"))
    return (
        per_nation.join(_bc(threshold))
        .where(F.col("total_bal") > F.col("thr"))
        .select("n_name", "total_bal")
    )


# --------------------------------------------------------------------------
# q12 — priority distribution by linestatus (Q12 adapted: no shipmode)
# --------------------------------------------------------------------------
@register(
    "q12_priority_by_linestatus",
    oracle=f"""
SELECT l.l_linestatus AS l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= {ts_sql('1997-01-01 00:00:00')}
  AND l.l_shipdate < {ts_sql('1998-01-01 00:00:00')}
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_linestatus
""",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(li.l_shipdate > orders.o_orderdate)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q13 — customer order-count distribution (TPC-H Q13): left join
# --------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q14 — promotion revenue share (TPC-H Q14): conditional aggregation
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST({REVENUE_SQL} AS DECIMAL(28,6))
                  ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE))
  / CAST(SUM(CAST({REVENUE_SQL} AS DECIMAL(28,6))) AS DOUBLE) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= {ts_sql('1997-09-01 00:00:00')}
  AND l.l_shipdate < {ts_sql('1997-10-01 00:00:00')}
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-10-01 00:00:00"))
    )
    part = _t(spark, sf_dir, "part")
    rev_dec = REVENUE().cast("decimal(28,6)")
    promo_dec = F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return li.join(_dim(part), li.l_partkey == part.p_partkey).agg(
        (
            (F.lit(100.0) * F.sum(promo_dec).cast("double"))
            / F.sum(rev_dec).cast("double")
        ).alias("promo_revenue")
    )


# --------------------------------------------------------------------------
# q15 — top supplier by period revenue (TPC-H Q15)
# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {dsum_sql(REVENUE_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= {ts_sql('1997-01-01 00:00:00')}
    AND l_shipdate < {ts_sql('1997-04-01 00:00:00')}
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       r.total_revenue AS total_revenue
FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-04-01 00:00:00"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(REVENUE()).alias("total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue0.join(_bc(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(_dim(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q16 — part/supplier relationship counts (Q16, lineitem as partsupp proxy)
# --------------------------------------------------------------------------
@register(
    "q16_part_supplier_counts",
    oracle="""
SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(_dim(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q17 — small-quantity-order revenue (TPC-H Q17): correlated avg
# --------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey AS pk, {davg_sql('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey
) a ON a.pk = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.5 * a.avg_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    from python_etl_spark.plans.common import davg

    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(_dim(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# q18 — large-volume orders (TPC-H Q18)
# --------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle=f"""
SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
       o.o_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
       o.o_totalprice AS o_totalprice, {dsum_sql('l_quantity')} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING {dsum_sql('l_quantity')} > 250
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # aggregate BEFORE the joins: l_orderkey determines the other group
    # keys, so the shuffle moves (orderkey, qty) pairs with map-side
    # combine instead of the full 3-way-joined fact with 5 wide keys;
    # only the few >250 survivors reach the joins
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(_dim(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19 — bracketed revenue (TPC-H Q19): OR-of-ANDs pushdown
# --------------------------------------------------------------------------
@register(
    "q19_bracketed_revenue",
    oracle=f"""
SELECT {dsum_sql(REVENUE_SQL)} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#10' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    cond = (
        ((brand == "Brand#5") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#10") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#15") & size.between(1, 35) & qty.between(20, 30))
    )
    return (
        li.join(_dim(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(dsum(REVENUE()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q20 — suppliers of promo parts above quantity threshold (TPC-H Q20)
# --------------------------------------------------------------------------
@register(
    "q20_parts_promo_suppliers",
    oracle=f"""
SELECT s.s_name AS s_name, n.n_name AS n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
    AND l.l_shipdate >= {ts_sql('1997-01-01 00:00:00')}
    AND l.l_shipdate < {ts_sql('1998-01-01 00:00:00')}
  GROUP BY l.l_suppkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(28,6))) > 100)
""",
)
def q20_parts_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    qualified = (
        li.join(_dim(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(_bc(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# q21 — last-shipper analysis (TPC-H Q21 shape: semi + anti with conditions)
# --------------------------------------------------------------------------
@register(
    "q21_high_value_open_orders",
    oracle="""
SELECT s.s_name AS s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)
def q21_high_value_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT-EXISTS folded into ONE pass over lineitem (r14).

    The l2 semi and l3 anti self-joins each re-scanned and re-shuffled
    (or broadcast-built, 600k rows at sf0.1) the whole lineitem table.
    Both subqueries only ask per-order questions, so they collapse to
    window aggregates over the order key:

    * EXISTS other-supplier row          <=> n_supp >= 2
    * NOT EXISTS other-supplier row with a LATER shipdate
      <=> l_shipdate >= max over OTHER suppliers of their max shipdate
      which per order is: the overall max m1 when >= 2 suppliers attain
      m1 (threshold m1 for everyone), else m1 for non-top suppliers
      (unreachable: only the top supplier attains m1) and the
      second-distinct max m2 for the unique top supplier s_star.

    One exchange on l_orderkey (4 chained Window ops share it) instead
    of three full lineitem passes; the orders-status restriction is
    applied FIRST via a semi join, which cannot change the subquery
    rows (status is an order-level property and all three aliases share
    l_orderkey). Verified row-identical to the self-join formulation at
    sf0.001/0.01/0.1 and against the unchanged DuckDB oracle."""
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lf = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
    w = Window.partitionBy("l_orderkey")
    s1 = lf.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("m1"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    )
    s2 = s1.withColumn(
        "top_sks",
        F.collect_set(
            F.when(F.col("l_shipdate") == F.col("m1"), F.col("l_suppkey"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "s_star",
        F.when(F.size("top_sks") == 1, F.element_at("top_sks", 1)),
    )
    s4 = s3.withColumn(
        "m2",
        F.max(
            F.when(F.col("l_suppkey") != F.col("s_star"), F.col("l_shipdate"))
        ).over(w),
    )
    passed = (F.col("n_supp") >= 2) & (
        ((F.size("top_sks") >= 2) & (F.col("l_shipdate") == F.col("m1")))
        | (
            (F.size("top_sks") == 1)
            & (F.col("l_suppkey") == F.col("s_star"))
            & (F.col("l_shipdate") >= F.col("m2"))
        )
    )
    return (
        s4.where(passed)
        .join(_dim(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q22 — inactive high-balance customers (TPC-H Q22): anti join + scalar
# --------------------------------------------------------------------------
@register(
    "q22_inactive_customers",
    oracle=f"""
SELECT c.c_nationkey AS cntry, COUNT(*) AS numcust,
       {dsum_sql('c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (1, 3, 5, 7, 9)
  AND c.c_acctbal > (
    SELECT {davg_sql('c_acctbal')}
    FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9))
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= {ts_sql('2000-01-01 00:00:00')})
GROUP BY c.c_nationkey
""",
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted: "inactive" = no orders since 2000-01-01 (the
    anti-join is against RECENT orders, TPC-H Q22's actual intent).
    The synthetic generator gives every customer at least one order
    lifetime-wide, so the original orderless anti-join returned 0 rows
    at every scale — a hash that proved nothing. The dated predicate
    keeps 1/10/122 customers at sf0.001/0.01/0.1, so the anti-join,
    scalar-subquery threshold and grouped sums are all exercised. The
    date filter is pushed below the anti-join build side, so at scale
    the right side is the recent slice, not the full orders table."""
    from python_etl_spark.plans.common import davg

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= ts("2000-01-01 00:00:00")
    )
    in_set = cust.where(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
    threshold = in_set.where(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("thr")
    )
    return (
        in_set.join(_bc(threshold))
        .where(F.col("c_acctbal") > F.col("thr"))
        .join(orders, in_set.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q02 — cheapest part per brand (TPC-H Q2's min-cost shape, no partsupp)
# --------------------------------------------------------------------------
@register(
    "q02_cheapest_part_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice
FROM part
QUALIFY p_retailprice = MIN(p_retailprice) OVER (PARTITION BY p_brand)
""",
)
def q02_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("min_price"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )
