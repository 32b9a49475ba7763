"""TPC-H completion pack: the 9 query shapes (Q2, Q4, Q9, Q11, Q12,
Q13, Q14, Q19, Q20) that finish full 22-query coverage alongside
plans/tpch.py (Q3/5/7/8/10/16/17/18/21/22), pricing_summary (Q1),
scan_filter_project (Q6) and top_revenue_supplier (Q15).

Adapted to the synthetic schema (TESTDATA.md): there is no partsupp
table and lineitem lacks shipmode/commitdate/receiptdate, so
- Q2/Q9/Q11/Q20's supply-cost/availability terms are derived from
  lineitem (the part↔supplier link that exists here);
- Q4's commit<receipt predicate becomes a returnflag filter;
- Q12's shipmode buckets become l_linestatus.
The *plan shapes* — correlated min, EXISTS semi-join, profit expression
over a 5-way star, scalar-subquery threshold, disjunctive pushdown,
outer-join histogram, conditional ratio, grouped-HAVING semi-join —
are the point, and each is the shape Catalyst should pick at 100 TB:
dimension chains broadcast, one exchange per fact aggregation,
decorrelated subqueries (no per-row re-execution).

Reference parity: the reference (/root/reference/main.py:85-109) has no
relational layer at all; these queries define the warehouse envelope the
Spark engine adds on top of its Kafka-consume capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query

_TS = "timestamp_ntz"


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         ROUND(SUM(l_extendedprice), 2) AS supply_value
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT l_partkey, supply_value, s_name, s_acctbal, n_name
  FROM costs, supplier, nation, region
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
), m AS (
  SELECT l_partkey, MIN(supply_value) AS min_value
  FROM eu GROUP BY l_partkey
)
SELECT p_partkey, p_name, s_name, n_name,
       ROUND(s_acctbal, 2) AS s_acctbal, supply_value
FROM eu, m, part
WHERE eu.l_partkey = m.l_partkey AND eu.supply_value = m.min_value
  AND p_partkey = eu.l_partkey AND p_type = 'SMALL' AND p_size <= 15
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the EUROPE supplier with the
    minimum supply value (derived from lineitem — no partsupp table).
    The correlated MIN decorrelates into a window-min over the
    (part, supplier) aggregate: one exchange on l_partkey serves both
    the min and the equality filter (exchange reuse), and the entire
    supplier→nation→region chain broadcasts.  Ties on the min keep all
    tied suppliers (per spec) — no LIMIT, so the result is order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("supply_value")
    )
    eu_sup = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu = costs.join(F.broadcast(eu_sup), costs["l_suppkey"] == eu_sup["s_suppkey"])
    w = Window.partitionBy("l_partkey")
    best = eu.withColumn("min_value", F.min("supply_value").over(w)).where(
        F.col("supply_value") == F.col("min_value")
    )
    return best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"]).select(
        "p_partkey",
        "p_name",
        "s_name",
        "n_name",
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "supply_value",
    )


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order count per priority for one quarter, where the
    order has at least one returned line (adapted predicate: the
    synthetic lineitem has no commit/receipt dates).  EXISTS becomes a
    LEFT SEMI join — the orders side is filtered BEFORE the join (date
    range pushed to the scan) and the semi-join emits each order at
    most once, so no distinct is needed and the count is exact."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast(_TS))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@query(
    "q9_product_type_profit",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem, orders, supplier, part, nation
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND l_partkey = p_partkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%widget%'
GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit per (supplier nation, order year) for one part
    family.  Supply cost is derived as 0.6×retailprice×quantity (no
    partsupp here).  part/supplier/nation all broadcast; the LIKE
    filter prunes the part broadcast before it ships, and lineitem⋈
    orders is the only big edge — at 100 TB AQE turns it into a
    skew-tolerant SMJ while the dims stay broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
    )


@query(
    "q11_important_stock",
    oracle="""
WITH pv AS (
  SELECT l_partkey AS p_partkey,
         ROUND(SUM(l_extendedprice * l_quantity), 2) AS part_value
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT p_partkey, part_value FROM pv
WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM pv)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value (lineitem-derived) from
    one nation's suppliers exceeds a fraction of the total.  The scalar
    subquery decorrelates to a 1-row aggregate broadcast-crossed into
    the filter.  The per-part aggregate subtree appears in BOTH branches
    (threshold and output) as the identical canonicalized plan, so
    physical planning reuses its shuffle exchange (ReusedExchange —
    computed once, read twice) with no persist() and therefore no cached
    DataFrame leaking into the shared session across the 126-query
    sweeps.  Same pattern as analytics.top_revenue_supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nat_sup = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey"
    )
    pv = (
        li.join(F.broadcast(nat_sup), li["l_suppkey"] == nat_sup["s_suppkey"])
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias(
                "part_value"
            )
        )
    )
    threshold = pv.agg((F.sum("part_value") * 0.001).alias("_thr"))
    return pv.join(F.broadcast(threshold)).where(
        F.col("part_value") > F.col("_thr")
    ).select("p_partkey", "part_value")


@query(
    "q12_ship_priority_buckets",
    oracle="""
SELECT l_linestatus AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_returnflag = 'N'
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_bucket
""",
)
def q12_ship_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: high- vs low-priority line counts per ship bucket
    (l_linestatus stands in for the absent l_shipmode).  The lineitem
    predicates push to the parquet scan; the conditional counts are
    map-side partial aggregates, so the single exchange carries only
    (bucket, partial counts) rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast(_TS))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("l_linestatus").alias("ship_bucket"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts, keeping
    zero-order customers via the left outer join (the join-side filter
    must live in the ON clause, not WHERE — pushing it to WHERE would
    silently drop the NULL rows the histogram's 0-bucket needs).  Two
    aggregations: the first shuffles on c_custkey, the second's input
    is only (custkey, count) rows so its exchange is tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"])
        & (o["o_orderpriority"] != "4-NOT SPECIFIED"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("long").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query(
    "q14_promo_effect",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month.  part broadcasts
    (it is the only way to know p_type per line), the date range pushes
    to the lineitem scan, and both sums fold into one map-side partial
    aggregate — the exchange carries exactly one row per partition."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast(_TS))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
        AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
        AND l_quantity BETWEEN 20 AND 40))
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a 3-branch disjunction mixing part and
    lineitem predicates.  Catalyst extracts the common-factor filters:
    the part side prunes to brands 1-3 / size ≤ 30 before broadcasting,
    and l_quantity ≤ 40 pushes to the lineitem scan — the disjunction
    itself evaluates post-join in codegen.  This is the classic
    pushdown-through-OR stress test."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.where(branch).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@query(
    "q20_promo_part_suppliers",
    oracle="""
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem, part
    WHERE l_partkey = p_partkey AND p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 50
  )
""",
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of one nation who moved >50 units of
    any PROMO part in 1996 (availability derived from shipped quantity
    — no partsupp).  The grouped-HAVING subquery becomes an aggregate →
    LEFT SEMI join; supplier⋈nation broadcasts, so the only real work
    is the (suppkey, partkey) aggregate whose input scan is pruned by
    both pushed predicates and the broadcast part filter."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast(_TS))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    movers = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(movers, s["s_suppkey"] == movers["l_suppkey"], "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )
