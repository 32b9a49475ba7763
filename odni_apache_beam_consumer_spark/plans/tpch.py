"""TPC-H-shaped composite queries: the canonical warehouse join/agg
patterns (Q5 local-supplier volume, Q8 market share, Q16 supplier-count
buckets, Q22 dormant high-balance customers) over the engine's tables.

These aren't new operators — every primitive already exists in
relational.py — they're the *composition* stress tests: 6-way join
ordering, two-level conditional aggregation, NOT-IN decorrelation, and
anti-join + scalar-subquery together.  Catalyst must produce the star
shape (broadcast dims, single fact exchange) for each; the plan suite
asserts no cartesians/sort-merge fallbacks on the dimension chains.

Adapted to the synthetic schema (TESTDATA.md): no partsupp/comment/
shipmode columns, nations named NATION_<k>, part types from a small
enum — predicates pick from those domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query

_TS = "timestamp_ntz"


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where customer and supplier share the
    nation, one region, one year.  Six-way join — the nation/region/
    supplier chain broadcasts, lineitem⋈orders⋈customer carries the
    c_nationkey = s_nationkey cross-filter.  The region predicate prunes
    the broadcast side BEFORE it ships, so the fact scan is the only
    full pass at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast(_TS))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast(_TS))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
WITH all_sales AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         s_nationkey
  FROM lineitem, orders, supplier, part
  WHERE l_orderkey = o_orderkey
    AND l_suppkey = s_suppkey
    AND l_partkey = p_partkey
    AND p_type = 'ECONOMY'
)
SELECT o_year,
       ROUND(SUM(CASE WHEN s_nationkey = 3 THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM all_sales
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a part type's sales per year —
    two-level aggregation folded to one pass via conditional SUM (the
    numerator is a CASE inside the same groupBy, never a second scan or a
    self-join).  Ratio rounded identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("s_nationkey") == 3, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q16_supplier_part_buckets",
    oracle="""
SELECT p_brand, p_type,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
  AND p_size >= 20
GROUP BY p_brand, p_type
""",
)
def q16_supplier_part_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type) bucket with a
    NOT-IN brand exclusion.  The exclusion is a static literal filter
    pushed into the broadcast part scan; COUNT(DISTINCT) expands to a
    two-stage partial aggregation (distinct (group, suppkey) first, count
    second), both map-side combined."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (~F.col("p_brand").isin("Brand#1", "Brand#2")) & (F.col("p_size") >= 20)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q22_dormant_customers",
    oracle="""
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    orders, grouped by segment.  The scalar average attaches as a
    single-row broadcast; the no-orders condition is a LEFT ANTI hash
    join against the (deduplicated) customer keys of orders — at scale
    the anti join shuffles both sides on custkey once, and the orders
    side pre-aggregates to distinct keys before the exchange."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .groupBy()
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one market
    segment.  Both date predicates push into their scans; the segment
    filter prunes the broadcast customer side before it ships.  The final
    ORDER BY+LIMIT is a TakeOrderedAndProject — only 10 rows per
    partition ever cross the last exchange, so the top-k is O(partitions)
    at any scale.  Tie-broken on l_orderkey for determinism."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast(_TS)
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast(_TS)
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey
  AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations per year.
    The nation pair disjunction lives on the joined row, NOT as a join
    condition — both nation lookups stay cheap broadcast equi-joins and
    the OR becomes a post-join filter Catalyst can't turn into a
    cartesian.  supplier and customer broadcast; lineitem⋈orders is the
    only big exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
         AS BIGINT) AS revenue_cents,
       n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue from returned items in
    one quarter-pair.  Return-flag and date predicates push into the two
    fact scans; customer and nation broadcast onto the fact row; top-20
    via TakeOrderedAndProject (no global sort materialization).

    Revenue is integer centi-units (per-row FLOOR before the SUM): the
    original ROUND(SUM(double), 2) crossed a cent boundary on 2 of 20
    rows at the 10x synthetic sweep — double summation order differs
    between engines in the last ulp, and a ranking keyed on the rounded
    double is then engine-dependent too.  Integer cents make both the
    value and the top-20 cut order-independent."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast(_TS))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_cents")
        )
        .select("c_custkey", "c_name", "revenue_cents", "n_name")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
) pa ON a_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity orders of one brand's
    parts, vs each part's own average order size — the canonical
    correlated scalar subquery, decorrelated by hand into a per-part
    aggregate joined back on partkey.  The per-part average table is
    part-cardinality (tiny next to lineitem), so it BROADCASTS back onto
    the fact scan: lineitem is read twice but never shuffled.  At 100 TB
    the second read is the cheaper trade vs shuffling the fact table on
    l_partkey once."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(per_part), li["l_partkey"] == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       ROUND(o_totalprice, 2) AS total_price,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
  )
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order above a quantity threshold.
    The IN-subquery decorrelates to a LEFT SEMI join against the
    HAVING-filtered per-order aggregate.  The qualifying-order set is
    tiny (tail of the distribution), so it broadcasts into the semi join
    — the orders and lineitem scans never shuffle for the membership
    test, only the final small groupBy exchanges."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(
            F.broadcast(big), li["l_orderkey"] == F.col("big_orderkey"), "left_semi"
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


@query(
    "q21_sole_return_supplier",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
           AS n_ret_supp
  FROM lineitem GROUP BY l_orderkey
),
culprit AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN per_order p ON l.l_orderkey = p.l_orderkey
  WHERE p.n_supp > 1 AND p.n_ret_supp = 1 AND l.l_returnflag = 'R'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM culprit JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
""",
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who alone let an order down), adapted
    to this schema's return flag: on multi-supplier orders where exactly
    one supplier had a returned line, count such orders per culprit
    supplier.  The classic form is EXISTS(other supplier) AND NOT
    EXISTS(other late supplier) — two correlated self-joins over the
    fact table.  Here both decorrelate into ONE per-order aggregate
    (distinct-supplier and distinct-returning-supplier counts), joined
    back on l_orderkey: 2 fact-table shuffles total instead of 3
    self-join passes, and the pattern survives skew because the
    per-order group is bounded by lines-per-order."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    culprit = (
        li.where(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        culprit.join(F.broadcast(s), culprit["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000) AS BIGINT))
            AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) — the canonical
    filter-and-aggregate: the q6 predicates over lineitem collapsed to
    ONE global sum.  scan_filter_project drives the same predicate
    pushdown per row; this is the missing single-aggregate form, the
    benchmark's purest scan-throughput probe.  Revenue carried as
    FLOOR(price*discount*1e4) integer e4 units so the one-row sum is
    bit-identical across engines (the registry's float-sum discipline).

    Scale shape: PushedFilters prune the scan (at 100 TB, shipdate
    partition pruning does most of the work), map-side partial
    aggregation collapses each task to one row, and the final exchange
    carries n_tasks rows — the cheapest possible distributed query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * F.col("l_discount") * 10000
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_e4"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
