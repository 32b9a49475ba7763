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
