"""Batch relational operator pack (SURVEY.md §2.2 rows: scans, projection/
filter, joins, aggregations, sorts/limits/top-k, set ops, scalar functions).

The reference contains none of these (SURVEY.md §2.2 audit: all ABSENT —
its only transforms are a Kafka read and a print at
``/root/reference/main.py:85-108,109``); this module is the batch
relational core of the north-star engine.

Every query is a declarative DataFrame plan: Catalyst pushes the filters
and projections into the parquet scan, chooses broadcast-hash joins for the
small dimensions (we hint with ``F.broadcast`` where the dimension side is
known-small at every scale factor), and compiles the rest into whole-stage
codegen.  No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query

# ---------------------------------------------------------------------------
# scans / filter / project
# ---------------------------------------------------------------------------


@query(
    "scan_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       ROUND(l_extendedprice * l_discount, 4) AS disc_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with pushed-down predicates + column pruning.

    ``.explain`` shows PushedFilters on l_shipdate/l_discount/l_quantity and
    a ReadSchema of only the 6 referenced columns — at 100 TB this is the
    difference between scanning ~5% and 100% of the table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the flagship hash aggregate.

    Catalyst compiles this to partial (map-side) + final HashAggregate, so
    the shuffle carries one row per (flag, status, partition) — at 100 TB
    the shuffle is O(groups x partitions), not O(rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal,
       ROUND(AVG(c_acctbal), 6) AS avg_acctbal
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand-based two-phase distinct in Spark)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
    )


@query(
    "rollup_agg",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (Spark Expand operator -> one hash agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@query(
    "cube_agg",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over orders (all 2^2 grouping sets in one pass)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


@query(
    "grouping_sets",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "conditional_agg",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4) AS click_value,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS purchase_value,
       ROUND(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END), 0) AS n_errors
FROM events
GROUP BY user_id
""",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (manual pivot: portable + fast)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)), 4
        ).alias("click_value"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 4
        ).alias("purchase_value"),
        F.round(
            F.sum(F.when(F.col("event_type") == "error", F.lit(1.0)).otherwise(0.0)), 0
        ).alias("n_errors"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@query(
    "inner_join",
    oracle="""
SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
       ROUND(o.o_totalprice, 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'O'
""",
)
def inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders->customer.

    customer is ~1/10 the size of orders at every sf and is explicitly
    broadcast: no shuffle of the fact side at all.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey",
        "c_name",
        "c_mktsegment",
        F.round("o_totalprice", 2).alias("total_price"),
    )


@query(
    "multi_join_star",
    oracle="""
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_lineitems
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
""",
)
def multi_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (TPC-H-Q5 shape): revenue by nation.

    Dimension chain region->nation->customer is broadcast end-to-end; the
    only shuffle is lineitem x orders (both fact-sized), which AQE can
    convert to broadcast at low sf and skew-split at high sf.
    """
    r = load_table(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "semi_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
""",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS (emits each customer at most once)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join == NOT EXISTS (customers with no orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "outer_join_agg",
    oracle="""
SELECT c.c_custkey, c.c_name,
       COUNT(o.o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + aggregate, null-safe counts for orderless customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "range_join",
    oracle="""
SELECT p.event_id, p.user_id,
       COUNT(e.event_id) AS n_following,
       ROUND(COALESCE(SUM(e.value), 0), 4) AS following_value
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND CAST(e.ts AS TIMESTAMP) >  CAST(p.ts AS TIMESTAMP)
 AND CAST(e.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP) + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
""",
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: activity within 1h after each purchase.

    Equi-key on user_id keeps the join hash-partitioned; the temporal range
    is a post-probe filter. At 100 TB the equi-key bounds the blow-up to
    per-user event counts (salt hot users if skewed).
    """
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = p.join(
        e,
        (e.user_id == p.p_user_id)
        & (e.ts > p.p_ts)
        & (e.ts <= p.p_ts + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy(
        F.col("p_event_id").alias("event_id"), F.col("p_user_id").alias("user_id")
    ).agg(
        F.count("event_id").alias("n_following"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias("following_value"),
    )


@query(
    "asof_join",
    oracle="""
WITH ordered AS (
  SELECT event_id, user_id, ts, event_type, value,
         LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
  FROM events
)
SELECT event_id, user_id, ROUND(COALESCE(last_purchase_value, -1), 4) AS last_purchase_value
FROM ordered WHERE event_type = 'click'
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the most recent purchase value <= ts.

    Implemented as a single-pass window (last non-null over ordered rows)
    instead of a per-row backward search — one shuffle on user_id, no
    quadratic probe. This is the scalable as-of pattern when the 'quote'
    and 'trade' streams share a table; for two tables, union them with a
    side tag first.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    masked = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        e.withColumn("last_purchase_value", F.last(masked, ignorenulls=True).over(w))
        .where(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.round(F.coalesce("last_purchase_value", F.lit(-1.0)), 4).alias(
                "last_purchase_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "sort_limit",
    oracle="""
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
""",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT => TakeOrderedAndProject: per-partition top-10 then
    merge — never a global sort. Deterministic tiebreak on the key cols."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total_price,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number — the scalable top-k idiom
    (no global sort; Spark's WindowGroupLimit pushes the k-limit into the
    shuffle read at execution time)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "rn")
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@query(
    "set_ops",
    oracle="""
SELECT 'union' AS op, k FROM (
  SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect' AS op, k FROM (
  SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except' AS op, k FROM (
  SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) in one tagged result."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    u = c.union(s).distinct().withColumn("op", F.lit("union"))
    i = c.intersect(s).withColumn("op", F.lit("intersect"))
    x = c.subtract(s).withColumn("op", F.lit("except"))  # EXCEPT DISTINCT
    return u.unionByName(i).unionByName(x).select("op", "k")


# ---------------------------------------------------------------------------
# scalar functions (string / date / math / json)
# ---------------------------------------------------------------------------


@query(
    "scalar_functions",
    oracle="""
SELECT o_orderkey,
       UPPER(o_orderpriority) AS prio_upper,
       SUBSTR(o_orderpriority, 1, 1) AS prio_code,
       LENGTH(o_orderstatus) AS status_len,
       o_orderpriority || '/' || o_orderstatus AS prio_status,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month,
       STRFTIME(o_orderdate, '%Y-%m') AS order_ym,
       ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
       ROUND(LN(o_totalprice + 1), 6) AS price_ln,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_kbucket,
       REGEXP_EXTRACT(o_orderpriority, '([0-9]+)-', 1) AS prio_num
FROM orders
WHERE o_orderkey % 7 = 0
""",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function pack: string, date, math, regex — all JVM built-ins
    inside one whole-stage-codegen projection."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("/", "o_orderpriority", "o_orderstatus").alias("prio_status"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_kbucket"),
        F.regexp_extract("o_orderpriority", r"([0-9]+)-", 1).alias("prio_num"),
    )


@query(
    "json_extract_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_distinct_k
FROM events
GROUP BY event_type
""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column.

    ``get_json_object`` runs JVM-side; for hot paths with a fixed schema,
    ``from_json(props, 'k INT')`` is equivalent and lets Catalyst prune.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


@query(
    "skew_salted_join",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS segment_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join: orders salted on o_orderkey into 8 shards,
    customer replicated ×8, join on (custkey, salt)
    (operators/skew.py::salted_join).  A hot customer's orders now land
    on 8 reducers instead of 1.  Salting is result-invariant, so the
    oracle is the plain unsalted SQL — the hash check proves semantics
    are preserved.  (At this dim size you'd broadcast instead; salting
    is the shape for when BOTH a shuffle is unavoidable and keys are
    hot — AQE skew-split covers SMJ, salting covers everything.)
    """
    from odni_apache_beam_consumer_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    j = salted_join(o, c, "o_custkey", n_salt=8, fact_row_key="o_orderkey")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("segment_revenue"),
    )


@query(
    "percentile_stats",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
       ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
       ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (linear interpolation — matches
    DuckDB quantile_cont).  Exact percentile shuffles every value to its
    group; at 100 TB swap in approx_percentile (t-digest sketch,
    map-side mergeable, bounded memory) — same call shape, documented
    here as the scale path.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # One array-percentile aggregate per column: a single sort buffer per
    # (group, column) instead of one per requested quantile.
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("pp"),
            F.expr("percentile(l_quantity, 0.5)").alias("pq"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("pp")[0], 6).alias("p50_price"),
            F.round(F.col("pp")[1], 6).alias("p90_price"),
            F.round(F.col("pp")[2], 6).alias("p99_price"),
            F.round("pq", 6).alias("p50_qty"),
        )
    )


@query(
    "interval_overlap_join",
    oracle="""
WITH a AS (
  SELECT event_id AS a_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS a_start,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
           + 60 * CAST(FLOOR(LEAST(GREATEST(value, 1.0), 120.0)) AS BIGINT) AS a_end
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT event_id AS b_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS b_start,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
           + 60 * CAST(FLOOR(LEAST(GREATEST(value, 1.0), 120.0)) AS BIGINT) AS b_end
  FROM events WHERE event_type = 'click'
)
SELECT a_id, b_id FROM a, b
WHERE a_start <= b_end AND b_start <= a_end
""",
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join with NO equi-key (the genomics/session-overlap
    shape): every (purchase, click) pair whose activity intervals
    [ts, ts + min(max(value,1),120) minutes] intersect.

    A naive plan is a BroadcastNestedLoopJoin over the full cross product
    — quadratic, cluster-killing.  The scale shape is BINNED BLOCKING:
    quantize time into fixed bins sized ≥ the max interval length (4 h
    here, ≥ the 120-min duration cap), explode each interval to the ≤2
    bins it touches, equi-join on the bin (hash-partitioned, bounded
    buckets), then apply the exact overlap predicate and dedupe pairs
    that shared two bins.  Cost is O(pairs-per-bin), not O(n²); bin width
    trades fan-out (rows shipped) against bucket size (join work).  With
    a natural second key (user, chromosome, tenant) the bin compounds
    with it — same plan, smaller buckets.  The duration cap is the same
    hot-bucket guard the LSH operators use (operators/dedup.py).

    The DuckDB oracle runs the exact quadratic form (its IEJoin handles
    it at test scale), proving the blocked plan loses no pairs."""
    e = load_table(spark, sf_dir, "events")
    bin_sz = 14400  # 4 h ≥ the 120-min duration cap → ≤ 2 bins/interval

    def intervals(typ: str, p: str) -> DataFrame:
        dur_min = F.least(F.greatest(F.col("value"), F.lit(1.0)), F.lit(120.0)).cast(
            "long"
        )
        start = F.unix_timestamp("ts")
        return e.where(F.col("event_type") == typ).select(
            F.col("event_id").alias(f"{p}_id"),
            start.alias(f"{p}_start"),
            (start + 60 * dur_min).alias(f"{p}_end"),
        )

    def binned(df: DataFrame, p: str) -> DataFrame:
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{p}_start") / bin_sz),
                    F.floor(F.col(f"{p}_end") / bin_sz),
                )
            ),
        )

    a = binned(intervals("purchase", "a"), "a")
    b = binned(intervals("click", "b"), "b")
    return (
        a.join(
            b,
            (a["bin"] == b["bin"])
            & (a["a_start"] <= b["b_end"])
            & (b["b_start"] <= a["a_end"]),
        )
        .select("a_id", "b_id")
        .distinct()
    )


@query(
    "set_ops_bag",
    oracle="""
SELECT 'intersect_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT c_nationkey AS k FROM customer
  INTERSECT ALL
  SELECT s_nationkey FROM supplier) GROUP BY k
UNION ALL
SELECT 'except_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT c_nationkey AS k FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier) GROUP BY k
""",
)
def set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    multiplicities (a key appearing 60x in customer and 2x in supplier
    survives EXCEPT ALL 58 times, vs 0 under DISTINCT semantics).  The
    distinction matters for reconciliation workloads: "which rows of the
    new load are NOT already present, counted per copy".  Both engines
    implement bag semantics by min/difference of per-key counts — one
    hash shuffle per side; the output here is rolled up per key so the
    oracle hash stays order-insensitive."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    ia = (
        c.intersectAll(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    xa = (
        c.exceptAll(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return ia.unionByName(xa).select("op", "k", "n")


@query(
    "array_functions",
    oracle="""
WITH g AS (
  SELECT l_orderkey,
         list_sort(list(CAST(l_quantity AS INT))) AS q
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(q) AS INT) AS n_lines,
       CAST(list_aggregate(q, 'sum') AS BIGINT) AS total_qty,
       CAST(len(list_filter(q, x -> x >= 25)) AS INT) AS n_large,
       CAST(q[len(q)] AS INT) AS max_qty,
       array_to_string(list_transform(q, x -> CAST(x * 2 AS VARCHAR)), ',')
         AS doubled_csv
FROM g
""",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function pack over collected-per-key arrays:
    sort, size, fold-sum, lambda filter, positional max, transform +
    join — the nested-data manipulation surface (Spark's
    transform/filter/aggregate higher-order functions, all JVM-side
    codegen, zero Python).  The per-key array is SORTED first so every
    downstream value is independent of aggregation arrival order — the
    discipline that makes collect_list usable under a hash-comparing
    oracle at all.  One hash shuffle to build the arrays; everything
    after is map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("int"))).alias("q")
    )
    return g.select(
        "l_orderkey",
        F.size("q").alias("n_lines"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "total_qty"
        ),
        F.size(F.filter("q", lambda x: x >= 25)).alias("n_large"),
        F.element_at("q", -1).alias("max_qty"),
        F.array_join(
            F.transform("q", lambda x: (x * 2).cast("string")), ","
        ).alias("doubled_csv"),
    )


@query(
    "map_functions",
    oracle="""
WITH pairs AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
m AS (
  SELECT user_id,
         list_sort(list(event_type)) AS ks,
         COUNT(*) AS n_types,
         string_agg(event_type || '=' || CAST(n AS VARCHAR), ','
                    ORDER BY event_type) AS map_str
  FROM pairs GROUP BY user_id
)
SELECT user_id, CAST(n_types AS INT) AS n_types,
       ks[1] AS first_key, map_str
FROM m
""",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type manipulation: per user, a map of event_type -> count is
    built (map_from_entries over a SORTED entry array), then consumed via
    map_keys / element_at / a transform-join serialization.  The map is
    emitted as a canonical sorted "k=v,k=v" string because map column
    ordering is engine-dependent — serializing through sorted keys is
    exactly what a hash-comparable (or cache-keyed) map output requires
    in production too.  One hash shuffle to the (user, type) grain, one
    to the user grain; map ops are map-side JVM codegen."""
    e = load_table(spark, sf_dir, "events")
    pairs = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = pairs.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    keys = F.map_keys("m")  # entries were sorted, so keys are sorted
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at(keys, 1).alias("first_key"),
        F.array_join(
            F.transform(
                keys,
                lambda k: F.concat(
                    k, F.lit("="), F.element_at("m", k).cast("string")
                ),
            ),
            ",",
        ).alias("map_str"),
    )
