"""Governance & ops-diagnostics pack: point-in-time (SCD2) temporal join,
k-anonymity audit, key-skew diagnostics, dataset content digest, quantile
feature binning.

The reference computes none of these (its sole transform is a Kafka read
piped to print, ``/root/reference/main.py:85-109``); this pack covers the
data-governance and operational-diagnostics surface a 100 TB training-data
platform needs around the core operators: "was this release k-anonymous",
"which join key will skew", "are these two replicas byte-identical",
"what dimension value was current when the fact happened".

Scale themes:
- the temporal join is keyed (user_id) — per-key fan-out is bounded by
  versions-per-user, never all-pairs;
- the skew report aggregates to key-cardinality size before any ordering,
  and its global ratios come from a second tiny aggregate (1 row,
  broadcast) — the fact table is scanned once;
- the content digest is mergeable: 256 hash-bucket summaries that can be
  computed per partition/replica and compared cheaply — the standard way
  to diff two 100 TB copies without co-locating them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query

# ---------------------------------------------------------------------------
# point-in-time (SCD2) temporal join
# ---------------------------------------------------------------------------


@query(
    "point_in_time_join",
    oracle="""
WITH status AS (
  SELECT user_id, event_type AS status, ts AS valid_from, event_id,
         COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  TIMESTAMP '9999-12-31 00:00:00') AS valid_to
  FROM events WHERE event_type IN ('signup', 'error')
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       COALESCE(s.status, 'unknown') AS status_at_purchase,
       COALESCE(STRFTIME(s.valid_from, '%Y-%m-%d %H:%M:%S'), '') AS status_since,
       ROUND(p.value, 4) AS value
FROM purchases p
LEFT JOIN status s
  ON s.user_id = p.user_id AND s.valid_from <= p.ts AND p.ts < s.valid_to
""",
)
def point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of facts to a type-2 dimension: each purchase is
    joined to the user status (here: last signup/error marker) that was
    valid AT the purchase timestamp — the canonical "what did the
    dimension look like when the fact happened" query over an SCD2
    history.

    Shape: the dimension history is built with one window shuffle on the
    dimension key (LEAD gives closed-open validity intervals, so exactly
    one version matches any instant); the fact join is an EQUI-join on
    user_id with the interval predicate applied as a post-join filter —
    per-key fan-out is bounded by versions-per-user, never all-pairs.
    Purchases before the first status version survive the left join as
    'unknown'.  At 100 TB both sides shuffle-partition on user_id once;
    a hot user's versions stay dimension-sized so AQE skew-split covers
    the fact side."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    status = (
        e.where(F.col("event_type").isin("signup", "error"))
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            F.coalesce(
                F.lead("ts").over(w),
                F.lit("9999-12-31 00:00:00").cast("timestamp"),
            ).alias("valid_to"),
        )
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return (
        p.join(
            status.withColumnRenamed("user_id", "s_user_id"),
            (p["user_id"] == F.col("s_user_id"))
            & (F.col("valid_from") <= p["ts"])
            & (p["ts"] < F.col("valid_to")),
            "left",
        )
        .select(
            p["event_id"],
            p["user_id"],
            F.date_format(p["ts"], "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.coalesce(F.col("status"), F.lit("unknown")).alias(
                "status_at_purchase"
            ),
            F.coalesce(
                F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss"), F.lit("")
            ).alias("status_since"),
            F.round(p["value"], 4).alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------


@query(
    "k_anonymity_audit",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CASE WHEN COUNT(*) < 10 THEN 1 ELSE 0 END AS at_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before a data release: group by the
    quasi-identifier combination (nation, market segment) and flag
    equivalence classes smaller than k=10 — rows in those groups are
    re-identifiable and must be suppressed or generalized.

    Shape: one partial-aggregated hash shuffle on the QI columns; output
    is QI-cardinality-sized.  At 100 TB this is the same single-scan agg —
    the audit cost is independent of row width, and the at-risk flag is
    computed post-aggregate (no second pass)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.when(F.count(F.lit(1)) < 10, F.lit(1)).otherwise(F.lit(0)).alias(
            "at_risk"
        ),
    )


# ---------------------------------------------------------------------------
# join-key skew diagnostics
# ---------------------------------------------------------------------------


@query(
    "skew_diagnostics",
    oracle="""
WITH kc AS (
  SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS key_rows
  FROM lineitem GROUP BY l_suppkey
),
tot AS (
  SELECT CAST(SUM(key_rows) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM kc
)
SELECT key, key_rows,
       CAST(key_rows * 1000000 // tot.total_rows AS BIGINT) AS share_ppm,
       CAST(key_rows * tot.n_keys * 10000 // tot.total_rows AS BIGINT)
         AS skew_ratio_bp,
       CAST((key_rows * tot.n_keys + tot.total_rows - 1) // tot.total_rows
            AS BIGINT) AS suggested_salt
FROM kc CROSS JOIN tot
ORDER BY key_rows DESC, key ASC
LIMIT 10
""",
)
def skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report: the 10 hottest l_suppkey values with their
    row share, skew ratio (key_rows / mean key_rows) and the salt factor
    a salted join would need (ceil of the ratio) — the pre-flight check
    run before shuffling a 100 TB fact table on a candidate key, feeding
    directly into operators/skew.py::salted_join.

    Shape: one partial-aggregated hash shuffle to key cardinality; the
    global totals are a second aggregate OVER THE KEY-COUNT table (not
    the fact table — it is scanned once) yielding one row, broadcast-
    crossed back in; final order is TakeOrdered top-10, never a global
    sort."""
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("key_rows")
    )
    tot = kc.agg(
        F.sum("key_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    # All three derived columns are integer arithmetic (ppm / basis points
    # / ceil-div) rather than ROUND on a double ratio: int-ratio quotients
    # can land exactly on a decimal rounding boundary, which DuckDB and
    # the JVM resolve differently (the sequence_packing bug class).
    return (
        kc.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "key_rows",
            F.expr("CAST(key_rows * 1000000 DIV total_rows AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(
                "CAST(key_rows * n_keys * 10000 DIV total_rows AS BIGINT)"
            ).alias("skew_ratio_bp"),
            F.expr(
                "CAST((key_rows * n_keys + total_rows - 1) DIV total_rows"
                " AS BIGINT)"
            ).alias("suggested_salt"),
        )
        .orderBy(F.desc("key_rows"), F.asc("key"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# dataset content digest
# ---------------------------------------------------------------------------


@query(
    "dataset_content_digest",
    oracle="""
WITH canon AS (
  SELECT md5(CONCAT_WS('|',
           CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
           CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
           CAST(CAST(ROUND(l_quantity, 2) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)) AS VARCHAR),
           l_returnflag, l_linestatus,
           STRFTIME(l_shipdate, '%Y-%m-%d'))) AS h
  FROM lineitem
)
SELECT substr(h, 1, 2) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(h) AS min_hash,
       MAX(h) AS max_hash
FROM canon GROUP BY substr(h, 1, 2)
""",
)
def dataset_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive dataset digest: every row is canonicalized to a
    fixed-format string, md5-hashed, and summarized into 256 hash-prefix
    buckets (count + min/max row hash per bucket).  Two replicas of a
    table are content-identical iff their digests match; a single changed
    /missing row perturbs exactly one bucket, so a mismatch also localizes
    WHERE to look (drill into the one differing bucket).

    Shape: one scan + one partial-aggregated shuffle to 256 rows — the
    cheapest way to diff two 100 TB copies living in different regions
    without moving either (ship the 256-row digest, not the data).  The
    canonical string pins float formatting via DECIMAL(18,2) so both
    engines (and any future replica checker) render identical text."""
    li = load_table(spark, sf_dir, "lineitem")
    canon = F.md5(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.round("l_quantity", 2).cast("decimal(18,2)").cast("string"),
            F.round("l_extendedprice", 2).cast("decimal(18,2)").cast("string"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.date_format("l_shipdate", "yyyy-MM-dd"),
        )
    )
    return (
        li.select(canon.alias("h"))
        .groupBy(F.substring("h", 1, 2).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
        )
    )


# ---------------------------------------------------------------------------
# quantile feature binning
# ---------------------------------------------------------------------------


@query(
    "quantile_binning",
    oracle="""
WITH q AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.50) AS q2,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders GROUP BY o_orderpriority
),
binned AS (
  SELECT o.o_orderpriority,
         CASE WHEN o.o_totalprice <= q.q1 THEN 1
              WHEN o.o_totalprice <= q.q2 THEN 2
              WHEN o.o_totalprice <= q.q3 THEN 3
              ELSE 4 END AS bin,
         o.o_totalprice
  FROM orders o JOIN q USING (o_orderpriority)
)
SELECT o_orderpriority, bin,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi,
       ROUND(AVG(o_totalprice), 4) AS avg_price
FROM binned GROUP BY o_orderpriority, bin
""",
)
def quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile feature discretization: bucket order value into per-
    priority quartile bins (the feature-engineering step that turns a
    heavy-tailed numeric into a 4-level categorical before training),
    reporting per-bin count/lo/hi/mean.

    Shape: the boundary table is one row per category (exact interpolated
    percentile here; at 100 TB swap approx_percentile — identical call
    shape, t-digest sketch, bounded memory) so it broadcasts; bin
    assignment is a map-side CASE on the fact scan, and the final rollup
    is one hash shuffle to (category × 4) rows.  No global sort, no
    NTILE-style single-partition window."""
    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    bin_col = (
        F.when(F.col("o_totalprice") <= F.col("q1"), F.lit(1))
        .when(F.col("o_totalprice") <= F.col("q2"), F.lit(2))
        .when(F.col("o_totalprice") <= F.col("q3"), F.lit(3))
        .otherwise(F.lit(4))
    )
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .select("o_orderpriority", bin_col.alias("bin"), "o_totalprice")
        .groupBy("o_orderpriority", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "l_diversity_audit",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS priority,
         CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS order_year,
         o_orderstatus
  FROM orders
)
SELECT priority, order_year,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS l_distinct,
       COUNT(DISTINCT o_orderstatus) >= 2 AS l_diverse
FROM g
GROUP BY priority, order_year
""",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.) — the companion to
    k_anonymity_audit: k-anonymity bounds how FEW people share a
    quasi-identifier group, but a group whose sensitive attribute is
    CONSTANT still leaks it for everyone in the group (the homogeneity
    attack).  Per (order priority, order year) QI group, count distinct
    order statuses and flag groups below l = 2 — the release gate runs
    BOTH audits before publishing.

    Scale shape: ONE hash aggregation with a distinct-count (two-phase:
    partial distinct sets per partition, exact merge on the QI key);
    output is QI-cardinality-sized.  At 100 TB the distinct count would
    swap to approx_count_distinct for the monitoring dashboard, with
    this exact form reserved for the release gate itself."""
    g = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy").cast("long").alias("order_year"),
        "o_orderstatus",
    )
    return g.groupBy("priority", "order_year").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("o_orderstatus").cast("long").alias("l_distinct"),
        (F.countDistinct("o_orderstatus") >= 2).alias("l_diverse"),
    )


@query(
    "t_closeness_audit",
    oracle="""
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR((c_acctbal + 1000.0) / 2000.0) AS BIGINT) AS sbucket
  FROM customer
),
gdist AS (
  SELECT sbucket, CAST(COUNT(*) AS BIGINT) AS g_cnt FROM c GROUP BY sbucket
),
gtot AS (SELECT CAST(SUM(g_cnt) AS BIGINT) AS n_all FROM gdist),
grp AS (
  SELECT c_nationkey, c_mktsegment, sbucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2, 3
),
gsz AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS n_grp
  FROM grp GROUP BY 1, 2
),
grid AS (
  SELECT gsz.c_nationkey, gsz.c_mktsegment, gsz.n_grp,
         gdist.sbucket, gdist.g_cnt, gtot.n_all,
         COALESCE(grp.cnt, 0) AS cnt
  FROM gsz CROSS JOIN gdist CROSS JOIN gtot
  LEFT JOIN grp ON grp.c_nationkey = gsz.c_nationkey
              AND grp.c_mktsegment = gsz.c_mktsegment
              AND grp.sbucket = gdist.sbucket
)
SELECT c_nationkey, c_mktsegment,
       CAST(MAX(n_grp) AS BIGINT) AS group_size,
       CAST(SUM(ABS(cnt * 1000000 // n_grp - g_cnt * 1000000 // n_all)) // 2
            AS BIGINT) AS t_ppm,
       CAST(SUM(ABS(cnt * 1000000 // n_grp - g_cnt * 1000000 // n_all)) // 2
            > 200000 AS BOOLEAN) AS breach
FROM grid
GROUP BY c_nationkey, c_mktsegment
""",
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. ICDE'07), completing the
    k-anonymity / l-diversity release-gate triad: for every
    quasi-identifier group, the variational distance between its
    sensitive-attribute distribution (account-balance bucket) and the
    GLOBAL distribution, flagged when above t = 0.2.  l-diversity can
    pass while a group's distribution still leaks (skewness attack) —
    t-closeness is the gate that catches it.

    Distance is exact integer ppm: per-bucket shares via integer DIV on
    both the group and global side, summed |difference| halved.  The
    bucket grid is completed with zero-count cells (a MISSING bucket in
    a group is the leak signal, |0 - p_global|), via a broadcast cross
    of the per-group sizes against the ~6-bucket global table.

    Scale shape: two hash aggs over the table (group x bucket, and
    global bucket) + a broadcast grid join sized |QI groups| x |buckets|
    — never row-scale; the same single-scan audit cost as
    k_anonymity_audit."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor((F.col("c_acctbal") + 1000.0) / 2000.0)
        .cast("long")
        .alias("sbucket"),
    )
    glob = c.groupBy("sbucket").agg(F.count(F.lit(1)).cast("long").alias("g_cnt"))
    gtot = glob.agg(F.sum("g_cnt").cast("long").alias("n_all"))
    grp = c.groupBy("c_nationkey", "c_mktsegment", "sbucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    gsz = grp.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("long").alias("n_grp")
    )
    grid = (
        gsz.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(gtot))
        .join(grp, ["c_nationkey", "c_mktsegment", "sbucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    diff = F.expr(
        "ABS(cnt * 1000000 DIV n_grp - g_cnt * 1000000 DIV n_all)"
    )
    return (
        grid.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("n_grp").cast("long").alias("group_size"),
            (F.sum(diff) / 2).cast("long").alias("t_ppm"),
        )
        .withColumn("breach", F.col("t_ppm") > 200000)
    )
