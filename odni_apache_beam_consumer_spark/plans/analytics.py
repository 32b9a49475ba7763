"""Analytics pack: statistical aggregates, histograms, CDC merge/upsert,
time-series gap-fill, funnel analysis, tf-idf, data profiling.

The reference computes none of these (its sole transform is a Kafka read
piped to print, ``/root/reference/main.py:85-109``); these queries close
the remaining "what a warehouse user actually runs daily" surface on top
of the relational/window/LLM packs.

Scale notes are per-query; the common themes:
- every query is one or two hash-shuffles on a natural key — no global
  windows, no driver-side loops;
- CDC merge is the merge-on-read compaction shape (union + keep-latest
  per key), the strategy behind Delta/Iceberg MERGE at 100 TB;
- gap-fill generates the dense spine with ``sequence``/``explode``
  (JVM-side, one row per group before the explode) instead of a driver
  loop or a cross join against a materialized calendar table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from odni_apache_beam_consumer_spark.catalog import load_table, spread
from odni_apache_beam_consumer_spark.operators.text_ops import with_tokens
from odni_apache_beam_consumer_spark.plans.registry import query

# ---------------------------------------------------------------------------
# statistical aggregates
# ---------------------------------------------------------------------------


@query(
    "stats_agg",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev,
       ROUND(var_samp(l_quantity), 6) AS qty_var,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates (corr / covar / stddev / var /
    regression slope) per return flag.  All are algebraic aggregates with
    exact partial states (sum, sum², sum of products) — map-side partial
    aggregation collapses each partition to one state row per group before
    the shuffle, so the exchange carries O(groups), not O(rows), at any
    scale.  Results rounded on both engines so summation order can't flip
    the last float digit."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(
            F.covar_samp("l_quantity", "l_extendedprice")
            / F.var_samp("l_quantity"),
            6,
        ).alias("price_per_qty"),
    )


@query(
    "histogram_quantity",
    oracle="""
SELECT CAST(FLOOR(l_quantity / 5.0) AS BIGINT) AS bucket,
       5.0 * FLOOR(l_quantity / 5.0) AS bucket_lo,
       COUNT(*) AS n_lines,
       ROUND(AVG(l_extendedprice), 4) AS avg_price
FROM lineitem
GROUP BY 1, 2
""",
)
def histogram_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of line quantities (width-5 buckets) with a
    per-bucket price average.  Bucketing is a pure projection (no
    pre-shuffle explode); the groupBy keys on ~10 buckets, so the shuffle
    after map-side partial aggregation is a few rows per partition — the
    cheapest possible distribution sketch of a 100 TB column."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_quantity") / 5.0)
    return (
        li.groupBy(
            bucket.cast("bigint").alias("bucket"),
            (bucket * 5.0).alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# CDC / upsert
# ---------------------------------------------------------------------------


@query(
    "latest_event_per_user",
    oracle="""
SELECT user_id, event_id, event_type, ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-compaction / changelog-upsert: keep the newest event per user.
    row_number over (user_id, ts DESC) — at 100 TB this is one shuffle on
    the key; Spark's WindowGroupLimit pushes the rn=1 filter into the sort
    so each partition keeps one row per key instead of materializing the
    full ranked set.  event_id desc breaks same-timestamp ties
    deterministically.  This is the batch dual of the streaming
    ``dedup_within_watermark`` operator."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


@query(
    "cdc_merge_upsert",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         ROUND(o_totalprice + 1000.0, 2) AS o_totalprice, 1 AS src
  FROM orders WHERE o_orderkey % 10 = 0
),
base AS (
  SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice, 0 AS src
  FROM orders
),
merged AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
)
SELECT o_orderkey, o_orderstatus, o_totalprice FROM merged WHERE rn = 1
""",
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics without a table format: apply a CDC batch
    (here derived deterministically: every 10th order re-priced +1000,
    status 'U'; an additive delta stays exact in doubles, a multiplicative
    one hits round-half tie divergence between engines) onto the base snapshot — union the two sides tagged with a
    source priority, keep the highest-priority row per key.  This is
    merge-on-read compaction, the same physical shape Delta/Iceberg MERGE
    lowers to: ONE shuffle on the merge key regardless of update-batch
    size, and at 100 TB the base side's scan prunes to only the partitions
    the update keys touch (partition-level predicate from the update
    batch's key min/max)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(0).alias("src"),
    )
    updates = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") + 1000.0, 2).alias("o_totalprice"),
            F.lit(1).alias("src"),
        )
    )
    w = W.partitionBy("o_orderkey").orderBy(F.desc("src"))
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "scd2_user_history",
    oracle="""
SELECT user_id, event_type AS status,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       COALESCE(STRFTIME(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                '9999-12-31 00:00:00') AS valid_to,
       CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each user's event stream
    becomes validity intervals (valid_from = event ts, valid_to = next
    event's ts, open interval sentinel '9999-12-31' + is_current flag).
    One window shuffle on the dimension key — the standard way to derive a
    point-in-time joinable dimension history from a change log; at 100 TB
    the changelog is date-partitioned and the window runs per key with
    WindowGroupLimit-free full output (every version is kept by design)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@query(
    "fuzzy_name_match",
    oracle="""
SELECT c_custkey, s_suppkey, c_name, s_name,
       levenshtein(c_name, s_name) AS edit_dist
FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
WHERE levenshtein(c_name, s_name) <= 6
""",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy match: customer/supplier name pairs within
    the same nation at edit distance ≤ 6.  The blocking key (nationkey)
    turns an all-pairs O(C×S) comparison into per-block equi-join buckets
    — the supplier side is dimension-sized so it broadcasts, and
    levenshtein runs JVM-side post-join.  At 100 TB the blocking key IS
    the algorithm: never compare across blocks; skewed blocks fall back to
    AQE skew-split.  (For longer strings swap levenshtein for the n-gram
    Jaccard operator — edit distance is O(len²) per pair.)"""
    # spread: the per-pair levenshtein is the dominant CPU stage — an
    # under-split customer scan would run it on one core (no-op at scale).
    c = spread(load_table(spark, sf_dir, "customer")).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    dist = F.levenshtein("c_name", "s_name")
    return (
        c.join(F.broadcast(s), c["c_nationkey"] == s["s_nationkey"])
        .where(dist <= 6)
        .select(
            "c_custkey",
            "s_suppkey",
            "c_name",
            "s_name",
            dist.alias("edit_dist"),
        )
    )


@query(
    "top_revenue_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-04-01'
    AND l_shipdate < TIMESTAMP '1995-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The revenue aggregate is computed ONCE and reused for both the join
    and the MAX scalar subquery (same logical subtree — Catalyst reuses
    the exchange); the scalar max attaches as a single-row broadcast.  No
    ORDER BY/LIMIT 1: ties must all surface, which is why Q15 is a
    max-equality query, not a top-1."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-04-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.groupBy().agg(F.max("total_revenue").alias("max_revenue"))
    return (
        sup.join(rev, sup["s_suppkey"] == rev["supplier_no"])
        .crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# time-series gap-fill
# ---------------------------------------------------------------------------


@query(
    "time_gapfill_minutes",
    oracle="""
WITH spine AS (
  SELECT t.event_type, g.m
  FROM (SELECT DISTINCT event_type FROM events) t,
       generate_series(TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-01 05:59:00',
                       INTERVAL 1 MINUTE) g(m)
),
actual AS (
  SELECT event_type, date_trunc('minute', ts) AS m,
         COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts < TIMESTAMP '2024-01-01 06:00:00'
  GROUP BY 1, 2
)
SELECT s.event_type, STRFTIME(s.m, '%Y-%m-%d %H:%M:%S') AS minute,
       COALESCE(a.n, 0) AS n_events,
       COALESCE(a.total_value, 0.0) AS total_value
FROM spine s LEFT JOIN actual a ON a.event_type = s.event_type AND a.m = s.m
""",
)
def time_gapfill_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time-series resample: per-minute event counts over a 6-hour
    slice with missing minutes zero-filled.  The dense spine is generated
    JVM-side — ``sequence(start, end, interval 1 minute)`` produces ONE
    array row per event type, exploded to the spine; no driver loop, no
    calendar table scan.  The actual-counts side aggregates BEFORE the
    left join, so the join's left input is O(types × minutes) and the
    right is O(groups) — both tiny relative to the event scan, which is
    the only full pass.  At 100 TB the event scan partition-prunes on the
    ts predicate (date-partitioned layout, storage.py)."""
    e = load_table(spark, sf_dir, "events")
    lo = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    hi = F.to_timestamp(F.lit("2024-01-01 06:00:00"))
    sliced = e.where((F.col("ts") >= lo) & (F.col("ts") < hi))
    actual = sliced.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    spine = (
        e.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    lo,
                    F.to_timestamp(F.lit("2024-01-01 05:59:00")),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("m"),
        )
    )
    return (
        spine.join(actual, ["event_type", "m"], "left")
        .select(
            "event_type",
            F.date_format("m", "yyyy-MM-dd HH:mm:ss").alias("minute"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# funnel analysis
# ---------------------------------------------------------------------------


@query(
    "funnel_stages",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS ts_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
  SELECT e.user_id, MIN(e.ts) AS ts_view
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts > s.ts_signup
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS ts_purchase
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.ts_view
  GROUP BY e.user_id
)
SELECT 'signup' AS stage, 1 AS stage_idx, COUNT(*) AS n_users FROM s
UNION ALL
SELECT 'view_after_signup', 2, COUNT(*) FROM v
UNION ALL
SELECT 'purchase_after_view', 3, COUNT(*) FROM p
""",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel: users who signed up → viewed after signing up
    → purchased after that view.  Each stage is a groupBy(user_id) +
    conditional-min joined to the previous stage's per-user timestamp —
    every shuffle is on user_id, so AQE reuses the exchange across stages
    and the per-stage join inputs shrink monotonically (stage N+1's left
    side is a subset of stage N's output).  The stage outputs are
    single-row counts unioned driver-free."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_signup"))
    )
    v = (
        e.where(F.col("event_type") == "view")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("ts_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_view"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("ts_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_purchase"))
    )

    def stage(df: DataFrame, name: str, idx: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(idx).alias("stage_idx"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        stage(s, "signup", 1)
        .unionByName(stage(v, "view_after_signup", 2))
        .unionByName(stage(p, "purchase_after_view", 3))
    )


@query(
    "session_paths",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   <= INTERVAL 30 MINUTES
              THEN 0 ELSE 1 END AS new_session
  FROM events
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM s GROUP BY user_id, sid
""",
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized clickstream paths: per (user, 30-min-gap session), the
    ordered event-type sequence as one string.  Sessionization is the
    LAG + cumulative-SUM rewrite (same construction the session-window
    oracle uses) — both windows partition on user_id, so Spark sorts each
    user's slice once and reuses the exchange; the path build is
    collect_list of (ts, event_id, type) structs sorted JVM-side
    (sort_array on the struct's natural order), no Python.  (ts,
    event_id) is a total order, so paths are deterministic across engines
    and runs."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessioned = (
        e.withColumn(
            "new_session",
            F.when(
                F.col("ts").cast("long")
                - F.lag(F.col("ts")).over(w).cast("long")
                <= 1800,
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        .withColumn("sid", F.sum("new_session").over(wcum))
    )
    return (
        sessioned.groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path"),
        )
        .select("user_id", "session_start", "n_events", "path")
    )


@query(
    "outlier_iqr_filter",
    oracle="""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, ROUND(e.value, 4) AS value,
       ROUND(q.q1 - 1.5 * (q.q3 - q.q1), 6) AS lo_bound,
       ROUND(q.q3 + 1.5 * (q.q3 - q.q1), 6) AS hi_bound
FROM events e JOIN q ON q.event_type = e.event_type
WHERE e.value < q.q1 - 1.5 * (q.q3 - q.q1)
   OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
""",
)
def outlier_iqr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection: events whose value falls outside
    1.5×IQR of their type's quartiles.  The quartile table is one row per
    event type (exact interpolated percentile; swap approx_percentile at
    100 TB — same call shape, t-digest sketch, bounded memory), so the
    join back to the fact side is a broadcast — the fact table is scanned
    once with the fence predicate applied map-side.  This is the standard
    numeric-cleaning pass before a column enters a training set."""
    e = load_table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        e.join(F.broadcast(q), "event_type")
        .where((F.col("value") < lo) | (F.col("value") > hi))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(lo, 6).alias("lo_bound"),
            F.round(hi, 6).alias("hi_bound"),
        )
    )


# ---------------------------------------------------------------------------
# tf-idf
# ---------------------------------------------------------------------------


@query(
    "tfidf_top_terms",
    oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT t.doc_id, t.term,
       t.tf,
       d.df,
       ROUND(t.tf * LN((1.0 + n.n_docs) / (1.0 + d.df)), 6) AS tfidf
FROM tf t JOIN df d ON d.term = t.term CROSS JOIN n
ORDER BY tfidf DESC, t.term, t.doc_id
LIMIT 100
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf scoring: top-100 (doc, term) pairs by tf·idf.  Three hash
    aggregations — term frequency per (doc, term), document frequency per
    term, corpus size — then a join of tf against the df table.  At 100 TB
    the df table is vocabulary-sized (≪ corpus), so AQE broadcasts it and
    the only big shuffle is the (doc, term) partial-aggregated tf build;
    the corpus count attaches as a literal-sized broadcast cross join.
    Global top-k runs as TakeOrderedAndProject (per-partition heaps, no
    full sort).  idf = ln((1+N)/(1+df)), rounded identically on both
    engines; ties broken by (term, doc_id) for a total order."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        with_tokens(d)
        .select("doc_id", F.explode("tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))),
                6,
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("term"), F.asc("doc_id"))
        .limit(100)
    )


@query(
    "pmi_bigrams",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents
),
uni AS (
  SELECT t AS w, COUNT(*) AS c
  FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY 1
),
big AS (
  SELECT tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2,
         COUNT(*) AS c_ab
  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
  GROUP BY 1, 2
),
nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_uni FROM uni),
nb AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS n_big FROM big)
SELECT w1 || ' ' || w2 AS bigram, c_ab,
       ROUND(LN(c_ab) - LN(n_big) - LN(u1.c) - LN(u2.c) + 2 * LN(n_uni), 6) AS pmi
FROM big
JOIN uni u1 ON u1.w = big.w1
JOIN uni u2 ON u2.w = big.w2
CROSS JOIN nu CROSS JOIN nb
WHERE c_ab >= 10
ORDER BY pmi DESC, bigram
LIMIT 100
""",
)
def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-100 bigrams by pointwise mutual information
    (phrase discovery for tokenizer/vocab construction).  Adjacent pairs
    are built JVM-side with ``transform(sequence(...))`` over the token
    array — one array op per doc, no pre-shuffle row explosion beyond the
    bigram count itself.  The unigram table is vocabulary-sized, so both
    component-count joins broadcast; the corpus totals attach as
    single-row broadcast cross joins.  PMI in log space (sums of LNs, not
    a product ratio) so huge corpus counts can't overflow; c_ab ≥ 10
    prunes the long noise tail before the joins.  Ordered by the ROUNDED
    score so both engines select the same top-100 set."""
    d = with_tokens(load_table(spark, sf_dir, "documents"))
    toks = d.where(F.size("tk") >= 2).select("doc_id", "tk")
    uni = (
        d.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1), "
                "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    n_uni = uni.groupBy().agg(F.sum("c").cast("double").alias("n_uni"))
    n_big = big.groupBy().agg(F.sum("c_ab").cast("double").alias("n_big"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        big.where(F.col("c_ab") >= 10)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "c_ab",
            F.round(
                F.log("c_ab")
                - F.log("n_big")
                - F.log("c1")
                - F.log("c2")
                + 2 * F.log("n_uni"),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# data profiling
# ---------------------------------------------------------------------------


@query(
    "data_profile_orders",
    oracle="""
WITH agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_rows,
         CAST(COUNT(*) - COUNT(o_totalprice) AS DOUBLE) AS price_nulls,
         ROUND(MIN(o_totalprice), 2) AS price_min,
         ROUND(MAX(o_totalprice), 2) AS price_max,
         ROUND(AVG(o_totalprice), 4) AS price_avg,
         CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) AS status_ndv,
         CAST(COUNT(DISTINCT o_orderpriority) AS DOUBLE) AS priority_ndv,
         CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS custkey_ndv
  FROM orders
)
SELECT 'n_rows' AS metric, n_rows AS value FROM agg
UNION ALL SELECT 'price_nulls', price_nulls FROM agg
UNION ALL SELECT 'price_min', price_min FROM agg
UNION ALL SELECT 'price_max', price_max FROM agg
UNION ALL SELECT 'price_avg', price_avg FROM agg
UNION ALL SELECT 'status_ndv', status_ndv FROM agg
UNION ALL SELECT 'priority_ndv', priority_ndv FROM agg
UNION ALL SELECT 'custkey_ndv', custkey_ndv FROM agg
""",
)
def data_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (row count, null count, min/max/avg,
    per-column distinct counts) emitted long-format.  ONE aggregation job
    computes every metric — Spark plans the multiple COUNT(DISTINCT)s via
    expand + partial aggregation, still a single scan of the table — then
    the wide→long melt is a zero-shuffle ``unpivot`` projection.  This is
    the ingest-validation primitive a training-data pipeline runs on every
    new 100 TB drop before anything else touches it."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_totalprice"))
        .cast("double")
        .alias("price_nulls"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
        F.round(F.avg("o_totalprice"), 4).alias("price_avg"),
        F.count_distinct("o_orderstatus").cast("double").alias("status_ndv"),
        F.count_distinct("o_orderpriority").cast("double").alias("priority_ndv"),
        F.count_distinct("o_custkey").cast("double").alias("custkey_ndv"),
    )
    return wide.unpivot(
        ids=[],
        values=[
            "n_rows",
            "price_nulls",
            "price_min",
            "price_max",
            "price_avg",
            "status_ndv",
            "priority_ndv",
            "custkey_ndv",
        ],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "view_purchase_attribution",
    oracle="""
WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT v.user_id, v.event_id AS view_event_id, v.ts AS view_ts,
         p.event_id AS purchase_event_id, p.ts AS purchase_ts,
         ROW_NUMBER() OVER (PARTITION BY v.event_id
                            ORDER BY p.ts, p.event_id) AS rn
  FROM v JOIN p ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT user_id, view_event_id, purchase_event_id,
       CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT)
         AS micros_to_purchase
FROM pairs WHERE rn = 1
""",
)
def view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution via COGROUPED ``applyInPandas``: per user,
    each 'view' event matched to the next 'purchase' at-or-after it — the
    as-of alignment of two event streams where per-key imperative logic
    (pandas ``merge_asof``) is genuinely simpler than a join+window dance.

    Scale shape: both sides hash-partition ONCE on a bucket of user_id
    (not the raw key): per-user cogroups would mean one Python
    invocation per user — at 1500 users that's 1500 tiny
    sort+merge_asof calls whose fixed pandas overhead dominates
    (measured 14.5 s -> ~1 s at sf0.1 from this change alone).  Each
    bucket ships to Python as TWO Arrow batches and ``merge_asof(by=
    "user_id")`` vectorizes the per-user as-of across the whole bucket;
    state stays bounded by a bucket, and the bucket count scales with
    cores, not users.  This is the capability row for
    ``groupBy().cogroup().applyInPandas``; the equivalent declarative plan
    (range join + WindowGroupLimit) is what the DuckDB oracle runs, so the
    Python path is value-verified against the relational one."""
    import pandas as pd

    n_buckets = 32  # ~one Python task per core; each vectorizes many users

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    bucket = F.pmod("user_id", F.lit(n_buckets)).alias("bucket")
    views = ev.where(F.col("event_type") == "view").drop("event_type")
    purchases = ev.where(F.col("event_type") == "purchase").drop("event_type")

    def attribute(v: pd.DataFrame, p: pd.DataFrame) -> pd.DataFrame:
        if v.empty or p.empty:
            return pd.DataFrame(
                columns=["user_id", "view_event_id", "purchase_event_id",
                         "micros_to_purchase"]
            )
        # merge_asof(by=...) wants both frames globally sorted on the `on`
        # key; the stable (ts, event_id) sort makes the first-of-equal-ts
        # purchase the lowest event_id, mirroring the oracle's rn = 1.
        v2 = (
            v.sort_values(["ts", "event_id"], kind="mergesort")
            .rename(columns={"event_id": "view_event_id", "ts": "view_ts"})
        )[["user_id", "view_event_id", "view_ts"]]
        p2 = (
            p.sort_values(["ts", "event_id"], kind="mergesort")
            .rename(columns={"event_id": "purchase_event_id", "ts": "purchase_ts"})
        )[["user_id", "purchase_event_id", "purchase_ts"]]
        m = pd.merge_asof(
            v2,
            p2,
            left_on="view_ts",
            right_on="purchase_ts",
            by="user_id",
            direction="forward",
        ).dropna(subset=["purchase_event_id"])
        return pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "view_event_id": m["view_event_id"].astype("int64"),
                "purchase_event_id": m["purchase_event_id"].astype("int64"),
                "micros_to_purchase": (
                    (m["purchase_ts"] - m["view_ts"]) // pd.Timedelta(microseconds=1)
                ).astype("int64"),
            }
        )

    return (
        views.groupBy(bucket)
        .cogroup(purchases.groupBy(bucket))
        .applyInPandas(
            attribute,
            schema="user_id long, view_event_id long, purchase_event_id long, "
            "micros_to_purchase long",
        )
    )


# ---------------------------------------------------------------------------
# multi-granularity time rollup (hypertable-rollup shape)


@query(
    "time_rollup_hierarchy",
    oracle="""
WITH g AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, strftime(ts, '%H') AS hour,
         value, user_id
  FROM events
)
SELECT COALESCE(day, 'ALL') AS day,
       COALESCE(hour, 'ALL') AS hour,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM g GROUP BY ROLLUP(day, hour)
""",
)
def time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup: (day, hour) plus per-day and grand
    totals in ONE pass — the continuous-aggregate / hypertable-rollup
    shape (TimescaleDB-style), here a plain Catalyst ROLLUP so the
    hour->day->total hierarchy is computed with partial aggregation
    instead of three scans.

    Scale shape: one scan, one Expand (3 grouping sets) feeding a single
    hash-aggregate exchange keyed on (day, hour, grouping_id). The
    distinct-count forces a second exchange per grouping set — still
    O(groups), never O(rows), after the partial agg. At 100 TB with a
    date-partitioned layout, partition pruning bounds the scan to the
    rollup's time range.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "HH").alias("hour"),
        "value",
        "user_id",
    )
    return (
        e.rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("hour", F.lit("ALL")).alias("hour"),
            "n_events",
            "sum_value",
            "n_users",
        )
    )


@query(
    "vwap_hourly",
    oracle="""
SELECT user_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
       ROUND(SUM(value * value) / SUM(value), 6) AS vwap,
       CAST(COUNT(*) AS BIGINT) AS n_trades
FROM events
WHERE event_type = 'purchase' AND value > 0
GROUP BY user_id, date_trunc('hour', ts)
""",
)
def vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (user, hour) — the canonical
    time-series finance aggregate (value doubles as both price and size
    in the synthetic schema, so vwap = Σv²/Σv).

    Both weighted sums fold into ONE map-side-combined hash aggregate;
    the exchange carries (user, hour, 2 partial sums, count) — algebraic,
    so the shape is identical at 100 TB.  The hour bucket is emitted as a
    formatted string (registry convention: never raw timestamps across
    the oracle boundary)."""
    e = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    )
    return (
        e.groupBy(
            "user_id",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "hour_bucket"
            ),
        )
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("value")) / F.sum("value"), 6
            ).alias("vwap"),
            F.count(F.lit(1)).cast("long").alias("n_trades"),
        )
    )


@query(
    "entity_resolution_pipeline",
    oracle="""
WITH RECURSIVE scored AS (
  SELECT c_custkey, s_suppkey,
         levenshtein(c_name, s_name) AS d
  FROM customer JOIN supplier ON c_nationkey = s_nationkey
  WHERE levenshtein(c_name, s_name) <= 5
),
edges AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
         's' || CAST(s_suppkey AS VARCHAR) AS dst
  FROM scored
  UNION
  SELECT 's' || CAST(s_suppkey AS VARCHAR),
         'c' || CAST(c_custkey AS VARCHAR)
  FROM scored
),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS entity_id, MIN(lbl) AS cluster_id
FROM reach GROUP BY id
""",
)
def entity_resolution_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed entity resolution: blocking (nationkey) → pairwise edit-
    distance scoring → threshold → connected components → cluster ids,
    across two entity tables (customers, suppliers).

    Each stage is the scale-shaped primitive the engine already ships:
    the blocking equi-join bounds comparisons to same-block pairs
    (operators/skew.py handles hot blocks), levenshtein runs JVM-side
    post-join, and clustering is the iterative min-label propagation of
    operators/dedup.py::connected_components over typed node ids
    ('c<k>' / 's<k>' keeps the two keyspaces disjoint).  The oracle runs
    the same pipeline with a recursive-CTE closure — exact equality, not
    rows-only."""
    c = spread(load_table(spark, sf_dir, "customer")).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    dist = F.levenshtein("c_name", "s_name")
    scored = (
        c.join(F.broadcast(s), c["c_nationkey"] == s["s_nationkey"])
        .where(dist <= 5)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey")).alias("doc_a"),
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("doc_b"),
        )
    )
    from odni_apache_beam_consumer_spark.operators.dedup import connected_components

    return connected_components(scored).select(
        F.col("doc_id").alias("entity_id"), F.col("component").alias("cluster_id")
    )


@query(
    "cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INTEGER)
           AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity
GROUP BY cohort_week, week_offset
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each later week they were active — the standard product-analytics
    triangle.

    Scale shape: the first-seen aggregate and the activity join both key
    on user_id, so Catalyst reuses ONE user_id exchange for the agg and
    the join probe (no second shuffle of the events table); the DISTINCT
    collapses (user, week) duplicates map-side before the final
    constant-width count.  week_offset uses ISO week truncation in both
    engines; the cohort week crosses the oracle boundary as a formatted
    date string."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp("cohort_week")
                    )
                    / (7 * 86400)
                )
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


@query(
    "event_transition_matrix",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS cur, next_type AS nxt FROM ordered
  WHERE next_type IS NOT NULL
)
SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) * 1.0
             / SUM(COUNT(*)) OVER (PARTITION BY cur), 6) AS p
FROM pairs GROUP BY cur, nxt
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current) — the behavioral-model building block
    (and the quality signal behind bot detection: near-deterministic
    rows are automation).

    Scale shape: ONE shuffle on user_id for the LEAD window, then the
    (cur, nxt) count is a 25-row aggregate; the row-normalizing window
    runs over that tiny aggregate, not the events table.  Ties in ts are
    broken by event_id so the sequence — and therefore the matrix — is
    deterministic in both engines."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
    )
    counts = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wr = W.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n") / F.sum("n").over(wr), 6).alias("p"),
    )


@query(
    "rolling_7d_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
contrib AS (
  SELECT DISTINCT user_id, d + CAST(u.off AS INTEGER) AS window_day
  FROM ud, UNNEST(range(0, 7)) AS u(off)
),
days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS window_day FROM events)
SELECT strftime(c.window_day, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_7d
FROM contrib c JOIN days USING (window_day)
GROUP BY c.window_day
""",
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the DAU/WAU engagement metric.

    A distinct count over a sliding RANGE window isn't supported by any
    engine's window path; the scale shape is CONTRIBUTION EXPLODE: each
    (user, active-day) pair contributes to the 7 window-days it falls in
    (map-side ×7 fan-out of an already-deduped pair table), then ONE
    distinct-count aggregate keyed on window-day.  Cost is 7× the
    distinct pair table — linear, shuffle keyed on the day (bounded
    cardinality), versus the quadratic per-day self-joins of the naive
    form.  Days with no events are excluded (join against observed days)
    so both engines agree on the domain."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("off")).alias("window_day")).distinct()
    days = e.select(
        F.date_trunc("day", "ts").cast("date").alias("window_day")
    ).distinct()
    return (
        contrib.join(days, "window_day")
        .groupBy(F.date_format("window_day", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").cast("long").alias("active_7d"))
    )


# ---------------------------------------------------------------------------
# market-basket association rules
# ---------------------------------------------------------------------------


@query(
    "basket_association_rules",
    oracle="""
WITH pl AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM pl),
item AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS sup FROM pl GROUP BY l_partkey
),
pair AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS sup_uv
  FROM pl a JOIN pl b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT u, v, sup_uv, iu.sup AS sup_u, iv.sup AS sup_v,
       ROUND(sup_uv / iu.sup, 6) AS confidence,
       ROUND(sup_uv * n.n_orders / (iu.sup * iv.sup), 6) AS lift
FROM pair
JOIN item iu ON iu.l_partkey = u
JOIN item iv ON iv.l_partkey = v
CROSS JOIN n
""",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every part
    pair co-occurring in >= 3 orders, support, confidence(u -> v) and
    lift — the classic recommendation/affinity mining query (and the
    statistical layer the co-purchase *graph* queries skip: lift > 1
    separates genuine affinity from popularity coincidence).

    Shape: the distinct (order, part) table is persisted and read three
    times (pair self-join, item supports, basket count); pair generation
    is the same support-thresholded equi-join as copurchase_edges; the
    basket total is a 1-row broadcast cross (whitelisted NLJ).  The item
    support lookups are deliberately NOT force-broadcast: item
    cardinality grows linearly with the corpus (6M rows at the 300×
    scale cell), so a forced broadcast is a driver-OOM hazard — the
    support-thresholded PAIR side is the one that stays small, and AQE
    picks it as the broadcast side at runtime (same fix class as the
    round-5 txtable merge).  At 100 TB the support threshold bounds pair
    cardinality and the self-join is the only super-linear stage —
    per-basket size caps (a WHERE on basket length) are the standard
    guard when baskets are power-law."""
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist()
    )
    n = pl.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = pl.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup"))
    a = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    pair = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("sup_uv"))
        .where(F.col("sup_uv") >= 3)
    )
    iu = item.select(F.col("l_partkey").alias("u"), F.col("sup").alias("sup_u"))
    iv = item.select(F.col("l_partkey").alias("v"), F.col("sup").alias("sup_v"))
    return (
        pair.join(iu, "u")
        .join(iv, "v")
        .crossJoin(F.broadcast(n))
        .select(
            "u",
            "v",
            "sup_uv",
            "sup_u",
            "sup_v",
            F.round(F.col("sup_uv") / F.col("sup_u"), 6).alias("confidence"),
            F.round(
                F.col("sup_uv") * F.col("n_orders")
                / (F.col("sup_u") * F.col("sup_v")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# time-series anomaly detection (z-score on daily aggregates)
# ---------------------------------------------------------------------------


@query(
    "daily_revenue_anomalies",
    oracle="""
WITH daily AS (
  SELECT STRFTIME(DATE_TRUNC('day', o_orderdate), '%Y-%m-%d') AS day,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
),
stats AS (
  SELECT AVG(revenue) AS mu, STDDEV_SAMP(revenue) AS sigma FROM daily
)
SELECT day, revenue,
       ROUND((revenue - stats.mu) / stats.sigma, 4) AS zscore
FROM daily CROSS JOIN stats
WHERE ABS((revenue - stats.mu) / stats.sigma) > 2
""",
)
def daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly flagging: days whose total order revenue sits
    more than 2 standard deviations from the mean daily revenue — the
    monitoring query behind every revenue/volume alerting dashboard.

    Shape: the fact table collapses to a day-grained aggregate first
    (one hash shuffle, output = #days rows — ~3.7k rows PER DECADE no
    matter how many orders, so everything downstream is metadata-sized);
    mean/stddev are a 1-row aggregate OVER THE DAILY TABLE broadcast-
    crossed back (whitelisted NLJ), and the z-filter is map-side.  The
    daily revenue is rounded to cents BEFORE the stats pass so both
    engines fold identical inputs."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")).persist()
    stats = daily.agg(
        F.avg("revenue").alias("mu"), F.stddev_samp("revenue").alias("sigma")
    )
    z = (F.col("revenue") - F.col("mu")) / F.col("sigma")
    return (
        daily.crossJoin(F.broadcast(stats))
        .where(F.abs(z) > 2)
        .select("day", "revenue", F.round(z, 4).alias("zscore"))
    )


@query(
    "signup_to_purchase_latency",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY e.user_id
)
SELECT s.user_id,
       STRFTIME(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       COALESCE(STRFTIME(p.first_purchase_ts, '%Y-%m-%d %H:%M:%S'), '')
         AS first_purchase_ts,
       CAST(COALESCE(date_diff('second', s.signup_ts, p.first_purchase_ts), -1)
            AS BIGINT) AS latency_s
FROM s LEFT JOIN p ON p.user_id = s.user_id
""",
)
def signup_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: per signed-up user, the time from first signup
    to first subsequent purchase (-1 sentinel if never converted) — the
    canonical activation metric.  Two keyed min-aggregates + one left
    join, all on user_id — one exchange each, reusable partitioning.
    The purchase min is constrained to ts >= signup so pre-signup
    purchases (possible in this synthetic stream) don't produce negative
    latencies."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return s.join(p, "user_id", "left").select(
        "user_id",
        F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        F.coalesce(
            F.date_format("first_purchase_ts", "yyyy-MM-dd HH:mm:ss"),
            F.lit(""),
        ).alias("first_purchase_ts"),
        F.coalesce(
            (
                F.unix_timestamp("first_purchase_ts")
                - F.unix_timestamp("signup_ts")
            ),
            F.lit(-1),
        ).alias("latency_s"),
    )


@query(
    "revenue_contribution_pareto",
    oracle="""
WITH r AS (
  SELECT n.n_name AS nation, ROUND(SUM(o.o_totalprice), 2) AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
)
SELECT nation, revenue,
       ROUND(revenue / SUM(revenue) OVER (), 6) AS share,
       ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, nation)
             / SUM(revenue) OVER (), 6) AS cumulative_share
FROM r
""",
)
def revenue_contribution_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total + Pareto curve: each nation's revenue share and
    the cumulative share walking down the ranking (the 80/20 readout on
    any dimension).  The fact table collapses to the 25-row nation grain
    FIRST (one hash shuffle with broadcast dims), so the whole-table
    window (`OVER ()`) runs on a metadata-sized aggregate — the
    unpartitioned window is only ever acceptable AFTER the cardinality
    collapse, never on the raw fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w_all = W.partitionBy()
    w_cum = W.partitionBy().orderBy(F.desc("revenue"), F.asc("nation"))
    return r.select(
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share"
        ),
        F.round(
            F.sum("revenue").over(
                w_cum.rangeBetween(W.unboundedPreceding, W.currentRow)
            )
            / F.sum("revenue").over(w_all),
            6,
        ).alias("cumulative_share"),
    )


@query(
    "mad_robust_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events
  GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.med,
         ABS(e.value - m.med) AS adev
  FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
  GROUP BY event_type
)
SELECT d.event_id, d.event_type, ROUND(d.value, 4) AS value,
       ROUND((d.value - d.med) / (1.4826 * m.mad), 4) AS robust_z
FROM dev d JOIN mad m ON m.event_type = d.event_type
WHERE ABS((d.value - d.med) / (1.4826 * m.mad)) > 3.5
""",
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outliers: events whose robust z-score
    |x - median| / (1.4826 * MAD) exceeds 3.5 per event type — the
    standard robust complement to the IQR filter (mean/stddev z-scores
    are themselves dragged by the outliers they hunt; median/MAD have a
    50% breakdown point).

    Shape: two percentile passes (median, then median of absolute
    deviations), each producing a per-type row that broadcasts back into
    a map-side filter — the fact table is scanned twice, never shuffled
    on a row key.  At 100 TB both medians swap to approx_percentile
    (same call shape, t-digest) and the second scan reuses the cached
    first projection."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    z = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.abs(z) > 3.5)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# pivot / crosstab: daily event-type matrix
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "daily_event_type_pivot",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
FROM events
GROUP BY 1
""",
)
def daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT/crosstab: one row per day, one column per event type — the
    wide activity matrix dashboards and feature stores consume.  The
    pivot VALUES ARE DECLARED (the five known event types), which is the
    scale-correct form: undeclared pivot makes Spark run an extra
    distinct-collect job and caps cardinality at
    spark.sql.pivotMaxValues; declared values plan as a single
    conditional aggregate — identical to the oracle's FILTER clauses,
    one hash shuffle on day."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
                 "event_type")
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
              for t in _EVENT_TYPES],
        )
    )


# ---------------------------------------------------------------------------
# behavioral sequence mining: top event trigrams
# ---------------------------------------------------------------------------


@query(
    "event_trigram_mining",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type AS e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, e1, e2, e3
LIMIT 20
""",
)
def event_trigram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral trigrams (ordered event-type triples per user) —
    the sequence-mining readout behind funnel discovery and next-action
    models; the n-gram dual of the pairwise transition matrix
    (event_transition_matrix).

    Scale shape: one window shuffle on user_id (two LEADs share the
    frame), then a partial-aggregated hash count over at most
    |event_types|^3 = 125 groups and a TakeOrdered top-20 — never a
    global sort.  Ties broken lexically so the cut is deterministic in
    both engines."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        s.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# month-over-month growth
# ---------------------------------------------------------------------------


@query(
    "monthly_revenue_growth",
    oracle="""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
)
SELECT month, rev_cents,
       CAST(LAG(rev_cents) OVER (ORDER BY month) AS BIGINT) AS prev_cents,
       CAST(FLOOR((rev_cents - LAG(rev_cents) OVER (ORDER BY month))
                  * 10000.0 / LAG(rev_cents) OVER (ORDER BY month))
            AS BIGINT) AS growth_bp
FROM m
""",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth in integer basis points — the KPI
    trend readout.  Revenue is exact integer cents (FLOOR per row, then
    integer sum — order-independent), growth is FLOOR of one IEEE double
    division (identical in both engines; integer DIV would differ on
    NEGATIVE growth because Spark truncates toward zero while DuckDB
    floors).

    Scale shape: the fact table collapses to month grain first (one
    partial-aggregated hash shuffle, ~80 rows); the unpartitioned LAG
    window runs on that metadata-sized aggregate only — the same
    collapse-before-global-window discipline as
    revenue_contribution_pareto."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("month")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w = W.partitionBy().orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "month",
        "rev_cents",
        prev.cast("long").alias("prev_cents"),
        F.floor((F.col("rev_cents") - prev) * 10000.0 / prev)
        .cast("long")
        .alias("growth_bp"),
    )


@query(
    "cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT strftime(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS rev_centi
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
m AS (
  SELECT CAST(SUM(rev_centi) // COUNT(*) AS BIGINT) AS mean_centi FROM daily
),
c AS (
  SELECT day, rev_centi,
         CAST(SUM(rev_centi - m.mean_centi)
              OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cusum_centi
  FROM daily CROSS JOIN m
),
mx AS (SELECT MAX(ABS(cusum_centi)) AS peak FROM c)
SELECT c.day, c.rev_centi, c.cusum_centi,
       ABS(c.cusum_centi) = mx.peak AS is_changepoint
FROM c CROSS JOIN mx
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily purchase-revenue
    series: the running sum of deviations from the series mean peaks at
    the most likely level-shift day (Page's test statistic) — the
    monitoring primitive behind "did the metric regime change, and
    when", complementing daily_revenue_anomalies' pointwise z-scores
    with a LEVEL-shift detector.

    Exact integers throughout: revenue in centi-units, the mean via
    integer DIV (the constant offset that floor-rounding introduces is
    identical on both engines and cancels nothing the argmax cares
    about), the CUSUM as an integer prefix sum.

    Scale shape: the corpus-sized work is the day-grained pre-agg (one
    map-side-combined exchange); the ordered window then runs over the
    DAY SERIES — calendar-bounded (3650 rows per decade), never
    row-bounded — so the single-partition prefix sum is scale-safe by
    the same argument as the AUC histogram.  The mean and the peak are
    1-row broadcast crosses (whitelisted NLJ)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("rev_centi")
        )
    )
    m = daily.agg(
        F.expr("CAST(sum(rev_centi) DIV count(*) AS BIGINT)").alias(
            "mean_centi"
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(m)).withColumn(
        "cusum_centi",
        F.sum(F.col("rev_centi") - F.col("mean_centi")).over(w).cast("long"),
    )
    mx = c.agg(F.max(F.abs("cusum_centi")).alias("peak"))
    return (
        c.crossJoin(F.broadcast(mx))
        .select(
            "day",
            "rev_centi",
            "cusum_centi",
            (F.abs("cusum_centi") == F.col("peak")).alias("is_changepoint"),
        )
    )


@query(
    "skyline_pareto_front",
    oracle="""
WITH p AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
),
m AS (
  SELECT *,
         MAX(p_size) OVER (ORDER BY price_cents
                           RANGE BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS best_cheaper,
         MAX(p_size) OVER (PARTITION BY price_cents) AS best_same
  FROM p
)
SELECT p_partkey, price_cents, p_size
FROM m
WHERE (best_cheaper IS NULL OR best_cheaper < p_size)
  AND best_same = p_size
""",
)
def skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front) over parts: every part not DOMINATED —
    no other part is both cheaper-or-equal and larger-or-equal with one
    strict — the multi-objective shortlist query (Borzsony et al.
    ICDE'01) behind "cheapest viable X at every capability level".

    The naive formulation is a quadratic NOT EXISTS self-join; for two
    criteria it collapses to ONE window pass: sort by price, keep a row
    iff no strictly-cheaper row reached its size (running RANGE-frame
    max) and no same-price row beats its size (unordered same-price
    max).  Exact integer cents, so the frame boundary is well-defined
    on both engines.

    Scale shape: the skyline is DISTRIBUTIVE — a row dominated within
    any subset is dominated globally — so stage 1 runs the window pass
    WITHIN 64 hash buckets (partitioned window, parallel, prunes to the
    per-bucket Pareto fronts), and stage 2 reruns the same pass
    unpartitioned over the union of local fronts, which is
    skyline-bounded (~64 x O(log n) expected rows), never the full
    table.  An unpartitioned window over the raw scan would funnel
    every row through ONE task at 100x; here the single-task window
    only ever sees local-front survivors."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )

    def _front(df: DataFrame, *bucket_cols: str) -> DataFrame:
        w_cheaper = (
            W.partitionBy(*bucket_cols)
            .orderBy("price_cents")
            .rangeBetween(W.unboundedPreceding, -1)
            if bucket_cols
            else W.orderBy("price_cents").rangeBetween(W.unboundedPreceding, -1)
        )
        w_same = W.partitionBy(*bucket_cols, "price_cents")
        m = df.withColumn("best_cheaper", F.max("p_size").over(w_cheaper)).withColumn(
            "best_same", F.max("p_size").over(w_same)
        )
        return m.where(
            (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("p_size")))
            & (F.col("best_same") == F.col("p_size"))
        ).select("p_partkey", "price_cents", "p_size")

    local = _front(
        p.withColumn("bucket", F.pmod(F.hash("p_partkey"), F.lit(64))), "bucket"
    )
    return _front(local)


@query(
    "markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_trans,
       CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
         AS total_from,
       CAST(n_trans * 1000000
            // SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
         AS prob_ppm
FROM pairs
""",
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral model behind next-action prediction and
    the curriculum-ordering statistic a training-data pipeline tracks
    (which document/event types follow which): for every (prev, next)
    event-type pair, the transition count and its row-normalized
    probability in exact integer ppm.

    (ts, event_id) is a total order within a user, so the LAG sequence
    is deterministic across engines; the ppm is integral DIV, matching
    the oracle's ``//`` at any magnitude.

    Scale shape: ONE user-keyed exchange for the lag window (each
    user's slice sorts locally — the session_paths exchange), then a
    (prev, next) hash agg whose group count is |event_types|^2 (~25),
    so everything after the window is metadata-sized; the row
    normalization is a window over that 25-row aggregate, not the
    corpus."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    w_from = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.sum("n_trans").over(w_from).cast("long").alias("total_from"),
        F.call_function(
            "div", F.col("n_trans") * 1000000, F.sum("n_trans").over(w_from)
        )
        .cast("long")
        .alias("prob_ppm"),
    )


@query(
    "chi2_token_class_assoc",
    oracle="""
WITH pres AS (
  SELECT DISTINCT doc_id, lang,
         unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
a_tl AS (
  SELECT term, lang, CAST(COUNT(*) AS BIGINT) AS a
  FROM pres GROUP BY 1, 2
),
df_t AS (
  SELECT term, CAST(SUM(a) AS BIGINT) AS df FROM a_tl GROUP BY 1
),
n_l AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_l
  FROM documents GROUP BY 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT t.lang, t.term, t.a, d.df, l.docs_l, nn.n,
         CAST(FLOOR(
           (CAST(nn.n AS DOUBLE)
            * ((CAST(t.a AS DOUBLE)
                * CAST(nn.n - d.df - (l.docs_l - t.a) AS DOUBLE))
               - (CAST(d.df - t.a AS DOUBLE)
                  * CAST(l.docs_l - t.a AS DOUBLE)))
            * ((CAST(t.a AS DOUBLE)
                * CAST(nn.n - d.df - (l.docs_l - t.a) AS DOUBLE))
               - (CAST(d.df - t.a AS DOUBLE)
                  * CAST(l.docs_l - t.a AS DOUBLE))))
           / (CAST(d.df AS DOUBLE) * CAST(nn.n - d.df AS DOUBLE)
              * CAST(l.docs_l AS DOUBLE) * CAST(nn.n - l.docs_l AS DOUBLE))
           * 1000.0) AS BIGINT) AS chi2_milli
  FROM a_tl t JOIN df_t d USING (term) JOIN n_l l USING (lang)
       CROSS JOIN nn
  WHERE d.df >= 5 AND d.df < nn.n
)
SELECT lang, term, a AS n_docs_with, df AS doc_freq, chi2_milli
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY chi2_milli DESC, term) AS rn
  FROM scored
) WHERE rn <= 5
""",
)
def chi2_token_class_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared token-class association (Yang & Pedersen 1997 — the
    classic feature-selection statistic a text-curation pipeline uses
    to find the tokens most predictive of a class): per language, the
    top-5 tokens by chi2 over the 2x2 document-presence contingency
    (a = docs of the lang containing the token, with b/c/d derived
    from the token's total document frequency, the lang's size, and
    N).  chi2 = N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)), computed in
    doubles with the IDENTICAL expression tree on both engines —
    *,-,/ are correctly rounded under IEEE 754, so the milli-quantized
    value is hash-portable even where the products round (the
    _logreg_sigmoid portability argument; exactness is not claimed,
    determinism is).  Ranking uses the quantized value, ties by term.

    Scale shape: presence is array_distinct BEFORE the explode (one
    row per distinct (doc, term), never per occurrence); the (term,
    lang) agg partially combines map-side; the df rollup is
    vocabulary-sized, the lang table is ~5 rows (broadcast), N is a
    1-row broadcast cross; per-lang top-5 is a WindowGroupLimit over
    the vocab-sized scored table — nothing after the presence exchange
    scales with the corpus, only with the vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    pres = (
        with_tokens(d)
        .select("doc_id", "lang", F.explode(F.array_distinct("tk")).alias("term"))
    )
    a_tl = pres.groupBy("term", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    df_t = a_tl.groupBy("term").agg(F.sum("a").cast("long").alias("df"))
    n_l = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("docs_l"))
    nn = d.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = (
        a_tl.join(df_t, "term")
        .join(F.broadcast(n_l), "lang")
        .crossJoin(F.broadcast(nn))
        .where((F.col("df") >= 5) & (F.col("df") < F.col("n")))
    )
    ad = F.col("a").cast("double") * (
        F.col("n") - F.col("df") - (F.col("docs_l") - F.col("a"))
    ).cast("double")
    bc = (F.col("df") - F.col("a")).cast("double") * (
        F.col("docs_l") - F.col("a")
    ).cast("double")
    num = ad - bc
    chi2 = (
        # (n*num)*num left-assoc — MUST match the oracle's association
        # exactly: once num^2 exceeds 2^53 the two orders round through
        # different intermediates (r12 advice).
        F.col("n").cast("double") * num * num
    ) / (
        F.col("df").cast("double")
        * (F.col("n") - F.col("df")).cast("double")
        * F.col("docs_l").cast("double")
        * (F.col("n") - F.col("docs_l")).cast("double")
    )
    scored = j.select(
        "lang",
        "term",
        F.col("a").alias("n_docs_with"),
        F.col("df").alias("doc_freq"),
        F.floor(chi2 * 1000.0).cast("long").alias("chi2_milli"),
    )
    w = W.partitionBy("lang").orderBy(F.desc("chi2_milli"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "term", "n_docs_with", "doc_freq", "chi2_milli")
    )


@query(
    "kaplan_meier_survival",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
lt AS (
  SELECT user_id,
         (CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
          - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT)) // 3600
           AS lifetime_d,
         CASE WHEN MAX(ts) <= (SELECT max_ts FROM mx) - INTERVAL 1 DAY
              THEN 1 ELSE 0 END AS observed
  FROM events GROUP BY user_id
),
by_t AS (
  SELECT lifetime_d, CAST(COUNT(*) AS BIGINT) AS n_at,
         CAST(SUM(observed) AS BIGINT) AS d
  FROM lt GROUP BY 1
),
km AS (
  SELECT lifetime_d, d,
         CAST(SUM(n_at) OVER (ORDER BY lifetime_d DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk
  FROM by_t
),
f AS (
  SELECT lifetime_d, d, n_risk,
         1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
  FROM km WHERE d > 0
),
arr AS (
  SELECT LIST(factor ORDER BY lifetime_d) AS l,
         LIST(lifetime_d ORDER BY lifetime_d) AS ts
  FROM f
),
surv AS (
  SELECT ts[CAST(g.i AS INT)] AS lifetime_d,
         CAST(FLOOR(list_reduce(l[1:CAST(g.i AS INT)], (a, b) -> a * b)
                    * 1000000000.0) AS BIGINT) AS surv_nano
  FROM arr, UNNEST(generate_series(1, len(l))) g(i)
)
SELECT f.lifetime_d, f.d AS n_deaths, f.n_risk, s.surv_nano
FROM f JOIN surv s USING (lifetime_d)
""",
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over user lifetimes — the
    churn/retention statistic in its censoring-correct form (cohort
    retention tables ignore censoring; KM is what a lifetime claim
    should cite): lifetime = whole hours between a user's first and last
    event, a user is OBSERVED (churned) if their last event precedes
    the corpus horizon minus 1 day, else right-censored.  For each
    death time t: deaths d_t, risk set n_t (lifetime >= t, censored
    included — the KM risk-set rule), and
    S(t) = prod_{u<=t} (1 - d_u/n_u), nano-quantized.

    The cumulative product is the hash-portability crux: both engines
    fold the SAME t-ascending factor list left-to-right (Catalyst
    aggregate() with exact 1.0 init vs DuckDB list_reduce — 1.0*a == a
    bitwise, * is correctly rounded), so every prefix product is
    bit-identical; no exp/ln rewrite (the _logreg_sigmoid argument).

    Scale shape: one user-keyed agg (the corpus-sized exchange), then
    the distinct-lifetime table is calendar-bounded (~tens of rows —
    metadata-sized), so the desc-ordered risk-set window, the factor
    list collect, and the O(k^2) prefix folds all run on one tiny row;
    the horizon is a 1-row broadcast cross join."""
    e = load_table(spark, sf_dir, "events")
    mx = e.groupBy().agg(F.max("ts").alias("max_ts"))
    lt = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.call_function(
                "div",
                F.col("last_ts").cast("long") - F.col("first_ts").cast("long"),
                F.lit(3600),
            ).alias("lifetime_d"),
            F.when(
                F.col("last_ts")
                <= F.col("max_ts") - F.expr("INTERVAL 1 DAY"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("observed"),
        )
    )
    by_t = lt.groupBy("lifetime_d").agg(
        F.count(F.lit(1)).cast("long").alias("n_at"),
        F.sum("observed").cast("long").alias("d"),
    )
    w_desc = W.orderBy(F.desc("lifetime_d")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    km = by_t.select(
        "lifetime_d",
        "d",
        F.sum("n_at").over(w_desc).cast("long").alias("n_risk"),
    )
    f = km.where(F.col("d") > 0).select(
        "lifetime_d",
        "d",
        "n_risk",
        (
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double")
        ).alias("factor"),
    )
    one = f.groupBy().agg(
        F.sort_array(
            F.collect_list(F.struct("lifetime_d", "d", "n_risk", "factor"))
        ).alias("a")
    ).where(F.size("a") > 0)
    # (the size guard matters: sequence(1, 0) DESCENDS in Spark, so an
    # empty factor list would index a[-1])
    return one.select(
        F.inline(
            F.expr(
                "transform(sequence(1, size(a)), i -> named_struct("
                "'lifetime_d', a[i-1].lifetime_d,"
                "'n_deaths', a[i-1].d,"
                "'n_risk', a[i-1].n_risk,"
                "'surv_nano', CAST(FLOOR(aggregate("
                "  slice(transform(a, s -> s.factor), 1, i),"
                "  CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)"
                "  * 1000000000.0) AS BIGINT)))"
            )
        )
    )


@query(
    "hellinger_lang_drift",
    oracle="""
WITH tok AS (
  SELECT lang, unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
c_l AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
n_l AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM c_l GROUP BY 1),
c_g AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cg FROM c_l GROUP BY 1),
n_g AS (SELECT CAST(SUM(cg) AS BIGINT) AS ng FROM c_g)
SELECT l.lang, nl.n AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_shared,
       CAST(SUM(CAST(FLOOR(
         sqrt((CAST(l.c AS DOUBLE) / CAST(nl.n AS DOUBLE))
              * (CAST(g.cg AS DOUBLE) / CAST(ng.ng AS DOUBLE)))
         * 1000000000.0) AS BIGINT)) AS BIGINT) AS bc_nano
FROM c_l l JOIN c_g g USING (term) JOIN n_l nl USING (lang)
     CROSS JOIN n_g ng
GROUP BY l.lang, nl.n
""",
)
def hellinger_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detector: per language, the Bhattacharyya
    coefficient BC = sum_t sqrt(p_t * q_t) between the language's token
    distribution p and the corpus-wide distribution q — the
    Hellinger-distance core (H^2 = 1 - BC), which is what a curation
    pipeline tracks release-over-release to catch domain shift before
    a model does (JS divergence needs ln, which is not correctly
    rounded; sqrt IS, so Hellinger is the hash-portable drift metric).

    Portability: each per-token term is floor-quantized to nano BEFORE
    summation (sqrt, *, / are all correctly rounded IEEE ops, so the
    quantized BIGINTs are identical on both engines), making the SUM
    order-independent — the kmeans integer-stat discipline applied to
    a transcendental-free real-valued statistic.

    Scale shape: one (lang, term) token agg (map-side combined), a
    vocabulary-sized term rollup for q (AQE broadcasts it), lang sizes
    and the corpus total as tiny broadcasts; the BC sum partially
    aggregates map-side per lang.  Nothing after the token exchange
    scales with the corpus — only with the vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    tok = with_tokens(d).select("lang", F.explode("tk").alias("term"))
    c_l = tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n_l = c_l.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    c_g = c_l.groupBy("term").agg(F.sum("c").cast("long").alias("cg"))
    n_g = c_g.groupBy().agg(F.sum("cg").cast("long").alias("ng"))
    term = F.floor(
        F.sqrt(
            (F.col("c").cast("double") / F.col("n").cast("double"))
            * (F.col("cg").cast("double") / F.col("ng").cast("double"))
        )
        * 1000000000.0
    ).cast("long")
    return (
        c_l.join(c_g, "term")
        .join(F.broadcast(n_l), "lang")
        .crossJoin(F.broadcast(n_g))
        .groupBy("lang", F.col("n").alias("n_tokens"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_shared"),
            F.sum(term).cast("long").alias("bc_nano"),
        )
    )


# ---------------------------------------------------------------------------
# log-rank test: compare survival between experiment arms
# ---------------------------------------------------------------------------

# Per-death-time expected deaths / hypergeometric variance in arm 1
# under the pooled-hazard null, nano-floored PER TIME so the cross-time
# sums are exact integer sums (the death-time table is calendar-bounded
# but the quantize-before-sum rule removes even that fold-order
# question).  Shared SQL strings, _OLS_DET discipline.
_LOGRANK_E1 = (
    "CAST(FLOOR((CAST(dt AS DOUBLE) * CAST(n1t AS DOUBLE)"
    " / CAST(nt AS DOUBLE)) * 1000000000.0) AS BIGINT)"
)
_LOGRANK_V = (
    "CAST(FLOOR((CASE WHEN nt > 1 THEN"
    " CAST(dt AS DOUBLE) * (CAST(n1t AS DOUBLE) / CAST(nt AS DOUBLE))"
    " * (1.0 - CAST(n1t AS DOUBLE) / CAST(nt AS DOUBLE))"
    " * (CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE))"
    " ELSE 0.0 END) * 1000000000.0) AS BIGINT)"
)
_LOGRANK_Z = (
    "((CAST(o1 AS DOUBLE) - CAST(e1_nano AS DOUBLE) / 1000000000.0)"
    " / sqrt(CAST(v_nano AS DOUBLE) / 1000000000.0))"
)


@query(
    "logrank_test",
    oracle=f"""
WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
lt AS (
  SELECT user_id, user_id % 2 AS arm,
         (CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
          - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT)) // 3600
           AS lifetime_d,
         CASE WHEN MAX(ts) <= (SELECT max_ts FROM mx) - INTERVAL 1 DAY
              THEN 1 ELSE 0 END AS observed
  FROM events GROUP BY user_id
),
by_t AS (
  SELECT lifetime_d,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na1,
         CAST(SUM(CASE WHEN arm = 0 THEN observed ELSE 0 END) AS BIGINT)
           AS d0,
         CAST(SUM(CASE WHEN arm = 1 THEN observed ELSE 0 END) AS BIGINT)
           AS d1
  FROM lt GROUP BY 1
),
km AS (
  SELECT lifetime_d, d0, d1,
         CAST(SUM(na0) OVER (ORDER BY lifetime_d DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n0t,
         CAST(SUM(na1) OVER (ORDER BY lifetime_d DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n1t
  FROM by_t
),
f AS (
  SELECT d0 + d1 AS dt, n0t + n1t AS nt, n1t, d1
  FROM km WHERE d0 + d1 > 0
),
g AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM({_LOGRANK_E1}) AS BIGINT) AS e1_nano,
         CAST(SUM({_LOGRANK_V}) AS BIGINT) AS v_nano,
         CAST(COUNT(*) AS BIGINT) AS n_death_times
  FROM f
)
SELECT o1, e1_nano, v_nano, n_death_times,
       CAST(FLOOR({_LOGRANK_Z} * 1000.0) AS BIGINT) AS z_milli
FROM g
""",
)
def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing survival between experiment
    arms — the censoring-correct answer to "did the treatment change
    churn?" that pairs with kaplan_meier_survival exactly as
    welch_t_test pairs with the mean: at every pooled death time,
    observed arm-1 deaths vs the pooled-hazard expectation
    d_t * n1_t / n_t, with the hypergeometric variance; z from the
    integer-summed nano-quantized terms.

    Portability: user lifetimes/censoring reuse the KM construction
    (per-timestamp floored epochs); per-time expectation and variance
    are nano-floored BEFORE the cross-time sum (quantize-before-sum —
    the hellinger_lang_drift rule), so both engines sum identical
    BIGINTs; the final z is one shared IEEE string over exact ints.

    Scale shape: ONE user-keyed exchange (shared with KM), then every
    window/sum runs on the calendar-bounded death-time table
    (metadata-sized); arm pivots are conditional sums inside the same
    aggregations — no extra corpus pass for the second arm."""
    e = load_table(spark, sf_dir, "events")
    mx = e.groupBy().agg(F.max("ts").alias("max_ts"))
    lt = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr("user_id % 2").alias("arm"),
            F.call_function(
                "div",
                F.col("last_ts").cast("long") - F.col("first_ts").cast("long"),
                F.lit(3600),
            ).alias("lifetime_d"),
            F.when(
                F.col("last_ts") <= F.col("max_ts") - F.expr("INTERVAL 1 DAY"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("observed"),
        )
    )
    by_t = lt.groupBy("lifetime_d").agg(
        F.expr(
            "CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("na0"),
        F.expr(
            "CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("na1"),
        F.expr(
            "CAST(SUM(CASE WHEN arm = 0 THEN observed ELSE 0 END) AS BIGINT)"
        ).alias("d0"),
        F.expr(
            "CAST(SUM(CASE WHEN arm = 1 THEN observed ELSE 0 END) AS BIGINT)"
        ).alias("d1"),
    )
    w_desc = W.orderBy(F.desc("lifetime_d")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    km = by_t.select(
        "d0",
        "d1",
        F.sum("na0").over(w_desc).cast("long").alias("n0t"),
        F.sum("na1").over(w_desc).cast("long").alias("n1t"),
    )
    f = km.where(F.col("d0") + F.col("d1") > 0).select(
        (F.col("d0") + F.col("d1")).alias("dt"),
        (F.col("n0t") + F.col("n1t")).alias("nt"),
        "n1t",
        "d1",
    )
    g = f.groupBy().agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(F.expr(_LOGRANK_E1)).cast("long").alias("e1_nano"),
        F.sum(F.expr(_LOGRANK_V)).cast("long").alias("v_nano"),
        F.count(F.lit(1)).cast("long").alias("n_death_times"),
    )
    return g.select(
        "o1",
        "e1_nano",
        "v_nano",
        "n_death_times",
        F.expr(f"CAST(FLOOR({_LOGRANK_Z} * 1000.0) AS BIGINT)").alias(
            "z_milli"
        ),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (companion to kaplan_meier_survival)
# ---------------------------------------------------------------------------


@query(
    "nelson_aalen_hazard",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
lt AS (
  SELECT user_id,
         (CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
          - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT)) // 3600
           AS lifetime_d,
         CASE WHEN MAX(ts) <= (SELECT max_ts FROM mx) - INTERVAL 1 DAY
              THEN 1 ELSE 0 END AS observed
  FROM events GROUP BY user_id
),
by_t AS (
  SELECT lifetime_d, CAST(COUNT(*) AS BIGINT) AS n_at,
         CAST(SUM(observed) AS BIGINT) AS d
  FROM lt GROUP BY 1
),
rk AS (
  SELECT lifetime_d, d,
         CAST(SUM(n_at) OVER (ORDER BY lifetime_d DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk
  FROM by_t
),
hz AS (
  SELECT lifetime_d, d, n_risk,
         CAST(d * 1000000000 // n_risk AS BIGINT) AS h_nano
  FROM rk WHERE d > 0
)
SELECT lifetime_d, d AS n_deaths, n_risk, h_nano,
       CAST(SUM(h_nano) OVER (ORDER BY lifetime_d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumhaz_nano
FROM hz
""",
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over user lifetimes —
    kaplan_meier_survival's additive companion (H(t) = sum d_u/n_u;
    the estimator survival analysis prefers for hazard-rate reading
    and small risk sets, and the exponent in the Fleming-Harrington
    survival variant).  Same lifetime/censoring construction as KM:
    whole-hour lifetimes, observed = last event precedes the horizon
    minus 1 day, risk set = lifetime >= t.

    UNLIKE the KM product (which needs a pinned multiplication order),
    Nelson-Aalen is INTEGER-EXACT end-to-end: each step hazard is the
    integral division d*1e9 DIV n_risk and the cumulative hazard is a
    BIGINT prefix sum — zero IEEE arithmetic, so the hash is portable
    by construction.

    Scale shape: one user-keyed exchange, a hash agg onto the bounded
    lifetime axis (whole hours — calendar-bounded), one descending
    cumulative window for risk sets and one ascending for the hazard
    sum, both over the bounded axis."""
    e = load_table(spark, sf_dir, "events")
    mx = e.groupBy().agg(F.max("ts").alias("max_ts"))
    lt = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr(
                "(CAST(FLOOR(unix_timestamp(t1)) AS BIGINT)"
                " - CAST(FLOOR(unix_timestamp(t0)) AS BIGINT)) DIV 3600"
            ).alias("lifetime_d"),
            F.expr(
                "CASE WHEN t1 <= max_ts - INTERVAL 1 DAY THEN 1 ELSE 0 END"
            ).alias("observed"),
        )
    )
    by_t = lt.groupBy("lifetime_d").agg(
        F.count(F.lit(1)).cast("long").alias("n_at"),
        F.sum("observed").cast("long").alias("d"),
    )
    rk = by_t.select(
        "lifetime_d",
        "d",
        F.expr(
            "CAST(SUM(n_at) OVER (ORDER BY lifetime_d DESC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("n_risk"),
    )
    hz = rk.where(F.col("d") > 0).select(
        "lifetime_d",
        "d",
        "n_risk",
        F.expr("CAST(d * 1000000000 DIV n_risk AS BIGINT)").alias("h_nano"),
    )
    return hz.select(
        "lifetime_d",
        F.col("d").alias("n_deaths"),
        "n_risk",
        "h_nano",
        F.expr(
            "CAST(SUM(h_nano) OVER (ORDER BY lifetime_d"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("cumhaz_nano"),
    )
