"""Physical-layout queries: co-located bucketed joins and layout-aware
feature transforms.

Bucketing is the one shuffle-elimination lever the rest of the repo
talks about (plans/*.py scale-shape docstrings, SURVEY §4) but no query
demonstrated end-to-end: pre-partition both join sides into the same
bucket layout ON DISK and the biggest join in the warehouse runs with
ZERO exchanges — the difference between re-shuffling 100 TB per run and
shuffling it once at write time, amortized over every downstream join.

Hash-portability follows plans/registry.py: money carried as integer
cents, shares as integer ppm, the Benford reference as FLOOR of an
identical IEEE log10 over small-integer input.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query

_BUCKETS = 8


@query(
    "bucketed_colocated_join",
    oracle="""
SELECT strftime(DATE_TRUNC('month', o.o_orderdate), '%Y-%m') AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-fact join (lineitem ⋈ orders on orderkey) executed over
    BUCKETED table layouts: both sides are written bucketBy(8,
    orderkey) + sortBy(orderkey), so the SortMergeJoin consumes the
    on-disk bucket layout directly — ZERO exchanges and ZERO sorts below
    the join (tests/test_physical.py pins both; the only Exchange in the
    whole plan is the final month aggregation's).  This is THE 100 TB
    lever for recurring fact-fact joins: the shuffle happens once at
    write time and every subsequent join, any day, any query, skips it —
    against a per-run 100 TB exchange for the unbucketed plan.

    The broadcast threshold is disabled (saved/restored) only so the
    demo stays honest at test scale: at sf0.01 orders fits in a
    broadcast and Spark would rightly skip the SMJ — at 100 TB neither
    side broadcasts and the bucketed SMJ is the plan you get.

    Scale shape: two bucketed scans (bucket pruning applies on orderkey
    predicates, and each of the 8 buckets is one task with both sides
    co-located), one merge join with no exchange/sort, one final
    aggregation exchange on the month key.  Production sizing uses
    O(thousands) of buckets so a bucket pair fits executor memory."""
    out, cleanup = _bucketed_join_lazy(spark, sf_dir)
    try:
        return out.localCheckpoint(eager=True)
    finally:
        cleanup()


def _bucketed_join_lazy(spark: SparkSession, sf_dir: str):
    """Build the bucketed-join aggregate WITHOUT materializing it, so
    plan tests can assert the zero-exchange/zero-sort-below-join shape
    before the eager checkpoint replaces the plan with an RDD scan.
    Returns (df, cleanup); the caller MUST invoke cleanup() after the
    df is consumed (it drops the temp tables, restores the broadcast
    threshold, and removes the warehouse dir)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    wh = tempfile.mkdtemp(prefix="bucketed_wh_")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    _ordering_key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    try:
        prev_ordering = spark.conf.get(_ordering_key)
    except Exception:
        prev_ordering = None
    # Per-call unique table names: a fixed name pair + DROP IF EXISTS
    # would let two concurrent runs sharing a metastore drop each
    # other's tables mid-query.  The warehouse tempdir's basename is
    # already unique per call.
    tok = os.path.basename(wh).replace("bucketed_wh_", "")
    tl, to = f"bkt_lineitem_{tok}", f"bkt_orders_{tok}"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Off by default since Spark 3.0 (a bucket split across files isn't
    # globally sorted, so reporting sortBy order would be wrong there).
    # Safe here BECAUSE of the one-file-per-bucket write below — with it
    # the scan reports the sortBy order and the join's per-bucket Sorts
    # vanish too, not just the Exchanges.
    spark.conf.set(_ordering_key, "true")
    for df, name, key in ((li, tl, "l_orderkey"), (orders, to, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            # Repartition BY THE BUCKET KEY first (same Murmur3 hash as
            # bucketBy), so each write task holds exactly one bucket and
            # every bucket lands as ONE sorted file.  This is what lets
            # the scan report sorted output — Spark only elides the
            # join's Sort when files-per-bucket == 1 (it won't merge-sort
            # multiple sorted files); a multi-task write quietly re-adds
            # per-bucket Sorts under the join.
            df.repartition(_BUCKETS, F.col(key))
            .write.mode("overwrite")
            .bucketBy(_BUCKETS, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    joined = spark.table(tl).join(
        spark.table(to),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    out = (
        joined.groupBy(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_cents"),
        )
    )

    def cleanup() -> None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        if prev_ordering is None:
            spark.conf.unset(_ordering_key)
        else:
            spark.conf.set(_ordering_key, prev_ordering)
        for name in (tl, to):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {name}")
            except Exception:
                pass
        shutil.rmtree(wh, ignore_errors=True)

    return out, cleanup


@query(
    "quantile_normalize_features",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang, n_chars,
       CAST((rk - 1) * 1000000 // (n - 1) AS BIGINT) AS quantile_ppm
FROM ranked WHERE n >= 2
""",
)
def quantile_normalize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile normalization of a feature (doc length within
    each language): replace the raw value with its within-group rank
    mapped to [0, 1e6] ppm — the scale-free transform that makes a
    feature comparable across groups with different distributions
    (lengths in zh vs en are not comparable raw; their quantiles are).
    Deterministic tie-break by doc_id, so the ppm grid is exact integer
    arithmetic; single-member groups are excluded (normalization
    undefined).

    Scale shape: one rank window plus an unordered count window sharing
    the SAME lang partitioning — one exchange total; groups parallelize
    across languages, and within a group the sort is the unavoidable
    cost of exact ranks (an approx-percentile binning variant trades
    that for a two-pass histogram at extreme group sizes —
    quantile_binning next door is exactly that path).  ``rk`` is cast
    to BIGINT before the ppm multiply: row_number() is INT, and
    (rk-1)*1e6 overflows int32 for any group past ~2147 rows — caught
    by the 10x synthetic sweep (ANSI ARITHMETIC_OVERFLOW at ~20k-row
    groups), invisible at every committed sf."""
    w_rank = Window.partitionBy("lang").orderBy(
        F.asc("n_chars"), F.asc("doc_id")
    )
    w_all = Window.partitionBy("lang")
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .where(F.col("n") >= 2)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr(
                "CAST((CAST(rk AS BIGINT) - 1) * 1000000 DIV (n - 1) AS BIGINT)"
            ).alias("quantile_ppm"),
        )
    )


@query(
    "benford_digit_audit",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
SELECT digit,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) * 1000000 // tot.n AS BIGINT) AS share_ppm,
       CAST(FLOOR(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
         AS benford_ppm,
       CAST(COUNT(*) * 1000000 // tot.n
            - CAST(FLOOR(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
            AS BIGINT) AS deviation_ppm
FROM d CROSS JOIN tot
GROUP BY digit, tot.n
""",
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic data-forensics / DQ screen: organically-generated
    amounts follow log10(1 + 1/d); fabricated, capped, or
    unit-converted data does not, and a large deviation_ppm flags a
    source worth auditing before it trains anything.  (TPC-H-ish
    uniform prices deliberately DON'T follow Benford — the audit's
    value here is the deviation signal itself, pinned exactly.)

    All-integer output: shares are ppm via integer DIV; the Benford
    reference is FLOOR of log10 over the 9 digit literals — one IEEE op
    per digit, identical on both engines.

    Scale shape: digit extraction is map-side string arithmetic; ONE
    9-group hash aggregation plus a 1-row total broadcast-crossed back
    (whitelisted NLJ)."""
    d = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            "digit",
            "n_rows",
            F.expr("CAST(n_rows * 1000000 DIV n AS BIGINT)").alias(
                "share_ppm"
            ),
            F.floor(F.log10(1.0 + 1.0 / F.col("digit")) * 1000000)
            .cast("long")
            .alias("benford_ppm"),
        )
        .withColumn(
            "deviation_ppm",
            (F.col("share_ppm") - F.col("benford_ppm")).cast("long"),
        )
    )
