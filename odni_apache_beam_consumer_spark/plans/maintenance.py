"""Table-maintenance planning queries: small-file compaction planning
and a Z-order clustering audit.

At 100 TB the table-maintenance loop (OPTIMIZE / compaction / clustering)
is a first-class workload, not an afterthought: streaming ingest leaves
thousands of under-sized files per partition, and multi-dimensional scans
only prune if the layout actually clusters the filter columns.  Both
queries here are the PLANNING side of that loop — they compute, as plain
DataFrame plans, the artifacts a maintenance service acts on: which files
merge into which compaction bin, and how well a Z-order layout would
cluster two join/filter dimensions.  The txtable layer (txtable.py) is
the execution side these plans would feed.

Reference parity: the reference (/root/reference/main.py) has no storage
layer at all; these extend the storage/protocol surface alongside
plans/storage_duals.py (BASELINE.json:6).

Hash-portability: simulated file sizes are integer bytes; bin ids come
from an integer cumulative-sum division (windowed SUM is HUGEINT in
DuckDB — always cast, the sequence_packing lesson); fill rates are
integer ppm via DIV; the Z-value is pure integer bit arithmetic
(DIV/% — no bit operators, which the two engines spell differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query

# Compaction: each simulated row costs 128 bytes; bins target 16 KiB.
# Test-scaled constants (a production run targets 128 MiB-1 GiB bins);
# the PLAN SHAPE — per-partition next-fit over size-sorted files — is
# scale-independent.
_ROW_BYTES = 128
_BIN_TARGET = 16384

# Z-order: quantize both dimensions to 4 bits (16 cells each), so the
# interleaved Z-value has 8 bits = 256 cells, mapped onto 16 files.
_Z_LEVELS = 16
_Z_FILES = 16


@query(
    "small_file_compaction_plan",
    oracle=f"""
WITH files AS (
  SELECT strftime(DATE_TRUNC('month', l_shipdate), '%Y-%m') AS part_month,
         strftime(DATE_TRUNC('day', l_shipdate), '%Y-%m-%d') AS file_day,
         CAST(COUNT(*) * {_ROW_BYTES} AS BIGINT) AS bytes
  FROM lineitem
  GROUP BY 1, 2
),
placed AS (
  SELECT part_month, bytes,
         CAST(COALESCE(SUM(bytes) OVER (
           PARTITION BY part_month
           ORDER BY bytes DESC, file_day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) // {_BIN_TARGET} AS BIGINT) AS bin_id
  FROM files
)
SELECT part_month, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(bytes) * 1000000 // {_BIN_TARGET} AS BIGINT) AS fill_ppm
FROM placed
GROUP BY part_month, bin_id
""",
)
def small_file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (OPTIMIZE) planning: day-grained ingest files inside
    each month partition are assigned to target-sized rewrite bins by
    next-fit over the size-descending file list — the assignment a
    maintenance service turns into one rewrite task per bin.  Output is
    the per-bin manifest: file count, byte total, and fill rate vs the
    bin target in ppm.

    Bin assignment is `cumulative_bytes_before DIV target` over the
    (bytes DESC, file_day) order — deterministic, and the same
    windowed-cumsum pattern as sequence_packing (the oracle CASTs the
    HUGEINT window sum).  Size-descending order is the classic
    first-fit-decreasing trick: big files claim bins first, small ones
    fill gaps, so bins exceed target by at most one file.

    Scale shape: the file listing is metadata-sized (one row per file,
    never per data row — here simulated from lineitem by one hash agg);
    the placement window partitions BY the table partition, so planning
    parallelizes across partitions and no single ordered window ever
    exceeds one partition's file count.  The final groupBy reuses the
    same (part_month) hash partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    files = (
        li.groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "part_month"
            ),
            F.date_format(
                F.date_trunc("day", "l_shipdate"), "yyyy-MM-dd"
            ).alias("file_day"),
        )
        .agg((F.count(F.lit(1)) * _ROW_BYTES).cast("long").alias("bytes"))
    )
    w = (
        Window.partitionBy("part_month")
        .orderBy(F.desc("bytes"), F.asc("file_day"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = files.select(
        "part_month",
        "bytes",
        F.coalesce(F.sum("bytes").over(w), F.lit(0))
        .cast("long")
        .alias("before_me"),
    ).select(
        "part_month",
        "bytes",
        F.expr(f"CAST(before_me DIV {_BIN_TARGET} AS BIGINT)").alias("bin_id"),
    )
    return placed.groupBy("part_month", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.expr(f"CAST(sum(bytes) * 1000000 DIV {_BIN_TARGET} AS BIGINT)").alias(
            "fill_ppm"
        ),
    )


@query(
    "zorder_clustering_audit",
    oracle=f"""
WITH bounds AS (
  SELECT MAX(l_partkey) AS max_pk, MAX(l_suppkey) AS max_sk FROM lineitem
),
q AS (
  SELECT CAST(l_partkey * {_Z_LEVELS} // (max_pk + 1) AS BIGINT) AS qa,
         CAST(l_suppkey * {_Z_LEVELS} // (max_sk + 1) AS BIGINT) AS qb
  FROM lineitem CROSS JOIN bounds
),
z AS (
  SELECT qa, qb,
         CAST(
             (((qa // 1) % 2) * 2 + ((qb // 1) % 2)) * 1
           + (((qa // 2) % 2) * 2 + ((qb // 2) % 2)) * 4
           + (((qa // 4) % 2) * 2 + ((qb // 4) % 2)) * 16
           + (((qa // 8) % 2) * 2 + ((qb // 8) % 2)) * 64
         AS BIGINT) AS zval
  FROM q
)
SELECT CAST(zval * {_Z_FILES} // 256 AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(qa) AS BIGINT) AS qa_min,
       CAST(MAX(qa) AS BIGINT) AS qa_max,
       CAST(MIN(qb) AS BIGINT) AS qb_min,
       CAST(MAX(qb) AS BIGINT) AS qb_max,
       CAST((MAX(qa) - MIN(qa) + 1) * (MAX(qb) - MIN(qb) + 1) AS BIGINT)
         AS span_area,
       CAST(COUNT(DISTINCT qa * {_Z_LEVELS} + qb) AS BIGINT) AS n_cells
FROM z
GROUP BY 1
""",
)
def zorder_clustering_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: quantize (l_partkey, l_suppkey) to a
    16x16 grid, bit-interleave into an 8-bit Z-value, map Z-ranges onto
    16 files, and report each file's min/max bounding box on
    both dimensions — exactly the per-file column statistics a
    min/max-pruning scan consults.  Tight boxes (span_area near
    n_cells) are WHY Z-order works: a predicate on either dimension
    skips most files, which a single-column sort can't deliver for the
    second column.  This is the audit a maintenance service runs to
    decide whether a table needs re-clustering (txtable.py's Z-order
    writer is the execution side).

    The interleave is pure integer arithmetic — `((q DIV 2^i) % 2)`
    per bit, recombined with powers of 4 — identical on both engines
    (no engine-specific bit operators); file assignment is
    `z * n_files DIV 256`, rank-free, so there is NO global row_number
    over the corpus.

    Scale shape: the key bounds are a 1-row aggregate broadcast-crossed
    back (whitelisted NLJ); quantize + interleave are map-side
    arithmetic; ONE hash aggregation onto 16 groups (with a distinct-count that
    hash-partitions by file_id).  At 100 TB the file count scales with
    the data but the per-file stats stay one row each — the audit
    output is metadata-sized."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.max("l_partkey").alias("max_pk"), F.max("l_suppkey").alias("max_sk")
    )
    q = li.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"CAST(l_partkey * {_Z_LEVELS} DIV (max_pk + 1) AS BIGINT)").alias(
            "qa"
        ),
        F.expr(f"CAST(l_suppkey * {_Z_LEVELS} DIV (max_sk + 1) AS BIGINT)").alias(
            "qb"
        ),
    )
    z = q.select(
        "qa",
        "qb",
        F.expr(
            "CAST("
            "  (((qa DIV 1) % 2) * 2 + ((qb DIV 1) % 2)) * 1"
            "+ (((qa DIV 2) % 2) * 2 + ((qb DIV 2) % 2)) * 4"
            "+ (((qa DIV 4) % 2) * 2 + ((qb DIV 4) % 2)) * 16"
            "+ (((qa DIV 8) % 2) * 2 + ((qb DIV 8) % 2)) * 64"
            " AS BIGINT)"
        ).alias("zval"),
    )
    return (
        z.groupBy(
            F.expr(f"CAST(zval * {_Z_FILES} DIV 256 AS BIGINT)").alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("qa").cast("long").alias("qa_min"),
            F.max("qa").cast("long").alias("qa_max"),
            F.min("qb").cast("long").alias("qb_min"),
            F.max("qb").cast("long").alias("qb_max"),
            (
                (F.max("qa") - F.min("qa") + 1)
                * (F.max("qb") - F.min("qb") + 1)
            )
            .cast("long")
            .alias("span_area"),
            F.countDistinct(
                F.col("qa") * _Z_LEVELS + F.col("qb")
            )
            .cast("long")
            .alias("n_cells"),
        )
    )
