"""Storage-layout operators: bucketed tables, co-located joins, compaction.

At 100 TB the dominant recurring cost of a pipeline is often not one
query's shuffle but the SAME shuffle re-paid by every downstream job that
joins or aggregates on the canonical key (doc_id, o_orderkey, user_id).
Bucketing amortizes it: pay one layout shuffle at write time, then every
bucket-key equi-join / groupBy reads co-located, pre-sorted buckets with
NO Exchange in the plan.  tests/test_storage.py asserts exactly that —
a bucketed self-join plans with zero ShuffleExchange operators.

Compaction is the other storage chore a real corpus needs: streaming
ingest and fine-grained dedup deltas leave thousands of small files;
``compact`` rewrites a directory into ~target-size range-partitioned
files (range, not hash, so min/max footer stats stay selective and
downstream range predicates still prune files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as an external bucketed (and bucket-sorted) table.

    ``sortBy`` matters as much as ``bucketBy``: with sorted buckets a
    bucket-key join is a zero-shuffle sort-merge whose sort is also free.
    ``n_buckets`` must match between tables meant to co-join; pick it so
    one bucket of the LARGER table fits an executor core's memory at the
    target scale (100 TB / 32 buckets is too coarse — production would use
    1024+; tests use small counts for speed).
    """
    w = df.write.format(fmt).mode("overwrite").option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (must go through the
    catalog — ``spark.read.parquet(path)`` on the same files loses the
    bucketing metadata and re-shuffles on join)."""
    return spark.table(table)


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    range_cols: list[str],
    n_files: int,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite a (small-file-fragmented) parquet directory into ``n_files``
    range-partitioned files ordered by ``range_cols``.

    ``repartitionByRange`` samples the key distribution, so output files
    are balanced even under skew; ordering by the range key clusters values
    so each file's parquet min/max footer spans a narrow range — point and
    range predicates on ``range_cols`` then skip whole files at scan time.
    """
    df = spark.read.parquet(src_dir)
    w = (
        df.repartitionByRange(n_files, *range_cols)
        .sortWithinPartitions(*range_cols)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(dst_dir)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "event_date",
    fmt: str = "parquet",
) -> None:
    """Write a fact table partitioned by the date of ``ts_col`` —
    hive-style ``event_date=YYYY-MM-DD/`` directories.

    This is THE layout for time-series facts at 100 TB: any query with a
    date (or timestamp-range) predicate prunes to the matching
    directories before a single file is opened — the difference between
    scanning a day and scanning three years.  The partition column is
    derived, not dropped from the data: readers that filter on the raw
    timestamp still benefit via the derived-date predicate (see
    tests/test_storage.py::test_date_partition_pruning)."""
    from pyspark.sql import functions as F

    (
        df.withColumn(partition_col, F.date_format(ts_col, "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .format(fmt)
        .save(path)
    )
