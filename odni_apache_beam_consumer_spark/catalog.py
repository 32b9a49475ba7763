"""Table catalog: schema-first loading of the driver's parquet tables.

The reference has no schema system at all (``/root/reference/main.py`` —
records flow as opaque bytes into ``beam.Map(print)``).  This engine is
schema-first: every table is loaded with an explicit, asserted schema so a
bad file fails at plan time, not mid-job at 100 TB.

``events.ts`` is written as parquet timestamp[ns]; Spark reads it as
TIMESTAMP (microsecond precision) — the generator emits second-granularity
values so no precision is lost, and the DuckDB oracle casts TIMESTAMP_NS to
TIMESTAMP identically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins: at any
# scale factor these stay tiny relative to the fact tables (region=5,
# nation=25 rows regardless of sf).
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects unless nanosAsLong is set. The driver may hand us
        # a session without it — set it at runtime (it is a dynamic conf).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin the session timezone too: ts becomes TIMESTAMP_LTZ, so
        # date_format/unix_timestamp outputs would silently shift against
        # the tz-naive DuckDB oracle on a non-UTC driver session.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long ns
    # (spark.sql.legacy.parquet.nanosAsLong) — convert to TIMESTAMP with
    # exact integer division (ns -> us), identical to the oracle's
    # CAST(ts AS TIMESTAMP) truncation. Pure JVM expression, stays
    # vectorized / codegen'd.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            # Newer generators write ts as TIMESTAMP_NTZ (isAdjustedToUTC=
            # false). Canonicalize to TIMESTAMP: with the session timezone
            # pinned to UTC above, the cast is value-preserving, and every
            # downstream plan/schema (replay, Kafka shaping, window duals)
            # is written against TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table as a DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> dict[str, DataFrame]:
    """Expose the whole catalog to raw ``spark.sql``: every table becomes a
    (session-scoped) temp view, schema-first via load_table.  This is the
    SQL front door — any query in plans/ has an equivalent a user can type
    as ANSI SQL against these views, same Catalyst plans either way.
    Returns the registered DataFrames keyed by (prefixed) view name."""
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(prefix + name)
        tables[prefix + name] = df
    return tables


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Small-split guard for CPU-heavy per-row stages (tokenize, shingle,
    hash): repartition ONLY when the scan produced fewer splits than the
    cluster has slots.

    Parquet parallelism is bounded by row groups — a single-row-group file
    (exactly what the small test fixtures are) scans as ONE task, so an
    expensive map stage runs on one core no matter how many are idle.  At
    100 TB inputs have thousands of row groups and this is a no-op (the
    partition count check fails, no shuffle is added); on under-split
    inputs the one extra round-trip of the raw rows buys full-width
    parallelism for the dominant compute stage.  Standard Spark practice:
    repartition before expensive narrow work only when splits < slots."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
