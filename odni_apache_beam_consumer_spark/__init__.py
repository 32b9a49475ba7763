"""PySpark-native analytics engine (UMD-ARLIS/odni-apache-beam-consumer,
rebuilt Spark-first).

Public entry points:

    from odni_apache_beam_consumer_spark import get_spark, load_table
    spark = get_spark()
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")

Package map:
    session.py     — SparkSession factory (AQE, Arrow, UTC, bloom filter)
    catalog.py     — schema-first table loading + SQL-front-door views
    plans/         — 129 registered queries (@query registry; the driver
                     contract re-exports it via __spark_entry__.py)
    operators/     — dedup, similarity/ANN/JL, sampling, text, multimodal,
                     skew
    sources/       — Kafka, Pub/Sub-shaped, file replay, rate, JSON/CSV,
                     custom Python DataSource, Secrets-Manager hook
    streaming/     — watermarked windows, stream-stream joins, stateful
                     ops, sinks, incremental materialized views
    storage.py     — bucketed tables, compaction, date partitioning,
                     Z-order
"""

from odni_apache_beam_consumer_spark.catalog import (  # noqa: F401
    load_table,
    load_tables,
    register_views,
)
from odni_apache_beam_consumer_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark", "load_table", "load_tables", "register_views"]
