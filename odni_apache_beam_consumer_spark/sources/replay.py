"""File-stream replay: turn the batch ``events`` table into a stream.

CI has no Kafka broker, so streaming correctness is tested by replaying
events through Spark's file-stream source in event-id order with
``maxFilesPerTrigger=1`` — micro-batch consumption with the same
incremental semantics the reference's Kafka read would produce, and a
bounded drain via ``trigger(availableNow=True)`` (the analog of the
reference's ``max_num_records=3``, /root/reference/main.py:106).

Also provides ``as_kafka_records``: re-shapes events rows into the exact
Kafka source schema (key/value binary + metadata columns) so Kafka-shaped
pipelines can be exercised end-to-end without a broker (FIXTURES.md §B).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table

EVENTS_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"


def write_replay_chunks(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 8
) -> str:
    """Write events as n_chunks ordered parquet files under out_dir."""
    e = load_table(spark, sf_dir, "events").orderBy("event_id")
    total = e.count()
    per = (total + n_chunks - 1) // n_chunks
    chunk = (F.col("event_id") / per).cast("int")
    # one file per chunk, named in order so the file source picks them up
    # deterministically
    pdf = e.withColumn("chunk", chunk).toPandas()
    os.makedirs(out_dir, exist_ok=True)
    for i, grp in pdf.groupby("chunk"):
        grp.drop(columns=["chunk"]).to_parquet(
            os.path.join(out_dir, f"chunk_{int(i):05d}.parquet"), index=False
        )
    return out_dir


def read_stream(spark: SparkSession, replay_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(replay_dir)
    )


def as_kafka_records(df: DataFrame, topic: str = "test-topic") -> DataFrame:
    """Shape events rows as Spark Kafka-source records (FIXTURES.md §B):
    key/value binary, topic/partition/offset/timestamp/timestampType/
    headers — the with_metadata=True record of the reference
    (/root/reference/main.py:105) in its Spark-native form."""
    return df.select(
        F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
        F.encode(
            F.to_json(F.struct("event_id", "ts", "user_id", "event_type", "value", "props")),
            "UTF-8",
        ).alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod("user_id", F.lit(4)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
        F.expr(
            "CAST(array() AS array<struct<key:string,value:binary>>)"
        ).alias("headers"),
    )
