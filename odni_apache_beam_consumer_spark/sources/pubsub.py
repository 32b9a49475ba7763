"""Pub/Sub(-Lite)-shaped source adapter.

BASELINE.json's north star names a "Kafka/Pub-Sub source"; sources/kafka.py
covers the Kafka half (the reference's live surface, /root/reference/
main.py:85-108).  This module covers the Pub/Sub half the same way: pure
option builders + a record-shape normalizer, unit-testable with no live
service, mirroring the PUBLIC Pub/Sub Lite Spark connector contract
(format ``pubsublite``, maven
``com.google.cloud:pubsublite-spark-sql-streaming``):

  * option ``pubsublite.subscription.path`` =
    ``projects/<p>/locations/<l>/subscriptions/<s>``
  * source schema: subscription STRING, partition BIGINT, offset BIGINT,
    key BINARY, data BINARY, publish_timestamp TIMESTAMP,
    event_timestamp TIMESTAMP, attributes MAP<STRING, ARRAY<BINARY>>
  * flow control via ``pubsublite.flowcontrol.byteoutstandingperpartition``
    / ``.messageoutstandingperpartition`` (the backpressure analog of
    Kafka's maxOffsetsPerTrigger)

``to_kafka_shape`` normalizes those records into the engine's canonical
Kafka-shaped row (key/value binary + topic/partition/offset/timestamp),
so every downstream operator (decode_json_value, windowed aggs, dedup)
is source-agnostic: swap the reader, keep the pipeline.  At 100 TB the
mapping is a zero-shuffle projection — Pub/Sub partitions map 1:1 onto
Spark input partitions exactly like Kafka topic-partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PUBSUB_LITE_FORMAT = "pubsublite"

# The connector's fixed source schema (public contract).
PUBSUB_RECORD_SCHEMA = (
    "subscription STRING, partition BIGINT, offset BIGINT, key BINARY, "
    "data BINARY, publish_timestamp TIMESTAMP, event_timestamp TIMESTAMP, "
    "attributes MAP<STRING, ARRAY<BINARY>>"
)


def subscription_path(project: str, location: str, subscription: str) -> str:
    """Fully-qualified Pub/Sub Lite subscription path."""
    for name, v in (
        ("project", project),
        ("location", location),
        ("subscription", subscription),
    ):
        if not v or "/" in v:
            raise ValueError(f"invalid {name!r}: {v!r}")
    return f"projects/{project}/locations/{location}/subscriptions/{subscription}"


def reader_options(
    subscription: str,
    max_bytes_per_partition: int | None = None,
    max_messages_per_partition: int | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble Pub/Sub Lite reader options (pure function, no service).

    ``subscription`` is the full path from :func:`subscription_path`.
    The two flow-control knobs bound per-micro-batch intake — the
    backpressure role maxOffsetsPerTrigger plays for Kafka."""
    if not subscription.startswith("projects/"):
        raise ValueError(
            "subscription must be a full path "
            "(projects/<p>/locations/<l>/subscriptions/<s>); "
            "build it with subscription_path()"
        )
    opts = {"pubsublite.subscription.path": subscription}
    if max_bytes_per_partition is not None:
        opts["pubsublite.flowcontrol.byteoutstandingperpartition"] = str(
            max_bytes_per_partition
        )
    if max_messages_per_partition is not None:
        opts["pubsublite.flowcontrol.messageoutstandingperpartition"] = str(
            max_messages_per_partition
        )
    opts.update(extra or {})
    return opts


def read_stream(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Streaming Pub/Sub Lite source.  Requires the connector jar on the
    classpath (``--packages com.google.cloud:pubsublite-spark-sql-
    streaming``); CI has no live service, so tests exercise the option
    builders and the shape mapping on synthetic records instead."""
    reader = spark.readStream.format(PUBSUB_LITE_FORMAT)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def to_kafka_shape(df: DataFrame, attributes_as_headers: bool = True) -> DataFrame:
    """Normalize Pub/Sub records to the engine's Kafka-shaped row.

    Column mapping (all zero-shuffle projections):
      data -> value (binary payload, same role as Kafka value)
      subscription -> topic (the stream's name-space identifier)
      publish_timestamp -> timestamp (broker-assigned, like Kafka's
      LogAppendTime); event_timestamp, when present, is the analog of
      Kafka's CreateTime and is carried through as ``event_timestamp``
      for watermarking on true event time.
      attributes -> headers: Kafka headers are ARRAY<STRUCT<key,value>>
      and repeatable; Pub/Sub attributes are MAP<key, ARRAY<value>> —
      flattened by exploding each key's value list, preserving
      repeatability both ways.
    """
    cols = [
        F.col("key"),
        F.col("data").alias("value"),
        F.col("subscription").alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset"),
        F.col("publish_timestamp").alias("timestamp"),
        F.col("event_timestamp"),
    ]
    if attributes_as_headers:
        cols.append(
            F.expr(
                "flatten(transform(map_entries(attributes), "
                "e -> transform(e.value, v -> struct(e.key AS key, v AS value))))"
            ).alias("headers")
        )
    return df.select(*cols)
