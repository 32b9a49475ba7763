"""Kafka builder unit tests — no broker needed (the builders are pure).

Asserts the constructed option dicts mirror the reference's consumer
config exactly (/root/reference/main.py:86-104), that credentials are
JAAS-escaped, that the secret-fed path closes the loop the reference left
open, and that the sink refuses the reference's WriteToKafka bug class
(empty producer config / missing topic, main.py:80-84).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.sources import kafka as K
from odni_apache_beam_consumer_spark.sources.secrets import (
    kafka_options_from_secret,
    static_provider,
)


def test_consumer_options_mirror_reference():
    opts = K.consumer_options("broker1:9098,broker2:9098")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9098,broker2:9098",
        "subscribe": "test-topic",  # main.py:104
        "startingOffsets": "earliest",  # main.py:89 auto.offset.reset
        "includeHeaders": "true",  # main.py:105 with_metadata=True
        "kafka.group.id": "tap_kafka_read",  # main.py:88
    }


def test_msk_scram_options_auth_block():
    opts = K.msk_scram_options("b:9098", "user", "pw", max_offsets_per_trigger=3)
    assert opts["kafka.security.protocol"] == "SASL_SSL"  # main.py:90
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"  # main.py:91
    assert opts["kafka.sasl.jaas.config"] == (
        "org.apache.kafka.common.security.scram.ScramLoginModule required "
        'username="user" password="pw";'
    )
    # max_num_records=3 analog (main.py:106)
    assert opts["maxOffsetsPerTrigger"] == "3"


def test_jaas_escaping_special_chars():
    jaas = K.scram_jaas_config('u"ser', 'p\\w";inject=true')
    assert jaas == (
        "org.apache.kafka.common.security.scram.ScramLoginModule required "
        'username="u\\"ser" password="p\\\\w\\";inject=true";'
    )


def test_kafka_options_from_secret_closes_the_loop():
    provider = static_provider(
        {
            "odni-msk-rest-proxy": {
                "MSK_BROKERS": "b1:9098",
                "MSK_USER": "svc",
                "MSK_PASSWORD": "s3cret",
            }
        }
    )
    opts = kafka_options_from_secret(provider)
    # Unlike the reference (fetches the secret then hardcodes values,
    # main.py:71,87,92), the secret actually feeds the options.
    assert opts["kafka.bootstrap.servers"] == "b1:9098"
    assert 'username="svc"' in opts["kafka.sasl.jaas.config"]
    assert 'password="s3cret"' in opts["kafka.sasl.jaas.config"]
    assert opts["subscribe"] == "test-topic"


def test_write_stream_refuses_missing_topic_or_checkpoint(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="topic"):
        K.write_stream(df, "b:9098", "", "/tmp/ckpt")
    with pytest.raises(ValueError, match="checkpoint"):
        K.write_stream(df, "b:9098", "t", "")
    with pytest.raises(ValueError):
        K.write_stream(df, "", "t", "/tmp/ckpt")


def test_read_builders_construct_without_broker(spark):
    # No broker: .load() would fail on connect, but building the reader
    # plan must not touch the network. Batch builder drops the
    # streaming-only option and sets endingOffsets.
    opts = K.msk_scram_options("b:9098", "u", "p", max_offsets_per_trigger=3)
    batch_opts = dict(opts)
    batch_opts.pop("maxOffsetsPerTrigger")
    assert "maxOffsetsPerTrigger" not in batch_opts


def _kafka_shaped(spark, payloads: list[bytes]):
    rows = [(b"k", v, "t", 0, i, None) for i, v in enumerate(payloads)]
    return spark.createDataFrame(
        rows,
        "key BINARY, value BINARY, topic STRING, partition INT, "
        "offset BIGINT, timestamp TIMESTAMP",
    )


def test_decode_avro_value_jar_gated(spark):
    """Without the spark-avro jar the decoder must fail at BUILD time
    with the --packages coordinate, not a ClassNotFound mid-query."""
    df = _kafka_shaped(spark, [b"\x00"])
    schema = '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'
    try:
        out = K.decode_avro_value(df, schema)
    except RuntimeError as e:
        assert "spark-avro" in str(e)
    else:  # jar present (not in this sandbox, but the builder must work)
        assert "a" in out.columns


def test_decode_protobuf_value_jar_gated(spark):
    """Java-class form (no driver-side descriptor read) exercises the
    jar gate: absent the jar the failure names the --packages fix."""
    df = _kafka_shaped(spark, [b"\x00"])
    try:
        out = K.decode_protobuf_value(df, "com.example.M", None)
    except RuntimeError as e:
        assert "spark-protobuf" in str(e)
    else:
        assert out is not None


def test_decode_protobuf_genuine_error_not_reworded(spark):
    """A wrong descriptor PATH is a user error, not a packaging problem:
    it must surface as FileNotFoundError, never the misleading
    missing-jar hint (jar-present analysis errors take the same path)."""
    import pytest

    df = _kafka_shaped(spark, [b"\x00"])
    with pytest.raises(FileNotFoundError):
        K.decode_protobuf_value(df, "M", "/nonexistent.desc")


def test_strip_confluent_header_slices_exact_bytes(spark):
    """magic byte 0x00 + BE schema id + body: the split must recover the
    id and the untouched body for ids spanning multiple bytes."""
    frames = [
        bytes([0]) + (42).to_bytes(4, "big") + b'{"x":1}',
        bytes([0]) + (65536).to_bytes(4, "big") + b"payload-bytes",
    ]
    out = K.strip_confluent_header(_kafka_shaped(spark, frames)).select(
        "schema_id", F.col("value").cast("string").alias("body")
    )
    got = {(r.schema_id, r.body) for r in out.collect()}
    assert got == {(42, '{"x":1}'), (65536, "payload-bytes")}
