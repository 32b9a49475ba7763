"""Pub/Sub adapter unit tests — no live service (builders are pure; the
record-shape mapping runs on synthetic rows with the connector's public
schema).  Mirrors tests/test_kafka.py for the other half of the
"Kafka/Pub-Sub source" north star.
"""

from __future__ import annotations

import datetime as dt

import pytest

from odni_apache_beam_consumer_spark.sources import pubsub as P


def test_subscription_path():
    assert (
        P.subscription_path("proj-1", "us-central1-a", "sub")
        == "projects/proj-1/locations/us-central1-a/subscriptions/sub"
    )


@pytest.mark.parametrize("bad", [("", "l", "s"), ("p/x", "l", "s"), ("p", "l", "")])
def test_subscription_path_rejects_malformed(bad):
    with pytest.raises(ValueError):
        P.subscription_path(*bad)


def test_reader_options_flow_control():
    path = P.subscription_path("p", "l", "s")
    opts = P.reader_options(
        path, max_bytes_per_partition=4 * 1024 * 1024, max_messages_per_partition=1000
    )
    assert opts == {
        "pubsublite.subscription.path": path,
        "pubsublite.flowcontrol.byteoutstandingperpartition": "4194304",
        "pubsublite.flowcontrol.messageoutstandingperpartition": "1000",
    }


def test_reader_options_requires_full_path():
    with pytest.raises(ValueError):
        P.reader_options("just-a-name")


def _pubsub_rows(spark):
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = dt.datetime(2024, 1, 1, 11, 59, 0)
    rows = [
        (
            "projects/p/locations/l/subscriptions/s",
            0,
            7,
            b"k1",
            b'{"x": 1}',
            ts,
            ev,
            {"trace": [b"abc", b"def"], "source": [b"unit"]},
        ),
        (
            "projects/p/locations/l/subscriptions/s",
            1,
            9,
            None,
            b'{"x": 2}',
            ts,
            None,
            {},
        ),
    ]
    return spark.createDataFrame(rows, P.PUBSUB_RECORD_SCHEMA)


def test_to_kafka_shape_columns_and_values(spark):
    out = P.to_kafka_shape(_pubsub_rows(spark))
    assert out.columns == [
        "key",
        "value",
        "topic",
        "partition",
        "offset",
        "timestamp",
        "event_timestamp",
        "headers",
    ]
    rows = {r.offset: r for r in out.collect()}
    assert bytes(rows[7].value) == b'{"x": 1}'
    assert rows[7].topic.endswith("/subscriptions/s")
    assert rows[7].partition == 0 and isinstance(rows[7].partition, int)
    # attributes flatten to repeatable Kafka-style headers
    headers = {(h.key, bytes(h.value)) for h in rows[7].headers}
    assert headers == {("trace", b"abc"), ("trace", b"def"), ("source", b"unit")}
    assert rows[9].headers == []
    assert rows[9].key is None


def test_to_kafka_shape_feeds_decode_json_value(spark):
    """The normalized record must plug straight into the Kafka-side JSON
    bridge — one pipeline, two sources."""
    from odni_apache_beam_consumer_spark.sources.kafka import decode_json_value

    shaped = P.to_kafka_shape(_pubsub_rows(spark), attributes_as_headers=False)
    parsed = decode_json_value(shaped, "x INT")
    got = sorted(r.x for r in parsed.collect())
    assert got == [1, 2]
