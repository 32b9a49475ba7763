"""Edge-value tests for the pure-SQL Avro zigzag-varint codec
(plans/decode.py::_avro_varint_hex/_avro_varint_val): the round trip
must be exact at group boundaries, for both signs, at zero, and at
magnitudes the fixtures never reach — cross-checked against a
plain-Python Avro reference encoder."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.plans.decode import (
    _avro_varint_hex,
    _avro_varint_len,
    _avro_varint_val,
)

EDGE_VALUES = [
    0, 1, -1, 2, -2, 63, 64, -63, -64, 127, 128, -128,
    2**7 - 1, 2**7, 2**14 - 1, 2**14, 2**21, 2**28, 2**35,
    -(2**7), -(2**14), -(2**21), -(2**35),
    2**55 - 1, -(2**55), 2**61, -(2**61),
    # full int64 domain: the arithmetic zigzag (2v / -2v-1) overflowed
    # here; the bit-op form must match the reference bit-for-bit
    2**62, -(2**62), 2**62 + 1, -(2**62) - 1, 2**63 - 1, -(2**63),
]


def _py_avro_varint(v: int) -> bytes:
    """Plain-Python Avro long encoder (the spec's reference algorithm)."""
    z = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        g = z & 0x7F
        z >>= 7
        if z:
            out.append(g | 0x80)
        else:
            out.append(g)
            return bytes(out)


def test_varint_roundtrip_and_wire_bytes_match_reference(spark):
    df = spark.createDataFrame([(v,) for v in EDGE_VALUES], "v BIGINT")
    enc = df.select(
        "v", F.expr("unhex(" + _avro_varint_hex("v") + ")").alias("value")
    )
    dec = enc.withColumn("l", F.expr(_avro_varint_len("1"))).withColumn(
        "d", F.expr(_avro_varint_val("1", "l"))
    )
    rows = {r.v: (bytes(r.value), r.d) for r in dec.collect()}
    for v in EDGE_VALUES:
        wire, decoded = rows[v]
        assert wire == _py_avro_varint(v), f"wire bytes differ for {v}"
        assert decoded == v, f"round trip broke for {v}"


@pytest.mark.parametrize("pair", [(0, -1), (300, -300), (2**20, 5)])
def test_varint_concatenated_fields_track_offsets(spark, pair):
    """Two varints back to back: the offset arithmetic must land the
    second decode exactly after the first's last byte."""
    a, b = pair
    df = spark.createDataFrame([(a, b)], "a BIGINT, b BIGINT")
    enc = df.select(
        F.expr(
            "unhex(concat("
            + _avro_varint_hex("a")
            + ", "
            + _avro_varint_hex("b")
            + "))"
        ).alias("value")
    )
    dec = (
        enc.withColumn("l1", F.expr(_avro_varint_len("1")))
        .withColumn("d1", F.expr(_avro_varint_val("1", "l1")))
        .withColumn("p2", F.col("l1") + 1)
        .withColumn("l2", F.expr(_avro_varint_len("p2")))
        .withColumn("d2", F.expr(_avro_varint_val("p2", "l2")))
    )
    r = dec.collect()[0]
    assert (r.d1, r.d2) == (a, b)
