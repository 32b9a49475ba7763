"""Cross-library / reference-implementation tests for the pure-SQL
Protobuf wire codec (plans/decode.py::_pb_sint64_hex/_pb_uint64_hex/
_pb_string_hex/_pb_tag_walk): the SQL emitters' bytes must match a
plain-Python wire encoder byte-for-byte (and ``google.protobuf`` where
importable), and the tag-walk must round-trip rows the fixtures never
produce — NULL user_id (omitted field), non-ASCII strings (byte-length
prefixes), both field orders."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.plans.decode import (
    _pb_sint64_hex,
    _pb_string_hex,
    _pb_tag_walk,
    _pb_uint64_hex,
)


# ---- plain-Python Protobuf wire reference (spec algorithm) ----------

def _py_uvarint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        g = v & 0x7F
        v >>= 7
        if v:
            out.append(g | 0x80)
        else:
            out.append(g)
            return bytes(out)


def _py_tag(field_no: int, wire_type: int) -> bytes:
    return _py_uvarint((field_no << 3) | wire_type)


def _py_sint64(field_no: int, v: int) -> bytes:
    return _py_tag(field_no, 0) + _py_uvarint(((v << 1) ^ (v >> 63)))


def _py_uint64(field_no: int, v: int) -> bytes:
    return _py_tag(field_no, 0) + _py_uvarint(v)


def _py_string(field_no: int, s: str) -> bytes:
    b = s.encode("utf-8")
    return _py_tag(field_no, 2) + _py_uvarint(len(b)) + b


FIELDS = {
    "delta_cents": (1, "sint64"),
    "event_id": (2, "sint64"),
    "event_type": (3, "string"),
    "user_id": (200, "uint64"),
}

# (delta_cents, event_id, event_type, user_id) — user_id None => field
# 200 omitted; non-ASCII event_type exercises byte-length prefixes.
CASES = [
    (-1, 2, "click", 7),
    (0, 1, "view", None),
    (2**62, 2**63 - 1, "événement-é中文", 123456789),
    (-(2**62) - 1, 3, "ümläut", 2**40 + 5),
    (-5000, 4, "", None),
    (63, 5, "a", 1),
]


def _py_row_wire(dc, eid, etype, uid, order_200_first: bool) -> bytes:
    parts = [
        _py_sint64(1, dc),
        _py_sint64(2, eid),
        _py_string(3, etype),
        _py_uint64(200, uid) if uid is not None else b"",
    ]
    if order_200_first:
        parts = parts[::-1]
    return b"".join(parts)


def _encode_df(spark, order_200_first: bool):
    df = spark.createDataFrame(
        [Row(delta_cents=c[0], event_id=c[1], event_type=c[2], user_id=c[3])
         for c in CASES],
        "delta_cents BIGINT, event_id BIGINT, event_type STRING, user_id BIGINT",
    )
    f1 = _pb_sint64_hex(1, "delta_cents")
    f2 = _pb_sint64_hex(2, "event_id")
    f3 = _pb_string_hex(3, "event_type")
    f200 = f"IF(user_id IS NULL, '', {_pb_uint64_hex(200, 'user_id')})"
    order = (
        f"concat({f200}, {f3}, {f2}, {f1})"
        if order_200_first
        else f"concat({f1}, {f2}, {f3}, {f200})"
    )
    return df.select(
        "event_id", F.expr(f"unhex({order})").alias("value")
    )


@pytest.mark.parametrize("order_200_first", [False, True])
def test_sql_wire_bytes_match_python_reference(spark, order_200_first):
    enc = {r.event_id: bytes(r.value)
           for r in _encode_df(spark, order_200_first).collect()}
    for dc, eid, etype, uid in CASES:
        expect = _py_row_wire(dc, eid, etype, uid, order_200_first)
        assert enc[eid] == expect, (
            f"wire bytes differ for event_id={eid}: "
            f"{enc[eid].hex()} != {expect.hex()}"
        )


@pytest.mark.parametrize("order_200_first", [False, True])
def test_tag_walk_roundtrip_null_and_nonascii(spark, order_200_first):
    wire = _encode_df(spark, order_200_first).select("value")
    dec = _pb_tag_walk(wire, n_slots=4, fields=FIELDS)
    rows = {r.event_id: r for r in dec.collect()}
    for dc, eid, etype, uid in CASES:
        r = rows[eid]
        assert (r.delta_cents, r.event_type, r.user_id) == (dc, etype, uid)


def test_tag_walk_decodes_real_google_protobuf_bytes(spark):
    """Round-trip against the real library where importable: encode
    each case with google.protobuf's low-level wire_format helpers and
    assert our SQL tag-walk decodes the library's bytes exactly."""
    pytest.importorskip("google.protobuf")
    from google.protobuf.internal import encoder  # noqa: PLC0415

    def lib_row(dc, eid, etype, uid):
        out = []
        encoder.SInt64Encoder(1, False, False)(out.append, dc, False)
        encoder.SInt64Encoder(2, False, False)(out.append, eid, False)
        encoder.StringEncoder(3, False, False)(out.append, etype, False)
        if uid is not None:
            encoder.UInt64Encoder(200, False, False)(out.append, uid, False)
        return b"".join(out)

    data = [(lib_row(*c),) for c in CASES]
    wire = spark.createDataFrame(data, "value BINARY")
    dec = _pb_tag_walk(wire, n_slots=4, fields=FIELDS)
    rows = {r.event_id: r for r in dec.collect()}
    for dc, eid, etype, uid in CASES:
        r = rows[eid]
        assert (r.delta_cents, r.event_type, r.user_id) == (dc, etype, uid)
