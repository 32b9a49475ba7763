"""Debezium CDC unit tests: envelope quarantine and LWW tombstone
semantics the driver query (plans/decode.py::cdc_debezium_apply) can't
isolate — resurrect attempts, same-ts delete ranking, marker replay."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.streaming import cdc as C

SCHEMA = "k BIGINT, v STRING"


def _envs(spark, rows):
    return spark.createDataFrame(rows, "value STRING").select(
        F.col("value").cast("binary").alias("value")
    )


def test_parse_debezium_routes_images_and_quarantine(spark):
    good_c = '{"op":"c","ts_ms":1,"after":{"k":1,"v":"a"}}'
    good_d = '{"op":"d","ts_ms":2,"before":{"k":1,"v":"a"}}'
    bad = ['{oops', '{"op":"z","ts_ms":3,"after":{"k":9,"v":"x"}}',
           '{"op":"d","ts_ms":4}']
    out = C.parse_debezium(
        _envs(spark, [(good_c,), (good_d,), *[(b,) for b in bad]]), SCHEMA
    ).collect()
    ok = [r for r in out if not r._corrupt]
    assert {(r.op, r.k, r.is_delete) for r in ok} == {
        ("c", 1, False),
        ("d", 1, True),  # delete's key recovered from BEFORE image
    }
    assert sum(r._corrupt for r in out) == 3


def test_lww_tombstone_blocks_resurrection(spark):
    store = tempfile.mkdtemp(prefix="cdc_test_")
    try:
        m = C.lww_upsert_merger(store, ["k"])
        create = C.parse_debezium(
            _envs(spark, [('{"op":"c","ts_ms":10,"after":{"k":1,"v":"a"}}',)]),
            SCHEMA,
        )
        delete = C.parse_debezium(
            _envs(spark, [('{"op":"d","ts_ms":20,"before":{"k":1,"v":"a"}}',)]),
            SCHEMA,
        )
        m(create, 0)
        m(delete, 1)
        m(create, 2)  # re-delivered OLDER create: tombstone must win
        cur = C.read_current(spark, store)
        assert cur.count() == 0
        # same-ts delete outranks the paired image row
        m(
            C.parse_debezium(
                _envs(
                    spark,
                    [
                        ('{"op":"c","ts_ms":30,"after":{"k":2,"v":"b"}}',),
                        ('{"op":"d","ts_ms":30,"before":{"k":2,"v":"b"}}',),
                    ],
                ),
                SCHEMA,
            ),
            3,
        )
        assert C.read_current(spark, store).where("k = 2").count() == 0
    finally:
        shutil.rmtree(store, ignore_errors=True)


def test_lww_marker_replay_is_noop(spark):
    store = tempfile.mkdtemp(prefix="cdc_test_")
    try:
        m = C.lww_upsert_merger(store, ["k"])
        b0 = C.parse_debezium(
            _envs(spark, [('{"op":"c","ts_ms":1,"after":{"k":5,"v":"x"}}',)]),
            SCHEMA,
        )
        m(b0, 0)
        m(b0, 0)  # foreachBatch replay with the SAME id: marker short-circuits
        cur = C.read_current(spark, store).collect()
        assert [(r.k, r.v) for r in cur] == [(5, "x")]
    finally:
        shutil.rmtree(store, ignore_errors=True)


def test_cdc_readstream_end_to_end(spark, tmp_path):
    """Debezium envelopes through a REAL readStream file replay +
    foreachBatch lww_upsert_merger: the full Kafka-shaped CDC path with
    streaming machinery in the loop (the driver query batch-replays the
    same merger; this covers the stream plumbing).  Chunk 1 updates and
    deletes keys created in chunk 0, so state must carry across
    micro-batches; the final table equals the from-first-principles
    result."""
    import json
    import os
    import time

    chunks_dir = tmp_path / "chunks"
    chunks_dir.mkdir()
    store = str(tmp_path / "store")
    os.makedirs(store)
    envs0 = [
        {"op": "c", "ts_ms": 10 + k, "after": {"k": k, "v": f"v{k}"}}
        for k in range(6)
    ]
    envs1 = [
        {"op": "u", "ts_ms": 100, "after": {"k": 2, "v": "v2b"}},
        {"op": "d", "ts_ms": 101, "before": {"k": 4, "v": "v4"}},
    ]
    now = time.time()
    for i, envs in enumerate([envs0, envs1]):
        df = spark.createDataFrame(
            [(json.dumps(e),) for e in envs], "value STRING"
        ).select(F.col("value").cast("binary").alias("value"))
        tmp = str(tmp_path / f"__tmp_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = str(chunks_dir / f"chunk_{i:05d}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (now + i, now + i))

    merger = C.lww_upsert_merger(store, ["k"])

    def apply_batch(batch, batch_id):
        merger(C.parse_debezium(batch, SCHEMA), batch_id)

    q = (
        spark.readStream.schema("value BINARY")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(chunks_dir))
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = {(r.k, r.v) for r in C.read_current(spark, store).collect()}
    assert got == {(0, "v0"), (1, "v1"), (2, "v2b"), (3, "v3"), (5, "v5")}
