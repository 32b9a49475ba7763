"""Batch-observable duals of the streaming commit protocols.

The streaming subsystem's exactly-once machinery (incremental
materialized-view maintenance, streaming/materialized.py; idempotent
parquet sink, streaming/sinks.py) is pytest-covered through real
readStream pipelines, but foreachBatch functions are plain
``(DataFrame, batch_id)`` callables — Structured Streaming guarantees
nothing about them beyond calling them with stable batch ids, possibly
more than once.  That makes their whole contract batch-replayable: these
queries drive the IDENTICAL production code over a deterministic split
of the events table — including deliberate re-deliveries — and return
the final store contents, so the driver's DuckDB hash check witnesses
the exactly-once protocol itself (a double-merge or double-append would
shift every aggregate and fail the hash).

Reference parity: the reference's only sink is print
(/root/reference/main.py:109); these duals stand in for the durable,
replay-safe sinks its consumers would need.

Portability note: measures are maintained in exact integer micro-units
(``FLOOR(value * 10000)``) — floor of an identical IEEE double is
bit-identical in both engines and integer sums are order-independent, so
the incremental K-batch merge provably equals the oracle's one-shot
aggregate, with no float-rounding escape hatch.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query
from odni_apache_beam_consumer_spark.streaming import materialized as MV
from odni_apache_beam_consumer_spark.streaming import sinks as SK

_N_BATCHES = 4


def _event_batches(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Deterministic micro-batch split of the events table: batch i holds
    rows with event_id % _N_BATCHES == i (id-based, so the split is
    stable across engines, partitionings, and reruns)."""
    e = load_table(spark, sf_dir, "events")
    return [
        e.where(F.pmod(F.col("event_id"), F.lit(_N_BATCHES)) == i)
        for i in range(_N_BATCHES)
    ]


@query(
    "materialized_view_convergence",
    oracle="""
SELECT user_id,
       CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT)
         AS total_scaled,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
""",
)
def materialized_view_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance, batch-replayed: fold the
    events table through :func:`streaming.materialized.algebraic_merger`
    as 4 micro-batches — re-delivering two of them mid-stream, exactly as
    an at-least-once foreachBatch would after a crash — then read the
    final snapshot.  Exactly-once holds iff the incrementally-maintained
    view equals the oracle's one-shot GROUP BY (a double-merge inflates
    every row; a dropped batch deflates them — either fails the hash).

    Scale shape: per batch one map-side-combined hash agg over the delta
    plus one keyed merge agg over |snapshot| + |delta| — the linear-in-
    versions incremental-view cost; the convergence readout itself is a
    single snapshot scan."""
    store = tempfile.mkdtemp(prefix="mv_dual_")
    try:
        merger = MV.algebraic_merger(
            store,
            keys=["user_id"],
            measures={
                "total_scaled": ("sum", "v_scaled"),
                "n_events": ("count", None),
            },
        )
        batches = [
            b.select(
                "user_id",
                F.floor(F.col("value") * 10000).cast("long").alias("v_scaled"),
            )
            for b in _event_batches(spark, sf_dir)
        ]
        for i, b in enumerate(batches):
            merger(b, i)
            if i in (1, 2):  # crash-replay: the previous batch re-delivers
                merger(batches[i - 1], i - 1)
        out = MV.read_view(spark, store)
        return out.select(
            "user_id",
            F.col("total_scaled").cast("long").alias("total_scaled"),
            F.col("n_events").cast("long").alias("n_events"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


@query(
    "idempotent_sink_ledger",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT)
         AS total_scaled,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_type
""",
)
def idempotent_sink_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once parquet appends, batch-replayed: push the events
    table through :func:`streaming.sinks.idempotent_parquet_sink` as 4
    batches with two re-deliveries (one while later batches are still
    arriving, one after the fact — both are no-ops against the marker),
    plus a simulated half-written batch that the re-delivery must
    OVERWRITE bit-for-bit rather than append to.  The ledger readout
    aggregates the sink directory; any duplicate or lost row fails the
    driver's hash check.

    Scale shape: each batch is one map-only partitioned write; the
    readout is one scan + global agg of the sink — the audit a real
    pipeline runs to reconcile a sink against its source."""
    sink_dir = tempfile.mkdtemp(prefix="sink_dual_")
    try:
        sink = SK.idempotent_parquet_sink(sink_dir)
        batches = [
            b.select("event_id", "event_type", "value")
            for b in _event_batches(spark, sf_dir)
        ]
        # Batch 0 "crashes" mid-write: parquet data lands but no marker.
        batches[0].write.mode("overwrite").parquet(
            os.path.join(sink_dir, "batch_id=0")
        )
        sink(batches[0], 0)  # re-delivery must overwrite, not append
        sink(batches[1], 1)
        sink(batches[0], 0)  # replay during the run: marker short-circuits
        sink(batches[2], 2)
        sink(batches[3], 3)
        sink(batches[2], 2)  # replay after the run
        ledger = (
            spark.read.parquet(sink_dir)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.floor(F.col("value") * 10000).cast("long"))
                .cast("long")
                .alias("total_scaled"),
                F.min("event_id").cast("long").alias("min_event_id"),
                F.max("event_id").cast("long").alias("max_event_id"),
            )
        )
        return ledger.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sink_dir, ignore_errors=True)


@query(
    "snapshot_diff_audit",
    oracle="""
WITH e0 AS (
  SELECT user_id FROM events WHERE event_id % 2 = 0 GROUP BY user_id
),
e1 AS (
  SELECT user_id FROM events WHERE event_id % 2 = 1 GROUP BY user_id
)
SELECT CASE WHEN e0.user_id IS NULL THEN 'inserted'
            WHEN e1.user_id IS NULL THEN 'unchanged'
            ELSE 'changed' END AS verdict,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM e0 FULL OUTER JOIN e1 ON e0.user_id = e1.user_id
GROUP BY 1
""",
)
def snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'What did this batch change': maintain the user-totals view for
    two micro-batches (even / odd event ids) and run the snapshot diff
    between commit 0 and commit 1, returning per-verdict key counts.
    The oracle derives the verdicts set-theoretically: a user with only
    odd-batch events is 'inserted', only even-batch 'unchanged', both
    'changed' (any new event strictly increases n_events, so the struct
    compare cannot miss).  'deleted' is impossible under algebraic merge
    — a nonzero count proves a protocol bug, and so does any count
    drift.

    Scale shape: the diff is one keyed full-outer join of two complete
    snapshots (on a table format: the commit diff read off the log);
    verdict rollup is a tiny hash agg."""
    store = tempfile.mkdtemp(prefix="mv_diff_")
    try:
        merger = MV.algebraic_merger(
            store,
            keys=["user_id"],
            measures={
                "total_scaled": ("sum", "v_scaled"),
                "n_events": ("count", None),
            },
        )
        e = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.floor(F.col("value") * 10000).cast("long").alias("v_scaled"),
        )
        merger(e.where(F.pmod(F.col("event_id"), F.lit(2)) == 0), 0)
        merger(e.where(F.pmod(F.col("event_id"), F.lit(2)) == 1), 1)
        diff = MV.diff_versions(spark, store, 0, 1, keys=["user_id"])
        return (
            diff.groupBy("verdict")
            .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)
