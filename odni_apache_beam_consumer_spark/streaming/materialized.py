"""Incremental materialized-view maintenance over a stream.

The pattern the reference's print-sink demo gestures at but never builds
(/root/reference/main.py:109): keep a queryable, always-current aggregate
of an unbounded stream in plain storage.  Each micro-batch folds its
DELTA into the previous snapshot (algebraic merge — sums add, counts
add), writes a NEW versioned snapshot, then atomically flips a pointer
file.  Readers always see a complete snapshot; a crash between write and
flip re-delivers the batch and the idempotence marker skips the re-merge.

Why not update-mode + a key-value sink: plain parquet + pointer works on
any shared filesystem, keeps full snapshot history (time travel /
debugging), and the merge is a batch job Catalyst optimizes like any
other.  At 100 TB the snapshot is partitioned storage and the merge is an
incremental MERGE INTO on a table format; this module is the
format-free core of that loop.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POINTER = "_LATEST"


def latest_snapshot_path(store: str) -> str | None:
    p = os.path.join(store, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        v = fh.read().strip()
    return os.path.join(store, f"snapshot_{v}") if v else None


def read_view(spark, store: str) -> DataFrame | None:
    """Current contents of the materialized view (None before first batch)."""
    path = latest_snapshot_path(store)
    return spark.read.parquet(path) if path else None


def user_totals_merger(store: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining per-user (total, n_events).

    Merge is algebraic: snapshot ⊎ delta under groupBy(user_id).sum —
    associative and commutative, so the result is independent of batch
    boundaries (the property the equivalence test asserts).  Idempotent
    on batch_id via commit markers, same protocol as
    sinks.idempotent_parquet_sink."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(store, f"_committed_{batch_id}")
        if os.path.exists(marker):
            return
        spark = batch.sparkSession
        delta = batch.groupBy("user_id").agg(
            F.sum("value").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        prev = read_view(spark, store)
        merged = (
            delta
            if prev is None
            else prev.unionByName(delta)
            .groupBy("user_id")
            .agg(
                F.sum("total").alias("total"),
                F.sum("n_events").cast("long").alias("n_events"),
            )
        )
        out = os.path.join(store, f"snapshot_{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        # Order matters: snapshot durable -> pointer flip -> marker.  A
        # crash at any point re-runs the batch; the overwrite regenerates
        # the same snapshot, the flip is a tiny atomic-rename-class write.
        tmp = os.path.join(store, f"._latest_{batch_id}")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(store, _POINTER))
        with open(marker, "w"):
            pass

    return fn
