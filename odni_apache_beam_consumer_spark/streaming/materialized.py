"""Incremental materialized-view maintenance over a stream.

The pattern the reference's print-sink demo gestures at but never builds
(/root/reference/main.py:109): keep a queryable, always-current aggregate
of an unbounded stream in plain storage.  Each micro-batch folds its
DELTA into the previous snapshot (algebraic merge — sums add, counts
add), writes a NEW versioned snapshot, then atomically flips a pointer
file.  Readers always see a complete snapshot.  The POINTER is the
commit record: on re-delivery the merger first compares the pointer
version against the incoming batch_id and skips any batch whose merge is
already visible — so a crash in ANY window (before the snapshot write,
between write and flip, or between flip and the fast-path marker) replays
without double-counting, and the merge source is always a strictly older
snapshot than the one being written (never a self-overwrite).

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


def latest_version(store: str) -> int | None:
    """Committed batch_id per the pointer file (None before first commit)."""
    p = os.path.join(store, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        v = fh.read().strip()
    return int(v) if v else None


def latest_snapshot_path(store: str) -> str | None:
    v = latest_version(store)
    return os.path.join(store, f"snapshot_{v}") if v is not None else None


def read_view(spark, store: str) -> DataFrame | None:
    """Current contents of the materialized view (None before first batch)."""
    path = latest_snapshot_path(store)
    return spark.read.parquet(path) if path else None


def user_totals_merger(store: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining per-user (total, n_events).

    Merge is algebraic: snapshot ⊎ delta under groupBy(user_id).sum —
    associative and commutative, so the result is independent of batch
    boundaries (the property the equivalence test asserts).

    Exactly-once protocol: the POINTER FLIP is the commit.  Batch ids are
    monotonically increasing, so ``pointer >= batch_id`` proves this
    batch's merge is already visible — on re-delivery we only write the
    fast-path marker and return, which closes the crash window between
    flip and marker (re-merging there would read snapshot_<batch_id>
    itself as ``prev`` and double-count the delta, and the overwrite
    would target the very path being read).  The marker is purely an
    optimization to skip the pointer read+parse on the common path."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(store, f"_committed_{batch_id}")
        if os.path.exists(marker):
            return
        committed = latest_version(store)
        if committed is not None and committed >= batch_id:
            # Crash happened after the flip but before the marker: the
            # pointer already records this batch (or a later one) as
            # visible.  Just repair the marker — do NOT re-merge.
            with open(marker, "w"):
                pass
            return
        spark = batch.sparkSession
        delta = batch.groupBy("user_id").agg(
            F.sum("value").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        # committed < batch_id here, so prev is a STRICTLY OLDER snapshot
        # than the one we are about to write — never a self-overwrite.
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
        # Order: snapshot durable -> pointer flip (THE commit; atomic
        # rename) -> marker (fast path only).
        tmp = os.path.join(store, f"._latest_{batch_id}")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(store, _POINTER))
        with open(marker, "w"):
            pass

    return fn
