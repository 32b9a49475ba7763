"""Debezium-envelope CDC: parse + last-writer-wins apply.

Change data reaches Kafka overwhelmingly as Debezium-shaped JSON
envelopes ``{op, ts_ms, before, after}`` (op in c/u/r/d); the
reference's consumer genre (opaque Kafka bytes -> print,
/root/reference/main.py:85-109) is exactly where such envelopes arrive.
This module supplies the two halves its consumers would need:

* :func:`parse_debezium` — envelope JSON -> one normalized change row
  per event (op, ts_ms, payload columns), taking ``after`` for
  creates/updates/snapshot-reads and ``before`` for deletes (a delete's
  ``after`` is null by contract — the key must come from ``before``).
* :func:`lww_upsert_merger` — a foreachBatch callable maintaining the
  CURRENT TABLE STATE under at-least-once delivery: last-writer-wins by
  (ts_ms, op rank) per key, deletes persisted as TOMBSTONES so a
  re-delivered older create cannot resurrect a deleted row.  Because
  conflict resolution is by change timestamp (not arrival order),
  re-delivering ANY prefix of the stream in ANY order converges to the
  same state — idempotence falls out of the merge semantics rather than
  a commit marker, which is what makes CDC apply safe under replays,
  out-of-order topic partitions, and crash-restarts alike.  The
  snapshot/pointer commit protocol is shared with
  streaming/materialized.py (pointer flip = commit).

Scale shape: each batch merge is one keyed window over
|snapshot| + |delta| rows — at 100 TB the snapshot is a key-partitioned
table and this merge is an incremental MERGE INTO keyed on the primary
key with a ts guard; semantics identical.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.streaming.materialized import (
    latest_version,
    read_view,
)

_POINTER = "_LATEST"


def debezium_schema(payload_schema: str) -> str:
    """Spark DDL schema for a Debezium JSON envelope whose row payload
    has the given DDL schema (used for both ``before`` and ``after``)."""
    return (
        "op STRING, ts_ms BIGINT, "
        f"before STRUCT<{payload_schema}>, after STRUCT<{payload_schema}>"
    )


def parse_debezium(
    df: DataFrame,
    payload_schema: str,
    value_col: str = "value",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Envelope JSON (binary or string column) -> normalized change rows.

    Output: ``op``, ``ts_ms``, ``is_delete``, plus every payload column —
    from ``after`` for op in (c, u, r), from ``before`` for op = 'd'.
    Malformed envelopes (unparseable JSON, unknown op, missing image)
    are routed to ``_corrupt = true`` rather than dropped, the same
    quarantine discipline as the JSON/CSV file sources.

    ``passthrough`` copies transport columns (e.g. the Kafka ``offset``)
    through to the output so the merger can use a monotone sequence as
    the LWW tiebreaker for same-``ts_ms`` changes — real CDC appliers
    break ts ties on the log position (Kafka offset / Debezium
    source.lsn); without one, two non-delete changes at the same ts_ms
    resolve arbitrarily.  Names must not collide with payload columns."""
    env = df.select(
        F.from_json(
            F.col(value_col).cast("string"), debezium_schema(payload_schema)
        ).alias("e"),
        *[F.col(c) for c in passthrough],
    )
    image = F.when(F.col("e.op") == "d", F.col("e.before")).otherwise(
        F.col("e.after")
    )
    return env.select(
        F.col("e.op").alias("op"),
        F.col("e.ts_ms").alias("ts_ms"),
        (F.col("e.op") == "d").alias("is_delete"),
        (
            F.col("e.op").isNull()
            | ~F.col("e.op").isin("c", "u", "r", "d")
            | image.isNull()
        ).alias("_corrupt"),
        *passthrough,
        image.alias("row"),
    ).select("op", "ts_ms", "is_delete", "_corrupt", *passthrough, "row.*")


def lww_upsert_merger(
    store: str,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    seq_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callable applying normalized change rows (the
    :func:`parse_debezium` output shape, ``_corrupt`` rows already
    quarantined) to a keyed snapshot with last-writer-wins semantics.

    Per key the winning row is the one with the greatest
    (ts_col, is_delete[, seq_col]) — a delete at the same timestamp
    outranks the paired image row, and tombstones are KEPT in the
    snapshot so any older re-delivered change loses the window.
    ``seq_col`` (e.g. the Kafka offset passed through parse_debezium)
    breaks same-ts same-kind ties deterministically; without it two
    non-delete changes at one ts_ms resolve by incumbent-wins on the
    replay fast path and arbitrarily in a fresh merge.  ``read_current``
    strips tombstones.  The pointer-flip commit protocol matches
    streaming/materialized.algebraic_merger; on top of it, LWW makes
    even a lost marker + re-merge CONVERGENT rather than corrupting.

    Schema evolution: a batch may WIDEN the payload (a new nullable
    column appearing mid-stream — the most common real CDC event after
    row changes).  The merge unions by name with missing columns filled
    as NULL in both directions, so old snapshot rows read NULL for the
    new column and a re-delivered old-schema batch merges cleanly into
    an already-widened snapshot.

    Replay fast path: the merge window tags each row's provenance
    (incumbent vs delta) and prefers the INCUMBENT on full-rank ties, so
    "nothing changed" falls out of the merge itself — zero delta rows
    among the winners means the merged state IS the previous snapshot,
    and the write is skipped (the batch costs one merge pass into local
    checkpoint blocks, never a table rewrite).  At 100 TB this is the
    difference between a no-op MERGE INTO and rewriting the table per
    duplicate delivery — and unlike a separate winner-check join, the
    decision rides the merge pass that a winning batch needs anyway."""

    order_cols = [ts_col, "is_delete"] + ([seq_col] if seq_col else [])

    def fn(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(store, f"_committed_{batch_id}")
        if os.path.exists(marker):
            return
        committed = latest_version(store)
        if committed is not None and committed >= batch_id:
            with open(marker, "w"):
                pass
            return
        spark = batch.sparkSession
        delta = batch.where(~F.col("_corrupt")).drop("_corrupt", "op")
        prev = read_view(spark, store)
        both = (
            delta.withColumn("_src", F.lit(1))
            if prev is None
            else prev.withColumn("_src", F.lit(0)).unionByName(
                delta.withColumn("_src", F.lit(1)), allowMissingColumns=True
            )
        )
        # asc(_src) last: on a full (ts, is_delete[, seq]) tie the
        # incumbent wins — deterministic, and it makes _src==1 among the
        # winners EXACTLY "this batch changed the state".
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.desc(c) for c in order_cols], F.asc("_src")
        )
        merged = (
            both.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)  # one merge pass, reused below
        )
        # A widening batch must persist even when every row loses the LWW
        # window: skipping would leave read_current's schema dependent on
        # whether some row happened to win, and a later reader expecting
        # the new column would fail instead of seeing all-NULLs.
        widens = prev is not None and bool(
            set(delta.columns) - set(prev.columns)
        )
        if (
            prev is not None
            and not widens
            and merged.where(F.col("_src") == 1).isEmpty()
        ):
            with open(marker, "w"):
                pass
            return
        out_path = os.path.join(store, f"snapshot_{batch_id}")
        merged.drop("_src").write.mode("overwrite").parquet(out_path)
        tmp = os.path.join(store, f"._latest_{batch_id}")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(store, _POINTER))
        with open(marker, "w"):
            pass

    return fn


def read_current(spark, store: str) -> DataFrame | None:
    """Current table state: the latest snapshot minus tombstones."""
    snap = read_view(spark, store)
    if snap is None:
        return None
    return snap.where(~F.col("is_delete")).drop("is_delete")


def expire_tombstones(
    spark, store: str, horizon_ms: int, now_ms: int, ts_col: str = "ts_ms"
) -> int:
    """Tombstone retention GC: rewrite the current snapshot without
    tombstones older than ``now_ms - horizon_ms``, as a new committed
    version.  Without this, every key ever deleted lives in the LWW
    store forever; with it, state is bounded by the live keys plus one
    horizon's worth of deletes — the Kafka-compacted-topic
    ``delete.retention.ms`` / Cassandra ``gc_grace_seconds`` contract,
    with the same trade-off: a change REPLAYED from before the horizon
    can resurrect a deleted row, so the horizon must exceed the
    pipeline's maximum replay/out-of-order lag.

    Crash-safe by the same ordering argument as the merger and
    txtable.expire_versions: the pruned snapshot is fully written under
    the NEXT version number first, then the pointer flips atomically
    (os.replace) — a crash before the flip leaves the old state
    current and the orphan directory is vacuum debris, never a
    half-applied GC.  In-horizon tombstones survive verbatim, so
    replays newer than the horizon still lose the LWW window exactly
    as before.  Returns the new committed version.

    Scale shape: one filter-and-rewrite pass over the snapshot (on a
    real table format: a metadata-gated DELETE WHERE on the tombstone
    partition); never touches the change stream."""
    committed = latest_version(store)
    if committed is None:
        raise ValueError(f"no committed snapshot under {store}")
    snap = read_view(spark, store)
    cutoff = now_ms - horizon_ms
    kept = snap.where(
        ~(F.col("is_delete") & (F.col(ts_col) < F.lit(cutoff)))
    ).localCheckpoint(eager=True)
    v = committed + 1
    kept.write.mode("overwrite").parquet(os.path.join(store, f"snapshot_{v}"))
    tmp = os.path.join(store, f"._latest_{v}")
    with open(tmp, "w") as fh:
        fh.write(str(v))
    os.replace(tmp, os.path.join(store, _POINTER))
    with open(os.path.join(store, f"_committed_{v}"), "w"):
        pass
    return v
