"""Transactional batch table: versioned snapshots with atomic commits.

Reference parity: the reference has no storage layer at all (its only
durable effect is printing Kafka records, /root/reference/main.py:109);
this module provides the committed-write surface any production
consumer of that stream needs downstream.

Closes the "no transactional table format" gap natively: the same
pointer-is-commit protocol as the streaming materialized-view store
(streaming/materialized.py), generalized into a BATCH write API —
append / merge (upsert) / delete with ACID-style visibility, time
travel, operation-id idempotency, and optimistic conflict detection.
This is the format-free core of what Delta/Iceberg provide; the method
surface (`append`, `merge`, `delete_where`, `read(version=...)`,
`history`) maps 1:1 onto their transaction-log operations, so swapping a
real table format in changes the storage calls, not the pipeline code.

Protocol (all on any shared filesystem — no lock service):

* every committed state is a COMPLETE immutable snapshot directory
  ``snapshot_v{n}`` plus a commit metadata file ``commit_v{n}.json``;
* the pointer file ``_LATEST`` names the committed version; it is
  written via tmp-file + atomic rename, and IS the commit record —
  readers resolve it once and then read only immutable files, so a
  reader never observes a partial write;
* a crash before the pointer flip leaves an orphan snapshot that is
  invisible and harmlessly overwritten by the next attempt;
* idempotency: a commit may carry an ``op_id``; if the history already
  contains it the commit is a no-op (safe replay of e.g. a retried
  orchestrator task);
* optimistic concurrency: the writer records the version it read; if
  the pointer moved before its flip, the commit raises
  ``CommitConflict`` instead of clobbering the other writer (rewrite
  semantics: re-run the operation on the new base).

Scale shape: a commit rewrites ONE new snapshot — for append that is
``prev ∪ delta`` (at 100 TB a real format appends files + log entry
instead of rewriting; `append` here is honest about being
copy-on-write), for merge/delete it is the same full-snapshot rewrite
every MERGE INTO performs on the affected files.  Snapshots are plain
parquet: every read is a normal Catalyst scan with pushdown/pruning.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_POINTER = "_LATEST"


class CommitConflict(RuntimeError):
    """Another writer committed between this transaction's read and flip."""


class TransactionalTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- protocol internals -------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.path, _POINTER)

    def latest_version(self) -> int | None:
        p = self._pointer_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def _snapshot(self, v: int) -> str:
        return os.path.join(self.path, f"snapshot_v{v}")

    def _commit_meta(self, v: int) -> str:
        return os.path.join(self.path, f"commit_v{v}.json")

    def _flip(self, v: int, expected_prev: int | None) -> None:
        if self.latest_version() != expected_prev:
            raise CommitConflict(
                f"pointer moved (expected {expected_prev}, "
                f"found {self.latest_version()}) — rerun on the new base"
            )
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer_path())  # atomic on POSIX

    def _committed_op_ids(self) -> set[str]:
        ids = set()
        for v in self.versions():
            try:
                with open(self._commit_meta(v)) as f:
                    op = json.load(f).get("op_id")
                if op:
                    ids.add(op)
            except (OSError, ValueError):
                continue
        return ids

    def _commit(
        self,
        df: DataFrame,
        operation: str,
        op_id: str | None,
        expected_prev: int | None,
    ) -> int | None:
        """Write df as the next snapshot and atomically flip the pointer.

        ``expected_prev`` is the version the transaction READ its base
        from — the optimistic-concurrency token.  If another writer
        flipped the pointer since, the flip raises ``CommitConflict``
        instead of committing a result derived from a stale base.
        Returns the committed version, or None if op_id was already
        committed (idempotent replay)."""
        prev = expected_prev
        if op_id is not None and op_id in self._committed_op_ids():
            return None
        if self.latest_version() != prev:
            raise CommitConflict(
                f"pointer moved before write (expected {prev}, found "
                f"{self.latest_version()}) — rerun on the new base"
            )
        v = 0 if prev is None else prev + 1
        # Write to a private staging dir, then CLAIM snapshot_v{v} via
        # atomic rename (put-if-absent: rename onto an existing non-empty
        # dir fails) — a concurrent writer racing for the same version
        # can therefore never overwrite files a reader may already see.
        staging = self._snapshot(v) + ".staging-" + os.urandom(6).hex()
        df.write.mode("overwrite").parquet(staging)
        try:
            self._claim(staging, v)
        except CommitConflict:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            raise
        with open(self._commit_meta(v), "w") as f:
            json.dump({"version": v, "operation": operation, "op_id": op_id}, f)
        # ...then the atomic flip, re-checked against concurrent commits.
        self._flip(v, prev)
        return v

    def _claim(self, staging: str, v: int) -> None:
        dst = self._snapshot(v)
        try:
            os.rename(staging, dst)
            return
        except OSError:
            pass
        # dst exists.  Committed (meta present or pointer reached v) ->
        # genuine conflict.  Otherwise it is an orphan from a writer that
        # crashed between snapshot write and flip: repair by removing it
        # and claiming again.
        latest = self.latest_version()
        if os.path.exists(self._commit_meta(v)) or (
            latest is not None and latest >= v
        ):
            raise CommitConflict(f"snapshot_v{v} already claimed")
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
        try:
            os.rename(staging, dst)
        except OSError as exc:  # lost the repair race too
            raise CommitConflict(f"snapshot_v{v} already claimed") from exc

    # -- public API ---------------------------------------------------------

    def versions(self) -> list[int]:
        latest = self.latest_version()
        if latest is None:
            return []
        return [
            v
            for v in range(latest + 1)
            if os.path.exists(self._commit_meta(v))
        ]

    def history(self) -> list[dict]:
        out = []
        for v in self.versions():
            with open(self._commit_meta(v)) as f:
                out.append(json.load(f))
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot-isolated read: resolve the pointer once, then scan
        only immutable files.  ``version`` time-travels."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"{self.path}: no committed version")
        snap = self._snapshot(v)
        if version is not None and not os.path.exists(self._commit_meta(v)):
            raise FileNotFoundError(f"{self.path}: no committed version {v}")
        return self.spark.read.parquet(snap)

    def _base(self, base_version: int | None) -> tuple[DataFrame, int]:
        """The transaction's base snapshot + its version (the OCC token).
        ``base_version`` pins an explicit base (e.g. a coordinated retry);
        default is the current pointer."""
        v = self.latest_version() if base_version is None else base_version
        if v is None:
            raise FileNotFoundError(f"{self.path}: no committed version")
        return self.read(version=v), v

    def create(self, df: DataFrame, op_id: str | None = None) -> int | None:
        if self.latest_version() is not None:
            raise FileExistsError(f"{self.path}: table already exists")
        return self._commit(df, "create", op_id, expected_prev=None)

    def append(
        self,
        df: DataFrame,
        op_id: str | None = None,
        base_version: int | None = None,
    ) -> int | None:
        base, v = self._base(base_version)
        return self._commit(base.unionByName(df), "append", op_id, v)

    def merge(
        self,
        updates: DataFrame,
        keys: list[str],
        op_id: str | None = None,
        base_version: int | None = None,
    ) -> int | None:
        """MERGE INTO (upsert): rows matching on ``keys`` are replaced by
        the update row, unmatched update rows are inserted.  Implemented
        as union + keep-latest per key (updates win) — the merge-on-read
        compaction shape, executed eagerly at commit time.  ``updates``
        must carry at most one row per key (dedupe upstream; with
        multiple update rows per key the survivor among them would be
        arrival-order dependent)."""
        base, v = self._base(base_version)
        up = updates.withColumn("_src", F.lit(1))
        w = W.partitionBy(*keys).orderBy(F.desc("_src"))
        merged = (
            base.withColumn("_src", F.lit(0))
            .unionByName(up)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_src")
        )
        return self._commit(merged, "merge", op_id, v)

    def delete_where(
        self,
        condition,
        op_id: str | None = None,
        base_version: int | None = None,
    ) -> int | None:
        base, v = self._base(base_version)
        return self._commit(base.where(~condition), "delete", op_id, v)
