"""Transactional batch table: commit atomicity, idempotent replay,
conflict detection, time travel, merge/delete semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.txtable import (
    CommitConflict,
    TransactionalTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, val STRING")


@pytest.fixture()
def table(spark, tmp_path):
    t = TransactionalTable(spark, str(tmp_path / "tx"))
    t.create(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    return t


def test_create_append_read_and_history(spark, table):
    table.append(_df(spark, [(4, "d")]))
    assert table.read().count() == 4
    assert [h["operation"] for h in table.history()] == ["create", "append"]


def test_merge_upserts_and_time_travel(spark, table):
    table.merge(_df(spark, [(2, "B!"), (9, "new")]), keys=["id"])
    now = {r.id: r.val for r in table.read().collect()}
    assert now == {1: "a", 2: "B!", 3: "c", 9: "new"}
    # time travel: version 0 still shows the pre-merge state
    v0 = {r.id: r.val for r in table.read(version=0).collect()}
    assert v0 == {1: "a", 2: "b", 3: "c"}


def test_delete_where(spark, table):
    table.delete_where(F.col("id") == 2)
    assert {r.id for r in table.read().collect()} == {1, 3}


def test_op_id_idempotent_replay(spark, table):
    v1 = table.append(_df(spark, [(4, "d")]), op_id="job-42")
    v2 = table.append(_df(spark, [(4, "d")]), op_id="job-42")  # replay
    assert v1 is not None and v2 is None
    assert table.read().count() == 4  # appended once, not twice


def test_concurrent_commit_conflict(spark, tmp_path):
    path = str(tmp_path / "tx2")
    a = TransactionalTable(spark, path)
    a.create(_df(spark, [(1, "a")]))
    b = TransactionalTable(spark, path)
    # Writer B pins its base at version 0, then A commits first...
    base_b = b.latest_version()
    a.append(_df(spark, [(2, "from-a")]))
    # ...so B's commit (derived from the stale base) must refuse to
    # clobber A's.
    with pytest.raises(CommitConflict):
        b.append(_df(spark, [(3, "from-b")]), base_version=base_b)
    # A's committed row survives; B retries on the new base and lands.
    assert {r.id for r in a.read().collect()} == {1, 2}
    b.append(_df(spark, [(3, "from-b")]))
    assert {r.id for r in a.read().collect()} == {1, 2, 3}


def test_crash_before_flip_is_invisible_then_repaired(spark, tmp_path):
    path = str(tmp_path / "tx3")
    t = TransactionalTable(spark, path)
    t.create(_df(spark, [(1, "a")]))
    # Simulate a crash AFTER the snapshot write but BEFORE the flip:
    # write the orphan snapshot directly.
    orphan = _df(spark, [(1, "a"), (2, "b")])
    orphan.write.mode("overwrite").parquet(os.path.join(path, "snapshot_v1"))
    # Readers still see version 0 — the orphan is invisible.
    assert t.latest_version() == 0
    assert t.read().count() == 1
    # Retrying the operation overwrites the orphan and commits cleanly.
    v = t.append(_df(spark, [(2, "b")]))
    assert v == 1
    assert t.read().count() == 2


def test_read_missing_version_raises(spark, table):
    with pytest.raises(FileNotFoundError):
        table.read(version=7)


def test_model_based_random_op_sequences(spark, tmp_path):
    """Model-based check: a random sequence of append/merge/delete ops
    applied to the table must match a plain-dict model at every step,
    and every historical version must stay readable afterwards."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        t = TransactionalTable(spark, str(tmp_path / f"mb{trial}"))
        model = {1: "v0", 2: "v0"}
        t.create(_df(spark, sorted(model.items())))
        next_id = 3
        for step in range(5):
            op = rng.choice(["append", "merge", "delete"])
            if op == "append":
                rows = [(next_id, f"s{step}"), (next_id + 1, f"s{step}")]
                next_id += 2
                t.append(_df(spark, rows))
                model.update(dict(rows))
            elif op == "merge":
                targets = rng.sample(sorted(model), k=min(2, len(model)))
                rows = [(i, f"m{step}") for i in targets] + [(next_id, f"m{step}")]
                next_id += 1
                t.merge(_df(spark, rows), keys=["id"])
                model.update(dict(rows))
            else:
                if model:
                    victim = rng.choice(sorted(model))
                    t.delete_where(F.col("id") == victim)
                    model.pop(victim)
            got = {r.id: r.val for r in t.read().collect()}
            assert got == model, (trial, step, op)
        # every version remains time-travel readable
        for v in t.versions():
            assert t.read(version=v).count() >= 0
