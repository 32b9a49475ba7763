"""Targeted tests for the maintenance pack (plans/maintenance.py):
packing and clustering invariants the DuckDB oracles can't express.
Value correctness is covered by the parametrized oracle suite
(test_queries_oracle.py)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.maintenance import (
    _BIN_TARGET,
    _Z_FILES,
)
from odni_apache_beam_consumer_spark.plans.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_compaction_places_every_file_in_contiguous_bins(spark, sf_dir):
    """Conservation + shape: the per-bin file counts must sum to the
    day-file count, bin ids within each month must be contiguous from 0,
    and every bin except a month's LAST must be filled to >= the target
    (next-fit over a cumulative sum can only leave the tail bin
    short)."""
    rows = all_queries()["small_file_compaction_plan"](spark, sf_dir).collect()
    n_day_files = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.date_trunc("day", "l_shipdate").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r.n_files for r in rows) == n_day_files
    by_month = defaultdict(list)
    for r in rows:
        by_month[r.part_month].append(r)
    for month, bins in by_month.items():
        ids = sorted(b.bin_id for b in bins)
        assert ids == list(range(len(ids))), f"{month}: holes in bin ids {ids}"
        last = max(ids)
        for b in bins:
            assert b.fill_ppm == b.total_bytes * 10**6 // _BIN_TARGET
            if b.bin_id < last:
                # a non-tail bin's cumulative span covers a full target
                # stride, so it holds at least target bytes minus the
                # one boundary-crossing file that lands downstream —
                # with next-fit-decreasing that file is never larger
                # than the bin's own smallest member, so >= target / 2
                # is the safe structural floor.
                assert b.total_bytes >= _BIN_TARGET // 2, (month, b)


def test_compaction_window_is_partitioned_by_month(spark, sf_dir):
    """The placement window must partition by part_month (planning
    parallelizes across partitions) — a global single-partition window
    here would serialize the whole file listing at 100 TB."""
    import re

    plan = _plan(all_queries()["small_file_compaction_plan"](spark, sf_dir))
    assert "Window" in plan
    m = re.search(r"windowspecdefinition\(([^)]*)\)", plan)
    assert m and "part_month" in m.group(1), plan


def test_zorder_files_are_exact_grid_tiles(spark, sf_dir):
    """Sixteen consecutive Z-values (one file) decode to EXACTLY one
    4x4 tile of the quantized grid: both dimension spans <= 4, tile
    corners aligned to multiples of 4, span_area <= 16, and file_id
    must equal the Morton code of the tile itself.  This is the pruning
    guarantee: a predicate on either dimension eliminates 3/4 of the
    files."""
    rows = all_queries()["zorder_clustering_audit"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_rows for r in rows) == n_total
    assert all(0 <= r.file_id < _Z_FILES for r in rows)
    for r in rows:
        assert r.qa_max - r.qa_min <= 3 and r.qb_max - r.qb_min <= 3, r
        assert r.qa_min // 4 == r.qa_max // 4 and r.qb_min // 4 == r.qb_max // 4
        assert r.span_area <= 16
        assert 1 <= r.n_cells <= 16
        assert r.span_area >= r.n_cells  # bounding box covers the cells
        ta, tb = r.qa_min // 4, r.qb_min // 4
        # file_id = z DIV 16 = the top 4 interleaved bits, i.e. the
        # Morton code of the (ta, tb) tile coordinates themselves.
        expect = (
            ((ta // 2) % 2) * 8 + ((tb // 2) % 2) * 4 + (ta % 2) * 2 + (tb % 2)
        )
        assert r.file_id == expect, (r.file_id, expect)


def test_zorder_beats_single_column_sort_on_second_dim(spark, sf_dir):
    """The reason Z-order exists: under a single-column (qa) sort the
    second dimension's per-file span is the FULL axis (16 cells); under
    Z-order every file spans <= 4 cells of qb.  Quantified: the summed
    qb spans across Z-files must be at most half the single-sort
    layout's."""
    rows = all_queries()["zorder_clustering_audit"](spark, sf_dir).collect()
    z_qb_span = sum(r.qb_max - r.qb_min + 1 for r in rows)
    single_sort_span = 16 * len(rows)  # qa-sorted files span all of qb
    assert z_qb_span * 2 <= single_sort_span, (z_qb_span, single_sort_span)


def _fragmented_table(spark, base: str) -> str:
    """Hive-partitioned events table with one deliberately fragmented
    partition (8 tiny files) and one healthy partition (1 file)."""
    import os

    from pyspark.sql import functions as F

    path = os.path.join(base, "tbl")
    df = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("v"),
        F.when(F.col("id") < 400, "a").otherwise("b").alias("p"),
    )
    df.where("p = 'a'").repartition(8).write.partitionBy("p").parquet(path)
    df.where("p = 'b'").coalesce(1).write.mode("append").partitionBy("p").parquet(
        path
    )
    return path


def _data_files(part_dir: str) -> dict[str, bytes]:
    import os

    return {
        f: open(os.path.join(part_dir, f), "rb").read()
        for f in os.listdir(part_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    }


def test_compact_partitions_executes_the_plan(spark, tmp_path):
    """OPTIMIZE executed: table content byte-identical (same rows), the
    fragmented partition collapses to fewer files, and the healthy
    partition's files are untouched byte for byte."""
    import os

    from odni_apache_beam_consumer_spark.storage import compact_partitions

    path = _fragmented_table(spark, str(tmp_path))
    before = sorted(
        (r.k, r.v, r.p) for r in spark.read.parquet(path).collect()
    )
    b_files_before = _data_files(os.path.join(path, "p=b"))
    a_before = len(_data_files(os.path.join(path, "p=a")))

    res = compact_partitions(spark, path, "p", target_bytes=64 * 1024 * 1024)

    after = sorted((r.k, r.v, r.p) for r in spark.read.parquet(path).collect())
    assert after == before, "compaction changed table content"
    assert res["partitions_compacted"] == ["p=a"]
    a_after = len(_data_files(os.path.join(path, "p=a")))
    assert a_after < a_before and a_after == 1, (a_before, a_after)
    assert _data_files(os.path.join(path, "p=b")) == b_files_before, (
        "untouched partition was rewritten"
    )
    # idempotent: a second run is a structural no-op
    res2 = compact_partitions(spark, path, "p", target_bytes=64 * 1024 * 1024)
    assert res2["partitions_compacted"] == []
    assert sorted(
        (r.k, r.v, r.p) for r in spark.read.parquet(path).collect()
    ) == before


def test_compact_partitions_recovers_from_crash_after_commit(spark, tmp_path):
    """Crash INJECTED between manifest publish and swap: the new files
    sit in .compact_tmp, olds still live.  The next run must complete
    the swap from the manifest and converge to the same content."""
    import json
    import os
    import shutil

    from odni_apache_beam_consumer_spark.storage import (
        _COMPACT_MANIFEST,
        _COMPACT_TMP,
        compact_partitions,
    )

    path = _fragmented_table(spark, str(tmp_path))
    before = sorted(
        (r.k, r.v, r.p) for r in spark.read.parquet(path).collect()
    )
    part_dir = os.path.join(path, "p=a")
    olds = sorted(_data_files(part_dir))
    # Build the committed-but-unswapped state by hand: one compacted
    # file in tmp + a published manifest (exactly what a crash right
    # after the os.replace commit leaves behind).
    tmp = os.path.join(part_dir, _COMPACT_TMP)
    stage = os.path.join(tmp, "stage")
    (
        spark.read.parquet(*[os.path.join(part_dir, f) for f in olds])
        .coalesce(1)
        .write.parquet(stage)
    )
    part_file = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.replace(
        os.path.join(stage, part_file), os.path.join(tmp, "compacted-x.parquet")
    )
    shutil.rmtree(stage)
    with open(os.path.join(part_dir, _COMPACT_MANIFEST), "w") as f:
        json.dump({"old": olds, "new": ["compacted-x.parquet"]}, f)

    res = compact_partitions(spark, path, "p", target_bytes=64 * 1024 * 1024)
    assert res["recovered"] == ["p=a"]
    after = sorted((r.k, r.v, r.p) for r in spark.read.parquet(path).collect())
    assert after == before
    files = _data_files(part_dir)
    assert list(files) == ["compacted-x.parquet"]
    assert not os.path.exists(os.path.join(part_dir, _COMPACT_MANIFEST))
    # replaying recovery mid-way is also safe: manifest gone -> no-op
    res2 = compact_partitions(spark, path, "p", target_bytes=64 * 1024 * 1024)
    assert res2["recovered"] == [] and res2["partitions_compacted"] == []
