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
