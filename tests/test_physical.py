"""Targeted tests for the physical-layout pack (plans/physical.py):
the zero-exchange bucketed-join plan shape and invariants the DuckDB
oracles can't express."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.physical import _bucketed_join_lazy
from odni_apache_beam_consumer_spark.plans.registry import all_queries


def test_bucketed_join_has_no_exchange_or_sort_below_the_join(spark, sf_dir):
    """The whole point of bucketing: the SortMergeJoin consumes the
    on-disk layout, so the executed plan's ONLY Exchange is the final
    month aggregation's and there is NO Sort operator anywhere (the
    bucket files are sortBy'd at write time).  The join section of the
    plan must also confirm both scans are bucketed."""
    out, cleanup = _bucketed_join_lazy(spark, sf_dir)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange") == 1, plan
        # the one Exchange must sit ABOVE the join (it's the agg's):
        # everything after the SortMergeJoin line in a root-down plan
        # print is join input, and must contain no Exchange.
        assert "Exchange" not in plan.split("SortMergeJoin", 1)[1], plan
        assert "Sort" not in plan.split("SortMergeJoin", 1)[1], plan
        assert "Bucketed: true" in plan, plan
    finally:
        cleanup()


def test_bucketed_join_restores_session_state(spark, sf_dir):
    """Running the public query must leave no temp tables behind and
    must restore the broadcast threshold it disabled."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    all_queries()["bucketed_colocated_join"](spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    left = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("bkt_")
    ]
    assert not left, left


def test_quantile_normalize_is_uniform_per_group(spark, sf_dir):
    """Within each language the normalized values must be exactly the
    integer grid {floor(i * 1e6 / (n-1)) : i in 0..n-1} — a perfect
    uniform transform, min 0 and max 1e6, no duplicates."""
    rows = all_queries()["quantile_normalize_features"](spark, sf_dir).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r.quantile_ppm)
    for lang, vals in by_lang.items():
        n = len(vals)
        assert sorted(vals) == [i * 10**6 // (n - 1) for i in range(n)], lang


def test_benford_audit_sums_and_reference(spark, sf_dir):
    """Digits cover 1..9 exactly, row counts sum to the filtered table,
    the Benford reference column matches an independent float
    computation, and reference shares themselves sum to ~1e6."""
    rows = all_queries()["benford_digit_audit"](spark, sf_dir).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    n_total = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1)
        .count()
    )
    assert sum(r.n_rows for r in rows) == n_total
    for r in rows:
        assert r.benford_ppm == math.floor(
            math.log10(1 + 1 / r.digit) * 10**6
        )
        assert r.deviation_ppm == r.share_ppm - r.benford_ppm
    assert abs(sum(r.benford_ppm for r in rows) - 10**6) <= 9


def test_cusum_peak_matches_brute_force(spark, sf_dir):
    """Re-derive the CUSUM series in plain Python from the collected
    daily revenue: prefix sums must match exactly, the flagged day must
    carry the max |cusum|, and the last prefix sum must equal
    n * (mean remainder) drift (sum of deviations from the FLOORED
    mean = total - n * floor(total / n), i.e. the division remainder)."""
    rows = sorted(
        all_queries()["cusum_changepoint"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    total = sum(r.rev_centi for r in rows)
    mean = total // len(rows)
    run, peak = 0, 0
    for r in rows:
        run += r.rev_centi - mean
        assert r.cusum_centi == run, r.day
        peak = max(peak, abs(run))
    assert run == total - len(rows) * mean
    flagged = [r for r in rows if r.is_changepoint]
    assert flagged and all(abs(r.cusum_centi) == peak for r in flagged)


def test_zipf_slope_flags_the_template_corpus(spark, sf_dir):
    """The audit working as designed on THIS corpus: the synthetic
    documents draw from a ~31-word template vocabulary, so the fit must
    come back far FLATTER than natural text's -1e6 ppm — negative
    (counts still fall with rank) but shallow.  A natural corpus would
    land near -1e6; asserting the shallow band here pins that the
    audit actually separates template spam from prose."""
    row = all_queries()["zipf_fit_audit"](spark, sf_dir).collect()[0]
    assert 10 <= row.n <= 100
    assert -600_000 <= row.zipf_slope_ppm < 0, row.zipf_slope_ppm
