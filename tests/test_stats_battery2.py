"""Structural / plain-Python-agreement tests for the distribution-
comparison battery (plans/stats_tests2.py).

The DuckDB oracles pin engine-vs-engine equality; these pin the MATH
with a third, independent evaluator where cheap (pure-Python KS replay
from the collected per-user table) and with invariants elsewhere
(F >= 0, V in [0,1], CI brackets the point estimate).
"""

from __future__ import annotations

import math

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries

pytestmark = pytest.mark.round13


def _per_user_qy(spark, sf_dir):
    from pyspark.sql import functions as F

    from odni_apache_beam_consumer_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.expr(
                "CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)"
            ).alias("qy")
        )
        .collect()
    )


def test_ks_matches_plain_python(spark, sf_dir):
    """Replay the KS distance in pure Python from the same per-user
    collapse and require exact integer agreement on d_num and bit-level
    floor agreement on the normalized statistic."""
    rows = _per_user_qy(spark, sf_dir)
    a0 = sorted(r.qy // 1000 for r in rows if r.user_id % 2 == 0)
    a1 = sorted(r.qy // 1000 for r in rows if r.user_id % 2 == 1)
    n0, n1 = len(a0), len(a1)
    vals = sorted(set(a0) | set(a1))
    import bisect

    d_num = 0
    for v in vals:
        c0 = bisect.bisect_right(a0, v)
        c1 = bisect.bisect_right(a1, v)
        d_num = max(d_num, abs(c0 * n1 - c1 * n0))
    got = all_queries()["ks_two_sample_test"](spark, sf_dir).collect()[0]
    assert (got.n_arm0, got.n_arm1) == (n0, n1)
    assert got.d_num == d_num
    d = d_num / (n0 * n1)
    assert got.d_micro == math.floor(d * 1000000.0)


def test_brown_forsythe_invariants(spark, sf_dir):
    r = all_queries()["brown_forsythe_levene"](spark, sf_dir).collect()[0]
    assert r.k_arms == 4
    assert r.f_milli >= 0 and r.ssw_milli > 0
    # Arms are user_id % 4 on one metric: variances should be
    # homogeneous, so the test must not scream on the fixtures.
    assert r.f_milli < 5000


def test_cramers_v_bounds(spark, sf_dir):
    r = all_queries()["cramers_v_association"](spark, sf_dir).collect()[0]
    assert r.n_rows == 5 and r.n_cols == 5
    assert r.chi2_milli >= -1  # floor of a tiny positive can be 0; never < -1
    assert 0 <= r.v_micro <= 1000000
    # priority and segment are generated independently: V must be tiny
    assert r.v_micro < 100000


def test_delta_method_ci_brackets_ratio(spark, sf_dir):
    rows = all_queries()["delta_method_ratio_ci"](spark, sf_dir).collect()
    assert {r.arm for r in rows} == {0, 1}
    for r in rows:
        assert r.n_users > 0 and r.n_events >= r.n_users
        assert r.se_micro >= 0
        assert r.lo_milli <= r.ratio_milli <= r.hi_milli
    # the two arms measure the same population: intervals overlap
    lo = max(r.lo_milli for r in rows)
    hi = min(r.hi_milli for r in rows)
    assert lo <= hi
