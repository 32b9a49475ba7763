"""Structural / plain-Python-agreement tests for the statistical
battery (plans/stats_tests.py).

The DuckDB oracles pin engine-vs-engine equality; these pin the MATH
with a third, independent evaluator where cheap (pure-Python Spearman
replay on the collected daily table) and with invariants elsewhere
(F >= 0, H >= 0, ACF(0-lag sanity), median slope bracketed by the
extreme slopes).
"""

from __future__ import annotations

import math

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries

pytestmark = pytest.mark.round13


def _midranks2(vals):
    """Doubled midranks (2x conventional midrank) of a list, matching
    the RANK()/COUNT() OVER SQL construction."""
    svals = sorted(vals)
    first = {}
    cnt = {}
    for i, v in enumerate(svals):
        first.setdefault(v, i + 1)
        cnt[v] = cnt.get(v, 0) + 1
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return num / den


def test_spearman_matches_plain_python(spark, sf_dir):
    """Replay Spearman rho for orders_vs_revenue in pure Python from
    the same daily aggregate and require bit-level floor agreement."""
    from pyspark.sql import functions as F

    from odni_apache_beam_consumer_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_format(
                F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd"
            ).alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("nord"),
            F.expr(
                "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("rev_c"),
        )
        .collect()
    )
    rx = _midranks2([r.nord for r in daily])
    ry = _midranks2([r.rev_c for r in daily])
    want = math.floor(_pearson(rx, ry) * 1000000.0)
    got = {
        r.pair: r
        for r in all_queries()["spearman_daily_corr"](spark, sf_dir).collect()
    }["orders_vs_revenue"]
    assert got.n_days == len(daily)
    # Pure-Python sums fold in a different order than the engines'
    # partial aggregation, but every intermediate here is an exact
    # integer and only the final rho is IEEE — same expression tree,
    # so the floor must agree exactly.
    assert got.rho_micro == want


def test_anova_and_kw_invariants(spark, sf_dir):
    f = all_queries()["anova_f_oneway"](spark, sf_dir).collect()[0]
    h = all_queries()["kruskal_wallis_h"](spark, sf_dir).collect()[0]
    assert f.k_arms == 4 and f.df_between == 3
    assert f.df_within == f.n_users - 4
    assert f.f_milli >= 0 and f.ssw_milli > 0
    assert h.n_users == f.n_users  # same per-user collapse feeds both
    assert h.n_0 + h.n_1 + h.n_2 + h.n_3 == h.n_users
    assert h.h_milli >= 0
    # Arms are user_id % 4 on a uniform metric: neither omnibus test
    # should scream (F well under ~5, H under ~20 on the fixtures).
    assert f.f_milli < 5000
    assert h.h_milli < 20000


def test_autocorr_shape_and_bounds(spark, sf_dir):
    rows = all_queries()["autocorr_daily_revenue"](spark, sf_dir).collect()
    assert [r.lag for r in sorted(rows, key=lambda r: r.lag)] == list(
        range(1, 8)
    )
    for r in rows:
        assert -1000000 <= r.acf_micro <= 1000000
        assert r.n_pairs > 0


def test_theil_sen_median_bracketed(spark, sf_dir):
    r = all_queries()["theil_sen_trend"](spark, sf_dir).collect()[0]
    assert r.n_pairs > 0
    assert r.n_pos + r.n_neg <= r.n_pairs
    # The median must sit between "all pairs rising" and "all falling".
    if r.n_pos == r.n_pairs:
        assert r.median_slope_micro > 0
    if r.n_neg == r.n_pairs:
        assert r.median_slope_micro < 0


def test_gini_bounds_and_population(spark, sf_dir):
    rows = all_queries()["gini_revenue_concentration"](spark, sf_dir).collect()
    assert len(rows) == 5  # one per mktsegment
    total = sum(r.n_customers for r in rows)
    # every customer (incl. zero-order ones) lands in exactly one segment
    from odni_apache_beam_consumer_spark.catalog import load_table

    assert total == load_table(spark, sf_dir, "customer").count()
    for r in rows:
        assert 0 <= r.gini_micro <= 1000000


def test_bh_fdr_selection_consistency(spark, sf_dir):
    rows = all_queries()["bh_fdr_token_selection"](spark, sf_dir).collect()
    m_total = rows[0].m_total
    k_total = rows[0].k_total
    assert all(r.m_total == m_total and r.k_total == k_total for r in rows)
    assert sum(r.m_hyp for r in rows) == m_total
    assert sum(r.n_selected for r in rows) == k_total
    assert 0 <= k_total <= m_total


def test_assortativity_and_clustering(spark, sf_dir):
    a = all_queries()["degree_assortativity"](spark, sf_dir).collect()[0]
    assert -1000000 <= a.assortativity_micro <= 1000000
    assert a.n_directed_edges % 2 == 0  # symmetric edge list

    rows = all_queries()["local_clustering_coefficient"](
        spark, sf_dir
    ).collect()
    # total triangle corners across buckets = 3 * global triangle count
    tri_total = sum(
        r.n_triangles
        for r in all_queries()["triangle_count"](spark, sf_dir).collect()
    )
    assert sum(r.n_triangle_corners for r in rows) == 3 * tri_total
    for r in rows:
        assert 0 <= r.avg_coef_ppm <= 1000000


def test_ridge_shrinkage_monotone(spark, sf_dir):
    rows = all_queries()["ridge_regression_path"](spark, sf_dir).collect()
    assert len(rows) == 9
    w = {(r.penalty, r.pos): r.w_nano for r in rows}
    # slope weights (pos 2, 3) shrink toward zero as lambda grows
    for pos in (2, 3):
        assert abs(w[("l_large", pos)]) <= abs(w[("l_small", pos)])
        assert abs(w[("l_small", pos)]) <= abs(w[("l0", pos)]) or (
            # tiny-lambda tie after nano-flooring is acceptable
            abs(abs(w[("l_small", pos)]) - abs(w[("l0", pos)])) <= 1
        )
    # lambda = 0 must reproduce ols_normal_equations exactly
    ols = {
        r.pos: r.w_nano
        for r in all_queries()["ols_normal_equations"](spark, sf_dir).collect()
    }
    for pos in (1, 2, 3):
        assert w[("l0", pos)] == ols[pos]


def test_bias_baseline_beats_mean(spark, sf_dir):
    r = all_queries()["bias_baseline_recommender"](spark, sf_dir).collect()[0]
    assert r.n_ratings > 0 and r.n_items > 0 and r.n_users > 0
    # the bias model must beat predicting the global mean in-sample
    assert r.rmse_micro < r.rmse_mu_micro


def test_poisson_bootstrap_brackets_point(spark, sf_dir):
    r = all_queries()["poisson_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r.n_replicates == 32
    assert r.boot_lo_milli <= r.boot_hi_milli
    # the interval should bracket the point estimate on these fixtures
    assert r.boot_lo_milli <= r.point_mean_milli <= r.boot_hi_milli
