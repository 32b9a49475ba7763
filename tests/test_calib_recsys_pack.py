"""Structural / plain-Python-agreement tests for the round-13
calibration + recommender + time-series additions
(isotonic_calibration_pav, item_item_cosine_topk, ewma_daily_revenue,
kendall_tau_daily)."""

from __future__ import annotations

from fractions import Fraction

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries

pytestmark = pytest.mark.round13


def _pav_pool(bins):
    """Classic PAV pooling on [(n, pos)] in bin order, exact rationals.
    Returns the fitted rate per input bin."""
    stack = []  # [n, pos, n_bins_covered]
    for n, pos in bins:
        stack.append([n, pos, 1])
        while len(stack) >= 2 and (
            Fraction(stack[-2][1], stack[-2][0])
            > Fraction(stack[-1][1], stack[-1][0])
        ):
            b = stack.pop()
            stack[-1][0] += b[0]
            stack[-1][1] += b[1]
            stack[-1][2] += b[2]
    fitted = []
    for n, pos, cnt in stack:
        fitted.extend([Fraction(pos, n)] * cnt)
    return fitted


def test_isotonic_matches_plain_python_pav(spark, sf_dir):
    """The max-min SQL fit must equal floor(1e6 * PAV-pooled rate):
    floor commutes with min/max selection, and the max-min formula is
    the PAV solution (Robertson-Wright-Dykstra) — so agreement is
    exact, bin for bin."""
    rows = sorted(
        all_queries()["isotonic_calibration_pav"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    fitted = _pav_pool([(r.n, r.n_pos) for r in rows])
    for r, f in zip(rows, fitted):
        assert r.iso_fit_ppm == (f.numerator * 1000000) // f.denominator
    # monotone non-decreasing
    fits = [r.iso_fit_ppm for r in rows]
    assert fits == sorted(fits)


def test_item_item_topk_shape(spark, sf_dir):
    rows = all_queries()["item_item_cosine_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.item_i < r.item_j
        assert r.n_co_users >= 2
        assert r.n_co_users <= min(r.ni, r.nj)
        assert 0 <= r.cos_micro <= 1000000
    # sorted by similarity descending
    sims = [r.cos_micro for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ewma_tracks_series(spark, sf_dir):
    rows = all_queries()["ewma_daily_revenue"](spark, sf_dir).collect()
    assert len(rows) > 100
    by_day = sorted(rows, key=lambda r: r.day)
    # first day: EWMA equals the value itself (only l0 present)
    assert by_day[0].ewma_centikilo == by_day[0].revenue_kilo * 100
    # EWMA stays within the global min/max envelope of the series
    lo = min(r.revenue_kilo for r in rows) * 100
    hi = (max(r.revenue_kilo for r in rows) + 1) * 100
    for r in rows:
        assert lo <= r.ewma_centikilo <= hi


def test_kendall_consistent_with_counts(spark, sf_dir):
    r = all_queries()["kendall_tau_daily"](spark, sf_dir).collect()[0]
    assert r.n_pairs == r.n_concordant + r.n_discordant + r.ties
    assert -1000000 <= r.tau_micro <= 1000000
    import math

    want = math.floor(
        (r.n_concordant - r.n_discordant) / r.n_pairs * 1000000.0
    )
    assert r.tau_micro == want
