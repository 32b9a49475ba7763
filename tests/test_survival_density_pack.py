"""Structural tests for the round-13 survival/density/paired-test
additions (nelson_aalen_hazard, mcnemar_paired_test,
dbscan_core_points)."""

from __future__ import annotations

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries

pytestmark = pytest.mark.round13


def test_nelson_aalen_monotone_and_consistent_with_km(spark, sf_dir):
    na = sorted(
        all_queries()["nelson_aalen_hazard"](spark, sf_dir).collect(),
        key=lambda r: r.lifetime_d,
    )
    assert na
    # cumulative hazard is non-decreasing and equals the prefix sum
    run = 0
    for r in na:
        assert r.h_nano == r.n_deaths * 1000000000 // r.n_risk
        run += r.h_nano
        assert r.cumhaz_nano == run
    # same death times as Kaplan-Meier (identical lifetime construction)
    km = all_queries()["kaplan_meier_survival"](spark, sf_dir).collect()
    assert {r.lifetime_d for r in na} == {r.lifetime_d for r in km}
    # risk sets shrink as lifetime grows
    risks = [r.n_risk for r in na]
    assert risks == sorted(risks, reverse=True)


def test_mcnemar_cells_partition(spark, sf_dir):
    r = all_queries()["mcnemar_paired_test"](spark, sf_dir).collect()[0]
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
    assert r.chi2_milli >= 0
    # continuity correction never increases the statistic
    assert r.chi2_cc_milli <= r.chi2_milli


def test_dbscan_partition_of_points(spark, sf_dir):
    from odni_apache_beam_consumer_spark.catalog import load_table

    rows = all_queries()["dbscan_core_points"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 8
    total = sum(r.n_points for r in rows)
    assert total == load_table(spark, sf_dir, "embeddings").count()
    for r in rows:
        assert r.n_core + r.n_border + r.n_noise == r.n_points
