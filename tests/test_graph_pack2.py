"""Structural tests for the round-13 graph additions
(modularity_brand_partition, harmonic_centrality_seeds)."""

from __future__ import annotations

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries

pytestmark = pytest.mark.round13


def test_modularity_identities(spark, sf_dir):
    rows = all_queries()["modularity_brand_partition"](
        spark, sf_dir
    ).collect()
    assert rows  # at least one brand has graph nodes
    m = sum(r.e_in for r in rows)
    # degree sums count each endpoint once: total = 2 * edges >= 2 * e_in
    assert sum(r.d_c for r in rows) % 2 == 0
    assert sum(r.d_c for r in rows) >= 2 * m
    # each contribution is bounded: q_c <= e_c/m <= 1
    for r in rows:
        assert r.q_contrib_micro <= 1000000
        assert r.e_in >= 0 and r.d_c >= r.e_in  # deg sum covers internal ends
    # global Q = sum of contributions must be in [-1, 1] (up to floor loss)
    q = sum(r.q_contrib_micro for r in rows)
    assert -1000000 - len(rows) <= q <= 1000000


def test_harmonic_centrality_rings_disjoint_and_ranked(spark, sf_dir):
    rows = all_queries()["harmonic_centrality_seeds"](spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.harmonic_sixths == 6 * r.n1 + 3 * r.n2 + 2 * r.n3
        # ring-1 of a top-degree hub is its degree: must be positive
        assert r.n1 > 0
