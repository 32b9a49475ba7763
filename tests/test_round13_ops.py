"""Structural / reference-agreement tests for the round-13 operators.

The DuckDB oracles pin engine-vs-engine equality; these pin the MATH —
most importantly a PLAIN-PYTHON replay of the full ALS alternation
(r12 verdict task 4's "reference agreement" requirement): a third,
independent evaluator of the same quantized trajectory.  Python floats
are IEEE doubles and ``math.floor`` is exact, so replicating the shared
SQL expression trees operation-for-operation must reproduce every
nano-quantized factor bit-for-bit.
"""

from __future__ import annotations

import math

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries

pytestmark = pytest.mark.round13


def _plain_als(ratings, n_alt: int):
    """Replay the als_alternating trajectory in pure Python.

    ratings: list of (usr, item, rt) with rt already a Python float
    (IEEE double, matching the engines' CAST to DOUBLE).  Returns
    {usr: (n_ratings, u1_nano, u2_nano)} after n_alt full alternations.
    Expression trees mirror _ALS_ALT_MOM / _ALS_V1 / _ALS_V2 exactly
    (explicit parenthesization; Python * and / are correctly rounded).
    """
    fixed = {u: (1.0, (u % 7) / 7.0) for u, _, _ in ratings}

    def half_step(key_is_item: bool):
        mom: dict = {}
        for u, it, rt in ratings:
            key, fkey = (it, u) if key_is_item else (u, it)
            f1, f2 = fixed[fkey]
            m = mom.setdefault(key, [0, 0, 0, 0, 0, 0])
            m[0] += math.floor((f1 * f1) * 10000.0)
            m[1] += math.floor((f1 * f2) * 10000.0)
            m[2] += math.floor((f2 * f2) * 10000.0)
            m[3] += math.floor((f1 * rt) * 10000.0)
            m[4] += math.floor((f2 * rt) * 10000.0)
            m[5] += 1
        out = {}
        for key, (a11, a12, a22, b1, b2, n) in mom.items():
            a11, a22 = a11 + 1000, a22 + 1000
            det = float(a11) * float(a22) - float(a12) * float(a12)
            v1 = (float(b1) * float(a22) - float(b2) * float(a12)) / det
            v2 = (float(a11) * float(b2) - float(a12) * float(b1)) / det
            out[key] = (
                n,
                math.floor(v1 * 1000000000.0),
                math.floor(v2 * 1000000000.0),
            )
        return out

    last = None
    for i in range(2 * n_alt):
        last = half_step(key_is_item=(i % 2 == 0))
        fixed = {
            k: (p1 / 1000000000.0, p2 / 1000000000.0)
            for k, (_, p1, p2) in last.items()
        }
    return last


def test_als_alternating_matches_plain_python(spark, sf_dir):
    from odni_apache_beam_consumer_spark.catalog import load_table
    from odni_apache_beam_consumer_spark.plans.ml import _ALS_ALT_ROUNDS

    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS k", "l_partkey AS item", "CAST(l_quantity AS DOUBLE) AS rt"
    )
    od = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS k", "o_custkey AS usr"
    )
    ratings = [
        (r.usr, r.item, r.rt) for r in li.join(od, "k").collect()
    ]
    assert ratings
    expected = _plain_als(ratings, _ALS_ALT_ROUNDS)

    rows = all_queries()["als_alternating"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, p1, p2 = expected[r.user_id]
        assert (r.n_ratings, r.u1_nano, r.u2_nano) == (n, p1, p2), r.user_id


def test_als_alternating_moves_factors_from_init(spark, sf_dir):
    # After two full alternations the user factors must differ from the
    # literal init for at least some users (the loop actually trains),
    # yet stay finite/bounded (the ridge keeps solves well-conditioned).
    rows = all_queries()["als_alternating"](spark, sf_dir).collect()
    assert rows
    init_nano = {
        u: math.floor(((u % 7) / 7.0) * 1000000000.0)
        for u in (r.user_id for r in rows)
    }
    moved = sum(1 for r in rows if r.u2_nano != init_nano[r.user_id])
    assert moved > len(rows) // 2
    for r in rows:
        assert abs(r.u1_nano) < 10**14 and abs(r.u2_nano) < 10**14


def test_decision_tree_splits_are_consistent(spark, sf_dir):
    # Gains nonnegative (splitting never increases SSE), children
    # partition the root exactly, and each node's split is on a real
    # bin with a nonempty right side.
    rows = {r.node: r for r in all_queries()[
        "decision_tree_histogram_train"
    ](spark, sf_dir).collect()}
    assert 0 in rows
    root = rows[0]
    assert root.gain_q >= 0
    assert 0 < root.n_left < root.n_node
    if 1 in rows and 2 in rows:
        assert rows[1].n_node + rows[2].n_node == root.n_node
        assert rows[1].n_node == root.n_left
        for c in (1, 2):
            assert rows[c].gain_q >= 0
            assert 0 < rows[c].n_left < rows[c].n_node
    for r in rows.values():
        assert r.split_feature in (1, 2)


def test_decision_tree_root_split_matches_brute_force(spark, sf_dir):
    # Plain-Python brute force over the collected (b1, b2, yq) rows:
    # the root (feature, threshold, gain) must match the distributed
    # histogram computation exactly (integer stats, same argmax rule).
    import math

    from odni_apache_beam_consumer_spark.catalog import load_table
    from odni_apache_beam_consumer_spark.plans.ml import (
        _TREE_B1,
        _TREE_B2,
        _TREE_Y,
    )

    data = [
        (r.b1, r.b2, r.yq)
        for r in load_table(spark, sf_dir, "lineitem")
        .selectExpr(f"{_TREE_B1} AS b1", f"{_TREE_B2} AS b2", f"{_TREE_Y} AS yq")
        .collect()
    ]
    best = None
    for f_idx in (1, 2):
        hist: dict = {}
        for b1, b2, yq in data:
            b = b1 if f_idx == 1 else b2
            m = hist.setdefault(b, [0, 0])
            m[0] += 1
            m[1] += yq
        nt = sum(m[0] for m in hist.values())
        st = sum(m[1] for m in hist.values())
        nl = sl = 0
        for b in sorted(hist):
            nl += hist[b][0]
            sl += hist[b][1]
            if nl >= nt:
                continue
            gain = (
                (float(sl) * float(sl)) / float(nl)
                + (float(st - sl) * float(st - sl)) / float(nt - nl)
                - (float(st) * float(st)) / float(nt)
            )
            key = (-math.floor(gain), f_idx, b)
            if best is None or key < best[0]:
                best = (key, f_idx, b, nl, nt, math.floor(gain))
    root = next(
        r
        for r in all_queries()["decision_tree_histogram_train"](
            spark, sf_dir
        ).collect()
        if r.node == 0
    )
    _, f_idx, b, nl, nt, gain_q = best
    assert (
        root.split_feature,
        root.split_bin,
        root.n_left,
        root.n_node,
        root.gain_q,
    ) == (f_idx, b, nl, nt, gain_q)


def test_gbdt_boosting_consumes_signal(spark, sf_dir):
    rows = sorted(
        all_queries()["gbdt_stump_boost"](spark, sf_dir).collect(),
        key=lambda r: r.round_no,
    )
    assert [r.round_no for r in rows] == [1, 2, 3]
    n = rows[0].n_node
    for r in rows:
        assert r.n_node == n  # every round fits the full corpus
        assert r.gain_q >= 0
        assert 0 < r.n_left < r.n_node
        assert r.split_feature in (1, 2)
    # Squared-loss boosting: later stumps fit residuals of earlier
    # ones, so the best-available gain cannot increase.
    assert rows[0].gain_q >= rows[1].gain_q >= rows[2].gain_q


def test_naive_bayes_confusion_is_complete_and_better_than_chance(
    spark, sf_dir
):
    from odni_apache_beam_consumer_spark.catalog import load_table

    rows = all_queries()["naive_bayes_train"](spark, sf_dir).collect()
    langs = {
        r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("lang")
        .distinct()
        .collect()
    }
    total = sum(r.n_docs for r in rows)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs  # every document classified exactly once
    for r in rows:
        assert r.lang_true in langs and r.lang_pred in langs
        assert r.n_docs > 0
    correct = sum(r.n_docs for r in rows if r.lang_true == r.lang_pred)
    assert correct / total > 1.0 / len(langs)  # beats the chance rate


def test_gbdt_logit_boost_newton_steps_are_sane(spark, sf_dir):
    rows = sorted(
        all_queries()["gbdt_logit_boost"](spark, sf_dir).collect(),
        key=lambda r: r.round_no,
    )
    assert [r.round_no for r in rows] == [1, 2, 3]
    n = rows[0].n_node
    for r in rows:
        assert r.n_node == n
        assert r.gain_q >= 0
        assert 0 < r.n_left < r.n_node
        # Newton leaf logits stay bounded: |w| = |G|/H <= 1/h_min; with
        # Elliott h >= ~0.2 near s=0 the first rounds sit well inside
        # +-5 natural units.
        assert abs(r.w_left_nano) < 5 * 10**9
        assert abs(r.w_right_nano) < 5 * 10**9
    assert rows[0].gain_q >= rows[1].gain_q >= rows[2].gain_q


def test_ab_battery_is_internally_consistent(spark, sf_dir):
    # The three arm tests share the per-user table, so their counts
    # must agree; the parity assignment is balanced by construction,
    # so SRM must not fire; and on a null effect (parity arms over the
    # same generator) both test statistics should be modest.
    welch = all_queries()["welch_t_test"](spark, sf_dir).collect()[0]
    mwu = all_queries()["mann_whitney_u"](spark, sf_dir).collect()[0]
    srm = all_queries()["sample_ratio_mismatch"](spark, sf_dir).collect()[0]
    assert (welch.n0, welch.n1) == (srm.n0, srm.n1)
    assert (mwu.n_a, mwu.n_b) == (srm.n0, srm.n1)
    assert srm.srm_detected is False  # parity split is balanced
    assert srm.chi2_milli >= 0
    # Null effect: |t| and |z| under ~5 (generous; fixture is seeded).
    assert abs(welch.t_milli) < 5000
    assert abs(mwu.z_milli) < 5000
    assert welch.df_milli > 0
    # U2 is bounded by 2 * n_a * n_b and the tie term is nonnegative.
    assert 0 <= mwu.u2_a <= 2 * mwu.n_a * mwu.n_b
    assert mwu.ties >= 0


def test_permutation_test_null_is_not_significant(spark, sf_dir):
    # Parity arms over the same generator are a true null: the observed
    # difference should not be an outlier among the permutation nulls.
    row = all_queries()["permutation_test_mean_diff"](
        spark, sf_dir
    ).collect()[0]
    assert row.n_perm == 32
    assert 0 <= row.n_extreme <= row.n_perm
    assert 0 < row.p_ppm <= 1_000_000
    assert row.p_ppm > 30_000  # not spuriously significant on a null


def test_distinct_ngram_pure_groups_match_audit_form(spark, sf_dir):
    # The pure HLL path must produce exactly the audit form's group set
    # and total counts — only the distinct machinery differs.
    pure = {
        (r.lang, r.n): (r.n_total, r.estimate_in_bounds)
        for r in all_queries()["distinct_ngram_approx_pure"](
            spark, sf_dir
        ).collect()
    }
    audit = {
        (r.lang, r.n): r.n_total
        for r in all_queries()["distinct_ngram_diversity_approx"](
            spark, sf_dir
        ).collect()
    }
    assert set(pure) == set(audit)
    for key, (n_total, in_bounds) in pure.items():
        assert n_total == audit[key]
        assert in_bounds is True


def test_logrank_null_consistency_with_km(spark, sf_dir):
    # Arms are parity halves of the same generator (true null): O1 and
    # E1 should be close, z modest, and the pooled death-time count
    # must match kaplan_meier_survival's death-time table.
    lr = all_queries()["logrank_test"](spark, sf_dir).collect()[0]
    km = all_queries()["kaplan_meier_survival"](spark, sf_dir).collect()
    assert lr.n_death_times == len(km)
    assert lr.v_nano > 0
    assert abs(lr.z_milli) < 4000  # null effect
    assert 0 <= lr.o1 <= sum(r.n_deaths for r in km)


def test_did_and_tpz_null_effects_are_modest(spark, sf_dir):
    did = all_queries()["did_estimator"](spark, sf_dir).collect()[0]
    tpz = all_queries()["two_proportion_ztest"](spark, sf_dir).collect()[0]
    assert did.n0 > 1 and did.n1 > 1
    assert abs(did.t_milli) < 5000  # parity arms: true null
    # DiD effect equals the difference of the per-arm deltas (milli
    # rounding can shift the floor by at most 1).
    assert abs(did.did_milli - (did.delta1_milli - did.delta0_milli)) <= 1
    assert tpz.c0 <= tpz.n0 and tpz.c1 <= tpz.n1
    assert 0 < tpz.rate0_ppm < 1_000_000  # non-degenerate conversion
    assert 0 < tpz.rate1_ppm < 1_000_000
    assert abs(tpz.z_milli) < 5000


def test_adamic_adar_refines_common_neighbors(spark, sf_dir):
    aa = all_queries()["link_prediction_adamic_adar"](
        spark, sf_dir
    ).collect()
    assert aa
    for r in aa:
        assert r.a < r.b
        assert r.common_neighbors >= 1
        # Each wedge contributes 1/ln(d) with d in [2, 64]:
        # micro-weight per wedge is in [FLOOR(1e6/ln 64), FLOOR(1e6/ln 2)].
        assert 240_000 * r.common_neighbors <= r.aa_micro
        assert r.aa_micro <= 1_442_695 * r.common_neighbors


def test_bagged_stumps_one_per_replica(spark, sf_dir):
    rows = all_queries()["bagged_stump_ensemble"](spark, sf_dir).collect()
    assert sorted(r.replica for r in rows) == list(range(1, 9))
    sizes = [r.n_node for r in rows]
    for r in rows:
        assert r.gain_q >= 0
        assert 0 < r.n_left < r.n_node
        assert r.split_feature in (1, 2)
    # Half-sampling: every replica sees roughly half the corpus
    # (binomial concentration at fixture sizes).
    total = max(sizes)
    assert min(sizes) > total * 0.7  # replicas within ~norm of each other


def test_hits_authority_differs_from_popularity(spark, sf_dir):
    rows = all_queries()["hits_one_step"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        # authority = sum of buyers' basket sizes >= n_buyers (each
        # buyer contributes at least their 1-item basket).
        assert r.authority >= r.n_buyers >= 1
    auths = [r.authority for r in rows]
    assert auths == sorted(auths, reverse=True)


def test_poststratified_effect_is_weighted_sum(spark, sf_dir):
    rows = all_queries()["poststratified_effect"](spark, sf_dir).collect()
    assert rows
    total = rows[0].effect_total_nano
    assert all(r.effect_total_nano == total for r in rows)
    assert total == sum(r.term_nano for r in rows)
    for r in rows:
        assert 0 <= r.stratum <= 9
        assert r.n0 > 0 and r.n1 > 0
