"""Targeted tests for the round-6 session tail pack: auc_by_fold
(plans/evaluation.py), join_cardinality_estimate (plans/advanced.py),
and jaccard_prefix_filter_join (plans/curation.py) — invariants their
DuckDB oracles can't express."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.plans.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_auc_by_fold_partitions_and_bounds(spark, sf_dir):
    """Folds must partition the corpus (pos+neg counts sum to the table
    size), every AUC lies in [0, 1e6], and the fold column stays in
    0..4.  The pooled classifier_auc_rank numbers must equal the
    fold-wise totals (same histogram, different grouping)."""
    rows = all_queries()["auc_by_fold"](spark, sf_dir).collect()
    assert rows and all(0 <= r.fold <= 4 for r in rows)
    assert all(0 <= r.auc_ppm <= 10**6 for r in rows)
    pooled = all_queries()["classifier_auc_rank"](spark, sf_dir).collect()[0]
    assert sum(r.total_pos for r in rows) == pooled.total_pos
    assert sum(r.total_neg for r in rows) == pooled.total_neg


def test_auc_by_fold_window_is_fold_partitioned(spark, sf_dir):
    """The prefix-sum window must partition by fold — the property that
    makes k-fold evaluation embarrassingly parallel."""
    import re

    plan = _plan(all_queries()["auc_by_fold"](spark, sf_dir))
    m = re.search(r"windowspecdefinition\(([^)]*)\)", plan)
    assert m and "fold" in m.group(1), plan


def test_join_cardinality_estimate_is_one_sided_and_tight(spark, sf_dir):
    """Count-Min inner-product error is ONE-SIDED: the estimate can only
    overcount (collisions add mass).  With ~2k keys in 64 counters the
    collision term is real, so also assert the estimate stays within the
    CM guarantee band (eps = e/64 of the L1xL1 mass, across 3 rows)."""
    row = all_queries()["join_cardinality_estimate"](spark, sf_dir).collect()[0]
    assert row.cms_estimate >= row.exact_pairs > 0
    assert row.overestimate_ppm >= 0
    from odni_apache_beam_consumer_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    na = e.where(F.col("event_type") == "view").count()
    nb = e.where(F.col("event_type") == "purchase").count()
    # E[overcount per row] = (L1a*L1b - exact)/64; min of 3 rows should
    # land well under 3x the expectation — loose enough to be stable.
    budget = 3 * (na * nb - row.exact_pairs) // 64 + 1
    assert row.cms_estimate - row.exact_pairs <= budget


def test_prefix_filter_join_equals_unpruned_inverted_index(spark, sf_dir):
    """Losslessness, re-proven against the repo's OWN unpruned path: the
    prefix-filtered pair set must exactly equal dedup_ngram_jaccard's
    (threshold 0.5, same corpus, same shingles) — the df-capped variant
    is allowed to lose pairs, the prefix filter is not."""
    pf = {
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in all_queries()["jaccard_prefix_filter_join"](
            spark, sf_dir
        ).collect()
    }
    full = {
        (r.doc_a, r.doc_b, int(r.jaccard * 10**6))
        for r in all_queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert {(a, b) for a, b, _ in pf} == {(a, b) for a, b, _ in full}
    # jaccard values agree too (ppm floor on both paths)
    assert pf == {(a, b, j) for a, b, j in full}


@pytest.mark.slow
def test_prefix_filter_lossless_at_nondyadic_thresholds(spark, sf_dir):
    """Losslessness must hold for thresholds that are NOT exactly
    representable in binary (0.7, 0.8): float ceil(t*n) can round UP
    (0.8*5 -> 4.0000000000000002 -> ceil 5), shortening the prefix below
    the lossless bound.  The fix computes the bound in integer ppm; this
    pins it against the unpruned brute force for both thresholds."""
    from odni_apache_beam_consumer_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
        shingle_table,
    )
    from odni_apache_beam_consumer_spark.plans.llm import dedup_corpus

    corpus = dedup_corpus(spark, sf_dir)
    sh = shingle_table(corpus, 5).persist()
    try:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
        for t in (0.7, 0.8):
            t_ppm = round(t * 1_000_000)
            brute = {
                (r.a, r.b)
                for r in (
                    sh.select(F.col("doc_id").alias("a"), "shingle")
                    .join(
                        sh.select(F.col("doc_id").alias("b"), "shingle"),
                        "shingle",
                    )
                    .where(F.col("a") < F.col("b"))
                    .groupBy("a", "b")
                    .agg(F.count(F.lit(1)).alias("n_shared"))
                    .join(
                        sizes.select(
                            F.col("doc_id").alias("a"),
                            F.col("nsh").alias("na"),
                        ),
                        "a",
                    )
                    .join(
                        sizes.select(
                            F.col("doc_id").alias("b"),
                            F.col("nsh").alias("nb"),
                        ),
                        "b",
                    )
                    .where(
                        F.col("n_shared") * 1_000_000
                        >= F.lit(t_ppm)
                        * (F.col("na") + F.col("nb") - F.col("n_shared"))
                    )
                    .collect()
                )
            }
            got = {
                (r.doc_a, r.doc_b)
                for r in jaccard_prefix_filter_pairs(
                    corpus, threshold=t
                ).collect()
            }
            assert got == brute, (t, len(got), len(brute))
    finally:
        sh.unpersist()


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The filter must actually PRUNE: the candidate count (prefix-join
    pairs) must be far below the unfiltered shared-shingle pair count,
    else the 'optimization' is a no-op.  Re-derived via the operator's
    internals on the same corpus."""
    from odni_apache_beam_consumer_spark.operators.dedup import shingle_table
    from odni_apache_beam_consumer_spark.plans.llm import dedup_corpus

    sh = shingle_table(dedup_corpus(spark, sf_dir), 5).persist()
    try:
        all_pairs = (
            sh.select(F.col("doc_id").alias("a"), "shingle")
            .join(sh.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .count()
        )
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(
            F.asc("_df"), F.asc("shingle")
        )
        pref = (
            sh.join(dfreq, "shingle")
            .withColumn("_rk", F.row_number().over(w))
            .join(sizes, "doc_id")
            .where(
                F.col("_rk")
                <= F.col("nsh")
                - F.ceil(F.lit(0.5) * F.col("nsh")).cast("long")
                + 1
            )
            .select("doc_id", "shingle")
        )
        cand = (
            pref.select(F.col("doc_id").alias("a"), "shingle")
            .join(
                pref.select(F.col("doc_id").alias("b"), "shingle"), "shingle"
            )
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .count()
        )
        true_pairs = all_queries()["jaccard_prefix_filter_join"](
            spark, sf_dir
        ).count()
        assert true_pairs <= cand <= all_pairs
        # The 2x pruning claim only has junk to prune on a corpus with
        # spurious shared-shingle pairs; at sf0.001 the 103 total pairs
        # are almost all TRUE near-dups (94 candidates), which no
        # lossless filter may prune.  Assert the ratio where it's
        # meaningful (sf0.01+: thousands of pairs, mostly spurious).
        if all_pairs > 500:
            assert cand * 2 <= all_pairs, (cand, all_pairs)
    finally:
        sh.unpersist()
