"""Targeted tests for the advanced relational pack (subqueries, pivot,
sketches).  Value correctness for the oracle-backed queries is covered by
the parametrized oracle suite (test_queries_oracle.py); here we check the
properties oracles can't express."""

from __future__ import annotations

from odni_apache_beam_consumer_spark.plans.registry import all_queries


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within 5% of the exact distinct count
    for every event type (the sketch's documented error envelope)."""
    rows = all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert rows, "no event types"
    for r in rows:
        exact = r["exact_users"]
        assert exact > 0
        err = abs(r["approx_users"] - exact) / exact
        assert err <= 0.05, f"{r['event_type']}: approx err {err:.3f}"


def test_subqueries_decorrelate_to_joins(spark, sf_dir):
    """EXISTS / IN / correlated-scalar subqueries must decorrelate into
    hash joins — a per-row subquery re-execution would never scale."""
    for name in ("exists_subquery", "in_subquery", "scalar_subquery"):
        df = all_queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Join" in plan, f"{name}: no join in decorrelated plan"
        assert "CartesianProduct" not in plan, f"{name}: cartesian fallback"


def test_hll_sketch_store_merge_consistency(spark, sf_dir):
    """The merged (__ALL__) estimate must come out of sketch UNION within
    HLL error of the exact total, and every per-segment estimate within
    error of its exact count."""
    rows = {r["c_mktsegment"]: r for r in
            all_queries()["hll_sketch_store"](spark, sf_dir).collect()}
    assert "__ALL__" in rows and len(rows) >= 3
    for seg, r in rows.items():
        exact = r["exact_customers"]
        assert exact > 0
        err = abs(r["approx_customers"] - exact) / exact
        assert err <= 0.05, f"{seg}: sketch err {err:.3f}"
