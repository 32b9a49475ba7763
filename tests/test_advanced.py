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


def test_quantile_sketch_within_one_bin_of_exact(spark, sf_dir):
    """The histogram-sketch quantile estimate (bin upper edge) must
    bracket the exact percentile within one bin width (500) above it —
    the sketch's whole error envelope — for every flag including the
    merged __ALL__ row (which is derived from the stored sketches, so a
    broken merge would drift it)."""
    from pyspark.sql import functions as F

    from odni_apache_beam_consumer_spark.catalog import load_table

    rows = {
        r.flag: r
        for r in all_queries()["quantile_sketch_merge"](spark, sf_dir).collect()
    }
    assert "__ALL__" in rows and len(rows) >= 4
    li = load_table(spark, sf_dir, "lineitem")
    for flag, r in rows.items():
        scoped = (
            li if flag == "__ALL__" else li.where(F.col("l_returnflag") == flag)
        )
        exact = scoped.agg(
            F.percentile("l_extendedprice", 0.25).alias("q25"),
            F.percentile("l_extendedprice", 0.50).alias("q50"),
            F.percentile("l_extendedprice", 0.75).alias("q75"),
            F.percentile("l_extendedprice", 0.90).alias("q90"),
        ).collect()[0]
        for col, ex in (
            ("p25_upper", exact.q25),
            ("p50_upper", exact.q50),
            ("p75_upper", exact.q75),
            ("p90_upper", exact.q90),
        ):
            upper = r[col]
            assert ex <= upper <= ex + 500, (
                f"{flag}.{col}: exact={ex} sketch_upper={upper}"
            )
        # n_rows on the merged row must equal the sum of the members —
        # merge loses nothing.
    assert rows["__ALL__"].n_rows == sum(
        r.n_rows for f, r in rows.items() if f != "__ALL__"
    )


def test_countmin_never_underestimates_any_key(spark, sf_dir):
    """CMS error is one-sided by construction (counters only ever add):
    estimate >= exact for EVERY key, not just the audited top-10 — and
    with ~2k users hashed into 64 counters the audit must be
    non-vacuous (at least one actual collision overestimate at sf0.01;
    at sf0.001 collisions may or may not occur, so only the bound is
    asserted there)."""
    rows = all_queries()["countmin_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt, r
        assert r.overestimate == r.cms_estimate - r.exact_cnt
