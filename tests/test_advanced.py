"""Targeted tests for the advanced relational pack (subqueries, pivot,
sketches).  Value correctness for the oracle-backed queries is covered by
the parametrized oracle suite (test_queries_oracle.py); here we check the
properties oracles can't express."""

from __future__ import annotations

from odni_apache_beam_consumer_spark.plans.registry import all_queries


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within 5% of the exact distinct count
    for every event type (the sketch's documented error envelope).  The
    query now emits the checked flag; this test re-measures the raw
    error independently so a loosened in-query bound can't hide drift."""
    from pyspark.sql import functions as F

    from odni_apache_beam_consumer_spark.catalog import load_table

    rows = all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert rows, "no event types"
    assert all(r["within_5pct"] for r in rows)
    raw = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
            F.count_distinct("user_id").alias("x"),
        )
        .collect()
    )
    for r in raw:
        assert r["x"] > 0
        err = abs(r["a"] - r["x"]) / r["x"]
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
        assert r["exact_customers"] > 0
        assert r["within_5pct"], f"{seg}: sketch outside 5% envelope"


def test_quantile_sketch_within_one_bin_of_exact(spark, sf_dir):
    """The histogram-sketch quantile (bin upper edge at the smallest bin
    whose cumulative count reaches ceil(q*n)) must EXACTLY equal the bin
    upper edge of the discrete order statistic x_{ceil(q*n)} — the two
    definitions are provably identical, so this is an equality check, not
    a tolerance band — for every flag including the merged __ALL__ row
    (which is derived from the stored sketches, so a broken merge would
    drift it).  NOTE: interpolating percentile() is deliberately NOT the
    reference here: near a data gap the discrete rank statistic can sit
    one bin above the interpolated value, which made a one-bin-width
    tolerance vs percentile() flaky across scale factors."""
    import math

    from odni_apache_beam_consumer_spark.catalog import load_table

    rows = {
        r.flag: r
        for r in all_queries()["quantile_sketch_merge"](spark, sf_dir).collect()
    }
    assert "__ALL__" in rows and len(rows) >= 4
    vals_by_flag = {
        f: sorted(g["l_extendedprice"])
        for f, g in load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .toPandas()
        .groupby("l_returnflag")
    }
    vals_by_flag["__ALL__"] = sorted(
        v for vs in vals_by_flag.values() for v in vs
    )
    for flag, r in rows.items():
        vals = vals_by_flag[flag]
        n = len(vals)
        assert r.n_rows == n
        for pct, col in ((25, "p25_upper"), (50, "p50_upper"),
                         (75, "p75_upper"), (90, "p90_upper")):
            rank = -(-pct * n // 100)  # ceil(pct*n/100), pure-int
            x = vals[rank - 1]
            expect = (math.floor(x / 500) + 1) * 500
            assert r[col] == expect, (
                f"{flag}.{col}: rank-stat={x} expect_upper={expect} "
                f"sketch_upper={r[col]}"
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
