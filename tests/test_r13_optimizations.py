"""Round-13 optimization guards.

Each optimization that changed an operator's internals gets a focused
test pinning (a) the new plan property it bought and (b) result
equivalence with the pre-optimization form, so a regression in either
direction is loud.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.plans.registry import all_queries


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_copurchase_edges_joinless_build_matches_selfjoin(spark, sf_dir):
    """r13: the co-purchase edge build is ONE order-keyed collect_set
    exchange + map-side pair expansion — no self-join.  Result must
    equal the original distinct + self-join form exactly."""
    from odni_apache_beam_consumer_spark.plans.ml import copurchase_edges

    new = copurchase_edges(spark, sf_dir)
    plan = _fmt(new)
    assert "Join" not in plan, plan
    assert "Generate" in plan, plan  # the map-side pair explode
    # the original form, inline
    pl = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    old = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
    )
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def test_pagerank_one_step_partitioning_invariant(spark, sf_dir):
    """r13: pagerank_one_step's float update is an exact-integer
    (node, outdeg) aggregation + fixed-order fold, so the result is
    invariant to shuffle partitioning (the old per-edge double SUM
    flipped a ROUND(x, 6) boundary when the partitioning changed)."""
    q = all_queries()["pagerank_one_step"]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        r32 = sorted(map(tuple, q(spark, sf_dir).collect()))
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        r1 = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
    assert r32 == r1


def test_doremi_mw_trajectory_matches_reference_loop(spark, sf_dir):
    """r13: the multiplicative-weights iteration runs as ONE window
    chain over the pivoted domains frame.  Replay the trajectory in
    plain Python integers from the query's own loss columns and check
    the final weights — a changed DIV order, a lost GREATEST clamp, or
    a window mis-scoped to the wrong frame all diverge."""
    from odni_apache_beam_consumer_spark.plans.curation import (
        _DRO_ETA_DIV,
        _DRO_SHARDS,
    )

    rows = all_queries()["doremi_domain_reweight"](spark, sf_dir).collect()
    spark.catalog.clearCache()
    losses = {r["lang"]: [r[f"loss_s{t}"] for t in range(_DRO_SHARDS)] for r in rows}
    langs = sorted(losses)
    w = {lang: 1_000_000 for lang in langs}

    def idiv(a: int, b: int) -> int:  # Spark's BIGINT DIV (toward zero)
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for t in range(_DRO_SHARDS):
        lbar = idiv(sum(losses[g][t] for g in langs), len(langs))
        u = {
            g: w[g] * max(1000 + idiv(losses[g][t] - lbar, _DRO_ETA_DIV), 1)
            for g in langs
        }
        su = sum(u.values())
        w = {g: idiv(u[g] * 1_000_000, su) for g in langs}
    got = {r["lang"]: r["weight_ppm"] for r in rows}
    assert got == w, (got, w)


def test_doremi_mw_chain_is_single_exchange_after_pivot(spark, sf_dir):
    """The MW steps share ONE single-partition exchange (stacked Window
    operators), instead of per-step aggregate + broadcast crossJoin
    pairs."""
    from odni_apache_beam_consumer_spark.plans.curation import _DRO_SHARDS

    df = all_queries()["doremi_domain_reweight"](spark, sf_dir)
    plan = _fmt(df)
    spark.catalog.clearCache()
    # Above the localCheckpointed leaves: ONE broadcast join (the pivot
    # build), ONE lang-keyed pivot exchange, ONE single-partition
    # exchange shared by the whole stacked-Window MW chain.  The former
    # form carried a join + two aggregate/broadcast pairs PER STEP.
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    n_window = len(re.findall(r"\(\d+\) Window\b", plan))
    assert n_exchange == 2, plan
    assert n_window >= _DRO_SHARDS, plan
    assert "SinglePartition" in plan, plan
