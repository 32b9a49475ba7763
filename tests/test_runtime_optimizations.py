"""Runtime-optimizer demonstrations: the two mechanisms that keep big
shuffle joins alive at 100 TB, proven to engage on this engine's plans.

* Runtime bloom-filter injection (Catalyst InjectRuntimeFilter): a
  selective dimension filter is turned into a bloom filter evaluated
  inside the FACT scan, so rows that cannot join are dropped before the
  shuffle — the size thresholds that normally gate it (creation side
  small, application side huge) are exactly the 100 TB fact ⋈ filtered
  dim shape, scaled down here via conf so the tiny fixtures qualify.

* AQE skew-join splitting: a hot key that would pin one reducer is
  detected from runtime map statistics and its partition split across
  many tasks (each joining against a replicated build side).  This is
  the no-code-change complement to the engine's explicit
  operators/skew.py::salted_join (which handles the cases AQE can't:
  broadcast-ineligible aggregations, pre-4.x clusters).

Both tests pin the *mechanism flag in the executed plan* ("might_contain"
/ "isSkew=true"), not timings — timing at fixture scale is noise, the
plan shape is the contract.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table, spread


@pytest.fixture()
def scaled_down_thresholds(spark):
    """Shrink the runtime-filter/skew thresholds so fixture-sized inputs
    take the same paths 100 TB inputs take with default thresholds."""
    saved = {}

    def set_(k, v):
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)

    set_("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle joins
    set_("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    set_("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    set_("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    set_("spark.sql.adaptive.skewJoin.enabled", "true")
    set_("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # Thresholds are against COMPRESSED map-output sizes — scaled to the
    # ~10 MB hot partition the fixture produces below.
    set_("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    set_("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_reaches_fact_side(spark, sf_dir, scaled_down_thresholds):
    """lineitem ⋈ (orders WHERE selective): the optimizer must inject a
    bloom filter built from the filtered orders keys and apply it on the
    lineitem side BEFORE the shuffle (might_contain in the optimized
    plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy("o_orderpriority").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev")
    )
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized, optimized


def test_aqe_splits_skewed_join_partition(spark, sf_dir, scaled_down_thresholds):
    """A 90%-hot join key must show up in the executed plan as a skew-split
    sort-merge join (skew=true), proving runtime re-planning engages —
    the mechanism that saves unsalted hot keys at scale.

    Three preconditions the fixture deliberately establishes, because each
    is a real-world reason skew handling silently doesn't engage:
    * MULTIPLE mappers feed the join (catalog.spread): AQE splits a skewed
      reduce partition by map-output ranges — a single-mapper shuffle has
      nothing to range over and can never be split;
    * the hot partition's COMPRESSED bytes exceed the threshold: an
      md5 payload defeats the run-length compression a repeated literal
      would get (sizes in map statistics are post-compression);
    * no parent operator requires the join's hash distribution: a
      groupBy(join key) directly above would veto the split (splitting
      duplicates the hot key across tasks, breaking the reusable
      partitioning AQE would otherwise preserve)."""
    e = spread(load_table(spark, sf_dir, "events"))
    # ~90% of rows collapse onto key 0, amplified 500x with an
    # incompressible payload: one reducer partition dwarfs the others.
    left = e.select(
        F.when(F.col("event_id") % 10 < 9, 0)
        .otherwise(F.col("event_id"))
        .alias("k"),
        "event_id",
        F.explode(F.sequence(F.lit(1), F.lit(500))).alias("_rep"),
    ).select("k", F.md5(F.concat_ws("-", "event_id", "_rep")).alias("payload"))
    right = e.select(F.col("event_id").alias("k"), F.col("user_id"))
    j = left.join(right, "k").select("k", "payload", "user_id")
    j.collect()  # AQE decides from runtime stats — must execute this plan
    executed = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in executed, executed


def test_analyze_table_statistics_feed_the_optimizer(spark, sf_dir, tmp_path):
    """Catalog statistics surface: after ANALYZE TABLE ... COMPUTE
    STATISTICS, the optimizer's plan statistics reflect the real row
    count (not a size-based guess) — the inputs CBO join-reordering and
    broadcast decisions consume.  Covers the stats-collection workflow a
    100 TB warehouse runs after every large load."""
    import uuid

    from odni_apache_beam_consumer_spark.catalog import load_table

    tbl = f"orders_stats_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "orders").write.option(
        "path", str(tmp_path / "orders_tbl")
    ).saveAsTable(tbl)
    try:
        n = spark.table(tbl).count()
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS o_custkey")
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        }
        assert f"{n} rows" in desc.get("Statistics", ""), desc.get("Statistics")
        # Column-level stats exist for the analyzed column.
        col = spark.sql(f"DESCRIBE EXTENDED {tbl} o_custkey").collect()
        info = {r.info_name: r.info_value for r in col}
        assert info.get("distinct_count") not in (None, "NULL"), info
        # With CBO on, the optimized plan's statistics carry the exact
        # row count (without it only sizeInBytes propagates).
        prev = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table(tbl)
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
        assert "rowCount=" in stats and "sizeInBytes" in stats, stats
        m = re.search(r"rowCount=([0-9.E+]+)", stats)
        assert m and int(float(m.group(1))) == n, stats
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
