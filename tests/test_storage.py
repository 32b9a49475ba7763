"""Storage-layout tests: bucketed co-located joins and compaction.

The bucketed-join test is the plan-shape proof of the 100 TB amortization
story: after one bucketed write, a bucket-key join plans with ZERO
ShuffleExchange operators — the layout shuffle was paid once at write
time, not per downstream job.
"""

from __future__ import annotations

import glob
import re

import pytest
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark import storage
from odni_apache_beam_consumer_spark.catalog import load_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner away from broadcast so the test proves the
    bucket layout (not a broadcast) is what removes the shuffle."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    storage.write_bucketed(
        orders, "bt_orders", str(tmp_path / "orders"), ["o_orderkey"], n_buckets=8
    )
    storage.write_bucketed(
        lineitem, "bt_lineitem", str(tmp_path / "lineitem"), ["l_orderkey"], n_buckets=8
    )
    try:
        o = storage.read_bucketed(spark, "bt_orders")
        li = storage.read_bucketed(spark, "bt_lineitem")
        joined = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = _executed_plan(joined)
        # The whole point: the bucket layout replaces the runtime shuffle —
        # zero Exchange operators anywhere in the bucketed join plan.
        assert "SortMergeJoin" in plan
        assert not re.search(r"\bExchange\b", plan), plan
        # Same files read WITHOUT the bucket spec must shuffle both sides.
        o_raw = spark.read.parquet(str(tmp_path / "orders"))
        li_raw = spark.read.parquet(str(tmp_path / "lineitem"))
        raw_plan = _executed_plan(
            o_raw.join(li_raw, o_raw.o_orderkey == li_raw.l_orderkey)
        )
        assert re.search(r"\bExchange\b", raw_plan)
        # Correctness: bucketed join result equals a plain join.
        assert joined.count() == orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_compact_produces_target_files_and_preserves_rows(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    frag_dir = str(tmp_path / "fragmented")
    # Simulate streaming-ingest fragmentation: many tiny files.
    li.repartition(64).write.mode("overwrite").parquet(frag_dir)
    assert len(glob.glob(f"{frag_dir}/part-*.parquet")) == 64

    out_dir = str(tmp_path / "compacted")
    storage.compact(spark, frag_dir, out_dir, ["l_orderkey"], n_files=4)
    files = glob.glob(f"{out_dir}/part-*.parquet")
    assert len(files) == 4
    out = spark.read.parquet(out_dir)
    assert out.count() == li.count()
    # Range layout: files must cover disjoint l_orderkey ranges, so a point
    # predicate prunes to one file (footer min/max selectivity).
    ranges = []
    for f in sorted(files):
        stats = (
            spark.read.parquet(f)
            .agg(F.min("l_orderkey"), F.max("l_orderkey"))
            .collect()[0]
        )
        ranges.append((stats[0], stats[1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"overlapping file ranges: {ranges}"


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    """A date-partitioned layout must prune partitions at plan time: a
    one-day predicate reads exactly one partition directory, visible as a
    PartitionFilters entry and a partition count of 1 in the scan."""
    from odni_apache_beam_consumer_spark.storage import write_date_partitioned

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(events, path, "ts")

    df = spark.read.parquet(path).where(F.col("event_date") == "2024-01-05")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    n_days = events.select(F.date_format("ts", "yyyy-MM-dd")).distinct().count()
    # correctness: the pruned read returns exactly that day's rows
    want = events.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
    assert df.count() == want and want > 0
    assert n_days > 1  # pruning actually skipped something


def test_zorder_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    """The Z-order layout must make point predicates on EITHER dimension
    skippable via parquet footer min/max: for each of several probe
    values, the fraction of files whose [min, max] covers the probe must
    be well under 1.0 on BOTH columns (a linear sort on one column leaves
    ~every file covering the other column's full domain)."""
    import pyarrow.parquet as pq

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.datediff(F.col("ts"), F.lit("1995-01-01").cast("timestamp_ntz")).alias(
            "day"
        ),
    )
    dst = str(tmp_path / "zorder")
    storage.write_zordered(ev, dst, "user_id", "day", n_files=32)

    files = sorted(glob.glob(dst + "/*.parquet"))
    assert len(files) >= 8
    stats = []  # per file: (umin, umax, dmin, dmax)
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += md.num_rows
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        umin = min(md.row_group(g).column(cols["user_id"]).statistics.min for g in range(md.num_row_groups))
        umax = max(md.row_group(g).column(cols["user_id"]).statistics.max for g in range(md.num_row_groups))
        dmin = min(md.row_group(g).column(cols["day"]).statistics.min for g in range(md.num_row_groups))
        dmax = max(md.row_group(g).column(cols["day"]).statistics.max for g in range(md.num_row_groups))
        stats.append((umin, umax, dmin, dmax))
    assert total == ev.count()

    u_domain = (min(s[0] for s in stats), max(s[1] for s in stats))
    d_domain = (min(s[2] for s in stats), max(s[3] for s in stats))

    def overlap_frac(idx_min, idx_max, probe):
        hit = sum(1 for s in stats if s[idx_min] <= probe <= s[idx_max])
        return hit / len(stats)

    # Mean file-overlap across probes must be well under 1.0 on BOTH dims
    # (a linear sort gives ~1.0 on the non-sorted dim); individual probes
    # get slack because boxes straddling the median hit mid-domain probes.
    u_fracs, d_fracs = [], []
    for q in (0.25, 0.5, 0.75):
        u_probe = int(u_domain[0] + q * (u_domain[1] - u_domain[0]))
        d_probe = int(d_domain[0] + q * (d_domain[1] - d_domain[0]))
        u_fracs.append(overlap_frac(0, 1, u_probe))
        d_fracs.append(overlap_frac(2, 3, d_probe))
    assert max(u_fracs) <= 0.75 and max(d_fracs) <= 0.75, (u_fracs, d_fracs)
    assert sum(u_fracs) / 3 <= 0.5, (u_fracs, stats)
    assert sum(d_fracs) / 3 <= 0.5, (d_fracs, stats)


def test_delete_keys_rewrites_only_affected_partitions(spark, sf_dir, tmp_path):
    """GDPR-style delete: affected partitions rewritten, untouched
    partitions' files byte-identical (never read or rewritten), stale
    fully-deleted partitions removed, and the operation is idempotent."""
    import os

    from odni_apache_beam_consumer_spark import storage

    e = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    storage.write_date_partitioned(e, path, "ts")

    # Pick a victim user and find its partitions + one untouched partition.
    victim = e.select("user_id").first()[0]
    victim_dates = {
        r[0]
        for r in e.where(F.col("user_id") == victim)
        .select(F.date_format("ts", "yyyy-MM-dd"))
        .distinct()
        .collect()
    }
    all_dates = {
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("event_date=")
    }
    untouched = sorted(all_dates - victim_dates)
    assert untouched, "victim appears in every partition; pick a rarer key"
    marker_dir = os.path.join(path, f"event_date={untouched[0]}")
    before_files = {
        f: os.path.getmtime(os.path.join(marker_dir, f))
        for f in os.listdir(marker_dir)
    }
    n_total = spark.read.parquet(path).count()
    n_victim = e.where(F.col("user_id") == victim).count()

    res = storage.delete_keys_partitioned(spark, path, "user_id", [victim])
    assert res["rows_deleted"] == n_victim
    assert set(res["partitions_rewritten"]) == victim_dates

    after = spark.read.parquet(path)
    assert after.where(F.col("user_id") == victim).count() == 0
    assert after.count() == n_total - n_victim
    after_files = {
        f: os.path.getmtime(os.path.join(marker_dir, f))
        for f in os.listdir(marker_dir)
    }
    assert after_files == before_files  # untouched partition untouched

    # Idempotent: second run finds nothing to do.
    res2 = storage.delete_keys_partitioned(spark, path, "user_id", [victim])
    assert res2 == {"partitions_rewritten": [], "rows_deleted": 0}


def test_delete_keys_drops_fully_emptied_partition(spark, tmp_path):
    """A partition whose every row belongs to deleted keys must disappear
    (dynamic overwrite alone would leave its stale files)."""
    import os

    from odni_apache_beam_consumer_spark import storage

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-02 10:00:00"),
         (2, "2024-01-02 11:00:00")],
        "user_id BIGINT, ts_s STRING",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    path = str(tmp_path / "tiny")
    storage.write_date_partitioned(df, path, "ts")

    res = storage.delete_keys_partitioned(spark, path, "user_id", [1])
    assert res["rows_deleted"] == 2
    assert not os.path.exists(os.path.join(path, "event_date=2024-01-01"))
    left = spark.read.parquet(path).collect()
    assert [r.user_id for r in left] == [2]


def test_delete_keys_keeps_null_key_rows(spark, tmp_path):
    """NULL-key rows in a rewritten partition must survive a keyed delete:
    `~isin` alone evaluates to NULL for them, which where() treats as
    false — silent collateral deletion beyond the requested keys."""
    from odni_apache_beam_consumer_spark import storage

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (None, "2024-01-01 11:00:00"),
         (2, "2024-01-02 11:00:00")],
        "user_id BIGINT, ts_s STRING",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    path = str(tmp_path / "nullkeys")
    storage.write_date_partitioned(df, path, "ts")

    res = storage.delete_keys_partitioned(spark, path, "user_id", [1])
    assert res["rows_deleted"] == 1
    left = sorted(
        (r.user_id for r in spark.read.parquet(path).collect()),
        key=lambda x: (x is None, x),
    )
    assert left == [2, None]
