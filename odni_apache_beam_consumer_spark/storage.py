"""Storage-layout operators: bucketed tables, co-located joins, compaction.

At 100 TB the dominant recurring cost of a pipeline is often not one
query's shuffle but the SAME shuffle re-paid by every downstream job that
joins or aggregates on the canonical key (doc_id, o_orderkey, user_id).
Bucketing amortizes it: pay one layout shuffle at write time, then every
bucket-key equi-join / groupBy reads co-located, pre-sorted buckets with
NO Exchange in the plan.  tests/test_storage.py asserts exactly that —
a bucketed self-join plans with zero ShuffleExchange operators.

Compaction is the other storage chore a real corpus needs: streaming
ingest and fine-grained dedup deltas leave thousands of small files;
``compact`` rewrites a directory into ~target-size range-partitioned
files (range, not hash, so min/max footer stats stay selective and
downstream range predicates still prune files).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as an external bucketed (and bucket-sorted) table.

    ``sortBy`` matters as much as ``bucketBy``: with sorted buckets a
    bucket-key join is a zero-shuffle sort-merge whose sort is also free.
    ``n_buckets`` must match between tables meant to co-join; pick it so
    one bucket of the LARGER table fits an executor core's memory at the
    target scale (100 TB / 32 buckets is too coarse — production would use
    1024+; tests use small counts for speed).
    """
    w = df.write.format(fmt).mode("overwrite").option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (must go through the
    catalog — ``spark.read.parquet(path)`` on the same files loses the
    bucketing metadata and re-shuffles on join)."""
    return spark.table(table)


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    range_cols: list[str],
    n_files: int,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite a (small-file-fragmented) parquet directory into ``n_files``
    range-partitioned files ordered by ``range_cols``.

    ``repartitionByRange`` samples the key distribution, so output files
    are balanced even under skew; ordering by the range key clusters values
    so each file's parquet min/max footer spans a narrow range — point and
    range predicates on ``range_cols`` then skip whole files at scan time.
    """
    df = spark.read.parquet(src_dir)
    w = (
        df.repartitionByRange(n_files, *range_cols)
        .sortWithinPartitions(*range_cols)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(dst_dir)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "event_date",
    fmt: str = "parquet",
) -> None:
    """Write a fact table partitioned by the date of ``ts_col`` —
    hive-style ``event_date=YYYY-MM-DD/`` directories.

    This is THE layout for time-series facts at 100 TB: any query with a
    date (or timestamp-range) predicate prunes to the matching
    directories before a single file is opened — the difference between
    scanning a day and scanning three years.  The partition column is
    derived, not dropped from the data: readers that filter on the raw
    timestamp still benefit via the derived-date predicate (see
    tests/test_storage.py::test_date_partition_pruning)."""
    from pyspark.sql import functions as F

    (
        df.withColumn(partition_col, F.date_format(ts_col, "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .format(fmt)
        .save(path)
    )


def zorder_value(col_a: str, col_b: str, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns, as a
    pure JVM column expression (no UDF): bit i of ``col_a`` lands at
    position 2i, bit i of ``col_b`` at 2i+1.  Columns must already be
    normalized to ``bits``-bit range (mask/scale upstream)."""
    from pyspark.sql import functions as F

    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc + (shiftleft(shiftright(cast({col_a} as bigint), i) & 1, 2 * i)) "
        f"+ (shiftleft(shiftright(cast({col_b} as bigint), i) & 1, 2 * i + 1)))"
    )


def write_zordered(
    df: DataFrame,
    dst_dir: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` clustered by the Z-order curve over two dimensions
    (the Delta/Iceberg ``OPTIMIZE ZORDER BY (a, b)`` analog, in plain
    Spark): range-partition + sort on the interleaved key, so each output
    file's parquet min/max footers span a NARROW range of BOTH columns.

    Why it matters at 100 TB: linear sort on ``a`` makes predicates on
    ``a`` skip files but leaves every file covering the full domain of
    ``b``; the space-filling curve gives sublinear file overlap for
    point/range predicates on EITHER dimension from one layout.
    tests/test_storage.py quantifies that skipping from the footers.

    Both dimensions are min/max-normalized to the full ``bits``-bit range
    before interleaving (one tiny agg pass for the 4 scalars — metadata,
    not data).  Without this, a narrow or offset domain (15 users, or
    day-numbers ~10600) varies only a few low/misaligned bits and the
    curve degenerates toward a linear sort on the wider dimension.
    """
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    mm = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).collect()[0]
    a_span = max(int(mm["a_hi"]) - int(mm["a_lo"]), 1)
    b_span = max(int(mm["b_hi"]) - int(mm["b_lo"]), 1)
    norm_a = f"((cast({col_a} as bigint) - {int(mm['a_lo'])}) * {top} div {a_span})"
    norm_b = f"((cast({col_b} as bigint) - {int(mm['b_lo'])}) * {top} div {b_span})"
    zcol = zorder_value(norm_a, norm_b, bits=bits).alias("__z")
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dst_dir)
    )


def delete_keys_partitioned(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
    partition_col: str = "event_date",
) -> dict:
    """Right-to-erasure (GDPR-style) delete from a hive-partitioned table:
    remove every row whose ``key_col`` is in ``keys``, rewriting ONLY the
    partitions that actually contain those keys.

    Two-phase, the shape that survives 100 TB:

    1. *Locate*: scan only (key, partition) columns — column pruning
       means this reads two thin columns, not the table — and collect the
       DISTINCT affected partition values (bounded by the number of
       partitions, a metadata-sized driver list).
    2. *Rewrite*: read ONLY the affected partitions (partition pruning on
       the collected literals), anti-filter the keys, and overwrite just
       those directories (dynamic partition overwrite — untouched
       partitions' files are never read or rewritten).

    A delete for k users therefore costs one thin-column scan plus a
    rewrite of the partitions they appear in, not a full-table rewrite.
    The key set is embedded as a plan literal (fine for request-sized
    deletes; for millions of keys, broadcast-anti-join a key table
    instead — same two phases).  Returns {"partitions_rewritten": [...],
    "rows_deleted": n}.  Idempotent: re-running with the same keys
    rewrites the (already clean) partitions to the same content."""
    from pyspark.sql import functions as F

    t = spark.read.parquet(path)
    affected = [
        r[0]
        for r in t.where(F.col(key_col).isin(keys))
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return {"partitions_rewritten": [], "rows_deleted": 0}
    sub = t.where(F.col(partition_col).isin(affected))
    n_before = sub.count()
    # NULL-safe keep: `~isin` evaluates to NULL (not true) for NULL keys,
    # which would silently delete every NULL-key row in a rewritten
    # partition — collateral loss beyond the requested keys.
    kept = sub.where(
        (~F.col(key_col).isin(keys)) | F.col(key_col).isNull()
    )
    n_after = kept.count()
    # Which affected partitions still have rows — computed BEFORE the
    # overwrite: kept's plan reads the files the write replaces, so any
    # post-write action on it hits FILE_NOT_EXIST.
    kept_parts = {r[0] for r in kept.select(partition_col).distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Dynamic overwrite only replaces partitions PRESENT in the written
    # data: a partition whose every row was deleted writes nothing and
    # would silently keep its stale files.  Drop those directories
    # explicitly (local FS here; on a cluster this is the same one-call
    # FileSystem.delete on the partition dir).
    import shutil

    for p in set(affected) - kept_parts:
        shutil.rmtree(os.path.join(path, f"{partition_col}={p}"), ignore_errors=True)
    return {
        "partitions_rewritten": sorted(str(p) for p in affected),
        "rows_deleted": n_before - n_after,
    }

# -- compaction EXECUTION (the OPTIMIZE half of small_file_compaction_plan) --

_COMPACT_MANIFEST = ".compact_manifest.json"
_COMPACT_TMP = ".compact_tmp"


def _nfd_bins(files: list[tuple[str, int]], target_bytes: int) -> list[list[str]]:
    """Next-fit-decreasing bin assignment — the EXACT rule
    plans/maintenance.small_file_compaction_plan computes as a DataFrame
    (bin_id = cumulative_bytes_before DIV target over the
    (bytes DESC, name) order), so the executed rewrite matches the
    published plan file for file."""
    ordered = sorted(files, key=lambda fs: (-fs[1], fs[0]))
    bins: dict[int, list[str]] = {}
    before = 0
    for name, size in ordered:
        bins.setdefault(before // target_bytes, []).append(name)
        before += size
    return [bins[b] for b in sorted(bins)]


def _complete_compaction(part_dir: str) -> bool:
    """Finish (or replay) a partition's compaction swap from its
    manifest — the crash-recovery half.  The manifest is the commit
    record: it lists the OLD fragment files and the NEW compacted files
    (already fully written under .compact_tmp/ before the manifest was
    published via tmp-write + atomic rename).  Completion moves news in
    FIRST, then deletes olds, then removes the manifest — so a crash at
    any point loses nothing: every datum is in an old file, a new file,
    or both, and a re-run converges by replaying this function.
    Returns True if a manifest was found and completed."""
    import json

    mpath = os.path.join(part_dir, _COMPACT_MANIFEST)
    if not os.path.exists(mpath):
        return False
    with open(mpath) as f:
        m = json.load(f)
    tmp = os.path.join(part_dir, _COMPACT_TMP)
    for new in m["new"]:
        src = os.path.join(tmp, new)
        dst = os.path.join(part_dir, new)
        if os.path.exists(src):
            os.replace(src, dst)  # atomic; replays overwrite identically
    for old in m["old"]:
        try:
            os.remove(os.path.join(part_dir, old))
        except FileNotFoundError:
            pass  # already removed by a previous (crashed) completion
    os.remove(mpath)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return True


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Execute OPTIMIZE on a hive-partitioned parquet table: inside each
    partition, group data files into target-sized bins (next-fit
    decreasing — the same assignment small_file_compaction_plan
    publishes) and rewrite every multi-file bin as ONE file.  Partitions
    whose bins are all single-file are never read, written, or touched —
    their files stay byte-identical, the delete_keys_partitioned
    discipline applied to maintenance.

    Crash-safe and idempotent per partition, the txtable commit shape on
    plain files: new files are fully written under a hidden
    ``.compact_tmp/`` dir (underscore/dot names are invisible to Spark
    readers), then a manifest naming old + new files is published
    atomically (tmp write + rename) — the commit point — then news move
    in, olds are deleted, and the manifest is removed.  A crash before
    the manifest leaves only invisible temp debris (re-run restarts the
    partition); a crash after it is completed by the next run via
    :func:`_complete_compaction`.  Like vacuum, must not run
    concurrently with readers of the SAME partition (the post-commit
    swap window can briefly double-expose a bin's rows).

    Scale shape: the file listing and bin plan are metadata-sized
    (driver-side, one entry per FILE); each bin rewrite reads only its
    own fragments and writes one file, so a run costs exactly the bytes
    in multi-file bins — never a full-table rewrite; partitions
    compact independently (a real service fans them out as tasks).
    Returns {"partitions_compacted": [...], "files_before": n,
    "files_after": n, "recovered": [...]}."""
    import json
    import shutil
    import uuid

    results = {
        "partitions_compacted": [],
        "files_before": 0,
        "files_after": 0,
        "recovered": [],
    }
    for d in sorted(os.listdir(path)):
        part_dir = os.path.join(path, d)
        if not (os.path.isdir(part_dir) and d.startswith(partition_col + "=")):
            continue
        if _complete_compaction(part_dir):
            results["recovered"].append(d)
        shutil.rmtree(os.path.join(part_dir, _COMPACT_TMP), ignore_errors=True)
        files = [
            (f, os.path.getsize(os.path.join(part_dir, f)))
            for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        results["files_before"] += len(files)
        bins = _nfd_bins(files, target_bytes)
        multi = [b for b in bins if len(b) > 1]
        if not multi:
            results["files_after"] += len(files)
            continue  # untouched: never read, never rewritten
        tmp = os.path.join(part_dir, _COMPACT_TMP)
        os.makedirs(tmp)
        old_names: list[str] = []
        new_names: list[str] = []
        for b in multi:
            out = os.path.join(tmp, f"stage-{uuid.uuid4().hex}")
            (
                spark.read.parquet(*[os.path.join(part_dir, f) for f in b])
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(out)
            )
            part_file = next(
                f for f in os.listdir(out) if f.endswith(".parquet")
            )
            new = f"compacted-{uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(out, part_file), os.path.join(tmp, new))
            shutil.rmtree(out, ignore_errors=True)
            old_names.extend(b)
            new_names.append(new)
        mtmp = os.path.join(part_dir, _COMPACT_MANIFEST + ".tmp")
        with open(mtmp, "w") as f:
            json.dump({"old": old_names, "new": new_names}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(mtmp, os.path.join(part_dir, _COMPACT_MANIFEST))  # commit
        _complete_compaction(part_dir)
        results["partitions_compacted"].append(d)
        results["files_after"] += len(files) - len(old_names) + len(new_names)
    return results
