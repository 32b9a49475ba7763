"""Round-14 optimization guards.

Same discipline as test_r13_optimizations: each optimization that changed
an operator's internals gets a focused test pinning (a) the new plan
property it bought and (b) bitwise result equivalence with the
pre-optimization form, so a regression in either direction is loud.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.plans.registry import all_queries


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _hof_assign_stats(spark, vecs_df, cids, cvecs, dim, scale):
    """The RETIRED r13 Catalyst higher-order-fold assignment + integer
    stats, reconstructed inline as the bitwise reference for the r14
    mapInArrow kernel: score = cdd - 2*<v,c> with the left-to-right dot
    fold, (score, cid) lexicographic argmin, SUM(FLOOR(v*scale))."""
    from odni_apache_beam_consumer_spark.plans.ml import dot

    cents = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in zip(cids, cvecs)],
        "cid long, cvec array<double>",
    )
    c = cents.select("cid", "cvec", dot("cvec", "cvec").alias("cdd"))
    carr = c.agg(F.collect_list(F.struct("cid", "cvec", "cdd")).alias("cs"))

    def _fold(acc, cand):
        sc = cand["cdd"] - 2 * dot(F.col("vec"), cand["cvec"])
        better = (
            acc["cid"].isNull()
            | (sc < acc["s"])
            | ((sc == acc["s"]) & (cand["cid"] < acc["cid"]))
        )
        return F.when(
            better, F.struct(sc.alias("s"), cand["cid"].alias("cid"))
        ).otherwise(acc)

    best = F.aggregate(
        F.col("cs"),
        F.struct(
            F.lit(None).cast("double").alias("s"),
            F.lit(None).cast("long").alias("cid"),
        ),
        _fold,
    )
    assigned = vecs_df.crossJoin(F.broadcast(carr)).select(
        best.getField("cid").alias("cid"), "vec"
    )
    return assigned.groupBy("cid").agg(
        *[
            F.sum(F.floor(F.element_at("vec", i + 1) * float(scale)))
            .cast("long")
            .alias(f"s{i}")
            for i in range(dim)
        ],
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )


def test_kmeans_kernel_bitwise_matches_hof_fold_adversarial(spark):
    """r14: the numpy mapInArrow kernel must reproduce the retired
    Catalyst HOF fold to the last ulp — same left-to-right IEEE dot
    accumulation, same (score, cid) tie-break, same FLOOR int64 stats.
    Adversarial inputs: EXACT score ties between centroids (tie-break
    order is observable), negative components (FLOOR truncates toward
    -inf), values at floor boundaries, and long mantissa-noise vectors
    where any reassociation of the dot fold would flip a low bit."""
    from odni_apache_beam_consumer_spark.operators.kmeans_kernel import (
        assign_stats_kernel,
    )

    dim = 8
    scale = 1_000_000
    # deterministic mantissa noise without random(): a fixed LCG
    def lcg(seed, n):
        x, out = seed, []
        for _ in range(n):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            out.append((x / float(1 << 63)) * 2.0 - 1.0)
        return out

    vecs = [
        [0.0, 5.0] + [0.0] * (dim - 2),          # exact tie c0 vs c1
        [1e-7] * dim,                             # floor boundary ~0
        [-1e-7] * dim,                            # FLOOR toward -inf
        [0.9999995] * dim,                        # x*1e6 rounding edge
        [-3.5, 2.25, -1.125, 0.0625] * (dim // 4),
    ] + [lcg(17 + i, dim) for i in range(40)]
    vdf = spark.createDataFrame(
        [([float(x) for x in v],) for v in vecs], "vec array<double>"
    )
    # c0/c1 symmetric => exact tie for vecs orthogonal to their axis
    cvecs = [
        [1.0, 0.0] + [0.0] * (dim - 2),
        [-1.0, 0.0] + [0.0] * (dim - 2),
        lcg(99, dim),
        lcg(7, dim),
    ]
    cids = [10, 11, 12, 13]

    kern = assign_stats_kernel(cids, cvecs, dim, scale)
    out_schema = (
        "cid long, " + ", ".join(f"s{i} long" for i in range(dim)) + ", cnt long"
    )
    got = (
        vdf.select("vec")
        .mapInArrow(kern, out_schema)
        .groupBy("cid")
        .agg(
            *[F.sum(f"s{i}").cast("long").alias(f"s{i}") for i in range(dim)],
            F.sum("cnt").cast("long").alias("cnt"),
        )
    )
    ref = _hof_assign_stats(spark, vdf, cids, cvecs, dim, scale)
    got_rows = sorted(map(tuple, got.collect()))
    ref_rows = sorted(map(tuple, ref.collect()))
    assert got_rows == ref_rows, (got_rows, ref_rows)
    # the exact-tie vector must land on the SMALLER cid's stats
    tie_cid = min(cids[0], cids[1])
    assert any(r[0] == tie_cid for r in got_rows)


def test_kmeans_lloyd_trajectory_matches_hof_reference_loop(spark, sf_dir):
    """r14: the full 3-round kmeans_lloyd trajectory through the Arrow
    kernel must equal the retired HOF-fold loop bit for bit on the real
    fixture — cluster churn between rounds included (a single vector
    flipping clusters in any round diverges the final integer stats)."""
    from odni_apache_beam_consumer_spark.plans.ml import (
        _KM_DIM,
        _KM_EVERY,
        _KM_ROUNDS,
        _KM_SCALE,
        kmeans_lloyd_rounds,
        with_vec,
    )
    from odni_apache_beam_consumer_spark.catalog import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    new = sorted(map(tuple, kmeans_lloyd_rounds(corpus).collect()))
    spark.catalog.clearCache()

    # retired reference loop (r13 form), inline
    v = (
        with_vec(corpus, "embedding")
        .select(F.col("vec_id").alias("vid"), "vec")
        .persist()
    )
    cids_cvecs = sorted(
        (int(r["cid"]), [float(x) for x in r["vec"]])
        for r in v.where(F.col("vid") % _KM_EVERY == 0)
        .select(F.col("vid").alias("cid"), "vec")
        .collect()
    )
    cids = [c for c, _ in cids_cvecs]
    cvecs = [cv for _, cv in cids_cvecs]
    stats = None
    for rnd in range(_KM_ROUNDS):
        stats = _hof_assign_stats(spark, v, cids, cvecs, _KM_DIM, _KM_SCALE)
        if rnd < _KM_ROUNDS - 1:
            rows = sorted((int(r["cid"]), r) for r in stats.collect())
            cids = [c for c, _ in rows]
            cvecs = [
                [
                    float(r[f"s{i}"]) / (float(r["cnt"]) * float(_KM_SCALE))
                    for i in range(_KM_DIM)
                ]
                for _, r in rows
            ]
    ref = sorted(
        (int(r["cid"]), int(r["cnt"]), i + 1, int(r[f"s{i}"]))
        for r in stats.collect()
        for i in range(_KM_DIM)
    )
    v.unpersist()
    # normalize both to (cid, n_members, pos, sum_micro)
    new_norm = sorted((c, n, p, s) for (c, p, s, n) in new)
    ref_norm = sorted((c, n, p, s) for (c, n, p, s) in ref)
    assert new_norm == ref_norm


def test_kmeans_lloyd_plan_uses_arrow_kernel(spark, sf_dir):
    """r14 plan pin: the assignment runs through a (Map)InArrow node —
    not BatchEvalPython, not the interpreted aggregate() HOF — and the
    RETURNED plan is checkpoint-rooted (k-row, metadata-sized): the
    final round's stats are eagerly materialized before the vector
    cache is released, so the driver's consuming pass reads k rows
    instead of re-running the kernel on the unpersisted corpus."""
    from odni_apache_beam_consumer_spark.operators.kmeans_kernel import (
        assign_stats_kernel,
    )

    # the kernel node itself, pinned on a direct construction
    vdf = spark.createDataFrame([([0.0, 1.0],)], "vec array<double>")
    kdf = vdf.mapInArrow(
        assign_stats_kernel([0], [[0.0, 0.0]], 2, 1_000_000),
        "cid long, s0 long, s1 long, cnt long",
    )
    kplan = _fmt(kdf)
    assert re.search(r"MapInArrow|ArrowEvalPython|PythonMapInArrow", kplan), kplan
    # the registered query's returned plan: checkpoint-rooted, no Python
    # eval, no HOF argmin anywhere above the materialized leaves
    df = all_queries()["kmeans_lloyd"](spark, sf_dir)
    plan = _fmt(df)
    spark.catalog.clearCache()
    assert "ExistingRDD" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "aggregate(" not in plan, plan


def test_bpe_apply_merges_is_map_side_only(spark):
    """r14 plan pin: replaying a learned merge table is ZERO-shuffle —
    one chained map-side projection, no Exchange / Window / Join (the
    exploded form paid a window+join pyramid per rule)."""
    from odni_apache_beam_consumer_spark.plans.retrieval import bpe_apply_merges

    words = spark.createDataFrame(
        [("aaab", 3), ("abab", 2), ("zzz", 1)], "w string, freq long"
    )
    df = bpe_apply_merges(words, [("a", "a"), ("a", "b"), ("aa", "ab")])
    plan = _fmt(df)
    for node in ("Exchange", "Window", "Join", "BatchEvalPython"):
        assert node not in plan, (node, plan)


def test_bpe_train_round_is_one_pair_count_exchange(spark):
    """r14 plan pin: one bpe_train round = ONE pair-count aggregation
    path (explode feeding a hash agg) with no per-word Window and no
    (w, pos) join — the per-rule resegmentation is a map-side fold over
    the localCheckpointed round-start arrays."""
    from odni_apache_beam_consumer_spark.plans.retrieval import bpe_train_rounds

    words = spark.createDataFrame(
        [("aaab", 3), ("abab", 2), ("banana", 5), ("zzz", 1)],
        "w string, freq long",
    )
    df = bpe_train_rounds(words, 1)
    plan = _fmt(df)
    assert "Window" not in plan, plan
    # the only joins are the whitelisted 1-row broadcast crosses
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    rows = sorted(map(tuple, df.collect()))
    # greedy reference: 'aa' wins round 1 (aaab:2*3 + nothing else beats it?
    # pairs: aa:3(aaab has two aa candidates -> corpus-weighted count 2*3=6),
    # ab: aaab 1*3 + abab 2*2 = 7, ba: abab 1*2 + banana 1*5 ... compute via
    # the pinned production path only — the assertion here is plan shape +
    # determinism, exact semantics are pinned by test_retrieval's
    # greedy-reference tests.
    assert len(rows) == 1 and rows[0][0] == 1


def test_item_item_pair_count_has_explicit_repartition(spark, sf_dir):
    """r14 plan pin: the 97%-unique (i, j) pair stream reaches its count
    through an explicit hashpartitioning(i, j) exchange placed BELOW the
    aggregate (repartition-then-count), so no 13M-entry map-side partial
    hash table is built."""
    df = all_queries()["item_item_cosine_topk"](spark, sf_dir)
    plan = _fmt(df)
    spark.catalog.clearCache()
    assert re.search(r"hashpartitioning\(i#\d+L?, j#\d+L?", plan), plan
    assert "REPARTITION_BY_COL" in plan, plan
