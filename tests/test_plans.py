"""Physical-plan shape regression tests: the 100 TB story, enforced.

These assert the *executed plan* keeps the properties that make each
operator scale — pushed filters, broadcast dimension joins, cached
self-join subtrees, top-k window-group-limit pushdown, and the absence of
accidental cartesian products or sort-merge fallbacks.  A refactor that
silently loses one of these still passes the value oracles; this suite is
what catches it.
"""

from __future__ import annotations

import re

import pytest

from odni_apache_beam_consumer_spark.plans.registry import all_queries


def formatted_plan(spark, name: str, sf_dir: str) -> str:
    df = all_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize(
    "name",
    [
        "scan_filter_project",
        "inner_join",
        "multi_join_star",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "cosine_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "topk_per_group",
    ],
)
def test_no_cartesian_product(spark, sf_dir, name):
    assert "CartesianProduct" not in formatted_plan(spark, name, sf_dir)


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = formatted_plan(spark, "scan_filter_project", sf_dir)
    m = re.search(r"PushedFilters: \[([^\]]+)\]", plan)
    assert m and m.group(1).strip(), "filters must reach the parquet scan"
    m = re.search(r"ReadSchema: struct<([^>]+)>", plan)
    assert m, "no ReadSchema in plan"
    # 6-column projection of the 16-column lineitem table must be pruned.
    assert len(m.group(1).split(",")) <= 7, f"column pruning lost: {m.group(1)}"


@pytest.mark.parametrize("name", ["inner_join", "multi_join_star"])
def test_dimension_joins_broadcast(spark, sf_dir, name):
    plan = formatted_plan(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no fact-side shuffle at these sizes


@pytest.mark.parametrize("name", ["dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard"])
def test_dedup_self_join_inputs_cached(spark, sf_dir, name):
    """Both self-join sides must read ONE cached materialization of the
    signature pipeline, not recompute it per side."""
    plan = formatted_plan(spark, name, sf_dir)
    assert plan.count("InMemoryTableScan") >= 2, "self-join sides not cache-backed"


@pytest.mark.parametrize("name", ["cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "topk_per_group"])
def test_topk_uses_window_group_limit(spark, sf_dir, name):
    """row_number()<=k must plan as WindowGroupLimit (per-partition top-k
    pruning before the window sort), never a full global sort."""
    assert "WindowGroupLimit" in formatted_plan(spark, name, sf_dir)


@pytest.mark.parametrize("name", ["ann_lsh_topk", "ann_ivf_topk"])
def test_ann_candidates_are_equi_joins(spark, sf_dir, name):
    """The ANN scale path: candidate generation must be a hash equi-join
    on the bucket/cell key (the exact cosine_topk baseline is the only
    operator allowed a broadcast cross product)."""
    assert "BroadcastHashJoin" in formatted_plan(spark, name, sf_dir)
