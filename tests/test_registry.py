"""Registry mechanics: driver-witness prioritization and contract shape.

The driver's per-round correctness file caps at ~50 entries and walks
``queries()`` in dict order, so ``all_queries()`` must order queries with
no entry in any committed CORRECTNESS_r*.json first — that ordering is
what converges hard-signal coverage across rounds.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _witnessed() -> set[str]:
    """Mirror of registry._driver_witnessed: only a PASSING entry (full
    hash pass, or a completed rows-only check for no-oracle queries)
    retires a query from the unwitnessed-first queue — a failed hash must
    re-surface for a fresh driver check."""
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, rec in json.load(f).items():
                if rec.get("hash_match") is True or (
                    rec.get("err") == "no_oracle"
                    and rec.get("spark_rows") is not None
                ):
                    seen.add(name)
    return seen


def test_unwitnessed_queries_come_first():
    from odni_apache_beam_consumer_spark.plans.registry import all_queries

    names = list(all_queries())
    seen = _witnessed()
    flags = [n in seen for n in names]
    # Once the first witnessed query appears, no unwitnessed may follow.
    if True in flags and False in flags:
        assert flags.index(True) > max(
            i for i, w in enumerate(flags) if not w
        ), "witnessed query ordered before an unwitnessed one"


def test_every_query_has_oracle_or_documented_exemption():
    """Rows-only queries must be a deliberate, short list — anything new
    without an oracle is a gap, not a default."""
    from odni_apache_beam_consumer_spark.plans.registry import all_oracles, all_queries

    no_oracle = set(all_queries()) - set(all_oracles())
    assert no_oracle == {"approx_distinct_users", "hll_sketch_store"}, (
        f"unexpected rows-only queries: {sorted(no_oracle)} — add a DuckDB "
        "oracle or extend this documented exemption list"
    )


def test_backlog_precedes_newer_unwitnessed():
    """Within the unwitnessed block, the round-2 backlog (queries that
    have waited longest for a driver entry) must come before queries
    registered later — otherwise new additions push the backlog past the
    driver's per-round cap forever."""
    from odni_apache_beam_consumer_spark.plans.registry import (
        _R2_BACKLOG,
        all_queries,
    )

    names = list(all_queries())
    seen = _witnessed()
    unwitnessed = [n for n in names if n not in seen]
    backlog_left = [n for n in unwitnessed if n in _R2_BACKLOG]
    if backlog_left:
        last_backlog = max(unwitnessed.index(n) for n in backlog_left)
        first_other = min(
            (unwitnessed.index(n) for n in unwitnessed if n not in _R2_BACKLOG),
            default=len(unwitnessed),
        )
        assert last_backlog < first_other
