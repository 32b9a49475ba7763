"""Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt.

Optimization-round evidence artifact (guide §1: measure first, §7.2 read
the plan): the judge checks plan-shape claims in OPTIMIZATION_r*.md against
these committed files.

Usage:
    python tools/explain_dump.py <tag> <suffix> <query> [<query> ...]
    # e.g. python tools/explain_dump.py r13 before triangle_count pagerank_rounds

Writes plans/<tag>/<query>_<suffix>.txt relative to the repo root.  Uses
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).  Note: for queries
that execute eager work at construction time (iterative loops, streaming
replays) the dumped plan is the FINAL returned DataFrame's plan — the
loop-internal shapes are pinned by tests/test_plans.py instead.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from odni_apache_beam_consumer_spark.plans.registry import all_queries
    from odni_apache_beam_consumer_spark.session import get_spark

    spark = get_spark(app_name="explain_dump")
    queries = all_queries()
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in queries:
            print(f"unknown query {name!r}", file=sys.stderr)
            return 2
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
