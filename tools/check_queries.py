"""Spot-check named queries against their DuckDB oracles.

Usage:
    python tools/check_queries.py name1 name2 ... [--sf /root/testdata/sf0.01]

Runs the identical comparison as tools/correctness_local.py (row count +
column set + order-insensitive values via tests/oracle_compare.compare)
for just the named queries — the fast inner loop while building a new
query, before the full sweep.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    from odni_apache_beam_consumer_spark.plans.registry import (
        all_oracles,
        all_queries,
    )
    from odni_apache_beam_consumer_spark.session import get_spark
    from tests.oracle_compare import compare, duckdb_con

    spark = get_spark(app_name="check_queries")
    con = duckdb_con(sf_dir)
    queries, oracles = all_queries(), all_oracles()
    fails = 0
    for name in args:
        if name not in queries:
            print(f"{name}: NOT REGISTERED")
            fails += 1
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                n = sdf.count()
                print(f"{name}: rows-only ({n} rows, {time.time()-t0:.1f}s)")
                continue
            problems = compare(sdf, con.sql(sql).df())
            if problems:
                print(f"{name}: FAIL {problems}")
                fails += 1
            else:
                print(f"{name}: OK ({time.time()-t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERR {ex!r}")
            fails += 1
    print(f"fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
