"""Oracle-differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate (repo:__spark_entry__.py) at
sf0.001 by default (env SPARK_GRAFT_TEST_SF_DIR to raise).
"""

from __future__ import annotations

import pytest

from tests.oracle_compare import duckdb_con, run_one


def _names():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from odni_apache_beam_consumer_spark.plans.registry import all_queries

    return sorted(all_queries())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, con, sf_dir, name):
    problems = run_one(spark, con, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
