"""Hash-portability gate over every registered oracle — DuckDB-only.

The driver compares Spark vs oracle with a value-REPRESENTATION hash; two
classes of divergence are invisible to the tolerance-based local compare
but red on the driver (the r3/r4 red cells, both root-caused by the round-4
judge):

  * HUGEINT-typed oracle output (DuckDB widens SUM(BIGINT), incl. windowed,
    to HUGEINT; the pandas bridge materializes it as float64 "5.0" while
    Spark emits int64) — sequence_packing, red rounds 3-4;
  * -0.0 from DuckDB ROUND on a tiny negative double sum, which Spark's
    BigDecimal round cannot emit — embedding_gram_matrix, red round 4.

This sweep runs every oracle at the driver's correctness scale (sf0.01)
through DuckDB alone — no Spark — and fails if any output column is
declared HUGEINT/UHUGEINT or contains a -0.0 cell.  Reverting either
round-5 fix makes this test fail locally.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from tests.oracle_compare import duckdb_con

# The driver's correctness scale; overridable like the rest of the suite
# (conftest honors SPARK_GRAFT_TEST_SF_DIR for sf0.001 tests — this sweep
# runs at the driver's sf0.01 by default but must not hardcode the root).
SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01"
)


def _oracles() -> dict[str, str]:
    from odni_apache_beam_consumer_spark.plans.registry import all_oracles

    return all_oracles()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_output_is_hash_portable(con, name):
    rel = con.sql(_oracles()[name])
    huge = [
        col
        for col, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not huge, (
        f"{name}: oracle columns typed HUGEINT/UHUGEINT {huge} — the pandas "
        "bridge turns these into float64 while Spark emits int64; CAST the "
        "expression to BIGINT in the oracle"
    )
    df = rel.df()
    for c in df.columns:
        s = df[c]
        if not pd.api.types.is_float_dtype(s):
            continue
        vals = s.to_numpy(dtype=float, na_value=float("nan"))
        neg_zeros = int((np.signbit(vals) & (vals == 0.0)).sum())
        assert neg_zeros == 0, (
            f"{name}.{c}: {neg_zeros} -0.0 cells — Spark's BigDecimal round "
            "emits +0.0 for these, so the driver hash diverges; emit integer "
            "FLOOR(x*scale) units instead of ROUND on a double aggregate"
        )
