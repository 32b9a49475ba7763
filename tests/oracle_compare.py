"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and compares
row count, column-name set, and (order-insensitively) values: exact for
strings/ints, tolerance 1e-9 for floats (both sides pre-round their float
outputs, so this is belt-and-braces).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from odni_apache_beam_consumer_spark.catalog import TABLE_NAMES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = table_path(sf_dir, name)
        # Driver testdata is one file per table; Spark-written inputs
        # (e.g. the 10x scale_bench synthesis) are directories of parts.
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def _neg_zero_count(s: pd.Series) -> int:
    """Count -0.0 values in a float series (equal to 0.0 under tolerance,
    but a value-representation hash sees the sign bit)."""
    import numpy as np

    if not pd.api.types.is_float_dtype(s):
        return 0
    vals = s.to_numpy(dtype=float, na_value=float("nan"))
    return int((np.signbit(vals) & (vals == 0.0)).sum())


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    Beyond tolerance-based value comparison, this flags two classes the
    driver's value-REPRESENTATION hash catches but float tolerance masks
    (the r3/r4 driver-red cells that stayed green through four local
    sweeps):
      * int-vs-float dtype class mismatch between sides (e.g. a DuckDB
        HUGEINT column materializing as float64 while Spark emits int64);
      * -0.0 on either side (equal to +0.0 under tolerance, hash-distinct).
    """
    sp = _normalize(spark_df.toPandas())
    du = _normalize(oracle_df)
    problems: list[str] = []
    if list(sp.columns) != list(du.columns):
        problems.append(f"columns differ: spark={list(sp.columns)} oracle={list(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row counts differ: spark={len(sp)} oracle={len(du)}")
        return problems
    for c in sp.columns:
        a, b = sp[c], du[c]
        a_float = pd.api.types.is_float_dtype(a)
        b_float = pd.api.types.is_float_dtype(b)
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        if (a_float and b_int) or (a_int and b_float):
            problems.append(
                f"column {c!r}: dtype class mismatch spark={a.dtype} "
                f"oracle={b.dtype} — hash-unportable (a HUGEINT oracle "
                f"column materializes as float64; cast it to BIGINT)"
            )
        nz_a, nz_b = _neg_zero_count(a), _neg_zero_count(b)
        # Only a -0.0 count MISMATCH is a definite driver red (the driver
        # hashes representation, so -0.0 in the SAME cells on both sides
        # hashes equal).  Equal nonzero counts are still a convention
        # violation, but that's enforced oracle-side by
        # tests/test_oracle_portability.py, which bans -0.0 outright.
        if nz_a != nz_b:
            problems.append(
                f"column {c!r}: -0.0 count mismatch (spark={nz_a} "
                f"oracle={nz_b} cells) — hash-distinct from +0.0; emit "
                f"integer FLOOR(x*scale) units instead of ROUND on a double"
            )
        if a_float or b_float:
            af = a.astype(float)
            bf = b.astype(float)
            bad = ~(
                (af.isna() & bf.isna())
                | ((af - bf).abs() <= 1e-9 + 1e-9 * bf.abs().fillna(0))
            )
        else:
            bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
        if bad.any():
            i = int(bad.idxmax())
            problems.append(
                f"column {c!r}: {int(bad.sum())} mismatched values, "
                f"first at row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
            )
    return problems


def run_one(spark, con, name: str, sf_dir: str) -> list[str]:
    from odni_apache_beam_consumer_spark.plans.registry import all_oracles, all_queries

    q = all_queries()[name]
    sql = all_oracles().get(name)
    sdf = q(spark, sf_dir)
    if sql is None:
        # No oracle: assert non-empty output (every registered corpus is
        # non-empty) and a stable, named schema — not just "it ran".
        problems = []
        if sdf.count() == 0:
            problems.append(f"{name}: rows-only check returned 0 rows")
        if not sdf.columns or any(c.startswith("_") for c in sdf.columns):
            problems.append(f"{name}: unstable/unnamed output columns {sdf.columns}")
        return problems
    rel = con.sql(sql)
    # Catch hash-unportable oracle types BEFORE the pandas bridge hides
    # them: DuckDB widens windowed/plain SUM(BIGINT) to HUGEINT, which
    # materializes as float64 ("5.0") while Spark emits int64 — row count
    # and name-schema still match, only the driver's value hash diverges
    # (the r3/r4 sequence_packing red cell).
    huge = [
        col
        for col, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    if huge:
        return [
            f"{name}: oracle columns typed HUGEINT/UHUGEINT "
            f"(hash-unportable — CAST to BIGINT): {huge}"
        ]
    odf = rel.df()
    return compare(sdf, odf)


def _sig(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)
