"""Deterministic sampling / dataset splitting for training pipelines.

Splits must be (a) reproducible across runs and engines, (b) stable under
corpus growth — a document's split never changes when other documents are
added — and (c) computable without a shuffle.  Hash-based assignment gives
all three: bucket = first two hex digits of md5(salt || id) ∈ [0, 256),
thresholds carve train/val/test.  Pure column expression (one map-side
pass, no state), and md5 is portable so the DuckDB oracle reproduces the
exact assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hash_bucket(id_col: str, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 256) from two md5 hex digits.

    Digit arithmetic via instr() — the same cross-engine trick as the
    SimHash bit extraction, so DuckDB mirrors it with strpos()."""
    m = f"md5(concat('{salt}:', CAST({id_col} AS STRING)))"
    return F.expr(
        f"CAST((instr('{_HEX}', substr({m}, 1, 1)) - 1) * 16 + "
        f"(instr('{_HEX}', substr({m}, 2, 1)) - 1) AS INT)"
    )


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    train_lt: int = 205,  # 205/256 ≈ 80%
    val_lt: int = 230,  # next 25/256 ≈ 10%
    out: str = "split",
) -> DataFrame:
    """Assign train/val/test deterministically by hash bucket."""
    b = hash_bucket(id_col, salt)
    return df.withColumn("bucket", b).withColumn(
        out,
        F.when(F.col("bucket") < train_lt, "train")
        .when(F.col("bucket") < val_lt, "val")
        .otherwise("test"),
    )


def duck_bucket_sql(id_col: str = "doc_id", salt: str = "split") -> str:
    """The DuckDB expression computing the identical bucket (for oracles)."""
    m = f"md5(concat('{salt}:', CAST({id_col} AS VARCHAR)))"
    return (
        f"((strpos('{_HEX}', substr({m}, 1, 1)) - 1) * 16 + "
        f"(strpos('{_HEX}', substr({m}, 2, 1)) - 1))"
    )
