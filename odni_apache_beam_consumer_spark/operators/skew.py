"""Skew mitigation: salted joins for hot keys.

At 100 TB a handful of hot join keys (a viral document, a bot user, a
boilerplate hash) can put one shuffle partition hours behind the rest.
AQE's skew-join split handles sort-merge joins automatically, but salting
is the general fix that also covers aggregations and works under any join
strategy: the fact side gets a deterministic salt in [0, n_salt) so a hot
key's rows spread across n_salt reducers, and the (small-ish) build side
is replicated once per salt value.  Cost: build side ×n_salt rows — cheap
when the build side is dimension-sized; never salt two fact tables.

Salting is result-invariant, so the DuckDB oracle for a salted query is
the plain unsalted SQL — the driver's value-hash check proves the
transformation preserves semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_column(src: str | Column, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt) from any per-row column (use the
    fact table's primary key, NOT the join key — the whole point is that
    rows sharing a hot join key get different salts)."""
    c = F.col(src) if isinstance(src, str) else src
    return F.pmod(F.xxhash64(c), F.lit(n_salt)).cast("int")


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: str,
    *,
    n_salt: int = 8,
    fact_row_key: str,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ build on ``on``, with the fact side salted by
    ``fact_row_key`` and the build side exploded ×n_salt.

    The physical join keys become (on, __salt): a key carrying k rows now
    lands on min(k, n_salt) reducers instead of one.  The salt column is
    dropped from the result; output rows are identical to the unsalted
    join (oracle-checkable)."""
    f = fact.withColumn(SALT_COL, salt_column(fact_row_key, n_salt))
    b = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return f.join(b, [on, SALT_COL], how).drop(SALT_COL)
