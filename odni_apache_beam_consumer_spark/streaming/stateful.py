"""Arbitrary stateful streaming: ``applyInPandasWithState``.

The custom-stateful-operator escape hatch (SURVEY §2.2 streaming-stateful
row): when watermarked windows / dropDuplicates can't express the
semantics, per-key state lives in the state store and an Arrow-batched
Python function folds each micro-batch into it.

Scale notes: state is partitioned by the grouping key across executors;
the function sees one key group at a time (Arrow batches, never
row-at-a-time Py4J).  For 100 TB streams back the state store with RocksDB
(``spark.sql.streaming.stateStore.providerClass``) and always configure a
timeout so abandoned keys are reaped — unbounded keyspaces otherwise grow
state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"
_STATE_SCHEMA = "n BIGINT, s DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (event count, value sum), one row emitted per
    key per micro-batch — the running-profile pattern (e.g. per-user
    token budgets in a training-data pipeline).

    The fold function is a self-contained closure (pickled by value): no
    imports from this package on the executor side."""

    def fold(key, pdfs, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
