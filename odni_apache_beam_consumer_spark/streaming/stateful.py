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


HIGH_WATER_SCHEMA = "user_id BIGINT, n_events BIGINT, max_value DOUBLE"


def user_high_water_marks(events: DataFrame) -> DataFrame:
    """Per-user high-water mark via ``transformWithStateInPandas`` —
    Spark 4's stateful-processing v2.  Versus ``applyInPandasWithState``:
    state is a set of named, individually-typed variables on a handle
    (here a count and a max, updated independently), and the same
    processor can also register timers/TTL for keyspace reaping — the API
    the modern engine should prefer for new stateful operators.

    One row per key per micro-batch that touches it (append mode);
    state partitioning/recovery semantics are identical to v1 (per-key in
    the state store; TWS additionally REQUIRES the RocksDB provider).
    Runtime deps: the TWS state-server protocol needs ``protobuf``
    (not bundled with pyspark) — environments without it use
    ``running_user_totals`` (v1) instead; the equivalence test skips
    itself accordingly.  The processor class is defined inside this
    function so cloudpickle ships it by value — no package import needed
    on executors."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class HighWater(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n BIGINT")
            self._mx = handle.getValueState("mx", "mx DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = self._n.get()[0] if self._n.exists() else 0
            mx = self._mx.get()[0] if self._mx.exists() else float("-inf")
            for pdf in rows:
                n += int(len(pdf))
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._n.update((n,))
            self._mx.update((mx,))
            yield pd.DataFrame(
                {"user_id": [int(key[0])], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=HighWater(),
        outputStructType=HIGH_WATER_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


FUNNEL_SCHEMA = (
    "user_id BIGINT, purchase_id BIGINT, purchase_ts STRING, "
    "click_id BIGINT, view_id BIGINT"
)
_FUNNEL_STATE_SCHEMA = (
    "view_sec BIGINT, view_id BIGINT, "
    "click_sec BIGINT, click_id BIGINT, click_view_id BIGINT"
)


def funnel_attribution_stream(events: DataFrame, horizon_s: int = 86400) -> DataFrame:
    """Ordered-funnel attribution as a custom stateful operator — the
    streaming twin of plans/windows.py::funnel_attribution (equivalence
    proven in tests/test_streaming.py).

    Per-user state is FIVE numbers: the latest view (ts, id) and the
    latest click (ts, id, the view it attributed when processed).  Each
    purchase emits one row attributing to the state's click if it is
    within ``horizon_s`` strictly before the purchase, and through it to
    that click's view — last-touch attribution with O(1) state per user,
    versus the batch form's sort + two window passes.  This is the CEP
    shape (pattern A -> B -> C with per-step deadlines) that windowed
    aggregation cannot express and state can, in constant memory.

    Ordering contract: events must arrive per-user in non-decreasing
    event time ACROSS micro-batches (the replay source's ts-ranged chunks
    guarantee it here; a production deployment buffers by watermark or
    accepts last-delivered-wins).  Within a batch the fold sorts by
    (ts, event_id), so intra-batch disorder is handled."""

    def fold(key, pdfs, state):
        import pandas as pd

        if state.exists:
            v_sec, v_id, c_sec, c_id, c_view = state.get
        else:
            v_sec, v_id, c_sec, c_id, c_view = (-1, -1, -1, -1, -1)
        out = {
            "user_id": [],
            "purchase_id": [],
            "purchase_ts": [],
            "click_id": [],
            "view_id": [],
        }
        uid = int(key[0])
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            secs = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
            for sec, eid, etype, ts in zip(
                secs, pdf["event_id"], pdf["event_type"], pdf["ts"]
            ):
                if etype == "view":
                    v_sec, v_id = sec, int(eid)
                elif etype == "click":
                    attributed = v_id if (v_id >= 0 and v_sec >= sec - horizon_s) else -1
                    c_sec, c_id, c_view = sec, int(eid), attributed
                elif etype == "purchase":
                    hit = c_id >= 0 and c_sec >= sec - horizon_s
                    out["user_id"].append(uid)
                    out["purchase_id"].append(int(eid))
                    out["purchase_ts"].append(ts.strftime("%Y-%m-%d %H:%M:%S"))
                    out["click_id"].append(c_id if hit else None)
                    out["view_id"].append(c_view if (hit and c_view >= 0) else None)
        state.update((v_sec, v_id, c_sec, c_id, c_view))
        if out["user_id"]:
            yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
