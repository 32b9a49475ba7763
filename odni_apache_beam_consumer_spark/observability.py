"""Pipeline observability: in-plan metric collection for batch and
streaming jobs.

Reference parity: the reference's only observability is a commented-out
``log_element`` print tap (/root/reference/main.py:26-29) and a bare
try/except around pipeline run (main.py:77,111-112). The Spark-native
replacement is ``df.observe(...)`` — named aggregate metrics evaluated
*inside* the existing plan (zero extra scans, zero extra shuffles: the
observation rides the already-flowing rows) — plus a
``StreamingQueryListener`` for per-micro-batch progress.

Two entry points:

  * ``observed(df, name, *metrics)`` — batch: attach an ``Observation``;
    after any action on the returned frame, ``obs.get`` yields the metric
    dict. Used for ingest-validation counters (row counts, null counts,
    constraint violations) without a second pass over the data.
  * ``observe_stream(df, name, *metrics)`` — streaming: attach named
    metrics that surface in every micro-batch's
    ``StreamingQueryProgress.observedMetrics``.

``validation_metrics`` builds the standard ingest-quality metric set for
a list of columns. All metrics are plain Column aggregates, so they stay
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def validation_metrics(*null_check_cols: str) -> list[Column]:
    """Standard ingest-validation metric set: total rows plus a null/NaN
    counter per listed column. Aggregates only — evaluated in-plan."""
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_check_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    return metrics


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach an Observation to a batch frame. The metrics materialize on
    the first action over the returned frame; read them with
    ``obs.get`` (blocks until that action completes).

    Scale note: this is the 100 TB-safe way to get job counters — the
    alternative (a separate ``df.count()`` / ``df.where(...).count()``
    pass) re-reads the input once per counter.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def observe_stream(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Attach named metrics to a streaming frame; every micro-batch's
    progress event then carries them under ``observedMetrics[name]``."""
    return df.observe(name, *metrics)


def last_observed(query, name: str) -> dict | None:
    """Pull the named observed-metrics row from a (finished or running)
    streaming query's most recent progress, as a plain dict."""
    for progress in reversed(query.recentProgress):
        om = progress.observedMetrics
        if name in om:
            row = om[name]
            return row.asDict()
    return None


class StateMetricsListener:
    """Per-micro-batch progress accumulator (StreamingQueryListener):
    the production monitoring surface for long-running stateful
    streams — input rows, trigger latency, and state-store row counts
    per batch, so a test (or an on-call dashboard fed the same events)
    can assert that throughput holds and STATE STAYS BOUNDED over many
    batches, which the exactly-once duals alone never check: a
    watermark that fails to evict keeps every correctness test green
    while state grows without bound until the job dies at 100 TB.

    Implemented lazily against ``pyspark.sql.streaming``'s listener ABC
    (subclassing at import time would drag streaming imports into every
    batch-only consumer of this module): call :meth:`attach` with the
    session, :meth:`detach` when done.

    Callbacks run on the listener bus thread — after ``awaitTermination``
    returns, the final batch's event may still be in flight, so readers
    should poll :meth:`settled` (the tests do) rather than assume
    ``batches`` is complete the instant the query stops.
    """

    def __init__(self) -> None:
        self.batches: list[dict] = []
        self.terminated = False
        self._listener = None

    def attach(self, spark) -> "StateMetricsListener":
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                state_total = 0
                state_updated = 0
                state_removed = 0
                state_bytes = 0
                for s in p.stateOperators:
                    state_total += s.numRowsTotal
                    state_updated += s.numRowsUpdated
                    state_removed += s.numRowsRemoved
                    state_bytes += s.memoryUsedBytes
                outer.batches.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "trigger_ms": p.durationMs.get("triggerExecution", 0),
                        "state_rows_total": state_total,
                        "state_rows_updated": state_updated,
                        "state_rows_removed": state_removed,
                        "state_bytes": state_bytes,
                    }
                )

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                outer.terminated = True

        self._listener = _L()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark) -> None:
        if self._listener is not None:
            spark.streams.removeListener(self._listener)
            self._listener = None

    def settled(self, timeout_sec: float = 30.0) -> bool:
        """Wait until the terminated event arrived and the batch list has
        stopped growing (listener bus drained)."""
        import time as _t

        deadline = _t.monotonic() + timeout_sec
        last = -1
        while _t.monotonic() < deadline:
            n = len(self.batches)
            if self.terminated and n == last:
                return True
            last = n
            _t.sleep(0.2)
        return False

    # -- derived metrics ---------------------------------------------------
    def data_batches(self) -> list[dict]:
        return [b for b in self.batches if b["num_input_rows"] > 0]

    def rows_per_sec(self) -> float:
        total_rows = sum(b["num_input_rows"] for b in self.batches)
        total_ms = sum(b["trigger_ms"] for b in self.batches)
        return total_rows / (total_ms / 1000.0) if total_ms else 0.0

    def max_state_rows(self) -> int:
        return max((b["state_rows_total"] for b in self.batches), default=0)

    def total_removed(self) -> int:
        return sum(b["state_rows_removed"] for b in self.batches)
