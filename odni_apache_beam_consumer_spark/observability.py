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
