"""Schema-first JSON-lines / CSV file sources (batch + streaming).

The reference ingests exactly one format: JSON strings from Kafka
(``/root/reference/main.py:105-108`` reads raw bytes and prints them —
parsing never happens).  A usable engine also needs file-based text
formats; these helpers wrap ``spark.read``/``readStream`` with the two
rules that matter at 100 TB:

* **Schema is declared, never inferred.**  Inference reads the whole
  input once before the real job starts — a full extra pass at scale —
  and silently drifts when a batch of files is missing a field.  Every
  reader here requires an explicit DDL schema, which also makes the
  streaming variants possible at all (Structured Streaming refuses to
  infer).
* **Corrupt records are quarantined, not fatal.**  ``PERMISSIVE`` mode
  routes unparseable lines into ``_corrupt_record`` so one bad line in a
  100 TB drop doesn't kill the job; callers split the quarantine column
  off and route it to a dead-letter sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def _json_schema_with_quarantine(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} STRING"


def read_json_lines(
    spark: SparkSession, path: str, schema: str, streaming: bool = False
) -> DataFrame:
    """Read newline-delimited JSON with a declared DDL schema.

    Unparseable lines land in ``_corrupt_record`` (all data columns
    null); use ``split_corrupt`` to quarantine them."""
    reader = (spark.readStream if streaming else spark.read).format("json")
    return (
        reader.schema(_json_schema_with_quarantine(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    streaming: bool = False,
) -> DataFrame:
    """Read CSV with a declared DDL schema (no inference pass)."""
    reader = (spark.readStream if streaming else spark.read).format("csv")
    return (
        reader.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .load(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) from a PERMISSIVE JSON read.

    Clean rows drop the quarantine column; quarantined rows keep only it
    (the raw offending line) for a dead-letter sink.

    The input is persisted first: Spark refuses plans that read ONLY the
    internal corrupt-record column straight off a raw file scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching the
    parsed result is the documented pattern, and both halves then read
    one materialization instead of re-parsing the files twice."""
    df = df.persist()
    clean = df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.where(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return clean, bad
