"""Custom Python data source: deterministic synthetic events generator.

PySpark 4's DataSource API lets an engine register first-class sources in
pure Python (``spark.dataSource.register`` →
``spark.read.format("synthetic_events")``) — the extension point a user
of the reference would need for any feed that isn't Kafka (the
reference's only source, ``/root/reference/main.py:85-108``).

Scale notes: partition planning happens on the driver (one
``InputPartition`` per requested slice), generation runs
executor-side per partition — the source parallelizes like any file scan.
Rows are a pure function of (partition, offset), so reads are
deterministic, repeatable, and testable with no fixture files.  Python
row generation is the slow path by construction — real 100 TB feeds stay
on the JVM sources (parquet/Kafka/files); this API is for custom
integrations and test rigs, which is exactly what it's used for here.
"""

from __future__ import annotations

import datetime

SCHEMA = "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE"

_EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
_EPOCH = datetime.datetime(2024, 1, 1)


def _row(i: int) -> tuple:
    """Deterministic event #i — a pure function, shared by the source and
    its tests (the test oracle IS this function)."""
    h = (i * 2654435761) % 2**32  # Knuth multiplicative hash
    return (
        i,
        _EPOCH + datetime.timedelta(seconds=i * 7),
        h % 1000,
        _EVENT_TYPES[h % len(_EVENT_TYPES)],
        round((h % 100000) / 100.0, 2),
    )


try:  # DataSource API requires pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    HAVE_DATASOURCE_API = True

    class _SliceP(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options: dict):
            self.n_rows = int(options.get("rows", "1000"))
            self.n_partitions = max(1, int(options.get("partitions", "8")))

        def partitions(self):
            per = -(-self.n_rows // self.n_partitions)  # ceil
            return [
                _SliceP(lo, min(lo + per, self.n_rows))
                for lo in range(0, self.n_rows, per)
            ]

        def read(self, partition: "_SliceP"):
            for i in range(partition.start, partition.end):
                yield _row(i)

    class SyntheticEventsSimpleStreamReader(SimpleDataSourceStreamReader):
        """Streaming form of the generator: the unbounded-table dual of the
        batch reader, offset-tracked so Structured Streaming replays and
        checkpoints it like any real source (this is the extension point a
        user of the reference would implement for a non-Kafka feed —
        /root/reference/main.py:85-108 hardwires Kafka).

        Offsets are plain row counters (``{"i": n}``): ``read`` serves at
        most ``rowsPerBatch`` rows per micro-batch and stops advancing at
        ``maxRows`` — a bounded-ized stream, the same semantics as the
        reference's ``max_num_records=3`` (/root/reference/main.py:106).
        Note ``availableNow`` drains only the one batch the simple-reader
        API prefetches; a bounded drain runs a normal trigger until the
        sink holds ``maxRows`` rows (see the test).  ``readBetweenOffsets``
        regenerates
        any committed range on replay — rows are a pure function of the
        offset, so recovery is trivially exactly-once.  The simple-reader
        API generates driver-side (no partition planning): the test-rig
        path; high-volume feeds belong on JVM sources or the partitioned
        batch reader."""

        def __init__(self, options: dict):
            self.rows_per_batch = int(options.get("rowsPerBatch", "100"))
            self.max_rows = int(options.get("maxRows", "1000"))

        def initialOffset(self) -> dict:
            return {"i": 0}

        def read(self, start: dict):
            i0 = int(start["i"])
            i1 = min(i0 + self.rows_per_batch, self.max_rows)
            return iter([_row(i) for i in range(i0, i1)]), {"i": i1}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter([_row(i) for i in range(int(start["i"]), int(end["i"]))])

    class SyntheticEventsDataSource(DataSource):
        """``spark.read.format("synthetic_events").option("rows", N)`` /
        ``spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", B).option("maxRows", N)``"""

        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> str:
            return SCHEMA

        def reader(self, schema) -> SyntheticEventsReader:
            return SyntheticEventsReader(self.options)

        def simpleStreamReader(self, schema) -> SyntheticEventsSimpleStreamReader:
            return SyntheticEventsSimpleStreamReader(self.options)

    def register(spark) -> None:
        spark.dataSource.register(SyntheticEventsDataSource)

except ImportError:  # pragma: no cover - pyspark 3.x fallback
    HAVE_DATASOURCE_API = False

    def register(spark) -> None:
        raise NotImplementedError(
            "custom Python data sources need pyspark >= 4 (DataSource API)"
        )
