"""Custom Python Data Source (Spark 4 DataSource API).

The modern extension point for sources Spark has no built-in reader
for (in-house feeds, bespoke formats, device streams): schema,
partition planning, and per-partition reads all declared in Python,
executed distributed — each InputPartition becomes one Spark task, so
parallelism is the source author's contract, not an afterthought.

The shipped example is a deterministic synthetic "sensor" feed
(reading i → sensor i % 7, value ((i·37) % 1000)/10) so the DuckDB
oracle can replay the generator arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SensorReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        # explicit partition planning: ~n/parts rows per task
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step))
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in bounds
        ]

    def read(self, part: _RangePartition):
        for i in range(part.start, part.end):
            yield (i, i % 7, float((i * 37) % 1000) / 10.0)


class SensorSource(DataSource):
    """spark.read.format("sensor").option("n", N).option("parts", P)"""

    @classmethod
    def name(cls) -> str:
        return "sensor"

    def schema(self) -> str:
        return "reading_id bigint, sensor_id bigint, value double"

    def reader(self, schema):
        return SensorReader(self.options)


def register_sensor_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SensorSource)


class TickStreamReader(SimpleDataSourceStreamReader):
    """Bounded deterministic micro-batch stream: 200 ticks in batches
    of 50, then empty batches forever (offset stops advancing).
    `read` must return an ITERATOR of rows (a list raises
    TypeError inside latestOffset's prefetch)."""

    N_TOTAL, BATCH = 200, 50

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = start["i"]
        end = min(i + self.BATCH, self.N_TOTAL)
        return (iter([(j, j % 5, float(j)) for j in range(i, end)]), {"i": end})

    def readBetweenOffsets(self, start, end):
        return iter([(j, j % 5, float(j)) for j in range(start["i"], end["i"])])


class TickStreamSource(DataSource):
    """readStream.format("ticks") — streaming sibling of SensorSource."""

    @classmethod
    def name(cls) -> str:
        return "ticks"

    def schema(self) -> str:
        return "tick_id bigint, bucket bigint, value double"

    def simpleStreamReader(self, schema):
        return TickStreamReader()


def register_tick_stream_source(spark) -> None:
    spark.dataSource.register(TickStreamSource)
