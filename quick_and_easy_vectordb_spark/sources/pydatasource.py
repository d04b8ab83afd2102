"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
a from-scratch CONNECTOR, not a reader over files.

``SynthEventsDataSource`` registers as format ``qev_synth`` and
generates a deterministic synthetic event stream entirely inside the
executors: the driver plans N ``RangePartition``s over the row space
and each executor materializes its own slice from a closed-form
integer formula — zero input I/O, zero data on the driver. This is the
template for wrapping any external system (REST API, key-value store,
message log) as a first-class Spark table: implement ``partitions()``
to shard the remote keyspace and ``read()`` to fetch one shard.

The formula is pure integer arithmetic (value = integer/10, exact in
binary? NO — /10 is not exact; but both engines perform the SAME
single division on the same integer, so results are bit-identical),
which is what makes the connector oracle-checkable: DuckDB reproduces
the stream from ``range()``.

Scale stance: ``partitions()`` is the parallelism contract — a real
connector returns one partition per remote shard/split so a
1000-executor cluster fans out naturally; nothing here serializes
through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "event_id long, user_id long, event_type string, value double"
EVENT_TYPES = ("view", "click", "cart", "purchase")


def synth_row(i: int) -> tuple[int, int, str, float]:
    """Closed-form row #i — mirrored by the SQL oracle."""
    return (
        i,
        (i * 37 + 11) % 97,
        EVENT_TYPES[(i * 13 + 7) % 4],
        ((i * 31 + 3) % 1000) / 10.0,
    )


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[RangePartition]:
        step = -(-self.rows // self.num_partitions)  # ceil
        return [
            RangePartition(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """STREAMING side of the connector: offsets are row positions, each
    micro-batch drains up to ``batch_size`` rows until ``rows`` are
    emitted, then returns empty batches. ``readBetweenOffsets`` replays
    any offset range deterministically — the property that gives a
    restarted query exactly-once output from the checkpointed offset
    log (same contract as Kafka's (topic, partition, offset))."""

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        s0 = start["pos"]
        s1 = min(s0 + self.batch_size, self.rows)
        # contract: (ITERATOR of tuples, next offset) — a list here
        # breaks the runner's prefetch cache (next(it) on a list)
        return iter([synth_row(i) for i in range(s0, s1)]), {"pos": s1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(start["pos"], end["pos"])])


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "qev_synth"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SynthEventsReader:
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SynthEventsStreamReader:
        return SynthEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the qev_synth format."""
    spark.dataSource.register(SynthEventsDataSource)
