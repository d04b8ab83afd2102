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

    def writer(self, schema: StructType, overwrite: bool):
        return SynthEventsWriter(self.options, overwrite=overwrite)


def register(spark) -> None:
    """Idempotent registration of the qev_synth format."""
    spark.dataSource.register(SynthEventsDataSource)


# ---------------------------------------------------------------------------
# WRITE side of the connector: a two-phase-commit sink. Each task
# writes its partition to a private jsonl file and returns a commit
# message; only the driver's commit() publishes the atomic manifest
# (the file list readers must trust), and abort() removes orphans — the
# same task-commit/job-commit protocol every exactly-once Spark sink
# (FileStreamSink, Iceberg, Delta) implements. On a cluster ``path``
# is shared storage (HDFS/S3); local mode shares the local FS, which
# is the same contract.
# ---------------------------------------------------------------------------

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclasses.dataclass
class FileCommitMessage(WriterCommitMessage):
    path: str
    n_rows: int


class SynthEventsWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool = False) -> None:
        if "path" not in options:
            raise ValueError("qev_synth sink requires option('path', dir)")
        self.path = options["path"]
        self.overwrite = overwrite
        if overwrite and os.path.isdir(self.path):
            # mode('overwrite') must not leave stale part files behind:
            # a reader trusting the directory listing (rather than the
            # manifest) would double-count. Clear prior output on the
            # driver before any task writes.
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_manifest.json":
                    os.remove(os.path.join(self.path, name))

    def write(self, iterator) -> FileCommitMessage:
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return FileCommitMessage(path=fname, n_rows=n)

    def commit(self, messages) -> None:
        manifest = {
            "files": sorted(m.path for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        # Temp-file + atomic rename: a crash mid-write must never
        # expose a torn manifest, because the manifest IS the commit
        # point of the two-phase protocol — readers either see the
        # complete old state or the complete new state.
        tmp = os.path.join(self.path, f"_manifest.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_manifest.json"))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


# ---------------------------------------------------------------------------
# Round 11: a FILE-based Python DataSource — a directory of PDFs as a
# first-class Spark table (format ``qev_pdf``), with the subset parser
# of operators/pdf.py doing the per-file work inside the executors.
# ---------------------------------------------------------------------------

PDF_SCHEMA_DDL = (
    "doc_id long, page_idx long, n_chars long, page_md5 string"
)


class FileListPartition(InputPartition):
    """One partition = one shard of the FILE LIST. The driver only
    lists names (O(files) strings); bytes are opened executor-side —
    the planning contract every file connector follows."""

    def __init__(self, paths: Sequence[str]) -> None:
        self.paths = list(paths)


class PdfDirReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[FileListPartition]:
        import os as _os

        names = sorted(
            n for n in _os.listdir(self.path) if n.endswith(".pdf")
        )
        paths = [_os.path.join(self.path, n) for n in names]
        step = max(1, -(-len(paths) // self.num_partitions))
        return [
            FileListPartition(paths[s : s + step])
            for s in range(0, len(paths), step)
        ]

    def read(self, partition: FileListPartition) -> Iterator[tuple]:
        import hashlib
        import os as _os

        from quick_and_easy_vectordb_spark.operators.pdf import (
            pdf_extract_text,
        )

        for p in partition.paths:
            doc_id = int(_os.path.basename(p)[:-4])
            with open(p, "rb") as f:
                pages = pdf_extract_text(f.read())
            for i, page in enumerate(pages):
                yield (
                    doc_id,
                    i,
                    len(page),
                    hashlib.md5(page.encode()).hexdigest(),
                )


class PdfDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "qev_pdf"

    def schema(self) -> str:
        return PDF_SCHEMA_DDL

    def reader(self, schema: StructType) -> PdfDirReader:
        return PdfDirReader(self.options)


def register_pdf(spark) -> None:
    """Idempotent registration of the qev_pdf format."""
    spark.dataSource.register(PdfDirDataSource)
