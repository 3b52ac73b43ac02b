"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) —
engine EXTENSIBILITY as a first-class surface (north-star; no reference
counterpart, the reference can only name cos_types its managed service
already knows).

``SyntheticEventsDataSource`` is a deterministic generator source: every
row is a pure function of its global index, so (a) the source needs no
storage at all — "reading" IS computing, the shape load-generation and
integration-test fixtures want; and (b) a SQL oracle can reproduce every
row from arithmetic alone, which is what lets the driver gate value-hash
a source that has no files behind it.

Scale design: the reader reports ``n_partitions`` input partitions, each
generating a contiguous index range — embarrassingly parallel, zero
skew, no driver-side row materialization (rows yield from the executor
in Arrow batches via the API's iterator contract). Filters are NOT
pushed (``pushFilters`` default) — a generator's cost is the generation
itself, so Spark's post-scan filter is already optimal.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
SYNTH_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, cents bigint"
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_partitions)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield gen_event_row(i)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("n_rows", ...)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration with the session's DataSource manager."""
    spark.dataSource.register(SyntheticEventsDataSource)


def gen_event_row(i: int) -> tuple:
    """The shared deterministic row formula — one definition so the
    batch source, the streaming source, and the SQL oracles can never
    drift from each other."""
    return (i, i % 97, EVENT_TYPES[i % 5], (i * 31) % 10000)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader contract: offsets are {"pos": n};
    each ``read`` serves at most ``batch_rows`` rows and advances the
    offset — the micro-batch boundary. ``readBetweenOffsets`` replays
    any committed range exactly (pure function of the index), which is
    what makes checkpoint recovery exactly-once for this source."""

    def __init__(self, options):
        self.n = int(options.get("n_rows", 1000))
        self.step = int(options.get("batch_rows", 250))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.step, self.n)
        return iter([gen_event_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            [gen_event_row(i) for i in range(start["pos"], end["pos"])]
        )


class SyntheticEventsStreamSource(DataSource):
    """spark.readStream.format("synthetic_events_stream") — the
    STREAMING twin of the batch generator source, same row formula."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticEventsStreamSource)


class _JsonlCommit(WriterCommitMessage):
    """Picklable commit message: the staged file this task wrote plus
    its row count (the audit payload the driver-side commit checks)."""

    def __init__(self, staged: str, n_rows: int):
        self.staged, self.n_rows = staged, n_rows


class JsonlSinkWriter(DataSourceWriter):
    """DataSourceWriter contract made concrete: each task writes its
    partition to a STAGED `.inprogress` JSONL file and returns a commit
    message; the driver-side ``commit`` — which runs only if EVERY task
    succeeded — atomically renames the staged files into place and
    writes a `_MANIFEST` naming them with their row counts. ``abort``
    removes the staged files. That is the same two-phase protocol the
    built-in file sinks implement in the JVM; a reader that honors the
    manifest never observes a torn write.
    """

    def __init__(self, options):
        self.path = options["path"]

    def write(self, rows):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f"part-{uuid.uuid4().hex}.jsonl.inprogress"
        )
        n = 0
        with open(staged, "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(staged, n)

    def commit(self, messages):
        import json
        import os

        final = []
        for m in messages:
            dest = m.staged[: -len(".inprogress")]
            os.rename(m.staged, dest)
            final.append({"file": os.path.basename(dest), "n_rows": m.n_rows})
        with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
            json.dump(sorted(final, key=lambda d: d["file"]), f)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.staged)
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    """df.write.format("jsonl_sink").option("path", ...).save()"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlSinkWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
