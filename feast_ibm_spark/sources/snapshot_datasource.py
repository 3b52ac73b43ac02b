"""Spark-native access to snapshot tables through the Spark 4 Python
DataSource API (north-star extension; no reference counterpart — the
reference's storage has no version dimension at all,
ibm_data_engine/data_engine_offline_store.py:535-558):

    register_snapshot_datasource(spark)
    spark.read.format("fis_snapshot").load(path)                  # latest
    spark.read.format("fis_snapshot").option("version", 3).load(path)
    spark.readStream.format("fis_snapshot").load(path)            # tail!

The STREAM reader is the Delta "stream from a table" move on this
format: offsets are table VERSIONS, each micro-batch's partitions are
exactly the segment directories the committed range added — planned
from manifests alone through the same :func:`_added_segments` walk the
change data feed uses, so the source inherits the CDF's whole
contract: insert-only (overwrites and tombstone changes refuse,
loudly), certified compactions flow through as no-ops, and replayed
batches are deterministic because manifests are immutable (Structured
Streaming checkpoints the version offsets; a restarted query re-plans
the same segment list bit-for-bit). Rows carry ``_commit_version``.

Execution is Arrow-native: each partition is read in the Python worker
with pyarrow (no JVM round-trip for the data plane), null-padded and
cast to the table's declared schema (schema evolution on read), and
yielded as RecordBatches. Local/file:// paths only — the worker-side
reads use pyarrow's filesystem; the manifest protocol itself is
scheme-shaped for object stores (see sources/fsio.py), so widening the
data plane is a filesystem argument, not a redesign.

The BATCH reader is the same scan at one version (time travel via
``option("version", N)``); tables with live merge-on-read tombstones
refuse the batch path (an anti-join cannot run inside a per-partition
reader) — :func:`~feast_ibm_spark.sources.snapshots.read_snapshot`
is the MOR-aware read.

The WRITE paths close the loop (round 12b):

    df.write.format("fis_snapshot").mode("append").save(path)
    stream.writeStream.format("fis_snapshot").option("path", path)...

Executors stage Arrow batches as parquet files into a hidden directory
under the table's own data dir (contention-free uuid names, same
filesystem as the commit target so assembly is pure rename); the
driver's commit assembles them into a segment-shaped directory, sums
row counts from the parquet FOOTERS (metadata COUNT(*) stays
answerable without reading data), and publishes through the SAME CAS
commit path every other writer uses — schema enforcement, delta
manifests, ``committed_at``, optimistic retries, and the batch ledger
all apply unchanged. The STREAMING sink commits each epoch with
``batch_id=epochId``: a replayed epoch finds its id in the bounded
ledger and skips the double-commit — the exactly-once contract of
``write_snapshot_batch`` without needing ``foreachBatch``. Save modes:
``append`` / ``overwrite`` (the Python DataSource API does not route
``ErrorIfExists``/``Ignore`` to custom formats).
"""

from __future__ import annotations

import os
import posixpath

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from .snapshots import (
    _DATA_DIR,
    _added_segments,
    _bloom_may_contain,
    _canon_stat,
    _commit_version,
    _committed_batch_version,
    _resolve_manifest,
    _seg_version,
    _snapshot_versions,
    get_fs,
)

FORMAT_NAME = "fis_snapshot"


def register_snapshot_datasource(spark) -> None:
    """Register the ``fis_snapshot`` format on this session.

    The DataSource class is cloudpickled into Spark's Python workers
    (both the driver-side planning worker and the executor-side read
    workers), which do not necessarily have this package on their
    import path — so the modules it closes over are registered for
    BY-VALUE pickling first: the format then works from any driver
    process without installing the package into the worker
    environment (pyspark itself is imported by reference — the
    workers always have it)."""
    from pyspark import cloudpickle

    from . import fsio as _fsio
    from . import snapshot_datasource as _self
    from . import snapshots as _snapshots

    for m in (_fsio, _snapshots, _self):
        cloudpickle.register_pickle_by_value(m)
    spark.dataSource.register(SnapshotDataSource)


def _local_path(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    if "://" in path:
        raise ValueError(
            f"{FORMAT_NAME} reads data worker-side via pyarrow and "
            f"currently supports local/file:// paths only (got {path!r})"
        )
    return path


def _segment_files(root: str, seg: str) -> list[str]:
    """Parquet data files of one segment directory, enumerated
    driver-side (hidden/marker files excluded, the Spark convention)."""
    d = os.path.join(root, *seg.split("/"))
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if not f.startswith(("_", ".")) and f.endswith(".parquet")
    )


class _SegmentPartition(InputPartition):
    def __init__(self, files: list[str], version: int):
        self.files = files
        self.version = version


def _read_partition(partition: _SegmentPartition, arrow_schema):
    """Worker-side: stream one segment's parquet files as RecordBatches
    conformed to the table schema (missing columns null-padded — schema
    evolution on read; ``_commit_version`` appended as a constant)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if partition is None:
        return  # an all-pruned scan: Spark still runs one empty task
    data_fields = [f for f in arrow_schema if f.name != "_commit_version"]
    target = pa.schema(data_fields)
    for path in partition.files:
        tbl = pq.read_table(path)
        cols = []
        for f in data_fields:
            if f.name in tbl.column_names:
                cols.append(tbl.column(f.name))
            else:
                cols.append(pa.nulls(len(tbl), type=f.type))
        conformed = pa.table(cols, schema=pa.schema(
            [pa.field(f.name, c.type) for f, c in zip(data_fields, cols)]
        )).cast(target)
        conformed = conformed.append_column(
            "_commit_version",
            pa.array([partition.version] * len(tbl), type=pa.int64()),
        )
        yield from conformed.to_batches()


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, options, arrow_schema):
        path = _local_path(options["path"])
        fs = get_fs(path)
        versions = _snapshot_versions(fs, path)
        if not versions:
            raise FileNotFoundError(f"no committed snapshots under {path}")
        version = int(options.get("version", versions[-1]))
        if version not in versions:
            raise ValueError(f"version {version} not in {versions}")
        manifest = _resolve_manifest(fs, path, version)
        if manifest.get("deletes"):
            raise ValueError(
                "table has live merge-on-read tombstones — the "
                f"{FORMAT_NAME} batch reader cannot apply the anti-join; "
                "use read_snapshot (or compact first)"
            )
        self._path = path
        self._manifest = manifest
        self._arrow_schema = arrow_schema
        self._pushed: list = []

    def partitions(self):
        segs = [
            s for s in self._manifest["segments"]
            if all(self._segment_may_match(s, f) for f in self._pushed)
        ]
        return [
            _SegmentPartition(
                _segment_files(self._path, s),
                _seg_version(posixpath.basename(s)),
            )
            for s in segs
        ]

    def _segment_may_match(self, seg: str, f) -> bool:
        raise AssertionError("base reader never holds pushed filters")

    def read(self, partition):
        yield from _read_partition(partition, self._arrow_schema)


class _SnapshotPushdownReader(_SnapshotBatchReader):
    """The batch reader WITH Catalyst filter pushdown. A separate
    subclass because Spark hard-refuses ANY reader that merely
    implements ``pushFilters`` while the (experimental, default-false)
    session conf is off — so the method must only exist when the user
    opted in via ``option("pushdown", "true")``."""

    def pushFilters(self, filters):
        """Catalyst filter pushdown (Spark 4.1, DOUBLE opt-in):
        comparison and IN/= predicates on top-level columns are
        remembered for SEGMENT pruning — ``.where("k = 42")`` on a
        bloom-indexed table or ``.where("ts > ...")`` on a
        stats-recorded one skips whole segment directories at
        planning, with no special read function. Every filter is
        RETURNED (Spark re-applies the exact predicate on what
        remains): manifest metadata changes I/O, never answers — the
        zone-map/bloom contract.

        Requires BOTH ``spark.sql.python.filterPushdown.enabled=true``
        (the experimental session conf, default false) AND
        ``option("pushdown", "true")`` on the read, and the loaded
        DataFrame must be used for ONE query: Spark caches the
        post-pushdown reader (and its planned partitions) on the
        relation, so reusing a single ``load()`` result across
        differently-filtered scans replays the FIRST query's pruning
        against the others (measured: a filterless ``count()`` after a
        ``k = 41`` scan returned the pruned segment's 30 rows).
        ``spark.read.format(...).option("pushdown", "true")
        .load(p).where(...)`` per query is the safe pattern; without
        the option the plain reader class (no ``pushFilters`` at all)
        is used and every scan reads the full segment list."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        supported = (EqualTo, In, GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual)
        # replace, never extend: repeated planning must not accumulate
        self._pushed = [
            f for f in filters
            if isinstance(f, supported) and len(f.attribute) == 1
        ]
        return filters

    def _segment_may_match(self, seg: str, f) -> bool:  # noqa: D401
        """Conservative per-segment verdict for one pushed filter:
        False ONLY when the manifest metadata PROVES no row can match
        (bloom says absent for every probe; stats range disjoint from
        the predicate). Anything unprovable — missing metadata,
        incomparable types — keeps the segment."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        col = f.attribute[0]
        rec = self._manifest.get("segment_stats", {}).get(seg, {})
        values = (
            list(f.value) if isinstance(f, In) else [f.value]
        )
        if isinstance(f, (EqualTo, In)):
            bloom = rec.get("__bloom", {}).get(col)
            if bloom is not None and all(
                isinstance(v, (int, str)) and not isinstance(v, bool)
                and v is not None for v in values
            ):
                if not _bloom_may_contain(bloom, values):
                    return False
        bounds = rec.get(col)
        if not bounds:
            return True
        lo, hi = bounds
        try:
            if isinstance(f, (EqualTo, In)):
                return any(
                    lo <= _canon_stat(v) <= hi for v in values
                )
            v = _canon_stat(f.value)
            if isinstance(f, GreaterThan):
                return hi > v
            if isinstance(f, GreaterThanOrEqual):
                return hi >= v
            if isinstance(f, LessThan):
                return lo < v
            if isinstance(f, LessThanOrEqual):
                return lo <= v
        except TypeError:
            return True  # incomparable literal: never prune on a guess
        return True


class _SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options, arrow_schema):
        self._path = _local_path(options["path"])
        self._start = int(options.get("startingVersion", 0))
        self._arrow_schema = arrow_schema

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        versions = _snapshot_versions(get_fs(self._path), self._path)
        return {"version": versions[-1] if versions else self._start}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        if hi <= lo:
            return []
        fs = get_fs(self._path)
        versions = _snapshot_versions(fs, self._path)
        return [
            _SegmentPartition(_segment_files(self._path, s), v)
            for v, segs in _added_segments(fs, self._path, versions, lo, hi)
            for s in segs
        ]

    def read(self, partition):
        yield from _read_partition(partition, self._arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


@dataclass
class _StagedFiles(WriterCommitMessage):
    files: list = field(default_factory=list)


def _stage_batches(iterator, staging: str):
    """Executor-side: stream this task's RecordBatches into ONE staged
    parquet file (uuid-named, contention-free) under ``staging``;
    returns the commit message listing it. Empty tasks stage nothing."""
    import uuid as _uuid

    import pyarrow.parquet as pq

    writer = None
    out = os.path.join(staging, f"part-{_uuid.uuid4().hex}.parquet")
    try:
        for batch in iterator:
            if writer is None:
                # create the dir only when something is actually
                # staged — empty tasks leave no residue
                os.makedirs(staging, exist_ok=True)
                writer = pq.ParquetWriter(out, batch.schema)
            writer.write_batch(batch)
    finally:
        if writer is not None:
            writer.close()
    return _StagedFiles(files=[out] if writer is not None else [])


def _commit_staged(
    path: str,
    staging: str,
    messages,
    mode: str,
    schema_fields,
    batch_id: int | None = None,
) -> int | None:
    """Driver-side commit of the executors' staged files: assemble a
    segment-shaped directory, sum row counts from the parquet FOOTERS
    (metadata COUNT(*) stays answerable — no data read), and publish
    through the shared CAS commit (:func:`_commit_version` with
    ``prewritten=``) — schema enforcement, delta manifests, the batch
    ledger, and optimistic retries all apply unchanged. An all-empty
    write commits nothing (None)."""
    import shutil
    import uuid as _uuid

    import pyarrow.parquet as pq

    files = [f for m in messages if m is not None for f in m.files]
    # clean the dirs the TASKS staged into (from the message paths) as
    # well as this instance's own path: Spark may instantiate the
    # writer separately for planning and execution, giving them
    # different staging uuids — cleaning only "ours" leaks the other
    staged_dirs = {os.path.dirname(f) for f in files} | {staging}
    if not files:
        for d in staged_dirs:
            shutil.rmtree(d, ignore_errors=True)
        return None
    build = os.path.join(
        path, _DATA_DIR, f".seg-build-{_uuid.uuid4().hex[:8]}"
    )
    os.makedirs(build, exist_ok=True)
    n_rows = 0
    for f in files:
        n_rows += pq.read_metadata(f).num_rows
        os.rename(f, os.path.join(build, os.path.basename(f)))
    for d in staged_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return _commit_version(
        None, path, mode, batch_id=batch_id, prewritten=build,
        schema_fields=schema_fields, precomputed_stats={"__rows": n_rows},
    )


class _SnapshotBatchWriter(DataSourceArrowWriter):
    def __init__(self, options, schema, overwrite: bool):
        import uuid as _uuid

        self._path = _local_path(options["path"])
        self._schema = schema
        self._mode = "overwrite" if overwrite else "append"
        # created lazily by the first writing task; commit/abort
        # remove it, so an all-empty write leaves no residue
        self._staging = os.path.join(
            self._path, _DATA_DIR, f".stage-{_uuid.uuid4().hex[:8]}"
        )

    def write(self, iterator):
        return _stage_batches(iterator, self._staging)

    def commit(self, messages) -> None:
        _commit_staged(self._path, self._staging, messages,
                       self._mode, self._schema.fields)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class _SnapshotStreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once streaming SINK: each epoch commits as a snapshot
    version carrying ``batch_id=epochId``, so a replayed epoch finds
    its id in the bounded batch ledger and skips the double-commit —
    the same idempotent-sink contract ``write_snapshot_batch`` gives
    foreachBatch, without the foreachBatch."""

    def __init__(self, options, schema, overwrite: bool):
        import uuid as _uuid

        self._path = _local_path(options["path"])
        self._schema = schema
        # lazily created per epoch by the first writing task;
        # commit/abort remove it (empty epochs leave no residue)
        self._staging = os.path.join(
            self._path, _DATA_DIR, f".stage-{_uuid.uuid4().hex[:8]}"
        )

    def write(self, iterator):
        return _stage_batches(iterator, self._staging)

    def commit(self, messages, batchId: int) -> None:
        import shutil

        if _committed_batch_version(
            get_fs(self._path), self._path, batchId
        ) is not None:  # replayed epoch: already durable
            shutil.rmtree(self._staging, ignore_errors=True)
            return
        _commit_staged(self._path, self._staging, messages,
                       "append", self._schema.fields, batch_id=batchId)

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class SnapshotDataSource(DataSource):
    """``fis_snapshot``: snapshot tables as a Spark read format —
    batch time travel and a Structured-Streaming tail of the manifest
    chain (module docstring)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        path = _local_path(self.options["path"])
        fs = get_fs(path)
        versions = _snapshot_versions(fs, path)
        if not versions:
            raise FileNotFoundError(f"no committed snapshots under {path}")
        manifest = _resolve_manifest(fs, path, versions[-1])
        schema_map = manifest.get("schema")
        if not schema_map:
            # pre-round-12 table (no schema in the manifest): merge the
            # segment parquet FOOTERS in segment order — one metadata
            # read per segment, once at planning; newly committed
            # tables never take this path
            return self._footer_schema(path, manifest["segments"])
        cols = ", ".join(
            f"`{name}` {typ}" for name, typ in schema_map.items()
        )
        return f"{cols}, `_commit_version` bigint"

    @staticmethod
    def _footer_schema(path: str, segments: list[str]):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import LongType, StructField, StructType

        fields: dict = {}
        for seg in segments:
            files = _segment_files(path, seg)
            if not files:
                continue
            for f in from_arrow_schema(
                pq.read_schema(files[0]), prefer_timestamp_ntz=False
            ).fields:
                fields.setdefault(f.name, f)
        if not fields:
            raise ValueError(f"no readable segment schema under {path}")
        return StructType(
            list(fields.values())
            + [StructField("_commit_version", LongType())]
        )

    def _arrow_schema(self, schema):
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(schema)

    def reader(self, schema) -> DataSourceReader:
        cls = (
            _SnapshotPushdownReader
            if self.options.get("pushdown", "false").lower() == "true"
            else _SnapshotBatchReader
        )
        return cls(self.options, self._arrow_schema(schema))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _SnapshotStreamReader(self.options, self._arrow_schema(schema))

    def writer(self, schema, overwrite: bool):
        return _SnapshotBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _SnapshotStreamWriter(self.options, schema, overwrite)
