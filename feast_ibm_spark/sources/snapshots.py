"""Manifest-based table snapshots with time-travel reads (north-star
extension; no reference counterpart — the reference's storage is
immutable COS objects with no version dimension at all,
ibm_data_engine/data_engine_offline_store.py:535-558).

The Iceberg/Delta idea reduced to its load-bearing core: a table is a
DIRECTORY of immutable data segments plus a sequence of numbered
manifest files, each listing exactly the segments visible at that
version. Appends write a new segment, then publish a new manifest that
lists the old segments plus the new one; the manifest write is the
COMMIT POINT (written to a temp name, then atomically renamed), so a
reader never observes a half-appended version and a crashed writer
leaves at most an orphaned segment that no manifest references. Reads
at version v load only v's segment list — time travel is free, O(1)
metadata, no data copies; reproducing last week's training set is
``read_snapshot(path, version=last_week)``.

Scale: manifests hold segment DIRECTORY names, not file lists — the
per-version metadata is O(appends), and the read plan is a plain
multi-directory parquet scan (partition pruning, pushdown, and column
pruning all intact). At 100 TB the same design holds; production would
add manifest compaction past ~10^5 segments (Iceberg's manifest-list
layer), noted here as the next tier, not built.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_snapshots"
_DATA_DIR = "data"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:06d}.json")


def snapshot_versions(path: str) -> list[int]:
    """Committed versions, ascending (empty for a fresh/absent table)."""
    d = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def write_snapshot(df: DataFrame, path: str, mode: str = "append") -> int:
    """Commit ``df`` as a new immutable snapshot version; returns the
    committed version number. Version 1 creates the table. ``mode``:
    ``"append"`` — the new version sees all previous segments plus this
    one; ``"overwrite"`` — the new version sees ONLY this segment (the
    table-replacement commit; older versions stay readable until
    :func:`vacuum_snapshots` reclaims their segments). The manifest
    rename is the commit point either way."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode={mode!r}: need 'append' or 'overwrite'")
    versions = snapshot_versions(path)
    version = (versions[-1] + 1) if versions else 1
    seg = f"{_DATA_DIR}/seg-{version:06d}"
    df.write.mode("errorifexists").parquet(os.path.join(path, seg))
    prev = (
        _read_manifest(path, versions[-1])["segments"]
        if versions and mode == "append" else []
    )
    os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(path, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "segments": prev + [seg]}, f)
    os.rename(tmp, _manifest_path(path, version))  # commit point
    return version


def vacuum_snapshots(path: str, keep_last: int = 1) -> tuple[int, int]:
    """Retention: keep only the newest ``keep_last`` versions and delete
    every segment directory no kept manifest references — the GC step
    that makes ``mode="overwrite"`` reclaim space (append-only chains
    share all segments with the latest version, so vacuum deletes
    nothing there — by design, old versions stay time-travelable for
    free). Deletion order is crash-safe: old MANIFESTS go first (the
    commit dimension shrinks atomically per unlink), orphaned segments
    after — a crash mid-vacuum leaves unreferenced segments, never a
    readable version with missing data. Returns
    (manifests_dropped, segments_deleted)."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last={keep_last}: need >= 1")
    versions = snapshot_versions(path)
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    referenced = set()
    for v in keep:
        referenced.update(_read_manifest(path, v)["segments"])
    for v in drop:
        os.unlink(_manifest_path(path, v))
    data_dir = os.path.join(path, _DATA_DIR)
    n_seg = 0
    if os.path.isdir(data_dir):
        for d in sorted(os.listdir(data_dir)):
            if f"{_DATA_DIR}/{d}" not in referenced:
                shutil.rmtree(os.path.join(data_dir, d))
                n_seg += 1
    return len(drop), n_seg


def write_snapshot_batch(df: DataFrame, path: str, batch_id: int) -> int:
    """Exactly-once twin of :func:`write_snapshot` for streaming
    ``foreachBatch`` sinks: the manifest records ``batch_id``, and a
    RETRY of an already-committed batch (Structured Streaming replays
    the last batch after a crash) finds its id in the manifest chain and
    returns the existing version instead of double-committing — the
    idempotent-sink contract foreachBatch requires. Returns the version
    holding this batch."""
    for v in reversed(snapshot_versions(path)):
        m = _read_manifest(path, v)
        if m.get("batch_id") == batch_id:
            return v
    versions = snapshot_versions(path)
    version = (versions[-1] + 1) if versions else 1
    seg = f"{_DATA_DIR}/seg-{version:06d}"
    df.write.mode("errorifexists").parquet(os.path.join(path, seg))
    prev = _read_manifest(path, versions[-1])["segments"] if versions else []
    os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(path, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "segments": prev + [seg],
                   "batch_id": batch_id}, f)
    os.rename(tmp, _manifest_path(path, version))  # commit point
    return version


def compact_snapshots(spark: SparkSession, path: str) -> int:
    """Rewrite the LATEST version's segment chain into one segment,
    committed as a new ``overwrite`` version — the small-files
    compaction every append-heavy snapshot table eventually needs
    (each streaming micro-batch commit is its own segment; scan
    planning degrades one task per tiny file). Contents are identical
    by construction (one read, one write, no transformation); history
    stays time-travelable until :func:`vacuum_snapshots` reclaims it.
    Returns the new version number."""
    return write_snapshot(read_snapshot(spark, path), path,
                          mode="overwrite")


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: latest committed). A plain
    multi-directory parquet scan over the version's segment list —
    pushdown/pruning intact, no data movement."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    segs = _read_manifest(path, version)["segments"]
    # segments are ENGINE-written (micros timestamps), so the nanos shim
    # in sources/reader.py is unnecessary — a plain multi-dir scan reads
    # them exactly. mergeSchema: appends may legitimately ADD columns
    # over a table's lifetime (schema evolution); without it a
    # multi-segment scan would silently project the first-listed
    # segment's schema and drop the new column from old-segment rows
    # instead of NULL-padding them.
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(*[os.path.join(path, s) for s in segs])
    )
