"""Streaming CDC merge: maintain a keyed snapshot table from a live
change stream (no reference counterpart — the reference's materialize
loop at ``ibm_data_engine/data_engine_offline_store.py:421-476`` is
append-only batch; this is the MERGE-INTO maintenance loop a lakehouse
sink runs continuously).

Spark's streaming engine cannot express per-key upsert-into-a-table
directly (no MERGE on a stream), so the standard scale pattern is
``foreachBatch`` + a versioned snapshot: every micro-batch of change
rows is a bounded DataFrame, merged against the current snapshot version
with ONE keyed window, and written as the next snapshot version — the
write is never to a path being read, so each version is immutable and
the swap is atomic at the pointer. Delta/Iceberg replace the pointer
with their commit log; the merge plan is identical.

The state CARRIES TOMBSTONES: a delete is kept as a row with
``op='delete'`` rather than removing the key, which makes the per-batch
merge a pure per-key max over (ts, tiebreak) — associative and
arrival-order independent, so any partitioning of the change set into
micro-batches converges to the same final state (the property the
drained gate query's oracle relies on). Consumers read the current
version filtered to ``op != 'delete'``.

At scale: each micro-batch merge shuffles (snapshot + batch) once on the
key; snapshot versions are key-partitioned parquet so the next merge
scans only what it needs; old versions are GC'd by retention, exactly
like a table format's vacuum.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def merge_batch_into_snapshot(
    state: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str],
) -> DataFrame:
    """One CDC merge step: per key, the max-(ts, tiebreak) row of
    state-union-batch wins; tombstones are rows like any other (kept, so
    later steps can still be beaten by even-later upserts)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(),
        *[F.col(c).desc() for c in tiebreak_cols],
    )
    return (
        state.unionByName(batch)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def streaming_cdc_merge(
    changes_stream: DataFrame,
    initial_snapshot: DataFrame,
    state_dir: str,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str],
) -> tuple[DataStreamWriter, Callable[[], str]]:
    """Return (writer, current_state_path): ``writer`` is the foreachBatch
    loop maintaining versioned snapshots under ``state_dir``;
    ``current_state_path()`` returns the path of the latest committed
    version after the stream drains. ``initial_snapshot`` must already
    carry the ``op`` column (``'upsert'`` for live rows)."""
    spark = changes_stream.sparkSession

    # Restart-safe versioning (round-6 review fix): snapshot versions are
    # keyed by the STREAM'S batch id, not a driver-side counter, and the
    # base snapshot is only written once — so a restart from a durable
    # checkpoint resumes from the highest committed version instead of
    # silently resetting to the initial snapshot while the checkpoint
    # skips the already-committed batches. A REPLAYED batch (crash
    # mid-write) re-reads its true predecessor (highest version strictly
    # below its own id) and overwrites its own directory — idempotent,
    # which is exactly what foreachBatch exactly-once requires of sinks.
    base = os.path.join(state_dir, "v_base")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        initial_snapshot.write.mode("overwrite").parquet(base)

    def _committed_versions() -> list[int]:
        if not os.path.isdir(state_dir):
            return []
        out = []
        for name in os.listdir(state_dir):
            if name.startswith("b") and name[1:].isdigit() and os.path.exists(
                os.path.join(state_dir, name, "_SUCCESS")
            ):
                out.append(int(name[1:]))
        return sorted(out)

    def _path_for(version: int | None) -> str:
        return base if version is None else os.path.join(
            state_dir, f"b{version}"
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prior = [v for v in _committed_versions() if v < batch_id]
        state = spark.read.parquet(_path_for(prior[-1] if prior else None))
        merged = merge_batch_into_snapshot(
            state, batch_df, key_cols, ts_col, tiebreak_cols
        )
        merged.write.mode("overwrite").parquet(_path_for(batch_id))

    def current_state_path() -> str:
        versions = _committed_versions()
        return _path_for(versions[-1] if versions else None)

    writer = changes_stream.writeStream.foreachBatch(_process)
    return writer, current_state_path
