"""Deletion vectors — merge-on-read row-level deletes without rewriting
data files.

``compliance_erasure_audit`` covers the copy-on-write path (anti-join +
full overwrite). This operator is the complementary MERGE-ON-READ
pattern modern lakehouse formats (Delta deletion vectors, Iceberg v2
positional deletes) use when rewriting petabyte files for a kilobyte of
deletes is unacceptable: deleted rows are recorded as a tiny sidecar of
(file, row position) pairs, readers anti-join it, and the physical
rewrite is deferred to the next compaction.

The row addresses come from Spark's ``_metadata`` hidden columns
(``file_path``, ``row_index``) — stable parquet row positions the scan
exposes for free, no synthetic ids and no nondeterministic
``monotonically_increasing_id``. The read path broadcasts the sidecar
(deletion sets are tiny relative to the lake) and anti-joins on the
(file, position) pair, so the data files are scanned exactly once and
never modified. Applying the vector physically — write the DV-filtered
view and drop the sidecar — is ordinary compaction
(``sources/layout.py``'s small-file compaction over the
``read_with_deletion_vector`` output); the copy-on-write erasure twin
(``compliance_erasure_audit``) shows that full path end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ADDR = [
    F.col("_metadata.file_path").alias("__dv_file"),
    F.col("_metadata.row_index").alias("__dv_pos"),
]


def build_deletion_vector(df: DataFrame, predicate: Column) -> DataFrame:
    """The sidecar: (file, row position) of every row matching the
    delete predicate. In production this is written next to the data
    (one compact file per touched data file); rows, not files, are the
    unit — a 10^9-row file with one deleted row keeps its other rows
    readable with zero rewrite."""
    return df.select(*_ADDR).where(predicate)


def read_with_deletion_vector(df: DataFrame, dv: DataFrame) -> DataFrame:
    """Merge-on-read: scan minus the vector. The sidecar broadcasts;
    the anti-join key is the (file, position) pair, so no data column
    participates and column pruning on ``df`` is unaffected."""
    addressed = df.select(*_ADDR, "*")
    return (
        addressed.join(
            F.broadcast(dv), on=["__dv_file", "__dv_pos"], how="left_anti"
        )
        .drop("__dv_file", "__dv_pos")
    )
