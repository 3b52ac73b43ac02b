"""Streaming state-store introspection (Spark 4 ``statestore`` reader).

The operational surface a long-running 100 TB streaming deployment needs:
read the CURRENT contents of a query's checkpointed state store as a
plain DataFrame — audit what sessions/aggregates the engine is holding,
count state rows per partition to find skewed keys, or debug a stuck
watermark — without stopping the query or writing recovery code. The
reader scans the HDFS/RocksDB state files directly (one task per state
partition, executor-side; nothing is collected to the driver), so
inspection cost scales with state size, not stream history.

The correctness story: after a COMPLETE-mode bounded drain of a
session-window aggregation, the state store holds exactly the final
session table, so the state read is gated against the SAME
``ORACLE_SESSIONIZE`` as the four sessionization formulations — the gate
hash proves the reader decodes keys/values faithfully, not just that it
runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """Raw state rows (key struct, value struct, partition_id) of the
    most recent committed batch, or ``batch_id`` if given — time travel
    across retained checkpoints."""
    reader = spark.read.format("statestore").option(
        "operatorId", operator_id
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint_dir)


def read_session_window_state(
    spark: SparkSession, checkpoint_dir: str, key_col: str = "user_id"
) -> DataFrame:
    """Decode a ``session_window`` aggregation's state into the session
    table shape: (key, session_start, session_end, n_events). Assumes the
    aggregation was ``min(ts), max(ts), count`` — the engine stores those
    under internal names ``min``/``max``/``count`` in the value struct."""
    return read_state(spark, checkpoint_dir).select(
        F.col(f"value.{key_col}").alias(key_col),
        F.col("value.min").alias("session_start"),
        F.col("value.max").alias("session_end"),
        F.col("value.count").alias("n_events"),
    )
