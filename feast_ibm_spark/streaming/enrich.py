"""Stream-static enrichment: join a live event stream with the latest
batch features — the serving-side pattern a feature store runs between
materializations (no reference counterpart; the reference is batch-only).

``enrich_stream`` left-joins each streaming event against a STATIC
snapshot of latest-feature-per-key (built with the same
``latest_per_key`` operator the batch path uses). Spark broadcasts or
re-reads the static side per micro-batch; no streaming state is created
by the join itself, so it runs indefinitely with O(1) state. For features
that must update mid-stream, swap the static side for a Delta/parquet
path that a separate materialize job overwrites — the plan re-resolves
per batch.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pull_latest import latest_per_key


def enrich_stream(
    stream: DataFrame,
    features: DataFrame,
    join_keys: list[str],
    feature_columns: list[str],
    timestamp_field: str,
    created_timestamp_column: str | None = None,
    start_date: datetime | str | None = None,
    end_date: datetime | str | None = None,
) -> DataFrame:
    """Left-join streaming events with the latest feature row per key.

    ``features`` is a static (batch) DataFrame; the latest row per key is
    computed with the engine's ``latest_per_key`` and broadcast into the
    stream — every output event carries its key's current features (NULL
    when the key has none).
    """
    latest = latest_per_key(
        features,
        join_keys,
        feature_columns,
        timestamp_field,
        created_timestamp_column,
        start_date,
        end_date,
    ).select(*join_keys, *feature_columns)
    return stream.join(F.broadcast(latest), on=join_keys, how="left")
