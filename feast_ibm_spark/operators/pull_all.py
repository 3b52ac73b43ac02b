"""Time-range scan: projection + BETWEEN filter (``pull_all`` semantics).

Reference: ``pull_all_from_table_or_query``
(``ibm_data_engine/data_engine_offline_store.py:479-513``) renders
``SELECT keys, features, ts FROM src WHERE ts BETWEEN CAST(a AS TIMESTAMP)
AND CAST(b AS TIMESTAMP)`` via ``_time_range_query`` (``:65-80``, predicate
``:79``) with timestamps formatted/cast by ``cast_timestamp`` (``:516-523``).

Spark-first: a declarative ``select`` + ``filter``. Catalyst pushes both the
column pruning and the timestamp range down to the parquet scan
(``PushedFilters`` / ``ReadSchema`` — verified in tests/test_plans.py), so
at 100 TB this reads only the needed row groups / columns. The BETWEEN is
inclusive on both bounds, matching the reference.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_scan(
    df: DataFrame,
    join_key_columns: list[str],
    feature_name_columns: list[str],
    timestamp_field: str,
    start_date: datetime | str,
    end_date: datetime | str,
) -> DataFrame:
    """Project the needed columns and keep rows with
    ``start_date <= ts <= end_date`` (inclusive, reference ``:79``).

    The range predicate goes through :func:`filter_ts_range` so that on
    nanos-parquet sources it is rewritten into raw-int64 space and reaches
    the scan (row-group pruning) instead of stopping at the
    ``timestamp_micros`` projection."""
    from ..sources.reader import filter_ts_range

    cols = list(dict.fromkeys([*join_key_columns, *feature_name_columns, timestamp_field]))
    return filter_ts_range(df, timestamp_field, start_date, end_date).select(*cols)
