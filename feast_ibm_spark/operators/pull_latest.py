"""Latest row per key within a time range (``pull_latest`` semantics).

Reference: ``pull_latest_from_table_or_query``
(``ibm_data_engine/data_engine_offline_store.py:421-476``) does a group-max
self-join: ``SELECT keys, max(ts) GROUP BY keys`` joined back ``USING
(keys, ts)`` (``:435-444``, ``:458-465``). Two known reference quirks:

- ``created_timestamp_column`` is accepted but unused (``:428``), so ties
  on max(ts) are NOT broken — the USING join can return multiple rows per
  key on timestamp ties.
- The self-join scans the source twice.

Spark-first: a single window ``row_number() OVER (PARTITION BY keys ORDER
BY ts DESC [, created DESC])`` + ``rn = 1`` — the same shape the reference
itself uses inside its PIT template (``:725-739``). One shuffle on the keys
instead of two scans + a shuffle join; AQE handles skewed keys. A compat
flag reproduces the reference's keep-all-ties behavior exactly (RANK
instead of ROW_NUMBER) for oracle parity when needed.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__feast_row_number"


def latest_per_key(
    df: DataFrame,
    join_key_columns: list[str],
    feature_name_columns: list[str],
    timestamp_field: str,
    created_timestamp_column: str | None = None,
    start_date: datetime | str | None = None,
    end_date: datetime | str | None = None,
    keep_ties: bool = False,
) -> DataFrame:
    """Latest feature row per entity key in ``[start_date, end_date]``.

    ``keep_ties=True`` reproduces the reference's multiple-rows-on-ties
    behavior (reference ``:461-464``); the default breaks ties by
    ``created_timestamp_column`` (fixing the reference bug at ``:428``) and
    is deterministic when a created column is supplied.
    """
    cols = list(
        dict.fromkeys(
            [
                *join_key_columns,
                *feature_name_columns,
                timestamp_field,
                *([created_timestamp_column] if created_timestamp_column else []),
            ]
        )
    )
    # filter_ts_range handles one-sided bounds, so apply it whenever EITHER
    # bound is given — a caller supplying only start_date must not get an
    # unfiltered scan.
    if start_date is not None or end_date is not None:
        from ..sources.reader import filter_ts_range

        df = filter_ts_range(df, timestamp_field, start_date, end_date)
    out = df.select(*cols)

    order = [F.col(timestamp_field).desc()]
    if created_timestamp_column and not keep_ties:
        order.append(F.col(created_timestamp_column).desc())
    w = Window.partitionBy(*join_key_columns).orderBy(*order)
    rank_fn = F.rank() if keep_ties else F.row_number()
    return out.withColumn(_RN, rank_fn.over(w)).filter(F.col(_RN) == 1).drop(_RN)
