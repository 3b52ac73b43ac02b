"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference is batch-only (SURVEY.md §2: streaming constructs explicitly
absent), and Spark's built-in streaming aggregations cannot express these
two shapes — they need arbitrary per-key state transitions:

- ``streaming_sessionize``   — gap-based sessionization: events on the
  same key belong to one session while consecutive event times are within
  ``gap_seconds``; a closed session emits exactly one row. State per key
  is ONE open session (start, end, count) regardless of history length.
- ``streaming_first_seen``   — streaming exact-dedup: emit only the first
  row ever seen per key; afterwards the key's state is a single boolean.
  The streaming twin of ``operators/dedup.exact_dedup`` for continuous
  training-data ingestion.

Scale notes: state lives in the executor state store partitioned by key
(one shuffle per micro-batch on the grouping key); both operators keep
O(1) state per key. In production add ``GroupStateTimeout`` eviction for
keys that go quiet (sessionize currently closes a session only when a
later event arrives — the standard trade-off when event-time timers are
not needed for correctness of emitted rows, only for emission latency).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def _session_schemas(key_fields) -> Tuple[StructType, StructType]:
    out = StructType(
        list(key_fields)
        + [
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    return out, state


def streaming_sessionize(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based sessions per key; emit each CLOSED session once.

    A session closes when a later event on the same key arrives more than
    ``gap_seconds`` after the session's last event. The still-open session
    stays in state (its row is emitted on a later batch once it closes).
    Output: key columns + (session_start, session_end, n_events).
    """
    key_fields = [stream.schema[k] for k in key_cols]
    out_schema, state_schema = _session_schemas(key_fields)
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = n = None

        closed: list[tuple] = []
        for pdf in pdfs:
            ts_us = (
                pd.to_datetime(pdf[ts_col]).astype("datetime64[us]").astype("int64")
            )
            for t in sorted(ts_us.tolist()):
                if start_us is None:
                    start_us, end_us, n = t, t, 1
                elif t - end_us <= gap_us:
                    end_us, n = max(end_us, t), n + 1
                else:
                    closed.append((start_us, end_us, n))
                    start_us, end_us, n = t, t, 1
        state.update((start_us, end_us, n))

        if closed:
            yield pd.DataFrame(
                [
                    key
                    + (
                        pd.Timestamp(s, unit="us"),
                        pd.Timestamp(e, unit="us"),
                        cnt,
                    )
                    for (s, e, cnt) in closed
                ],
                columns=[*key_cols, "session_start", "session_end", "n_events"],
            )

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_first_seen(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Streaming exact-dedup: pass through only the FIRST row per key.

    State per key is one flag; every later occurrence (same batch or any
    later batch) is dropped. Row choice within the first batch follows
    arrival order, matching at-least-once streaming dedup semantics.
    """
    out_schema = stream.schema
    state_schema = StructType([StructField("seen", LongType())])

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[:1]
        state.update((1,))
        if first is not None:
            yield first

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
