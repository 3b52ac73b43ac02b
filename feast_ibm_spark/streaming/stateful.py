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
O(1) state per key, and both support processing-time state eviction:

- ``streaming_sessionize(idle_timeout_seconds=...)`` flushes a quiet
  key's open session via ``GroupStateTimeout.ProcessingTimeTimeout`` —
  without it a session only closes when a LATER event on the same key
  arrives, so the last session of a key that goes silent would never be
  emitted and its state never freed.
- ``streaming_first_seen(state_ttl_seconds=...)`` evicts a key's seen
  flag after the TTL — bounding state for unbounded key universes at the
  documented cost that a key recurring after the TTL is re-emitted (the
  standard watermark-bounded streaming-dedup trade-off).
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
    idle_timeout_seconds: float | None = None,
) -> DataFrame:
    """Assign gap-based sessions per key; emit each CLOSED session once.

    A session closes when a later event on the same key arrives more than
    ``gap_seconds`` after the session's last event. The still-open session
    stays in state (emitted on a later batch once it closes) — unless
    ``idle_timeout_seconds`` is set, in which case a key receiving no data
    for that much PROCESSING time has its open session flushed and its
    state evicted (bounded state + bounded emission latency for keys that
    go quiet; the timeout fires on the next micro-batch that executes
    after expiry). Output: key columns + (session_start, session_end,
    n_events).
    """
    key_fields = [stream.schema[k] for k in key_cols]
    out_schema, state_schema = _session_schemas(key_fields)
    gap_us = gap_seconds * 1_000_000
    out_cols = [*key_cols, "session_start", "session_end", "n_events"]

    def _rows(sessions: list[tuple], key) -> pd.DataFrame:
        return pd.DataFrame(
            [
                key + (pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"), cnt)
                for (s, e, cnt) in sessions
            ],
            columns=out_cols,
        )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_seconds is not None and state.hasTimedOut:
            # quiet key: flush the open session, free the state
            if state.exists:
                start_us, end_us, n = state.get
                state.remove()
                yield _rows([(start_us, end_us, n)], key)
            return

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
        if idle_timeout_seconds is not None:
            state.setTimeoutDuration(max(1, int(idle_timeout_seconds * 1000)))

        if closed:
            yield _rows(closed, key)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_first_seen(
    stream: DataFrame,
    key_cols: list[str],
    state_ttl_seconds: float | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming exact-dedup: pass through only the FIRST row per key.

    State per key is one flag; every later occurrence (same batch or any
    later batch) is dropped. Row choice within the first batch follows
    arrival order by default; pass ``order_cols`` (round-6) to instead
    emit the batch's minimum row under that column tuple — arrival-order
    INDEPENDENT within the batch, which makes the whole drained result a
    pure function of the data whenever each key's rows arrive in one
    micro-batch (e.g. a file stream whose files are hash-partitioned by
    the key, the shape ``q_streaming_first_seen`` uses). Across batches
    the first batch containing the key still wins — append-mode
    streaming cannot retract an emission in favor of a later-arriving
    smaller row.

    ``state_ttl_seconds`` bounds total state for unbounded key universes:
    a key's flag is evicted after that much processing time without new
    occurrences, so a key recurring AFTER the TTL is emitted again — the
    same contract as watermark-bounded ``dropDuplicates``. None keeps
    state forever (exact dedup, unbounded state).
    """
    out_schema = stream.schema
    state_schema = StructType([StructField("seen", LongType())])

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_seconds is not None and state.hasTimedOut:
            state.remove()
            return
        if state_ttl_seconds is None and state.exists:
            return  # no TTL: flag is immutable, skip the state-store write
        first = None
        if not state.exists:
            if order_cols is None:
                for pdf in pdfs:
                    if len(pdf) and first is None:
                        first = pdf.iloc[:1]
            else:
                chunks = [pdf for pdf in pdfs if len(pdf)]
                if chunks:
                    allrows = (
                        chunks[0] if len(chunks) == 1 else pd.concat(chunks)
                    )
                    first = allrows.sort_values(
                        order_cols, kind="mergesort"
                    ).iloc[:1]
        state.update((1,))
        if state_ttl_seconds is not None:
            # refresh the TTL on every occurrence (sliding eviction window)
            state.setTimeoutDuration(max(1, int(state_ttl_seconds * 1000)))
        if first is not None:
            yield first

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
