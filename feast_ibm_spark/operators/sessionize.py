"""Gap-based sessionization over a batch event table.

The batch twin of ``streaming/stateful.streaming_sessionize`` (north-star
extension; the reference is batch-retrieval-only and has no session
operator). Classic lag + cumulative-sum formulation:

1. ``lag(ts) over (partition by key order by ts, tiebreak)`` — previous
   event time per key;
2. ``is_new = (prev is null) or (ts - prev > gap)`` — session boundary
   flag, computed in integer microseconds so the same predicate runs
   verbatim in any SQL engine;
3. ``session_id = sum(is_new) over (... rows unbounded preceding)`` —
   running count of boundaries;
4. group by (key, session_id) -> start/end/count.

Physical shape: ONE shuffle on the entity key serves both window steps
(same partitioning), then the groupBy reuses it — Catalyst collapses the
two windows into a single sort+window stage. Skewed keys (bot users with
millions of events) are the scale hazard; AQE skew handling applies to
the shuffle, and the window itself is streaming-friendly (no full-key
materialization).

Spark also offers ``F.session_window`` (native gap windows, shared with
Structured Streaming); this formulation is used instead because its
boundary semantics (strict vs inclusive gap) are pinned exactly and
reproducibly for cross-engine oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (key, session): session_id, start, end, n_events.

    Events on the same key belong to one session while consecutive gaps
    are <= ``gap_seconds`` (inclusive — an event exactly at the gap edge
    extends the session). ``tiebreak_cols`` pin the window order for
    events with identical timestamps so results are deterministic.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # Gap math as INTERVAL subtraction, not unix_micros: identical
    # (exact microseconds) for TIMESTAMP inputs, and zone-free for
    # TIMESTAMP_NTZ — unix_micros would route NTZ through the session
    # zone, which is non-monotone across DST gaps (round-7 review).
    gap_us = int(round(gap_seconds * 1_000_000))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.col(ts_col) - prev_ts
            > F.expr(f"INTERVAL {gap_us} MICROSECOND")
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    sid = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("__sid", sid)
        .groupBy(*key_cols, F.col("__sid").alias("session_id"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
