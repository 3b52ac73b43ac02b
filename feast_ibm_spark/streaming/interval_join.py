"""Stream-stream interval join with watermark-bounded state.

The last Structured-Streaming join class the engine lacked: two live
streams equi-joined on a key with an event-time interval predicate
(``left.ts BETWEEN right.ts - before AND right.ts + after``). Spark's
stream-stream inner join keeps both sides' rows in the state store until
the watermark plus the interval bound passes them — the time bound is
what makes the state FINITE, so it is required, not an optimization
(an unbounded stream-stream join would buffer both streams forever).

At scale: state is partitioned by the join key like any shuffle; the
interval width x input rate bounds each side's state size, and the
watermark delay trades completeness against memory. This is the
streaming twin of ``operators/interval.py``'s bucketed batch range join
— same semantics, incremental execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    before_seconds: int,
    after_seconds: int,
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key_cols`` where ``left_ts`` falls in
    ``[right_ts - before_seconds, right_ts + after_seconds]``.

    ``how="left_outer"`` adds the second stream-stream join semantics:
    a left row with NO match emits once — with nulls on the right — when
    the watermark proves no matching right row can still arrive (state
    eviction and unmatched emission are the same event). On a BOUNDED
    drain that proof needs the watermark to pass the final rows, so the
    caller must push a sentinel through both streams (see
    ``q_streaming_interval_join_outer``); a live deployment needs no
    sentinel — the next real data advances the watermark.

    ``how="left_semi"`` is the EXISTS semantics: a left row emits AT
    MOST ONCE — with only the left side's columns — as soon as any
    matching right row is observed; further matches are absorbed by the
    already-emitted mark in the state store. Unmatched left rows never
    emit at all, so unlike left_outer a bounded drain needs no sentinel
    for the emission itself (matches happen in-batch); state is still
    evicted by the watermark like the inner join's.

    Both inputs must be streaming DataFrames; each gets its event-time
    watermark here (same delay — pass pre-watermarked frames to vary).
    Column names must be disjoint apart from ``key_cols``; both ts
    columns survive in the output (left-only columns for ``left_semi``).
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = functools_reduce_and(
        [F.col(f"l.{k}") == F.col(f"r.{k}") for k in key_cols]
        + [
            F.col(f"l.{left_ts}")
            >= F.col(f"r.{right_ts}") - F.expr(f"INTERVAL {before_seconds} SECOND"),
            F.col(f"l.{left_ts}")
            <= F.col(f"r.{right_ts}") + F.expr(f"INTERVAL {after_seconds} SECOND"),
        ]
    )
    joined = lw.alias("l").join(rw.alias("r"), cond, how)
    # project key columns once (both sides carry them after the alias join);
    # a semi join exposes no right-side columns at all.
    keep = [F.col(f"l.{k}").alias(k) for k in key_cols]
    others = [F.col(f"l.{c}") for c in left.columns if c not in key_cols]
    if how not in ("left_semi", "leftsemi", "semi"):
        others += [F.col(f"r.{c}") for c in right.columns if c not in key_cols]
    return joined.select(*keep, *others)


def functools_reduce_and(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
