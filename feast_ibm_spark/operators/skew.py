"""Skew-tolerant aggregation: salted two-phase groupBy.

AQE splits skewed JOIN partitions at runtime, but a skewed GROUP BY key
is not split — every row of a hot key still hashes to one reduce task,
and at 100 TB a single dominant key (one event type, one tenant, the ''
token) serializes the whole stage behind one straggler. The classic
lever is salting: append a deterministic per-row salt to the grouping
key, aggregate (key, salt) first — hot keys fan out over ``n_salts``
reduce tasks — then merge the tiny partial table by key alone.

Only works for aggregates with a partial/merge decomposition; this
operator supports the canonical set (sum, count, min, max — count merges
as a sum of partial counts). Spark's own partial aggregation (map-side
combine) already handles MODERATE skew — the salt pays off when a hot
key's post-combine partials still dominate a reducer, i.e. very many map
tasks x few reducers on the hot key. The second aggregate runs over at
most ``n_keys x n_salts`` rows, so its cost is noise.

The salt must be deterministic (re-runs and retries must agree) and must
spread rows of one key uniformly: hash of a unique row id, reduced mod
``n_salts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-tolerant aggregate.

    ``aggs`` maps output column name -> (fn, input column) with fn in
    {sum, count, min, max} (count ignores its input column). ``salt_col``
    is a unique row id whose hash spreads each key over ``n_salts``
    partial groups. Result is row-identical to the direct
    ``df.groupBy(keys).agg(...)`` — the salt changes the SHUFFLE shape,
    never the answer.
    """
    bad = [f for f, _ in aggs.values() if f not in _PARTIAL]
    if bad:
        raise ValueError(f"unsupported aggregate fns {bad}; "
                         f"supported: {sorted(_PARTIAL)}")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[_PARTIAL[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
