"""Dataset split + sequence packing (north-star extension; no reference
counterpart — the operations a training-data pipeline runs after curation).

Both are pure Catalyst expressions (no Python UDFs) and both are
deterministic functions of the input keys, so they are exactly
reproducible across engines and across re-runs at any scale:

- ``split_col``: hash-bucketed train/val/test assignment. A multiplicative
  Knuth hash of the id modulo a fixed bucket count — membership is a pure
  function of the id (stable under re-runs, appends, repartitioning; the
  property pipelines need so late-arriving data never reshuffles old
  assignments). No shuffle at all: it is a projection.
- ``pack_sequences``: assign documents to fixed-token-budget "packs"
  (context windows) by running token count in a deterministic order —
  the distributed formulation ``pack_id = floor(cumsum_before / budget)``:
  one window shuffle, each pack overflows its budget by at most one
  document (downstream tokenizers truncate/split at the boundary), unlike
  strict greedy packing which is inherently sequential.

At 100 TB: split is map-only; packing is one range-partitioned window
(order by the id). Packing a whole corpus through ONE global window would
serialize on a single ordering — partition packing by a shard column
(``pack_sequences(..., shard_cols=[...])``), which is what real pipelines
do anyway (packs never span shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constant (2654435761 = 2^32 * phi); buckets in
# [0, SPLIT_BUCKETS). All arithmetic stays far below 2^63 for ids < 2^31.
SPLIT_MULT = 2654435761
SPLIT_BUCKETS = 1000


def split_bucket_col(id_col: str | Column) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (c.cast("bigint") * F.lit(SPLIT_MULT)) % F.lit(SPLIT_BUCKETS)


def split_col(
    id_col: str | Column,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> Column:
    """'train' | 'val' | 'test' as a deterministic function of the id."""
    train_hi = int(round(train_frac * SPLIT_BUCKETS))
    val_hi = train_hi + int(round(val_frac * SPLIT_BUCKETS))
    b = split_bucket_col(id_col)
    return (
        F.when(b < train_hi, F.lit("train"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    budget: int,
    order_cols: list[str],
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each row a ``pack_id`` (and ``pack_offset``, the token offset
    where the row starts inside its pack) under a fixed token budget.

    ``order_cols`` must be a deterministic unique ordering within a shard
    (e.g. the document id). Documents longer than ``budget`` occupy
    ``ceil(n/budget)`` packs' worth of ids on their own — the id sequence
    stays consistent because pack_id is floor(tokens_before / budget).
    """
    w = Window.orderBy(*order_cols) if not shard_cols else Window.partitionBy(
        *shard_cols
    ).orderBy(*order_cols)
    tokens_before = F.coalesce(
        F.sum(F.col(token_count_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("bigint")
    return df.withColumn(
        "pack_id", F.floor(tokens_before / F.lit(budget)).cast("bigint")
    ).withColumn(
        "pack_offset", (tokens_before % F.lit(budget)).cast("bigint")
    )
