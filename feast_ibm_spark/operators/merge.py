"""CDC-style merge: apply a change batch (upserts + deletes) to a keyed
snapshot — the missing half of the materialize loop.

The reference's production cycle is append-only materialization
(``ibm_data_engine/data_engine_offline_store.py:421-476`` pulls
latest-per-key slices; Feast core loads them downstream). Real feature
pipelines also receive *mutations*: late corrections, GDPR deletes,
upstream CDC feeds. Lakehouse engines spell this ``MERGE INTO``; plain
Spark-on-parquet has no MERGE, so this operator re-expresses it as a
union + one keyed window — the classic shuffle-merge:

1. tag both inputs with a ``__src`` priority (changes outrank the
   snapshot on timestamp ties — a correction AT the snapshot's own
   timestamp must win);
2. ``row_number() over (partition by key order by ts desc, __src desc)``
   picks each key's winning row;
3. rows whose winner is a delete op drop out; everything else is the new
   snapshot.

Physical shape: ONE hash shuffle on the key serves the window; no join at
all (a join-based MERGE shuffles both sides AND re-shuffles the output).
At 100 TB the snapshot side dominates; the window streams each key group,
so memory is bounded by a key's row count, not the partition. Skewed keys
get AQE skew-split. Writing the result with dynamic partition overwrite
(see ``store.materialize_partitioned``) makes re-applying the same change
batch idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: op-column verbs understood by merge_changes
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Return the post-merge snapshot.

    ``snapshot`` — current state, one-or-more rows per key (extra rows are
    deduped by recency, so a raw history table works too). Must NOT carry
    ``op_col``; it is treated as all-upserts.
    ``changes`` — same value columns plus ``op_col`` in
    {``upsert``, ``delete``} and a ``ts_col`` ordering the mutations.

    Winner per key = greatest ``ts_col``, change-batch rows beating
    snapshot rows on ties; keys whose winner is a delete vanish. Output
    schema = snapshot schema (no ``op_col``). ``tiebreak_cols`` (largest
    wins) pin the order for same-source same-timestamp rows so the result
    is deterministic and oracle-comparable.
    """
    if op_col in snapshot.columns:
        raise ValueError(
            f"snapshot must not carry the op column {op_col!r}; "
            "rename it or pass a different op_col"
        )
    for helper in ("__src", "__rn"):
        for side, df in (("snapshot", snapshot), ("changes", changes)):
            if helper in df.columns:
                raise ValueError(
                    f"{side} must not carry the internal helper column "
                    f"{helper!r}; rename it before merging"
                )
    value_cols = [c for c in snapshot.columns]
    base = snapshot.select(
        *value_cols,
        F.lit(OP_UPSERT).alias(op_col),
        F.lit(0).alias("__src"),
    )
    # Malformed CDC feeds must fail loudly, not silently upsert: any op
    # outside {upsert, delete} raises at execution time. The check is a
    # pure Catalyst expression (no extra pass, no Python).
    checked_op = F.when(
        F.col(op_col).isin(OP_UPSERT, OP_DELETE), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"merge_changes: {op_col!r} value must be "
                      f"'{OP_UPSERT}' or '{OP_DELETE}', got "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        )
    )
    delta = changes.select(
        *value_cols, checked_op.alias(op_col), F.lit(1).alias("__src")
    )
    unioned = base.unionByName(delta)

    order = [F.col(ts_col).desc(), F.col("__src").desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != F.lit(OP_DELETE)))
        .select(*value_cols)
    )


def survivorship_merge(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    attr_cols: list[str],
) -> DataFrame:
    """COLUMN-LEVEL survivorship (golden-record construction): per key,
    each attribute independently takes its latest NON-NULL value in
    ``order_cols`` order — the master-data-management merge, distinct
    from row-level CDC (``merge_changes``) where one winning row
    supplies every column. A key whose freshest row has a null email
    but an older row has a real one keeps the real email AND the
    freshest other attributes.

    One shuffle: every attribute resolves in the same key-partitioned
    window via ``last(col, ignorenulls=True)`` over the full frame, and
    the per-key reduction to one row rides the same exchange (rn over
    the identical window spec — Spark reuses the sort). Engine-exact:
    no arithmetic at all, only ordered selection; ties are excluded by
    construction when ``order_cols`` ends in a unique column.

    Output: key cols + one survived column per attr + ``n_sources``
    (how many rows contributed to the key).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = df
    for c in attr_cols:
        out = out.withColumn(
            f"__surv_{c}", F.last(F.col(c), ignorenulls=True).over(frame)
        )
    out = out.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(
            Window.partitionBy(*key_cols)
        )
    )
    return (
        out.where(F.col("__rn") == 1)
        .select(
            *key_cols,
            *[F.col(f"__surv_{c}").alias(c) for c in attr_cols],
            F.col("__n").cast("bigint").alias("n_sources"),
        )
    )
