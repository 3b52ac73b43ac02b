"""One-pass column profiling (north-star extension; no reference
counterpart — the "what is in this table" step every large-scale pipeline
runs before and after each transformation).

``profile_columns`` computes, per requested column: row count, null
count, distinct count, and min/max — in ONE aggregation pass over the
input (a single scan, no per-column jobs), then pivots the one-row
aggregate into a long per-column layout with ``stack`` (all JVM-side,
no Python UDFs, no collect).

Scale note — exact vs approximate distinct: multiple exact
``count(DISTINCT c)`` in one aggregate make Catalyst plan an ``Expand``
(input duplicated once per distinct column: N profiled columns => N×
rows into the shuffle). That is acceptable for a handful of columns and
is what the DuckDB-checked gate query uses (exact=True, hash-parity).
At 100 TB with wide profiles, pass ``exact=False``: HLL++
``approx_count_distinct`` keeps the plan a plain single-pass partial
aggregate (mergeable sketch state, no Expand) at ±~2% error — same
trade the reference-free sketch query (``agg_approx_event_stats``)
already documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    num_cols: tuple[str, ...] | list[str] = (),
    str_cols: tuple[str, ...] | list[str] = (),
    exact: bool = True,
) -> DataFrame:
    """Profile ``num_cols`` + ``str_cols`` in one aggregation pass.

    Output (one row per profiled column):
    ``col, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    max_str`` — the num/str min-max pair not applicable to a column's
    type is NULL, so the schema is stable regardless of the mix.
    """
    all_cols = [*num_cols, *str_cols]
    if not all_cols:
        raise ValueError("no columns to profile")
    distinct = F.count_distinct if exact else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in all_cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(distinct(F.col(c)).alias(f"{c}__nd"))
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    one = df.agg(*aggs)

    # pivot the single aggregate row to long form: stack is a plain
    # projection over the one-row result — no second pass over the data
    parts = []
    for c in num_cols:
        parts.append(
            f"'{c}', `{c}__nn`, `{c}__nd`, "
            f"CAST(`{c}__min` AS DOUBLE), CAST(`{c}__max` AS DOUBLE), "
            f"CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in str_cols:
        parts.append(
            f"'{c}', `{c}__nn`, `{c}__nd`, "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
            f"`{c}__min`, `{c}__max`"
        )
    stacked = one.select(
        F.col("__rows").alias("n_rows"),
        F.expr(
            f"stack({len(all_cols)}, {', '.join(parts)}) AS "
            "(col, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "col",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("n_nonnull")).cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )
