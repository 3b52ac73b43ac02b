"""Data-quality checks: declarative constraints evaluated in few passes.

The validation layer every production pipeline runs before publishing a
table: NOT NULL, uniqueness, value-range and referential-integrity
checks. Design for 100 TB:

- all NOT-NULL and range checks for a table fold into ONE scan-aggregate
  (a single grouped pass emits every violation count — no per-check
  scans);
- a uniqueness check is one hash aggregate on the key;
- a referential check is one broadcast (small dim) or shuffle anti join
  counting orphans.

Results come back as rows ``(check, n_violations)`` so the caller can
gate a publish on ``max(n_violations) == 0`` with one tiny collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """One scan: per-column null counts as (check, n_violations) rows."""
    # coalesce like the other checks: F.sum over ZERO rows is NULL, and a
    # publish gate on max(n_violations) == 0 must not evaluate to NULL on
    # an empty input
    aggs = [
        F.coalesce(F.sum(F.col(c).isNull().cast("bigint")), F.lit(0)).alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "stack({n}, {pairs}) as (check, n_violations)".format(
            n=len(cols),
            pairs=", ".join(f"'not_null:{c}', `{c}`" for c in cols),
        )
    )
    return stacked


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows participating in key collisions (0 when the key is unique)."""
    dupes = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("n_violations"))
    )
    return dupes.select(
        F.lit("unique:" + ",".join(key_cols)).alias("check"), "n_violations"
    )


def check_in_range(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    """Values outside [lo, hi] (NULLs don't count — that's not_null's
    job)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.agg(
        F.sum(cond.cast("bigint")).alias("n_violations")
    ).select(F.lit(f"range:{col}").alias("check"),
             F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"))


def check_references(
    df: DataFrame, fk_cols: list[str], dim: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """Orphaned foreign keys: rows of ``df`` whose (non-null) fk has no
    match in ``dim`` — one anti join (broadcast when dim is small)."""
    renamed = dim.select(
        *[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)]
    ).distinct()
    orphans = (
        df.select(*fk_cols)
        .na.drop(subset=fk_cols)
        .join(F.broadcast(renamed), fk_cols, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return orphans.select(
        F.lit("fk:" + ",".join(fk_cols)).alias("check"), "n_violations"
    )


def run_checks(*checks: DataFrame) -> DataFrame:
    """Union check results into one (check, n_violations) report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
