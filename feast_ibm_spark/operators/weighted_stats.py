"""Weighted order statistics — exact, selection-only, engine-portable
(north-star extension; no reference counterpart).

The interpolated-percentile family (``percentile``, ``quantile_cont``)
cannot express per-row weights, and float interpolation differs by 1 ulp
across engines at fractional ranks (measured: the bootstrap-CI B=40
cell). Weighted quantiles avoid both problems by construction here:

1. weights are pre-aggregated per DISTINCT value (equal values merge
   before any running sum, so tie ORDER cannot matter);
2. one integer cumulative sum runs over the per-key distinct-value
   spine — |keys x distinct values| rows, never data rows;
3. the rank test is pure BIGINT cross-multiplication
   (``den * cum >= num * W`` for quantile num/den) — no division, no
   float, no interpolation;
4. the answer is min(value) among qualifiers — an ELEMENT of the input.

Every emitted number is an input element or an exact integer sum, so a
SQL twin hashes identically at any scale. Scale shape: two hash
aggregates over the data (map-side combinable), one window + one
broadcast join over the distinct-value spine.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_quantile_by_key(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
    q_num: int = 1,
    q_den: int = 2,
) -> DataFrame:
    """Per-key lower weighted q-quantile (default q = 1/2, the weighted
    median): the smallest value whose cumulative weight reaches
    ``q_num/q_den`` of the key's total weight. NULL values and NULL /
    non-positive weights are excluded (a zero-weight row cannot move an
    order statistic; a NULL one is a non-observation). Weights are cast
    to BIGINT — fractional weights TRUNCATE (a 0.4 weight counts 0);
    pre-scale fractional weights to integers (e.g. x1000) so the
    cumulative sums stay exact, which is the whole point.

    Output: key_cols + ``total_weight`` (BIGINT) + ``wq`` (the selected
    value, original type).
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    if not (0 < Fraction(q_num, q_den) <= 1):
        raise ValueError(f"quantile {q_num}/{q_den} must be in (0, 1]")
    # Filter on the CASTED weight: a fractional weight in (0, 1) passes
    # a pre-cast `> 0` test but truncates to 0, and a key whose weights
    # are ALL fractional would then get total_weight=0 — making the rank
    # test (den*cum >= num*0) vacuously true and emitting a bogus
    # wq = min(value) row instead of excluding the key (ADVICE r10).
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    ).select(
        *key_cols,
        F.col(value_col).alias("__v"),
        F.col(weight_col).cast("bigint").alias("__w"),
    ).filter(F.col("__w") > 0)
    vals = base.groupBy(*key_cols, "__v").agg(F.sum("__w").alias("__vw"))
    # total weight rides the SAME partitioning as the running sum (a
    # whole-partition window frame) instead of a separate aggregate +
    # join-back: Spark 4.1 reuses no exchanges, so the agg+join diamond
    # re-derived `vals` from a SECOND full scan of the input (measured
    # in PLANS.md: 6 scans / 4 shuffles before, 3 / 2 after)
    w_cum = (
        Window.partitionBy(*key_cols).orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = (
        Window.partitionBy(*key_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = vals.select(
        *key_cols,
        "__v",
        F.sum("__vw").over(w_cum).alias("__cum"),
        F.sum("__vw").over(w_all).alias("total_weight"),
    )
    return (
        cum.filter(
            F.lit(q_den) * F.col("__cum")
            >= F.lit(q_num) * F.col("total_weight")
        )
        .groupBy(*key_cols, "total_weight")
        .agg(F.min("__v").alias("wq"))
        .select(*key_cols, "total_weight", "wq")
    )
