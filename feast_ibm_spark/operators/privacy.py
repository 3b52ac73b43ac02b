"""Privacy-risk audit over quasi-identifiers: k-anonymity and
l-diversity censuses, plus small-class suppression (north-star
extension; no reference counterpart — the privacy review step a
training-data pipeline runs before releasing or training on
user-derived tables).

Concepts (public literature): a QUASI-IDENTIFIER (QI) is a column set
that does not name a person outright but whose value combination can —
(zip, birthdate, sex) famously re-identifies most of a census. A table
is k-ANONYMOUS when every QI equivalence class holds at least k rows
(Sweeney 2002), and l-DIVERSE when every class also spans at least l
distinct values of a sensitive attribute (Machanavajjhala et al. 2006)
— k-anonymity alone fails when a class is large but every row shares
the same sensitive value.

Everything here is two-level hash aggregation — the canonical Spark
shape that scales flat: groupBy(QI) runs with map-side partial
aggregation (class counts combine before the shuffle), and the census
re-aggregation is over at most #classes rows. No windows, no joins in
the censuses; NULL QI values form their own class, exactly like SQL
``GROUP BY`` — which is what makes the DuckDB oracle parity exact.

Suppression (the enforcement op) is groupBy + join-back rather than a
``count() OVER (PARTITION BY qi)`` window: the window formulation
sorts and materializes every QI partition (a whale class becomes a
whale sort task — the hazard class NOTES' taxonomy table documents for
full windows), while the agg side of the join is #classes rows and the
probe side streams, with AQE free to pick broadcast or skew-split at
runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _qi(qi_cols: list[str | Column]) -> list[Column]:
    if not qi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return [F.col(c) if isinstance(c, str) else c for c in qi_cols]


def k_anonymity_census(
    df: DataFrame, qi_cols: list[str | Column]
) -> DataFrame:
    """Equivalence-class size census over the QI columns.

    Output: ``class_size, n_classes, n_records`` — one row per distinct
    class size. ``min(class_size)`` is the table's k; the n_records
    column says how many actual rows sit in classes of each size (the
    re-identification exposure is the records in SMALL classes, not the
    class count).
    """
    classes = df.groupBy(*_qi(qi_cols)).agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return classes.groupBy("class_size").agg(
        F.count(F.lit(1)).alias("n_classes"),
        (F.count(F.lit(1)) * F.col("class_size")).alias("n_records"),
    )


def l_diversity_census(
    df: DataFrame, qi_cols: list[str | Column], sensitive: str | Column
) -> DataFrame:
    """Distinct-sensitive-value census per QI class.

    Output: ``l, n_classes`` — one row per distinct diversity level;
    ``min(l)`` is the table's l. A single exact ``count_distinct``
    keeps the plan a plain two-phase partial aggregate (no Expand —
    that only appears with MULTIPLE distinct aggregates, see
    profile_columns' scale note).
    """
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    classes = df.groupBy(*_qi(qi_cols)).agg(
        F.count_distinct(s).alias("l")
    )
    return classes.groupBy("l").agg(F.count(F.lit(1)).alias("n_classes"))


def t_closeness_census(
    df: DataFrame,
    qi_cols: list[str | Column],
    sensitive_bin: str | Column,
    n_bins: int,
) -> DataFrame:
    """t-closeness (Li et al. 2007) per QI class over an ORDERED binned
    sensitive attribute: t = EMD between the class's bin distribution
    and the table-global one = sum_j |cumsum_j(p - q)| / (m - 1). The
    l-diversity blind spot this closes: a class can span many distinct
    sensitive values that are all clustered at one end of the range —
    diverse in count, revealing in distribution.

    Output: one row per QI class — qi_cols + ``n`` (class size) + ``t``.

    Exactness discipline — the whole EMD stays INTEGER until one final
    division: with N the table size and n the class size,
    ``cum_j(p - q) = (cum_j(cb) * N - cum_j(gb) * n) / (n * N)``, so
    ``t = sum_j |cum_j(cb) * N - cum_j(gb) * n|  /  (n * N * (m-1))``
    has an exact integer numerator (integer cumsums are associative —
    no float-summation-order hazard, the trap a p/q-per-bin float
    formulation walks into) and a single CAST + divide at the end.
    Bound: the products are computed in ``decimal(38, 0)``, not BIGINT
    — at int64 ``n * N * (m-1)`` silently wraps past ~10^9 rows at
    m=10, exactly the scale this engine targets, turning a wrong answer
    into nothing at all. Decimal(38,0) is exact through N ~ 10^18 rows
    (products < 10^38) and costs nothing here: the arithmetic runs over
    the |classes| x n_bins SPINE, never over data rows. Past 10^38
    Spark's decimal overflow NULLs (or raises under ANSI) instead of
    wrapping — loud, not silent.
    Missing bins still carry the running cumsums via a dense bin spine
    (sequence + explode), so classes that skip bins are not
    under-counted.

    Scale: two hash aggregates (class x bin, then class), the global
    distribution broadcast in as n_bins rows, and the windows run over
    the |classes| x n_bins spine — never over data rows.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins={n_bins}: need >= 2 for an EMD")
    qi = _qi(qi_cols)
    sb = (F.col(sensitive_bin) if isinstance(sensitive_bin, str)
          else sensitive_bin).alias("__bin")
    # contract: only rows whose bin lands in [0, n_bins) enter the
    # census — a NULL or out-of-range bin would be counted in the class
    # size but never matched by the dense spine, silently corrupting t
    # (it can exceed the valid [0, 1] range). Callers clamp or bin
    # accordingly; rows outside the contract are excluded from BOTH the
    # class and the global distribution, keeping the EMD well-defined.
    base = df.select(*qi, sb).filter(
        F.col("__bin").isNotNull()
        & (F.col("__bin") >= 0)
        & (F.col("__bin") < n_bins)
    )
    qi_names = base.columns[:-1]

    cls_bin = base.groupBy(*qi_names, "__bin").agg(
        F.count(F.lit(1)).alias("__cb")
    )
    cls = cls_bin.groupBy(*qi_names).agg(F.sum("__cb").alias("__n"))
    glob_bin = base.groupBy("__bin").agg(F.count(F.lit(1)).alias("__gb"))
    # table size N rides along IN-PLAN as a broadcast 1-row cross join
    # (no eager count at construction time, and no second scan: it
    # derives from the bin distribution already being aggregated)
    tot = glob_bin.agg(F.sum("__gb").alias("__nt"))

    # dense bin spine per class so absent bins still carry the cumsums
    spine = cls.select(
        *qi_names, "__n",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("__bin"),
    )
    from pyspark.sql import Window

    # all three frames derive from the same base, so DataFrame[col]
    # references collapse to ambiguous lineage after the joins — use
    # string aliases and qualified names throughout
    sp, cb, gb = spine.alias("sp"), cls_bin.alias("cb"), glob_bin.alias("gb")
    wb = (
        Window.partitionBy(*[F.col(f"sp.{q}") for q in qi_names])
        .orderBy(F.col("sp.__bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # null-safe QI equality: a NULL-valued QI class must match its own
    # bin counts (SQL GROUP BY semantics, like the other censuses)
    jc = F.col("sp.__bin") == F.col("cb.__bin")
    for q in qi_names:
        jc = jc & F.col(f"sp.{q}").eqNullSafe(F.col(f"cb.{q}"))
    cums = (
        sp.join(cb, jc, "left")
        .join(F.broadcast(gb), F.col("sp.__bin") == F.col("gb.__bin"),
              "left")
        .crossJoin(F.broadcast(tot))
        .select(
            *[F.col(f"sp.{q}").alias(q) for q in qi_names],
            F.col("sp.__n").alias("__n"), F.col("sp.__bin").alias("__bin"),
            F.col("__nt"),
            F.sum(F.coalesce(F.col("cb.__cb"), F.lit(0))).over(wb)
            .alias("__ccb"),
            F.sum(F.coalesce(F.col("gb.__gb"), F.lit(0))).over(wb)
            .alias("__cgb"),
        )
    )
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("__ccb").cast(dec) * F.col("__nt").cast(dec)
        - F.col("__cgb").cast(dec) * F.col("__n").cast(dec)
    )
    return (
        cums.select(*qi_names, "__n", "__nt", num.alias("__num"))
        .groupBy(*qi_names, "__n", "__nt")
        .agg(F.sum("__num").alias("__s"))
        .select(
            *qi_names,
            F.col("__n").alias("n"),
            (
                F.col("__s").cast("double")
                / (
                    F.col("__n").cast(dec)
                    * F.col("__nt").cast(dec)
                    * F.lit(n_bins - 1).cast(dec)
                ).cast("double")
            ).alias("t"),
        )
    )


def generalization_ladder_census(
    df: DataFrame,
    ladder: list[list[str | Column]],
    k: int,
) -> DataFrame:
    """The OTHER classic k-anonymity enforcement, census'd: instead of
    suppressing small-class rows (lossy in rows), GENERALIZE — recode
    the quasi-identifiers ever coarser (full ZIP -> ZIP3 -> state ->
    drop) until every class reaches k, losing precision instead of
    records. ``ladder`` lists the QI column sets from finest to
    coarsest; global recoding picks ONE level for the whole table.

    Output: one row per ladder level —
    ``level, n_classes, min_class, n_records_below_k, meets_k,
    chosen`` — where ``chosen`` marks the FIRST (finest) level whose
    minimum class size reaches k: the level a release would use, with
    every finer level's residual risk quantified beside it.

    Scale: one hash aggregate per ladder level over the same scan
    (levels are few and fixed), each collapsing to |classes| rows
    map-side; the level summaries are single rows, and the cross-level
    ``chosen`` window runs over len(ladder) rows. NULL QI values form
    their own class, exactly like the sibling censuses.
    """
    if k < 1:
        raise ValueError(f"k={k}: need k >= 1")
    if not ladder:
        raise ValueError("need at least one ladder level")
    from pyspark.sql import Window

    summaries = None
    for lvl, qi_cols in enumerate(ladder):
        classes = df.groupBy(*_qi(qi_cols)).agg(
            F.count(F.lit(1)).alias("__cs")
        )
        s = classes.agg(
            F.lit(lvl).alias("level"),
            F.count(F.lit(1)).alias("n_classes"),
            F.min("__cs").alias("min_class"),
            F.sum(F.when(F.col("__cs") < k, F.col("__cs")).otherwise(0))
            .alias("n_records_below_k"),
        )
        summaries = s if summaries is None else summaries.unionByName(s)
    meets = F.col("min_class") >= k
    w = (
        Window.orderBy("level")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    earlier_ok = F.coalesce(
        F.sum(meets.cast("int")).over(w), F.lit(0)
    )
    return summaries.select(
        "level", "n_classes", "min_class", "n_records_below_k",
        meets.alias("meets_k"),
        (meets & (earlier_ok == 0)).alias("chosen"),
    )


def suppress_small_classes(
    df: DataFrame, qi_cols: list[str | Column], k: int
) -> DataFrame:
    """Drop every row whose QI equivalence class holds fewer than ``k``
    rows — the suppression step that makes the remainder k-anonymous by
    construction. Returns ``df``'s rows (original schema) restricted to
    classes of size >= k.

    Join-back, not a window: see the module docstring. The kept-class
    set is aggregated (one row per surviving class), so the join's
    build side is bounded by the number of DISTINCT surviving QI
    combinations regardless of row count; AQE converts to broadcast
    when that set is small and skew-splits a whale class when it is
    not. NULL-valued QI rows group into their own class (SQL GROUP BY
    semantics) but are then dropped by the null-safe-less join ONLY if
    the join keys mismatch — we join with null-safe equality (``<=>``)
    so a NULL class of size >= k survives like any other.
    """
    if k < 1:
        raise ValueError(f"k={k}: need k >= 1")
    # materialize expression QIs once so the census and the join-back
    # key on the identical value (string names pass through untouched)
    tagged, names = df, []
    for i, c in enumerate(qi_cols):
        if isinstance(c, str):
            names.append(c)
        else:
            tmp = f"__qi_{i}"
            tagged = tagged.withColumn(tmp, c)
            names.append(tmp)
    kept = (
        tagged.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= k)
        .select(*[F.col(n).alias(f"__kept_{i}") for i, n in enumerate(names)])
    )
    cond = None
    for i, n in enumerate(names):
        c = tagged[n].eqNullSafe(kept[f"__kept_{i}"])
        cond = c if cond is None else cond & c
    return tagged.join(kept, cond, "left_semi").select(*df.columns)
