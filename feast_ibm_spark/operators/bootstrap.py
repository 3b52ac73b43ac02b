"""Deterministic Poisson bootstrap: confidence intervals for grouped
metrics over massive data, with NO random state (north-star extension;
no reference counterpart — the uncertainty-quantification step behind
eval dashboards and A/B readouts on 100 TB event logs).

The classic bootstrap resamples n rows WITH replacement B times — a
non-starter distributed (each resample is a global shuffle of the whole
input). The POISSON bootstrap (Chamandy et al., "Estimating Uncertainty
for Massive Data Streams", 2012) replaces the multinomial resample with
an independent per-row Poisson(1) weight per replicate: one MAP-SIDE
pass attaches all B weights, per-replicate partial aggregation combines
before the shuffle, and the reduce side sees |groups| x B rows no
matter how big the input. That is the only bootstrap shape that
survives scale.

Determinism: the per-(row, replicate) uniform comes from the same
multiplicative-hash discipline as ``sampling.split_col`` — pure int64
arithmetic (minstd multiplier over the Mersenne prime 2^31-1), so the
weights are a reproducible function of (id, replicate): re-runs,
retries, and the DuckDB oracle all see the identical resample. The
Poisson(1) inverse CDF is applied as SIX INTEGER thresholds over a 10^6
grid (1 - CDF(5) ~ 5.9e-4 mass collapses onto w=6 — a deliberate,
documented truncation of the unbounded tail), so no float ever enters
the weight path. Replicate means divide two exact integer sums; the CI
is the exact interpolated percentile over the B means (the established
Spark percentile() / DuckDB quantile_cont parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 2_147_483_647      # 2^31 - 1 (Mersenne prime; minstd modulus)
_A_ID = 48_271          # minstd multiplier
_A_REP = 69_621         # independent stream per replicate
_GRID = 1_000_000
# floor(1e6 * PoissonCDF(k; lambda=1)) for k = 0..5; w=6 above
_POISSON_CDF_GRID = [367879, 735758, 919698, 981011, 996340, 999405]


def poisson_weight_col(id_col: str | Column, rep_col: str | Column) -> Column:
    """Deterministic Poisson(1) weight for (id, replicate) — pure int64
    expression, identical in any engine that can multiply and mod.
    ``pmod`` (not ``%``, which keeps the dividend's sign) keeps the
    uniform on the [0, grid) range for NEGATIVE ids too — with plain
    ``%`` a negative id would land in (-grid, 0) and the threshold
    chain would silently map every such row to w=0, excluding it from
    most resamples. An engine twin in plain SQL must spell it
    ``((x % p) + p) % p``."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    r = F.col(rep_col) if isinstance(rep_col, str) else rep_col
    u = F.pmod(
        F.pmod(i.cast("bigint"), F.lit(_P)) * _A_ID
        + r.cast("bigint") * _A_REP,
        F.lit(_P),
    ) % _GRID
    w = F.lit(6)
    for k in range(len(_POISSON_CDF_GRID) - 1, -1, -1):
        w = F.when(u < _POISSON_CDF_GRID[k], F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    n_replicates: int = 40,
    ci: float = 0.95,
) -> DataFrame:
    """Per-group mean of integer ``value_col`` with a Poisson-bootstrap
    percentile CI. Output: group_cols + ``mean_est`` (full-sample mean),
    ``ci_lo``, ``ci_mid``, ``ci_hi`` — all exact-arithmetic doubles.

    Plan shape: explode(sequence(B)) is map-side row replication of only
    (group, id, value); the per-(group, replicate) aggregate combines
    map-side; the percentile aggregate sees B rows per group. No window,
    no second scan — input bytes are read once.

    Edge semantics: a (group, replicate) whose Poisson weights sum to
    zero is DROPPED from that group's CI sample (the classic
    zero-resample convention — and a division there would raise under
    ANSI mode; near-certain for singleton groups, P(w=0) ~ 0.368 per
    replicate). NULL group-key values form their own group like SQL
    GROUP BY — the final join is null-safe. NULL ``value_col`` rows are
    EXCLUDED up front (``avg()`` semantics: they contribute to neither
    the numerator nor the denominator of any mean — without the filter
    they would dilute ``mean_est`` and carry weights into ``__wn``
    while their products vanish from ``__ws``).
    """
    if not 1 <= n_replicates <= 10_000:
        raise ValueError(f"n_replicates={n_replicates}")
    if not 0.0 < ci < 1.0:
        raise ValueError(f"ci={ci}")
    df = df.filter(F.col(value_col).isNotNull())
    alpha = (1.0 - ci) / 2.0
    # Embed SHORT-DECIMAL quantile literals: (1.0-0.95)/2.0 is the double
    # 0.025000000000000022, and f-stringing THAT gives Spark a rank of
    # 1.0000000000000009 at B=41 (interpolation, 1-ulp hazard) while an
    # oracle writing the literal 0.025 gets rank exactly 1 (selection).
    # round(., 12) collapses the arithmetic residue so both engines parse
    # the same "0.025" / "0.975" and see bit-identical integer ranks.
    lo_lit = repr(round(alpha, 12))
    hi_lit = repr(round(1.0 - alpha, 12))
    b = F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__b")
    w = poisson_weight_col(id_col, "__b")
    rep_means = (
        df.select(*group_cols, id_col, F.col(value_col).alias("__v"), b)
        .withColumn("__w", w)
        .groupBy(*group_cols, "__b")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__ws"),
            F.sum("__w").alias("__wn"),
        )
        .filter(F.col("__wn") > 0)  # zero-resample convention (docstring)
        .select(
            *group_cols,
            (F.col("__ws").cast("double") / F.col("__wn")).alias("__m"),
        )
    )
    full = df.groupBy(*group_cols).agg(
        (F.sum(value_col).cast("double") / F.count(F.lit(1)))
        .alias("mean_est")
    )
    pct = rep_means.groupBy(*group_cols).agg(
        F.expr(
            f"percentile(__m, array({lo_lit}, 0.5, {hi_lit}))"
        ).alias("__p")
    ).select(
        *group_cols,
        F.col("__p")[0].alias("ci_lo"),
        F.col("__p")[1].alias("ci_mid"),
        F.col("__p")[2].alias("ci_hi"),
    )
    cond = None
    for g in group_cols:
        c = full[g].eqNullSafe(pct[g])
        cond = c if cond is None else cond & c
    return full.join(pct, cond).select(
        *[full[g] for g in group_cols], "mean_est", "ci_lo", "ci_mid",
        "ci_hi",
    )
