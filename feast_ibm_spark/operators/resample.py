"""Per-key time-grid resampling with last-observation-carried-forward
(north-star extension; no reference counterpart).

The "regular feature snapshot" operation: given an irregular event
stream, produce each key's feature value at every step of a fixed time
grid — the value as of that instant (latest observation at or before
it), NULL before the key's first observation. This is the batch
formulation of what a feature platform materializes on a schedule, and
the dense-grid twin of the PIT join (spine = key x grid instead of a
user-supplied entity frame).

Physical shape — the same melt trick as the PIT ``union_window``
strategy: grid rows and observation rows are UNIONed, sorted within one
key partitioning, and values are carried forward with
``last(ignorenulls)`` over a running window; grid rows are then kept.
ONE shuffle on the key, no range join, no per-grid-point probe. At
100 TB the grid side is synthesized (``sequence`` + ``explode`` from the
distinct-key list — no data movement), and the single key-partitioned
window is the whole cost; a key's total history bounds its partition,
the same constraint (and the same time-bucket salting remedy) as the
melt PIT strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _is_ntz(df: DataFrame, ts_col: str) -> bool:
    return isinstance(df.schema[ts_col].dataType, TimestampNTZType)


def _bound(x, ntz: bool):
    """String grid bound → literal of the ts column's OWN type. An NTZ
    grid must be built from NTZ literals: ``lit(s).cast('timestamp')``
    binds the SESSION zone, and unioning a TIMESTAMP grid under an NTZ
    observation column coerces the observations through the session zone
    — non-monotone across DST gaps (the round-7 bug class; a New_York
    session silently collapsed the 02:00-03:00 grid hour and misfiled
    the carried values)."""
    if isinstance(x, str):
        return F.to_timestamp_ntz(F.lit(x)) if ntz else F.lit(x).cast("timestamp")
    return x


def _us_expr(col_name: str, ntz: bool) -> str:
    """SQL fragment: exact integer microseconds for interpolation
    weights. TIMESTAMP → instant micros (``unix_micros``). NTZ → the
    zone-free wall-clock linearization (days*86400 + h*3600 + m*60 in
    seconds, plus the DECIMAL(8,6) fractional second scaled exactly) —
    ``unix_micros`` on NTZ routes through the session zone and is
    non-monotone across DST gaps."""
    if not ntz:
        return f"unix_micros({col_name})"
    return (
        f"((cast(unix_date(to_date({col_name})) AS bigint) * 86400"
        f" + hour({col_name}) * 3600 + minute({col_name}) * 60) * 1000000"
        f" + cast(date_part('SECOND', {col_name}) * 1000000 AS bigint))"
    )


def resample_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    start: str | Column,
    end: str | Column,
    step_seconds: int,
    grid_col: str = "grid_ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Resample ``value_cols`` onto a regular ``step_seconds`` grid over
    ``[start, end]`` per key, carrying the latest observation forward.

    An observation exactly AT a grid instant is visible to it
    (inclusive, matching PIT-join ``<=`` semantics). Keys appear for the
    full grid; instants before a key's first observation carry NULLs.
    Observations sharing one timestamp are deduplicated first (latest by
    ``tiebreak_cols`` wins) so the carried value is deterministic.

    TIMESTAMP_NTZ ``ts_col`` is fully supported zone-free: string bounds
    become NTZ literals and the grid is NTZ, so the melt never coerces
    wall clocks through the session zone (see ``_bound``). Column bounds
    must match the ts column's type.
    """
    ntz = _is_ntz(df, ts_col)
    start_c = _bound(start, ntz)
    end_c = _bound(end, ntz)

    obs = df.select(*key_cols, ts_col, *value_cols)
    if tiebreak_cols:
        w_tie = Window.partitionBy(*key_cols, ts_col).orderBy(
            *[F.col(c).desc() for c in tiebreak_cols]
        )
        obs = (
            df.select(*key_cols, ts_col, *value_cols, *tiebreak_cols)
            .withColumn("__tie", F.row_number().over(w_tie))
            .filter(F.col("__tie") == 1)
            .select(*key_cols, ts_col, *value_cols)
        )

    # synthesized grid: distinct keys x sequence(start, end, step) — the
    # only shuffle in the whole plan is the distinct + final window
    grid = (
        obs.select(*key_cols)
        .distinct()
        .withColumn(
            grid_col,
            F.explode(
                F.sequence(
                    start_c, end_c, F.expr(f"INTERVAL {step_seconds} SECONDS")
                )
            ),
        )
    )
    # melt: observations sort BEFORE the grid row at an equal timestamp
    # (is_grid tiebreak), so an observation at the instant is included
    obs_tagged = obs.select(
        *key_cols,
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__is_grid"),
        F.lit(None).cast(df.schema[ts_col].dataType).alias(grid_col),
        *value_cols,
    )
    grid_tagged = grid.select(
        *key_cols,
        F.col(grid_col).alias("__t"),
        F.lit(1).alias("__is_grid"),
        F.col(grid_col),
        *[F.lit(None).cast(obs.schema[c].dataType).alias(c) for c in value_cols],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t").asc(), F.col("__is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = obs_tagged.unionByName(grid_tagged).select(
        *key_cols,
        F.col(grid_col),
        F.col("__is_grid"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return carried.filter(F.col("__is_grid") == 1).drop("__is_grid")


def resample_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    start: str | Column,
    end: str | Column,
    step_seconds: int,
    grid_col: str = "grid_ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Linear-interpolation twin of :func:`resample_locf`: each grid
    instant gets the value interpolated between the key's surrounding
    observations instead of the carried-forward one.

    ``value_col`` must be an INTEGER column (callers scale money to
    cents first): the interpolation weight is computed in exact integer
    microseconds with truncating division —

        v = v0 + sign(v1-v0) * (|v1-v0| * (g-t0)) div (t1-t0)

    — the numerator is kept non-negative so truncation and floor agree
    and any SQL engine reproduces the value bit-exactly (the formula is
    safe while |v1-v0| * gap_us < 2^63; cents x month-scale gaps sit
    orders of magnitude under that). Instants outside [first obs, last
    obs] are NULL (no extrapolation); an observation exactly AT a grid
    instant returns that observation.

    Same melt shape as LOCF, run twice: one ascending window carries the
    previous observation's (ts, value) forward, one descending window
    carries the next observation's backward — still ONE shuffle on the
    key partitioning (the two window sorts share it), no range join.

    TIMESTAMP_NTZ ``ts_col`` interpolates over the zone-free wall-clock
    linearization (``_us_expr``) — ``unix_micros`` on NTZ would bind the
    session zone and distort every weight spanning a DST transition.
    """
    ntz = _is_ntz(df, ts_col)
    start_c = _bound(start, ntz)
    end_c = _bound(end, ntz)

    obs = df.select(*key_cols, ts_col, value_col)
    if tiebreak_cols:
        w_tie = Window.partitionBy(*key_cols, ts_col).orderBy(
            *[F.col(c).desc() for c in tiebreak_cols]
        )
        obs = (
            df.select(*key_cols, ts_col, value_col, *tiebreak_cols)
            .withColumn("__tie", F.row_number().over(w_tie))
            .filter(F.col("__tie") == 1)
            .select(*key_cols, ts_col, value_col)
        )

    grid = (
        obs.select(*key_cols)
        .distinct()
        .withColumn(
            grid_col,
            F.explode(
                F.sequence(
                    start_c, end_c, F.expr(f"INTERVAL {step_seconds} SECONDS")
                )
            ),
        )
    )
    obs_tagged = obs.select(
        *key_cols,
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__is_grid"),
        F.lit(None).cast(df.schema[ts_col].dataType).alias(grid_col),
        F.col(value_col).alias("__v"),
    )
    grid_tagged = grid.select(
        *key_cols,
        F.col(grid_col).alias("__t"),
        F.lit(1).alias("__is_grid"),
        F.col(grid_col),
        F.lit(None).cast(obs.schema[value_col].dataType).alias("__v"),
    )
    melted = obs_tagged.unionByName(grid_tagged)
    # ascending: observation at an equal instant sorts FIRST (visible to
    # the grid row); descending: it also sorts first, so it is likewise
    # visible as the "next" observation — both windows see it
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t").asc(), F.col("__is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t").desc(), F.col("__is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_v = F.when(F.col("__is_grid") == 0, F.col("__v"))
    obs_t = F.when(F.col("__is_grid") == 0, F.col("__t"))
    surrounded = melted.select(
        *key_cols,
        F.col(grid_col),
        F.col("__is_grid"),
        F.last(obs_v, ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(obs_t, ignorenulls=True).over(w_prev).alias("__pt"),
        F.last(obs_v, ignorenulls=True).over(w_next).alias("__nv"),
        F.last(obs_t, ignorenulls=True).over(w_next).alias("__nt"),
    )
    g_us, p_us, n_us = (
        _us_expr(grid_col, ntz), _us_expr("__pt", ntz), _us_expr("__nt", ntz)
    )
    d_us = F.expr(f"{n_us} - {p_us}")
    dv = F.col("__nv") - F.col("__pv")
    # sign-safe truncating division: the numerator is always
    # non-negative, so `div` (truncation) and `//` (floor) agree and the
    # oracle reproduces the value bit-exactly
    interp = (
        F.when(F.col("__pv").isNull() | F.col("__nv").isNull(), F.lit(None))
        .when(d_us == 0, F.col("__pv"))
        .when(dv >= 0, F.col("__pv") + F.expr(
            f"((__nv - __pv) * ({g_us} - {p_us}))"
            f" div ({n_us} - {p_us})"))
        .otherwise(F.col("__pv") - F.expr(
            f"((__pv - __nv) * ({g_us} - {p_us}))"
            f" div ({n_us} - {p_us})"))
    )
    return (
        surrounded.filter(F.col("__is_grid") == 1)
        .select(*key_cols, F.col(grid_col), interp.alias(value_col))
    )
