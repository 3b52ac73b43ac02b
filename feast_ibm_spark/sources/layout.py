"""Multi-dimensional write layout: Z-order clustering for data skipping.

Parquet row-group/file pruning works off per-column min/max statistics, so
a table sorted by ONE column skips scans only for predicates on that
column. Z-ordering interleaves the bits of several columns into one sort
key, so rows close in the multi-dimensional space land in the same files —
min/max envelopes become tight on EVERY z-ordered column at once, and a
conjunctive predicate over any subset of them prunes most files. This is
the standard physical-design lever for 100 TB feature tables queried by
(entity, time) or (entity, value-range) at once; the one-time sort cost is
paid at write, reads pay nothing (the layout is plain parquet).

Everything here is pure Catalyst expressions: the z-value is a static
shift/and/or tree (bits * n_cols terms) inside whole-stage codegen, and
the write is ``repartitionByRange`` (range-partitioned shuffle on the
z-value, which also load-balances output files) + ``sortWithinPartitions``.

No reference counterpart (the reference delegates physical layout to its
cloud warehouse); effect pinned by tests/test_plans.py::test_zorder_*.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_col(c: str | Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into the integer grid [0, 2^bits) by linear
    scaling of the known [lo, hi] value range (clamped)."""
    col = F.col(c) if isinstance(c, str) else c
    top = (1 << bits) - 1
    scaled = (col.cast("double") - lo) / (hi - lo) * top
    return F.least(
        F.lit(top), F.greatest(F.lit(0), F.round(scaled).cast("bigint"))
    )


def zvalue_col(cols: list[str | Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the given non-negative integer
    columns (Morton code). ``bits * len(cols)`` must be <= 63.

    .. warning:: Quantize every column to the SAME effective bit width
       (``quantize_col`` with ``bits`` matching this function's) before
       interleaving. If one column only populates its low bits (e.g. an
       id in [0, 150) against a 16-bit grid), the other columns' high
       bits dominate the sort and the narrow column stops clustering —
       measured: a 150-key column interleaved at 16 bits got ZERO file
       pruning until re-quantized to 8 bits."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed int64")
    terms = []
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for j in range(bits):
            # bit j of column i -> bit j*n + i of the z-value
            terms.append(
                F.shiftleft(F.shiftrightunsigned(col, j) % 2, j * n + i)
            )
    return functools.reduce(operator.add, terms).alias("zvalue")


def compact(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
    sort_within: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_rows_per_file`` files.

    Incremental writers (e.g. repeated ``store.materialize`` appends)
    accumulate small files; at scale that murders scan planning (one task
    per tiny file) and footer overhead. Compaction is one job: count,
    coalesce-or-repartition to ``ceil(rows/target)`` files (repartition —
    a real shuffle — only when growing the file count or re-sorting;
    coalesce is shuffle-free when shrinking), optional sort for
    row-group-stat locality, and an atomic directory swap via a temp
    sibling. Returns the new file count.
    """
    import math
    import os
    import shutil

    from .reader import read_parquet

    df = read_parquet(spark, path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    if sort_within:
        out = df.repartitionByRange(n_files, *sort_within).sortWithinPartitions(
            *sort_within
        )
    else:
        cur = df.rdd.getNumPartitions()
        out = df.coalesce(n_files) if n_files <= cur else df.repartition(n_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str | Column],
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``zcols``.

    ``zcols`` entries are either integer column names or pre-quantized
    expressions (see :func:`quantize_col` for continuous columns). The
    range partitioner samples the z-value distribution, so output files
    are balanced even when the key space is sparse."""
    z = zvalue_col(zcols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


# 2-D Hilbert state machine, derived offline from the canonical
# rotate/reflect formulation (Wikipedia xy2d; verified exhaustively equal
# through bits=5 and on random points at bits=8 — the derivation script is
# inlined in tests/test_plans.py::test_hilbert_curve_is_bit_exact_and_
# continuous). A state encodes the accumulated dihedral transform as
# (axis-swap, negate-x, negate-y): state = sel_x<<2 | neg_x<<1 | neg_y.
# Row index = state*4 + bit_x*2 + bit_y; _HILBERT_D is the 2-bit output
# digit, _HILBERT_S the successor state.
_HILBERT_D = [0, 1, 3, 2, 1, 0, 2, 3, 3, 2, 0, 1, 2, 3, 1, 0,
              0, 3, 1, 2, 1, 2, 0, 3, 3, 0, 2, 1, 2, 1, 3, 0]
_HILBERT_S = [4, 0, 7, 0, 1, 6, 1, 5, 6, 2, 5, 2, 3, 4, 3, 7,
              0, 3, 4, 4, 5, 5, 2, 1, 2, 1, 6, 6, 7, 7, 0, 3]


def _compose_hilbert_tables(width: int) -> tuple[list[int], list[int]]:
    """Run ``width`` rounds of the 1-bit state machine for every
    (state, x-nibble, y-nibble) combination, yielding composite lookup
    tables that consume ``width`` bits of each coordinate per fold round
    (round 12: 8 rounds -> 2 at bits=8; the per-round state chain
    re-embeds quadratically, so fewer rounds shrink both the tree and
    the per-row work ~4x — measured 1.0-1.5 s -> ~0.25 s for the sf0.1
    hvalue projection). Index layout:
    ``state * 4^width + xbits * 2^width + ybits``."""
    d_tab, s_tab = [], []
    for state in range(8):
        for xb in range(1 << width):
            for yb in range(1 << width):
                st, dd = state, 0
                for k in range(width - 1, -1, -1):
                    idx = st * 4 + ((xb >> k) & 1) * 2 + ((yb >> k) & 1)
                    dd = dd * 4 + _HILBERT_D[idx]
                    st = _HILBERT_S[idx]
                d_tab.append(dd)
                s_tab.append(st)
    return d_tab, s_tab


_H_STEP = 4  # coordinate bits consumed per fold round
_H_TABLES = {w: _compose_hilbert_tables(w) for w in range(1, _H_STEP + 1)}


def hvalue_col(x: str | Column, y: str | Column, bits: int = 8) -> Column:
    """2-D Hilbert-curve index of two non-negative integer columns on the
    ``2^bits x 2^bits`` grid, as a pure Catalyst expression.

    Why offer Hilbert next to :func:`zvalue_col`: both map a 2-D box onto
    contiguous curve ranges, but the Morton curve takes power-of-two jumps
    across the space at every quadrant boundary, so a contiguous file of
    z-values can span a diluted min/max envelope. The Hilbert curve is
    CONTINUOUS — consecutive indices are always Manhattan-distance 1
    apart (pinned by ``tests/test_plans.py::test_hilbert_curve_is_bit_
    exact_and_continuous``) — so equal-size curve segments have tighter
    bounding boxes and file-stat pruning overlaps fewer files for the
    same predicate (measured side by side in the layout plan test).
    Delta OPTIMIZE and Iceberg's sort-order rewrite use the same curve
    for the same reason.

    Built as a per-bit STATE-MACHINE fold over array-literal lookup
    tables (``element_at``), not the textbook rotate-the-coordinates
    recurrence: rewriting the (x, y) expressions each round multiplies
    the Catalyst tree ~4x per bit (measured: analysis-time OOM at
    bits=8), while the LUT fold references the carried state column once
    per round, so the tree grows O(bits^2) (the state chain re-embeds
    per digit) instead of O(4^bits). Verified bit-exact and fast through
    bits=16 (65k buckets/axis — orders beyond file-granularity need);
    above that, whole-stage codegen's subexpression-elimination pass
    itself blows up on the re-embedded state chains (measured: codegen
    OOM at bits=31), so the guard stops at 16. Quantize continuous
    columns with :func:`quantize_col` at the SAME width first — the
    zvalue_col width warning applies unchanged.

    .. warning:: Input contract: both columns must lie in
       ``[0, 2^bits)``. The fold reads only the low ``bits`` bits, so a
       value of ``2^bits`` silently WRAPS onto 0 — the curve value (and
       any content round-trip) stays well-defined, but rows far apart on
       the real axis cluster together and the locality benefit silently
       degrades. Quantize raw ids with :func:`quantize_col` (lo=0,
       hi=max_id) rather than passing them through; the same wrap
       applies to :func:`zvalue_col`.
    """
    if not 1 <= bits <= 16:
        raise ValueError(f"bits={bits}: need 1 <= bits <= 16 — finer "
                         "grids don't improve file-level min/max stats "
                         "and the re-embedded state chain breaks codegen "
                         "past 16 (measured OOM at 31)")
    cx = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    cy = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    state = F.lit(0)
    d = F.lit(0).cast("bigint")
    rem = bits
    while rem > 0:
        w = min(_H_STEP, rem)
        rem -= w
        d_tab, s_tab = _H_TABLES[w]
        # ONE JVM-side parse per table: building a 2048-element array
        # from per-element F.lit() Columns costs thousands of py4j
        # round-trips per invocation (measured: the composite tables
        # went 4x SLOWER than the 1-bit machine from construction alone)
        d_arr = F.expr(f"array({','.join(map(str, d_tab))})")
        s_arr = F.expr(f"array({','.join(map(str, s_tab))})")
        bx = F.shiftrightunsigned(cx, rem).bitwiseAND(F.lit((1 << w) - 1))
        by = F.shiftrightunsigned(cy, rem).bitwiseAND(F.lit((1 << w) - 1))
        idx = (
            state * (1 << (2 * w)) + bx * (1 << w) + by + 1
        ).cast("int")
        d = d * (1 << (2 * w)) + F.element_at(d_arr, idx).cast("bigint")
        state = F.element_at(s_arr, idx)
    return d.alias("hvalue")


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    x: str | Column,
    y: str | Column,
    bits: int = 8,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the 2-D Hilbert index of
    ``(x, y)`` — same write shape as :func:`write_zordered` (range
    shuffle on the curve value balances files over a sparse key space,
    sort-within tightens row-group stats), different space-filling
    curve. Use for two-column predicate workloads where Morton's
    quadrant jumps measurably dilute the per-file envelopes."""
    h = hvalue_col(x, y, bits)
    (
        df.withColumn("__h", h)
        .repartitionByRange(n_files, F.col("__h"))
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode(mode)
        .parquet(path)
    )


class AuditError(RuntimeError):
    """Raised by a write_audit_publish audit callback to abort publish."""


def write_audit_publish(
    spark,
    df,
    dest: str,
    audit,
) -> str:
    """Write-Audit-Publish: the lakehouse pattern that keeps bad data
    out of the LIVE path entirely. ``df`` is written to a hidden staging
    sibling, ``audit(staged_df)`` runs against the actually-written
    bytes (not the in-memory frame — the read-back is the point: it
    catches writer bugs, truncation, and codec corruption), and only a
    passing audit atomically renames staging over ``dest``. A failing
    audit leaves the previous live data untouched and the staging dir
    in place for inspection.

    At 100 TB the audit is the same order-independent checksum
    reconciliation as table_checksum — one scan of the staged output,
    map-side combinable — and the publish is a metadata-only rename.
    Readers never observe a partial state: they see the old directory
    until the rename, the new one after.
    """
    import os
    import shutil

    from .reader import read_parquet

    staging = dest.rstrip("/") + "__staging"
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging)
    staged = read_parquet(spark, staging)
    try:
        audit(staged)
    except Exception:
        # leave staging for inspection; live data untouched
        raise
    shutil.rmtree(dest, ignore_errors=True)
    os.rename(staging, dest)
    return dest
