"""Incremental aggregate maintenance (additive materialized views).

Completes the engine's incremental-refresh story: ``store.materialize``
maintains latest-per-key SNAPSHOTS; this module maintains ADDITIVE
AGGREGATE tables (count / sum / min / max per key) so a daily refresh
touches one day of facts plus key-cardinality-sized state — never the
fact history. This is the classic mergeable-state IVM pattern: the
stored aggregate rows ARE partial-aggregate state, so a refresh is

    new_state = (old_state UNION slice_partials) GROUP BY keys re-merge

— one shuffle over state + slice partials, with the fact scan bounded to
the slice. The shape survives 100 TB because history is never rescanned
and state size is keys, not rows. (AVG derives as sum/n at read time;
non-additive aggregates — exact distinct, percentiles — need sketches
instead and are out of scope here; see agg_approx_event_stats for the
mergeable-sketch tier.)

Exactly-once refreshes under retries (a mini commit protocol, since
plain parquet has no transactions): state lives in versioned
directories ``state__<refresh_id>`` and an append-only ledger orders
the applied ids. A refresh computes the merge from the CURRENT state
(the directory whose id is latest in the ledger), renames the new
version into place, and only THEN appends the ledger entry:

- crash before rename: temp dir is garbage; retry recomputes from the
  old state — no double count;
- crash after rename, before ledger append: the new directory exists
  but is not committed; recovery still resolves the OLD state (latest
  *ledger* id), and the retry overwrites the uncommitted directory —
  no double count;
- crash after ledger append: the refresh is committed; the stale old
  directory is cleaned opportunistically on the next refresh.

Re-applying an already-committed ``refresh_id`` is a no-op (pinned by
the gate query, which deliberately re-applies its second slice).

Metadata I/O (existence probes, the state-directory rename, stale-state
cleanup) routes through :mod:`feast_ibm_spark.sources.fsio`: the rename
step needs an ATOMIC RENAME filesystem — posix local disks and HDFS
qualify; object stores do not, and fsio refuses their schemes rather
than committing unsafely (see the fsio module docstring for the
object-store commit-point alternatives). The data plane (parquet state
and ledger segments) is Spark-native and scheme-agnostic.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fsio import get_fs

_LEDGER = "_refresh_ledger"
_STATE_PREFIX = "state__"


def _ledger_rows(spark: SparkSession, base_path: str) -> list:
    """Ledger rows in commit order. ONLY a missing ledger reads as empty
    — any other failure (permissions, corrupt footer, transient store
    error) PROPAGATES. Swallowing those would make a refresh mistake an
    existing ledger for an empty one, recompute state from just the
    current slice, and silently discard all accumulated history — the
    exact failure the commit protocol exists to prevent."""
    ledger_dir = posixpath.join(base_path, _LEDGER)
    if not get_fs(base_path, spark).exists(ledger_dir):
        return []
    return spark.read.parquet(ledger_dir).orderBy("seq").collect()


def _ledger_ids(spark: SparkSession, base_path: str) -> list[str]:
    """Applied refresh ids in commit order (seq column orders them)."""
    return [r["refresh_id"] for r in _ledger_rows(spark, base_path)]


def _current_state_dir(fs, base_path: str, ids: list[str]) -> str | None:
    for rid in reversed(ids):
        d = posixpath.join(base_path, _STATE_PREFIX + rid)
        if fs.exists(d):
            return d
    return None


def slice_partials(
    facts: DataFrame, key_cols: list[str], cents_col
) -> DataFrame:
    """Partial-aggregate a fact slice into mergeable state rows."""
    return facts.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents_col).alias("sum_cents"),
        F.min(cents_col).alias("min_cents"),
        F.max(cents_col).alias("max_cents"),
    )


def refresh_additive_agg(
    spark: SparkSession,
    base_path: str,
    facts_slice: DataFrame,
    key_cols: list[str],
    cents_col,
    refresh_id: str,
) -> bool:
    """Apply one refresh; returns False (no-op) when ``refresh_id`` is
    already committed. State schema: key_cols + n/sum_cents/min_cents/
    max_cents — all additive-mergeable, all exact integers."""
    if _STATE_PREFIX in refresh_id or "/" in refresh_id:
        raise ValueError(f"invalid refresh_id: {refresh_id!r}")
    get_fs(base_path, spark).makedirs(base_path)
    ledger = _ledger_rows(spark, base_path)
    ids = [r["refresh_id"] for r in ledger]
    if refresh_id in ids:
        return False
    # seq comes from the ledger's own max, not len(ids): ids can shrink
    # only by corruption, and a duplicate seq would make commit order
    # ambiguous on recovery
    next_seq = max((r["seq"] for r in ledger), default=-1) + 1

    parts = slice_partials(facts_slice, key_cols, cents_col)
    cur = _current_state_dir(get_fs(base_path, spark), base_path, ids)
    if cur is not None:
        old = spark.read.parquet(cur)
        merged = (
            old.unionByName(parts)
            .groupBy(*key_cols)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_cents").alias("sum_cents"),
                F.min("min_cents").alias("min_cents"),
                F.max("max_cents").alias("max_cents"),
            )
        )
    else:
        merged = parts

    _commit_state(spark, base_path, refresh_id, merged, ids, next_seq)
    return True


def _commit_state(spark, base_path, refresh_id, merged, ids, next_seq):
    """The shared commit tail of every refresher (see module docstring
    for the crash analysis): write-to-temp, rename into place, THEN
    append the ledger entry (the commit point), then opportunistically
    clean superseded versions."""
    fs = get_fs(base_path, spark)
    new_dir = posixpath.join(base_path, _STATE_PREFIX + refresh_id)
    tmp = new_dir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if fs.exists(new_dir):  # uncommitted leftover from a dead retry
        fs.rmtree(new_dir)
    fs.rename(tmp, new_dir)
    # commit point: the ledger append makes new_dir the current state
    spark.createDataFrame(
        [(next_seq, refresh_id)], "seq bigint, refresh_id string"
    ).write.mode("append").parquet(posixpath.join(base_path, _LEDGER))
    # opportunistic cleanup of superseded state versions
    for rid in ids:
        stale = posixpath.join(base_path, _STATE_PREFIX + rid)
        if fs.exists(stale):
            fs.rmtree(stale)


def read_agg(spark: SparkSession, base_path: str) -> DataFrame:
    """The maintained aggregate, with AVG derived at read time."""
    ids = _ledger_ids(spark, base_path)
    cur = _current_state_dir(get_fs(base_path, spark), base_path, ids)
    if cur is None:
        raise FileNotFoundError(f"no committed state under {base_path}")
    st = spark.read.parquet(cur)
    return st.select(
        *[c for c in st.columns if not c.endswith("_cents") and c != "n"],
        F.col("n"),
        (F.col("sum_cents").cast("double") / 100.0).alias("sum_value"),
        (F.col("min_cents").cast("double") / 100.0).alias("min_value"),
        (F.col("max_cents").cast("double") / 100.0).alias("max_value"),
        (
            F.col("sum_cents").cast("double") / F.col("n") / 100.0
        ).alias("avg_value"),
    )


# -- algebraic (second-moment) IVM ----------------------------------------
# Variance is not additive, but its SUFFICIENT STATISTICS are: (n, sum,
# sum of squares) merge by plain addition, and mean/variance derive at
# read time — the textbook algebraic-aggregate decomposition. Same
# ledgered commit protocol as the additive family.


def slice_moment_partials(
    facts: DataFrame, key_cols: list[str], cents_col
) -> DataFrame:
    return facts.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents_col).alias("sum_cents"),
        F.sum(cents_col * cents_col).alias("sumsq_cents"),
    )


def refresh_moments_agg(
    spark: SparkSession,
    base_path: str,
    facts_slice: DataFrame,
    key_cols: list[str],
    cents_col,
    refresh_id: str,
) -> bool:
    """Second-moment twin of :func:`refresh_additive_agg`: state schema
    key_cols + n/sum_cents/sumsq_cents, all exact integers. int64
    headroom: the variance numerator n*sumsq - sum^2 stays in range up
    to ~5x10^4 rows per key at 50,000-cent values (~1e19 bound) —
    beyond that, promote the state to DECIMAL(38,0), same protocol."""
    if _STATE_PREFIX in refresh_id or "/" in refresh_id:
        raise ValueError(f"invalid refresh_id: {refresh_id!r}")
    get_fs(base_path, spark).makedirs(base_path)
    ledger = _ledger_rows(spark, base_path)
    ids = [r["refresh_id"] for r in ledger]
    if refresh_id in ids:
        return False
    next_seq = max((r["seq"] for r in ledger), default=-1) + 1

    parts = slice_moment_partials(facts_slice, key_cols, cents_col)
    cur = _current_state_dir(get_fs(base_path, spark), base_path, ids)
    if cur is not None:
        merged = (
            spark.read.parquet(cur)
            .unionByName(parts)
            .groupBy(*key_cols)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_cents").alias("sum_cents"),
                F.sum("sumsq_cents").alias("sumsq_cents"),
            )
        )
    else:
        merged = parts
    _commit_state(spark, base_path, refresh_id, merged, ids, next_seq)
    return True


def read_moments(spark: SparkSession, base_path: str) -> DataFrame:
    """Mean and POPULATION variance derived from the maintained
    sufficient statistics: var = (n*sumsq - sum^2) / n^2, computed as
    one exact integer numerator and one double division (then /1e4 for
    cents^2 -> value^2) — bit-identical to any engine evaluating the
    same formula on the same integers."""
    ids = _ledger_ids(spark, base_path)
    cur = _current_state_dir(get_fs(base_path, spark), base_path, ids)
    if cur is None:
        raise FileNotFoundError(f"no committed state under {base_path}")
    st = spark.read.parquet(cur)
    keys = [c for c in st.columns
            if c not in ("n", "sum_cents", "sumsq_cents")]
    var_num = F.col("n") * F.col("sumsq_cents") - (
        F.col("sum_cents") * F.col("sum_cents")
    )
    return st.select(
        *keys,
        F.col("n"),
        (F.col("sum_cents").cast("double") / F.col("n") / 100.0)
        .alias("avg_value"),
        (
            var_num.cast("double")
            / (F.col("n") * F.col("n")).cast("double")
            / 10000.0
        ).alias("var_value"),
    )


def join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance for an INNER-join view J = A |><| B under
    insert-only deltas — the relational-algebra delta expansion

        dJ  =  dA |><| B  u  A |><| dB  u  dA |><| dB

    so the refreshed view is ``old_J UNION ALL join_delta(...)`` and the
    fact history is never rescanned against itself: every term has a
    DELTA on at least one side, so each per-refresh join shuffles (or
    broadcasts) delta-sized data against one base — the property that
    makes a daily refresh of a 100 TB join view cost one day, not the
    cross-history join. The three terms are disjoint from old_J and
    from each other by construction (each row of dJ uses at least one
    delta row, and the terms partition by WHICH sides are delta), so
    plain UNION ALL is exact — no dedup pass.

    Insert-only and INNER-only by contract: deletes/updates need
    tombstone algebra (see streaming/cdc.py for the keyed-snapshot
    alternative), and outer joins violate the disjoint-union identity
    (a base row's NULL-padded result can be RETRACTED by a delta
    match). Deltas are broadcast — they are small by definition; drop
    the hint if a backfill-sized "delta" ever flows through.
    """
    da, db = F.broadcast(delta_a), F.broadcast(delta_b)
    return (
        da.join(base_b, on)
        .unionByName(base_a.join(db, on))
        .unionByName(da.join(delta_b, on))
    )
