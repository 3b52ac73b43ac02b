"""Split from the round-4 queries.py monolith; see queries/__init__.py."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ..streaming.run import hint_stream_source_bytes  # noqa: F401
from .behavioral import CHUNK_OVERLAP, CHUNK_TOKENS  # noqa: F401
from .corpus import (  # noqa: F401
    CURATION_QUALITY_FLOOR,
    DECON_BENCH_IDS,
    DECON_N,
    JACCARD_THRESHOLD,
    NGRAM_N,
    _DUCK_SHINGLES,
    _duck_grams,
)

def q_streaming_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming latest-row-per-key (the feature store's online-refresh
    loop): a streaming max_by aggregation keeps ONE struct of state per
    key however long the stream runs, drained with availableNow in
    complete mode and hash-compared to the batch latest-per-key oracle.
    The winner orders by (ts, event_id) so ties are deterministic.
    Fifth streaming class at the gate."""
    import tempfile
    import uuid

    from ..sources.reader import load_stream
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    stream = load_stream(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", _cents("value").alias("__c")
    )
    winner = F.max_by(
        F.struct("ts", "event_id", "__c"),
        F.struct("ts", "event_id"),
    ).alias("__w")
    agg = stream.groupBy("user_id").agg(winner).select(
        "user_id",
        F.col("__w.ts").alias("ts"),
        F.col("__w.event_id").alias("event_id"),
        F.col("__w.__c").alias("__c"),
    )
    sink = f"stream_latest_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        agg, sink, output_mode="complete",
        checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_"),
    )
    return out.select(
        "user_id", "ts", "event_id",
        (F.col("__c").cast("double") / 100.0).alias("value"),
    )


ORACLE_STREAM_LATEST = """
SELECT user_id, ts, event_id,
       CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) / 100.0 AS value
FROM (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment drained end-to-end (the serving-side
    pattern between materializations): purchase events stream in and
    left-join the STATIC latest-value-per-user snapshot built by the
    batch latest_per_key operator — no streaming state from the join, so
    it runs forever at O(1) state. Oracle: the batch join of the same
    filter against the same latest snapshot. Sixth streaming class."""
    import tempfile
    import uuid

    from ..sources.reader import load_stream, load_table
    from ..streaming.enrich import enrich_stream

    configure_runtime(spark)
    stream = (
        load_stream(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", _cents("value").alias("__c"))
    )
    features = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").alias("fts"), F.col("event_id").alias("fid"),
        _cents("value").alias("latest_cents"),
    )
    # deterministic latest: created column = unique fid breaks ts ties
    enriched = enrich_stream(
        stream, features, ["user_id"], ["latest_cents"], "fts",
        created_timestamp_column="fid",
    )
    from ..streaming.run import drain_available_now

    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        enriched, sink, checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_")
    )
    return out.select(
        "event_id", "user_id", "ts",
        (F.col("__c").cast("double") / 100.0).alias("value"),
        (F.col("latest_cents").cast("double") / 100.0).alias("latest_value"),
    )


ORACLE_STREAM_ENRICH = """
WITH latest AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS latest_cents
  FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       CAST(CAST(round(e.value * 100) AS BIGINT) AS DOUBLE) / 100.0 AS value,
       CAST(l.latest_cents AS DOUBLE) / 100.0 AS latest_value
FROM events e LEFT JOIN latest l USING (user_id)
WHERE e.event_type = 'purchase'
"""


def q_layout_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side physical design at the gate: a Z-order-clustered copy
    of events (Morton-interleaved user_id x value cents) written once to
    tmp, read back, and aggregated — proving the clustered layout is
    content-preserving (the pruning benefit itself is measured in
    test_plans). Same materialize-once pattern as the csv/orc sources."""
    import hashlib
    import os
    import tempfile

    from ..sources.layout import quantize_col, write_zordered
    from ..sources.reader import read_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_zorder_{tag}")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", _cents("value").alias("cents")
        )
        # quantize BOTH axes: interleaving raw user_id at bits=8 reads
        # only its low 8 bits, so ids >= 256 (sf0.1 has 1500) wrap and
        # the key-axis clustering silently degrades. One bounded 1-row
        # scalar (write-once path only) fixes the grid to the id range.
        hi_user = ev.agg(F.max("user_id")).first()[0]
        write_zordered(
            ev, dest,
            [quantize_col(F.col("user_id"), 0, hi_user, 8),
             quantize_col(F.col("cents"), 0, 50000, 8)],
            bits=8, n_files=8,
        )
    back = read_parquet(spark, dest)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


ORACLE_ZORDER_ROUNDTRIP = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(event_id) AS min_event, MAX(event_id) AS max_event
FROM events GROUP BY event_type
"""


def q_layout_hilbert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-clustered sibling of the Z-order round-trip: the same
    events copy clustered by the CONTINUOUS space-filling curve (tighter
    per-file envelopes than Morton — measured 5-vs-8 overlapping files
    on the 2-d box, tests/test_plans.py::test_hilbert_layout_prunes_
    tighter_than_morton), written once to tmp, read back, aggregated —
    pinning that the curve rewrite is content-preserving."""
    import hashlib
    import os
    import tempfile

    from ..sources.layout import quantize_col, write_hilbert_clustered
    from ..sources.reader import read_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_hilbert_{tag}")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", _cents("value").alias("cents")
        )
        # same id-axis quantization as the zorder twin: hvalue_col reads
        # only the low `bits` bits, so raw ids >= 2^bits wrap and the
        # curve locality silently degrades (content stays correct)
        hi_user = ev.agg(F.max("user_id")).first()[0]
        write_hilbert_clustered(
            ev, dest,
            quantize_col(F.col("user_id"), 0, hi_user, 8),
            quantize_col(F.col("cents"), 0, 50000, 8),
            bits=8, n_files=8,
        )
    back = read_parquet(spark, dest)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


# content-preservation oracle: identical to the Z-order one by design —
# both layouts must return exactly the source table's aggregate profile
ORACLE_HILBERT_ROUNDTRIP = ORACLE_ZORDER_ROUNDTRIP


def q_layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join at the gate (sources/bucketed.py's
    first registered query — the plan contract was previously pinned
    only in test_plans): events written ONCE as two catalog tables
    hash-bucketed by user_id — the purchase fact and a per-user profile
    dim — after which BOTH the per-user fact aggregate and the fact-dim
    merge join reuse the persisted bucketing, zero Exchange anywhere in
    the plan (tests/test_plans.py::test_bucketed_join_query_plan_is_
    shuffle_free). This is the pay-the-shuffle-once-at-write lever a
    100 TB feature store runs on; the oracle recomputes the same join
    from the raw table, pinning that the bucketed path is
    content-preserving. Tables rebuild per session (the in-memory
    catalog forgets them; the parquet files just get overwritten)."""
    import hashlib

    from ..sources.bucketed import write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fact, dim = f"fis_bk_purchases_{tag}", f"fis_bk_users_{tag}"
    cat = spark.catalog
    if not (cat.tableExists(fact) and cat.tableExists(dim)):
        # the in-memory catalog forgets tables between sessions but the
        # warehouse DIRECTORY persists; an unregistered leftover dir
        # makes saveAsTable raise LOCATION_ALREADY_EXISTS — it is ours
        # (these names are query-private), so clear it before rewriting
        import os
        import shutil

        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for t in (fact, dim):
            if not cat.tableExists(t):
                shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type",
            _cents("value").alias("cents"), "ts",
        )
        write_bucketed(
            ev.filter(F.col("event_type") == "purchase").drop("ts"),
            fact, ["user_id"], 8, sort_cols=["user_id"],
        )
        prof = ev.groupBy("user_id").agg(
            F.min("ts").alias("first_seen"),
            F.count(F.lit(1)).alias("n_events"),
        )
        write_bucketed(prof, dim, ["user_id"], 8, sort_cols=["user_id"])
    agg = spark.table(fact).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("sum_cents"),
    )
    return agg.join(spark.table(dim).hint("merge"), "user_id").select(
        "user_id", "n_purchases", "sum_cents", "n_events", "first_seen"
    )


SNAPSHOT_SPLIT = "2024-01-15 00:00:00"


def _chain_needs_build(dest: str, expected: int) -> bool:
    """Build-once guard for the shared snapshot chains the gate queries
    read. A COMPLETE chain (>= expected versions) is reused across runs;
    a PARTIAL one (a crash mid-build) is wiped and rebuilt from scratch
    — resuming by appending would duplicate slices and fail the gate
    hash on every later run until manually cleared (ADVICE r11)."""
    import shutil

    from ..sources.snapshots import snapshot_versions

    n = len(snapshot_versions(dest))
    if n >= expected:
        return False
    if n > 0:
        shutil.rmtree(dest, ignore_errors=True)
    return True



def q_layout_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-snapshot time travel (sources/snapshots.py — the
    Iceberg/Delta core reduced to numbered manifests over immutable
    segments): events are committed as TWO versions — v1 holds the
    pre-split rows, v2 appends the rest — and the query reads BOTH
    versions back (v1 via explicit time travel, v2 as latest),
    aggregating each. Pins the two load-bearing properties at once:
    time travel reproduces the pre-append table exactly (v1's aggregate
    matches the raw table filtered to the same split), and the append
    is lossless (v2 matches the unfiltered table). The oracle computes
    both version profiles straight from the raw table. Manifest rename
    is the commit point — a reader never sees a half-appended version;
    built once per sf tag, versions immutable thereafter."""
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import (
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_snap_{tag}")
    if _chain_needs_build(dest, 2):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "event_type", _cents("value").alias("cents"), "ts"
        )
        split = F.lit(SNAPSHOT_SPLIT).cast("timestamp")
        write_snapshot(ev.filter(F.col("ts") < split), dest)
        write_snapshot(ev.filter(F.col("ts") >= split), dest)

    def prof(v: int) -> DataFrame:
        return (
            read_snapshot(spark, dest, version=v)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(F.lit(v).alias("version"), "event_type",
                    "n_events", "sum_cents")
        )

    return prof(1).unionByName(prof(2))


ORACLE_SNAPSHOT_TIME_TRAVEL = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, ts
  FROM events
)
SELECT CAST(1 AS INT) AS version, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM c WHERE ts < TIMESTAMP '{SNAPSHOT_SPLIT}' GROUP BY event_type
UNION ALL
SELECT CAST(2 AS INT), event_type,
       CAST(count(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM c GROUP BY event_type
"""


# CDF chain splits (v1 < S1, v2 in [S1, S2), v3 >= S2) and the merge /
# zone-map probe constants, shared by the Spark queries and their oracles
SNAPSHOT_CDF_SPLIT1 = "2024-01-10 00:00:00"
SNAPSHOT_CDF_SPLIT2 = "2024-01-20 00:00:00"
MERGE_DELETE_MOD = 7
SKIP_LO, SKIP_HI = 10, 59


def q_layout_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed over the manifest-snapshot format
    (sources/snapshots.read_snapshot_changes): a 3-version append chain
    is committed once (events split at day 10 / day 20), then the query
    asks "what changed since version 1" and aggregates the answer per
    introducing commit. The delta between two versions is the SEGMENT
    LIST DIFFERENCE — O(metadata) to compute, and the scan touches only
    the new segments, so incremental consumers pay for the new data,
    never the table (the Delta-CDF idea, append-only case; overwrite
    commits in range are detected and refused). The oracle rebuilds the
    same per-commit profile from the raw table with the split
    predicates."""
    from ..sources.snapshots import read_snapshot_changes

    dest = _cdf_chain(spark, sf_dir)
    return (
        read_snapshot_changes(spark, dest, from_version=1)
        .groupBy("_commit_version", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def _cdf_chain(spark: SparkSession, sf_dir: str) -> str:
    """The shared 3-version append chain (events split at day 10 /
    day 20) the CDF queries read; built once per sf tag."""
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import snapshot_versions, write_snapshot

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_cdf_{tag}")
    if _chain_needs_build(dest, 3):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "event_type", _cents("value").alias("cents"), "ts"
        )
        s1 = F.lit(SNAPSHOT_CDF_SPLIT1).cast("timestamp")
        s2 = F.lit(SNAPSHOT_CDF_SPLIT2).cast("timestamp")
        write_snapshot(ev.filter(F.col("ts") < s1), dest)
        write_snapshot(ev.filter((F.col("ts") >= s1) & (F.col("ts") < s2)),
                       dest)
        write_snapshot(ev.filter(F.col("ts") >= s2), dest)
    return dest


def q_layout_snapshot_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once incremental CONSUMPTION of the change data feed
    (sources/snapshots.consume_snapshot_changes): a fresh consumer
    (cursor 0) drains the 3-version chain — the whole table, tagged per
    introducing commit — acks, and consumes again. The second consume
    MUST be empty: its rows (phase 2) would add rows the oracle does
    not have, failing the row-count and hash checks, so the cursor
    advance is itself under the value-hash gate. The consumer cursor is
    a one-line checkpoint file committed with the same atomic-rename
    discipline as the table's manifests (Kafka-offset semantics on
    table versions: no ack, same delta again — at-least-once delivery,
    exactly-once end-to-end with an idempotent downstream)."""
    import os

    from ..sources.snapshots import (
        ack_snapshot_consume,
        consume_snapshot_changes,
    )

    dest = _cdf_chain(spark, sf_dir)
    consumer = dest + "_consumer"
    # deterministic replay: every run re-enacts the same fresh-consumer
    # cycle (the build guard above makes the chain itself build-once)
    if os.path.exists(consumer):
        os.unlink(consumer)

    def prof(df: DataFrame, phase: int) -> DataFrame:
        return (
            df.groupBy("_commit_version", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                F.lit(phase).cast("bigint").alias("phase"),
                "_commit_version", "event_type", "n_events", "sum_cents",
            )
        )

    v1, first = consume_snapshot_changes(spark, dest, consumer)
    ack_snapshot_consume(consumer, v1)
    _, second = consume_snapshot_changes(spark, dest, consumer)
    return prof(first, 1).unionByName(prof(second, 2))


ORACLE_SNAPSHOT_CHANGES = f"""
SELECT CAST(CASE WHEN ts < TIMESTAMP '{SNAPSHOT_CDF_SPLIT2}'
            THEN 2 ELSE 3 END AS BIGINT) AS _commit_version,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
WHERE ts >= TIMESTAMP '{SNAPSHOT_CDF_SPLIT1}'
GROUP BY 1, 2
"""


def q_layout_snapshot_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end EXACTLY-ONCE incremental pipeline between two
    snapshot tables (sources/snapshots.pipeline_snapshot_changes):
    consume the upstream CDF, aggregate the delta, commit downstream
    keyed by the upstream version, ack last. The query re-enacts the
    full lifecycle every run (fresh upstream/downstream/cursor): commit
    upstream v1 -> cycle -> commit v2 -> cycle -> one EXTRA cycle with
    nothing new (must be a no-op; a spurious downstream commit would
    add rows the oracle lacks), then reads the downstream table back —
    one aggregate row set per upstream commit. The crash windows the
    ordering closes are unit-tested (test_sources.py); here the hash
    pins the happy path plus no-op idempotence."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..sources.snapshots import (
        pipeline_snapshot_changes,
        read_snapshot,
        write_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"fis_pipe_{tag}")
    up, down, cur = base + "_up", base + "_down", base + "_cursor"
    for p in (up, down, cur):
        if os.path.exists(p):
            shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)

    ev = _t(spark, sf_dir, "events").select(
        "event_type", _cents("value").alias("cents"), "ts"
    )
    split = F.lit(SNAPSHOT_SPLIT).cast("timestamp")

    def agg(delta: DataFrame) -> DataFrame:
        return delta.groupBy("_commit_version", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )

    write_snapshot(ev.filter(F.col("ts") < split), up)
    pipeline_snapshot_changes(spark, up, cur, down, agg)
    write_snapshot(ev.filter(F.col("ts") >= split), up)
    pipeline_snapshot_changes(spark, up, cur, down, agg)
    # caught-up cycle: must commit nothing downstream
    pipeline_snapshot_changes(spark, up, cur, down, agg)
    return read_snapshot(spark, down)


def q_layout_snapshot_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ deletes (sources/snapshots.delete_snapshot_keys):
    key tombstones committed as an O(|deletes|) version — suppression
    is immediate at read time (one broadcast anti join against the
    tombstone union) while the table rewrite waits for compaction; the
    GDPR-erasure shape, dual to the copy-on-write MERGE. The chain
    built once per sf tag: v1 = first-half events, v2 = tombstone every
    user_id % 4 == 0, v3 = append the second half — which must NOT
    resurrect tombstoned users (appends carry tombstones forward). The
    query profiles v1 (pre-delete truth), v3 (suppressed view), and a
    v4 compaction (tombstones materialized physically, same content as
    v3 — pinned by sharing its rows' hash); the oracle recomputes all
    three from the raw table."""
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import (
        compact_snapshots,
        delete_snapshot_keys,
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_mor_{tag}")
    if _chain_needs_build(dest, 4):
        ev = _t(spark, sf_dir, "events").select(
            "user_id", "event_type", _cents("value").alias("cents"), "ts"
        )
        split = F.lit(SNAPSHOT_SPLIT).cast("timestamp")
        write_snapshot(ev.filter(F.col("ts") < split), dest)
        delete_snapshot_keys(
            ev.filter(F.col("user_id") % 4 == 0).select("user_id"),
            dest, ["user_id"],
        )
        write_snapshot(ev.filter(F.col("ts") >= split), dest)
        compact_snapshots(spark, dest)

    def prof(v: int) -> DataFrame:
        return (
            read_snapshot(spark, dest, version=v)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(F.lit(v).cast("bigint").alias("version"),
                    "event_type", "n_events", "sum_cents")
        )

    return prof(1).unionByName(prof(3)).unionByName(prof(4))


ORACLE_SNAPSHOT_MOR_DELETE = f"""
WITH c AS (
  SELECT user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents, ts
  FROM events
),
v1 AS (
  SELECT CAST(1 AS BIGINT) AS version, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM c WHERE ts < TIMESTAMP '{SNAPSHOT_SPLIT}' GROUP BY 2
),
suppressed AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM c WHERE user_id % 4 <> 0 GROUP BY 1
)
SELECT * FROM v1
UNION ALL
SELECT CAST(3 AS BIGINT), * FROM suppressed
UNION ALL
SELECT CAST(4 AS BIGINT), * FROM suppressed
"""


ORACLE_SNAPSHOT_PIPELINE = f"""
SELECT CAST(CASE WHEN ts < TIMESTAMP '{SNAPSHOT_SPLIT}'
            THEN 1 ELSE 2 END AS BIGINT) AS _commit_version,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2
"""


# phase-2 rows exist only on a cursor bug (the second consume must be
# empty), so the oracle carries phase-1 rows alone — an extra row fails
# the row-count check before the hash is even compared
ORACLE_SNAPSHOT_CONSUME = f"""
SELECT CAST(1 AS BIGINT) AS phase,
       CAST(CASE WHEN ts < TIMESTAMP '{SNAPSHOT_CDF_SPLIT1}' THEN 1
                 WHEN ts < TIMESTAMP '{SNAPSHOT_CDF_SPLIT2}' THEN 2
                 ELSE 3 END AS BIGINT) AS _commit_version,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2, 3
"""


def q_layout_snapshot_compact_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental consumption ACROSS a certified compaction (round 12,
    VERDICT r11 item 2): the chain is v1 append / v2 append /
    v3 = compact_snapshots (manifest carries the conflict-checked
    ``compaction_of: 2`` certificate) / v4 append. Three consumer
    positions under one value hash: a FRESH consumer (cursor 0) drains
    the whole feed — the compaction contributes NOTHING and every row
    is tagged by its true introducing commit (1, 2, 4 — never 3); a
    LAGGING consumer parked just before the compaction (cursor 2)
    crosses it and receives only v4's rows; a fully-acked consumer
    re-consumes EMPTY (any phase-3 row adds rows the oracle does not
    have, failing row-count before the hash is even compared). This is
    the exact sequence that deadlocked before round 12 — the module
    prescribed compaction for every streaming-sink chain while the CDF
    refused to cross one."""
    import os

    from ..sources.snapshots import (
        ack_snapshot_consume,
        compact_snapshots,
        consume_snapshot_changes,
        write_snapshot,
    )

    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_cc_{tag}")
    if _chain_needs_build(dest, 4):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "event_type", _cents("value").alias("cents"), "ts"
        )
        s1 = F.lit(SNAPSHOT_CDF_SPLIT1).cast("timestamp")
        s2 = F.lit(SNAPSHOT_CDF_SPLIT2).cast("timestamp")
        write_snapshot(ev.filter(F.col("ts") < s1), dest)
        write_snapshot(ev.filter((F.col("ts") >= s1) & (F.col("ts") < s2)),
                       dest)
        compact_snapshots(spark, dest)
        write_snapshot(ev.filter(F.col("ts") >= s2), dest)
    consumer = dest + "_consumer"
    if os.path.exists(consumer):
        os.unlink(consumer)

    def prof(df: DataFrame, phase: int) -> DataFrame:
        return (
            df.groupBy("_commit_version", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                F.lit(phase).cast("bigint").alias("phase"),
                "_commit_version", "event_type", "n_events", "sum_cents",
            )
        )

    latest, first = consume_snapshot_changes(spark, dest, consumer)
    ack_snapshot_consume(consumer, 2)  # park just before the compaction
    _, second = consume_snapshot_changes(spark, dest, consumer)
    ack_snapshot_consume(consumer, latest)
    _, third = consume_snapshot_changes(spark, dest, consumer)
    return (
        prof(first, 1).unionByName(prof(second, 2)).unionByName(prof(third, 3))
    )


ORACLE_SNAPSHOT_COMPACT_CONSUME = f"""
WITH tagged AS (
  SELECT CASE WHEN ts < TIMESTAMP '{SNAPSHOT_CDF_SPLIT1}' THEN 1
              WHEN ts < TIMESTAMP '{SNAPSHOT_CDF_SPLIT2}' THEN 2
              ELSE 4 END AS cv,
         event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT CAST(1 AS BIGINT) AS phase, CAST(cv AS BIGINT) AS _commit_version,
       event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM tagged GROUP BY 1, 2, 3
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT),
       event_type, CAST(count(*) AS BIGINT),
       CAST(SUM(cents) AS BIGINT)
FROM tagged WHERE cv = 4 GROUP BY 1, 2, 3
"""


def q_layout_snapshot_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST zone maps (round 12, sources/snapshots
    read_snapshot_between): three ts-windowed appends committed with
    ``stats_cols=["ts"]`` record per-segment [min, max] in the
    manifest, and a time-windowed read prunes non-overlapping segments
    from METADATA alone — the Iceberg per-file-stats move, the natural
    fit for streaming tables whose micro-batches each cover a narrow
    time range (a windowed read of a 10^5-segment table plans only the
    overlapping handful). Phase 1 hashes the full table; phase 2 a
    window covering the middle segment plus part of the third — the
    exact predicate re-applies on top, so stats change I/O, never
    answers (the skipped-files plan property is pinned in
    tests/test_plans.py)."""
    import datetime
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import (
        read_snapshot,
        read_snapshot_between,
        write_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_zm_{tag}")
    if _chain_needs_build(dest, 3):
        ev = _t(spark, sf_dir, "events").select(
            "event_type", _cents("value").alias("cents"), "ts"
        )
        s1 = F.lit(SNAPSHOT_CDF_SPLIT1).cast("timestamp")
        s2 = F.lit(SNAPSHOT_CDF_SPLIT2).cast("timestamp")
        write_snapshot(ev.filter(F.col("ts") < s1), dest, stats_cols=["ts"])
        write_snapshot(ev.filter((F.col("ts") >= s1) & (F.col("ts") < s2)),
                       dest, stats_cols=["ts"])
        write_snapshot(ev.filter(F.col("ts") >= s2), dest, stats_cols=["ts"])

    def prof(df: DataFrame, phase: int) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        ).select(
            F.lit(phase).cast("bigint").alias("phase"),
            "event_type", "n_events", "sum_cents",
        )

    lo = datetime.datetime.fromisoformat(SNAPSHOT_CDF_SPLIT1)
    hi = datetime.datetime.fromisoformat(ZONEMAP_WINDOW_END)
    return prof(read_snapshot(spark, dest), 1).unionByName(
        prof(read_snapshot_between(spark, dest, "ts", lo, hi), 2)
    )


ZONEMAP_WINDOW_END = "2024-01-22 00:00:00"

ORACLE_SNAPSHOT_ZONEMAP = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, ts
  FROM events
)
SELECT CAST(1 AS BIGINT) AS phase, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM ev GROUP BY 1, 2
UNION ALL
SELECT CAST(2 AS BIGINT), event_type,
       CAST(count(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM ev
WHERE ts >= TIMESTAMP '{SNAPSHOT_CDF_SPLIT1}'
  AND ts <= TIMESTAMP '{ZONEMAP_WINDOW_END}'
GROUP BY 1, 2
"""


def q_streaming_snapshot_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table as a STRUCTURED STREAMING SOURCE (round 12b,
    sources/snapshot_datasource.py — the Spark 4 Python DataSource API
    carrying the Delta "stream from a table" move onto this format):
    ``spark.readStream.format("fis_snapshot")`` tails the 3-version CDF
    chain, offsets are table VERSIONS, and each micro-batch's
    partitions are exactly the segment directories the committed range
    added — planned from manifests alone through the same walk the
    batch CDF uses, so the source inherits its whole contract
    (insert-only refusals, certified compactions as no-ops, replay
    determinism from immutable manifests). The data plane is
    Arrow-native: Python workers read the parquet segments with
    pyarrow, null-pad for schema evolution, and tag rows with
    ``_commit_version``. The drained stream's per-commit profile must
    hash-match the oracle's split-predicate rebuild — the same answer
    the BATCH feed gives, proving the two read paths agree row for
    row."""
    from ..sources.snapshot_datasource import register_snapshot_datasource
    from ..streaming.run import drain_available_now

    dest = _cdf_chain(spark, sf_dir)
    register_snapshot_datasource(spark)
    tail = spark.readStream.format("fis_snapshot").load(dest)
    drained = drain_available_now(tail, "fis_snap_source_tail")
    return (
        drained.groupBy("_commit_version", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )


ORACLE_STREAMING_SNAPSHOT_SOURCE = f"""
SELECT CAST(CASE WHEN ts < TIMESTAMP '{SNAPSHOT_CDF_SPLIT1}' THEN 1
                 WHEN ts < TIMESTAMP '{SNAPSHOT_CDF_SPLIT2}' THEN 2
                 ELSE 3 END AS BIGINT) AS _commit_version,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2
"""


def q_layout_snapshot_format_write(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The snapshot format's WRITE path through the Spark DataSource
    API (round 12b, sources/snapshot_datasource.py):
    ``df.write.format("fis_snapshot")`` commits two ts-split event
    appends — executors stage Arrow batches as parquet, the driver
    assembles a segment and publishes through the SAME CAS commit
    every other writer uses (schema enforcement, delta manifests,
    footer-summed row counts) — and the format READER returns them
    tagged per introducing commit. Phase 1 hashes the per-commit
    profile; phase 2 hashes the METADATA-only row count
    (snapshot_row_count answers from footer-summed stats without
    reading data — the write path kept COUNT(*) free). In-query assert:
    no staging residue survives the commits."""
    import hashlib
    import os
    import tempfile

    from ..sources.snapshot_datasource import register_snapshot_datasource
    from ..sources.snapshots import snapshot_row_count

    register_snapshot_datasource(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_dsw_{tag}")
    if _chain_needs_build(dest, 2):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "event_type", _cents("value").alias("cents"), "ts"
        )
        split = F.lit(SNAPSHOT_SPLIT).cast("timestamp")
        for part in (ev.filter(F.col("ts") < split),
                     ev.filter(F.col("ts") >= split)):
            part.write.format("fis_snapshot").mode("append").save(dest)
    assert [d for d in os.listdir(os.path.join(dest, "data"))
            if d.startswith(".")] == [], "staging residue leaked"

    full = spark.read.format("fis_snapshot").load(dest)
    phase1 = (
        full.groupBy("_commit_version", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(F.lit(1).cast("bigint").alias("phase"),
                F.col("_commit_version").alias("cv"),
                "event_type", "n_events", "sum_cents")
    )
    phase2 = spark.range(1).select(
        F.lit(2).cast("bigint").alias("phase"),
        F.lit(0).cast("bigint").alias("cv"),
        F.lit("ALL").alias("event_type"),
        F.lit(snapshot_row_count(dest)).cast("bigint").alias("n_events"),
        F.lit(0).cast("bigint").alias("sum_cents"),
    )
    return phase1.unionByName(phase2)


ORACLE_SNAPSHOT_FORMAT_WRITE = f"""
WITH ev AS (
  SELECT CASE WHEN ts < TIMESTAMP '{SNAPSHOT_SPLIT}' THEN 1 ELSE 2 END AS cv,
         event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT CAST(1 AS BIGINT) AS phase, CAST(cv AS BIGINT) AS cv, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM ev GROUP BY 2, 3
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'ALL',
       CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
FROM ev
"""


def q_layout_snapshot_cluster_compact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range-CLUSTERED compaction (round 12b, sources/snapshots
    compact_snapshots(sort_by=...) — the Delta OPTIMIZE / Iceberg
    sort-order rewrite reduced to one dimension): events land as 5
    segments interleaved by an event-id hash, so every segment spans
    the FULL time range and the zone maps recorded at commit can prune
    nothing; the clustered rewrite range-buckets on ``ts`` into 8
    sorted segments with fresh stats, after which the same windowed
    read scans a strict subset (asserted in-query) — a PLAIN compaction
    would have destroyed pruning forever (one merged stat-less
    segment), a clustered one makes the maps tighter than the append
    chain ever had them. Phase 1 hashes the post-rewrite windowed
    profile, phase 2 the full table at the compacted version, phase 3
    the same profile time-traveled to the PRE-compaction version —
    equality of 2 and 3 pins the compaction_of certificate's
    row-identity claim under the value hash."""
    import datetime
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import (
        compact_snapshots,
        read_snapshot,
        read_snapshot_between,
        snapshot_versions,
        write_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_ccl_{tag}")
    if _chain_needs_build(dest, 6):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "event_type", _cents("value").alias("cents"), "ts"
        )
        for r in range(5):  # hash-interleaved: each segment spans all ts
            write_snapshot(
                ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(5)) == r),
                dest, stats_cols=["ts"],
            )
        compact_snapshots(spark, dest, sort_by="ts", target_segments=8)

    pre_v = snapshot_versions(dest)[-1] - 1
    full = read_snapshot(spark, dest)
    lo = datetime.datetime.fromisoformat(SNAPSHOT_CDF_SPLIT1)
    hi = datetime.datetime.fromisoformat(SNAPSHOT_CDF_SPLIT2)
    win = read_snapshot_between(spark, dest, "ts", lo, hi)
    assert 0 < len(win.inputFiles()) < len(full.inputFiles()), (
        "clustered zone maps should prune the windowed read"
    )

    def prof(df: DataFrame, phase: int) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        ).select(
            F.lit(phase).cast("bigint").alias("phase"),
            "event_type", "n_events", "sum_cents",
        )

    return (
        prof(win, 1)
        .unionByName(prof(full, 2))
        .unionByName(prof(read_snapshot(spark, dest, pre_v), 3))
    )


ORACLE_SNAPSHOT_CLUSTER_COMPACT = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, ts
  FROM events
),
fullp AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM ev GROUP BY event_type
)
SELECT CAST(1 AS BIGINT) AS phase, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM ev
WHERE ts >= TIMESTAMP '{SNAPSHOT_CDF_SPLIT1}'
  AND ts <= TIMESTAMP '{SNAPSHOT_CDF_SPLIT2}'
GROUP BY event_type
UNION ALL
SELECT CAST(2 AS BIGINT), event_type, n_events, sum_cents FROM fullp
UNION ALL
SELECT CAST(3 AS BIGINT), event_type, n_events, sum_cents FROM fullp
"""


BLOOM_PROBE_KEYS = [3, 41, 97, 149]       # present at every scale
BLOOM_ABSENT_KEY = 10**9 + 7


def q_layout_snapshot_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter segment pruning on the snapshot format (round 12b,
    sources/snapshots.read_snapshot_lookup): customers are committed as
    8 segments split by ``c_custkey % 8`` — key ranges FULLY OVERLAP,
    so zone maps could never prune a point lookup — with
    ``bloom_cols=["c_custkey"]`` recording a per-segment bloom in the
    manifest. Phase 1 hashes the looked-up rows for four present keys
    plus one absent key (the exact IN predicate re-applies, so bloom
    false positives can cost I/O but never answers — and a present key
    returning at all proves the driver-side probe hash matches the
    Spark-side build bit-for-bit); phase 2 hashes the full-table
    profile proving the chain is lossless. The pruning itself is
    asserted in-query: present keys scan fewer files than the full
    table, the absent key prunes to (near) zero segments from metadata
    alone — at 10^5 segments that is a metadata answer vs a table
    scan."""
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import (
        read_snapshot,
        read_snapshot_lookup,
        write_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_cust_bloom_{tag}")
    if _chain_needs_build(dest, 8):
        cust = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", _cents("c_acctbal").alias("cents")
        )
        for r in range(8):
            write_snapshot(
                cust.filter(F.pmod(F.col("c_custkey"), F.lit(8)) == r),
                dest, bloom_cols=["c_custkey"],
            )

    full = read_snapshot(spark, dest)
    full_files = len(full.inputFiles())
    hits = read_snapshot_lookup(
        spark, dest, "c_custkey", BLOOM_PROBE_KEYS + [BLOOM_ABSENT_KEY]
    )
    assert len(hits.inputFiles()) < full_files, "bloom pruned nothing"
    miss = read_snapshot_lookup(spark, dest, "c_custkey", [BLOOM_ABSENT_KEY])
    # deterministic (md5 over fixed data); the false-positive tail is
    # sized ~0.2% per segment below the bloom cap, a few % above it
    assert len(miss.inputFiles()) <= full_files // 2, (
        "absent-key lookup should be (near) metadata-only"
    )

    phase1 = hits.select(
        F.lit(1).cast("bigint").alias("phase"),
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name"),
        "cents",
    )
    phase2 = full.agg(
        F.count(F.lit(1)).alias("k"), F.sum("cents").alias("cents")
    ).select(
        F.lit(2).cast("bigint").alias("phase"), "k",
        F.lit("ALL").alias("name"), "cents",
    )
    return phase1.unionByName(phase2)


ORACLE_SNAPSHOT_BLOOM = f"""
WITH c AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
)
SELECT CAST(1 AS BIGINT) AS phase, c_custkey AS k, c_name AS name, cents
FROM c WHERE c_custkey IN ({", ".join(map(str, BLOOM_PROBE_KEYS))},
                           {BLOOM_ABSENT_KEY})
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT), 'ALL',
       CAST(SUM(cents) AS BIGINT)
FROM c
"""


def q_layout_snapshot_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE on the snapshot format (round 12,
    sources/snapshots.overwrite_snapshot_partitions — the Delta
    replaceWhere / Iceberg dynamic-overwrite move): v1 commits the
    whole events table as partition-tagged segments (one per
    event_type), v2 replaces ONLY the 'purchase' partition with a
    corrected backfill (its pre-split rows) — a metadata-level swap
    that rewrites no byte of any other partition. Three read positions
    under one hash: v1 time travel (the pre-backfill table intact),
    the latest table (purchase corrected, everything else untouched),
    and a partition-PRUNED read of 'purchase' alone (the manifest
    answers pruning before any file listing — reading one partition of
    a 10^5-segment table plans O(1) directories). At 100 TB this is
    the daily-backfill pattern: one day's write replaces one day's
    partition, never a table scan."""
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import (
        overwrite_snapshot_partitions,
        read_snapshot,
        read_snapshot_partitions,
        write_snapshot_partitioned,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_po_{tag}")
    if _chain_needs_build(dest, 2):
        ev = _t(spark, sf_dir, "events").select(
            "event_type", _cents("value").alias("cents"), "ts"
        )
        write_snapshot_partitioned(ev, dest, "event_type")
        fix = ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") < F.lit(SNAPSHOT_SPLIT).cast("timestamp"))
        )
        overwrite_snapshot_partitions(fix, dest, "event_type")

    def prof(df: DataFrame, phase: int) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        ).select(
            F.lit(phase).cast("bigint").alias("phase"),
            "event_type", "n_events", "sum_cents",
        )

    return (
        prof(read_snapshot(spark, dest, 1), 1)
        .unionByName(prof(read_snapshot(spark, dest), 2))
        .unionByName(
            prof(read_snapshot_partitions(spark, dest, ["purchase"]), 3)
        )
    )


ORACLE_SNAPSHOT_PARTITION_OVERWRITE = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, ts
  FROM events
)
SELECT CAST(1 AS BIGINT) AS phase, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM ev GROUP BY 1, 2
UNION ALL
SELECT CAST(2 AS BIGINT), event_type,
       CAST(count(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM ev
WHERE event_type <> 'purchase' OR ts < TIMESTAMP '{SNAPSHOT_SPLIT}'
GROUP BY 1, 2
UNION ALL
SELECT CAST(3 AS BIGINT), event_type,
       CAST(count(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM ev
WHERE event_type = 'purchase' AND ts < TIMESTAMP '{SNAPSHOT_SPLIT}'
GROUP BY 1, 2
"""


def q_layout_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the snapshot format (sources/snapshots.
    merge_snapshot): v1 commits the latest-per-user profile from the
    first half of events, then one MERGE applies the second half as
    keyed upserts — with every MERGE_DELETE_MOD-th
    user arriving as a DELETE — and commits the result as v2
    (copy-on-write; v1 stays time-travelable). The merge itself is the
    engine's union+window CDC move: no join, one shuffle on the key,
    duplicate-key updates rejected loudly (SQL MERGE semantics). The
    query reads the merged table back; the oracle recomputes the same
    upsert/delete algebra from the raw events with a FULL OUTER join of
    the two halves' latest rows."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import Window

    from ..sources.snapshots import (
        merge_snapshot,
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_users_merge_{tag}")
    if _chain_needs_build(dest, 2):
        ev = _t(spark, sf_dir, "events").select(
            "user_id", _cents("value").alias("cents"), "ts", "event_id"
        )
        split = F.lit(SNAPSHOT_SPLIT).cast("timestamp")
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )

        def latest(df):
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select("user_id", "cents", "ts")
            )

        write_snapshot(latest(ev.filter(F.col("ts") < split)), dest)
        upd = latest(ev.filter(F.col("ts") >= split)).withColumn(
            "__delete", F.col("user_id") % MERGE_DELETE_MOD == 0
        )
        merge_snapshot(upd, dest, ["user_id"], delete_col="__delete")
    return read_snapshot(spark, dest)


ORACLE_SNAPSHOT_MERGE = f"""
WITH r1 AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts < TIMESTAMP '{SNAPSHOT_SPLIT}'
),
base AS (SELECT user_id, cents, ts FROM r1 WHERE rn = 1),
r2 AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts >= TIMESTAMP '{SNAPSHOT_SPLIT}'
),
upd AS (SELECT user_id, cents, ts FROM r2 WHERE rn = 1)
SELECT COALESCE(u.user_id, b.user_id) AS user_id,
       COALESCE(u.cents, b.cents) AS cents,
       COALESCE(u.ts, b.ts) AS ts
FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id
WHERE NOT (u.user_id IS NOT NULL
           AND u.user_id % {MERGE_DELETE_MOD} = 0)
"""


def q_layout_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level zone-map skipping: events are written once as a
    range-clustered parquet layout (repartitionByRange on user_id, so
    each file owns a contiguous user range) with a persisted per-file
    (min_user, max_user) STATS TABLE beside it — the Delta/Iceberg
    data-skipping index reduced to its core. The probe consults only
    the stats table (metadata-sized), collects the files whose range
    overlaps the probe range (a bounded driver list — file
    count, not rows), scans JUST those files, and re-applies the exact
    predicate. At 100 TB the scan cost becomes proportional to the
    files that can contain matches instead of the table; the pruning
    factor is pinned by a plan test (tests/test_plans.py), the CONTENT
    by this oracle (a plain filter over the raw table — zone maps must
    never change an answer, only the I/O)."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_skip_{tag}")
    zmap = dest + "_zonemap"
    if not os.path.isdir(zmap):
        ev = _t(spark, sf_dir, "events").select(
            "user_id", "event_type", _cents("value").alias("cents")
        )
        ev.repartitionByRange(16, "user_id").write.mode(
            "overwrite"
        ).parquet(dest)
        (
            spark.read.parquet(dest)
            .select(F.col("_metadata.file_path").alias("file"), "user_id")
            .groupBy("file")
            .agg(
                F.min("user_id").alias("min_user"),
                F.max("user_id").alias("max_user"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(zmap)
        )
    candidates = [
        r["file"]
        for r in spark.read.parquet(zmap)
        .filter(
            (F.col("min_user") <= SKIP_HI) & (F.col("max_user") >= SKIP_LO)
        )
        .collect()
    ]
    return (
        spark.read.parquet(*candidates)
        .filter(F.col("user_id").between(SKIP_LO, SKIP_HI))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
        )
    )


ORACLE_DATA_SKIPPING = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
WHERE user_id BETWEEN {SKIP_LO} AND {SKIP_HI}
GROUP BY event_type
"""


ORACLE_BUCKETED_JOIN = """
WITH prof AS (
  SELECT user_id, min(ts) AS first_seen,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT a.user_id, a.n_purchases, a.sum_cents, p.n_events, p.first_seen
FROM agg a JOIN prof p USING (user_id)
"""


# quasi-identifier set shared by the three privacy queries: nation x
# market segment x $1000 balance band (floor over the same IEEE double
# both engines read from parquet, so the band edges agree bit-exactly)
_PRIVACY_QI_SQL = ("c_nationkey, c_mktsegment, "
                   "CAST(floor(c_acctbal / 1000.0) AS BIGINT)")


def _privacy_qi():
    return [
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint"),
    ]


def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census of customer under the (nation, segment,
    balance-band) quasi-identifier: how many equivalence classes exist
    at each size, and how many records sit in them. min(class_size) is
    the table's k; the exposure is the records in the small classes.
    Two-level hash aggregate — map-side combine, no joins, no windows."""
    from ..operators.privacy import k_anonymity_census

    cust = _t(spark, sf_dir, "customer")
    return k_anonymity_census(cust, _privacy_qi())


ORACLE_PRIVACY_K_ANONYMITY = f"""
WITH classes AS (
  SELECT COUNT(*) AS class_size
  FROM customer
  GROUP BY {_PRIVACY_QI_SQL}
)
SELECT class_size, COUNT(*) AS n_classes,
       class_size * COUNT(*) AS n_records
FROM classes GROUP BY class_size
"""


def q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity census of events under the (event_type, hour-of-day)
    quasi-identifier with user_id as the sensitive attribute: per QI
    class, how many DISTINCT users could the row belong to — the
    k-anonymity blind spot (a big class with one user is still a
    re-identification). Single exact count_distinct per class keeps the
    plan a two-phase partial aggregate (no Expand)."""
    from ..operators.privacy import l_diversity_census

    ev = _t(spark, sf_dir, "events")
    return l_diversity_census(
        ev, [F.col("event_type"), F.hour("ts")], "user_id"
    )


ORACLE_PRIVACY_L_DIVERSITY = """
WITH classes AS (
  SELECT COUNT(DISTINCT user_id) AS l
  FROM events GROUP BY event_type, hour(ts)
)
SELECT l, COUNT(*) AS n_classes FROM classes GROUP BY l
"""


def q_privacy_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization-ladder census on customer, k=10: the coarsening
    route to k-anonymity (lose precision, keep every row) census'd per
    level — $1000 balance bands -> $5000 bands -> drop the band -> drop
    nation — with the finest releasable level flagged ``chosen`` and
    the residual exposure (records in sub-k classes) quantified at
    every finer level. One scan aggregate per level, single-row
    summaries, a len(ladder)-row window for the flag."""
    from ..operators.privacy import generalization_ladder_census

    cust = _t(spark, sf_dir, "customer")
    band = lambda w: F.floor(  # noqa: E731
        F.col("c_acctbal") / F.lit(float(w))
    ).cast("bigint")
    ladder = [
        [F.col("c_nationkey"), F.col("c_mktsegment"), band(1000)],
        [F.col("c_nationkey"), F.col("c_mktsegment"), band(5000)],
        [F.col("c_nationkey"), F.col("c_mktsegment")],
        [F.col("c_mktsegment")],
    ]
    return generalization_ladder_census(cust, ladder, k=10)


ORACLE_PRIVACY_GENERALIZATION = """
WITH l0 AS (
  SELECT COUNT(*) AS cs FROM customer
  GROUP BY c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT)
),
l1 AS (
  SELECT COUNT(*) AS cs FROM customer
  GROUP BY c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 5000.0) AS BIGINT)
),
l2 AS (SELECT COUNT(*) AS cs FROM customer GROUP BY c_nationkey, c_mktsegment),
l3 AS (SELECT COUNT(*) AS cs FROM customer GROUP BY c_mktsegment),
s AS (
  SELECT 0 AS level, COUNT(*) AS n_classes, MIN(cs) AS min_class,
         CAST(SUM(CASE WHEN cs < 10 THEN cs ELSE 0 END) AS BIGINT)
           AS n_records_below_k
  FROM l0
  UNION ALL
  SELECT 1, COUNT(*), MIN(cs),
         CAST(SUM(CASE WHEN cs < 10 THEN cs ELSE 0 END) AS BIGINT)
  FROM l1
  UNION ALL
  SELECT 2, COUNT(*), MIN(cs),
         CAST(SUM(CASE WHEN cs < 10 THEN cs ELSE 0 END) AS BIGINT)
  FROM l2
  UNION ALL
  SELECT 3, COUNT(*), MIN(cs),
         CAST(SUM(CASE WHEN cs < 10 THEN cs ELSE 0 END) AS BIGINT)
  FROM l3
)
SELECT level, n_classes, min_class, n_records_below_k,
       min_class >= 10 AS meets_k,
       (min_class >= 10) AND COALESCE(
         SUM(CASE WHEN min_class >= 10 THEN 1 ELSE 0 END)
           OVER (ORDER BY level
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 0
         AS chosen
FROM s
"""


def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness census of events under (event_type, hour-of-day)
    with the spend decile as the ordered sensitive attribute — the
    third leg of the privacy triad (k-anonymity counts rows,
    l-diversity counts distinct values, t-closeness bounds how far a
    class's sensitive DISTRIBUTION drifts from the table's). The EMD
    stays integer to the last op (see t_closeness_census), so the t
    doubles hash exactly against the oracle's identical arithmetic."""
    from ..operators.privacy import t_closeness_census

    ev = _t(spark, sf_dir, "events")
    cents = _cents("value")
    sens_bin = F.least(
        F.lit(9),
        F.greatest(F.lit(0), F.floor(cents / F.lit(2000.0)).cast("bigint")),
    )
    out = t_closeness_census(
        ev,
        [F.col("event_type"), F.hour("ts").cast("bigint").alias("hh")],
        sens_bin,
        n_bins=10,
    )
    return out.select("event_type", "hh", "n", "t")


ORACLE_PRIVACY_T_CLOSENESS = """
WITH base AS (
  SELECT event_type, hour(ts) AS hh,
         least(9, greatest(0,
                 CAST(floor(CAST(round(value * 100) AS BIGINT) / 2000.0)
                      AS BIGINT))) AS bin
  FROM events
),
cls_bin AS (
  SELECT event_type, hh, bin, COUNT(*) AS cb FROM base GROUP BY 1, 2, 3
),
cls AS (
  SELECT event_type, hh, CAST(SUM(cb) AS BIGINT) AS n
  FROM cls_bin GROUP BY 1, 2
),
gdist AS (SELECT bin, COUNT(*) AS gb FROM base GROUP BY 1),
tot AS (SELECT COUNT(*) AS nt FROM base),
spine AS (
  SELECT c.event_type, c.hh, c.n, b.bin
  FROM cls c CROSS JOIN (SELECT unnest(range(10)) AS bin) b
),
cums AS (
  SELECT s.event_type, s.hh, s.n, s.bin,
         SUM(COALESCE(cb.cb, 0)) OVER w AS ccb,
         SUM(COALESCE(g.gb, 0)) OVER w AS cgb
  FROM spine s
  LEFT JOIN cls_bin cb USING (event_type, hh, bin)
  LEFT JOIN gdist g USING (bin)
  WINDOW w AS (PARTITION BY s.event_type, s.hh ORDER BY s.bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, hh, n,
       CAST(SUM(ABS(ccb * nt - cgb * n)) AS DOUBLE)
         / CAST(n * nt * 9 AS DOUBLE) AS t
FROM cums CROSS JOIN tot
GROUP BY event_type, hh, n, nt
"""


def q_privacy_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression enforcement: drop customer rows whose QI class holds
    fewer than 2 records (the remainder is 2-anonymous by construction
    — k=2 keeps the pin non-vacuous even at sf0.001's 150 customers),
    then summarize the survivors per segment. The Spark side is the
    groupBy + semi-join-back shape (whale-class-safe — see the privacy
    module docstring); the oracle is the window/QUALIFY formulation —
    two independent formulations of the same semantics."""
    from ..operators.privacy import suppress_small_classes

    cust = _t(spark, sf_dir, "customer")
    kept = suppress_small_classes(cust, _privacy_qi(), k=2)
    return kept.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(_cents("c_acctbal")).alias("sum_bal_cents"),
        F.min("c_custkey").alias("min_cust"),
        F.max("c_custkey").alias("max_cust"),
    )


ORACLE_PRIVACY_SUPPRESSION = f"""
WITH kept AS (
  SELECT * FROM customer
  QUALIFY COUNT(*) OVER (PARTITION BY {_PRIVACY_QI_SQL}) >= 2
)
SELECT c_mktsegment, COUNT(*) AS n_kept,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_bal_cents,
       MIN(c_custkey) AS min_cust, MAX(c_custkey) AS max_cust
FROM kept GROUP BY c_mktsegment
"""


def q_chunk_and_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data shape: documents chunked into 64-token
    windows (8 overlap), then the chunks packed into 512-token training
    bins under the deterministic (doc_id, chunk_idx) order — chunker and
    packer are each individually oracled; this pins their composition
    (token offsets crossing chunk boundaries, chunk ordering through the
    packer) end-to-end. Map-side chunking into ONE window shuffle."""
    from ..operators.sampling import chunk_documents, pack_sequences

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, CHUNK_TOKENS, CHUNK_OVERLAP)
    return pack_sequences(
        chunks, "n_tokens", 512, order_cols=["doc_id", "chunk_idx"]
    ).select("doc_id", "chunk_idx", "n_tokens", "pack_id", "pack_offset")


ORACLE_CHUNK_PACK = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
),
starts AS (
  SELECT doc_id, t,
         range(0, greatest(1, CAST(ceil((len(t) - {CHUNK_OVERLAP}) /
               ({CHUNK_TOKENS - CHUNK_OVERLAP}.0) ) AS BIGINT))) AS idxs
  FROM toks
),
chunks AS (
  SELECT doc_id,
         CAST(i AS INTEGER) AS chunk_idx,
         CAST(len(t[i * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 :
                     i * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS}])
              AS INTEGER) AS n_tokens
  FROM starts, unnest(idxs) AS u(i)
),
c AS (
  SELECT doc_id, chunk_idx, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tokens_before
  FROM chunks
)
SELECT doc_id, chunk_idx, n_tokens,
       tokens_before // 512 AS pack_id,
       tokens_before % 512 AS pack_offset
FROM c
"""


def q_training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed training-data pipeline, end to end in one plan:
    curate (exact dedup -> quality floor -> near-dup prune) -> drop the
    benchmark ids -> keep the deterministic 'train' split -> benchmark
    decontamination (5-gram overlap, broadcast anti join) -> chunk into
    overlapping 64-token windows -> pack into 512-token training bins.
    Every stage is individually oracle-gated; this query pins the whole
    composition against one nested DuckDB oracle — the engine's
    flagship demonstration that the pipeline a 100 TB pretraining corpus
    actually runs is expressible as a single declarative plan."""
    return _training_pipeline(spark, sf_dir, tier="exact")


def _training_pipeline(
    spark: SparkSession, sf_dir: str, tier: str
) -> DataFrame:
    """The composition behind q_training_pipeline_e2e with the near-dup
    tier exposed: the gate pins ``tier="exact"`` for oracle-exactness;
    production (and the 10x scale smoke's auto-tier datapoint, NOTES.md)
    passes ``"auto"``/``"lsh"`` so the curation stage takes the bounded
    LSH path once input bytes cross the measured 16 MiB crossover."""
    from ..operators.curation import curate_corpus
    from ..operators.dedup import contamination_overlap
    from ..operators.sampling import chunk_documents, pack_sequences, split_col

    docs = _t(spark, sf_dir, "documents")
    curated = curate_corpus(
        docs,
        quality_floor=CURATION_QUALITY_FLOOR,
        ngram_n=NGRAM_N,
        jaccard_threshold=JACCARD_THRESHOLD,
        tier=tier,
    ).select("doc_id")
    train = (
        curated.filter(F.col("doc_id") >= DECON_BENCH_IDS)
        .filter(split_col(F.col("doc_id")) == "train")
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    dirty = contamination_overlap(
        train, docs.filter(F.col("doc_id") < DECON_BENCH_IDS), n=DECON_N
    ).select("doc_id")
    clean = train.join(F.broadcast(dirty), "doc_id", "left_anti")
    chunks = chunk_documents(clean, CHUNK_TOKENS, CHUNK_OVERLAP)
    return pack_sequences(
        chunks, "n_tokens", 512, order_cols=["doc_id", "chunk_idx"]
    ).select("doc_id", "chunk_idx", "n_tokens", "pack_id", "pack_offset")


ORACLE_TRAINING_PIPELINE = f"""
WITH survivors AS (
  SELECT doc_id, text,
         (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / length(text)) * 0.5
         + (CAST(len(list_filter({{toks}}, t -> lower(t) IN ({{stops}}))) AS DOUBLE)
            / len({{toks}})) * 0.3
         + ((CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / len({{toks}})) / 10.0) * 0.2 AS quality_score
  FROM (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text)
  WHERE (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / length(text)) * 0.5
      + (CAST(len(list_filter({{toks}}, t -> lower(t) IN ({{stops}}))) AS DOUBLE)
            / len({{toks}})) * 0.3
      + ((CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / len({{toks}})) / 10.0) * 0.2 >= {CURATION_QUALITY_FLOOR}
),
sh AS (SELECT doc_id, unnest({{shingles}}) AS shingle FROM survivors),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup AS (
  SELECT doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1000 >= {int(JACCARD_THRESHOLD * 1000)} * (sa.n_sh + sb.n_sh - common)
),
train AS (
  SELECT s.doc_id, s.text FROM survivors s
  WHERE s.doc_id NOT IN (SELECT doc_b FROM neardup)
    AND s.doc_id >= {DECON_BENCH_IDS}
    AND ((s.doc_id % 1000) * 2654435761) % 1000 < 800
),
ds AS (
  SELECT t.doc_id, unnest({{grams5}}) AS g
  FROM train t
),
bs AS (
  SELECT DISTINCT unnest({{grams5}}) AS g
  FROM documents d WHERE doc_id < {DECON_BENCH_IDS}
),
dirty AS (SELECT DISTINCT doc_id FROM ds JOIN bs USING (g)),
clean AS (
  SELECT doc_id, text FROM train WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
),
toks2 AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM clean),
starts AS (
  SELECT doc_id, t,
         range(0, greatest(1, CAST(ceil((len(t) - {CHUNK_OVERLAP}) /
               ({CHUNK_TOKENS - CHUNK_OVERLAP}.0) ) AS BIGINT))) AS idxs
  FROM toks2
),
chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         CAST(len(t[i * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 :
                     i * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS}])
              AS INTEGER) AS n_tokens
  FROM starts, unnest(idxs) AS u(i)
),
c AS (
  SELECT doc_id, chunk_idx, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tokens_before
  FROM chunks
)
SELECT doc_id, chunk_idx, n_tokens,
       tokens_before // 512 AS pack_id,
       tokens_before % 512 AS pack_offset
FROM c
""".replace("{toks}", _DUCK_TOKENS).replace("{stops}", _DUCK_EN_STOPS).replace(
    "{shingles}", _DUCK_SHINGLES).replace("{grams5}", _duck_grams(5, distinct=True))


def q_agg_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal activity heat profile: events bucketed by ISO day-of-week
    x hour-of-day with counts and cent sums — the date-part extraction
    surface (dayofweek/hour) at the gate; one map-side-combinable
    aggregate over the scan."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents("value")).cast("double") / 100.0).alias("spend"),
        )
    )


ORACLE_ACTIVITY_PROFILE = """
SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,  -- DuckDB 0=Sunday; Spark 1=Sunday
       CAST(hour(ts) AS BIGINT) AS hod,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS spend
FROM events GROUP BY 1, 2
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: how many users performed view, then click
    AFTER their first view, then purchase AFTER that click. One hash
    shuffle on user_id; stage times come from conditional MIN aggregates
    (min ts of stage k past the stage k-1 time), evaluated in one grouped
    pass per stage — no self-joins, no window sort. At 100 TB this is a
    single map-side-combinable aggregation per stage over the events
    scan."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1, s2, s3 = FUNNEL_STAGES
    t1 = ev.filter(F.col("event_type") == s1).groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        ev.filter(F.col("event_type") == s2)
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == s3)
        .join(t2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return spark.createDataFrame(
        [(s1, 1), (s2, 2), (s3, 3)], "stage string, stage_idx int"
    ).join(
        t1.agg(F.count(F.lit(1)).alias("n")).select(F.lit(s1).alias("stage"), "n")
        .unionByName(
            t2.agg(F.count(F.lit(1)).alias("n")).select(F.lit(s2).alias("stage"), "n"))
        .unionByName(
            t3.agg(F.count(F.lit(1)).alias("n")).select(F.lit(s3).alias("stage"), "n")),
        "stage",
    ).select("stage", "stage_idx", F.col("n").alias("n_users"))


ORACLE_FUNNEL = f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts >= t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts >= t2.t2
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT '{FUNNEL_STAGES[0]}' AS stage, 1 AS stage_idx,
         (SELECT count(*) FROM t1) AS n_users
  UNION ALL
  SELECT '{FUNNEL_STAGES[1]}', 2, (SELECT count(*) FROM t2)
  UNION ALL
  SELECT '{FUNNEL_STAGES[2]}', 3, (SELECT count(*) FROM t3)
)
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week (cohort),
    counted distinct in each later week offset. Two shuffles total (first-
    seen per user, then the cohort matrix aggregate); the classic product-
    analytics rollup. All outputs are integers — exact."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    week = (F.floor(F.unix_micros(F.col("ts")) / (7 * 86400 * 1_000_000))).cast(
        "bigint"
    )
    first = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    return (
        ev.select("user_id", week.alias("event_week"))
        .join(first, "user_id")
        .groupBy("cohort_week", (F.col("event_week") - F.col("cohort_week"))
                 .alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


ORACLE_RETENTION = """
WITH weeks AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / (7 * 86400 * CAST(1000000 AS BIGINT))) AS BIGINT) AS event_week
  FROM events
),
first AS (
  SELECT user_id, min(event_week) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT f.cohort_week,
       w.event_week - f.cohort_week AS week_offset,
       CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
FROM weeks w JOIN first f USING (user_id)
GROUP BY 1, 2
"""


def q_features_multi_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store rolling features: per event, count and spend over
    1-hour / 24-hour / 7-day trailing RANGE frames — three frames sharing
    ONE sort (same partition+order key), so Spark plans a single window
    stage: one shuffle + one sort for all six features. Spend accumulates
    in integer cents (order-independent); the only double op is the final
    /100 scale, identical in both engines."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    cents = _cents("value")
    us = lambda h: h * 3600 * 1_000_000  # noqa: E731
    base = ev.select("event_id", "user_id", "ts", cents.alias("__c"))
    frames = {"1h": us(1), "24h": us(24), "7d": us(24 * 7)}
    cols = [F.col("event_id"), F.col("user_id"), F.col("ts")]
    for tag, span in frames.items():
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros(F.col("ts")))
            .rangeBetween(-span, 0)
        )
        cols.append(F.count(F.lit(1)).over(w).alias(f"n_{tag}"))
        cols.append(
            (F.sum("__c").over(w).cast("double") / 100.0).alias(f"spend_{tag}")
        )
    return base.select(*cols)


ORACLE_MULTI_HORIZON = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts,
  CAST(count(*) OVER w1 AS BIGINT) AS n_1h,
  CAST(sum(cents) OVER w1 AS DOUBLE) / 100.0 AS spend_1h,
  CAST(count(*) OVER w24 AS BIGINT) AS n_24h,
  CAST(sum(cents) OVER w24 AS DOUBLE) / 100.0 AS spend_24h,
  CAST(count(*) OVER w7d AS BIGINT) AS n_7d,
  CAST(sum(cents) OVER w7d AS DOUBLE) / 100.0 AS spend_7d
FROM c
WINDOW
  w1 AS (PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
  w24 AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW),
  w7d AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""


TIME_DECAY_ANCHOR = "2024-01-30"  # end of the events range
TIME_DECAY_MAX_DAYS = 14  # half-life 1 day; weights 2^0 .. 2^-14


def q_features_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed engagement features (half-life
    1 day, anchored at the end of the event range) — the recency-weighted
    score feature stores serve beside plain rolling windows.

    Decayed sums are normally hash-hostile (pow/exp differ by ulps across
    engines, float addition is order-dependent). This formulation is
    EXACT: with integer day ages k in [0, 14], weight 2^-k times cents is
    the integer ``cents << (14 - k)`` over a common 2^-14 denominator, so
    the aggregate is one order-independent BIGINT sum and the only double
    op is a single final division by the exact constant 2^14*100 —
    bit-identical in any IEEE engine. One hash-partial aggregate shuffle
    on user_id; at 100 TB the anchor filter prunes the scan to the
    trailing window before any shuffle."""
    from datetime import date, timedelta

    from ..sources.reader import filter_ts_range

    ev = _t(spark, sf_dir, "events")
    # the day-age predicate below is written on a DERIVED column
    # (datediff of to_date(ts)) and cannot push down; prefix the exactly
    # equivalent raw ts range so the scan prunes to the trailing window
    # (filter_ts_range rewrites into nanos space -> PushedFilters;
    # plan-pinned in test_plans.py)
    anchor = date.fromisoformat(TIME_DECAY_ANCHOR)
    lo = (anchor - timedelta(days=TIME_DECAY_MAX_DAYS)).isoformat() + " 00:00:00"
    hi = anchor.isoformat() + " 23:59:59.999999"
    ev = filter_ts_range(ev, "ts", lo, hi)
    k = F.datediff(F.lit(TIME_DECAY_ANCHOR).cast("date"), F.to_date("ts"))
    base = (
        ev.select("user_id", _cents("value").alias("__c"), k.alias("__k"))
        .filter((F.col("__k") >= 0) & (F.col("__k") <= TIME_DECAY_MAX_DAYS))
    )
    w = F.expr(f"shiftleft(CAST(1 AS BIGINT), {TIME_DECAY_MAX_DAYS} - __k)")
    denom_spend = float((1 << TIME_DECAY_MAX_DAYS) * 100)
    denom_n = float(1 << TIME_DECAY_MAX_DAYS)
    return base.groupBy("user_id").agg(
        (F.sum(F.col("__c") * w).cast("double") / F.lit(denom_spend))
        .alias("decayed_spend"),
        (F.sum(w).cast("double") / F.lit(denom_n)).alias("decayed_n"),
        F.count(F.lit(1)).alias("n_recent"),
    )


ORACLE_TIME_DECAY = f"""
WITH c AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         datediff('day', CAST(ts AS DATE), DATE '{TIME_DECAY_ANCHOR}') AS k
  FROM events
)
SELECT user_id,
       CAST(sum(cents * (CAST(1 AS BIGINT) << ({TIME_DECAY_MAX_DAYS} - k)))
            AS DOUBLE) / {float((1 << TIME_DECAY_MAX_DAYS) * 100)}
         AS decayed_spend,
       CAST(sum(CAST(1 AS BIGINT) << ({TIME_DECAY_MAX_DAYS} - k)) AS DOUBLE)
         / {float(1 << TIME_DECAY_MAX_DAYS)} AS decayed_n,
       count(*) AS n_recent
FROM c
WHERE k BETWEEN 0 AND {TIME_DECAY_MAX_DAYS}
GROUP BY user_id
"""


def q_normalize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (ML feature preprocessing): value
    standardized within its event_type. Group mean/variance derive from
    exact integer cent sums (sum and sum-of-squares as BIGINT — order-
    independent), so the mean/std doubles are identical in both engines
    and the final z expression is a fixed op sequence over exact inputs:
    hash-comparable with no rtol. One shuffle (the group stats broadcast
    back via a 5-row join)."""
    ev = _t(spark, sf_dir, "events")
    cents = _cents("value")
    base = ev.select("event_id", "event_type", cents.alias("__c"))
    stats = base.groupBy("event_type").agg(
        F.sum("__c").alias("s"),
        F.sum(F.col("__c") * F.col("__c")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double") / F.col("n")
        - (F.col("s").cast("double") / F.col("n"))
        * (F.col("s").cast("double") / F.col("n"))
    )
    return (
        base.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            (F.col("__c").cast("double") / 100.0).alias("value"),
            ((F.col("__c").cast("double") - mean) / F.sqrt(var)).alias("zscore"),
        )
    )


ORACLE_ZSCORE = """
WITH c AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
stats AS (
  SELECT event_type,
         sum(cents) AS s, sum(cents * cents) AS ss, count(*) AS n
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type,
       CAST(c.cents AS DOUBLE) / 100.0 AS value,
       (CAST(c.cents AS DOUBLE) - CAST(s.s AS DOUBLE) / s.n)
         / sqrt(CAST(s.ss AS DOUBLE) / s.n
                - (CAST(s.s AS DOUBLE) / s.n) * (CAST(s.s AS DOUBLE) / s.n))
         AS zscore
FROM c JOIN stats s USING (event_type)
"""

def q_features_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (outlier clipping to the group's [p01,
    p99] — the feature-preprocessing twin of normalize_zscore), with the
    bounds as DISCRETE ORDER STATISTICS: the element at 0-based sorted
    rank floor(p*(n-1)), selected by row_number, never interpolated.

    Why selection and not percentile()/quantile_cont: interpolated
    percentiles at FRACTIONAL ranks differ by 1 ulp between Spark and
    DuckDB (measured on the bootstrap CI at B=40), and p01/p99 ranks are
    fractional for almost every group size — an exact-hash gate row on
    the interpolated formulation is a data-dependent flake. Here every
    emitted double is an ELEMENT of the input (the bound itself or the
    row's value picked by least/greatest), so parity is exact for any n
    at any scale. The rank expression floor(0.01*(n-1)) is one double
    product + floor — bit-identical in both engines — and the value at a
    sorted position is deterministic under ties (ties only permute equal
    values). One window (per-group sort, the same cost the exact
    percentile aggregate pays internally, but spillable instead of
    collected into aggregate state) + one groups-sized broadcast join;
    at 100 TB swap in approx_percentile for sketch-state one-pass
    bounds, the documented trade from the approx twin rows."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    base = ev.select("event_id", "event_type", "value")
    nn = base.filter(F.col("value").isNotNull())
    counts = nn.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = nn.select("event_type", "value").withColumn(
        "__rn", F.row_number().over(w).cast("bigint") - 1
    )
    r_lo = F.floor(F.lit(0.01) * (F.col("__n") - 1).cast("double"))
    r_hi = F.floor(F.lit(0.99) * (F.col("__n") - 1).cast("double"))
    pct = (
        ranked.join(F.broadcast(counts), "event_type")
        .filter((F.col("__rn") == r_lo) | (F.col("__rn") == r_hi))
        .groupBy("event_type")
        .agg(F.min("value").alias("__lo"), F.max("value").alias("__hi"))
    )
    return base.join(F.broadcast(pct), "event_type").select(
        "event_id", "event_type", "value",
        F.least(F.greatest(F.col("value"), F.col("__lo")), F.col("__hi"))
        .alias("winsorized"),
        (F.col("value") < F.col("__lo")).cast("int").alias("clipped_lo"),
        (F.col("value") > F.col("__hi")).cast("int").alias("clipped_hi"),
    )


ORACLE_WINSORIZE = """
WITH c AS (
  SELECT event_type, count(*) AS n FROM events
  WHERE value IS NOT NULL GROUP BY event_type
),
r AS (
  SELECT event_type, value,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY value)
              AS BIGINT) - 1 AS rn
  FROM events WHERE value IS NOT NULL
),
p AS (
  SELECT r.event_type, min(r.value) AS lo, max(r.value) AS hi
  FROM r JOIN c USING (event_type)
  WHERE r.rn = CAST(floor(0.01 * CAST(c.n - 1 AS DOUBLE)) AS BIGINT)
     OR r.rn = CAST(floor(0.99 * CAST(c.n - 1 AS DOUBLE)) AS BIGINT)
  GROUP BY r.event_type
)
SELECT e.event_id, e.event_type, e.value,
       least(greatest(e.value, p.lo), p.hi) AS winsorized,
       CAST(e.value < p.lo AS INTEGER) AS clipped_lo,
       CAST(e.value > p.hi AS INTEGER) AS clipped_hi
FROM events e JOIN p USING (event_type)
"""


def q_eval_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence intervals for the per-type mean
    spend (operators/bootstrap.py): 40 deterministic resamples from the
    multiplicative-hash weight stream, per-replicate exact-integer
    means, exact-percentile CI — every number a fixed op sequence over
    exact inputs, so the DuckDB oracle (the identical hash arithmetic
    spelled out in SQL) value-hashes with no tolerance. B=41 is
    LOAD-BEARING: with 41 replicates the 2.5/50/97.5 ranks land on
    integer positions (0.025*40 = 1, 0.5*40 = 20, 0.975*40 = 39), so
    the percentile is an element SELECTION — at fractional ranks the
    Spark and DuckDB interpolation formulas differ by 1 ulp (measured:
    one ci_lo cell at B=40). The operator normalizes the quantile
    literals to short decimals before embedding (0.025, not the
    arithmetic residue 0.025000000000000022 — which put Spark's rank at
    1.0000000000000009, silently back on the interpolation path) so the
    selection invariant holds on BOTH engines, not just the oracle.
    Plan: one scan, map-side 41x replication,
    two-level aggregation — reduce side sees |groups| x B rows
    regardless of input size."""
    from ..operators.bootstrap import bootstrap_mean_ci

    ev = _t(spark, sf_dir, "events")
    base = ev.select("event_type", "event_id", _cents("value").alias("cents"))
    return bootstrap_mean_ci(
        base, "cents", ["event_type"], "event_id",
        n_replicates=41, ci=0.95,
    )


ORACLE_BOOTSTRAP_CI = """
WITH reps AS (SELECT unnest(range(41)) AS b),
base AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE value IS NOT NULL
),
wts AS (
  SELECT event_type, b, cents,
         CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
              WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
              WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
              ELSE 6 END AS w
  FROM (
    SELECT event_type, b, cents,
           ((event_id % 2147483647) * 48271 + b * 69621)
             % 2147483647 % 1000000 AS u
    FROM base, reps
  )
),
rep_means AS (
  SELECT event_type, b, CAST(SUM(w * cents) AS DOUBLE) / SUM(w) AS m
  FROM wts GROUP BY 1, 2
  HAVING SUM(w) > 0
),
f AS (
  SELECT event_type, CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_est
  FROM base GROUP BY 1
)
SELECT f.event_type, f.mean_est,
       quantile_cont(m, 0.025) AS ci_lo,
       quantile_cont(m, 0.5)   AS ci_mid,
       quantile_cont(m, 0.975) AS ci_hi
FROM rep_means r JOIN f USING (event_type)
GROUP BY f.event_type, f.mean_est
"""


PSI_N_BINS, PSI_SPLIT = 10, "2024-01-15 00:00:00"


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection between two periods (population
    stability index per event_type): fixed-width bins over the value
    domain, per-bin proportions before/after the split date, PSI term
    (pa-pb)*ln(pa/pb) per bin. Counts/proportions are exact; the ln makes
    the psi_term column an rtol compare (like BM25 — libm-vs-JVM ulp).
    Laplace-smoothed (+1 per bin) so empty bins stay finite. Two scan
    aggregates, one tiny bin-grid join — map-side combinable at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    # fixed domain [0, 500) in 10 bins; clamp outliers into the edge bins
    bin_col = F.least(
        F.lit(PSI_N_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("value") / (500.0 / PSI_N_BINS))),
    ).cast("bigint")
    binned = ev.select(
        "event_type",
        bin_col.alias("bin"),
        (F.col("ts") < split).cast("int").alias("is_a"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("is_a").alias("n_a"),
        F.sum(1 - F.col("is_a")).alias("n_b"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    pa = (F.col("n_a") + 1).cast("double") / (F.col("tot_a") + PSI_N_BINS)
    pb = (F.col("n_b") + 1).cast("double") / (F.col("tot_b") + PSI_N_BINS)
    return (
        counts.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "bin",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            ((pa - pb) * F.log(pa / pb)).alias("psi_term"),
        )
    )


ORACLE_PSI = f"""
WITH binned AS (
  SELECT event_type,
         least({PSI_N_BINS - 1},
               greatest(0, CAST(floor(value / {500.0 / PSI_N_BINS}) AS BIGINT)))
           AS bin,
         CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 1 ELSE 0 END AS is_a
  FROM events
),
counts AS (
  SELECT event_type, bin, sum(is_a) AS n_a, sum(1 - is_a) AS n_b
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT event_type, sum(n_a) AS tot_a, sum(n_b) AS tot_b
  FROM counts GROUP BY 1
)
SELECT c.event_type, c.bin,
       CAST(c.n_a AS BIGINT) AS n_a, CAST(c.n_b AS BIGINT) AS n_b,
       ((CAST(c.n_a + 1 AS DOUBLE) / (t.tot_a + {PSI_N_BINS}))
        - (CAST(c.n_b + 1 AS DOUBLE) / (t.tot_b + {PSI_N_BINS})))
       * ln((CAST(c.n_a + 1 AS DOUBLE) / (t.tot_a + {PSI_N_BINS}))
            / (CAST(c.n_b + 1 AS DOUBLE) / (t.tot_b + {PSI_N_BINS})))
         AS psi_term
FROM counts c JOIN tot t USING (event_type)
"""


def q_drift_psi_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-stable integer-ingredient variant of :func:`q_drift_psi`
    (VERDICT r8 item 1): per (event_type, bin) before/after counts plus
    the per-type totals — all BIGINT, bit-identical in any engine. The
    PSI term is a pure function of these four integers
    (``pa=(n_a+1)/(tot_a+n_bins)`` etc.), so a driver value-hash on this
    result pins everything the float query computes except the final
    libm-vs-JVM ln ulp; the float twin keeps its local rtol pin."""
    ev = _t(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    bin_col = F.least(
        F.lit(PSI_N_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("value") / (500.0 / PSI_N_BINS))),
    ).cast("bigint")
    binned = ev.select(
        "event_type",
        bin_col.alias("bin"),
        (F.col("ts") < split).cast("int").alias("is_a"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("is_a").alias("n_a"),
        F.sum(1 - F.col("is_a")).alias("n_b"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    return counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("tot_a").cast("bigint").alias("tot_a"),
        F.col("tot_b").cast("bigint").alias("tot_b"),
    )


ORACLE_PSI_COUNTS = f"""
WITH binned AS (
  SELECT event_type,
         least({PSI_N_BINS - 1},
               greatest(0, CAST(floor(value / {500.0 / PSI_N_BINS}) AS BIGINT)))
           AS bin,
         CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 1 ELSE 0 END AS is_a
  FROM events
),
counts AS (
  SELECT event_type, bin, sum(is_a) AS n_a, sum(1 - is_a) AS n_b
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT event_type, sum(n_a) AS tot_a, sum(n_b) AS tot_b
  FROM counts GROUP BY 1
)
SELECT c.event_type, c.bin,
       CAST(c.n_a AS BIGINT) AS n_a, CAST(c.n_b AS BIGINT) AS n_b,
       CAST(t.tot_a AS BIGINT) AS tot_a, CAST(t.tot_b AS BIGINT) AS tot_b
FROM counts c JOIN tot t USING (event_type)
"""


def q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming tumbling-window aggregation driven to
    completion: 1-hour event counts + cent sums per event_type over a
    file-stream read of the events table, drained with availableNow and
    hash-compared to the batch GROUP BY oracle — the watermark-windowed
    twin of the sessionize gate row. Counts and cent sums are integers;
    the one double is the final /100 scale."""
    import tempfile
    import uuid

    from ..sources.reader import load_stream
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    stream = load_stream(spark, sf_dir, "events").select(
        "event_type", "ts", _cents("value").alias("__c")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("__c").alias("__s"))
    )
    sink = f"stream_wincounts_{uuid.uuid4().hex[:8]}"
    # complete mode: on bounded availableNow input, append-mode windowed
    # aggregation would hold back every window the final watermark has not
    # passed (the trailing hour at minimum), so the drained sink could
    # never equal the batch oracle. Complete re-emits the full window
    # table at the last commit — the right drain semantics for a bounded
    # comparison run; a production continuous run would use append +
    # watermark and emit each window once finalized.
    out = drain_available_now(
        agg, sink, output_mode="complete",
        checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_"),
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("__s").cast("double") / 100.0).alias("spend"),
    )


def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE streaming gap-sessionization: Spark's built-in
    ``session_window`` running inside a Structured Streaming plan
    (watermark + merging session state), drained with availableNow and
    gated against the SAME ORACLE_SESSIONIZE as the batch lag+running-sum
    form, the drained custom state kernel (streaming_sessionize), and the
    batch native form (sessionize_native_window) — four formulations, one
    oracle. This is the streaming class the engine's built-in state store
    manages end-to-end: sessions merge across micro-batches as late
    events bridge gaps, no user state code at all.

    Complete mode for the bounded comparison drain (same rationale as
    streaming_window_counts: append would hold back every session the
    final watermark has not passed); ``session_id`` is re-derived per
    user by start order AFTER the drain — a batch window over the tiny
    session table, not streaming state."""
    import tempfile
    import uuid

    from pyspark.sql import Window

    from ..sources.reader import load_stream
    from ..streaming.run import drain_available_now
    from .core import SESSION_GAP_S

    configure_runtime(spark)
    stream = load_stream(spark, sf_dir, "events").select("user_id", "ts")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    sink = f"stream_sesswin_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        agg, sink, output_mode="complete",
        checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_"),
    )
    w = Window.partitionBy("user_id").orderBy("session_start")
    return out.withColumn(
        "session_id", F.row_number().over(w).cast("bigint")
    ).select(
        "user_id", "session_id", "session_start", "session_end", "n_events"
    )


def q_streaming_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store INTROSPECTION gated for correctness: run the native
    session-window stream to completion, then read the query's
    checkpointed state back through Spark 4's ``statestore`` data source
    (streaming/state_reader.py) and reconstruct the session table FROM
    THE STATE FILES — not from the sink. After a complete-mode bounded
    drain the state holds exactly the final session set, so this pins
    byte-level state decoding against the same ORACLE_SESSIONIZE as the
    other four sessionization formulations. The ops capability this
    proves: audit/debug what a live 100 TB streaming job is holding in
    state (skewed keys, stuck sessions) without touching the job."""
    import tempfile
    import uuid

    from pyspark.sql import Window

    from ..sources.reader import load_stream
    from ..streaming.run import drain_available_now
    from ..streaming.state_reader import read_session_window_state
    from .core import SESSION_GAP_S

    configure_runtime(spark)
    stream = load_stream(spark, sf_dir, "events").select("user_id", "ts")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="fis_ckpt_ssi_")
    drain_available_now(
        agg, f"stream_ssi_{uuid.uuid4().hex[:8]}", output_mode="complete",
        checkpoint_dir=ckpt,
    )
    sessions = read_session_window_state(spark, ckpt)
    w = Window.partitionBy("user_id").orderBy("session_start")
    return sessions.withColumn(
        "session_id", F.row_number().over(w).cast("bigint")
    ).select(
        "user_id", "session_id", "session_start", "session_end", "n_events"
    )


ORACLE_STREAM_WINDOW_COUNTS = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS spend
FROM events
GROUP BY 1, 2
"""


STREAM_TOPK_K = 10


def q_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k leaderboard driven to completion: the 10
    highest-spending users over the events file-stream, with the SORT and
    LIMIT inside the streaming plan — Structured Streaming allows them
    only in complete output mode, where every trigger re-emits the full
    reranked table (the live-leaderboard semantics a dashboard wants).
    Rank order is total: (cents DESC, user_id) — a boundary tie at rank
    k can never make the cut ambiguous. Spend accumulates in integer
    cents; the one double is the final /100 scale.

    At 100 TB: complete mode re-emits only the k retained rows — the
    state that matters (per-user running sums) lives in the aggregation
    state store, which shuffles once on user_id and scales with distinct
    keys, not event volume; the sort after the agg sees one row per user
    per trigger and the limit prunes it to k (TakeOrderedAndProject, no
    global sort materialization). Tenth streaming class at the gate."""
    import tempfile
    import uuid

    from ..sources.reader import load_stream
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    stream = load_stream(spark, sf_dir, "events").select(
        "user_id", _cents("value").alias("__c")
    )
    board = (
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("__c").alias("__s"))
        .orderBy(F.col("__s").desc(), F.col("user_id"))
        .limit(STREAM_TOPK_K)
    )
    sink = f"stream_topk_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        board, sink, output_mode="complete",
        checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_"),
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("__s").cast("double") / 100.0).alias("spend"),
    )


ORACLE_STREAM_TOPK = f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS spend
FROM events
GROUP BY user_id
ORDER BY sum(CAST(round(value * 100) AS BIGINT)) DESC, user_id
LIMIT {STREAM_TOPK_K}
"""


def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join driven to completion: every purchase
    paired with the same user's clicks in the preceding 30 minutes, both
    sides live file streams with watermark-bounded state
    (streaming/interval_join.py), drained with availableNow and
    hash-compared to the batch interval-join oracle. The third streaming
    class at the gate (stateful sessionize, windowed agg, now a binary
    stateful join)."""
    import tempfile
    import uuid

    from ..sources.reader import load_stream
    from ..streaming.interval_join import streaming_interval_join
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    purchases = (
        load_stream(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"),
                _cents("value").alias("__c"))
    )
    clicks = (
        load_stream(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
    )
    joined = streaming_interval_join(
        clicks, purchases, ["user_id"],
        left_ts="click_ts", right_ts="purchase_ts",
        before_seconds=1800, after_seconds=0,
    )
    sink = f"stream_ivj_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        joined, sink, checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_")
    )
    return out.select(
        "user_id", "purchase_ts", "click_ts",
        (F.col("__c").cast("double") / 100.0).alias("purchase_value"),
    )


ORACLE_STREAM_INTERVAL_JOIN = """
SELECT p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
       CAST(CAST(round(p.value * 100) AS BIGINT) AS DOUBLE) / 100.0
         AS purchase_value
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
"""


# --------------------------------------------------------------------------


SHUFFLE_EPOCHS, SHUFFLE_SHARDS = 2, 8


def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-deterministic global training shuffle: every document gets a
    pseudo-random (shard, pos) read coordinate per epoch, a pure function
    of (doc_id, epoch) — reshuffle-every-epoch with no RNG state, stable
    under re-runs and restarts (operators/sampling.epoch_shuffle). Two
    epochs exported to pin that the permutations actually differ. One
    window shuffle per epoch, partitioned by shard — no global sort."""
    from ..operators.sampling import epoch_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    parts = [
        epoch_shuffle(docs, "doc_id", epoch=e, n_shards=SHUFFLE_SHARDS)
        for e in range(SHUFFLE_EPOCHS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _shuffle_epoch_sql(epoch: int) -> str:
    stride = 1_000_003 * epoch
    return f"""
SELECT CAST({epoch} AS INTEGER) AS epoch, doc_id,
       CAST(u % {SHUFFLE_SHARDS} AS INTEGER) AS shard,
       CAST(row_number() OVER (
         PARTITION BY u % {SHUFFLE_SHARDS} ORDER BY u, doc_id
       ) AS INTEGER) AS pos
FROM (
  SELECT doc_id,
         ((doc_id + {stride}) % 2147483647) * 2654435761 % 2147483647 AS u
  FROM documents
)"""


ORACLE_TRAINING_SHUFFLE = " UNION ALL ".join(
    _shuffle_epoch_sql(e) for e in range(SHUFFLE_EPOCHS)
)


FE_HI = "2024-01-30 23:59:59.999999"
FE_LO7 = "2024-01-24 00:00:00"


def _fe_decay_lo() -> str:
    """Decay-window lower bound DERIVED from the shared time-decay
    constants (anchor minus max days), so changing either constant moves
    the scan prefilter and the k-filter together — a hard-coded literal
    here silently kept excluding the old window (round-6 review fix)."""
    from datetime import date, timedelta

    anchor = date.fromisoformat(TIME_DECAY_ANCHOR)
    return (
        anchor - timedelta(days=TIME_DECAY_MAX_DAYS)
    ).isoformat() + " 00:00:00"


def q_feature_engineering_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP feature-store composition (the serving-side twin of
    training_pipeline_e2e): one plan exports the ML-ready per-user
    feature vector a model server would read — latest observation
    (as-of the anchor), trailing-7-day activity, exponentially
    time-decayed engagement (the exact shifted-integer half-life
    formulation), a population z-score of the latest value from exact
    integer moments, and the deterministic train/val/test split — all
    hash-exact.

    Plan shape: the latest-row window, the 7-day aggregate and the
    decay aggregate all key on user_id (AQE reuses the partitioning);
    the z-score moments collapse to ONE broadcast row (no second pass
    over events); the split is a projection. Left joins carry users
    whose trailing windows are empty with exact zero defaults. At
    100 TB each branch prunes its scan to its own time window before
    anything shuffles (filter_ts_range -> PushedFilters)."""
    from pyspark.sql import Window

    from ..operators.sampling import split_col
    from ..sources.reader import filter_ts_range

    ev = _t(spark, sf_dir, "events")
    cents = _cents("value")

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.select("user_id", "ts", "event_id", cents.alias("__c"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", F.col("ts").alias("last_ts"),
                F.col("__c").alias("last_cents"))
    )

    seven = (
        filter_ts_range(ev, "ts", FE_LO7, FE_HI)
        .select("user_id", cents.alias("__c"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_7d"), F.sum("__c").alias("__s7"))
    )

    k = F.datediff(F.lit(TIME_DECAY_ANCHOR).cast("date"), F.to_date("ts"))
    dk = F.col("__k")
    decay_base = (
        filter_ts_range(
            ev, "ts",
            _fe_decay_lo(), FE_HI,
        )
        .select("user_id", cents.alias("__c"), k.alias("__k"))
        .filter((dk >= 0) & (dk <= TIME_DECAY_MAX_DAYS))
    )
    wgt = F.expr(f"shiftleft(CAST(1 AS BIGINT), {TIME_DECAY_MAX_DAYS} - __k)")
    decayed = decay_base.groupBy("user_id").agg(
        (F.sum(F.col("__c") * wgt).cast("double")
         / F.lit(float((1 << TIME_DECAY_MAX_DAYS) * 100))).alias("decayed_spend"),
        (F.sum(wgt).cast("double")
         / F.lit(float(1 << TIME_DECAY_MAX_DAYS))).alias("decayed_n"),
    )

    stats = latest.agg(
        F.sum("last_cents").alias("s"),
        F.sum(F.col("last_cents") * F.col("last_cents")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double") / F.col("n")
        - (F.col("s").cast("double") / F.col("n"))
        * (F.col("s").cast("double") / F.col("n"))
    )

    return (
        latest.join(seven, "user_id", "left")
        .join(decayed, "user_id", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "last_ts",
            (F.col("last_cents").cast("double") / 100.0).alias("last_value"),
            ((F.col("last_cents").cast("double") - mean) / F.sqrt(var))
            .alias("z_last_value"),
            F.coalesce(F.col("n_7d"), F.lit(0)).cast("bigint").alias("n_7d"),
            (F.coalesce(F.col("__s7"), F.lit(0)).cast("double") / 100.0)
            .alias("spend_7d"),
            F.coalesce(F.col("decayed_spend"), F.lit(0.0)).alias("decayed_spend"),
            F.coalesce(F.col("decayed_n"), F.lit(0.0)).alias("decayed_n"),
            split_col("user_id").alias("split"),
        )
    )


ORACLE_FEATURE_E2E = f"""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
latest AS (
  SELECT user_id, ts AS last_ts, cents AS last_cents FROM (
    SELECT user_id, ts, cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM c
  ) WHERE rn = 1
),
seven AS (
  SELECT user_id, count(*) AS n_7d, sum(cents) AS s7
  FROM c WHERE ts >= TIMESTAMP '{FE_LO7}' AND ts <= TIMESTAMP '{FE_HI}'
  GROUP BY user_id
),
decayed AS (
  SELECT user_id,
         CAST(sum(cents * (CAST(1 AS BIGINT) << ({TIME_DECAY_MAX_DAYS} - k)))
              AS DOUBLE) / {float((1 << TIME_DECAY_MAX_DAYS) * 100)}
           AS decayed_spend,
         CAST(sum(CAST(1 AS BIGINT) << ({TIME_DECAY_MAX_DAYS} - k)) AS DOUBLE)
           / {float(1 << TIME_DECAY_MAX_DAYS)} AS decayed_n
  FROM (
    SELECT user_id, cents,
           datediff('day', CAST(ts AS DATE), DATE '{TIME_DECAY_ANCHOR}') AS k
    FROM c
    WHERE ts >= TIMESTAMP '{_fe_decay_lo()}'
      AND ts <= TIMESTAMP '{FE_HI}'
  )
  WHERE k BETWEEN 0 AND {TIME_DECAY_MAX_DAYS}
  GROUP BY user_id
),
stats AS (
  SELECT sum(last_cents) AS s, sum(last_cents * last_cents) AS ss,
         count(*) AS n
  FROM latest
)
SELECT l.user_id, l.last_ts,
       CAST(l.last_cents AS DOUBLE) / 100.0 AS last_value,
       (CAST(l.last_cents AS DOUBLE) - CAST(t.s AS DOUBLE) / t.n)
         / sqrt(CAST(t.ss AS DOUBLE) / t.n
                - (CAST(t.s AS DOUBLE) / t.n) * (CAST(t.s AS DOUBLE) / t.n))
         AS z_last_value,
       CAST(COALESCE(sv.n_7d, 0) AS BIGINT) AS n_7d,
       CAST(COALESCE(sv.s7, 0) AS DOUBLE) / 100.0 AS spend_7d,
       COALESCE(d.decayed_spend, 0.0) AS decayed_spend,
       COALESCE(d.decayed_n, 0.0) AS decayed_n,
       CASE WHEN ((l.user_id % 1000) * 2654435761) % 1000 < 800 THEN 'train'
            WHEN ((l.user_id % 1000) * 2654435761) % 1000 < 900 THEN 'val'
            ELSE 'test' END AS split
FROM latest l
LEFT JOIN seven sv ON sv.user_id = l.user_id
LEFT JOIN decayed d ON d.user_id = l.user_id
CROSS JOIN stats t
"""


def q_layout_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction at the gate: the events table is first
    written as 64 tiny files (the accumulated-incremental-appends
    pathology), compacted in place to a handful of right-sized files
    with an atomic directory swap (sources/layout.compact — shuffle-free
    coalesce when shrinking), then read back and aggregated: compaction
    must be exactly content-preserving while the file count collapses
    (the count reduction itself is pinned in test_sources). The oracle
    is the same aggregate over the original table."""
    import hashlib
    import os
    import tempfile

    from ..sources.layout import compact
    from ..sources.reader import read_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_compact_{tag}")
    if not os.path.exists(os.path.join(dest, "_COMPACTED")):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", _cents("value").alias("cents")
        )
        ev.repartition(64).write.mode("overwrite").parquet(dest)
        compact(spark, dest, target_rows_per_file=500_000)
        open(os.path.join(dest, "_COMPACTED"), "w").close()
    back = read_parquet(spark, dest)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


ORACLE_COMPACTION_ROUNDTRIP = ORACLE_ZORDER_ROUNDTRIP


def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per event_type,
    EXACT: for before/after the split date, D = max over observed values
    of |F_a(v) - F_b(v)|. The comparison is done on the integer
    cross-multiplied form |cum_a*n_b - cum_b*n_a| (no float CDFs, no
    epsilon), so unlike the binned+smoothed PSI the statistic is
    bin-free, parameter-free, and value-hashable; the single double is
    the final D division. One grouped count per (type, value), one
    cumulative window over the value order, one max — a shuffle on
    event_type x value and a window, both map-side combinable."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    per_value = (
        ev.select(
            "event_type",
            _cents("value").alias("v"),
            F.when(F.col("ts") < split, 1).otherwise(0).alias("in_a"),
        )
        .groupBy("event_type", "v")
        .agg(
            F.sum("in_a").alias("na"),
            F.sum(1 - F.col("in_a")).alias("nb"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = per_value.select(
        "event_type",
        F.sum("na").over(w_cum).alias("ca"),
        F.sum("nb").over(w_cum).alias("cb"),
        F.sum("na").over(w_tot).alias("ta"),
        F.sum("nb").over(w_tot).alias("tb"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max(
                F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta"))
            ).alias("ks_num"),
            F.first("ta").alias("n_before"),
            F.first("tb").alias("n_after"),
        )
        .select(
            "event_type", "ks_num", "n_before", "n_after",
            (
                F.col("ks_num").cast("double")
                / (F.col("n_before") * F.col("n_after")).cast("double")
            ).alias("ks_stat"),
        )
    )


ORACLE_DRIFT_KS = f"""
WITH per_value AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
         SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 0 ELSE 1 END) AS nb
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type,
         SUM(na) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(nb) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cb,
         SUM(na) OVER (PARTITION BY event_type) AS ta,
         SUM(nb) OVER (PARTITION BY event_type) AS tb
  FROM per_value
)
SELECT event_type,
       CAST(MAX(abs(ca * tb - cb * ta)) AS BIGINT) AS ks_num,
       CAST(ANY_VALUE(ta) AS BIGINT) AS n_before,
       CAST(ANY_VALUE(tb) AS BIGINT) AS n_after,
       CAST(MAX(abs(ca * tb - cb * ta)) AS DOUBLE)
         / CAST(ANY_VALUE(ta) * ANY_VALUE(tb) AS DOUBLE) AS ks_stat
FROM cum GROUP BY event_type
"""


NEG_K = 4


def q_training_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: 4 deterministic hash-drawn
    negatives per document with the negative's payload joined in —
    no cross join, no RNG, one uniformly-distributed equi-join
    (operators/sampling.negative_sample_pairs). The oracle replays the
    same (id, rank) hash in SQL, so the exact pairing is value-hashed,
    not just the counts."""
    from ..operators.sampling import negative_sample_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return negative_sample_pairs(docs, k=NEG_K).select(
        "doc_id", "neg_rank", "neg_doc_id", "neg_n_chars"
    )


ORACLE_NEGATIVE_PAIRS = f"""
WITH n AS (SELECT count(*) AS n FROM documents),
r AS (SELECT unnest(range(1, {NEG_K} + 1)) AS neg_rank),
neg AS (
  SELECT d.doc_id, r.neg_rank,
         (d.doc_id + 1 + (d.doc_id * {1_315_423_911}
            + r.neg_rank * {2_654_435_761}) % (n.n - 1)) % n.n AS neg_doc_id
  FROM documents d CROSS JOIN n CROSS JOIN r
)
SELECT neg.doc_id, neg.neg_rank, neg.neg_doc_id, p.n_chars AS neg_n_chars
FROM neg JOIN documents p ON p.doc_id = neg.neg_doc_id
"""


ERASE_USER_MOD = 17  # deterministic erasure set: user_id % 17 == 0


def q_compliance_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten at the gate: a deterministic erasure set
    (user_id % 17 == 0) is physically REWRITTEN out of an events copy
    (anti-join + overwrite — the parquet-lake deletion path; no
    tombstones to leak), the cleaned copy is read back, and the audit
    reports per event_type: rows kept, rows erased, cents kept, and a
    residual count of erased-user rows still present — which the oracle
    pins to ZERO, so the gate hash fails if the rewrite ever leaks a
    row. Erasure audit numbers come from the SAME read-back scan, not
    from the pre-delete frame, so they prove the physical state.

    At 100 TB: the anti-join against an erasure list is a broadcast
    (erasure requests are tiny vs the lake), and the rewrite touches
    only partitions holding matches when composed with the partitioned
    layout (scan_partitioned_events) — partition pruning bounds the
    rewrite I/O the same way it bounds reads."""
    import hashlib
    import os
    import tempfile

    from ..sources.reader import read_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_erased_{tag}")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", _cents("value").alias("cents")
        )
        kept = ev.filter(F.col("user_id") % ERASE_USER_MOD != 0)
        kept.write.mode("overwrite").parquet(dest)
    back = read_parquet(spark, dest)
    totals = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("cents").alias("kept_cents"),
            F.sum(
                F.when(F.col("user_id") % ERASE_USER_MOD == 0, 1).otherwise(0)
            ).alias("n_residual"),
        )
        .join(totals, "event_type")
        .select(
            "event_type", "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_erased"),
            "kept_cents", "n_residual",
        )
    )


ORACLE_ERASURE_AUDIT = f"""
SELECT event_type,
       CAST(SUM(CASE WHEN user_id % {ERASE_USER_MOD} != 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN user_id % {ERASE_USER_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_erased,
       CAST(SUM(CASE WHEN user_id % {ERASE_USER_MOD} != 0
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS kept_cents,
       CAST(0 AS BIGINT) AS n_residual
FROM events GROUP BY event_type
"""


def q_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish at the gate: the events projection is staged,
    the staged BYTES are audited (row count + order-independent sum/xor
    checksum must exactly match the source — recomputed from the
    read-back, so a writer bug or truncation fails the audit, never the
    live table), and only then atomically published; the query reads the
    LIVE path and aggregates. Shares the zorder/compaction roundtrip
    oracle: same content, third distinct physical path to it. The
    failing-audit branch (publish blocked, live untouched) is pinned in
    test_sources."""
    import hashlib
    import os
    import tempfile

    from ..sources.layout import AuditError, write_audit_publish
    from ..sources.reader import read_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_events_wap_{tag}")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", _cents("value").alias("cents")
        )
        want_n, want_sum = (
            ev.agg(
                F.count(F.lit(1)), F.sum(F.col("event_id") * 31 + F.col("cents"))
            ).collect()[0]
        )

        def audit(staged):
            got_n, got_sum = staged.agg(
                F.count(F.lit(1)),
                F.sum(F.col("event_id") * 31 + F.col("cents")),
            ).collect()[0]
            if (got_n, got_sum) != (want_n, want_sum):
                raise AuditError(
                    f"staged ({got_n}, {got_sum}) != source "
                    f"({want_n}, {want_sum})"
                )

        write_audit_publish(spark, ev, dest, audit)
    back = read_parquet(spark, dest)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


ORACLE_WAP = ORACLE_ZORDER_ROUNDTRIP


def q_streaming_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dual-sink stream routing driven to completion: the
    events file-stream is split into a priority lane (purchases) and a
    standard lane (everything else) by ONE foreachBatch — each
    micro-batch persists once and both lanes write it filtered into
    idempotent batch=<id> directories (streaming/router.py), so a
    retried batch overwrites itself instead of duplicating. Both lanes
    are read back and aggregated with their lane label; the oracle is
    the batch CASE split. Eleventh streaming class at the gate
    (multi-sink routing)."""
    import tempfile
    import uuid

    from ..sources.reader import load_stream
    from ..streaming.router import route_stream

    configure_runtime(spark)
    stream = load_stream(spark, sf_dir, "events").select(
        "event_id", "event_type", _cents("value").alias("__c")
    )
    base = tempfile.mkdtemp(prefix=f"fis_router_{uuid.uuid4().hex[:8]}_")
    dirs = route_stream(
        stream,
        {
            "priority": F.col("event_type") == "purchase",
            "standard": F.col("event_type") != "purchase",
        },
        base_dir=base,
        checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_"),
    )
    lanes = [
        spark.read.parquet(d).withColumn("lane", F.lit(name))
        for name, d in dirs.items()
    ]
    both = lanes[0].unionByName(lanes[1])
    return (
        both.groupBy("lane", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("__c").cast("double") / 100.0).alias("lane_value"),
        )
    )


ORACLE_STREAM_ROUTER = """
SELECT CASE WHEN event_type = 'purchase' THEN 'priority'
            ELSE 'standard' END AS lane,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS lane_value
FROM events GROUP BY 1, 2
"""


PYSTREAM_ROWS, PYSTREAM_BATCH = 10_000, 2_500


def q_streaming_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STREAMING source through the Spark 4 Python datasource API
    (sources/python_source.py SyntheticEventsStreamSource), drained
    through restart-resume: each availableNow run commits exactly one
    micro-batch of the generator and stops; the loop restarts the query
    on the SAME checkpoint until a run reports no new offsets — the
    custom source's offset/replay contract (readBetweenOffsets is a pure
    index function) plus the file sink's commit log make the composition
    exactly-once ACROSS restarts, which is precisely the recovery story
    a production stream needs. The aggregate of the accumulated sink
    hash-matches the same pure-arithmetic oracle as the batch twin.
    Twelfth streaming class. (sf_dir unused: generator source.)"""
    import tempfile
    import uuid

    from ..sources.python_source import register_stream
    from ..streaming.run import drain_available_now_to_files

    configure_runtime(spark)
    register_stream(spark)
    base = tempfile.mkdtemp(prefix=f"fis_pystream_{uuid.uuid4().hex[:8]}_")
    out_dir, ckpt = base + "/out", base + "/ckpt"
    n_runs = 0
    while n_runs < 2 * (PYSTREAM_ROWS // PYSTREAM_BATCH) + 2:
        stream = (
            spark.readStream.format("synthetic_events_stream")
            .option("n_rows", PYSTREAM_ROWS)
            .option("batch_rows", PYSTREAM_BATCH)
            .load()
        )
        back = drain_available_now_to_files(stream, out_dir, ckpt)
        n_runs += 1
        if back.count() >= PYSTREAM_ROWS:
            break
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("cents").alias("sum_cents"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
    )


ORACLE_PYTHON_STREAM = f"""
WITH gen AS (
  SELECT i AS event_id, i % 97 AS user_id,
         ['view', 'click', 'purchase', 'signup', 'error'][(i % 5) + 1]
           AS event_type,
         (i * 31) % 10000 AS cents
  FROM range(0, {PYSTREAM_ROWS}) t(i)
)
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(event_id) AS first_id,
       MAX(event_id) AS last_id
FROM gen GROUP BY event_type
"""


def q_erasure_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read erasure: the right-to-be-forgotten set
    (user_id % 37 == 0) is recorded as a DELETION VECTOR — a sidecar of
    (file, row position) pairs from the `_metadata` hidden columns — and
    the read path anti-joins the broadcast sidecar instead of rewriting
    the lake (operators/deletion_vectors.py; the copy-on-write twin is
    compliance_erasure_audit). The audit aggregates the POST-DV view and
    counts residual erased-user rows, which the oracle pins to zero —
    the gate hash fails if the vector ever misses a row position."""
    from ..operators.deletion_vectors import (
        build_deletion_vector,
        read_with_deletion_vector,
    )

    ev = _t(spark, sf_dir, "events")
    dv = build_deletion_vector(ev, F.col("user_id") % 37 == 0)
    visible = read_with_deletion_vector(ev, dv)
    return visible.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_visible"),
        (F.sum(_cents("value")).cast("double") / 100.0).alias("spend_visible"),
        F.sum(
            F.when(F.col("user_id") % 37 == 0, 1).otherwise(0)
        ).cast("bigint").alias("residual_erased"),
    )


ORACLE_ERASURE_DV = """
SELECT event_type,
       COUNT(*) AS n_visible,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS spend_visible,
       CAST(SUM(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS residual_erased
FROM events
WHERE user_id % 37 != 0
GROUP BY event_type
"""


TE_SMOOTH_M = 10  # pseudo-observations toward the global mean


def q_features_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out TARGET ENCODING — the classic high-cardinality
    categorical feature: each event's category (event_type) becomes the
    mean target (cents) of all OTHER rows of that category, plus the
    m=10 smoothed variant shrinking small categories toward the global
    mean (the Micci-Barreca formulation). LOO excludes the own row so
    the feature leaks no per-row target information into training.

    Exact plan: one tiny per-category aggregate broadcast back to the
    fact rows (5 categories here; at 10^6 categories this is still a
    broadcast — category stats are small by construction), one 1-row
    global-mean broadcast, arithmetic all integer sums with ONE double
    division per output column in a pinned expression order — no window
    over the fact table at all, so the encode is map-side after the two
    joins."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", _cents("value").alias("__c")
    )
    per_type = ev.groupBy("event_type").agg(
        F.sum("__c").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    glob = ev.agg(
        F.sum("__c").alias("__gs"), F.count(F.lit(1)).alias("__gn")
    )
    joined = (
        ev.join(F.broadcast(per_type), "event_type")
        .crossJoin(F.broadcast(glob))
    )
    loo = F.when(
        F.col("__n") > 1,
        (F.col("__s") - F.col("__c")).cast("double")
        / (F.col("__n") - 1).cast("double"),
    )
    prior = F.col("__gs").cast("double") / F.col("__gn").cast("double")
    smoothed = (
        ((F.col("__s") - F.col("__c")).cast("double")
         + F.lit(float(TE_SMOOTH_M)) * prior)
        / (F.col("__n") - 1 + TE_SMOOTH_M).cast("double")
    )
    return joined.select(
        "event_id",
        "event_type",
        loo.alias("te_loo_cents"),
        smoothed.alias("te_smooth_cents"),
    )


ORACLE_TARGET_ENCODING = f"""
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
per_type AS (
  SELECT event_type, CAST(sum(cents) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM c GROUP BY event_type
),
gstats AS (
  SELECT CAST(sum(cents) AS BIGINT) AS gs, CAST(count(*) AS BIGINT) AS gn
  FROM c
)
SELECT c.event_id, c.event_type,
       CASE WHEN n > 1
            THEN CAST(s - cents AS DOUBLE) / CAST(n - 1 AS DOUBLE)
       END AS te_loo_cents,
       (CAST(s - cents AS DOUBLE)
          + {float(TE_SMOOTH_M)} * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
         / CAST(n - 1 + {TE_SMOOTH_M} AS DOUBLE) AS te_smooth_cents
FROM c JOIN per_type USING (event_type) CROSS JOIN gstats
"""


HASH_DIM = 32  # hashed feature-vector width


def q_features_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING TRICK (Weinberger et al.): high-cardinality
    categoricals become a fixed k=32-dim feature vector with no fitted
    vocabulary — index = hash(category) mod k, sign = the hash's next
    bit, so collisions cancel in expectation and NEW categories never
    break the pipeline (the counterpart to the fitted encoder in
    features_target_encoding). Output is the sparse per-user vector:
    signed event counts and signed cent sums per occupied index.

    The hash is the engine-portable polynomial fingerprint
    (functions/text.py, acc*31+cp mod 1e9+7) — NOT xxhash64, which
    DuckDB cannot reproduce — so the oracle replays the identical
    recurrence. All arithmetic integer until the final /100."""
    from ..functions.text import fingerprint_col

    ev = _t(spark, sf_dir, "events")
    fp = fingerprint_col(F.col("event_type"))
    hashed = ev.select(
        "user_id",
        (fp % HASH_DIM).cast("int").alias("feature_idx"),
        F.when((fp / HASH_DIM).cast("bigint") % 2 == 0, 1)
        .otherwise(-1)
        .alias("__sign"),
        _cents("value").alias("__c"),
    )
    return hashed.groupBy("user_id", "feature_idx").agg(
        F.sum("__sign").cast("bigint").alias("weight_count"),
        (F.sum(F.col("__sign") * F.col("__c")).cast("double") / 100.0)
        .alias("weight_value"),
    )


ORACLE_HASHING_TRICK = f"""
WITH hashed AS (
  SELECT user_id,
         CAST(fp % {HASH_DIM} AS INTEGER) AS feature_idx,
         CASE WHEN (fp // {HASH_DIM}) % 2 = 0 THEN 1 ELSE -1 END AS sign,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM (
    SELECT user_id, value,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(event_type) + 1),
                 i -> CAST(unicode(event_type[i:i]) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007
           ) AS fp
    FROM events
  )
)
SELECT user_id, feature_idx,
       CAST(sum(sign) AS BIGINT) AS weight_count,
       CAST(sum(sign * cents) AS DOUBLE) / 100.0 AS weight_value
FROM hashed GROUP BY user_id, feature_idx
"""


def _events_sentinel_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialized events slice + far-future watermark SENTINEL rows
    (user_id = -1 in both the click and purchase role, 3 h past
    max(ts)) — the shared bounded-drain fixture for the stream-stream
    interval join queries (outer + semi). Written once per sf_dir,
    cached by an on-disk ``_done`` marker."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src = os.path.join(tempfile.gettempdir(), f"fis_events_sentinel_{tag}")
    if not os.path.exists(os.path.join(src, "_done")):
        ev = _t(spark, sf_dir, "events").select(
            "user_id", "ts", "event_type", _cents("value").alias("cents")
        )
        ev.write.mode("overwrite").parquet(src)
        far = ev.agg(
            F.max("ts").alias("m")
        ).select(
            F.lit(-1).cast("bigint").alias("user_id"),
            F.timestamp_micros(
                F.unix_micros(F.col("m")) + 3 * 3600 * 1_000_000
            ).alias("ts"),
            F.explode(F.array(F.lit("click"), F.lit("purchase")))
            .alias("event_type"),
            F.lit(0).cast("bigint").alias("cents"),
        )
        far.coalesce(1).write.mode("append").parquet(src)
        open(os.path.join(src, "_done"), "w").close()
    return src


def q_streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the second stream-join
    semantics: every click pairs with the same user's purchases in the
    following 30 minutes, and clicks with NO such purchase emit exactly
    once WITH NULLS when the watermark proves no match can still arrive
    (unmatched emission and state eviction are the same event — the
    abandoned-browse shape).

    Bounded-drain mechanics: unmatched rows only flush when the
    watermark passes them, and a finished file stream's watermark stops
    at max(ts) - delay — so the LAST window of clicks would never emit.
    The query therefore materializes the events slice ONCE with a far-
    future SENTINEL row in both roles (user_id = -1, filtered from the
    result and absent from the oracle's view of the real table); its
    only job is to push the final watermark past all real data. A live
    deployment needs none of this — the next real event does it."""
    import tempfile
    import uuid

    from ..streaming.interval_join import streaming_interval_join
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    src = _events_sentinel_path(spark, sf_dir)
    schema = "user_id bigint, ts timestamp, event_type string, cents bigint"
    hint_stream_source_bytes(spark, src)
    stream = spark.readStream.schema(schema).parquet(src)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("cents").alias("__c"),
    )
    joined = streaming_interval_join(
        clicks, purchases, ["user_id"],
        left_ts="click_ts", right_ts="purchase_ts",
        before_seconds=1800, after_seconds=0,
        how="left_outer",
    )
    sink = f"stream_ivjo_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        joined, sink, checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_")
    )
    return out.filter(F.col("user_id") >= 0).select(
        "user_id", "click_ts", "purchase_ts",
        (F.col("__c").cast("double") / 100.0).alias("purchase_value"),
    )


ORACLE_STREAM_INTERVAL_JOIN_OUTER = """
SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
       CAST(CAST(round(p.value * 100) AS BIGINT) AS DOUBLE) / 100.0
         AS purchase_value
FROM events c
LEFT JOIN events p
  ON p.event_type = 'purchase'
 AND p.user_id = c.user_id
 AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click'
"""


def q_streaming_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query — the Spark
    3.5+/4.x capability the other 16 drained classes don't exercise: a
    stream-stream interval join (clicks within 30 min before each
    purchase) feeding a tumbling-window aggregation (hourly pair counts
    + cent sums per user) in the SAME query, two state stores deep.
    Complete mode is unsupported downstream of a stream-stream join, so
    the drain runs APPEND, which only emits a window once the watermark
    passes it — the shared far-future sentinel fixture (max(ts) + 3 h in
    both roles) pushes the final watermark past every real window.
    Window width is load-bearing for the bounded drain: after the join
    the effective watermark is sentinel - 1 h delay - 30 min interval
    slack = max(ts) + 1.5 h, so HOURLY windows (last real window end <=
    max(ts) + 1 h) all flush; daily windows would strand the final day.
    A live deployment needs neither sentinel nor the width constraint —
    the next real event advances the watermark."""
    import tempfile
    import uuid

    from ..streaming.interval_join import streaming_interval_join
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    src = _events_sentinel_path(spark, sf_dir)
    schema = "user_id bigint, ts timestamp, event_type string, cents bigint"
    hint_stream_source_bytes(spark, src)
    stream = spark.readStream.schema(schema).parquet(src)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("cents").alias("__c"),
    )
    joined = streaming_interval_join(
        clicks, purchases, ["user_id"],
        left_ts="click_ts", right_ts="purchase_ts",
        before_seconds=1800, after_seconds=0,
    )
    agg = (
        joined.groupBy(
            F.window("purchase_ts", "1 hour").alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("__c").alias("__s"))
    )
    sink = f"stream_jtw_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        agg, sink, checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_")
    )
    return out.filter(F.col("user_id") >= 0).select(
        F.col("win.start").alias("window_start"),
        "user_id",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("__s").cast("bigint").alias("sum_cents"),
    )


ORACLE_STREAM_JOIN_THEN_WINDOW = """
WITH pairs AS (
  SELECT p.user_id, p.ts AS purchase_ts,
         CAST(round(p.value * 100) AS BIGINT) AS cents
  FROM events p
  JOIN events c
    ON p.event_type = 'purchase' AND c.event_type = 'click'
   AND c.user_id = p.user_id
   AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
)
SELECT CAST(date_trunc('hour', purchase_ts) AS TIMESTAMP) AS window_start,
       user_id, COUNT(*) AS n_pairs,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM pairs GROUP BY 1, 2
"""


def q_streaming_interval_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI stream-stream interval join — the 15th drained
    streaming class and the EXISTS twin of the outer join above: clicks
    that WERE followed by one of the same user's purchases within 30
    minutes emit exactly once, with only the click's columns, no matter
    how many purchases matched (the converted-browse shape; dedup of
    the match multiplicity is the state store's job, not a downstream
    DISTINCT).

    Bounded-drain mechanics are SIMPLER than the outer twin's: a semi
    row emits when its first match is observed — in-batch for a file
    drain — so no watermark proof and no sentinel is needed for
    emission. The query still reads the shared sentinel fixture (the
    materialized events slice is cached per sf_dir across both interval
    join queries); the sentinel rows are filtered like every other
    synthetic id."""
    import tempfile
    import uuid

    from ..streaming.interval_join import streaming_interval_join
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    src = _events_sentinel_path(spark, sf_dir)
    schema = "user_id bigint, ts timestamp, event_type string, cents bigint"
    hint_stream_source_bytes(spark, src)
    stream = spark.readStream.schema(schema).parquet(src)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    joined = streaming_interval_join(
        clicks, purchases, ["user_id"],
        left_ts="click_ts", right_ts="purchase_ts",
        before_seconds=1800, after_seconds=0,
        how="left_semi",
    )
    sink = f"stream_ivjs_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        joined, sink, checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_")
    )
    return out.filter(F.col("user_id") >= 0).select("user_id", "click_ts")


ORACLE_STREAM_INTERVAL_JOIN_SEMI = """
SELECT c.user_id, c.ts AS click_ts
FROM events c
WHERE c.event_type = 'click'
  AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase'
      AND p.user_id = c.user_id
      AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
  )
"""


def q_streaming_interval_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI stream-stream interval join — the 16th drained
    streaming class and the NOT-EXISTS twin of the semi join above:
    clicks followed by NONE of the same user's purchases within 30
    minutes emit exactly once (the abandoned-browse / orphan-timeout
    shape — payments without confirmation, requests without response).

    Structured Streaming has no native stream-stream anti join (the
    supported set is inner / left-right-full outer / left semi), but
    the outer join's unmatched-row semantics ARE the anti join: a LEFT
    OUTER interval join emits an unmatched left row with NULL right
    columns exactly once, when the watermark proves no match can still
    arrive — so ANTI = outer + in-stream ``right_ts IS NULL`` filter
    (stateless, pre-sink; only orphans ever reach the sink). Emission
    and state eviction are the same watermark event, hence the same
    bounded-drain sentinel mechanics as the outer twin (far-future
    sentinel rows push the final watermark past all real data; they are
    filtered from the result and absent from the oracle's view)."""
    import tempfile
    import uuid

    from ..streaming.interval_join import streaming_interval_join
    from ..streaming.run import drain_available_now

    configure_runtime(spark)
    src = _events_sentinel_path(spark, sf_dir)
    schema = "user_id bigint, ts timestamp, event_type string, cents bigint"
    hint_stream_source_bytes(spark, src)
    stream = spark.readStream.schema(schema).parquet(src)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    joined = streaming_interval_join(
        clicks, purchases, ["user_id"],
        left_ts="click_ts", right_ts="purchase_ts",
        before_seconds=1800, after_seconds=0,
        how="left_outer",
    )
    orphans = joined.filter(F.col("purchase_ts").isNull()).select(
        "user_id", "click_ts"
    )
    sink = f"stream_ivja_{uuid.uuid4().hex[:8]}"
    out = drain_available_now(
        orphans, sink, checkpoint_dir=tempfile.mkdtemp(prefix="fis_ckpt_")
    )
    return out.filter(F.col("user_id") >= 0).select("user_id", "click_ts")


ORACLE_STREAM_INTERVAL_JOIN_ANTI = """
SELECT c.user_id, c.ts AS click_ts
FROM events c
WHERE c.event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase'
      AND p.user_id = c.user_id
      AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
  )
"""
