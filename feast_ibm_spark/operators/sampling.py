"""Dataset split + sequence packing (north-star extension; no reference
counterpart — the operations a training-data pipeline runs after curation).

Both are pure Catalyst expressions (no Python UDFs) and both are
deterministic functions of the input keys, so they are exactly
reproducible across engines and across re-runs at any scale:

- ``split_col``: hash-bucketed train/val/test assignment. A multiplicative
  Knuth hash of the id modulo a fixed bucket count — membership is a pure
  function of the id (stable under re-runs, appends, repartitioning; the
  property pipelines need so late-arriving data never reshuffles old
  assignments). No shuffle at all: it is a projection.
- ``pack_sequences``: assign documents to fixed-token-budget "packs"
  (context windows) by running token count in a deterministic order —
  the distributed formulation ``pack_id = floor(cumsum_before / budget)``:
  one window shuffle, each pack overflows its budget by at most one
  document (downstream tokenizers truncate/split at the boundary), unlike
  strict greedy packing which is inherently sequential.

At 100 TB: split is map-only; packing is one range-partitioned window
(order by the id). Packing a whole corpus through ONE global window would
serialize on a single ordering — partition packing by a shard column
(``pack_sequences(..., shard_cols=[...])``), which is what real pipelines
do anyway (packs never span shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constant (2654435761 = 2^32 * phi); buckets in
# [0, SPLIT_BUCKETS). The id is reduced mod the bucket count BEFORE the
# multiply — (a*b) mod n == ((a mod n)*(b mod n)) mod n — so the product
# stays far below 2^63 for ANY bigint id (an unreduced id*SPLIT_MULT
# overflows int64 at id ~3.5e9, which Spark wraps silently and DuckDB
# raises on; pre-reduction keeps both engines exact and identical).
SPLIT_MULT = 2654435761
SPLIT_BUCKETS = 1000


def split_bucket_col(id_col: str | Column) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        (c.cast("bigint") % F.lit(SPLIT_BUCKETS)) * F.lit(SPLIT_MULT)
    ) % F.lit(SPLIT_BUCKETS)


def split_col(
    id_col: str | Column,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> Column:
    """'train' | 'val' | 'test' as a deterministic function of the id."""
    train_hi = int(round(train_frac * SPLIT_BUCKETS))
    val_hi = train_hi + int(round(val_frac * SPLIT_BUCKETS))
    b = split_bucket_col(id_col)
    return (
        F.when(b < train_hi, F.lit("train"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    budget: int,
    order_cols: list[str],
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each row a ``pack_id`` (and ``pack_offset``, the token offset
    where the row starts inside its pack) under a fixed token budget.

    ``order_cols`` must be a deterministic unique ordering within a shard
    (e.g. the document id). Documents longer than ``budget`` occupy
    ``ceil(n/budget)`` packs' worth of ids on their own — the id sequence
    stays consistent because pack_id is floor(tokens_before / budget).
    """
    w = Window.orderBy(*order_cols) if not shard_cols else Window.partitionBy(
        *shard_cols
    ).orderBy(*order_cols)
    tokens_before = F.coalesce(
        F.sum(F.col(token_count_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("bigint")
    return df.withColumn(
        "pack_id", F.floor(tokens_before / F.lit(budget)).cast("bigint")
    ).withColumn(
        "pack_offset", (tokens_before % F.lit(budget)).cast("bigint")
    )


def sample_stratified(
    df: DataFrame,
    id_col: str,
    fracs: dict[str, float] | float,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic per-group fraction sampling — a pure filter.

    Membership is ``knuth_bucket(id) < frac * SPLIT_BUCKETS``: a pure
    function of the id, so the sample is stable under re-runs, appends,
    and repartitioning, and composes with :func:`split_col` (a row's
    split assignment and its sample membership never disagree between
    pipeline stages). ``fracs`` is either one global fraction or a
    per-group-value dict (rows of unlisted groups are dropped).

    At 100 TB this is map-only: no shuffle, no count pass, predicate
    evaluated inside the scan. The trade vs :func:`take_per_group` is
    that group sizes are only approximated (frac * group size, binomial
    wobble); use take_per_group when exact counts matter more than
    avoiding a shuffle.
    """
    b = split_bucket_col(id_col)
    if isinstance(fracs, dict):
        if group_col is None:
            raise ValueError("group_col required with per-group fracs")
        cond = None
        for val, frac in fracs.items():
            hi = int(round(frac * SPLIT_BUCKETS))
            this = (F.col(group_col) == val) & (b < hi)
            cond = this if cond is None else (cond | this)
        return df.filter(cond)
    hi = int(round(fracs * SPLIT_BUCKETS))
    return df.filter(b < hi)


PRIORITY_MOD = 2_147_483_647  # 2^31 - 1; fine-grained uniform hash range


def priority_sample_per_group(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weight-proportional sampling: keep the ``k`` rows
    with the SMALLEST priority ``q_i = u_i / w_i`` per group — priority
    sampling (Duffield, Lund & Thorup, "Priority sampling for estimation
    of arbitrary subset sums", JACM 2007), with the uniform ``u_i``
    replaced by a fixed multiplicative hash of the id so the sample is a
    pure function of the data: stable under re-runs, appends of OTHER
    rows, repartitioning, and reproducible in any engine.

    Heavier rows draw smaller priorities, so inclusion probability rises
    with weight — the weighted analogue of :func:`take_per_group`.
    Cross-engine hashability: ``u_i`` is exact integer arithmetic
    (``(id * SPLIT_MULT) mod (2^31-1)``, plus 1 to avoid priority 0) and
    the only float op is ONE IEEE division — correctly rounded, hence
    bit-identical everywhere; ties (astronomically unlikely) break on id.

    Cost: one window shuffle on ``group_cols``. With no groups the window
    is UNPARTITIONED — every row sorts through one task, so the no-group
    path is bounded by a single executor's memory/CPU; at scale either
    pass ``group_cols`` or pre-reduce with a per-partition top-k before a
    global merge. ``weight_col`` must be
    a positive integer column (use exact cents for money weights).
    Output adds ``priority`` (the sampling key, useful for
    Horvitz-Thompson-style subset-sum estimation downstream).
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # id pre-reduced mod PRIORITY_MOD so the product never overflows
    # int64 (max (2^31-2)*SPLIT_MULT < 2^63); identical value for all ids.
    u = (
        (F.col(id_col).cast("bigint") % F.lit(PRIORITY_MOD))
        * F.lit(SPLIT_MULT)
    ) % F.lit(PRIORITY_MOD) + F.lit(1)
    prio = u.cast("double") / wcol.cast("double")
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy(prio.asc(), F.col(id_col).asc())
    return (
        df.withColumn("priority", prio)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def take_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    targets: dict[str, int],
) -> DataFrame:
    """EXACT-count deterministic sampling: the first ``targets[g]`` rows
    of each group in (knuth_bucket, id) order — domain mixing with hard
    caps (e.g. "200 en docs, 60 of each other language" to hit a target
    language distribution in a training mix).

    The (bucket, id) order is a reproducible shuffle of each group (the
    multiplicative hash decorrelates bucket order from id order), so the
    selection is unbiased-ish yet exactly reproducible cross-engine —
    unlike fraction sampling there is no size wobble; unlike
    ``ORDER BY random()`` it is deterministic.

    Cost: one shuffle on ``group_col`` for the per-group row_number
    window. Group cardinality is the skew axis — a group whose rows all
    land in one partition bounds the window; with few huge groups (the
    domain-mixing case: one group per language/source), pre-aggregate
    pushdown does not apply and a hot group's history sorts in one task.
    For that shape prefer bucketed layouts or sample_stratified with a
    measured frac when the per-group row count exceeds executor memory.
    """
    w = Window.partitionBy(group_col).orderBy(
        split_bucket_col(id_col).asc(), F.col(id_col).asc()
    )
    cap = None
    for val, n in targets.items():
        this = F.when(F.col(group_col) == val, F.lit(n))
        cap = this if cap is None else cap.when(F.col(group_col) == val, F.lit(n))
    cap = cap.otherwise(F.lit(0))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def chunk_documents(
    df,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Split documents into fixed-token chunks with optional overlap —
    the pretraining/RAG chunker. Pure Catalyst higher-order functions
    (split -> sequence of chunk starts -> slice + array_join per chunk ->
    posexplode), so the whole operator is a map-side pipeline: no
    shuffle, no Python, chunks stream out of the scan stage. Output:
    (id, chunk_idx, chunk_text, n_tokens); the final chunk may be short,
    and every token appears in at least one chunk (stride =
    chunk_tokens - overlap_tokens > 0 enforced)."""
    from pyspark.sql import functions as F

    stride = chunk_tokens - overlap_tokens
    if stride <= 0:
        raise ValueError("overlap_tokens must be smaller than chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # canonical chunk count: ceil((n - overlap) / stride), min 1 — a tail
    # that fits entirely inside the previous chunk's overlap gets NO
    # redundant chunk of its own
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(toks) - overlap_tokens) / F.lit(stride)).cast("int"),
    )
    starts = F.sequence(
        F.lit(0), (n_chunks - 1) * stride, F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(
            F.slice(toks, s + 1, chunk_tokens), " "
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn(
            "n_tokens", F.size(F.split(F.col("chunk_text"), r"\s+"))
        )
    )


EPOCH_STRIDE = 1_000_003  # prime offset decorrelating successive epochs


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic global training-shuffle for one epoch: every row
    gets a pseudo-random ``(shard, pos)`` coordinate that is a pure
    function of ``(id, epoch)`` — the order a data loader reads shard
    files in. Epoch e and epoch e+1 are decorrelated permutations of
    the same corpus (the multiplicative hash of ``id + e*EPOCH_STRIDE``),
    so "reshuffle every epoch" needs no RNG state, survives re-runs and
    job restarts mid-epoch, and two engines agree row-for-row.

    Cost: one shuffle — the per-shard position window partitions on
    ``shard`` (pick ``n_shards`` ≈ output-file count; each shard sorts
    independently, so no global sort and no single-task bottleneck).
    The hash pre-reduces the id mod PRIORITY_MOD before multiplying, so
    arithmetic is overflow-free for any bigint id in Spark AND the SQL
    oracle (the round-6 split_bucket_col fix applies here too).
    """
    u = (
        (
            (F.col(id_col).cast("bigint") + F.lit(epoch * EPOCH_STRIDE))
            % F.lit(PRIORITY_MOD)
        )
        * F.lit(SPLIT_MULT)
    ) % F.lit(PRIORITY_MOD)
    shard = (u % F.lit(n_shards)).cast("int")
    w = Window.partitionBy(F.lit(epoch), shard).orderBy(
        u.asc(), F.col(id_col).asc()
    )
    return df.select(
        F.lit(epoch).cast("int").alias("epoch"),
        F.col(id_col),
        shard.alias("shard"),
        F.row_number().over(w).alias("pos"),
    )


NEG_A, NEG_B = 1_315_423_911, 2_654_435_761  # odd mixing constants


def negative_sample_pairs(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    row gets ``k`` pseudo-random OTHER rows as negatives, with no
    cross join, no RNG state, and no driver loop — the negative index is
    a pure hash of (id, rank):

        off  = 1 + (id * NEG_A + rank * NEG_B) % (n - 1)
        neg  = (id + off) % n

    ``off`` is in [1, n-1], so a row can never draw itself. Requires
    DENSE ids 0..n-1 (rank first otherwise — a one-time global sort, or
    reuse an existing dense index). The mix stays within int64 while
    n * NEG_A < 2^63, i.e. up to ~7e9 rows — reduce id modulo a smaller
    range first past that (the priority_sample_per_group lesson).

    Plan shape: one scalar count (broadcast), a map-side explode to k
    rows, and ONE equi-join on the computed index to materialize the
    negative's payload — shuffle on the join key only, uniformly
    distributed by construction (no skew, no hot partition).

    Output: (id, neg_rank 1..k, neg_<id_col>) plus the negative row's
    payload columns prefixed ``neg_``.
    """
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    payload = [c for c in df.columns if c != id_col]
    neg_side = df.select(
        F.col(id_col).alias("__neg_join"),
        *[F.col(c).alias(f"neg_{c}") for c in payload],
    )
    off = 1 + (
        F.col(id_col) * F.lit(NEG_A) + F.col("neg_rank") * F.lit(NEG_B)
    ) % (F.col("__n") - 1)
    return (
        df.select(id_col)
        .crossJoin(F.broadcast(total))  # 1-row scalar, not a real cross
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
            "__n",
        )
        .withColumn(
            f"neg_{id_col}", (F.col(id_col) + off) % F.col("__n")
        )
        .drop("__n")
        .join(neg_side, F.col(f"neg_{id_col}") == F.col("__neg_join"))
        .drop("__neg_join")
    )


# gear weights for the content-defined-chunking rolling hash (8 odd
# primes; window L=8 chars). Integer-exact: code < 0x110000 and
# sum(code * W) < 2^56, so the hash never overflows or rounds — the
# same engine-exactness recipe as fingerprint_col / pagerank.
CDC_WEIGHTS = (3, 31, 331, 3331, 33331, 333331, 3333331, 33333331)
CDC_WINDOW = len(CDC_WEIGHTS)


def cdc_chunks(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 128,
):
    """Content-defined chunking (basic CDC, gear-style): split each
    document at positions where a rolling hash of the trailing
    ``CDC_WINDOW`` characters is divisible by ``divisor`` — so chunk
    boundaries are a function of LOCAL content, not absolute offsets.
    Inserting or deleting text re-chunks only the neighborhood of the
    edit (every boundary further than the hash window from the edit is
    byte-identical), which is what makes CDC the standard primitive for
    incremental storage dedup and for caching per-chunk artifacts
    (embeddings, fingerprints) across document revisions; fixed-size
    chunking invalidates every chunk after an insert. Basic CDC: no
    min/max clamps (those make the scan stateful); expected chunk
    length is ``divisor`` chars, and a doc whose hash never fires is
    one whole-doc chunk.

    Output: (id, chunk_idx, chunk_start, chunk_len, chunk_hash) —
    chunk_idx 0-based in document order, chunk_start 1-based,
    chunk_hash the same base-31 polynomial as ``fingerprint_col`` over
    the chunk's characters (integer-exact, engine-reproducible — no
    xxhash, which DuckDB cannot replicate). Empty documents emit no
    chunks.

    Plan shape: posexplode chars -> one per-doc window (lag x8 for the
    gear hash + a running boundary count) -> per-chunk aggregate. The
    window sorts each doc's characters in one task: a whale document is
    the sessionize/spans class (sort-bound, spill-safe, O(1) running
    state) — see NOTES.md "Whale/flood taxonomy index".
    """
    from pyspark.sql import Window

    from ..functions.text import FP_BASE, FP_MOD

    codes = df.filter(F.length(text_col) > 0).select(
        F.col(id_col),
        F.posexplode(F.transform(F.split(text_col, ""), F.ascii)).alias(
            "__pos0", "__code"
        ),
    ).select(id_col, (F.col("__pos0") + 1).cast("bigint").alias("__pos"),
             F.col("__code").cast("bigint").alias("__code"))

    w = Window.partitionBy(id_col).orderBy("__pos")
    gear = None
    for k, wt in enumerate(CDC_WEIGHTS):
        term = F.lag("__code", k).over(w) * F.lit(wt)
        gear = term if gear is None else gear + term
    flagged = codes.withColumn(
        "__cut",
        (
            (F.col("__pos") >= CDC_WINDOW) & (gear % divisor == 0)
        ).cast("int"),
    ).withColumn(
        "__chunk",
        F.coalesce(
            F.sum("__cut").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return (
        flagged.groupBy(id_col, F.col("__chunk").alias("chunk_idx"))
        .agg(
            F.min("__pos").alias("chunk_start"),
            F.count(F.lit(1)).alias("chunk_len"),
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__pos", "__code"))
                    ),
                    lambda s: s["__code"],
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: (acc * FP_BASE + x) % FP_MOD,
            ).alias("chunk_hash"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            "chunk_start",
            "chunk_len",
            "chunk_hash",
        )
    )
