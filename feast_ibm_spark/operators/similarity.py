"""Similarity search over embedding columns (north-star extension).

- ``cosine_topk``      — brute-force cosine top-k: broadcast the (small)
  query set against the full corpus; one pass, no shuffle of the corpus.
  The baseline and the correctness oracle for approximate variants.
- ``near_dup_pairs``   — all corpus pairs with cosine >= threshold
  (embedding-based near-duplicate detection).
- ``lsh_cosine_topk``  — random-hyperplane LSH bucketing: candidates meet
  in sign-pattern buckets; top-k computed over candidates only. Turns the
  q x n product into an equi-join on bucket signatures.
- ``ivf_cosine_topk``  — inverted-file (IVF) index: corpus assigned to
  Voronoi cells once, queries probe their n_probe nearest cells. The
  scale path when the query set is large.

Numerics: final SCORING is always a strict left-to-right fold over
``double``-cast elements (``F.aggregate`` over ``zip_with``), so reported
cosines are bit-identical to any engine folding the same way (the DuckDB
oracle uses list_reduce over the same element order) — including in the
approximate variants, whose candidate-generation stages use vectorized
Arrow/numpy Pandas UDFs (dense matmuls are the documented exception to
"stay in built-in expressions").
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .spread import input_size_bytes, spread_for_udf

# Round 13: the guarded unrolled scoring kernel (round 12) beats the
# interpreted HOF fold per ELEMENT (~2x at high volume), but its ~500-node
# expression tree costs a per-RUN constant (~0.2-0.5 s of codegen/JIT —
# the generated method embeds fresh expression ids, so the compile is not
# amortized across runs) that exceeds the savings at small pair volumes:
# the r12 driver bench measured the knn family 1.3-1.6x SLOWER unrolled
# at sf0.1. Measured crossover (round 13, same-host interleaved A/Bs on
# sf0.1 embeddings scaled up to 32x): fold wins at <=1.3M pair scorings
# (sf0.1 brute force 0.59 vs 1.13 s; 32x corpus with 8 queries 0.84 vs
# 0.92), unroll wins from ~10M scorings up (10M: 1.53 vs 2.01; 41M: 3.10
# vs 6.46) — the break-even sits near ~5M scorings. Pair volume is not
# knowable without a job, so the gate uses the corpus's file bytes
# (driver-side listing, no job — the curation auto-tier convention) as
# the row-count proxy, with TWO thresholds by operator shape:
#
# - query-driven operators (|q| x bounded-candidates volumes: top-k,
#   rank stats, the LSH/IVF/PQ tiers): 32 MiB — scoring volume reaches
#   the crossover only with far more corpus than the bench scales carry;
# - the corpus-QUADRATIC self-pair operator (near_dup_pairs, n^2/2
#   scorings): 512 KiB — sf0.1's 0.78 MB corpus is already 12.5M pairs,
#   past the crossover (measured: unroll 1.25 vs fold 1.36 s).
#
# Below the threshold the pure fold scores the pairs; above it, or when
# the input size is unknowable (derived frames — the scale-safe
# default), the unrolled chain takes over. Both paths are bit-identical
# by construction, so the gate trades only constant overheads.
UNROLL_MIN_INPUT_BYTES = 32 << 20
UNROLL_MIN_INPUT_BYTES_SELF_PAIRS = 512 << 10


def _kernel_dim(
    corpus: DataFrame, dim: int | None, threshold: int | None = None
) -> int | None:
    """The ``dim`` to hand the scoring kernel for this corpus: ``None``
    (pure fold) below the measured input-bytes crossover, the real
    ``dim`` (guarded unrolled chain) above it or when the corpus is not
    file-backed. Structural uses of ``dim`` (subspace widths, hyperplane
    construction) must keep the caller's value — this gate only picks
    the scoring-kernel shape."""
    if dim is None:
        return None
    if threshold is None:
        threshold = UNROLL_MIN_INPUT_BYTES
    size = input_size_bytes(corpus)
    if size is not None and size < threshold:
        return None
    return dim


def _fold_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _fold_norm_sq(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _unrolled_sum(terms):
    """((0.0 + t0) + t1) + ... — the SAME left-to-right double-addition
    sequence the ``F.aggregate`` fold performs, as a static expression."""
    import functools
    import operator

    return functools.reduce(operator.add, terms, F.lit(0.0))


def _sql_name(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


# SQL twins of _fold_dot / _fold_norm_sq (identical expression trees after
# parsing: same casts, same 0.0D double seed, same left-to-right fold)
_FOLD_DOT_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS "
    "DOUBLE)), 0.0D, (acc, v) -> acc + v)"
)
_FOLD_NORM_SQL = (
    "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "0.0D, (acc, v) -> acc + v)"
)


def _dot_sql(a: str, b: str, dim: int) -> str:
    """The guarded unrolled dot kernel as ONE SQL string. Building the
    64-term chain through the Column API costs hundreds of py4j round
    trips per instantiation (measured: the knn query family spent 60-80%
    of its bench time in driver-side query CONSTRUCTION); parsing a
    single expr string moves that to one JVM call with an identical
    expression tree."""
    ra, rb = _sql_name(a), _sql_name(b)
    s = "0.0D"
    for i in range(dim):
        s = f"({s} + (CAST({ra}[{i}] AS DOUBLE) * CAST({rb}[{i}] AS DOUBLE)))"
    fold = _FOLD_DOT_SQL.format(a=ra, b=rb)
    return (
        f"CASE WHEN (size({ra}) = {dim}) AND (size({rb}) = {dim}) "
        f"THEN {s} ELSE {fold} END"
    )


def _norm_sq_sql(a: str, dim: int) -> str:
    ra = _sql_name(a)
    s = "0.0D"
    for i in range(dim):
        s = f"({s} + (CAST({ra}[{i}] AS DOUBLE) * CAST({ra}[{i}] AS DOUBLE)))"
    fold = _FOLD_NORM_SQL.format(a=ra)
    return f"CASE WHEN (size({ra}) = {dim}) THEN {s} ELSE {fold} END"


def _dot(a, b, dim: int | None = None):
    """Strict left-to-right dot fold; with ``dim`` set, rows whose arrays
    are exactly ``dim`` long take an UNROLLED static sum chain instead of
    the interpreted higher-order-function fold — bit-identical (identical
    addition order) and measured ~3x faster at pair-scoring volume
    (NOTES/OPTIMIZATION_r12: 4M 64-dim pairs 23s fold -> 8s guarded; the
    HOF fold runs interpreted per element, guide §4.1). Rows of any OTHER
    length (ragged input) fall through to the fold, so semantics are
    unchanged for every input; ``dim=None`` keeps the pure fold.

    ``a``/``b`` may be plain column NAMES (str) — with ``dim`` set that
    path builds the whole kernel as one parsed SQL string (one py4j call
    instead of ~300; see :func:`_dot_sql`)."""
    if isinstance(a, str) and isinstance(b, str) and dim is not None:
        return F.expr(_dot_sql(a, b, dim))
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    if dim is None:
        return _fold_dot(a, b)
    unrolled = _unrolled_sum(
        [a[i].cast("double") * b[i].cast("double") for i in range(dim)]
    )
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), unrolled
    ).otherwise(_fold_dot(a, b))


def _norm_sq(a, dim: int | None = None):
    """Squared L2 norm fold; same guarded-unroll tier (and one-shot SQL
    construction for str inputs) as :func:`_dot`."""
    if isinstance(a, str) and dim is not None:
        return F.expr(_norm_sq_sql(a, dim))
    a = F.col(a) if isinstance(a, str) else a
    if dim is None:
        return _fold_norm_sq(a)
    unrolled = _unrolled_sum(
        [a[i].cast("double") * a[i].cast("double") for i in range(dim)]
    )
    return F.when(F.size(a) == dim, unrolled).otherwise(_fold_norm_sq(a))


def cosine_col(a, b, dim: int | None = None):
    """cos(a, b) as a deterministic double expression."""
    if isinstance(a, str) and isinstance(b, str) and dim is not None:
        return F.expr(
            f"({_dot_sql(a, b, dim)}) / (SQRT({_norm_sq_sql(a, dim)}) * "
            f"SQRT({_norm_sq_sql(b, dim)}))"
        )
    return _dot(a, b, dim) / (
        F.sqrt(_norm_sq(a, dim)) * F.sqrt(_norm_sq(b, dim))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector (cosine).

    ``dim``: known embedding dimensionality — enables the guarded
    unrolled scoring kernel (see :func:`_dot`; bit-identical, rows of
    any other length fall back to the fold).

    Physical shape: broadcast(queries) x corpus -> BroadcastNestedLoopJoin
    producing |q| x |n| candidate rows WITHOUT shuffling the corpus, then a
    window top-k per query (shuffle keyed by query id — |q| keys). Ties
    broken by corpus id for full determinism. Self-matches excluded.
    """
    qid = query_id_col or f"q_{id_col}"
    dim = _kernel_dim(corpus, dim)  # fold below the unroll crossover
    # precompute each side's squared norm ONCE per vector (not per pair):
    # same fold -> bit-identical to recomputing, but 3x fewer flops
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(qid),
            F.col(vec_col).alias("q_vec"),
            _norm_sq(vec_col, dim).alias("q_nsq"),
        )
    )
    # spread the per-pair scoring across cores even off a one-file corpus,
    # sized from input bytes (operators/spread.py)
    c = spread_for_udf(corpus, id_col).select(
        F.col(id_col), F.col(vec_col), _norm_sq(vec_col, dim).alias("c_nsq")
    )
    scored = q.join(c, F.col(qid) != F.col(id_col)).withColumn(
        "cosine",
        _dot("q_vec", vec_col, dim)
        / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("c_nsq"))),
    )
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(qid, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def retrieval_rank_stats(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Label-relevance ranking eval over exact cosine: for each query
    vector, rank EVERY other corpus vector (cosine desc, id asc — total
    order, fully deterministic) and aggregate where the query's label
    reappears: ``first_hit_rank`` (the MRR ingredient, kept as the raw
    integer rank — 1/rank is the caller's one division), ``hits_at_k``
    (the precision@k numerator) and ``n_relevant`` (the recall
    denominator). Every output column is an INTEGER — rank statistics,
    not scores — so the result value-hashes across engines given the
    established sequential-fold cosine parity (knn_cosine_topk's
    oracle discipline); no NDCG-style log discount sneaks a float in.

    Physical shape: same as :func:`cosine_topk` — broadcast(queries) x
    corpus scoring without shuffling the corpus, one window keyed by
    query id (|q| keys), then a per-query aggregate; the full ranking
    is never materialized beyond the window pass.
    """
    qid = query_id_col or f"q_{id_col}"
    dim = _kernel_dim(corpus, dim)  # fold below the unroll crossover
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(qid),
            F.col(label_col).alias("__q_label"),
            F.col(vec_col).alias("q_vec"),
            _norm_sq(vec_col, dim).alias("q_nsq"),
        )
    )
    c = spread_for_udf(corpus, id_col).select(
        F.col(id_col), F.col(label_col), F.col(vec_col),
        _norm_sq(vec_col, dim).alias("c_nsq"),
    )
    scored = q.join(c, F.col(qid) != F.col(id_col)).withColumn(
        "cosine",
        _dot("q_vec", vec_col, dim)
        / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("c_nsq"))),
    )
    w = Window.partitionBy(qid).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    hit = F.col(label_col) == F.col("__q_label")
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .groupBy(qid, F.col("__q_label").alias("q_label"))
        .agg(
            F.sum(hit.cast("bigint")).alias("n_relevant"),
            F.min(F.when(hit, F.col("__rank"))).cast("bigint")
            .alias("first_hit_rank"),
            F.sum((hit & (F.col("__rank") <= k)).cast("bigint"))
            .alias("hits_at_k"),
        )
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All unordered corpus pairs with cosine >= threshold.

    Brute-force O(n^2/2) — exact baseline. At 100 TB use
    ``near_dup_pairs_lsh`` (sign-bucket blocking, same scoring kernel).
    Norms are precomputed per vector (n folds) instead of per pair
    (n^2 folds); the probe side is repartitioned so the O(n^2) scoring
    parallelizes even off a one-file corpus."""
    # quadratic scoring volume: the unroll pays off at a far smaller
    # corpus than the query-driven operators — see _kernel_dim
    dim = _kernel_dim(corpus, dim, UNROLL_MIN_INPUT_BYTES_SELF_PAIRS)
    a = spread_for_udf(corpus, id_col).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm_sq(vec_col, dim).alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm_sq(vec_col, dim).alias("nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _dot("va", "vb", dim)
            / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 0x51AE5):
    """Deterministic pseudo-random hyperplanes (fixed seed)."""
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each vector gets ``n_tables`` bucket signatures (one per table,
    ``n_planes`` sign bits each); query and corpus rows meet via an
    equi-join on (table, signature). Probe cost ~ bucket occupancy instead
    of |corpus|. Recall is tunable with n_planes/n_tables; results are a
    subset of the exact ``cosine_topk`` output (same scoring kernel).

    Physical shape: the signature stage is a *vectorized Pandas UDF* — one
    Arrow batch in, one (batch x planes) numpy matmul + sign + bit-pack
    out. This is the documented exception to "stay in built-ins": a dense
    dot against ``n_tables * n_planes`` hyperplanes per row is exactly the
    workload where an interpreted higher-order-function fold is 100x
    slower than BLAS. The FINAL scoring still uses the strict fold kernel
    (``cosine_col``) so reported cosines stay bit-identical to the exact
    path. Candidates are deduped on the id pair BEFORE scoring so each
    surviving pair pays the O(dim) kernel once; the corpus side is
    repartitioned so signature work parallelizes even off a 1-file source.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    planes = _hyperplanes(dim, n_planes * n_tables)
    plane_mat = np.asarray(planes, dtype=np.float64)  # (T*P, dim)
    pack_w = (2 ** np.arange(n_planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def table_sigs(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (mat @ plane_mat.T >= 0).astype(np.int64)  # (batch, T*P)
        packed = bits.reshape(len(mat), n_tables, n_planes) @ pack_w
        return pd.Series(list(packed))

    def melt(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode(table_sigs(F.col(vec_col))).alias("t", "sig"),
        )

    qid = f"q_{id_col}"
    q_m = melt(queries, qid, "q_vec")
    c_m = melt(spread_for_udf(corpus, id_col), id_col, vec_col)

    cand = (
        F.broadcast(q_m)
        .join(c_m, ["t", "sig"])
        .filter(F.col(qid) != F.col(id_col))
        .groupBy(qid, id_col)
        .agg(F.first("q_vec").alias("q_vec"), F.first(vec_col).alias(vec_col))
    )
    # norms once per surviving pair side; the dot is the only per-pair fold
    kdim = _kernel_dim(corpus, dim)  # fold below the unroll crossover
    scored = cand.withColumn(
        "cosine",
        _dot("q_vec", vec_col, kdim)
        / (F.sqrt(_norm_sq("q_vec", kdim))
           * F.sqrt(_norm_sq(vec_col, kdim))),
    )
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(qid, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Train IVF centroids with MLlib k-means|| (distributed Lloyd).

    Returns plain ``list[list[float]]`` so the result can be fed to
    ``ivf_cosine_topk(centroids=...)``, cached, or serialized — the index
    "model" is just these vectors. Deterministic for a fixed seed and
    input. Training cost is O(iters * n * k) distributed; at 100 TB train
    on a sample (``corpus.sample(...)``) — centroid quality converges long
    before the full corpus is seen."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


# seed centroids per (input files, id_col, vec_col, n_cells) — see
# ivf_cosine_topk; values are small ndarrays (n_cells x dim)
_SEED_CENTROID_CACHE: dict = {}


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    The scale path for LARGE query sets: corpus vectors are assigned to
    ``n_cells`` Voronoi cells once (an O(n * n_cells) matmul, vectorized
    per Arrow batch); each query probes only its ``n_probe`` nearest
    cells, so probe cost is ~ ``n_probe / n_cells`` of the corpus instead
    of all of it, and the candidate meet is a plain equi-join on the cell
    id — shuffle keyed by cell, no all-pairs product.

    ``centroids`` (e.g. from :func:`train_ivf_centroids`, k-means||) give
    the production-quality cells; when omitted, deterministic seed
    centroids (the ``n_cells`` lowest-id corpus vectors, L2-normalized)
    keep the operator self-contained and reproducible. Final scoring uses
    the strict fold kernel, so reported cosines are bit-identical to the
    exact path — recall, not precision, is what n_probe trades.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        n_cells = len(centroids)
    else:
        # The seed-centroid pick is a full-scan top-k job; for a stable
        # file-backed corpus it is the same 16 rows every call, so cache
        # per (files, id_col, n_cells) — the in-process analogue of
        # persisting the trained index vectors to a model table (which is
        # all an IVF "index" is, see train_ivf_centroids).
        cache_key = None
        files = tuple(sorted(corpus.inputFiles()))
        if files:
            cache_key = (files, id_col, vec_col, n_cells)
        cents = _SEED_CENTROID_CACHE.get(cache_key) if cache_key else None
        if cents is None:
            cent_rows = (
                corpus.orderBy(F.col(id_col).asc())
                .limit(n_cells)
                .select(vec_col)
                .collect()
            )
            cents = np.asarray([r[0] for r in cent_rows], dtype=np.float64)
            if cache_key:
                _SEED_CENTROID_CACHE[cache_key] = cents
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    # known dimensionality (from the index vectors) enables the guarded
    # unrolled scoring kernel above the crossover — see _dot/_kernel_dim
    dim = _kernel_dim(corpus, int(cents.shape[1]))

    @pandas_udf(LongType())
    def nearest_cell(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ cents.T, axis=1).astype(np.int64))

    @pandas_udf(ArrayType(LongType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents.T
        order = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int64)
        return pd.Series(list(order))

    qid = f"q_{id_col}"
    # norms precomputed ONCE per vector (1 fold each side) so each candidate
    # pair pays a single dot-product fold, not three
    c_assigned = spread_for_udf(corpus, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        _norm_sq(vec_col, dim).alias("c_nsq"),
        nearest_cell(F.col(vec_col)).alias("cell"),
    )
    q_m = queries.select(
        F.col(id_col).alias(qid),
        F.col(vec_col).alias("q_vec"),
        _norm_sq(vec_col, dim).alias("q_nsq"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )

    scored = (
        F.broadcast(q_m)
        .join(c_assigned, "cell")
        .filter(F.col(qid) != F.col(id_col))
        .withColumn(
            "cosine",
            _dot("q_vec", vec_col, dim)
            / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("c_nsq"))),
        )
    )
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(qid, id_col, "cosine", F.col("__rn").alias("rank"))
    )


# Auto-config constants for near_dup_pairs_lsh (see lsh_auto_config):
# below AUTO_MIN_ROWS the historical (4, 16, uncapped) config is provably
# safe AND is the byte-stable oracle-pinned gate shape, so auto resolves
# to it exactly; above, planes target an expected uniform bucket size of
# AUTO_TARGET_BUCKET, tables chase AUTO_RECALL within AUTO_MAX_TABLES,
# and a star-handled work cap of 8x the target bucket backstops skew.
AUTO_MIN_ROWS = 4096
AUTO_TARGET_BUCKET = 64
AUTO_MAX_PLANES = 24
AUTO_MAX_TABLES = 64
AUTO_RECALL = 0.95


def lsh_auto_config(
    n_rows: int, threshold: float
) -> tuple[int, int, int | None, float]:
    """Resolve (n_planes, n_tables, max_bucket_size, est_recall) for
    ``near_dup_pairs_lsh``'s ``"auto"`` arguments from the corpus size.

    The failure mode this closes (measured, round-5 10x smoke): the
    signature space per table is fixed at 2^n_planes, so with the
    historical 4-plane default bucket population grows LINEARLY with the
    corpus and the bucket self-join goes quadratic (~2x10^8 candidates
    at 20k vectors; effectively non-terminating). The auto rule:

    - n_rows <= AUTO_MIN_ROWS: the historical (4, 16, uncapped) config —
      every bucket is small, and this is the byte-stable shape the
      driver oracle pins (gate scales are 500 / 2000 vectors).
    - above: n_planes = ceil(log2(n_rows / AUTO_TARGET_BUCKET)) clamped
      to [4, AUTO_MAX_PLANES] — expected uniform bucket size stays
      ~AUTO_TARGET_BUCKET no matter the corpus; n_tables = the count
      that reaches AUTO_RECALL at this threshold's per-table collision
      probability p1^planes (p1 = 1 - acos(threshold)/pi), clamped to
      AUTO_MAX_TABLES; max_bucket_size = 8x the target bucket with star
      handling — a work bound that only binds on skewed (clustered)
      sign buckets, which hold mostly dissimilar vectors anyway (the
      measured star-recall analysis in near_dup_pairs_lsh's docstring).

    Returns est_recall = 1-(1-p1^planes)^tables for the chosen config so
    callers/tests can see what the table clamp cost: at low thresholds
    (0.4) sign-LSH cannot be simultaneously sparse and high-recall —
    the clamp yields ~0.64 there, rising to >0.95 for threshold >= 0.7
    where the collision probability affords the planes. Callers needing
    guaranteed recall at low thresholds should use minhash-LSH on text
    shingles or the exact tier on a pre-filtered candidate set.
    """
    p1 = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    if n_rows <= AUTO_MIN_ROWS:
        planes, tables, cap = 4, 16, None
    else:
        planes = max(
            4,
            min(
                AUTO_MAX_PLANES,
                math.ceil(math.log2(max(2.0, n_rows / AUTO_TARGET_BUCKET))),
            ),
        )
        p = p1**planes
        want = (
            math.ceil(math.log(1.0 - AUTO_RECALL) / math.log(1.0 - p))
            if 0.0 < p < 1.0
            else 1
        )
        tables = max(1, min(AUTO_MAX_TABLES, want))
        cap = 8 * AUTO_TARGET_BUCKET
    est = 1.0 - (1.0 - p1**planes) ** tables
    return planes, tables, cap, est


def near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | str = "auto",
    n_tables: int | str = "auto",
    max_bucket_size: int | str | None = "auto",
    oversize: str = "star",
) -> DataFrame:
    """Scale path for ``near_dup_pairs``: hyperplane-LSH blocking instead
    of the O(n^2/2) product.

    Both occurrences of a pair must share a (table, signature) bucket to
    become a candidate — an equi-self-join on the bucket key. Candidates
    are deduped on the id pair, scored with the exact fold kernel, and
    thresholded, so emitted cosines are bit-identical to the brute-force
    operator; only recall is approximate (tunable via n_planes/n_tables;
    for cos >= 0.4 with 4-bit signatures and 16 tables recall is
    1-(1-(1-acos(0.4)/pi)^4)^16 ~ 0.97).

    BUCKET-SIZE CLIFF (measured, round-5 10x smoke): the signature space
    per table is only 2^n_planes, so bucket population grows LINEARLY
    with the corpus — at 200k vectors the default 4-plane/16-table
    config has ~1.2k vectors per (table, sig) bucket and the self-join
    emits ~10^10 candidates; the job effectively never finishes. Unlike
    minhash-LSH (64-bit band signatures, bucket size tracks true
    duplication), sign-LSH at a LOW threshold cannot make buckets sparse
    without destroying recall (more planes shrink buckets but collision
    probability 0.63^n_planes dies exponentially). The honest scale
    controls, in preference order:

    1. raise ``n_planes`` (+ ``n_tables`` to claw recall back) when the
       threshold is high enough to afford it;
    2. set ``max_bucket_size``: per-bucket ``collect_list`` + map-side
       pair expansion (the minhash guard design, dedup.py) with a pure
       CASE cap — buckets at or under the cap unfold their clique,
       flooded buckets unfold a spanning star on the bucket minimum
       (``oversize="star"``) or nothing (``"drop"``). Ids-only through
       the shuffle; vectors join back AFTER candidate dedup.

       Measured recall caveat (sf0.1, threshold 0.4): with the cap above
       organic bucket size the guarded output matches unguarded (0.999
       agreement); once the cap BINDS on most buckets, pair recall
       collapses (0.03 at cap=50 with ~125-member buckets) — unlike
       minhash-LSH, a flooded sign bucket holds mostly DISSIMILAR
       vectors, so star edges through the bucket minimum rarely survive
       the exact verify and connectivity is not meaningfully preserved
       either. Treat the cap as a WORK bound that should rarely bind;
       if it binds everywhere the signature space is too coarse for the
       corpus — fix the signatures (more planes + tables), don't lean
       on the star.

    Defaults are ``"auto"`` (round-6): config is resolved from the
    corpus row count by :func:`lsh_auto_config` — one ``count()`` action
    (parquet footer metadata at scale, not a data scan). At or below
    ``AUTO_MIN_ROWS`` rows auto resolves to the historical
    (4 planes, 16 tables, uncapped) config EXACTLY, which is the
    byte-stable oracle-pinned gate shape; above it, planes widen with
    log2(n) so expected bucket size stays constant, tables chase the
    recall target within a work budget, and a star-handled bucket cap
    backstops clustered skew. Pass explicit ints to override (the
    pre-round-6 fixed behavior).
    """
    if oversize not in ("star", "drop"):
        raise ValueError(f"oversize must be 'star' or 'drop', got {oversize!r}")
    if "auto" in (n_planes, n_tables, max_bucket_size):
        auto_planes, auto_tables, auto_cap, _ = lsh_auto_config(
            corpus.count(), threshold
        )
        if n_planes == "auto":
            n_planes = auto_planes
        if n_tables == "auto":
            n_tables = auto_tables
        if max_bucket_size == "auto":
            max_bucket_size = auto_cap
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    planes = _hyperplanes(dim, n_planes * n_tables)
    plane_mat = np.asarray(planes, dtype=np.float64)
    pack_w = (2 ** np.arange(n_planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def table_sigs(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        bits = (mat @ plane_mat.T >= 0).astype(np.int64)
        packed = bits.reshape(len(mat), n_tables, n_planes) @ pack_w
        return pd.Series(list(packed))

    kdim = _kernel_dim(corpus, dim)  # fold below the unroll crossover
    m = spread_for_udf(corpus, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        _norm_sq(vec_col, kdim).alias("nsq"),
        F.posexplode(table_sigs(F.col(vec_col))).alias("t", "sig"),
    )
    if max_bucket_size is not None:
        # ids-only through the bucket shuffle; clique/star unfold as pure
        # expressions (see dedup.minhash_lsh_pairs for the A/B-measured
        # design rationale); vectors re-join on the DEDUPED candidates
        buckets = m.groupBy("t", "sig").agg(
            F.sort_array(F.collect_list(F.col(id_col))).alias("__ids")
        )
        if oversize == "drop":
            buckets = buckets.filter(F.size("__ids") <= max_bucket_size)
            anchors = F.col("__ids")
        else:
            anchors = F.when(
                F.size("__ids") <= max_bucket_size, F.col("__ids")
            ).otherwise(F.slice("__ids", 1, 1))
        cand = (
            buckets.select(F.col("__ids"), F.explode(anchors).alias("id_a"))
            .select(
                "id_a",
                F.explode(
                    F.filter("__ids", lambda x: x > F.col("id_a"))
                ).alias("id_b"),
            )
            .distinct()
        )
        va = corpus.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            _norm_sq(vec_col, kdim).alias("na"),
        )
        vb = corpus.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            _norm_sq(vec_col, kdim).alias("nb"),
        )
        cand = cand.join(va, "id_a").join(vb, "id_b")
    else:
        a = m.alias("a")
        b = m.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.t") == F.col("b.t"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .agg(
                F.first(F.col(f"a.{vec_col}")).alias("va"),
                F.first(F.col(f"b.{vec_col}")).alias("vb"),
                F.first(F.col("a.nsq")).alias("na"),
                F.first(F.col("b.nsq")).alias("nb"),
            )
        )
    return (
        cand.withColumn(
            "cosine",
            _dot("va", "vb", kdim)
            / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# seed codebooks per (input files, id_col, vec_col, m, n_codes) — the PQ
# analogue of _SEED_CENTROID_CACHE (an index "model" is just these arrays)
_SEED_CODEBOOK_CACHE: dict = {}


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    n_candidates: int = 128,
    codebooks: list | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via product quantization (ADC) + exact
    re-rank — the third ANN tier beside LSH and IVF.

    Why PQ at 100 TB: the scan that matters is over CODES, not vectors.
    Each corpus vector compresses to ``m`` one-byte codes (64-dim float64
    -> 8 bytes = 64x), so the per-query candidate scan touches 64x less
    I/O than brute force and needs no bucket/cell routing at all.
    Pipeline:

    1. codebooks: per subspace j (dim/m consecutive dims), ``n_codes``
       centroids. Deterministic seeds by default — the subvectors of the
       ``n_codes`` lowest-id corpus vectors (cached per input files, like
       the IVF seed centroids); pass k-means-trained ``codebooks`` for
       production recall.
    2. encode (one Arrow UDF pass): per subspace argmin squared-L2 to the
       codebook rows, lowest code on ties; the vector's true norm is kept
       alongside its codes (one extra double — exact, not reconstructed).
    3. ADC scan: per query, a lookup table lut[j][c] = dot(q_sub_j, cb[j][c])
       turns approx_dot(v) into m table lookups + a sum; candidates =
       top ``n_candidates`` by (approx cosine desc, id asc) per query.
    4. exact re-rank: candidates join their full vectors and the strict
       fold kernel scores them — emitted cosines are bit-identical to the
       exact path (PQ trades recall only, like the LSH/IVF tiers).

    Recall rides ``n_candidates`` (the rescored fraction): measured on
    the sf0.1 embeddings with seed codebooks, recall@5 = 0.60/0.80/0.88/
    0.98 at 32/64/128/256 candidates — seed codebooks are deliberately
    weak quantizers; ``train_pq_codebooks`` closes the gap for
    production. Fully deterministic with seed codebooks =>
    SQL-reproducible oracle.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType, LongType

    if dim is None:
        # one LIMIT-1 probe job; callers that know the embedding width
        # pass ``dim`` and skip it (round 12 — the probe was a whole
        # Spark job spent learning a constant the contract already pins)
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m

    if codebooks is not None:
        cbs = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, dsub)
        n_codes = cbs.shape[1]
    else:
        files = tuple(sorted(corpus.inputFiles()))
        cache_key = (files, id_col, vec_col, m, n_codes) if files else None
        cbs = _SEED_CODEBOOK_CACHE.get(cache_key) if cache_key else None
        if cbs is None:
            rows = (
                corpus.orderBy(F.col(id_col).asc())
                .limit(n_codes)
                .select(vec_col)
                .collect()
            )
            seeds = np.asarray([r[0] for r in rows], dtype=np.float64)
            cbs = np.stack(
                [seeds[:, j * dsub : (j + 1) * dsub] for j in range(m)]
            )  # (m, n_codes, dsub)
            if cache_key:
                _SEED_CODEBOOK_CACHE[cache_key] = cbs
    cbs_local = cbs

    @pandas_udf(ArrayType(LongType()))
    def encode(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        out = np.empty((mat.shape[0], m), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]  # (n, dsub)
            # (n, n_codes, dsub) differences; sum over the dsub axis is
            # sequential (numpy pairwise kicks in only >=128 elements), so
            # the SQL fold reproduces these distances bit-for-bit
            d = ((sub[:, None, :] - cbs_local[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = np.argmin(d, axis=1)  # first (lowest) code on ties
        return pd.Series(list(out))

    @pandas_udf(ArrayType(DoubleType()))
    def adc_lut(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        luts = []
        for row in mat:
            lut = np.empty(m * n_codes, dtype=np.float64)
            for j in range(m):
                sub = row[j * dsub : (j + 1) * dsub]
                # sequential small dot per code, matches the SQL fold
                lut[j * n_codes : (j + 1) * n_codes] = cbs_local[j] @ sub
            luts.append(lut)
        return pd.Series(luts)

    qid = f"q_{id_col}"
    kdim = _kernel_dim(corpus, dim)  # fold below the unroll crossover
    coded = corpus.select(
        F.col(id_col),
        F.sqrt(_norm_sq(vec_col, kdim)).alias("c_norm"),
        encode(F.col(vec_col)).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias(qid),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(_norm_sq(vec_col, kdim)).alias("q_norm"),
        adc_lut(F.col(vec_col)).alias("lut"),
    )

    # ADC score in pure expressions: sum_j lut[j*n_codes + codes[j]].
    # aggregate over the 0..m-1 index sequence keeps the fold order fixed.
    idxs = F.sequence(F.lit(0), F.lit(m - 1))
    approx_dot = F.aggregate(
        idxs,
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("lut"),
            (j * n_codes + F.element_at(F.col("codes"), j + 1) + 1).cast("int"),
        ),
    )
    scored = (
        F.broadcast(q)
        .join(coded, F.col(qid) != F.col(id_col))
        .withColumn(
            "approx_cos", approx_dot / (F.col("q_norm") * F.col("c_norm"))
        )
    )
    wc = Window.partitionBy(qid).orderBy(
        F.col("approx_cos").desc(), F.col(id_col).asc()
    )
    cands = (
        scored.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") <= n_candidates)
        .select(qid, id_col, "q_vec")
    )

    rescored = cands.join(
        corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec")), id_col
    ).withColumn("cosine", cosine_col("q_vec", "c_vec", kdim))
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        rescored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(qid, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    dim: int | None = None,
) -> list:
    """Train PQ codebooks: one k-means per subspace (MLlib k-means||,
    like train_ivf_centroids). Returns a plain (m, n_codes, dsub) nested
    list for ``pq_cosine_topk(codebooks=...)`` — the PQ "index model" is
    just these arrays. Train on a sample at scale."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim is None:
        # see pq_cosine_topk: skipped entirely when the caller passes dim
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        train = corpus.select(
            array_to_vector(
                F.slice(F.col(vec_col), j * dsub + 1, dsub).cast("array<double>")
            ).alias("features")
        )
        model = KMeans(
            k=n_codes, seed=seed + j, maxIter=max_iter, initMode="k-means||"
        ).fit(train)
        books.append([list(map(float, c)) for c in model.clusterCenters()])
    return books


def ivfpq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    n_candidates: int = 64,
    dim: int | None = None,
) -> DataFrame:
    """IVF+PQ residual composition — the production large-scale ANN shape
    (route, then scan codes, then re-rank exactly):

    1. IVF routing: corpus vectors assign to their nearest seed cell
       (identical rule to ``ivf_cosine_topk``); queries probe their
       ``n_probe`` best cells, so the candidate meet is a cell equi-join —
       never a full scan.
    2. PQ within the route: each vector stores m one-byte codes of its
       RESIDUAL (v - cell centroid). The probe scores candidates as
       dot(q, c_cell) + ADC(q, residual codes) — reading 8 bytes per
       candidate instead of the vector.
    3. exact re-rank of the top ``n_candidates`` by the strict fold
       kernel: emitted cosines are bit-identical to brute force.

    Both index structures use the deterministic seed construction (cells:
    16 lowest-id vectors; residual codebooks: subvectors of the residuals
    of the NEXT ``n_codes`` lowest-id vectors — disjoint from the cell
    seeds so residual codebooks are not degenerate zeros). Recall rides
    (n_probe, n_candidates); at 100 TB the levers are cells ~ sqrt(N) and
    code bytes per vector."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    if dim is None:
        # see pq_cosine_topk: skipped entirely when the caller passes dim
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    # same per-input-files seed cache as the IVF/PQ tiers: a stable
    # file-backed corpus yields the same seed vectors every call, so the
    # top-k collect job runs once per (files, params) per process
    files = tuple(sorted(corpus.inputFiles()))
    cache_key = (files, id_col, vec_col, n_cells, n_codes) if files else None
    seeds = _SEED_CENTROID_CACHE.get(("ivfpq",) + cache_key) if cache_key else None
    if seeds is None:
        seed_rows = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_cells + n_codes)
            .select(vec_col)
            .collect()
        )
        if len(seed_rows) < n_cells + n_codes:
            raise ValueError(
                f"ivfpq needs a corpus of at least n_cells + n_codes = "
                f"{n_cells + n_codes} vectors to seed its cells and residual "
                f"codebooks; got {len(seed_rows)}"
            )
        seeds = np.asarray([r[0] for r in seed_rows], dtype=np.float64)
        if cache_key:
            _SEED_CENTROID_CACHE[("ivfpq",) + cache_key] = seeds
    cents = seeds[:n_cells]
    cents_n = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    # residual codebooks from the NEXT n_codes seeds' residuals
    tail = seeds[n_cells : n_cells + n_codes]
    tail_cells = np.argmax(
        (tail / np.maximum(np.linalg.norm(tail, axis=1, keepdims=True), 1e-12))
        @ cents_n.T,
        axis=1,
    )
    tail_res = tail - cents[tail_cells]
    cbs = np.stack([tail_res[:, j * dsub : (j + 1) * dsub] for j in range(m)])

    enc_schema = StructType([
        StructField("cell", LongType()),
        StructField("codes", ArrayType(LongType())),
    ])

    @pandas_udf(enc_schema)
    def encode(v: pd.Series) -> pd.DataFrame:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        norm = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cell = np.argmax((mat / norm) @ cents_n.T, axis=1)
        res = mat - cents[cell]
        codes = np.empty((mat.shape[0], m), dtype=np.int64)
        for j in range(m):
            sub = res[:, j * dsub : (j + 1) * dsub]
            d = ((sub[:, None, :] - cbs[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.DataFrame({"cell": cell, "codes": list(codes)})

    @pandas_udf(ArrayType(LongType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mat @ cents_n.T), axis=1)[:, :n_probe]
        return pd.Series(list(order.astype(np.int64)))

    @pandas_udf(ArrayType(DoubleType()))
    def query_luts(v: pd.Series) -> pd.Series:
        # per query: [dot(q, cent_0..n_cells-1)] ++ flattened lut[j][c]
        out = []
        for row in v:
            q = np.asarray(row, dtype=np.float64)
            head = cents @ q
            lut = np.empty(m * n_codes, dtype=np.float64)
            for j in range(m):
                lut[j * n_codes : (j + 1) * n_codes] = (
                    cbs[j] @ q[j * dsub : (j + 1) * dsub]
                )
            out.append(np.concatenate([head, lut]))
        return pd.Series(out)

    qid = f"q_{id_col}"
    kdim = _kernel_dim(corpus, dim)  # fold below the unroll crossover
    coded = corpus.select(
        F.col(id_col), _norm_sq(vec_col, kdim).alias("c_nsq"),
        encode(F.col(vec_col)).alias("e"),
    ).select(id_col, "c_nsq", F.col("e.cell").alias("cell"),
             F.col("e.codes").alias("codes"))
    q = queries.select(
        F.col(id_col).alias(qid),
        F.col(vec_col).alias("q_vec"),
        _norm_sq(vec_col, kdim).alias("q_nsq"),
        query_luts(F.col(vec_col)).alias("lut"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )

    idxs = F.sequence(F.lit(0), F.lit(m - 1))
    adc = F.aggregate(
        idxs,
        F.element_at(F.col("lut"), (F.col("cell") + 1).cast("int")),
        lambda acc, j: acc
        + F.element_at(
            F.col("lut"),
            (n_cells + j * n_codes + F.element_at(F.col("codes"), j + 1) + 1)
            .cast("int"),
        ),
    )
    scored = (
        F.broadcast(q)
        .join(coded, "cell")
        .filter(F.col(qid) != F.col(id_col))
        .withColumn("approx", adc / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("c_nsq"))))
    )
    wc = Window.partitionBy(qid).orderBy(F.col("approx").desc(), F.col(id_col).asc())
    cands = (
        scored.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") <= n_candidates)
        .select(qid, id_col, "q_vec")
    )
    rescored = cands.join(
        corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec")), id_col
    ).withColumn("cosine", cosine_col("q_vec", "c_vec", kdim))
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        rescored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(qid, id_col, "cosine", F.col("__rn").alias("rank"))
    )
