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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_sq(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a, b):
    """cos(a, b) as a deterministic double expression."""
    return _dot(a, b) / (F.sqrt(_norm_sq(a)) * F.sqrt(_norm_sq(b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector (cosine).

    Physical shape: broadcast(queries) x corpus -> BroadcastNestedLoopJoin
    producing |q| x |n| candidate rows WITHOUT shuffling the corpus, then a
    window top-k per query (shuffle keyed by query id — |q| keys). Ties
    broken by corpus id for full determinism. Self-matches excluded.
    """
    qid = query_id_col or f"q_{id_col}"
    # precompute each side's squared norm ONCE per vector (not per pair):
    # same fold -> bit-identical to recomputing, but 3x fewer flops
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(qid),
            F.col(vec_col).alias("q_vec"),
            _norm_sq(F.col(vec_col)).alias("q_nsq"),
        )
    )
    # spread the per-pair scoring across cores even off a one-file corpus
    # (a single input partition otherwise serializes the whole kernel)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.repartition(par, id_col).select(
        F.col(id_col), F.col(vec_col), _norm_sq(F.col(vec_col)).alias("c_nsq")
    )
    scored = q.join(c, F.col(qid) != F.col(id_col)).withColumn(
        "cosine",
        _dot(F.col("q_vec"), F.col(vec_col))
        / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("c_nsq"))),
    )
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(qid, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered corpus pairs with cosine >= threshold.

    Brute-force O(n^2/2) — exact baseline. At 100 TB use
    ``near_dup_pairs_lsh`` (sign-bucket blocking, same scoring kernel).
    Norms are precomputed per vector (n folds) instead of per pair
    (n^2 folds); the probe side is repartitioned so the O(n^2) scoring
    parallelizes even off a one-file corpus."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    a = corpus.repartition(par, id_col).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm_sq(F.col(vec_col)).alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm_sq(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb"))
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
    par = corpus.sparkSession.sparkContext.defaultParallelism
    q_m = melt(queries, qid, "q_vec")
    c_m = melt(corpus.repartition(par, id_col), id_col, vec_col)

    cand = (
        F.broadcast(q_m)
        .join(c_m, ["t", "sig"])
        .filter(F.col(qid) != F.col(id_col))
        .groupBy(qid, id_col)
        .agg(F.first("q_vec").alias("q_vec"), F.first(vec_col).alias(vec_col))
    )
    # norms once per surviving pair side; the dot is the only per-pair fold
    scored = cand.withColumn(
        "cosine",
        _dot(F.col("q_vec"), F.col(vec_col))
        / (F.sqrt(_norm_sq(F.col("q_vec"))) * F.sqrt(_norm_sq(F.col(vec_col)))),
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
    par = corpus.sparkSession.sparkContext.defaultParallelism
    # norms precomputed ONCE per vector (1 fold each side) so each candidate
    # pair pays a single dot-product fold, not three
    c_assigned = corpus.repartition(par, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        _norm_sq(F.col(vec_col)).alias("c_nsq"),
        nearest_cell(F.col(vec_col)).alias("cell"),
    )
    q_m = queries.select(
        F.col(id_col).alias(qid),
        F.col(vec_col).alias("q_vec"),
        _norm_sq(F.col(vec_col)).alias("q_nsq"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )

    scored = (
        F.broadcast(q_m)
        .join(c_assigned, "cell")
        .filter(F.col(qid) != F.col(id_col))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col(vec_col))
            / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("c_nsq"))),
        )
    )
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(qid, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
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
    """
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

    par = corpus.sparkSession.sparkContext.defaultParallelism
    m = corpus.repartition(par, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        _norm_sq(F.col(vec_col)).alias("nsq"),
        F.posexplode(table_sigs(F.col(vec_col))).alias("t", "sig"),
    )
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
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
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
            _dot(F.col("va"), F.col("vb"))
            / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
