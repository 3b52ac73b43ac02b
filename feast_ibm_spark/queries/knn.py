"""Split from the round-4 queries.py monolith; see queries/__init__.py."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

# North-star: similarity search over embeddings
# --------------------------------------------------------------------------

KNN_K = 5
KNN_QUERY_IDS = 8  # vec_id < 8 are the query vectors
EMB_DIM = 64  # embeddings table dimensionality (the oracle SQL pins range(1, 65))

_DUCK_DOT = """
list_reduce(
  list_prepend(CAST(0 AS DOUBLE),
    list_transform(range(1, 65),
      i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
  (acc, x) -> acc + x
)
"""


def _duck_cosine(a: str, b: str) -> str:
    dot = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERY_IDS)
    return cosine_topk(emb, queries, k=KNN_K, dim=EMB_DIM)


ORACLE_KNN = f"""
WITH q AS (SELECT vec_id AS q_vec_id, embedding AS qe FROM embeddings WHERE vec_id < {KNN_QUERY_IDS}),
scored AS (
  SELECT q.q_vec_id, e.vec_id,
         {_duck_cosine('q.qe', 'e.embedding')} AS cosine
  FROM q JOIN embeddings e ON e.vec_id != q.q_vec_id
),
ranked AS (
  SELECT q_vec_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_vec_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_vec_id, vec_id, cosine, rank FROM ranked WHERE rank <= {KNN_K}
"""

PQ_M, PQ_CODES, PQ_CANDS = 8, 16, 128
_PQ_DSUB = 8


def _duck_dot8(a: str, b: str, j: str) -> str:
    return f"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
  list_transform(range(1, {_PQ_DSUB + 1}), i -> CAST({a}[{j}*{_PQ_DSUB}+i] AS DOUBLE) * CAST({b}[{j}*{_PQ_DSUB}+i] AS DOUBLE))),
  (acc, x) -> acc + x)"""


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (third tier beside LSH/IVF): codes are 8
    bytes per 64-dim vector, the ADC scan reads codes not vectors, and
    the top-128 candidates are exactly re-ranked. Deterministic seed
    codebooks (subvectors of the 16 lowest-id vectors) make every stage
    — encode argmin, lookup-table build, ordered ADC fold, candidate
    cut, exact re-rank — reproducible in SQL, so like knn_ivf this
    approximate operator carries a full value-hash oracle (verified
    bit-exact at sf0.01 and sf0.1)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERY_IDS)
    return pq_cosine_topk(emb, queries, k=KNN_K, m=PQ_M, n_codes=PQ_CODES,
                          n_candidates=PQ_CANDS, dim=EMB_DIM)


ORACLE_KNN_PQ = f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding AS ce
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {PQ_CODES})
),
enc_dists AS (
  SELECT e.vec_id, s.code, j.j,
    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      list_transform(range(1, {_PQ_DSUB + 1}), i ->
        (CAST(e.embedding[j.j*{_PQ_DSUB}+i] AS DOUBLE) - CAST(s.ce[j.j*{_PQ_DSUB}+i] AS DOUBLE))
        * (CAST(e.embedding[j.j*{_PQ_DSUB}+i] AS DOUBLE) - CAST(s.ce[j.j*{_PQ_DSUB}+i] AS DOUBLE)))),
      (acc, x) -> acc + x) AS dist
  FROM embeddings e CROSS JOIN seeds s CROSS JOIN range(0, {PQ_M}) j(j)
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist ASC, code ASC) AS rn
    FROM enc_dists) WHERE rn = 1
),
luts AS (
  SELECT q.vec_id AS q_vec_id, j.j, s.code,
         {_duck_dot8('q.embedding', 's.ce', 'j.j')} AS dotv
  FROM embeddings q CROSS JOIN seeds s CROSS JOIN range(0, {PQ_M}) j(j)
  WHERE q.vec_id < {KNN_QUERY_IDS}
),
norms AS (
  SELECT vec_id, sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
approx AS (
  SELECT l.q_vec_id, c.vec_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.dotv ORDER BY l.j)),
                     (acc, x) -> acc + x) AS adot
  FROM luts l JOIN codes c ON c.j = l.j AND c.code = l.code
  WHERE c.vec_id != l.q_vec_id
  GROUP BY 1, 2
),
cands AS (
  SELECT q_vec_id, vec_id FROM (
    SELECT a.q_vec_id, a.vec_id,
      row_number() OVER (PARTITION BY a.q_vec_id
                         ORDER BY a.adot / (qn.nrm * cn.nrm) DESC, a.vec_id ASC) AS rn
    FROM approx a
    JOIN norms qn ON qn.vec_id = a.q_vec_id
    JOIN norms cn ON cn.vec_id = a.vec_id) WHERE rn <= {PQ_CANDS}
),
rescored AS (
  SELECT c.q_vec_id, c.vec_id,
         {_duck_cosine('q.embedding', 'e.embedding')} AS cosine
  FROM cands c
  JOIN embeddings q ON q.vec_id = c.q_vec_id
  JOIN embeddings e ON e.vec_id = c.vec_id
)
SELECT q_vec_id, vec_id, cosine, rank FROM (
  SELECT q_vec_id, vec_id, cosine,
    row_number() OVER (PARTITION BY q_vec_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rescored) WHERE rank <= {KNN_K}
"""


NEAR_DUP_COS = 0.4


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return near_dup_pairs(emb, threshold=NEAR_DUP_COS, dim=EMB_DIM)


ORACLE_NEAR_DUP = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_duck_cosine('a.embedding', 'b.embedding')} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= {NEAR_DUP_COS}
"""

ORACLE_EMBEDDING_CLUSTERS = f"""
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= {NEAR_DUP_COS}
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS vec_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
"""


def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup clustering: connected components over the exact
    embedding near-dup graph — the embedding-space twin of the text
    family's dedup_clusters. Each vector in a component is labeled with
    the component's minimum vec_id (the canonical representative a
    curation pipeline keeps). Composes the pair generator with the same
    min-label-propagation operator the text path uses; the 100 TB
    composition over LSH-blocked pairs is ``embedding_clusters_lsh``."""
    from ..operators.dedup import dedup_clusters

    emb = _t(spark, sf_dir, "embeddings")
    pairs = near_dup_pairs(emb, threshold=NEAR_DUP_COS, dim=EMB_DIM)
    return dedup_clusters(pairs, a_col="id_a", b_col="id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked near-dup pairs. Carries a FULL value-hash oracle (the
    knn_ivf/knn_pq recipe): the hyperplanes come from a fixed-seed PRNG,
    so their exact float64 values are embedded as literals in the DuckDB
    SQL, which reproduces signature packing (sign bits -> per-table
    code), the (table, sig) bucket self-join, candidate dedup, and the
    exact fold-kernel rescoring + threshold. The sign of each
    plane-dot is robust to summation-order differences between numpy
    BLAS and the SQL left fold except exactly at 0 (probability ~0 for
    continuous data; verified hash-exact at sf0.01 and sf0.1).

    The query deliberately keeps the operator's ``"auto"`` defaults:
    at every oracle-compared scale (sf0.01/sf0.1, far below
    AUTO_MIN_ROWS) auto resolves byte-exactly to the oracle's pinned
    (4, 16, uncapped) shape, while at smoke scale (20k vectors) it
    resolves to the scaled config — pinning the args here instead was
    tried in the round-6 review and REVERTED: it reintroduced the
    quadratic bucket-join cliff at exactly the scale the auto design
    exists for (the sf1 smoke caught it). The oracle coupling is
    guarded loudly by test_lsh_oracle_shape_guard: if the parity corpus
    ever grows past AUTO_MIN_ROWS, that test fails with instructions to
    regenerate the oracle planes, BEFORE a mysterious gate hash
    mismatch."""
    emb = _t(spark, sf_dir, "embeddings")
    return near_dup_pairs_lsh(emb, threshold=NEAR_DUP_COS)


# the exact shape ORACLE_NEAR_DUP_LSH / ORACLE_EMBEDDING_CLUSTERS_LSH
# hard-code via their seeded plane literals (see q_embedding_near_dup_lsh
# docstring for why the QUERY still uses auto; test_lsh_oracle_shape_guard
# enforces that auto and this shape agree at every oracle-compared scale)
LSH_ORACLE_CONFIG = dict(n_planes=4, n_tables=16, max_bucket_size=None)


def _lsh_planes_values() -> str:
    """The 64 seeded hyperplanes (16 tables x 4 planes, dim 64) as DuckDB
    VALUES rows ``(t, p, pv DOUBLE[])`` — ``repr(float)`` round-trips, so
    the SQL sees bit-identical plane coefficients to the Pandas-UDF
    signature stage in ``near_dup_pairs_lsh``."""
    planes = _hyperplanes(64, 4 * 16)
    rows = []
    for i, pv in enumerate(planes):
        lit = ", ".join(repr(x) for x in pv)
        rows.append(f"({i // 4}, {i % 4}, [{lit}]::DOUBLE[])")
    return ",\n".join(rows)


ORACLE_NEAR_DUP_LSH = f"""
WITH planes(t, p, pv) AS (VALUES
{_lsh_planes_values()}
),
pdots AS (
  SELECT e.vec_id, pl.t, pl.p,
         {_DUCK_DOT.format(a='e.embedding', b='pl.pv')} AS d
  FROM embeddings e CROSS JOIN planes pl
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig
  FROM pdots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       {_duck_cosine('ea.embedding', 'eb.embedding')} AS cosine
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE {_duck_cosine('ea.embedding', 'eb.embedding')} >= {NEAR_DUP_COS}
"""


def q_embedding_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup clustering at SCALE: connected components over the
    LSH-blocked near-dup pair tier — the composition a 100 TB corpus
    actually runs (the exact-pair twin ``embedding_clusters`` is the
    gate-scale oracle of the same clustering semantics). Pair recall is
    the LSH generator's; every emitted edge carries a bit-exact cosine,
    so clusters are a subgraph-closure of the exact tier's. The full
    value-hash oracle reproduces the seeded hyperplanes, the bucket
    self-join, the exact verify, and the transitive closure in SQL."""
    from ..operators.dedup import dedup_clusters
    from ..operators.similarity import near_dup_pairs_lsh

    emb = _t(spark, sf_dir, "embeddings")
    pairs = near_dup_pairs_lsh(emb, threshold=NEAR_DUP_COS)
    return dedup_clusters(pairs, a_col="id_a", b_col="id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


ORACLE_EMBEDDING_CLUSTERS_LSH = f"""
WITH RECURSIVE
planes(t, p, pv) AS (VALUES
{_lsh_planes_values()}
),
pdots AS (
  SELECT e.vec_id, pl.t, pl.p,
         {_DUCK_DOT.format(a='e.embedding', b='pl.pv')} AS d
  FROM embeddings e CROSS JOIN planes pl
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig
  FROM pdots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
  WHERE {_duck_cosine('ea.embedding', 'eb.embedding')} >= {NEAR_DUP_COS}
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS vec_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
"""


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via an IVF index. The *approximation* (which cells
    get probed) is itself deterministic with the seed centroids — the 16
    lowest-id corpus vectors — so the full pipeline (assignment, probe,
    candidate meet, exact rescoring) is reproducible in SQL and the query
    carries a full value-hash oracle, not a rows-only check. Recall vs
    exact top-k is additionally asserted in tests."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERY_IDS)
    return ivf_cosine_topk(emb, queries, k=KNN_K)


# Mirrors ivf_cosine_topk's seed-centroid path exactly: cells = 16
# lowest-id vectors; assignment = argmax_j dot(v, c_j)/||c_j|| with
# lowest-cell tie rule (np.argmax picks the first max); each query probes
# its 4 best cells; candidates rescored with the exact fold kernel.
# Row-normalizing v (the numpy path does) scales every cell's sim equally,
# so the SQL skips it — the argmax/argsort order is unchanged. The fold
# summation order matches Spark's F.aggregate, so cosines are
# bit-identical (verified sf0.01 + sf0.1).
ORACLE_KNN_IVF = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_idx, embedding AS ce,
         sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS cnorm
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
),
cell_sims AS (
  SELECT e.vec_id, c.cell_idx,
         ({_DUCK_DOT.format(a='e.embedding', b='c.ce')}) / c.cnorm AS sim
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cell_idx AS cell FROM (
    SELECT vec_id, cell_idx,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell_idx ASC) AS rn
    FROM cell_sims) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS q_vec_id, cell_idx AS cell FROM (
    SELECT vec_id, cell_idx,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell_idx ASC) AS rn
    FROM cell_sims WHERE vec_id < {KNN_QUERY_IDS}) WHERE rn <= 4
),
cand AS (
  SELECT p.q_vec_id, a.vec_id
  FROM probe p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id != p.q_vec_id
),
scored AS (
  SELECT c.q_vec_id, c.vec_id,
         {_duck_cosine('q.embedding', 'e.embedding')} AS cosine
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.q_vec_id
  JOIN embeddings e ON e.vec_id = c.vec_id
),
ranked AS (
  SELECT q_vec_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_vec_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_vec_id, vec_id, cosine, rank FROM ranked WHERE rank <= {KNN_K}
"""


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ residual composition — the production large-scale ANN
    shape. FULL value-hash oracle since round 6 (ORACLE_KNN_IVFPQ): the
    deterministic seed construction makes cell routing, the residual
    encode argmin, LUT build, ordered ADC fold, candidate cut and exact
    re-rank all SQL-reproducible (verified hash-exact at sf0.01 AND
    sf0.1). Recall/determinism additionally pinned in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERY_IDS)
    return ivfpq_cosine_topk(emb, queries, k=KNN_K, dim=EMB_DIM)


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH. Full value-hash oracle
    since round 6 (ORACLE_KNN_LSH): the seeded planes embed as SQL
    literals, the bucket meet + exact rescoring + top-k reproduce in
    DuckDB — the approximation is deterministic, so it hashes. Recall
    vs exact top-k additionally asserted in tests."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERY_IDS)
    return lsh_cosine_topk(emb, queries, k=KNN_K)


# --------------------------------------------------------------------------


# Round 6: knn_lsh graduates from rows-only to a FULL value-hash oracle —
# the same seeded-hyperplane literals as ORACLE_NEAR_DUP_LSH reproduce the
# signature packing; candidates are the query-corpus bucket meet over any
# of the 16 tables; rescoring is the exact fold kernel; top-k ties break
# on ascending corpus id exactly like the operator's window.
ORACLE_KNN_LSH = f"""
WITH planes(t, p, pv) AS (VALUES
{_lsh_planes_values()}
),
pdots AS (
  SELECT e.vec_id, pl.t, pl.p,
         {_DUCK_DOT.format(a='e.embedding', b='pl.pv')} AS d
  FROM embeddings e CROSS JOIN planes pl
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig
  FROM pdots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT q.vec_id AS q_vec_id, c.vec_id
  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
  WHERE q.vec_id < {KNN_QUERY_IDS} AND c.vec_id != q.vec_id
),
scored AS (
  SELECT cd.q_vec_id, cd.vec_id,
         {_duck_cosine('eq.embedding', 'ec.embedding')} AS cosine
  FROM cand cd
  JOIN embeddings eq ON eq.vec_id = cd.q_vec_id
  JOIN embeddings ec ON ec.vec_id = cd.vec_id
)
SELECT q_vec_id, vec_id, cosine, rank FROM (
  SELECT q_vec_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_vec_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= {KNN_K}
"""


IVFPQ_CELLS, IVFPQ_PROBE, IVFPQ_M, IVFPQ_CODES, IVFPQ_CANDS = 16, 4, 8, 16, 64


def _duck_res_dot8(res: str, cb: str, j: str) -> str:
    """dot of an 8-wide subvector slice of two DOUBLE[] lists."""
    return f"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
  list_transform(range(1, {_PQ_DSUB + 1}),
    i -> CAST({res}[{j}*{_PQ_DSUB}+i] AS DOUBLE) * CAST({cb}[{j}*{_PQ_DSUB}+i] AS DOUBLE))),
  (acc, x) -> acc + x)"""


# Round 6: knn_ivfpq graduates from rows-only to a FULL value-hash oracle.
# Every stage of the production ANN composition is deterministic given the
# seed construction (cells = 16 lowest-id vectors; residual codebooks =
# residuals of the NEXT 16), so the whole pipeline — cell assignment,
# residual encode argmin, probe-cell top-4, LUT build, ordered ADC fold,
# candidate cut, exact re-rank — reproduces in SQL, exactly like the
# individually-oracled knn_ivf and knn_pq tiers it composes.
ORACLE_KNN_IVFPQ = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_idx, embedding AS ce,
         sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS cnorm
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {IVFPQ_CELLS})
),
tail AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding AS te
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id
        LIMIT {IVFPQ_CODES} OFFSET {IVFPQ_CELLS})
),
tail_assign AS (
  SELECT code, te, ce AS tce FROM (
    SELECT t.code, t.te, c.ce,
           row_number() OVER (PARTITION BY t.code
             ORDER BY ({_DUCK_DOT.format(a='t.te', b='c.ce')}) / c.cnorm DESC,
                      c.cell_idx ASC) AS rn
    FROM tail t CROSS JOIN cents c) WHERE rn = 1
),
codebooks AS (
  SELECT code,
         list_transform(range(1, 65), i -> te[i] - tce[i]) AS cb
  FROM tail_assign
),
assign AS (
  SELECT vec_id, cell, ce,
         list_transform(range(1, 65), i -> emb[i] - ce[i]) AS res
  FROM (
    SELECT e.vec_id, e.embedding AS emb, c.cell_idx AS cell, c.ce,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ({_DUCK_DOT.format(a='e.embedding', b='c.ce')}) / c.cnorm DESC,
                      c.cell_idx ASC) AS rn
    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT a.vec_id, j.j, b.code,
           row_number() OVER (PARTITION BY a.vec_id, j.j ORDER BY
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, {_PQ_DSUB + 1}), i ->
                 (a.res[j.j*{_PQ_DSUB}+i] - b.cb[j.j*{_PQ_DSUB}+i])
                 * (a.res[j.j*{_PQ_DSUB}+i] - b.cb[j.j*{_PQ_DSUB}+i]))),
               (acc, x) -> acc + x) ASC, b.code ASC) AS rn
    FROM assign a CROSS JOIN codebooks b CROSS JOIN range(0, {IVFPQ_M}) j(j)
  ) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS q_vec_id, cell_idx AS cell FROM (
    SELECT e.vec_id, c.cell_idx,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ({_DUCK_DOT.format(a='e.embedding', b='c.ce')}) / c.cnorm DESC,
                      c.cell_idx ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
    WHERE e.vec_id < {KNN_QUERY_IDS}) WHERE rn <= {IVFPQ_PROBE}
),
norms AS (
  SELECT vec_id, sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
heads AS (
  SELECT q.vec_id AS q_vec_id, c.cell_idx AS cell,
         {_DUCK_DOT.format(a='q.embedding', b='c.ce')} AS head
  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < {KNN_QUERY_IDS}
),
luts AS (
  SELECT q.vec_id AS q_vec_id, j.j, b.code,
         {_duck_res_dot8('q.embedding', 'b.cb', 'j.j')} AS dotv
  FROM embeddings q CROSS JOIN codebooks b CROSS JOIN range(0, {IVFPQ_M}) j(j)
  WHERE q.vec_id < {KNN_QUERY_IDS}
),
approx AS (
  SELECT p.q_vec_id, a.vec_id,
         (h.head + list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(l.dotv ORDER BY l.j)), (acc, x) -> acc + x))
           / (qn.nrm * cn.nrm) AS approx
  FROM probe p
  JOIN assign a ON a.cell = p.cell
  JOIN codes c ON c.vec_id = a.vec_id
  JOIN luts l ON l.q_vec_id = p.q_vec_id AND l.j = c.j AND l.code = c.code
  JOIN heads h ON h.q_vec_id = p.q_vec_id AND h.cell = a.cell
  JOIN norms qn ON qn.vec_id = p.q_vec_id
  JOIN norms cn ON cn.vec_id = a.vec_id
  WHERE a.vec_id != p.q_vec_id
  GROUP BY p.q_vec_id, a.vec_id, h.head, qn.nrm, cn.nrm
),
cands AS (
  SELECT q_vec_id, vec_id FROM (
    SELECT q_vec_id, vec_id,
           row_number() OVER (PARTITION BY q_vec_id
                              ORDER BY approx DESC, vec_id ASC) AS rn
    FROM approx) WHERE rn <= {IVFPQ_CANDS}
),
rescored AS (
  SELECT c.q_vec_id, c.vec_id,
         {_duck_cosine('q.embedding', 'e.embedding')} AS cosine
  FROM cands c
  JOIN embeddings q ON q.vec_id = c.q_vec_id
  JOIN embeddings e ON e.vec_id = c.vec_id
)
SELECT q_vec_id, vec_id, cosine, rank FROM (
  SELECT q_vec_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_vec_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rescored) WHERE rank <= {KNN_K}
"""


# North-star: batch model inference + evaluation over embeddings
# --------------------------------------------------------------------------

PROBE_CLASSES, PROBE_DIM = 8, 64
# fixed evaluation thresholds for the one-vs-rest PR sweep (class 0)
PR_THRESHOLDS = [x / 10 for x in range(-4, 5)]  # -0.4 .. 0.4


def q_embed_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch INFERENCE: a K-class linear probe (frozen-embedding
    classifier head) scores every vector map-side — weights ride inside
    the plan as exact integer arithmetic, the score is an ordered fold
    (the cosine_topk discipline), no Python in the hot path. Output is
    each vector's argmax class, score, and correctness vs the stored
    label."""
    from ..operators.inference import linear_probe

    emb = _t(spark, sf_dir, "embeddings")
    return linear_probe(emb, n_classes=PROBE_CLASSES, dim=PROBE_DIM)


_DUCK_PROBE_SCORE = f"""
list_reduce(list_prepend(CAST(0 AS DOUBLE),
  list_transform(range(1, {PROBE_DIM + 1}),
    i -> (CAST((((c * 1009 + i * 9176) % 1000) - 500) AS DOUBLE) / 1000.0)
         * CAST(embedding[i] AS DOUBLE))),
  (acc, x) -> acc + x)
"""

ORACLE_LINEAR_PROBE = f"""
WITH s AS (
  SELECT vec_id, label, c, {_DUCK_PROBE_SCORE} AS score
  FROM embeddings, unnest(range(0, {PROBE_CLASSES})) AS u(c)
),
r AS (
  SELECT vec_id, label, c, score,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, c ASC) AS rn
  FROM s
)
SELECT vec_id, label, CAST(c AS BIGINT) AS pred, score,
       CAST(c = label AS BIGINT) AS is_correct
FROM r WHERE rn = 1
"""


def q_eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model EVALUATION at scale: precision/recall of the class-0
    one-vs-rest probe score at 9 fixed thresholds — confusion counts are
    exact integers from ONE pass over the scored vectors (a 9-row
    broadcast threshold grid expands map-side; no per-threshold rescan
    of the eval set), precision/recall a single exact division each. The shape
    behind threshold tuning on a 100 TB eval set."""
    from ..operators.inference import _SCORE

    emb = _t(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        (F.col("label") == 0).cast("bigint").alias("pos"),
        F.expr(_SCORE.format(dim=PROBE_DIM)
               .replace("c *", "0 *")).alias("score"),
    )
    th = spark.createDataFrame(
        [(t,) for t in PR_THRESHOLDS], "threshold double"
    )
    joined = scored.crossJoin(F.broadcast(th))
    return (
        joined.groupBy("threshold")
        .agg(
            F.sum(
                F.when((F.col("score") >= F.col("threshold"))
                       & (F.col("pos") == 1), 1).otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when((F.col("score") >= F.col("threshold"))
                       & (F.col("pos") == 0), 1).otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when((F.col("score") < F.col("threshold"))
                       & (F.col("pos") == 1), 1).otherwise(0)
            ).alias("fn"),
        )
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            (F.col("tp").cast("double")
             / (F.col("tp") + F.col("fp")).cast("double")).alias("precision"),
            (F.col("tp").cast("double")
             / (F.col("tp") + F.col("fn")).cast("double")).alias("recall"),
        )
    )


_DUCK_PROBE0 = _DUCK_PROBE_SCORE.replace("c * 1009", "0 * 1009")

ORACLE_PR_CURVE = f"""
WITH scored AS (
  SELECT vec_id, CAST(label = 0 AS BIGINT) AS pos, {_DUCK_PROBE0} AS score
  FROM embeddings
),
th AS (SELECT unnest([{", ".join(str(t) for t in PR_THRESHOLDS)}]) AS threshold)
SELECT threshold,
       CAST(sum(CASE WHEN score >= threshold AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN score >= threshold AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN score < threshold AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(sum(CASE WHEN score >= threshold AND pos = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS DOUBLE) AS precision,
       CAST(sum(CASE WHEN score >= threshold AND pos = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS recall
FROM scored, th
GROUP BY threshold
"""


def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of the class-0 probe score, no sampling and no
    trapezoid approximation: AUC is the Mann-Whitney pair statistic, and
    with scores grouped by distinct value it reduces to integer
    arithmetic — numer2 = sum over scores of cnt_pos * (2*cum_neg_below
    + cnt_neg_at), AUC = numer2 / (2*n_pos*n_neg), ONE double division
    at the end (ties contribute exactly 1/2 via the odd numerator).

    The cumulative window runs over DISTINCT scores (one row per value,
    ~corpus-sized here) in a single partition; at 100 TB the standard
    two-pass range-partitioned prefix sum replaces it — documented
    honestly rather than hidden, the aggregation before it already
    collapsed the data."""
    from pyspark.sql import Window

    from ..operators.inference import _SCORE

    emb = _t(spark, sf_dir, "embeddings")
    scored = emb.select(
        (F.col("label") == 0).cast("bigint").alias("pos"),
        F.expr(_SCORE.format(dim=PROBE_DIM).replace("c *", "0 *")).alias("s"),
    )
    per_score = scored.groupBy("s").agg(
        F.sum("pos").alias("cnt_pos"),
        F.sum(1 - F.col("pos")).alias("cnt_neg"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    terms = per_score.withColumn(
        "cum_neg", F.coalesce(F.sum("cnt_neg").over(w), F.lit(0))
    ).select(
        (F.col("cnt_pos") * (2 * F.col("cum_neg") + F.col("cnt_neg")))
        .alias("numer2"),
        "cnt_pos",
        "cnt_neg",
    )
    return terms.agg(
        F.sum("cnt_pos").cast("bigint").alias("n_pos"),
        F.sum("cnt_neg").cast("bigint").alias("n_neg"),
        (
            F.sum("numer2").cast("double")
            / (2.0 * F.sum("cnt_pos") * F.sum("cnt_neg")).cast("double")
        ).alias("auc"),
    )


ORACLE_AUC = f"""
WITH scored AS (
  SELECT CAST(label = 0 AS BIGINT) AS pos, {_DUCK_PROBE0} AS s
  FROM embeddings
),
per_score AS (
  SELECT s, CAST(sum(pos) AS BIGINT) AS cnt_pos,
         CAST(sum(1 - pos) AS BIGINT) AS cnt_neg
  FROM scored GROUP BY s
),
terms AS (
  SELECT cnt_pos, cnt_neg,
         cnt_pos * (2 * COALESCE(sum(cnt_neg) OVER (
             ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) + cnt_neg) AS numer2
  FROM per_score
)
SELECT CAST(sum(cnt_pos) AS BIGINT) AS n_pos,
       CAST(sum(cnt_neg) AS BIGINT) AS n_neg,
       CAST(sum(numer2) AS DOUBLE)
         / (2.0 * CAST(sum(cnt_pos) AS DOUBLE) * CAST(sum(cnt_neg) AS DOUBLE))
         AS auc
FROM terms
"""


RANK_K = 10


def q_eval_retrieval_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality eval (completes the eval family beside AUC / PR
    curve / confusion / drift): each query vector's full cosine ranking
    is reduced to the integer rank statistics retrieval dashboards are
    built from — first_hit_rank (the MRR ingredient), hits@10 (the
    precision@k numerator), n_relevant (the recall denominator) — with
    relevance = same label. Everything emitted is an integer rank
    statistic, so the row value-hashes exactly; the float cosine only
    ever ORDERS rows, under the established sequential-fold parity
    (ORACLE_KNN's discipline) with (cosine desc, vec_id) total order."""
    from ..operators.similarity import retrieval_rank_stats

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERY_IDS)
    return retrieval_rank_stats(emb, queries, label_col="label", k=RANK_K,
                                dim=EMB_DIM)


ORACLE_RETRIEVAL_RANKS = f"""
WITH q AS (
  SELECT vec_id AS q_vec_id, label AS q_label, embedding AS qe
  FROM embeddings WHERE vec_id < {KNN_QUERY_IDS}
),
scored AS (
  SELECT q.q_vec_id, q.q_label, e.vec_id, e.label,
         {_duck_cosine('q.qe', 'e.embedding')} AS cosine
  FROM q JOIN embeddings e ON e.vec_id != q.q_vec_id
),
ranked AS (
  SELECT q_vec_id, q_label, label,
         row_number() OVER (
           PARTITION BY q_vec_id ORDER BY cosine DESC, vec_id ASC
         ) AS rank
  FROM scored
)
SELECT q_vec_id, q_label,
       CAST(COUNT(*) FILTER (WHERE label = q_label) AS BIGINT)
         AS n_relevant,
       CAST(MIN(rank) FILTER (WHERE label = q_label) AS BIGINT)
         AS first_hit_rank,
       CAST(COUNT(*) FILTER (WHERE label = q_label AND rank <= {RANK_K})
            AS BIGINT) AS hits_at_k
FROM ranked GROUP BY q_vec_id, q_label
"""
