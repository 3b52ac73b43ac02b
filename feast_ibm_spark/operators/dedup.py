"""Deduplication operators (north-star extension; no reference counterpart).

Four tiers, each a different cost/recall point for 100 TB pipelines:

- ``exact_dedup``          — hash groupBy on the full text. One shuffle.
- ``ngram_jaccard_pairs``  — EXACT word-n-gram Jaccard via an inverted-
  index self-join. Quadratic in the worst case (hot shingles); it is the
  correctness oracle for the approximate tiers and fine up to ~10^6 docs
  per shingle-block. At 100 TB use minhash_lsh instead.
- ``minhash_lsh_pairs``    — MinHash signatures + banded LSH bucketing:
  candidates meet in buckets (equi-shuffle, no all-pairs), then exact
  Jaccard verification on the candidates only. Linear-ish; the scale path.
- ``simhash_col``          — 32-bit SimHash per document for hamming-
  distance blocking.

All hot paths are Catalyst higher-order-function expressions (JVM,
whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import FP_BASE, FP_MOD, tokens_col, token_fingerprint_expr


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per exact text value.

    One hash-aggregate shuffle on the text (Spark map-side partial min
    first); at 100 TB swap the raw text for ``xxhash64(text)`` as the
    grouping key to shrink the shuffle — semantics identical modulo hash
    collisions (2^-64)."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .select(id_col, text_col, "dup_count")
    )


def shingles_col(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles of a document -> array<string>."""
    toks = tokens_col(text_col)
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def _exploded_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(shingles_col(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    persist: bool = True,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold (exact).

    Inverted-index self-join: pairs only meet on shared shingles, so the
    shuffle key is the shingle. The threshold test is done in integer
    arithmetic (``common * 10 >= t*10 * union``) so it is exactly
    reproducible across engines; the reported ``jaccard`` is a single
    IEEE-exact division of two integers.

    ``persist`` materializes the exploded-shingle index once
    (MEMORY_AND_DISK) instead of re-tokenizing the corpus for each of the
    three consumers (self-join left/right + size agg) — at scale the
    shingle index is the expensive part, and Spark would otherwise
    recompute it per branch."""
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = _exploded_shingles(df.repartition(par, id_col), text_col, id_col, n)
    if persist:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("size_b"))
    thr_num = int(round(threshold * 1000))
    joined = (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("union_size", F.col("size_a") + F.col("size_b") - F.col("common"))
        .filter(F.col("common") * 1000 >= F.lit(thr_num) * F.col("union_size"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("common").cast("double") / F.col("union_size").cast("double")).alias(
                "jaccard"
            ),
        )
    )
    return joined


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    persist: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified exactly.

    Pipeline (shingle -> minhash -> band -> bucket-join -> verify):
      1. per-doc MinHash signature: k permutations ``(a_i*x + b_i) mod p``
         over shingle fingerprints, k min-aggregates in ONE groupBy;
      2. split the signature into ``bands`` bands (rows = k/bands); docs
         sharing any full band land in the same bucket — an equi-join on
         (band_idx, band_signature), never an all-pairs product;
      3. candidates are verified with EXACT shingle-set Jaccard, so false
         positives are eliminated; recall at J>=0.8 with k=32, b=16, r=2
         is 1 - (1 - 0.8^2)^16 ~ 1 - 2e-8.

    ``persist`` (default) materializes the two subplans that feed multiple
    consumers — the per-doc shingle arrays (signature path + both verify
    sides) and the banded signatures (both sides of the bucket self-join)
    — as MEMORY_AND_DISK. Without it Spark recomputes the whole
    tokenize->shingle->minhash pipeline once per branch (5x the work). At
    100 TB both artifacts are O(corpus) and spill cleanly to local disk;
    this is the standard persist-the-index pattern, not a driver collect.

    At 100 TB: the bucket-join key (band, signature) is high-cardinality
    and uniform, so the shuffle is balanced; hot buckets (boilerplate
    docs) are bounded by pair-count guards in a production setting.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    p = FP_MOD
    # deterministic permutation parameters (fixed seed -> reproducible)
    import random

    rng = random.Random(0xFEA57)
    coeffs = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(num_hashes)]

    # per-doc shingle arrays, computed ONCE and shared by the signature
    # path and the exact-verification joins. The explicit repartition
    # spreads the CPU-heavy tokenize/shingle/minhash expression work across
    # all cores even when the source is a single small file (one input
    # partition otherwise serializes the whole pipeline); the explicit
    # partition count keeps AQE from coalescing it back down.
    par = df.sparkSession.sparkContext.defaultParallelism
    docs_sh = df.repartition(par, id_col).select(
        F.col(id_col), shingles_col(text_col, n).alias("sh")
    )
    if persist:
        docs_sh = docs_sh.persist(StorageLevel.MEMORY_AND_DISK)

    sh = docs_sh.select(F.col(id_col), F.explode("sh").alias("shingle"))
    # shingle fingerprint: xxhash64 (JVM built-in) folded into [0, p)
    shf = sh.withColumn("x", (F.xxhash64("shingle") % p + p) % p)

    sig = shf.groupBy(id_col).agg(
        *[
            F.min((F.col("x") * F.lit(a) + F.lit(b)) % p).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    bands_df = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"h{bi * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("sig"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")
    if persist:
        bands_df = bands_df.persist(StorageLevel.MEMORY_AND_DISK)

    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )

    # exact verification of candidates only (docs_sh reused from above)
    va = docs_sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    vb = docs_sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    thr_num = int(round(threshold * 1000))
    verified = (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "union_size", F.size("sh_a") + F.size("sh_b") - F.col("common")
        )
        .filter(F.col("common") * 1000 >= F.lit(thr_num) * F.col("union_size"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double") / F.col("union_size").cast("double")
            ).alias("jaccard"),
        )
    )
    return verified


def simhash_col(text_col: str = "text", bits: int = 32):
    """SimHash over token rolling-hash fingerprints.

    bit_j(doc) = 1 iff sum over tokens of (2*bit_j(h(token)) - 1) > 0,
    where h is the shared polynomial rolling hash (functions.text).

    Single pass over the token-hash array with an array-of-votes
    accumulator (token hashes computed ONCE per doc, not once per bit).
    Bit extraction uses ``floor(h / 2^j) % 2`` — exact double arithmetic
    for h < 2^30 — instead of shift ops so the identical formula runs in
    the DuckDB oracle. O(tokens x bits) JVM expression work per doc."""
    toks = tokens_col(text_col)
    hashes = F.transform(toks, token_fingerprint_expr)
    powers = F.array(*[F.lit(float(2**j)) for j in range(bits)])
    zero_votes = F.array_repeat(F.lit(0).cast("bigint"), bits)
    votes = F.aggregate(
        hashes,
        zero_votes,
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda a, pw: a + (F.floor(h.cast("double") / pw) % 2) * 2 - 1,
        ),
    )
    # sum of the 2^j for every positive-vote bit; distinct powers of two
    # below 2^bits are exactly representable in double
    return F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, pw: F.when(v > 0, pw).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("bigint")


def dedup_keep_latest(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    created_col: str | None = None,
) -> DataFrame:
    """Generic exact dedup keeping the newest row per key — the engine's
    `dropDuplicates`-with-ordering (window row_number, one shuffle)."""
    order = [F.col(ts_col).desc()]
    if created_col:
        order.append(F.col(created_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
