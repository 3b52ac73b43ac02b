"""Fuzzy (edit-distance) string-similarity join.

The entity-resolution twin of the dedup family: find string pairs within
a small Levenshtein distance WITHOUT the all-pairs product, using
candidates-then-verify (the same discipline as minhash_lsh_pairs /
simhash_near_dup_pairs) with TWO candidate generators dispatched by
length:

- **q-gram count filter** (pairs with ``min_len >= 2*(1+d)``): two
  strings within edit distance ``d`` share at least ``m - q + 1 - d*q``
  q-grams, ``m = max(|a|,|b|)`` (the longer string has ``m-q+1`` grams
  and each edit destroys at most ``q`` of them), so sharing >= 1 gram is
  guaranteed whenever ``m >= q*(1+d)``. TIERED widths: a pair's usable
  width is ``q* = min(Q, floor(min_len/(1+d)))``; each string emits
  grams at the tiers a qualifying partner could require
  (``{min(Q, floor(l/(1+d))) for l in [len-d, len]}``, at most 2
  distinct widths) and candidates equi-join on ``(width, gram)``. Tiers
  below width 2 are NOT used — a width-1 "gram" is a bare character,
  whose buckets are the alphabet itself (measured: near-quadratic
  candidate growth on a 3-5-char code corpus, NOTES.md "fuzzy
  short-string flood").
- **deletion-neighborhood join** (pairs with ``min_len <= 2d+1``, i.e.
  both sides ``len <= 3d+1``): FastSS (Bocek et al. 2007, public
  algorithm) — if ``lev(a,b) <= d`` then deleting at most ``d``
  characters from each side reaches a COMMON string (align the edit
  script: a substitution deletes the differing character from both
  sides, an insert/delete deletes from the longer side). Every string
  with ``len <= 3d+1`` emits its <=d-deletion variants
  (``C(3d+1, <=d)`` keys, a constant) and candidates equi-join on the
  variant. Variant buckets are ALPHABET-bounded (strings within d
  deletions of a fixed key), not corpus-bounded, so the round-8 brute
  bucket — quadratic in the short-string count, measured 20.7s at 10k /
  80.0s at 20k 3-5-char codes — is gone entirely; len <= d strings
  (including empty) meet partners through the "" / short variants.

Pairs with ``min_len`` in ``[2d+2, ...)`` take the gram path, pairs at
``<= 2d+1`` the deletion path — no gap, overlap harmless (union +
distinct). The verify stage is a JVM ``levenshtein`` expression — no
Python anywhere.

At 100 TB, two levers on the gram path (both result-preserving or
documented):

- ``length_bucketing=True`` widens the join key to (width, gram, length
  bucket): candidate pairs must satisfy ``|len_a - len_b| <= max_dist``
  anyway, so bucketing lengths at width ``2*max_dist + 1`` and probing
  the two buckets that can contain a qualifying partner is LOSSLESS
  (floor is monotone: every length within ``±max_dist`` of ``len_a``
  lands in one of the two endpoint buckets). A hot gram's fanout drops
  from c^2 to sum over length-buckets of c_b^2. Costs <=2x rows on the
  probe side. (The deletion path needs neither: its buckets are
  alphabet-bounded by construction.)
- ``max_gram_freq`` caps the per-(width, gram) document frequency
  exactly like ``ngram_jaccard_pairs(max_shingle_freq=...)``: grams
  shared by more than that many distinct names leave the JOIN side. A
  qualifying pair is lost only if EVERY gram it shares is ubiquitous —
  for edit distance that means two near-identical strings built
  entirely from boilerplate grams, which is the fanout being priced
  out. None (default) is exact.

Property-pinned against a pure-Python brute force on random
short-alphabet corpora straddling every tier boundary and both paths
(tests/test_north_star.py::test_fuzzy_pairs_property_match_brute_force).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 3  # widest gram tier


def _deletion_variants_sql(col: str, d: int) -> str:
    """SQL expression: array of all strings reachable from ``col`` by
    deleting at most ``d`` characters (self included), distinct. Built
    by iterating the one-deletion step ``d`` times driver-side — the
    expression doubles per level, which is fine for the tiny strings
    (len <= 3d+1) this path handles."""
    vs = f"array({col})"
    for _ in range(d):
        vs = (
            f"array_distinct(concat({vs}, flatten(transform({vs}, "
            "s -> transform(sequence(1, greatest(length(s), 1)), "
            "i -> concat(substr(s, 1, i-1), substr(s, i+1)))))))"
        )
    return vs


def fuzzy_string_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 1,
    max_gram_freq: int | None = None,
    length_bucketing: bool = False,
) -> DataFrame:
    """All DISTINCT-value pairs of ``text_col`` with
    ``1 <= levenshtein <= max_dist`` (0 excluded — exact duplicates are
    exact-dedup's job). Output: (name_a, name_b, dist), name_a < name_b.

    ``length_bucketing`` is lossless (see module docstring);
    ``max_gram_freq`` trades boilerplate-only pairs for bounded fanout.
    """
    names = df.select(F.col(text_col).alias("name")).distinct()
    d = max_dist

    # ---- gram path: tier widths a qualifying partner could require —
    # for partner min-lengths l in [len-d, len], width
    # min(Q, l div (1+d)), keeping widths >= 2 only (width-1 buckets are
    # the alphabet; those pairs belong to the deletion path below)
    widths = F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(
                    F.greatest(F.length("name") - d, F.lit(1)),
                    F.greatest(F.length("name"), F.lit(1)),
                ),
                lambda l: F.least(F.lit(Q), F.floor(l / (d + 1))).cast("int"),
            ),
            lambda q: q >= 2,
        )
    )
    # positional substring needs column start/width -> SQL transform
    grams = (
        names.select("name", F.explode(widths).alias("q"))
        .select(
            "name",
            "q",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, length(name) - q + 1), "
                        "i -> substring(name, i, q))"
                    )
                )
            ).alias("gram"),
        )
    )

    if max_gram_freq is not None:
        # anti-join the OVER-cap (width, gram) keys (tiny; AQE
        # broadcast-converts) instead of inner-joining the ~all-grams
        # keep set — same inversion as the dedup/exact_substr cap sites
        # (NOTES.md "Frequency-cap joins inverted to hot-set
        # anti-joins"). Grams are substrings of non-null names — never
        # NULL — so the inner->anti flip changes nothing (same non-null
        # invariant as the dedup cap sites).
        hot = (
            grams.groupBy("q", "gram")
            .agg(F.count(F.lit(1)).alias("__freq"))
            .filter(F.col("__freq") > max_gram_freq)
            .select("q", "gram")
        )
        grams = grams.join(hot, ["q", "gram"], "left_anti")

    if length_bucketing:
        # Bucket width > 2*max_dist: any partner length within ±max_dist
        # of len(a) falls in bucket floor((len±max_dist)/W) — probe both.
        w = 2 * max_dist + 1
        build = grams.withColumn(
            "bucket", F.floor(F.length("name") / F.lit(w))
        )
        probe = grams.select(
            "name",
            "q",
            "gram",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor((F.length("name") - max_dist) / F.lit(w)),
                        F.floor((F.length("name") + max_dist) / F.lit(w)),
                    )
                )
            ).alias("bucket"),
        )
        a, b = probe.alias("a"), build.alias("b")
        join_cond = (
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.bucket") == F.col("b.bucket"))
        )
    else:
        a, b = grams.alias("a"), grams.alias("b")
        join_cond = (F.col("a.q") == F.col("b.q")) & (
            F.col("a.gram") == F.col("b.gram")
        )

    cand = (
        a.join(
            b,
            join_cond
            & (F.col("a.name") < F.col("b.name"))
            & (
                F.abs(F.length(F.col("a.name")) - F.length(F.col("b.name")))
                <= max_dist
            ),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )

    # ---- deletion path: pairs with min_len <= 2d+1 (both sides then
    # <= 3d+1) equi-join on a shared <=d-deletion variant (FastSS)
    dels = names.filter(F.length("name") <= 3 * d + 1).select(
        "name",
        F.explode(F.expr(_deletion_variants_sql("name", d))).alias("variant"),
    )
    da, db = dels.alias("da"), dels.alias("db")
    short_cand = (
        da.join(
            db,
            (F.col("da.variant") == F.col("db.variant"))
            & (F.col("da.name") < F.col("db.name"))
            & (
                F.abs(F.length(F.col("da.name")) - F.length(F.col("db.name")))
                <= max_dist
            ),
        )
        .select(
            F.col("da.name").alias("name_a"), F.col("db.name").alias("name_b")
        )
        .distinct()
    )

    verified = (
        cand.unionByName(short_cand)
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
    )
    return verified
