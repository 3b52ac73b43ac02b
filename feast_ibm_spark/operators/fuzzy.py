"""Fuzzy (edit-distance) string-similarity join.

The entity-resolution twin of the dedup family: find string pairs within
a small Levenshtein distance WITHOUT the all-pairs product, using the
classic q-gram count filter as the candidate generator and the exact
edit distance as the verifier — the same candidates-then-verify
discipline as minhash_lsh_pairs / simhash_near_dup_pairs.

Completeness (why the filter is safe, not just plausible): two strings
within edit distance ``d`` share at least ``max(|a|,|b|) - q + 1 - d*q``
q-grams (each edit destroys at most ``q`` of the longer string's grams).
With q=3 that bound is positive iff ``len > q - 1 + d*q``; strings too
short for the bound are routed to a tiny brute-force bucket instead of
being silently dropped. Sharing >= 1 gram is a superset of the bound, so
the equi-join on grams never loses a qualifying pair.

At 100 TB: the join key is a 3-gram — low cardinality per language, so
hot grams fan out. Two levers (both result-preserving or documented):

- ``length_bucketing=True`` widens the join key to (gram, length
  bucket): candidate pairs must satisfy ``|len_a - len_b| <= max_dist``
  anyway, so bucketing lengths at width ``2*max_dist + 1`` and probing
  the two buckets that can contain a qualifying partner is LOSSLESS
  (floor is monotone: every length within ``±max_dist`` of ``len_a``
  lands in one of the two endpoint buckets). A hot gram's fanout drops
  from c^2 to sum over length-buckets of c_b^2 — for name corpora with
  spread lengths that is the difference between one whale task and
  balanced tasks. Costs <=2x rows on the probe side.
- ``max_gram_freq`` caps the per-gram document frequency exactly like
  ``ngram_jaccard_pairs(max_shingle_freq=...)``: grams shared by more
  than that many distinct names leave the JOIN side. A qualifying pair
  is lost only if EVERY gram it shares is ubiquitous — for edit
  distance that means two near-identical strings built entirely from
  boilerplate grams, which is the fanout being priced out. None
  (default) is exact.

The verify stage is a JVM ``levenshtein`` expression — no Python
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 3  # gram width


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
    min_safe = Q - 1 + max_dist * Q  # bound positive above this length

    long_names = names.filter(F.length("name") > min_safe)
    short_names = names.filter(F.length("name") <= min_safe)

    # positional substring needs a column start index -> SQL transform
    grams = long_names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(name) - {Q - 1}), "
                    f"i -> substring(name, i, {Q}))"
                )
            )
        ).alias("gram"),
    )

    if max_gram_freq is not None:
        # anti-join the OVER-cap grams (tiny; AQE broadcast-converts)
        # instead of inner-joining the ~all-grams keep set — same
        # inversion as the dedup/exact_substr cap sites (NOTES.md
        # "Frequency-cap joins inverted to hot-set anti-joins")
        hot = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__freq"))
            .filter(F.col("__freq") > max_gram_freq)
            .select("gram")
        )
        grams = grams.join(hot, "gram", "left_anti")

    if length_bucketing:
        # Bucket width > 2*max_dist: any partner length within ±max_dist
        # of len(a) falls in bucket floor((len±max_dist)/W) — probe both.
        w = 2 * max_dist + 1
        build = grams.withColumn(
            "bucket", F.floor(F.length("name") / F.lit(w))
        )
        probe = grams.select(
            "name",
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
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.bucket") == F.col("b.bucket"))
        )
    else:
        a, b = grams.alias("a"), grams.alias("b")
        join_cond = F.col("a.gram") == F.col("b.gram")

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

    # short strings: the count bound is vacuous, brute-force their tiny
    # bucket (short x (short + long-within-length-reach))
    sa = short_names.select(F.col("name").alias("name_a"))
    sb = names.select(F.col("name").alias("name_b"))
    short_cand = sa.join(
        sb,
        (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= max_dist),
    )

    verified = (
        cand.unionByName(short_cand)
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
    )
    return verified
