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
hot grams fan out; production corpora add a gram-frequency cap exactly
like ``ngram_jaccard_pairs(max_shingle_freq=...)`` (dropping ubiquitous
grams can only lose pairs carried ONLY by boilerplate grams). The
verify stage is a JVM ``levenshtein`` expression — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 3  # gram width


def fuzzy_string_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All DISTINCT-value pairs of ``text_col`` with
    ``1 <= levenshtein <= max_dist`` (0 excluded — exact duplicates are
    exact-dedup's job). Output: (name_a, name_b, dist), name_a < name_b.
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

    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
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
