"""Text-analysis column expressions (north-star extension; no reference
counterpart — BASELINE.json ``north_star``).

Everything here is a *pure Catalyst expression* built from
``pyspark.sql.functions`` higher-order functions: no Python UDFs, so the
hot path stays inside whole-stage codegen on the JVM and scales linearly
per-token/per-char at 100 TB.

Every function is designed to be exactly replicable in ANSI/DuckDB SQL
(integer arithmetic, left-to-right folds) so the driver's oracle
comparison can hash-match the results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Rolling-hash parameters (shared with the DuckDB oracles; all arithmetic
# stays below 2^63: acc < P, acc*31 + code < 2^35).
FP_MOD = 1_000_000_007
FP_BASE = 31

# Tiny per-language stopword lists for the n-gram/lexicon language-ID
# heuristic. Deterministic and trivially replicable in SQL.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "fr": ["le", "les", "des", "et", "est", "un"],
}


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count_col(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text))


# BPE-style pre-tokenizer pattern (GPT-2-ish, simplified to the subset
# shared by Java regex and DuckDB's RE2): letter runs, digit runs, single
# non-space symbols. Subword merging itself needs a trained vocab; the
# pre-tokenize + count step below is what pipelines use for length
# filtering and cost estimation at corpus scale.
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count_col(text: str | Column = "text") -> Column:
    """Number of BPE-style pre-tokens (regex matches), JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def char_codes_col(text: str | Column = "text") -> Column:
    """array<int> of unicode codepoints, 1 per character (JVM-side).

    ``split(text, '')`` yields exactly one single-character element per
    character (verified: no trailing empty element), so codepoint
    extraction is one linear pass. The previous ``substr(i, 1)`` inside
    ``transform(sequence(...))`` formulation re-walked the string prefix
    per position — O(n^2) per document, real money on long documents."""
    c = F.col(text) if isinstance(text, str) else text
    return F.transform(F.split(c, ""), F.ascii)


def fingerprint_col(text: str | Column = "text") -> Column:
    """Deterministic document fingerprint: left-to-right polynomial rolling
    hash over characters, ``acc = (acc * 31 + codepoint) mod 1e9+7``.

    Linear per document (split-once char array; see char_codes_col). Same
    recurrence is expressible in DuckDB as
    ``list_reduce(list_transform(range(...), i -> unicode(...)), ...)``;
    the empty string folds to 0 under both formulations.
    """
    return F.aggregate(
        char_codes_col(text),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * FP_BASE + x.cast("bigint")) % FP_MOD,
    )


def token_fingerprint_expr(token: Column) -> Column:
    """Rolling hash of a single token (nested-lambda safe, linear)."""
    return F.aggregate(
        F.transform(F.split(token, ""), F.ascii),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * FP_BASE + x.cast("bigint")) % FP_MOD,
    )


def stopword_count_col(text: str | Column, words: list[str]) -> Column:
    """Number of tokens that are in ``words`` (case-insensitive)."""
    toks = tokens_col(text)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def lang_id_col(text: str | Column = "text") -> Column:
    """Argmax language over the stopword-hit counts, priority-ordered
    en > es > de > fr on ties; 'unknown' when nothing matches."""
    counts = {lang: stopword_count_col(text, ws) for lang, ws in LANG_STOPWORDS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("unknown")
    # build from lowest priority up so the highest-priority WHEN wins
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def bm25_scores(
    df,
    query_tokens: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 relevance of every matching document for a bag-of-words query.

    Classic Robertson/Sparck-Jones BM25 (the +1 idf variant that never
    goes negative): for each query term t,
    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` and
    ``score = sum_t idf * tf*(k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))``.

    Plan shape (scales like the term-frequency pipeline, not the corpus
    cross-product): tokenize once, explode ONLY tokens that appear in the
    query (map-side filter — the exploded stream carries query terms
    only), aggregate (doc, term) frequencies in one shuffle, broadcast
    the per-term document frequencies (at most ``len(query_tokens)``
    rows) and the (N, avgdl) scalars back onto it, and sum per doc. Docs
    sharing no query term never leave the map side.

    Returns (id_col, score) — one row per document that matches at least
    one query term. Exact replication note: the log/division float math
    matches DuckDB to ~1 ulp (libm vs JVM Math.log), so oracle comparison
    uses rtol=1e-12 rather than the hash gate.
    """
    from pyspark.sql import functions as F

    q = list(dict.fromkeys(query_tokens))
    toks = tokens_col(text_col)
    qarr = F.array(*[F.lit(t) for t in q])

    # corpus scalars: one tiny agg (N docs, average doc length)
    stats = df.select(F.size(tokens_col(text_col)).alias("__dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("__dl").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"])

    per_doc = df.select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        F.explode(F.filter(toks, lambda t: F.array_contains(qarr, t))).alias("__t"),
    )
    tf = per_doc.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    norm = F.col("__tf") * (k1 + 1) / (
        F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.lit(avgdl))
    )
    return (
        tf.join(F.broadcast(dfreq), "__t")
        .withColumn("__s", idf * norm)
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )


def quality_score_col(text: str | Column = "text") -> Column:
    """Composite quality score from deterministic integer ratios:
    alpha ratio, stopword ratio, mean token length. All arithmetic on
    exact integers -> IEEE-exact doubles, replicable in any SQL engine."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("double")
    n_tok = token_count_col(c).cast("double")
    n_stop = stopword_count_col(c, LANG_STOPWORDS["en"]).cast("double")
    alpha_ratio = n_alpha / n_chars
    stop_ratio = n_stop / n_tok
    mean_tok_len = n_alpha / n_tok
    score = alpha_ratio * 0.5 + stop_ratio * 0.3 + (mean_tok_len / 10.0) * 0.2
    return F.struct(
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("quality_score"),
    )


# PII scanning/redaction (round 6). Patterns are deliberately written in
# the common subset of Java regex (Spark, executor-side codegen) and RE2
# (DuckDB oracle): plain character classes, no backrefs/lookarounds, so
# match sets are engine-identical. Extend with locale packs as needed;
# at 100 TB both the scan and the redaction are map-only expressions
# inside whole-stage codegen — zero shuffle, scan-bound.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_email_count_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PII_EMAIL_RE))


def pii_phone_count_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PII_PHONE_RE))


def pii_redact_col(text: str | Column = "text") -> Column:
    """Emails then phones replaced with typed placeholders — email first
    so a phone-looking fragment inside a matched email can't double-fire
    (neither engine rescans replacement text; placeholders contain no
    digits or '@', so ordering is the only cross-pattern hazard)."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
