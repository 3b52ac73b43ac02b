"""Split from the round-4 queries.py monolith; see queries/__init__.py."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .corpus import (  # noqa: F401
    CURATION_QUALITY_FLOOR,
    JACCARD_THRESHOLD,
    NGRAM_N,
    _DUCK_SHINGLES,
)

# North-star: text analysis
# --------------------------------------------------------------------------


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_col("text").alias("n_tokens"))


def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequencies: lateral explode of the token array
    into a grouped count, deterministic top-50 by (count desc, token asc).
    The explode is map-side (no shuffle until the count), so at 100 TB the
    wide stage carries (token, partial_count) pairs, not raw text."""
    from ..functions.text import tokens_col

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )


ORACLE_TOP_TOKENS = f"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 50
"""


ORACLE_TOKEN_COUNT = f"""
SELECT doc_id, CAST(len({_DUCK_TOKENS}) AS INTEGER) AS n_tokens FROM documents
"""


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_token_count_col("text").alias("n_bpe_tokens"))


ORACLE_BPE_TOKENS = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}')) AS INTEGER)
         AS n_bpe_tokens
FROM documents
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_col("text").alias("fingerprint"))


ORACLE_FINGERPRINT = f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1),
        i -> CAST(unicode(text[i:i]) AS BIGINT))),
    (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}
  ) AS fingerprint
FROM documents
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id_col("text").alias("lang_pred"))


def _duck_stop_count(words: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_DUCK_TOKENS}, t -> lower(t) IN ({inlist})))"


def _oracle_lang_id() -> str:
    counts = {lang: _duck_stop_count(ws) for lang, ws in LANG_STOPWORDS.items()}
    cols = ", ".join(f"{expr} AS c_{lang}" for lang, expr in counts.items())
    langs = list(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    whens = " ".join(
        f"WHEN c_{lg} > 0 AND c_{lg} = {best} THEN '{lg}'" for lg in langs
    )
    return f"""
WITH counted AS (SELECT doc_id, {cols} FROM documents)
SELECT doc_id, CASE {whens} ELSE 'unknown' END AS lang_pred FROM counted
"""


ORACLE_LANG_ID = _oracle_lang_id()


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = quality_score_col("text")
    return docs.select(
        "doc_id",
        s.alpha_ratio.alias("alpha_ratio"),
        s.stop_ratio.alias("stop_ratio"),
        s.mean_tok_len.alias("mean_tok_len"),
        s.quality_score.alias("quality_score"),
    )


ORACLE_QUALITY = f"""
WITH base AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS n_alpha,
    CAST(len({_DUCK_TOKENS}) AS DOUBLE) AS n_tok,
    CAST(len(list_filter({_DUCK_TOKENS}, t -> lower(t) IN ({_DUCK_EN_STOPS}))) AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id,
  n_alpha / n_chars AS alpha_ratio,
  n_stop / n_tok AS stop_ratio,
  n_alpha / n_tok AS mean_tok_len,
  (n_alpha / n_chars) * 0.5 + (n_stop / n_tok) * 0.3 + ((n_alpha / n_tok) / 10.0) * 0.2
    AS quality_score
FROM base
"""

ORACLE_CURATION = f"""
WITH survivors AS (
  SELECT doc_id, text,
         (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / length(text)) * 0.5
         + (CAST(len(list_filter({_DUCK_TOKENS}, t -> lower(t) IN ({{stops}}))) AS DOUBLE)
            / len({_DUCK_TOKENS})) * 0.3
         + ((CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / len({_DUCK_TOKENS})) / 10.0) * 0.2 AS quality_score
  FROM (
    SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
  )
  WHERE (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / length(text)) * 0.5
      + (CAST(len(list_filter({_DUCK_TOKENS}, t -> lower(t) IN ({{stops}}))) AS DOUBLE)
            / len({_DUCK_TOKENS})) * 0.3
      + ((CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / len({_DUCK_TOKENS})) / 10.0) * 0.2 >= {CURATION_QUALITY_FLOOR}
),
sh AS (
  SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle FROM survivors
),
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
)
SELECT doc_id,
       CAST(len({_DUCK_TOKENS}) AS INTEGER) AS n_tokens,
       quality_score
FROM survivors
WHERE doc_id NOT IN (SELECT doc_b FROM neardup)
""".replace("{stops}", _DUCK_EN_STOPS)

# --------------------------------------------------------------------------


KEYWORD_TOP_K = 3


def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-3 most distinctive terms
    by tf x linear-idf. Scoring uses idf = N/df (the linear variant)
    INSTEAD of ln(N/df) deliberately: score = tf * N / df is then one
    IEEE division of exact integers — hash-identical across engines and
    with a cross-engine-stable ranking, where a log-idf's ulp skew could
    flip near-tied ranks and change WHICH rows appear (a failure rtol
    cannot absorb). Ranking is monotone in tf/df for fixed N either way.

    Shape: one token explode, tf by (doc, token), df by token off the
    same aggregate (distinct doc carried by the tf frame — no second
    scan), broadcast-joined back, one top-k window."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # one metadata scalar, like the ANN seed fetch
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        tf.join(df_, "token")
        .withColumn(
            "score",
            (F.col("tf") * F.lit(n_docs)).cast("double")
            / F.col("df").cast("double"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= KEYWORD_TOP_K)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


ORACLE_TEXT_KEYWORDS = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
),
dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
),
scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
         CAST(t.tf * (SELECT count(*) FROM documents) AS DOUBLE)
           / CAST(d.df AS DOUBLE) AS score
  FROM tf t JOIN dfreq d USING (token)
)
SELECT doc_id, token, tf, df, score,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY score DESC, token ASC
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {KEYWORD_TOP_K}
"""


def q_text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction over the corpus (training-data hygiene: no
    emails/phone numbers may reach a training shard). The synthetic
    corpus contains no organic PII, so the query first INJECTS
    deterministic PII — docs with doc_id%7==0 gain a doc_id-derived
    email, doc_id%11==0 a doc_id-derived phone (doc_id%77==0 both) —
    then counts matches and emits the redacted length, all as pure
    map-side expressions (regexp scan inside whole-stage codegen, no
    shuffle, no UDF). The oracle repeats injection+scan+redaction in
    RE2; patterns live in the Java-regex/RE2 common subset so the match
    sets are engine-identical (functions/text.py PII_*_RE)."""
    from ..functions.text import (
        pii_email_count_col,
        pii_phone_count_col,
        pii_redact_col,
    )

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.format_string(" contact user%d@example.com", F.col("doc_id")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.format_string(
                    " call 555-%03d-%04d",
                    (F.col("doc_id") % 1000).cast("int"),
                    (F.col("doc_id") % 10000).cast("int"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return injected.select(
        "doc_id",
        pii_email_count_col("text").cast("bigint").alias("n_emails"),
        pii_phone_count_col("text").cast("bigint").alias("n_phones"),
        F.length(pii_redact_col("text")).cast("bigint").alias("clean_len"),
    )


ORACLE_TEXT_PII = """
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN printf(' contact user%d@example.com', doc_id)
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN printf(' call 555-%03d-%04d',
                             CAST(doc_id % 1000 AS INTEGER),
                             CAST(doc_id % 10000 AS INTEGER))
                 ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text,
            '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       CAST(length(regexp_replace(regexp_replace(text,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
            '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS BIGINT)
         AS clean_len
FROM injected
"""


BPE_N_MERGES = 8


def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE training (Sennrich-style word-frequency formulation):
    learn the top-8 merges from corpus statistics — tokenize + word-freq
    aggregate over the full corpus (the distributed heavy part), then 8
    iterative rounds of weighted adjacent-pair counting, deterministic
    argmax, and greedy merge application over the vocabulary. The
    self-delimited sequence encoding makes merge application ONE string
    replace whose non-overlapping left-to-right semantics are identical
    in Spark, DuckDB, and Python (operators/bpe.py) — so the oracle
    unrolls the same 8 rounds in SQL (MATERIALIZED per the round-6
    iterative-CTE lesson) and the gate value-hashes the learned merge
    table itself."""
    from ..operators.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=BPE_N_MERGES)


def _bpe_chain(n_merges: int) -> str:
    """The shared WITH-chain of the BPE oracles: vocab base + n unrolled
    training rounds. Control-char delimiters, mirroring operators/bpe.py
    (chr(1)/chr(2)); the token regex carries ESCAPED control chars — RE2
    and Java agree. MATERIALIZED per the round-6 iterative-CTE lesson
    (inlined CTEs re-evaluate the base subtree ~3^rounds times)."""
    parts = ["""
WITH base AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS f,
         chr(1) || array_to_string(string_split(w, ''), chr(2) || chr(1))
                || chr(2) AS seq
  FROM (
    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
  )
  WHERE w <> '' AND strpos(w, chr(1)) = 0 AND strpos(w, chr(2)) = 0
  GROUP BY w
),
r0 AS MATERIALIZED (SELECT w, f, seq FROM base)"""]
    for k in range(1, n_merges + 1):
        parts.append(f""",
p{k} AS MATERIALIZED (
  SELECT t[i] AS l, t[i + 1] AS r, CAST(sum(f) AS BIGINT) AS freq
  FROM (SELECT f, regexp_extract_all(seq, '\\x01([^\\x02]+)\\x02', 1) AS t
        FROM r{k - 1}),
       unnest(range(1, len(t))) AS u(i)
  GROUP BY 1, 2
),
m{k} AS MATERIALIZED (
  SELECT l, r, freq FROM p{k} ORDER BY freq DESC, l, r LIMIT 1
),
r{k} AS MATERIALIZED (
  SELECT w, f,
         replace(seq, chr(1) || m.l || chr(2) || chr(1) || m.r || chr(2),
                 chr(1) || m.l || m.r || chr(2)) AS seq
  FROM r{k - 1}, m{k} m
)""")
    return "".join(parts)


def _bpe_oracle(n_merges: int) -> str:
    sel = "\nUNION ALL ".join(
        f"SELECT {k} AS rank, l AS \"left\", r AS \"right\", "
        f"l || r AS merged, freq AS pair_freq FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return _bpe_chain(n_merges) + f"\nSELECT * FROM (\n{sel}\n) ORDER BY rank"


def _bpe_encode_oracle(n_merges: int) -> str:
    return _bpe_chain(n_merges) + f""",
seg AS MATERIALIZED (
  SELECT w,
         CAST(len(regexp_extract_all(seq, '\\x01([^\\x02]+)\\x02', 1))
              AS BIGINT) AS n_sub
  FROM r{n_merges}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_tokens
FROM (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
) d
JOIN seg USING (w)
GROUP BY doc_id
"""


ORACLE_BPE_TRAIN = _bpe_oracle(BPE_N_MERGES)
ORACLE_BPE_ENCODE = _bpe_encode_oracle(BPE_N_MERGES)


def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-APPLY token budgeting: every document tokenized with
    the merges just learned from this corpus; per-doc word and subword
    counts. Application is a broadcast join from document words to the
    trained vocabulary's cached word->segments table (the corpus is
    never re-scanned per merge) — the same asymmetry real tokenizers
    exploit. Oracle extends the train chain with the segmentation join."""
    from ..operators.bpe import bpe_encode_counts

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode_counts(docs, n_merges=BPE_N_MERGES)


def q_eval_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality CONFUSION MATRIX at corpus scale: the
    stopword-profile language detector's predictions crossed against the
    corpus's labeled ``lang`` column — per (actual, predicted) cell the
    exact count plus the row share within the actual language (one exact
    division). The eval shape that tells you WHICH languages the
    detector confuses, not just how often it is right; one map-side
    predict + one tiny group-by."""
    docs = _t(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("actual"),
        lang_id_col("text").alias("predicted"),
    )
    cell = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = cell.groupBy("actual").agg(F.sum("n").alias("__t"))
    return cell.join(row_tot, "actual").select(
        "actual",
        "predicted",
        "n",
        (F.col("n").cast("double") / F.col("__t").cast("double"))
        .alias("row_share"),
    )


def _oracle_lang_confusion() -> str:
    pred_sql = ORACLE_LANG_ID.strip().rstrip()
    return f"""
WITH pred AS ({pred_sql}),
cell AS (
  SELECT d.lang AS actual, p.lang_pred AS predicted,
         CAST(count(*) AS BIGINT) AS n
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
),
row_tot AS (
  SELECT actual, CAST(sum(n) AS BIGINT) AS t FROM cell GROUP BY actual
)
SELECT actual, predicted, n,
       CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS row_share
FROM cell JOIN row_tot USING (actual)
"""


ORACLE_LANG_CONFUSION = _oracle_lang_confusion()


# Count-Min sketch: d independent counter rows, bucket = (poly-hash(token)
# * A_j) mod P mod W. All counters are integer SUMS over deterministic
# buckets, so — unlike the HLL sketch, whose binary state is not
# SQL-replicable — this approximate structure carries a FULL value-hash
# oracle: the estimate (min over rows) is bit-identical in any engine.
CMS_D, CMS_W, CMS_TOPK = 3, 1024, 20
CMS_A = (48271, 69621, 16807)   # minstd-family multipliers, one per row
CMS_P = 2_147_483_647


def q_text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a Count-Min sketch, validated against exact
    counts in one query: the CMS is THE mergeable-sketch answer when
    the key space itself is too large for exact per-key state (d x w
    integer counters regardless of vocabulary; counters merge by
    addition across partitions/days — the 100 TB shape), and its
    one-sided error (estimate >= truth, within n/w w.h.p.) is visible
    here because the output carries BOTH numbers per top-20 token.
    Everything is integer arithmetic over the portable polynomial token
    hash, so the driver value-hashes the sketch itself — approximate in
    GUARANTEE, exact in REPRODUCTION. Counters build from the per-token
    exact aggregate (sum of counts per bucket == sum over occurrences,
    one groupBy over |vocab| rows instead of every token occurrence);
    the d x w counter table (<= 3072 rows) broadcasts to the top-k
    probe. Top-20 cut is deterministic: ORDER BY count DESC, token."""
    from ..functions.text import token_fingerprint_expr, tokens_col

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_col("text")).alias("token"))
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    keyed = exact.withColumn(
        "__f", token_fingerprint_expr(F.col("token"))
    )
    a_arr = F.array(*[F.lit(a) for a in CMS_A])
    j = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("__j")
    bucket = (
        (F.col("__f") * F.element_at(a_arr, F.col("__j") + 1)) % CMS_P
    ) % CMS_W
    spread = keyed.select("token", "exact_count", "__f", j).withColumn(
        "__bucket", bucket
    )
    counters = spread.groupBy("__j", "__bucket").agg(
        F.sum("exact_count").alias("__c")
    )
    top = keyed.orderBy(
        F.col("exact_count").desc(), F.col("token").asc()
    ).limit(CMS_TOPK)
    probe = top.select("token", "exact_count", "__f", j).withColumn(
        "__bucket", bucket
    )
    return (
        probe.join(F.broadcast(counters), ["__j", "__bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("__c").alias("cms_estimate"))
        .select("token", "exact_count", "cms_estimate")
    )


_DUCK_CMS_ROWS = ", ".join(
    f"({i}, {a})" for i, a in enumerate(CMS_A)
)
_DUCK_TOKEN_FP_COL = f"""
list_reduce(
  list_prepend(CAST(0 AS BIGINT),
    list_transform(range(1, length(token) + 1),
      i -> CAST(unicode(token[i:i]) AS BIGINT))),
  (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}
)
"""

ORACLE_CMS_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKENS}) AS token FROM documents
),
exact AS (
  SELECT token, CAST(count(*) AS BIGINT) AS exact_count
  FROM toks GROUP BY token
),
keyed AS (
  SELECT token, exact_count, {_DUCK_TOKEN_FP_COL} AS f FROM exact
),
spread AS (
  SELECT token, exact_count, r.j,
         ((f * r.a) % {CMS_P}) % {CMS_W} AS bucket
  FROM keyed, (VALUES {_DUCK_CMS_ROWS}) AS r(j, a)
),
counters AS (
  SELECT j, bucket, CAST(SUM(exact_count) AS BIGINT) AS c
  FROM spread GROUP BY j, bucket
),
top AS (
  SELECT token, exact_count, f FROM keyed
  ORDER BY exact_count DESC, token LIMIT {CMS_TOPK}
),
probe AS (
  SELECT token, exact_count, r.j,
         ((f * r.a) % {CMS_P}) % {CMS_W} AS bucket
  FROM top, (VALUES {_DUCK_CMS_ROWS}) AS r(j, a)
)
SELECT p.token, p.exact_count, CAST(MIN(c.c) AS BIGINT) AS cms_estimate
FROM probe p JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY p.token, p.exact_count
"""
