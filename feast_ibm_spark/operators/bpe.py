"""Real BPE merge training — iterative byte-pair-encoding over a corpus.

The reference's text surface stops at a BPE-ish token REGEX; this is the
actual trainer: learn the top-N merges from corpus statistics, exactly
the (Sennrich et al. 2016) word-frequency formulation production
tokenizers (HF tokenizers, SentencePiece BPE mode) use — pair counts are
weighted by word frequency, merges apply greedily left-to-right within
each word.

Distributed shape: the heavy part is corpus tokenization + word-frequency
aggregation (one shuffle over the full corpus); training then iterates
over the WORD VOCABULARY (weighted by frequency), which is orders of
magnitude smaller than the corpus — the same asymmetry real trainers
exploit. Each round is: adjacent-pair count (map-side expand + one small
shuffle) -> global argmax (a 1-row limit collect, like the per-round
materialization in ``operators/graph.py``) -> merge application as ONE
string ``replace`` per word.

Cross-engine exactness (the oracle story): symbol sequences are encoded
SELF-DELIMITED with control characters — ``spark`` ->
``\\x01s\\x02\\x01p\\x02...`` — so applying merge (x, y) is
``replace(seq, D1+x+D2+D1+y+D2, D1+x+y+D2)``. Both Spark and DuckDB
``replace`` substitute non-overlapping occurrences left-to-right, which
is EXACTLY BPE's greedy merge semantics (``aaa`` with merge (a,a) ->
``aa a``), and the wrapping makes adjacent matches share no characters,
so the two engines — and a plain Python greedy scan — agree
byte-for-byte. Merge patterns are passed as COLUMN values (``F.lit``),
never interpolated into SQL text, so tokens containing quotes or SQL
metacharacters train fine (the 10x smoke corpus's ``Copy<'_8'>`` markers
caught exactly this). Words containing the delimiter control chars
themselves (never real text) are excluded in both engines. Argmax ties
break on (freq DESC, left ASC, right ASC) in both engines.

Lineage: ``localCheckpoint`` per round (the dedup_clusters pattern) so
the plan does not deepen with the merge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col

D1, D2 = "\x01", "\x02"  # symbol delimiters: <D1>sym<D2> per symbol
# regex with ESCAPED control chars (no raw bytes in the pattern) —
# identical escape syntax in Java regex and DuckDB's RE2
TOK_PATTERN = r"\x01([^\x02]+)\x02"
# adjacent (left, right) symbol pairs over a pre-extracted token array;
# the index lambda guards t[i+1] so ANSI mode never sees out-of-bounds
_PAIRS = (
    "filter(transform(t, (x, i) -> IF(i + 1 < size(t),"
    " struct(x AS l, t[i + 1] AS r),"
    " CAST(NULL AS struct<l: string, r: string>))),"
    " p -> p IS NOT NULL)"
)


def _train(df: DataFrame, text_col: str, n_merges: int):
    """Shared trainer core: returns (merges list, final vocab DataFrame
    with (w, f, seq) — each word's post-merge symbol sequence)."""
    words = (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .filter(
            (F.col("w") != "")
            & ~F.col("w").contains(D1)
            & ~F.col("w").contains(D2)
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    cur = words.select(
        "w",
        "f",
        F.concat(
            F.lit(D1), F.concat_ws(D2 + D1, F.split("w", "")), F.lit(D2)
        ).alias("seq"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            cur.select(
                "f",
                F.regexp_extract_all(
                    "seq", F.lit(TOK_PATTERN), F.lit(1)
                ).alias("t"),
            )
            .select("f", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("f").alias("freq"))
            .orderBy(F.col("freq").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged (every word one symbol)
        l, r, freq = top[0].l, top[0].r, int(top[0].freq)
        merges.append((rank, l, r, l + r, freq))
        nxt = cur.select(
            "w",
            "f",
            F.replace(
                F.col("seq"),
                F.lit(D1 + l + D2 + D1 + r + D2),
                F.lit(D1 + l + r + D2),
            ).alias("seq"),
        ).localCheckpoint(eager=True)
        cur.unpersist()
        cur = nxt
    return merges, cur


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges from the corpus.

    Returns (rank, left, right, merged, pair_freq) — one row per learned
    merge, in learning order. Deterministic for a fixed corpus.
    """
    spark = df.sparkSession
    merges, cur = _train(df, text_col, n_merges)
    cur.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq bigint"
    )


def bpe_encode_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
) -> DataFrame:
    """Train-then-APPLY: tokenize every document with the merges just
    learned from the corpus and report per-document subword token counts
    — the real-tokenizer version of token budgeting (how many tokens
    will this corpus cost?).

    Because every occurrence of a word segments identically, application
    is a broadcast join from document words to the trained vocabulary's
    final segmentation (the same word->segments table real tokenizers
    cache) — the corpus is never re-scanned per merge. Output:
    (id, n_words, n_tokens) with n_tokens = sum of per-word subword
    counts; words the trainer excluded (delimiter control chars — never
    real text) are excluded here too, identically in the oracle.
    """
    _, vocab = _train(df, text_col, n_merges)
    seg = vocab.select(
        "w",
        F.size(
            F.regexp_extract_all("seq", F.lit(TOK_PATTERN), F.lit(1))
        ).alias("n_sub"),
    )
    doc_words = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("w")
    )
    # NOTE: the vocab localCheckpoint stays alive — the returned plan
    # reads it (unpersisting before the caller's action would drop the
    # checkpointed blocks a truncated lineage cannot rebuild); Spark's
    # ContextCleaner reclaims it once the result goes out of scope.
    return (
        doc_words.join(F.broadcast(seg), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_tokens"),
        )
    )
