"""ExactSubstr (Lee et al. 2021) — substring-level dedup.

The pair view (``exact_substr_pairs``) is driver-gated with a DuckDB
oracle (queries/corpus.py ORACLE_EXACT_SUBSTR); here both views are
pinned against an in-test Python brute force on adversarial corpora, the
span view against an independent DuckDB gaps-and-islands oracle on real
testdata, and the paper's guarantee — cutting the spans removes ALL
cross-document duplication of length >= L present in the INPUT — is
asserted as a property (with the junction-artifact caveat pinned by
test_junction_artifacts_and_passes).
"""

from __future__ import annotations

import duckdb
import pytest

from feast_ibm_spark.operators.exact_substr import (
    duplicated_spans,
    exact_substr_pairs,
)

L = 8  # small anchor for readable fixtures (the registered query uses 40)


def _grams(t: str, n: int = L) -> set[str]:
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def _brute_pairs(docs: dict[int, str], n: int = L):
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(_grams(docs[a], n) & _grams(docs[b], n))
            if shared:
                out[(a, b)] = shared
    return out


def _brute_spans(docs: dict[int, str], n: int = L):
    """Maximal 1-based covered intervals per doc — positions inside some
    n-gram that also occurs in ANOTHER document."""
    gram_docs: dict[str, set[int]] = {}
    for d, t in docs.items():
        for g in _grams(t, n):
            gram_docs.setdefault(g, set()).add(d)
    spans = {}
    for d, t in docs.items():
        covered = [False] * len(t)
        for i in range(len(t) - n + 1):
            if len(gram_docs[t[i : i + n]]) >= 2:
                for j in range(i, i + n):
                    covered[j] = True
        runs, start = [], None
        for i, c in enumerate(covered + [False]):
            if c and start is None:
                start = i
            elif not c and start is not None:
                runs.append((start + 1, i - start))
                start = None
        if runs:
            spans[d] = sorted(runs)
    return spans


CORPUS = {
    # 0 and 1 share the license line; 2 is disjoint; 3 quotes 0's middle;
    # 4 is shorter than L; 5 repeats its own text only (self-repeat is
    # NOT duplication across documents)
    0: "AAAA license text here BBBB unique tail zero",
    1: "CCCC license text here DDDD other tail one",
    2: "completely different content with no overlap at all",
    3: "quoting >>text here BBBB<< inside new words",
    4: "tiny",
    5: "selfdup selfdup selfdup selfdup",
}


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], "doc_id long, text string"
    )


def _pairs_dict(df):
    return {
        (r.doc_a, r.doc_b): r.n_shared for r in df.collect()
    }


def test_pairs_match_brute_force(corpus_df):
    got = _pairs_dict(exact_substr_pairs(corpus_df, min_len=L))
    assert got == _brute_pairs(CORPUS)


def test_pairs_hashed_equals_string_keys(corpus_df):
    hashed = _pairs_dict(exact_substr_pairs(corpus_df, min_len=L))
    plain = _pairs_dict(
        exact_substr_pairs(corpus_df, min_len=L, hash_grams=False)
    )
    assert hashed == plain


def test_short_docs_never_pair(corpus_df):
    got = _pairs_dict(exact_substr_pairs(corpus_df, min_len=L))
    assert not any(4 in p for p in got)


def test_self_repeat_is_not_cross_doc_duplication(corpus_df):
    got = _pairs_dict(exact_substr_pairs(corpus_df, min_len=L))
    assert not any(5 in p for p in got)
    spans = duplicated_spans(corpus_df, min_len=L)
    assert spans.filter("doc_id = 5").count() == 0


def test_max_gram_freq_drops_flooded_grams(spark):
    boiler = "SHARED BOILERPLATE LINE IN EVERY DOC "
    docs = {i: boiler + f"unique suffix number {i} xxxx" for i in range(6)}
    docs[6] = "unique suffix number 0 xxxx trailing echo"  # pairs with 0 only
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    exact = _pairs_dict(exact_substr_pairs(df, min_len=L))
    assert exact == _brute_pairs(docs)
    # boilerplate grams occur in 6 docs; cap at 2 → only the (0, 6)
    # overlap (2-doc grams) survives the join
    capped = _pairs_dict(exact_substr_pairs(df, min_len=L, max_gram_freq=2))
    assert set(capped) == {(0, 6)}
    assert capped[(0, 6)] <= exact[(0, 6)]


def test_spans_match_brute_force(corpus_df):
    got = {}
    for r in duplicated_spans(corpus_df, min_len=L).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _brute_spans(CORPUS)


def test_spans_merge_overlap_and_adjacency(spark):
    # two shared substrings in doc 0: one pair overlapping, one disjoint
    docs = {
        0: "xx ABCDEFGHIJ yy KLMNOPQRST zz",
        1: "__ ABCDEFGHIJ __",
        2: "-- KLMNOPQRST --",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {}
    for r in duplicated_spans(df, min_len=L).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _brute_spans(docs)
    # doc 0's two duplicated regions are separated by ' yy ' → 2 islands
    assert len(got[0]) == 2


def test_cutting_spans_removes_all_duplication(spark, corpus_df):
    """The paper's guarantee: after deleting every reported span from
    every document, no two documents share ANY substring of length >= L."""
    spans = {}
    for r in duplicated_spans(corpus_df, min_len=L).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    cut = {}
    for d, t in CORPUS.items():
        keep = [True] * len(t)
        for start, ln in spans.get(d, []):
            for i in range(start - 1, start - 1 + ln):
                keep[i] = False
        cut[d] = "".join(c for c, k in zip(t, keep) if k)
    assert _brute_pairs(cut) == {}


def test_junction_artifacts_and_passes(spark):
    """Pins the PRECISE one-pass semantics of the ExactSubstr cut:

    1. every substring of length >= L duplicated in the INPUT is removed
       (the paper's guarantee);
    2. the splice at a cut point can mint a NEW duplicated L-gram — the
       junction-artifact class measured at 80/50k docs in the round-8
       flood bench — so a second span pass is NOT guaranteed empty;
    3. ``passes=2`` takes the constructed artifact out.

    Corpus construction: A = P+X+S and C share the long run X, so one
    pass cuts X from both and A splices to exactly P+S — which B already
    contained as original (pre-cut UNduplicated) content."""
    from feast_ibm_spark.operators.exact_substr import cut_duplicated_spans

    P, S, X = "pqrs", "wxyz", "01234567890123"
    docs = {0: P + X + S, 1: "uu" + P + S + "vv", 2: "mm" + X + "nn"}
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )

    pass1 = {r.doc_id: r.text for r in
             cut_duplicated_spans(df, min_len=L).collect()}
    assert pass1 == {0: P + S, 1: "uu" + P + S + "vv", 2: "mmnn"}
    # (1) every input-duplicated gram is gone from every output
    input_dup = {g for g in _grams(docs[0]) if g in _grams(docs[2])}
    assert input_dup and all(
        g not in t for g in input_dup for t in pass1.values()
    )
    # (2) the junction artifact: P+S is now duplicated between A and B
    df1 = spark.createDataFrame(
        [(k, v) for k, v in pass1.items()], "doc_id long, text string"
    )
    residual = {(r.doc_id, r.span_start, r.span_len)
                for r in duplicated_spans(df1, min_len=L).collect()}
    assert residual == {(0, 1, 8), (1, 3, 8)}
    # (3) a second pass removes it; nothing is left after
    pass2 = {r.doc_id: r.text for r in
             cut_duplicated_spans(df, min_len=L, passes=2).collect()}
    assert pass2 == {0: "", 1: "uuvv", 2: "mmnn"}
    df2 = spark.createDataFrame(
        [(k, v) for k, v in pass2.items()], "doc_id long, text string"
    )
    assert duplicated_spans(df2, min_len=L).count() == 0


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except Exception:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    @given(
        texts=st.lists(
            st.text(alphabet="ab", min_size=0, max_size=24),
            min_size=2,
            max_size=5,
        )
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_exact_substr_property_matches_brute_force(spark, texts):
        """Random two-letter corpora (dense gram collisions, heavy span
        overlap/adjacency) vs the in-test brute force, n=4: the pair
        view's (doc_a, doc_b, n_shared), the span view's merged
        intervals, and the cut as EXACT equivalence with the Python
        reference cut (delete every brute-covered position). String-
        level assertions ("no input-duplicated gram appears in any
        output") are deliberately NOT made: hypothesis found
        ['bbaa', 'bbbaabaa'], where cutting doc 1's covered span (2,4)
        splices 'b'+'baa' back into 'bbaa' — a junction can re-form the
        very string that was cut. The guarantee is about input
        OCCURRENCES, not string absence."""
        from feast_ibm_spark.operators.exact_substr import (
            cut_duplicated_spans,
        )

        n = 4
        docs = dict(enumerate(texts))
        df = spark.createDataFrame(
            [(k, v) for k, v in docs.items()], "doc_id long, text string"
        )

        got_pairs = _pairs_dict(exact_substr_pairs(df, min_len=n))
        assert got_pairs == _brute_pairs(docs, n)

        got_spans = {}
        for r in duplicated_spans(df, min_len=n).collect():
            got_spans.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_len)
            )
        got_spans = {k: sorted(v) for k, v in got_spans.items()}
        brute_spans = _brute_spans(docs, n)
        assert got_spans == brute_spans

        cut = {r.doc_id: r.text
               for r in cut_duplicated_spans(df, min_len=n).collect()}
        want = {}
        for d, t in docs.items():
            keep = [True] * len(t)
            for start, ln in brute_spans.get(d, []):
                for i in range(start - 1, start - 1 + ln):
                    keep[i] = False
            want[d] = "".join(c for c, k in zip(t, keep) if k)
        assert cut == want


@pytest.mark.sweep
def test_spans_match_duckdb_oracle_on_testdata(spark, sf_dir):
    """Span tier vs an independent DuckDB gaps-and-islands oracle on the
    real documents table — the 100 TB-default tier gets the same
    engine-vs-engine pin the gated pair view has."""
    n = 40
    got = duplicated_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), min_len=n
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(f"""
        WITH offs AS (
          SELECT doc_id, CAST(i AS BIGINT) AS off,
                 substr(text, CAST(i AS INTEGER), {n}) AS gram
          FROM documents,
               UNNEST(range(1, CAST(length(text) AS BIGINT) - {n - 2})) t(i)
          WHERE length(text) >= {n}
        ),
        dup AS (
          SELECT gram FROM offs GROUP BY gram
          HAVING min(doc_id) <> max(doc_id)
        ),
        cov AS (SELECT doc_id, off FROM offs WHERE gram IN (SELECT gram FROM dup)),
        isl AS (
          SELECT doc_id, off,
                 CASE WHEN off > coalesce(max(off + {n - 1}) OVER (
                        PARTITION BY doc_id ORDER BY off
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      -1) + 1
                      THEN 1 ELSE 0 END AS new_isl
          FROM cov
        ),
        grp AS (
          SELECT doc_id, off,
                 sum(new_isl) OVER (PARTITION BY doc_id ORDER BY off) AS island
          FROM isl
        )
        SELECT doc_id, min(off) AS span_start,
               max(off) + {n - 1} - min(off) + 1 AS span_len
        FROM grp GROUP BY doc_id, island
    """).fetchdf()
    key = ["doc_id", "span_start", "span_len"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].astype("int64").sort_values(key).reset_index(drop=True)
    assert got.astype("int64").equals(want)
    assert len(got) > 0  # testdata carries injected near-duplicates

def test_cut_operator_matches_python_cut(spark, corpus_df):
    """cut_duplicated_spans (the Catalyst aggregate rebuild) must equal
    the straight Python cut of the reported spans, preserve other
    columns / untouched docs, and — on THIS corpus, which has no
    junction coincidences — leave an output on which the span pass
    finds nothing. (That last property is corpus-specific, not an
    operator guarantee: see test_junction_artifacts_and_passes.)"""
    from feast_ibm_spark.operators.exact_substr import cut_duplicated_spans

    spans = {}
    for r in duplicated_spans(corpus_df, min_len=L).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    want = {}
    for d, t in CORPUS.items():
        keep = [True] * len(t)
        for start, ln in spans.get(d, []):
            for i in range(start - 1, start - 1 + ln):
                keep[i] = False
        want[d] = "".join(c for c, k in zip(t, keep) if k)

    out = cut_duplicated_spans(corpus_df, min_len=L)
    got = {r.doc_id: r.text for r in out.collect()}
    assert got == want
    assert duplicated_spans(out, min_len=L).count() == 0
    # out_col variant keeps the original text column intact
    both = cut_duplicated_spans(corpus_df, min_len=L, out_col="clean")
    r0 = both.filter("doc_id = 0").first()
    assert r0.text == CORPUS[0] and r0.clean == want[0]


def test_chunked_gram_stream_is_bit_identical(spark, corpus_df):
    """The round-9 chunked gram generation (whale-document memory
    bound) must be invisible: spans with a chunk width straddling every
    boundary case — smaller than min_len, equal, off-by-one around doc
    lengths — equal the effectively-unchunked form on the same corpus."""
    baseline = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicated_spans(
            corpus_df, min_len=L, chunk_chars=1_000_000
        ).collect()
    }
    assert baseline  # corpus carries duplicated spans
    for chunk in (1, 2, L - 1, L, L + 1, 7, 64):
        got = {
            (r.doc_id, r.span_start, r.span_len)
            for r in duplicated_spans(
                corpus_df, min_len=L, chunk_chars=chunk
            ).collect()
        }
        assert got == baseline, f"chunk_chars={chunk} diverged"
    with pytest.raises(ValueError):
        duplicated_spans(corpus_df, min_len=L, chunk_chars=0)


def test_mixed_ascii_nonascii_grams_share_keys(spark):
    """The round-12 tiered gram path (ASCII rows slice UTF-8 bytes,
    non-ASCII rows slice the codepoint array) must emit IDENTICAL keys
    for identical gram text across tiers: a duplicate shared between an
    ASCII document and a non-ASCII document still meets on its gram —
    and non-ASCII offsets stay CHARACTER offsets (the é is one position,
    not two bytes). Pinned against the same Python brute force, with a
    chunk width straddling the shared run so chunk rebasing is covered
    on the non-ASCII tier too."""
    docs = {
        0: "prefix zero SHARED DUPLICATE RUN tail zero",
        1: "héllo wörld 日本 SHARED DUPLICATE RUN tail øne",
        2: "totally unrelated ascii content here",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    assert _pairs_dict(exact_substr_pairs(df, min_len=L)) == _brute_pairs(docs)
    want = _brute_spans(docs)
    for chunk in (7, 1_000_000):
        got: dict[int, list] = {}
        for r in duplicated_spans(df, min_len=L, chunk_chars=chunk).collect():
            got.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
        assert {d: sorted(v) for d, v in got.items()} == want, (
            f"chunk_chars={chunk} diverged"
        )
    # unhashed tier must agree as well (string grams, not hashes)
    plain = _pairs_dict(exact_substr_pairs(df, min_len=L, hash_grams=False))
    assert plain == _brute_pairs(docs)


def test_cut_tiers_are_equivalent(spark, corpus_df):
    """The long-doc distributed rebuild (round 9) must be invisible:
    forcing EVERY doc through it (inrow_max_chars=0) with chunk widths
    straddling the boundary cases equals the in-row aggregate tier on
    the same corpus, including preserved non-text columns and the
    multi-pass path."""
    from feast_ibm_spark.operators.exact_substr import cut_duplicated_spans

    want = {
        r.doc_id: r.text
        for r in cut_duplicated_spans(corpus_df, min_len=L).collect()
    }
    for chunk in (1, L - 1, L, 7, 64, 100_000):
        got = {
            r.doc_id: r.text
            for r in cut_duplicated_spans(
                corpus_df, min_len=L,
                inrow_max_chars=0, chunk_chars=chunk,
            ).collect()
        }
        assert got == want, f"chunk_chars={chunk} diverged"
    # multi-pass through the long tier
    want2 = {
        r.doc_id: r.text
        for r in cut_duplicated_spans(corpus_df, min_len=L, passes=2).collect()
    }
    got2 = {
        r.doc_id: r.text
        for r in cut_duplicated_spans(
            corpus_df, min_len=L, passes=2,
            inrow_max_chars=0, chunk_chars=13,
        ).collect()
    }
    assert got2 == want2


def test_fair_share_guard_decision_boundary():
    """VERDICT r9 item 4: the pure guard decision at the measured edge.
    250 MB/task (32 MB-whale-proven) -> no action; 93 MB/task (the
    measured 16 MB-whale OOM config: 3 GB heap, 32 slots) -> pin to
    pool // 250 MB partitions."""
    from feast_ibm_spark.operators.exact_substr import (
        _FAIR_SHARE_EDGE_BYTES,
        _parse_jvm_mem,
        _whale_safe_partitions,
    )

    edge = _FAIR_SHARE_EDGE_BYTES
    assert _whale_safe_partitions(32 * edge, 32) is None          # at edge
    assert _whale_safe_partitions(32 * edge + 1, 32) is None      # above
    assert _whale_safe_partitions(32 * edge - 1, 32) == 31        # below
    # the measured OOM config: (3g - 300m) * 0.6 pool over 32 slots
    pool = ((3 << 30) - (300 << 20)) * 0.6
    assert pool / 32 < edge
    assert _whale_safe_partitions(pool, 32) == int(pool // edge) == 6
    # degenerate sessions never divide by zero / go below 1 partition
    assert _whale_safe_partitions(None, 32) is None
    assert _whale_safe_partitions(pool, None) is None
    assert _whale_safe_partitions(0, 32) is None
    assert _whale_safe_partitions(edge - 1, 1) == 1

    assert _parse_jvm_mem("3g") == 3 << 30
    assert _parse_jvm_mem("512m") == 512 << 20
    assert _parse_jvm_mem("2048k") == 2048 << 10
    assert _parse_jvm_mem("1048576") == 1 << 20


def test_fair_share_guard_fires_loudly_and_preserves_results(
    spark, corpus_df, monkeypatch
):
    """When the share is below the edge the operator must (a) warn, (b)
    pin its shuffles to the safe partition count, and (c) return the
    identical spans. Forced by raising the edge above this session's
    real share; the normal-session path must stay warning-free and
    repartition-free (no plan change above the edge)."""
    import warnings

    from feast_ibm_spark.operators import exact_substr as es

    want = {(r.doc_id, r.span_start, r.span_len)
            for r in duplicated_spans(corpus_df, min_len=L).collect()}

    pool, slots = es._session_pool_and_slots(spark)
    assert pool and slots  # introspection works on a local session
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # normal session: no warning
        plan_normal = duplicated_spans(corpus_df, min_len=L)
    n_base = (plan_normal._jdf.queryExecution().analyzed().toString()
              .lower().count("repartitionbyexpression"))

    monkeypatch.setattr(es, "_FAIR_SHARE_EDGE_BYTES", int(pool) * 2)
    with pytest.warns(UserWarning, match="fair share"):
        guarded = es.duplicated_spans(corpus_df, min_len=L)
    n_safe = es._whale_safe_partitions(pool, slots)
    assert n_safe == 1  # edge of 2*pool -> pool//edge == 0 -> clamped
    plan = guarded._jdf.queryExecution().analyzed().toString()
    # TWO pinned shuffles added — the gram window + the interval-merge
    # window (round 12: the duplicate-gram test is a whole-partition
    # window over ONE gram pass, so the gram subplan — and its pinned
    # repartition — appears exactly once in the tree)
    assert plan.lower().count("repartitionbyexpression") == n_base + 2
    assert "RepartitionByExpression [gram" in plan
    assert f"RepartitionByExpression [{corpus_df.columns[0]}" in plan
    got = {(r.doc_id, r.span_start, r.span_len) for r in guarded.collect()}
    assert got == want


def test_session_pool_and_slots_cluster_mode_uses_executor_cores():
    """ADVICE r10: in cluster mode the pool is PER EXECUTOR, so slots
    must be per-executor too — spark.executor.cores / spark.task.cpus,
    never defaultParallelism (the CLUSTER-TOTAL core count, which would
    understate the fair share by the executor count and fire the guard
    spuriously on healthy clusters). Unknown topology -> (None, None):
    the guard must not guess."""
    from feast_ibm_spark.operators import exact_substr as es

    class FakeConf:
        def __init__(self, d):
            self._d = d

        def get(self, k, default=None):
            return self._d.get(k, default)

    class FakeSC:
        def __init__(self, conf, master):
            self._conf, self.master = conf, master
            self.defaultParallelism = 640  # cluster-total: must be unused

        def getConf(self):
            return self._conf

    class FakeSpark:
        def __init__(self, conf_dict, master="spark://m:7077"):
            self.sparkContext = FakeSC(FakeConf(conf_dict), master)

    pool, slots = es._session_pool_and_slots(
        FakeSpark({"spark.executor.memory": "8g",
                   "spark.executor.cores": "4"})
    )
    assert slots == 4  # per-executor, not defaultParallelism=640
    assert pool == ((8 << 30) - (300 << 20)) * 0.6

    # task.cpus divides the slot count
    _, slots = es._session_pool_and_slots(
        FakeSpark({"spark.executor.memory": "8g",
                   "spark.executor.cores": "8",
                   "spark.task.cpus": "2"})
    )
    assert slots == 4

    # unknown executor.cores in cluster mode: refuse to guess
    assert es._session_pool_and_slots(
        FakeSpark({"spark.executor.memory": "8g"})
    ) == (None, None)
