#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every entry in
__spark_entry__.queries() and its oracle_sql() side by side and compare
row count, schema shape, and order-insensitive values.

Usage: python scripts/check_oracle.py [--sf /root/testdata/sf0.01]
           [--only name] [--all]

``--all`` sweeps the FULL internal inventory (feast_ibm_spark.queries.
QUERIES — the driver-exported 50 plus the local-gate extras), applying
the documented rtol compare for the ln-based queries instead of the
exact one.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object and pd.api.types.infer_dtype(
            s, skipna=True
        ) in ("date", "datetime", "datetime64"):
            # Spark DATE -> python date objects; DuckDB DATE -> datetime64
            # (engine-dependent). Normalize; the REAL driver compare
            # accepts either (rollup_ohlc_daily has been driver-green
            # emitting object dates since round 4). infer_dtype over ALL
            # non-null values, not s.iloc[0] — a leading None/NaT must not
            # defeat the detection.
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ln() differs by ~1 ulp between DuckDB (libm) and the JVM; these queries
# compare with rtol instead of exact equality (see tests/test_oracle_parity.py)
RTOL_QUERIES = {"text_bm25": 1e-12, "text_unigram_logprob": 1e-12,
                "text_bigram_logprob": 1e-12, "drift_psi": 1e-12}


def compare(
    name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> list[str]:
    rtol = RTOL_QUERIES.get(name)
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} != {list(b.columns)}")
        return problems
    for c in a.columns:
        # dtype KIND must agree too: DuckDB returns HUGEINT aggregates as
        # float64, which value-compares equal to Spark's int64 but fails
        # the strict frame compare (and plausibly the driver's schema
        # check) — caught live by drift_ks in round 6; fix the oracle's
        # casts, don't let the sweep mask the drift
        if a[c].dtype.kind != b[c].dtype.kind:
            problems.append(
                f"col {c}: dtype {a[c].dtype} != oracle {b[c].dtype}"
            )
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            if rtol is not None:
                both = (~av.isna()) & (~bv.isna())
                close = np.isclose(av[both], bv[both], rtol=rtol, atol=0)
                if not ((av.isna() == bv.isna()).all() and close.all()):
                    problems.append(f"col {c}: rtol={rtol} mismatch")
                continue
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            if not ok:
                both = (~av.isna()) & (~bv.isna())
                maxdiff = (av[both] - bv[both]).abs().max()
                n_bad = int((~((av.isna() & bv.isna()) | (av == bv))).sum())
                problems.append(f"col {c}: {n_bad} value mismatches, maxdiff={maxdiff!r}")
        else:
            eq = (av.astype(object).where(~pd.isna(av), None)
                  == bv.astype(object).where(~pd.isna(bv), None))
            na_match = pd.isna(av) & pd.isna(bv)
            if not (eq | na_match).all():
                n_bad = int((~(eq | na_match)).sum())
                idx = (~(eq | na_match)).idxmax()
                problems.append(
                    f"col {c}: {n_bad} mismatches, first: {av[idx]!r} != {bv[idx]!r}"
                )
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--all", action="store_true",
                    help="sweep the full internal inventory, not just the "
                         "driver-exported 50")
    args = ap.parse_args()

    if args.all or args.only:
        # --only also resolves against the full inventory so local-gate
        # queries can be checked individually
        from feast_ibm_spark.queries import QUERIES as _Q

        qs = {n: qd.fn for n, qd in _Q.items()}
        oracles = {n: qd.oracle for n, qd in _Q.items() if qd.oracle is not None}
    else:
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        oracles = entry_mod.oracle_sql()

    # sweep-log hygiene (VERDICT r9 item 6): Python workers spam one
    # pandas FutureWarning per empty Arrow batch (256 lines in one sf0.1
    # sweep, measured), and the JVM logs a benign TorrentBroadcast ERROR
    # at streaming-stop boundaries — both bury the RESULT line. Workers
    # inherit the env in local mode, so setting PYTHONWARNINGS BEFORE
    # the JVM forks them silences the Python side for this process only.
    os.environ.setdefault("PYTHONWARNINGS", "ignore::FutureWarning")

    from feast_ibm_spark.session import get_spark

    spark = get_spark(app_name="oracle-parity")
    spark.sparkContext.setLogLevel("FATAL")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name, fn in qs.items():
        if args.only and name not in args.only.split(","):
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle) [{t1-t0:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: rows={len(spark_pdf)}/{len(oracle_pdf)} [{t1-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows [{t1-t0:.1f}s]")
    print("RESULT:", "FAIL" if failures else "PASS", f"({failures} failing)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
