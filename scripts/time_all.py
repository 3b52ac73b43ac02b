#!/usr/bin/env python
"""One timed pass over the FULL query registry (count() materialization,
cache cleared per query) — the outlier detector behind the round-12
"optimize every operator" checklist. Not a bench: single run, relative
readings only.

Usage: python scripts/time_all.py [sf_dir]; prints one line per query.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from feast_ibm_spark.queries import QUERIES
    from feast_ibm_spark.session import get_spark
    from feast_ibm_spark.sources.reader import load_table

    spark = get_spark(app_name="time-all")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "lineitem", "orders", "customer", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(s):
        import zlib

        import numpy as _np

        return _pd.Series(_np.asarray(s, dtype=_np.int64) + zlib.crc32(b"warm") % 2)

    par = spark.sparkContext.defaultParallelism
    for _ in range(2):
        spark.range(par * 100_000, numPartitions=par).select(_warm("id")).count()

    out = []
    for name in sorted(QUERIES):
        qd = QUERIES[name]
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            n = qd.fn(spark, sf_dir).count()
            dt = time.time() - t0
            out.append((dt, name, n))
            print(f"{dt:8.2f}s  {name} ({n} rows)", flush=True)
        except Exception as e:
            print(f"   ERR    {name}: {type(e).__name__}: {e}", flush=True)
    out.sort(reverse=True)
    print("\n=== slowest 25 ===")
    for dt, name, n in out[:25]:
        print(f"{dt:8.2f}s  {name}")
    print(f"TOTAL {sum(d for d, _, _ in out):.1f}s over {len(out)} queries")


if __name__ == "__main__":
    main()
