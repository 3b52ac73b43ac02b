#!/usr/bin/env python
"""Per-query isolation profiler for r12: noop-sink timing + formatted plans.

Usage: python /tmp/prof_r12.py q1 q2 ...   (or no args = full bench list)
Env: SPARK_GRAFT_SF_DIR (default sf0.1), PROF_RUNS (default 3),
     PROF_PLAN_DIR (default /tmp/plans_r12)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROF_RUNS", "3"))
PLAN_DIR = os.environ.get("PROF_PLAN_DIR", "/tmp/plans_r12")


def main() -> None:
    from feast_ibm_spark.queries import QUERIES
    from feast_ibm_spark.session import get_spark

    import bench as benchmod

    names = sys.argv[1:] or benchmod.BENCH_QUERIES
    spark = get_spark(app_name="r12-prof")
    spark.sparkContext.setLogLevel("ERROR")

    from feast_ibm_spark.sources.reader import load_table

    for t in ("events", "lineitem", "orders", "customer", "documents", "embeddings"):
        try:
            load_table(spark, SF_DIR, t).count()
        except Exception:
            pass

    # warm Arrow python workers (same as bench)
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

    os.makedirs(PLAN_DIR, exist_ok=True)
    out = {}
    for name in names:
        qd = QUERIES[name]
        spark.sparkContext.setJobDescription(f"prof:{name}")
        runs = []
        for i in range(RUNS):
            if name in benchmod._PRE_RUN:
                benchmod._PRE_RUN[name](SF_DIR)
            spark.catalog.clearCache()  # same discipline as bench.py
            t0 = time.time()
            df = qd.fn(spark, SF_DIR)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            runs.append((round(time.time() - t0, 3), round(t_build, 3)))
        # plan dump from a fresh build
        try:
            plan = qd.fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                qd.fn(spark, SF_DIR)._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                qd.fn(spark, SF_DIR).explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(PLAN_DIR, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        tot = sorted(r[0] for r in runs)
        build = sorted(r[1] for r in runs)
        nexch = plan.count("Exchange")
        out[name] = {
            "noop_median": tot[len(tot) // 2],
            "noop_runs": [r[0] for r in runs],
            "build_median": build[len(build) // 2],
            "exchanges": nexch,
        }
        print(
            f"# {name}: noop median {tot[len(tot)//2]}s runs={[r[0] for r in runs]} "
            f"build {build[len(build)//2]}s exch~{nexch}",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
