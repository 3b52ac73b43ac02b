"""Session catalog helpers: expose engine sources to raw Spark SQL.

The reference's users could point SQL at any Data Engine table; the
in-process equivalent is registering each source DataFrame as a temp view
(nanos-timestamp normalization from ``reader.py`` already applied), after
which the full Spark SQL surface — joins, windows, CTEs — works against
the same data the DataFrame operators see:

    register_tables(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT user_id, count(*) FROM events GROUP BY user_id")

Temp views are metadata-only (no copy, no materialization); Catalyst
plans through them exactly as through the DataFrames themselves.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .reader import read_parquet

DEFAULT_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | None = None,
) -> list[str]:
    """Register each ``{sf_dir}/{name}.parquet`` as a temp view ``name``.

    Returns the list of views actually registered (missing files are
    skipped, so partial layouts work)."""
    registered = []
    for name in tables or DEFAULT_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        read_parquet(spark, path).createOrReplaceTempView(name)
        registered.append(name)
    return registered
