"""Structured Streaming extension tests (availableNow trigger + memory
sink over a temp parquet directory)."""

import tempfile
from datetime import datetime as TS

import pytest
from pyspark.sql import functions as F

from feast_ibm_spark.streaming import (
    stream_parquet_source,
    streaming_latest_per_key,
    streaming_window_counts,
)


@pytest.fixture(scope="module")
def event_dir(spark):
    d = tempfile.mkdtemp(prefix="fis_stream_")
    df = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0), 1.0),
            (1, TS(2024, 1, 1, 11, 0), 2.0),
            (2, TS(2024, 1, 1, 10, 30), 5.0),
            (2, TS(2024, 1, 1, 9, 0), 4.0),
            (3, TS(2024, 1, 1, 12, 15), 9.0),
        ],
        "user_id bigint, ts timestamp, value double",
    )
    df.write.mode("overwrite").parquet(d)
    return d, df.schema


def _run_stream(sdf, query_name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_latest_per_key(spark, event_dir):
    d, schema = event_dir
    src = stream_parquet_source(spark, d, schema)
    assert src.isStreaming
    latest = streaming_latest_per_key(src, ["user_id"], "ts", ["value"])
    _run_stream(latest, "t_latest", "complete")
    got = {r.user_id: r.value for r in spark.table("t_latest").collect()}
    assert got == {1: 2.0, 2: 5.0, 3: 9.0}


def test_streaming_window_counts(spark, event_dir):
    # NOTE: availableNow processes everything in one trigger, so the
    # watermark never advances past the data and append mode would emit
    # nothing — complete mode shows all windows (state intact).
    d, schema = event_dir
    src = stream_parquet_source(spark, d, schema)
    counts = streaming_window_counts(src, "ts", "1 hour", "2 hours")
    _run_stream(counts, "t_windows", "complete")
    got = {r.window_start: r.n_events for r in spark.table("t_windows").collect()}
    assert got == {
        TS(2024, 1, 1, 9, 0): 1,
        TS(2024, 1, 1, 10, 0): 2,
        TS(2024, 1, 1, 11, 0): 1,
        TS(2024, 1, 1, 12, 0): 1,
    }
