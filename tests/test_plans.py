"""Physical-plan shape assertions — the 100 TB contract, unit-tested.

For each operator we assert the plan property that matters at scale:
filters reach the parquet scan (PushedFilters), projections prune the
read schema (ReadSchema), small dimensions broadcast, and the PIT join
avoids a cartesian explosion."""

import pytest
from pyspark.sql import functions as F

from feast_ibm_spark.operators import FeatureViewSpec, point_in_time_join, time_range_scan
from feast_ibm_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)
from feast_ibm_spark.sources.reader import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_time_range_filter_is_pushed_down(spark, events):
    out = time_range_scan(
        events, ["user_id"], ["value"], "ts",
        "2024-01-05 00:00:00", "2024-01-06 00:00:00",
    )
    text = explain_str(out)
    cols_per_scan = scan_columns(out)
    assert cols_per_scan, "no scan found in plan"
    for cols in cols_per_scan:
        assert "event_type" not in cols and "props" not in cols, (
            "projection pruning failed: " + text
        )
    # the range predicate must be rewritten into raw-nanos space and
    # pushed to the parquet scan (row-group pruning at 100 TB)
    fs = pushed_filters(out)
    assert any("GreaterThanOrEqual(ts" in f for f in fs), fs
    assert any("LessThanOrEqual(ts" in f for f in fs), fs


def test_plain_parquet_filter_pushdown(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    out = part.filter(F.col("p_size") >= 25).select("p_partkey", "p_size")
    fs = pushed_filters(out)
    assert any("p_size" in f for f in fs), fs
    cols = scan_columns(out)[0]
    assert set(cols) == {"p_partkey", "p_size"}


def test_pit_join_broadcast_strategy_broadcasts(spark, events):
    spine = events.groupBy("user_id").agg(F.max("ts").alias("event_timestamp"))
    view = FeatureViewSpec(
        "v", events, ["user_id"], ["value"], "ts", ttl_seconds=86400
    )
    out = point_in_time_join(spine, [view], strategy="broadcast")
    assert has_broadcast_join(out)
    text = explain_str(out)
    assert "CartesianProduct" not in text


def test_pit_union_window_has_no_join_blowup(spark, events):
    spine = events.groupBy("user_id").agg(F.max("ts").alias("event_timestamp"))
    view = FeatureViewSpec(
        "v", events, ["user_id"], ["value"], "ts", ttl_seconds=86400
    )
    out = point_in_time_join(spine, [view], strategy="union_window")
    text = explain_str(out)
    # the as-of matching itself is a window over a union - no range join
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert "Window" in text


def test_latest_per_key_single_shuffle(spark, events):
    from feast_ibm_spark.operators import latest_per_key
    from feast_ibm_spark.plans.inspect import count_shuffles

    out = latest_per_key(
        events, ["user_id"], ["value"], "ts", None,
        "2024-01-01 00:00:00", "2024-01-31 00:00:00",
    )
    # one shuffle for the window partitioning - no group-max self-join
    assert count_shuffles(out) == 1, explain_str(out)


def test_sessionize_single_shuffle(spark, events):
    from feast_ibm_spark.operators.sessionize import sessionize
    from feast_ibm_spark.plans.inspect import count_shuffles

    out = sessionize(events, ["user_id"], "ts", 7200, tiebreak_cols=["event_id"])
    # lag window, running-sum window and the final groupBy all reuse ONE
    # exchange on user_id
    assert count_shuffles(out) == 1, explain_str(out)


def test_broadcast_hint_survives_in_star_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
    assert has_broadcast_join(j)
