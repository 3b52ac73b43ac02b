"""Unit + randomized property tests for the generic as-of join
(operators/asof.py) and the bucketed range join (operators/interval.py)."""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feast_ibm_spark.operators.asof import asof_join  # noqa: E402
from feast_ibm_spark.operators.interval import range_join  # noqa: E402

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _brute_asof(left_rows, right_rows, direction, tol_s):
    """Reference implementation of the documented semantics, per left row."""
    out = {}
    for key, lts in left_rows:
        cands = []
        for rkey, rts, rid, val in right_rows:
            if rkey != key:
                continue
            d = (rts - lts).total_seconds()
            if direction == "backward":
                ok = d <= 0 and (not tol_s or d >= -tol_s)
            elif direction == "forward":
                ok = d >= 0 and (not tol_s or d <= tol_s)
            else:
                ok = abs(d) <= tol_s
            if ok:
                cands.append((d, rts, rid, val))
        if not cands:
            out[(key, lts)] = None
            continue
        if direction == "backward":
            cands.sort(key=lambda c: (c[1], c[2]), reverse=True)  # latest, id desc
        elif direction == "forward":
            cands.sort(key=lambda c: (c[1], -c[2]))  # earliest, id desc
        else:  # nearest: min |d|, then earlier ts, then id desc
            cands.sort(key=lambda c: (abs(c[0]), c[1], -c[2]))
        out[(key, lts)] = cands[0][3]
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_brute_force_randomized(spark, direction):
    rng = random.Random(f"asof-{direction}")
    for trial in range(3):
        keys = ["a", "b", "c"]
        right_rows = [
            (rng.choice(keys), _ts(rng.randrange(0, 2000)), i,
             float(rng.randrange(1000)))
            for i in range(120)
        ]
        left_rows = [
            (rng.choice(keys + ["never-matches"]), _ts(rng.randrange(0, 2000)))
            for _ in range(60)
        ]
        tol = 180 * 60  # 3 hours
        left = spark.createDataFrame(left_rows, "k string, lts timestamp")
        right = spark.createDataFrame(
            right_rows, "k string, rts timestamp, rid long, val double"
        )
        got = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_columns=["val"], direction=direction,
            tolerance_seconds=tol, tiebreak="rid",
        ).collect()
        expect = _brute_asof(left_rows, right_rows, direction, tol)
        # duplicated (k, lts) left rows each get the winner; compare per row
        assert len(got) == len(left_rows)
        for row in got:
            assert expect[(row["k"], row["lts"])] == row["val"], (
                direction, trial, row)


def test_asof_no_tolerance_unbounded(spark):
    left = spark.createDataFrame([("a", _ts(100))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(1), 1, 1.0), ("a", _ts(99), 2, 2.0), ("a", _ts(150), 3, 3.0)],
        "k string, rts timestamp, rid long, val double",
    )
    back = asof_join(left, right, ["k"], "lts", "rts", ["val"],
                     direction="backward").collect()
    assert back[0]["val"] == 2.0
    fwd = asof_join(left, right, ["k"], "lts", "rts", ["val"],
                    direction="forward").collect()
    assert fwd[0]["val"] == 3.0


def test_asof_keyless_and_exact_tie(spark):
    # keyless (global timeline) + an exact equal-distance tie for nearest:
    # matches at -60s and +60s -> earlier row wins by the documented rule
    left = spark.createDataFrame([(_ts(10),)], "lts timestamp")
    right = spark.createDataFrame(
        [(_ts(9), 1, 10.0), (_ts(11), 2, 20.0)],
        "rts timestamp, rid long, val double",
    )
    got = asof_join(left, right, [], "lts", "rts", ["val"],
                    direction="nearest", tolerance_seconds=3600,
                    tiebreak="rid").collect()
    assert got[0]["val"] == 10.0


def test_asof_nearest_requires_tolerance(spark):
    left = spark.createDataFrame([(_ts(0),)], "lts timestamp")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, left, [], "lts", "lts", [], direction="nearest")


def _brute_range(points, ivals):
    return sorted(
        (p, s, e) for p in points for (s, e) in ivals if s <= p <= e
    )


def test_range_join_matches_brute_force(spark):
    rng = random.Random("range-join")
    for bucket in (1, 3, 10, 1000):
        points = [rng.randrange(-50, 150) for _ in range(80)]
        ivals = [
            (s, s + rng.randrange(0, 25))
            for s in (rng.randrange(-60, 140) for _ in range(40))
        ]
        p_df = spark.createDataFrame([(p,) for p in points], "p long")
        i_df = spark.createDataFrame(ivals, "s long, e long")
        got = sorted(
            (r["p"], r["s"], r["e"])
            for r in range_join(p_df, i_df, "p", "s", "e", bucket=bucket).collect()
        )
        assert got == _brute_range(points, ivals), f"bucket={bucket}"


def test_range_join_left_keeps_unmatched_points_once(spark):
    p_df = spark.createDataFrame([(5,), (100,)], "p long")
    # interval spans many buckets at bucket=2 -> explode must not
    # duplicate the contained point, and the unmatched point survives once
    i_df = spark.createDataFrame([(0, 20)], "s long, e long")
    rows = range_join(p_df, i_df, "p", "s", "e", bucket=2, how="left").collect()
    assert sorted((r["p"], r["s"]) for r in rows) == [(5, 0), (100, None)]


def test_range_join_with_keys(spark):
    p_df = spark.createDataFrame([("x", 5), ("y", 5)], "k string, p long")
    i_df = spark.createDataFrame([("x", 0, 10)], "k string, s long, e long")
    rows = range_join(p_df, i_df, "p", "s", "e", bucket=4, on=["k"]).collect()
    assert [(r["k"], r["p"]) for r in rows] == [("x", 5)]


def test_range_join_plans_hash_join_not_bnlj(spark):
    """The whole point of the bucketing: the join must be a broadcast/
    shuffled HASH join on the bucket key, never BroadcastNestedLoopJoin."""
    p_df = spark.range(1000).selectExpr("id AS p")
    i_df = spark.range(100).selectExpr("id * 7 AS s", "id * 7 + 9 AS e")
    plan = range_join(
        p_df, i_df, "p", "s", "e", bucket=8, broadcast_intervals=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan


def test_asof_and_sessionize_ntz_zone_free(spark):
    """Round-7 review hardening: asof nearest-distance and sessionize
    gap math use INTERVAL subtraction, so NTZ inputs behave identically
    under UTC and a DST session zone (unix_micros would route NTZ
    through the session zone — off by the DST shift around
    2024-03-10 02:00 America/New_York)."""
    from pyspark.sql import functions as F

    from feast_ibm_spark.operators.asof import asof_join
    from feast_ibm_spark.operators.sessionize import sessionize

    left = spark.createDataFrame(
        [(1, "2024-03-10 02:40:00")], "k bigint, s string"
    ).select("k", F.to_timestamp_ntz("s").alias("lts"))
    right = spark.createDataFrame(
        [(1, "2024-03-10 01:50:00", "before"),
         (1, "2024-03-10 03:20:00", "after")],
        "k bigint, s string, tag string",
    ).select("k", F.to_timestamp_ntz("s").alias("rts"), "tag")
    ev = spark.createDataFrame(
        [(1, i, f"2024-03-10 0{h}:{m:02d}:00") for i, (h, m) in enumerate(
            [(1, 30), (2, 10), (2, 50), (3, 25)]  # consecutive gaps 40/40/35min
        )],
        "k bigint, eid bigint, s string",
    ).select("k", "eid", F.to_timestamp_ntz("s").alias("ts"))

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    got = {}
    try:
        for tz in ("Etc/UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            a = asof_join(left, right, on=["k"], left_ts="lts",
                          right_ts="rts", right_columns=["tag"],
                          direction="nearest",
                          tolerance_seconds=6 * 3600).collect()
            s = sessionize(ev, ["k"], "ts", gap_seconds=2700,
                           tiebreak_cols=["eid"]).collect()
            got[tz] = (
                [(r.k, r.tag) for r in a],
                sorted((r.session_id, r.n_events) for r in s),
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    # wall-clock distances: before = 50min, after = 40min -> "after";
    # all wall gaps <= 45min -> ONE session of 4 events
    assert got["Etc/UTC"] == got["America/New_York"]
    assert got["Etc/UTC"][0] == [(1, "after")]
    assert got["Etc/UTC"][1] == [(1, 4)]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_backward_forward_ntz_zone_free(spark, direction):
    """VERDICT r7 item 8: extend the DST-gap session-zone net to the
    remaining asof directions (the round-7 test covered nearest only).
    backward/forward on NTZ are pure wall-clock <=/>= comparisons plus
    interval tolerance — results must be identical under UTC and a DST
    zone with data straddling the 2024-03-10 spring-forward gap."""
    from pyspark.sql import functions as F

    from feast_ibm_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-03-10 01:55:00"), (1, "2024-03-10 02:40:00"),
         (1, "2024-03-10 03:10:00")],
        "k bigint, s string",
    ).select("k", F.to_timestamp_ntz("s").alias("lts"))
    right = spark.createDataFrame(
        [(1, "2024-03-10 01:50:00", "a"), (1, "2024-03-10 02:30:00", "b"),
         (1, "2024-03-10 03:05:00", "c"), (1, "2024-03-10 03:30:00", "d")],
        "k bigint, s string, tag string",
    ).select("k", F.to_timestamp_ntz("s").alias("rts"), "tag")

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    got = {}
    try:
        for tz in ("Etc/UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got[tz] = sorted(
                (str(r.lts), r.tag)
                for r in asof_join(
                    left, right, on=["k"], left_ts="lts", right_ts="rts",
                    right_columns=["tag"], direction=direction,
                    tolerance_seconds=3600,
                ).collect()
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert got["Etc/UTC"] == got["America/New_York"]
    want = {
        # wall-clock asof: 01:55->01:50(a), 02:40->02:30(b), 03:10->03:05(c)
        "backward": [("2024-03-10 01:55:00", "a"),
                     ("2024-03-10 02:40:00", "b"),
                     ("2024-03-10 03:10:00", "c")],
        # forward: 01:55->02:30(b), 02:40->03:05(c), 03:10->03:30(d)
        "forward": [("2024-03-10 01:55:00", "b"),
                    ("2024-03-10 02:40:00", "c"),
                    ("2024-03-10 03:10:00", "d")],
    }[direction]
    assert got["Etc/UTC"] == want


def test_resample_ntz_zone_free_across_dst_gap(spark):
    """VERDICT r7 item 8 + the bug it caught: NTZ resampling under a DST
    session zone used to collapse the 02:00-03:00 grid hour (string
    bounds cast through the session zone, the NTZ observations coerced
    by the union) and misfile carried/interpolated values. Both
    resamplers must now produce the identical zone-free wall-clock grid
    under UTC and America/New_York, interpolation weights included."""
    from pyspark.sql import functions as F

    from feast_ibm_spark.operators.resample import (
        resample_interpolate,
        resample_locf,
    )

    ev = spark.createDataFrame(
        [(1, "2024-03-10 01:30:00", 100), (1, "2024-03-10 02:30:00", 200),
         (1, "2024-03-10 03:30:00", 300)],
        "k bigint, s string, v bigint",
    ).select("k", F.to_timestamp_ntz("s").alias("ts"), "v")

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    got = {}
    try:
        for tz in ("Etc/UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            locf = sorted(
                (str(r.grid_ts), r.v)
                for r in resample_locf(
                    ev, ["k"], "ts", ["v"], "2024-03-10 01:00:00",
                    "2024-03-10 04:00:00", 1800,
                ).collect()
            )
            interp = sorted(
                (str(r.grid_ts), r.v)
                for r in resample_interpolate(
                    ev, ["k"], "ts", "v", "2024-03-10 01:00:00",
                    "2024-03-10 04:00:00", 1800,
                ).collect()
            )
            got[tz] = (locf, interp)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert got["Etc/UTC"] == got["America/New_York"]
    locf, interp = got["Etc/UTC"]
    assert len(locf) == 7  # full 7-point grid — no hour swallowed
    assert ("2024-03-10 02:00:00", 100) in locf
    assert ("2024-03-10 02:00:00", 150) in interp  # exact midpoint weight
    assert ("2024-03-10 03:00:00", 250) in interp


# --- hypothesis property net for the resamplers (the round-7/8 NTZ bug
# class lived here; random observation sets vs a Python reference of the
# documented semantics) ------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except Exception:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    _GRID_HOURS = 11  # "2024-01-01 00:00" .. "10:00" hourly inclusive

    def _brute_resample(obs):
        """Reference LOCF + interpolation of the documented semantics.
        obs: {(key, minute_offset): value} with unique (key, ts)."""
        grid = [T0 + dt.timedelta(hours=h) for h in range(_GRID_HOURS)]
        keys = sorted({k for k, _ in obs})
        by_key = {
            k: sorted(
                (T0 + dt.timedelta(minutes=m), v)
                for (kk, m), v in obs.items() if kk == k
            )
            for k in keys
        }
        locf, interp = {}, {}
        for k in keys:
            rows = by_key[k]
            for g in grid:
                before = [(t, v) for t, v in rows if t <= g]
                after = [(t, v) for t, v in rows if t >= g]
                locf[(k, g)] = before[-1][1] if before else None
                if not before or not after:
                    interp[(k, g)] = None
                    continue
                t0, v0 = before[-1]
                t1, v1 = after[0]
                if t0 == t1:
                    interp[(k, g)] = v0
                    continue
                num_t = int((g - t0).total_seconds() * 1_000_000)
                den = int((t1 - t0).total_seconds() * 1_000_000)
                if v1 >= v0:
                    interp[(k, g)] = v0 + ((v1 - v0) * num_t) // den
                else:
                    interp[(k, g)] = v0 - ((v0 - v1) * num_t) // den
        return locf, interp

    @given(
        entries=st.dictionaries(
            keys=st.tuples(st.integers(1, 2), st.integers(0, 600)),
            values=st.integers(-1000, 1000),
            min_size=1,
            max_size=20,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_resample_property_matches_brute_force(spark, entries):
        """Random (key, minute, value) observation sets vs the Python
        reference: LOCF carry (inclusive-at-instant, NULL before first
        obs, full grid per key) and exact-integer truncating-division
        interpolation (NULL outside [first, last], observation-at-grid
        returns the observation)."""
        from feast_ibm_spark.operators.resample import (
            resample_interpolate,
            resample_locf,
        )

        df = spark.createDataFrame(
            [(k, T0 + dt.timedelta(minutes=m), v)
             for (k, m), v in entries.items()],
            "k bigint, ts timestamp, v bigint",
        )
        start, end = "2024-01-01 00:00:00", "2024-01-01 10:00:00"

        want_locf, want_interp = _brute_resample(entries)
        got_locf = {
            (r["k"], r["grid_ts"]): r["v"]
            for r in resample_locf(
                df, ["k"], "ts", ["v"], start, end, 3600
            ).collect()
        }
        assert got_locf == want_locf
        got_interp = {
            (r["k"], r["grid_ts"]): r["v"]
            for r in resample_interpolate(
                df, ["k"], "ts", "v", start, end, 3600
            ).collect()
        }
        assert got_interp == want_interp


def test_range_join_auto_bucket_matches_manual(spark):
    """bucket=None derives ~p95 of the sampled interval lengths and the
    result set is identical to any manual width (the bucket is a
    physical knob; the exact containment filter fixes the answer)."""
    from feast_ibm_spark.operators.interval import _auto_bucket, range_join

    i_df = spark.createDataFrame(
        [(i, i * 10, i * 10 + 6) for i in range(40)], "iid long, s long, e long"
    )
    p_df = spark.createDataFrame([(p,) for p in range(0, 400, 3)], "p long")
    assert _auto_bucket(i_df, "s", "e") == 7  # constant length-7 windows
    want = {(r.p, r.iid)
            for r in range_join(p_df, i_df, "p", "s", "e", bucket=7).collect()}
    got = {(r.p, r.iid)
           for r in range_join(p_df, i_df, "p", "s", "e").collect()}
    assert got == want and len(got) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        _auto_bucket(i_df.filter("iid < 0"), "s", "e")
