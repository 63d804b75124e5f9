"""As-of and binned range joins vs independent python twins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from imgfact_spark.operators.temporal import asof_join, range_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _probe_rows():
    # (event_id, key, ts)
    return [
        (1, "a", _ts(10)),
        (2, "a", _ts(20)),
        (3, "a", _ts(5)),    # before any ref → NULL match
        (4, "b", _ts(30)),
        (5, "b", _ts(7)),
        (6, "c", _ts(30)),   # key with no refs at all
    ]


def _ref_rows():
    # (key, ts, rid, val) — includes a same-timestamp tie on (a, 10:00)
    return [
        ("a", _ts(10), 100, 1.0),   # exactly at probe 1's ts (inclusive)
        ("a", _ts(10), 101, 2.0),   # tie: greater rid must win
        ("a", _ts(15), 102, 3.0),
        ("b", _ts(6), 200, 4.0),
        ("b", _ts(29, 59), 201, 5.0),
    ]


def _twin_asof(probes, refs, tolerance=None):
    out = {}
    for pid, k, pts in probes:
        cands = [r for r in refs if r[0] == k and r[1] <= pts]
        if tolerance is not None:
            cands = [r for r in cands if r[1] >= pts - tolerance]
        if not cands:
            out[pid] = (None, None, None)
        else:
            best = max(cands, key=lambda r: (r[1], r[2]))
            out[pid] = (best[1], best[2], best[3])
    return out


def _frames(spark):
    p = spark.createDataFrame(
        _probe_rows(), "event_id long, key string, ts timestamp"
    )
    r = spark.createDataFrame(
        _ref_rows(), "key string, r_ts timestamp, rid long, val double"
    )
    return p, r


def _collect_asof(df):
    return {
        r.event_id: (r.asof_r_ts, r.asof_rid, r.asof_val) for r in df.collect()
    }


def test_asof_matches_twin_with_ties_and_nulls(spark):
    p, r = _frames(spark)
    got = _collect_asof(
        asof_join(p, r, ["key"], "ts", "r_ts", ["rid", "val"], tiebreak="rid")
    )
    assert got == _twin_asof(_probe_rows(), _ref_rows())
    # spot-check the semantics the fixture plants:
    assert got[1] == (_ts(10), 101, 2.0)   # inclusive + tie → greatest rid
    assert got[3] == (None, None, None)    # no ref at-or-before
    assert got[6] == (None, None, None)    # key with no refs


def test_asof_tolerance(spark):
    p, r = _frames(spark)
    tol = 60  # seconds: probe 4 (30:00) only matches ref 201 (29:59)
    got = _collect_asof(
        asof_join(p, r, ["key"], "ts", "r_ts", ["rid", "val"],
                  tiebreak="rid", tolerance_seconds=tol)
    )
    assert got == _twin_asof(
        _probe_rows(), _ref_rows(), tolerance=dt.timedelta(seconds=tol)
    )
    assert got[4] == (_ts(29, 59), 201, 5.0)
    assert got[2] == (None, None, None)  # a@20:00, latest ref 15:00 → stale


def test_asof_partitioning_invariance_and_plan(spark):
    p, r = _frames(spark)
    out = asof_join(
        p.repartition(5), r.repartition(3), ["key"], "ts", "r_ts",
        ["rid", "val"], tiebreak="rid",
    )
    assert _collect_asof(out) == _twin_asof(_probe_rows(), _ref_rows())
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-and-carry-forward: a window, never a join of any kind
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_asof_null_timestamps_never_match(spark):
    """A NULL-ts reference sorts NULLS-FIRST and would be carried into
    every match without the filter; a NULL-ts probe must come back
    unmatched (both per the oracle contract v_ts <= ts, NULL-excluding)."""
    p = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", None)],
        "event_id long, key string, ts timestamp",
    )
    r = spark.createDataFrame(
        [("a", None, 99, 9.9), ("a", _ts(5), 100, 1.0)],
        "key string, r_ts timestamp, rid long, val double",
    )
    got = _collect_asof(
        asof_join(p, r, ["key"], "ts", "r_ts", ["rid", "val"], tiebreak="rid")
    )
    assert got[1] == (_ts(5), 100, 1.0)  # the NULL-ts ref never wins
    assert got[2] == (None, None, None)  # NULL-ts probe is unmatched


def test_asof_reserved_column_clash_raises(spark):
    p = spark.createDataFrame([(1, "a", _ts(1), 0)],
                              "event_id long, key string, ts timestamp, _m int")
    r = spark.createDataFrame([("a", _ts(0), 1, 1.0)],
                              "key string, r_ts timestamp, rid long, val double")
    import pytest

    with pytest.raises(ValueError, match="_m"):
        asof_join(p, r, ["key"], "ts", "r_ts", ["rid"])


def test_range_join_interval_guards(spark):
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    p = spark.createDataFrame([(1, "a", _ts(10))],
                              "event_id long, key string, ts timestamp")
    # empty interval (end < start) matches nothing, silently
    empty = spark.createDataFrame(
        [("a", _ts(20), _ts(10), 1)],
        "key string, s_ts timestamp, e_ts timestamp, rid long",
    )
    assert range_join(p, empty, ["key"], "ts", "s_ts", "e_ts", 60).count() == 0
    # an interval spanning > max_bins_per_interval bins fails loudly
    wide = spark.createDataFrame(
        [("a", _ts(0), dt.datetime(2031, 1, 1), 1)],
        "key string, s_ts timestamp, e_ts timestamp, rid long",
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        range_join(p, wide, ["key"], "ts", "s_ts", "e_ts", 60).count()


def test_range_join_matches_twin_and_plan(spark):
    p, r = _frames(spark)
    iv = r.select(
        "key", F.col("r_ts").alias("s_ts"),
        (F.col("r_ts") + F.expr("INTERVAL 7 MINUTES")).alias("e_ts"), "rid",
    )
    for width in (60, 300, 3600):  # result must not depend on the bin width
        got = {
            (row.event_id, row.rid)
            for row in range_join(
                p, iv, ["key"], "ts", "s_ts", "e_ts", bin_width_seconds=width
            ).collect()
        }
        want = {
            (pid, rid)
            for pid, k, pts in _probe_rows()
            for rk, rts, rid, _ in _ref_rows()
            if rk == k and rts <= pts <= rts + dt.timedelta(minutes=7)
        }
        assert got == want, width
    out = range_join(p, iv, ["key"], "ts", "s_ts", "e_ts", bin_width_seconds=300)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_time_rollup_matches_pandas_twin_and_plan(spark):
    """time_rollup == an independent pandas groupby at every level; the
    plan is ONE Expand + hash aggregate (no join, no union of per-level
    scans)."""
    import math

    import pandas as pd

    from imgfact_spark.operators.rollup import time_rollup

    rows = [
        (
            i,
            dt.datetime(2024, 1, 1 + (i % 3), (i * 7) % 24, (i * 13) % 60),
            "click" if i % 2 else "view",
            (i % 11) * 0.37 - 1.5,
        )
        for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = time_rollup(ev, "ts", ["event_type"], "value", ("day", "hour"))
    got = {
        (r.event_type, r.day_us, r.hour_us, r.gran): (r.n_events, r.sum_cents)
        for r in out.collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])
    pdf["cents"] = pdf["value"].map(lambda v: math.floor(v * 100))
    us = lambda s: (s.astype("datetime64[us]").astype("int64"))  # noqa: E731
    pdf["day_us"] = us(pdf["ts"].dt.floor("D"))
    pdf["hour_us"] = us(pdf["ts"].dt.floor("h"))
    want = {}
    for (et, d, h), g in pdf.groupby(["event_type", "day_us", "hour_us"]):
        want[(et, d, h, "hour")] = (len(g), g["cents"].sum())
    for (et, d), g in pdf.groupby(["event_type", "day_us"]):
        want[(et, d, None, "day")] = (len(g), g["cents"].sum())
    for et, g in pdf.groupby("event_type"):
        want[(et, None, None, "all")] = (len(g), g["cents"].sum())
    assert got == want

    # one Expand + hash aggregate; never a per-level Union or a join (the
    # AQE plan string prints the Expand node in both the final and the
    # initial plan section, so assert presence, not count)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan
    assert "Expand" in plan


def test_time_rollup_rejects_unordered_granularities(spark):
    import pytest as _pytest

    from imgfact_spark.operators.rollup import time_rollup

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    with _pytest.raises(ValueError):
        time_rollup(ev, "ts", ["event_type"], "value", ("hour", "day"))
    with _pytest.raises(ValueError):  # duplicates
        time_rollup(ev, "ts", ["event_type"], "value", ("day", "day"))
    with _pytest.raises(ValueError):  # unknown name (and 'week': no nesting)
        time_rollup(ev, "ts", ["event_type"], "value", ("month", "week"))
