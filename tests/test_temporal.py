"""Temporal operator semantics: as-of join edges, range join bucket
boundaries, rollup reaggregation exactness."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F

from transporter_spark.operators.temporal import (
    asof_join,
    range_join_count,
    rollup_lattice,
)
from transporter_spark.sources.files import read_table


def _ts(m):
    return datetime(2024, 1, 1) + timedelta(minutes=m)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(30)), (3, 200, _ts(5))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(0), "a"), (100, _ts(10), "b"), (100, _ts(20), "c"),
         (200, _ts(50), "late")],
        "k long, ts timestamp, v string",
    )
    out = {r.event_id: r.v for r in asof_join(left, right, on=["k"]).collect()}
    assert out[1] == "b"    # equal timestamp IS eligible (<=)
    assert out[2] == "c"    # newest before 30
    assert out[3] is None   # right side only exists later


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(120))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), "stale")], "k long, ts timestamp, v string"
    )
    fresh = asof_join(left, right, on=["k"], tolerance="1 hour").collect()[0]
    assert fresh.v is None  # 2h-old match exceeds 1h tolerance
    loose = asof_join(left, right, on=["k"], tolerance="3 hour").collect()[0]
    assert loose.v == "stale"


def test_range_join_count_bucket_boundary(spark):
    """Rows near bucket edges must still match (the n_back probe):
    59 minutes apart across an hour-bucket boundary."""
    rows = [
        (1, 7, _ts(59)),           # 00:59
        (2, 7, _ts(61)),           # 01:01 — 2 min later, different bucket
        (3, 7, _ts(200)),          # far away
        (4, 8, _ts(60)),           # other key
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r.event_id: r.n_recent
        for r in range_join_count(df, key="user_id", ts="ts").collect()
    }
    assert out[1] == 0   # nothing before it
    assert out[2] == 1   # sees event 1 across the bucket boundary
    assert out[3] == 0   # window expired
    assert out[4] == 0   # keys don't mix


def test_rollup_lattice_daily_equals_direct(spark, sf_dir):
    """daily-from-hourly must equal daily-from-raw exactly (decimal
    partials reaggregate losslessly)."""
    ev = read_table(spark, sf_dir, "events")
    lattice = rollup_lattice(ev, ts="ts", keys=["event_type"], value="value")
    derived = {
        (r.day, r.event_type): (r.sum_value, r.n)
        for r in lattice["daily"].collect()
    }
    direct = {
        (r.day, r.event_type): (r.sum_value, r.n)
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.sum(F.col("value").cast("string").cast("decimal(38,6)")).alias("sum_value"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert derived == direct


def test_sessionize_splits_on_gap(spark):
    from transporter_spark.operators.temporal import sessionize
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, base),
        (2, 7, base + dt.timedelta(minutes=10)),   # same session
        (3, 7, base + dt.timedelta(minutes=41)),   # 31 min gap -> new
        (4, 7, base + dt.timedelta(minutes=71)),   # exactly 30 min -> SAME
        (5, 8, base),                              # other user starts at 1
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, "user_id", "ts", "30 minutes").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_partition_invariant(spark):
    from transporter_spark.operators.temporal import sessionize

    df = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 1200).alias("ts"),  # 20 min apart
    )
    a = sorted(map(tuple, sessionize(df, "user_id", "ts").collect()))
    b = sorted(map(tuple, sessionize(df.repartition(13), "user_id", "ts").collect()))
    assert a == b


def test_asof_join_forward_and_nearest_directions(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(14)), (3, 100, _ts(100)),
         (4, 200, _ts(5))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(0), "a"), (100, _ts(10), "b"), (100, _ts(20), "c"),
         (200, _ts(1), "early")],
        "k long, ts timestamp, v string",
    )
    fwd = {
        r.event_id: r.v
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    assert fwd[1] == "b"    # equal timestamp eligible (>=)
    assert fwd[2] == "c"    # oldest at-or-after 14
    assert fwd[3] is None   # nothing after 100
    assert fwd[4] is None   # right exists only BEFORE (forward finds none)

    near = {
        r.event_id: r.v
        for r in asof_join(left, right, on=["k"], direction="nearest").collect()
    }
    assert near[1] == "b"   # exact match
    assert near[2] == "b"   # 4 back vs 6 forward -> backward
    assert near[3] == "c"   # only backward exists
    assert near[4] == "early"  # only backward exists for key 200
    # tie: 15 is 5 from b(10) and 5 from c(20) -> backward wins (pandas)
    tie = spark.createDataFrame(
        [(9, 100, _ts(15))], "event_id long, k long, ts timestamp"
    )
    row = asof_join(tie, right, on=["k"], direction="nearest").collect()[0]
    assert row.v == "b"


def test_asof_join_forward_and_nearest_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(120), "far")], "k long, ts timestamp, v string"
    )
    out = asof_join(
        left, right, on=["k"], direction="forward", tolerance="1 hour"
    ).collect()[0]
    assert out.v is None    # 2h ahead exceeds tolerance
    out = asof_join(
        left, right, on=["k"], direction="nearest", tolerance="1 hour"
    ).collect()[0]
    assert out.v is None    # nearest respects per-side tolerance too
    out = asof_join(
        left, right, on=["k"], direction="nearest", tolerance="3 hour"
    ).collect()[0]
    assert out.v == "far"


def test_asof_join_unknown_direction_raises(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, 1, _ts(0))], "e long, k long, ts timestamp")
    with _pytest.raises(ValueError):
        asof_join(left, left, on=["k"], direction="sideways")
