"""Bucketized interval join: exact theta-join semantics on an equi-join
plan."""

from __future__ import annotations

from datetime import datetime

from kamu_engine_datafusion_spark.operators.rangejoin import interval_join


def _dfs(spark):
    points = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0)),    # == start: included
            (2, datetime(2024, 1, 5, 12, 0)),   # inside
            (3, datetime(2024, 1, 8, 0, 0)),    # == end: excluded
            (4, datetime(2024, 3, 1, 0, 0)),    # no interval
            (5, datetime(2024, 1, 20, 0, 0)),   # second interval, crosses buckets
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1), datetime(2024, 1, 8)),
            (11, datetime(2024, 1, 6), datetime(2024, 1, 25)),  # spans 3 weeks
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def test_interval_join_matches_theta_semantics(spark):
    points, intervals = _dfs(spark)
    out = interval_join(points, "ts", intervals, "start_ts", "end_ts")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 10), (2, 10), (3, 11), (5, 11)]
    # no duplicates even for intervals spanning several buckets
    assert len(got) == len(set(got))


def test_interval_join_plans_equi_join(spark):
    points, intervals = _dfs(spark)
    out = interval_join(points, "ts", intervals, "start_ts", "end_ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_interval_join_timestamp_ntz_parquet(spark, tmp_path):
    """Parquet-loaded timestamps resolve as TIMESTAMP_NTZ (this is what
    the driver's testdata produces); the operator must accept them.
    Round-trips through parquet so the columns really are NTZ, the class
    of input the in-memory tz-aware fixtures cannot reproduce."""
    points, intervals = _dfs(spark)
    p_path, i_path = str(tmp_path / "p"), str(tmp_path / "i")
    points.withColumn("ts", points["ts"].cast("timestamp_ntz")).write.parquet(p_path)
    intervals.withColumn(
        "start_ts", intervals["start_ts"].cast("timestamp_ntz")
    ).withColumn(
        "end_ts", intervals["end_ts"].cast("timestamp_ntz")
    ).write.parquet(i_path)
    p = spark.read.parquet(p_path)
    i = spark.read.parquet(i_path)
    assert dict(p.dtypes)["ts"] == "timestamp_ntz"
    assert dict(i.dtypes)["start_ts"] == "timestamp_ntz"
    out = interval_join(p, "ts", i, "start_ts", "end_ts")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 10), (2, 10), (3, 11), (5, 11)]


def test_interval_join_inverted_interval_dropped(spark):
    """end <= start intervals contain no point and must not explode into
    a descending bucket sequence."""
    points, intervals = _dfs(spark)
    bad = spark.createDataFrame(
        [
            (90, datetime(2024, 2, 1), datetime(2024, 1, 1)),  # inverted
            (91, datetime(2024, 1, 5), datetime(2024, 1, 5)),  # empty
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(points, "ts", intervals.union(bad), "start_ts", "end_ts")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 10), (2, 10), (3, 11), (5, 11)]


def test_interval_join_pre_epoch_timestamps(spark):
    """Bucket ids are floor-divided epoch seconds; negative epochs
    (pre-1970) must bucket consistently on both sides of the join."""
    from datetime import datetime, timedelta, timezone

    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    pts = [
        epoch - timedelta(days=3),
        epoch - timedelta(hours=1),
        epoch + timedelta(hours=1),
    ]
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pts)], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(0, epoch - timedelta(days=4), epoch + timedelta(days=1))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, "ts", intervals, "start_ts", "end_ts"
        ).collect()
    )
    assert got == [(0, 0), (1, 0), (2, 0)]


def test_merge_intervals_brute_force(spark):
    from kamu_engine_datafusion_spark.operators.rangejoin import (
        merge_intervals,
    )

    rows = [
        ("u", 1, 5), ("u", 5, 9), ("u", 20, 25), ("u", 22, 23),
        ("u", 30, 28),  # inverted: dropped
        ("v", 1, 2), ("v", 10, 12),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = sorted(
        (r["k"], r["island"], r["s"], r["e"], r["n_merged"])
        for r in merge_intervals(df, "s", "e", ["k"]).collect()
    )
    assert out == [
        ("u", 1, 1, 9, 2),     # [1,5]+[5,9] touch -> merge
        ("u", 2, 20, 25, 2),   # [22,23] contained
        ("v", 1, 1, 2, 1),
        ("v", 2, 10, 12, 1),
    ]


def test_merge_intervals_single_exchange(spark):
    from kamu_engine_datafusion_spark.operators.rangejoin import (
        merge_intervals,
    )

    df = spark.createDataFrame([("u", 1, 2)], "k string, s long, e long")
    plan = (
        merge_intervals(df, "s", "e", ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # one shuffle + AQE artifacts
    assert "Join" not in plan
