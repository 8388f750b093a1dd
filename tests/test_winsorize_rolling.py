"""winsorize + rolling_time_agg."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.profile import winsorize
from kamu_engine_datafusion_spark.operators.snapshot import rolling_time_agg


def test_winsorize_clips_tails_keeps_rows(spark):
    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = winsorize(df, "v", lower=0.10, upper=0.90).collect()
    assert len(out) == 100  # clamped, never dropped
    w = [r["v_winsorized"] for r in out]
    # p10/p90 of 1..100 (linear interpolation) = 10.9 / 90.1
    assert abs(min(w) - 10.9) < 1e-9 and abs(max(w) - 90.1) < 1e-9
    untouched = [r for r in out if 10.9 <= r["v"] <= 90.1]
    assert all(r["v"] == r["v_winsorized"] for r in untouched)


def test_winsorize_null_stays_null(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    out = {r["v"]: r["v_winsorized"] for r in winsorize(df, "v").collect()}
    assert out[None] is None


def test_rolling_time_agg_brute_force(spark):
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "u", base, 1.0),
        (2, "u", datetime(2024, 1, 1, 12, 30), 2.0),
        (3, "u", datetime(2024, 1, 1, 13, 15), 4.0),  # 12:30,13:15 in 1h
        (4, "u", datetime(2024, 1, 1, 15, 0), 8.0),  # alone
        (5, "v", datetime(2024, 1, 1, 12, 45), 16.0),  # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    out = {
        r["event_id"]: (r["rolling_n"], r["rolling_sum"])
        for r in rolling_time_agg(df, "ts", "value", 3600, ["user_id"]).collect()
    }
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 3.0)  # 12:00 is exactly 1h before 13:00? no: [11:30,12:30] -> 1,2
    assert out[3] == (2, 6.0)  # [12:15,13:15] -> events 2,3
    assert out[4] == (1, 8.0)
    assert out[5] == (1, 16.0)


def test_rolling_time_window_is_closed_at_boundary(spark):
    rows = [
        (1, datetime(2024, 1, 1, 12, 0), 1.0),
        (2, datetime(2024, 1, 1, 13, 0), 2.0),  # exactly 3600s later
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_time_agg(df, "ts", "value", 3600).collect()
    }
    assert out[2] == 2  # closed interval includes t-3600 exactly


def test_rolling_plan_single_window_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, "u", datetime(2024, 1, 1), 1.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    plan = (
        rolling_time_agg(df, "ts", "value", 60, ["user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1  # all three aggs share one frame
