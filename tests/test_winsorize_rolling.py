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


def test_winsorize_from_sketch_unknown_group_passes_through(spark):
    """A group present in the increment but absent from the sketch
    state (first appearance before the next fold) must pass through
    UNCLIPPED — never be dropped: the winsorize contract is 'clamped,
    not dropped; row counts are unaffected'."""
    from kamu_engine_datafusion_spark.operators.profile import (
        winsorize_from_sketch,
    )
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
    )

    known = spark.createDataFrame(
        [("a", i, i) for i in range(100)], "g string, rid long, val long"
    )
    sketch = quantile_sketch(known, ["g"], "rid", "val", k=64)
    inc = spark.createDataFrame(
        [("a", 200, 999), ("b", 201, -5), ("b", 202, 12345)],
        "g string, rid long, val long",
    )
    got = {
        (r["g"], r["rid"]): r["val_winsorized"]
        for r in winsorize_from_sketch(
            inc, sketch, "val", ["g"], "rid"
        ).collect()
    }
    assert len(got) == 3  # nothing dropped
    # known group clips against its sketch cuts
    assert got[("a", 200)] < 999
    # unknown group passes through unclipped
    assert got[("b", 201)] == -5 and got[("b", 202)] == 12345


def test_winsorize_from_maintained_sketch_tracks_exact(spark, tmp_path):
    """The incremental path end to end: quantile-sketch state folded
    across ledger ticks feeds winsorize cut points; the clipped values
    must track the exact winsorize within the sketch's rank-error
    bound, and clip EXACTLY at the sketch's own estimates."""
    import os
    import random

    from kamu_engine_datafusion_spark.operators.profile import (
        winsorize_from_sketch,
    )
    from kamu_engine_datafusion_spark.streaming.structured import (
        maintained_quantile_sketch,
        read_maintained_state,
    )

    ledger_dir = os.path.join(str(tmp_path), "wledger")
    state_dir = os.path.join(str(tmp_path), "wstate")
    ck = os.path.join(str(tmp_path), "wck")
    os.makedirs(ledger_dir)
    schema = "g string, rid long, val long"
    rng = random.Random(13)
    rows_all = []

    def tick(n0, n1):
        rows = [
            ("a", i, rng.randint(0, 10_000)) for i in range(n0, n1)
        ]
        rows_all.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(ledger_dir)
        q = maintained_quantile_sketch(
            ledger_dir, state_dir, ck, ["g"], "rid", "val", k=512,
            schema=spark.read.parquet(ledger_dir).schema, spark=spark,
        )
        q.awaitTermination()

    tick(0, 2000)
    tick(2000, 5000)
    full = spark.createDataFrame(rows_all, schema)
    state = read_maintained_state(spark, state_dir)
    got = winsorize_from_sketch(
        full, state, "val", ["g"], "rid", lower=(1, 10), upper=(9, 10)
    )
    g = {r["rid"]: r["val_winsorized"] for r in got.collect()}
    # the sketch cuts must sit within the rank-error band of the true
    # percentiles: the fraction of rows the sketch path CLIPS per tail
    # stays near the 10% target. (Comparing clipped VALUES row-by-row
    # against exact winsorize is the wrong metric — any cut difference
    # changes every clipped row's value, ~20% of rows at p10/p90.)
    vals = {rid: v for _, rid, v in rows_all}
    n = len(vals)
    lo_clipped = sum(1 for k in g if g[k] > vals[k]) / n
    hi_clipped = sum(1 for k in g if g[k] < vals[k]) / n
    assert abs(lo_clipped - 0.10) < 0.05, lo_clipped
    assert abs(hi_clipped - 0.10) < 0.05, hi_clipped
    # unclipped rows pass through untouched
    assert any(g[k] == vals[k] for k in g)
    # and the sketch path's cut points are ITS estimates exactly:
    # min/max of clipped values equal the estimate columns
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch_estimates,
    )

    est = quantile_sketch_estimates(
        state, ["g"], "rid", "val", qs=[(1, 10), (9, 10)]
    ).first()
    assert min(g.values()) == est["q_1_10"]
    assert max(g.values()) == est["q_9_10"]
