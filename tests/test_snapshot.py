"""Changelog→snapshot projection and time-bucket rollup semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.snapshot import (
    rollup_time_buckets,
    snapshot_of_ledger,
)


def _ledger(spark, rows):
    return spark.createDataFrame(
        rows, "offset long, op int, system_time timestamp, "
              "event_time timestamp, city string, population long"
    )


T = datetime(2023, 1, 1)


def test_snapshot_latest_per_key_and_dead_keys(spark):
    rows = [
        (0, 0, T, T, "vancouver", 675_000),   # append
        (1, 0, T, T, "kyiv", 2_884_000),      # append
        (2, 2, T, T, "vancouver", 675_000),   # correct-from (old half)
        (3, 3, T, T, "vancouver", 676_000),   # correct-to (new value)
        (4, 1, T, T, "kyiv", 2_884_000),      # retract -> kyiv is dead
        (5, 0, T, T, "odessa", 1_015_000),    # append
    ]
    snap = {
        r["city"]: r["population"]
        for r in snapshot_of_ledger(_ledger(spark, rows), "city").collect()
    }
    assert snap == {"vancouver": 676_000, "odessa": 1_015_000}


def test_snapshot_retract_then_reappend_lives(spark):
    rows = [
        (0, 0, T, T, "kyiv", 1),
        (1, 1, T, T, "kyiv", 1),  # retract
        (2, 0, T, T, "kyiv", 2),  # re-append -> live again
    ]
    snap = snapshot_of_ledger(_ledger(spark, rows), "city").collect()
    assert len(snap) == 1 and snap[0]["population"] == 2


def test_snapshot_drops_system_columns(spark):
    rows = [(0, 0, T, T, "kyiv", 1)]
    out = snapshot_of_ledger(_ledger(spark, rows), "city")
    assert set(out.columns) == {"event_time", "city", "population"}


def test_rollup_time_buckets(spark):
    rows = [
        (datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (datetime(2024, 1, 1, 10, 55), "click", 2.0),
        (datetime(2024, 1, 1, 11, 0), "click", 4.0),
        (datetime(2024, 1, 1, 10, 30), "view", 8.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["bucket_start"].hour, r["event_type"]): (r["n"], r["s"])
        for r in rollup_time_buckets(
            df, "ts", "hour", ["event_type"],
            {"n": F.count(F.lit(1)), "s": F.sum("value")},
        ).collect()
    }
    assert out == {(10, "click"): (2, 3.0), (11, "click"): (1, 4.0),
                   (10, "view"): (1, 8.0)}


def test_snapshot_as_of_time_travel(spark):
    """State pinned at successive offsets must replay history exactly."""
    from kamu_engine_datafusion_spark.operators.snapshot import snapshot_as_of

    rows = [
        (0, 0, T, T, "kyiv", 1),
        (1, 0, T, T, "lyon", 5),
        (2, 3, T, T, "kyiv", 2),   # correct-to
        (3, 1, T, T, "lyon", 5),   # retract
        (4, 0, T, T, "lyon", 9),   # re-append
    ]
    ledger = _ledger(spark, rows)

    def state(off):
        return {
            r["city"]: r["population"]
            for r in snapshot_as_of(ledger, "city", off).collect()
        }

    assert state(0) == {"kyiv": 1}
    assert state(1) == {"kyiv": 1, "lyon": 5}
    assert state(2) == {"kyiv": 2, "lyon": 5}
    assert state(3) == {"kyiv": 2}          # lyon retracted
    assert state(4) == {"kyiv": 2, "lyon": 9}


def test_history_intervals_scd2(spark):
    from datetime import timedelta

    from kamu_engine_datafusion_spark.operators.snapshot import (
        history_intervals,
    )

    t1, t2, t3 = T, T + timedelta(hours=1), T + timedelta(hours=2)
    led = _ledger(spark, [
        (0, 0, T, t1, "kyiv", 1),       # append v1
        (1, 0, T, t2, "kyiv", 2),       # append v2: closes v1 at t2
        (2, 1, T, t3, "kyiv", 2),       # retract: closes v2, emits nothing
        (3, 0, T, t1, "lyon", 5),       # append, never superseded
    ])
    rows = {r["offset"]: r for r in
            history_intervals(led, "city").collect()}
    assert set(rows) == {0, 1, 3}       # the retract row is not emitted
    assert rows[0]["valid_from"] == t1 and rows[0]["valid_to"] == t2
    assert rows[1]["valid_from"] == t2 and rows[1]["valid_to"] == t3
    assert not rows[1]["is_current"]    # closed by the retraction
    assert rows[3]["valid_to"] is None and rows[3]["is_current"]


def test_history_intervals_retroactive_event_clamped(spark):
    from datetime import timedelta

    from kamu_engine_datafusion_spark.operators.snapshot import (
        history_intervals,
    )

    t1, t0 = T + timedelta(hours=1), T  # retroactive: later offset, earlier et
    led = _ledger(spark, [
        (0, 0, T, t1, "kyiv", 1),
        (1, 0, T, t0, "kyiv", 2),  # arrives later, event time regresses
    ])
    rows = {r["offset"]: r for r in history_intervals(led, "city").collect()}
    # offset 0's interval is clamped empty, never inverted
    assert rows[0]["valid_to"] == rows[0]["valid_from"] == t1
    assert rows[1]["valid_to"] is None and rows[1]["is_current"]


def test_rollup_gapfill_fills_missing_buckets(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators.snapshot import (
        rollup_gapfill,
    )

    rows = [
        # key 'a': events in hours 0 and 3 — hours 1, 2 are gaps
        (datetime(2024, 1, 1, 0, 10), "a", 1.0),
        (datetime(2024, 1, 1, 3, 20), "a", 2.0),
        # key 'b': only hour 1
        (datetime(2024, 1, 1, 1, 5), "b", 5.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "k", "v"])
    out = rollup_gapfill(
        df, "ts", "hour", ["k"],
        {"n": F.count(F.lit(1))}, fill="zero",
    ).orderBy("k", "bucket_start").collect()
    # grid = 2 keys x 4 hours (00..03)
    assert len(out) == 8
    a = [(r.bucket_start.hour, r.n, r.gap_filled) for r in out if r.k == "a"]
    assert a == [(0, 1, False), (1, 0, True), (2, 0, True), (3, 1, False)]
    b = [(r.bucket_start.hour, r.n, r.gap_filled) for r in out if r.k == "b"]
    assert b == [(0, 0, True), (1, 1, False), (2, 0, True), (3, 0, True)]


def test_rollup_gapfill_ffill_carries_forward(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators.snapshot import (
        rollup_gapfill,
    )

    rows = [
        (datetime(2024, 1, 1, 0, 0), "a", 10.0),
        (datetime(2024, 1, 1, 2, 0), "a", 30.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "k", "v"])
    out = rollup_gapfill(
        df, "ts", "hour", ["k"],
        {"last_v": F.max("v")}, fill="ffill",
    ).orderBy("bucket_start").collect()
    assert [(r.bucket_start.hour, r.last_v, r.gap_filled) for r in out] == [
        (0, 10.0, False), (1, 10.0, True), (2, 30.0, False),
    ]


def test_compact_ledger_unobservable_past_horizon(spark):
    """For every t >= horizon, snapshot_as_of(compacted) must equal
    snapshot_as_of(full) — including a key whose latest pre-horizon
    record is a RETRACT (the tombstone must survive compaction, or an
    older live row would resurrect the key)."""
    from kamu_engine_datafusion_spark.operators.snapshot import (
        compact_ledger,
        snapshot_as_of,
    )

    rows = [
        # (offset, op, k, v)
        (0, 0, "a", 1.0),
        (1, 0, "b", 2.0),
        (2, 0, "a", 3.0),
        (3, 1, "b", 2.0),   # retract b pre-horizon -> tombstone must survive
        (4, 0, "c", 5.0),
        # --- horizon = 4 ---
        (5, 0, "a", 7.0),
        (6, 0, "b", 9.0),   # b re-created post-horizon
        (7, 1, "c", 5.0),
    ]
    schema = "offset long, op int, k string, value double"
    ledger = spark.createDataFrame(rows, schema).withColumn(
        "system_time", F.lit(None).cast("timestamp")
    )
    comp = compact_ledger(ledger, "k", horizon_offset=4)
    # pre-horizon collapsed to latest-per-key (3 keys), post kept (3 rows)
    assert comp.count() == 6
    # tombstone retained
    b_old = comp.filter((F.col("k") == "b") & (F.col("offset") <= 4)).collect()
    assert len(b_old) == 1 and b_old[0]["op"] == 1
    for t in (4, 5, 6, 7):
        want = sorted(
            map(tuple, snapshot_as_of(ledger, "k", t).select("k", "value").collect())
        )
        got = sorted(
            map(tuple, snapshot_as_of(comp, "k", t).select("k", "value").collect())
        )
        assert got == want, (t, got, want)
