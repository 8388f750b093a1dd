"""Funnel operator: greedy first-touch ordered funnel with and without
a time window, on a tiny stream with known answers."""

from __future__ import annotations

from datetime import datetime

from kamu_engine_datafusion_spark.operators.funnel import funnel_counts


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def test_funnel_ordering_enforced(spark):
    t0 = datetime(2024, 1, 1, 0, 0)
    rows = [
        # u1 completes A -> B -> C in order
        (1, "A", datetime(2024, 1, 1, 0, 0)),
        (1, "B", datetime(2024, 1, 1, 1, 0)),
        (1, "C", datetime(2024, 1, 1, 2, 0)),
        # u2 does B before A: depth stops at A
        (2, "B", datetime(2024, 1, 1, 0, 0)),
        (2, "A", datetime(2024, 1, 1, 1, 0)),
        # u3 never starts
        (3, "C", t0),
    ]
    out = {
        r.step: r.n_users
        for r in funnel_counts(
            _events(spark, rows), steps=["A", "B", "C"]
        ).collect()
    }
    assert out == {1: 2, 2: 1, 3: 1}


def test_funnel_window_anchored_at_first_step(spark):
    rows = [
        # u1: B inside the 1h window
        (1, "A", datetime(2024, 1, 1, 0, 0)),
        (1, "B", datetime(2024, 1, 1, 0, 30)),
        # u2: B after the window closes
        (2, "A", datetime(2024, 1, 1, 0, 0)),
        (2, "B", datetime(2024, 1, 1, 2, 0)),
    ]
    out = {
        r.step: r.n_users
        for r in funnel_counts(
            _events(spark, rows), steps=["A", "B"], within_seconds=3600
        ).collect()
    }
    assert out == {1: 2, 2: 1}


def test_funnel_strictly_after(spark):
    ts = datetime(2024, 1, 1, 0, 0)
    rows = [(1, "A", ts), (1, "B", ts)]  # same instant: B not after A
    out = {
        r.step: r.n_users
        for r in funnel_counts(_events(spark, rows), steps=["A", "B"]).collect()
    }
    assert out == {1: 1, 2: 0}
