"""Distributed skyline: exact Pareto-front semantics on a two-phase
mapInPandas plan."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kamu_engine_datafusion_spark.operators.skyline import skyline


def test_skyline_known_answer(spark):
    rows = [
        (1, 1.0, 9.0),   # skyline (cheapest at its speed)
        (2, 2.0, 5.0),   # skyline
        (3, 3.0, 2.0),   # skyline
        (4, 3.0, 5.0),   # dominated by 2 and 3
        (5, 9.0, 1.0),   # skyline (fastest)
        (6, 9.0, 9.0),   # dominated by everything
    ]
    df = spark.createDataFrame(rows, "id long, price double, time double")
    got = sorted(r["id"] for r in skyline(df, ["price", "time"]).collect())
    assert got == [1, 2, 3, 5]


def test_skyline_maximize_orientation(spark):
    rows = [(1, 1.0, 9.0), (2, 2.0, 5.0), (3, 9.0, 9.5)]
    df = spark.createDataFrame(rows, "id long, price double, quality double")
    # minimize price, maximize quality: 2 is dominated by nothing? 1 has
    # lower price but lower quality; 3 has higher quality, higher price
    got = sorted(
        r["id"]
        for r in skyline(df, ["price", "quality"], maximize=["quality"]).collect()
    )
    assert got == [1, 3]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=7),
)
def test_skyline_matches_bruteforce(spark, pts, parts):
    rows = [(i, float(a), float(b), float(c)) for i, (a, b, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "id long, x double, y double, z double"
    ).repartition(parts)
    got = sorted(r["id"] for r in skyline(df, ["x", "y", "z"]).collect())
    expected = sorted(
        i
        for i, p in enumerate(pts)
        if not any(
            all(q[d] <= p[d] for d in range(3)) and any(q[d] < p[d] for d in range(3))
            for q in pts
        )
    )
    assert got == expected
