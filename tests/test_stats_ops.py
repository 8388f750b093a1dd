"""event_transitions / correlation_matrix / quantile_bins / standardize."""

from __future__ import annotations

import math
from datetime import datetime

from kamu_engine_datafusion_spark.operators.funnel import event_transitions
from kamu_engine_datafusion_spark.operators.profile import (
    correlation_matrix,
    quantile_bins,
    standardize,
)


def test_event_transitions_counts_and_probs(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, "u", t0.replace(hour=1), "view"),
        (2, "u", t0.replace(hour=2), "click"),
        (3, "u", t0.replace(hour=3), "view"),
        (4, "u", t0.replace(hour=4), "click"),
        (5, "v", t0.replace(hour=1), "view"),
        (6, "v", t0.replace(hour=2), "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    )
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(df).collect()
    }
    # view -> click twice, view -> buy once; click -> view once
    assert out[("view", "click")] == (2, 2 / 3)
    assert out[("view", "buy")] == (1, 1 / 3)
    assert out[("click", "view")] == (1, 1.0)
    # no cross-user transition (v's buy never follows u's click)
    assert ("buy", "view") not in out


def test_correlation_matrix_brute_force(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 5.9, 8.1, 10.0]  # ~ 2x, corr ~ 1
    zs = [5.0, 4.0, 3.0, 2.0, 1.0]  # exactly -x
    df = spark.createDataFrame(list(zip(xs, ys, zs)), "x double, y double, z double")
    out = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert len(out) == 6  # upper triangle incl. diagonal
    assert abs(out[("x", "x")] - 1.0) < 1e-12
    assert abs(out[("x", "z")] + 1.0) < 1e-12

    def corr(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        cov = sum((p - ma) * (q - mb) for p, q in zip(a, b))
        return cov / math.sqrt(
            sum((p - ma) ** 2 for p in a) * sum((q - mb) ** 2 for q in b)
        )

    assert abs(out[("x", "y")] - corr(xs, ys)) < 1e-9


def test_quantile_bins_equal_depth_and_order(spark):
    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(100)], "id long, v double"
    )
    out = quantile_bins(df, "v", 4, "id").collect()
    from collections import Counter

    depth = Counter(r["v_bin"] for r in out)
    assert depth == {1: 25, 2: 25, 3: 25, 4: 25}
    # bins respect value order: every bin-1 value < every bin-4 value
    b1 = max(r["v"] for r in out if r["v_bin"] == 1)
    b4 = min(r["v"] for r in out if r["v_bin"] == 4)
    assert b1 < b4


def test_standardize_zero_variance_group_null(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 7.0), ("b", 7.0), ("c", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = [
        (r["g"], r["v"], r["v_z"])
        for r in standardize(df, "v", ["g"]).collect()
    ]
    a = sorted(z for g, v, z in out if g == "a")
    assert abs(a[0] + 0.7071067811865475) < 1e-12  # (1-2)/sqrt(2)
    assert all(z is None for g, v, z in out if g in ("b", "c"))


def test_quantile_bins_cut_mode_no_sort_near_equal_depth(spark):
    from collections import Counter

    from kamu_engine_datafusion_spark.operators.profile import quantile_bins

    df = spark.createDataFrame(
        [(i, float(i * 37 % 1000)) for i in range(1000)], "id long, v double"
    )
    out = quantile_bins(df, "v", 4, exact_depth=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan and "Window" not in plan  # the scale path
    depth = Counter(r["v_bin"] for r in out.collect())
    assert set(depth) == {1, 2, 3, 4}
    assert all(abs(n - 250) <= 25 for n in depth.values())  # near-equal
    # bins respect value order across the cut boundaries
    rows = out.collect()
    b1max = max(r["v"] for r in rows if r["v_bin"] == 1)
    b4min = min(r["v"] for r in rows if r["v_bin"] == 4)
    assert b1max < b4min
