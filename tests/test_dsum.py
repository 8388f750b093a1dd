"""dsum: exact deterministic money sums with overflow headroom."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.queries._util import dsum


def test_dsum_matches_duckdb_oracle_formulation(spark):
    rows = [(1, 10.25), (1, 0.333333), (1, -4.1), (2, 999999.999999)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(dsum(F.col("v"), "s")).collect()
    }
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            "SELECT k, CAST(SUM(CAST(round(v*1000000) AS BIGINT)) AS DOUBLE)"
            "/1000000.0 AS s FROM (VALUES "
            + ", ".join(f"({k}, {v!r})" for k, v in rows)
            + ") t(k, v) GROUP BY k"
        ).fetchall()
    }
    assert got == want


def test_dsum_survives_long_overflow_magnitudes(spark):
    """A raw BIGINT micro-unit accumulator wraps past ~9.2e18 micro-units
    (~9.2e12 currency units per group). The decimal accumulator must not:
    5 rows x 5e12 currency = 2.5e19 micro-units, past the long range."""
    big = 5.0e12
    df = spark.createDataFrame([(1, big)] * 5, "k long, v double")
    [row] = df.groupBy("k").agg(dsum(F.col("v"), "s")).collect()
    assert row["s"] == pytest.approx(5 * big, rel=1e-12)
    assert row["s"] > 0  # a wrapped long sum would have gone negative
