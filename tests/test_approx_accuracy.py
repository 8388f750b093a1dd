"""Accuracy bounds for the approximate aggregates (B18): the sketches
are engine-specific (rows-only at the oracle gate), so their QUALITY is
asserted here against exact answers on real testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("apx"),
            F.count_distinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # HLL++ default relative standard deviation is 5%; 3 sigma bound
        assert abs(r["apx"] - r["exact"]) <= 0.15 * r["exact"] + 1, r


def test_percentile_approx_brackets_exact_median(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    r = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("apx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).head()
    # with accuracy=10k on ~60k rows the approx median must land within
    # a tight quantile band around the exact one
    lo, hi = li.approxQuantile("l_extendedprice", [0.49, 0.51], 0.0)
    assert lo <= r["apx"] <= hi, (r, lo, hi)
