"""Tests for the raw-query entry point (A21) and the scale-mode offset
assigner (two-pass distributed A13)."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark import (
    RawQueryRequest,
    SqlQueryStep,
    execute_raw_query,
)
from kamu_engine_datafusion_spark.operators.system_columns import (
    assign_offsets_distributed,
)
from tests.conftest import write_cities_ledger


def test_execute_raw_query(spark, tmp_path):
    """A21 (reference ``src/engine.rs:56-125``): register `input`, run
    steps, no validation/system columns, return num_records."""
    ledger = write_cities_ledger(str(tmp_path / "in.parquet"))
    out_path = str(tmp_path / "out.parquet")
    resp = execute_raw_query(
        spark,
        RawQueryRequest(
            input_data_paths=[ledger],
            transform=[
                SqlQueryStep(
                    query="select city, population * 2 as pop2 from input "
                    "where population > 700000"
                )
            ],
            output_data_path=out_path,
        ),
    )
    assert resp.num_records == 2
    d = pq.read_table(out_path).to_pydict()
    assert sorted(d["city"]) == ["kyiv", "seattle"]


def test_raw_query_multi_step(spark, tmp_path):
    ledger = write_cities_ledger(str(tmp_path / "in.parquet"))
    out_path = str(tmp_path / "out.parquet")
    resp = execute_raw_query(
        spark,
        RawQueryRequest(
            input_data_paths=[ledger],
            transform=[
                SqlQueryStep(query="select * from input", alias="s1"),
                SqlQueryStep(query="select count(*) as n from s1"),
            ],
            output_data_path=out_path,
        ),
    )
    assert resp.num_records == 1
    assert pq.read_table(out_path).to_pydict()["n"] == [3]


def test_distributed_offsets_dense_unique(spark):
    """Offsets must be dense [start, start+n) regardless of partitioning."""
    df = spark.range(0, 10_000).repartition(16)
    out = assign_offsets_distributed(df, "offset", 100)
    rows = out.select("offset").collect()
    offsets = sorted(r["offset"] for r in rows)
    assert offsets == list(range(100, 10_100))


def test_distributed_offsets_follow_range_partition_order(spark):
    """With range partitioning + in-partition sort, offsets equal the
    global rank — the scale path for ledger-ordered output."""
    df = (
        spark.range(0, 5_000)
        .withColumn("key", F.col("id"))
        .repartitionByRange(8, "key")
        .sortWithinPartitions("key")
    )
    out = assign_offsets_distributed(df, "offset", 0)
    rows = out.select("offset", "key").collect()
    assert all(r["offset"] == r["key"] for r in rows)


def test_distributed_offsets_empty(spark):
    df = spark.range(0, 0)
    out = assign_offsets_distributed(df, "offset", 0)
    assert out.count() == 0
