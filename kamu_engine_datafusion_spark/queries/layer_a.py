"""Layer-A (engine-native ODF operator) query entries.

These exercise the engine's own operators — offset slicing, empty-input
synthesis, multi-step SQL views, normalization, system-column injection,
distributed offset assignment — over the driver's testdata tables, with
DuckDB-oracle equivalents. The full protocol lifecycle (ledger files,
watermarks, single-file sink) is covered by the pytest golden suite
(tests/test_transform_golden.py), which mirrors the reference's
``tests/tests/test_transform.rs``.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.normalize import normalize_raw_result
from kamu_engine_datafusion_spark.operators.system_columns import (
    assign_offsets_distributed,
    with_system_columns,
)
from kamu_engine_datafusion_spark.plans.transform import register_view_for_step
from kamu_engine_datafusion_spark.plans.types import DatasetVocabulary, OffsetInterval
from kamu_engine_datafusion_spark.queries._util import load
from kamu_engine_datafusion_spark.sources.ledger import slice_offset_interval


def q_a03_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: schema-only input → correctly-typed zero-row table
    (reference ``src/engine.rs:213-221``)."""
    t = load(spark, sf_dir, "events")
    empty = t["events"].filter(F.lit(False))  # empty_ledger() on a data file
    return empty.agg(F.count(F.lit(1)).alias("n_rows"))


def q_a04_offset_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: closed-interval incremental ledger read (``src/engine.rs:256-262``),
    with ``event_id`` standing in as the offset column. The predicate is a
    plain Catalyst filter → pushed to the Parquet scan."""
    t = load(spark, sf_dir, "events")
    sliced = slice_offset_interval(t["events"], "event_id", OffsetInterval(100, 499))
    return sliced.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("event_id").alias("first_offset"),
        F.max("event_id").alias("last_offset"),
    )


def q_a06_multi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: multi-step SQL transform — aliased steps become views visible to
    later steps (``src/engine.rs:276-308``); runs through the engine's own
    ``register_view_for_step``."""
    load(spark, sf_dir, "lineitem")
    register_view_for_step(
        spark,
        "a6_step",
        "SELECT l_orderkey, l_quantity * 2 AS qty2, l_extendedprice "
        "FROM lineitem WHERE l_orderkey <= 500",
    )
    return spark.sql(
        "SELECT l_orderkey, ROUND(SUM(qty2), 2) AS sum_qty2, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n "
        "FROM a6_step GROUP BY l_orderkey"
    )


def q_a08_normalize_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: timestamp normalization to ms-UTC (``src/engine.rs:329-350``) —
    values truncate to millisecond precision."""
    t = load(spark, sf_dir, "events")
    df = t["events"].select("event_id", "ts").filter(F.col("event_id") < 200)
    df = normalize_raw_result(df, DatasetVocabulary())
    return df.select(
        "event_id", F.col("ts").cast("string").alias("ts_str")
    )


def q_a13_offsets_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 (scale mode): two-pass distributed offset assignment — dense,
    unique, total-ordered offsets with no single-partition bottleneck
    (vs the reference's global ``target_partitions=1``,
    ``src/engine.rs:38,495-518``)."""
    t = load(spark, sf_dir, "events")
    ordered = (
        t["events"]
        .select("event_id")
        .repartitionByRange(4, "event_id")
        .sortWithinPartitions("event_id")
    )
    return assign_offsets_distributed(ordered, "offset", 0).select(
        "offset", "event_id"
    )


def q_a14_system_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13–A16 (parity mode): offset/op/system_time injection + column
    reorder (``src/engine.rs:478-561``) on a deterministic row order."""
    t = load(spark, sf_dir, "events")
    raw = (
        t["events"]
        .filter(F.col("event_id") < 100)
        .orderBy("event_id")
        .select(
            F.col("ts").alias("event_time"),
            F.col("event_type"),
            F.col("value"),
            F.col("event_id"),
        )
    )
    vocab = DatasetVocabulary()
    raw = normalize_raw_result(raw, vocab)  # ms truncation, engine order
    out = with_system_columns(
        raw, vocab, datetime(2023, 2, 1, tzinfo=timezone.utc), start_offset=10
    )
    return out.select(
        "offset",
        "op",
        F.col("system_time").cast("string").alias("system_time_str"),
        F.col("event_time").cast("string").alias("event_time_str"),
        "event_type",
        "value",
        "event_id",
    )


QUERIES = {
    "a03_empty_input": q_a03_empty_input,
    "a04_offset_slice": q_a04_offset_slice,
    "a06_multi_step": q_a06_multi_step,
    "a08_normalize_ts": q_a08_normalize_ts,
    "a13_offsets_distributed": q_a13_offsets_distributed,
    "a14_system_columns": q_a14_system_columns,
}

ORACLES = {
    "a03_empty_input": "SELECT count(*) AS n_rows FROM events WHERE false",
    "a04_offset_slice": (
        "SELECT count(*) AS n_rows, min(event_id) AS first_offset, "
        "max(event_id) AS last_offset FROM events "
        "WHERE event_id >= 100 AND event_id <= 499"
    ),
    "a06_multi_step": (
        "WITH a6_step AS (SELECT l_orderkey, l_quantity * 2 AS qty2, "
        "l_extendedprice FROM lineitem WHERE l_orderkey <= 500) "
        "SELECT l_orderkey, ROUND(SUM(qty2), 2) AS sum_qty2, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n "
        "FROM a6_step GROUP BY l_orderkey"
    ),
    "a08_normalize_ts": (
        "SELECT event_id, "
        "CAST(make_timestamp(epoch_ms(ts) * 1000) AS VARCHAR) AS ts_str "
        "FROM events WHERE event_id < 200"
    ),
    "a13_offsets_distributed": (
        "SELECT CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT) "
        "AS offset, event_id FROM events"
    ),
    "a14_system_columns": (
        "SELECT CAST(row_number() OVER (ORDER BY event_id) + 9 AS BIGINT) AS offset, "
        "CAST(0 AS INTEGER) AS op, "
        "CAST(TIMESTAMP '2023-02-01 00:00:00' AS VARCHAR) AS system_time_str, "
        "CAST(make_timestamp(epoch_ms(ts) * 1000) AS VARCHAR) AS event_time_str, "
        "event_type, value, event_id FROM events WHERE event_id < 100"
    ),
}
