"""Shared helpers for the query inventory."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kamu_engine_datafusion_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    """Load the requested testdata tables and register each as a temp view
    under its bare name (so both DataFrame- and SQL-style queries work)."""
    tune_session(spark)
    dfs: dict[str, DataFrame] = {}
    for t in tables or TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        # events.ts is TIMESTAMP(NANOS) at rest; with nanosAsLong it reads
        # as a nanosecond long — convert to a µs TimestampType (same
        # truncation DuckDB applies reading nanos).
        if t == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        df.createOrReplaceTempView(t)
        dfs[t] = df
    return dfs


def dsum(col: F.Column, alias: str) -> F.Column:
    """Deterministic money-sum: exact integer micro-unit summation, emit
    double.

    ``SUM`` over doubles is order-dependent in the last bits, and
    ``round()`` half-way behavior differs between engines — but the
    underlying values here are exact ≤6-decimal quantities (or IEEE
    products of such, identical on any engine), so ``round(x*1e6)``
    recovers the exact micro-unit integer on both sides, longs sum
    associatively in whole-stage codegen (measured ~1.9× faster than
    the DECIMAL(27,6) formulation this replaces), and the final
    long→double division is identical. Oracle-side equivalent:
    ``CAST(SUM(CAST(round((x)*1000000) AS BIGINT)) AS DOUBLE)/1000000.0``.
    """
    return (F.sum(F.round(col * 1e6).cast("long")) / F.lit(1e6)).alias(alias)
