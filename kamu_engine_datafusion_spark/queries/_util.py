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
    """Deterministic money-sum: sum in exact decimal, emit double.

    ``SUM`` over doubles is order-dependent in the last bits, and
    ``round()`` half-way behavior differs between engines — but the
    underlying values here are exact 2-to-6-decimal quantities, so
    summing them as DECIMAL(27,6) is exact in both Spark and DuckDB and
    the final decimal→double conversion is identical. Oracle-side
    equivalent: ``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)``.
    """
    return F.sum(col.cast("decimal(27,6)")).cast("double").alias(alias)
