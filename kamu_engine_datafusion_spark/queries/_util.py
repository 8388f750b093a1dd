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
    recovers the exact micro-unit integer on both sides, and the final
    cast-to-double division is identical. The per-row value is a LONG
    (cheap exact extraction); the ACCUMULATOR is DECIMAL(20,0) — Spark
    sums it as DECIMAL(30,0), so group totals keep exact integer
    semantics up to 1e30 micro-units where a raw long sum would wrap
    silently past ~9.2e18 (≈9.2e12 currency units per group — reachable
    at large scale factors). DuckDB's BIGINT SUM already accumulates in
    HUGEINT, so the oracle needs no decimal cast. Oracle-side equivalent:
    ``CAST(SUM(CAST(round((x)*1000000) AS BIGINT)) AS DOUBLE)/1000000.0``.
    """
    micro = F.round(col * 1e6).cast("long").cast("decimal(20,0)")
    return (F.sum(micro).cast("double") / F.lit(1e6)).alias(alias)
