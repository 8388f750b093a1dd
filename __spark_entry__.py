"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kamu_engine_datafusion_spark``; the query
inventory (one entry per SURVEY.md §2 operator row) is in
``kamu_engine_datafusion_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kamu_engine_datafusion_spark import queries as _q
from kamu_engine_datafusion_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-alike pricing
    summary (B1/B2/B5/B16/B26 in one plan)."""
    tune_session(spark)
    return _q.q_b16_groupby_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (omitted for
    non-SQL-expressible ops → driver records rows-only check)."""
    return _q.oracles()
