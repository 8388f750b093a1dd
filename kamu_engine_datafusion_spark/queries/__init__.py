"""Query inventory: one deterministic query per SURVEY.md §2 operator row.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB-equivalent oracle SQL string. Keys are the
stable SURVEY §2 ids (``a4…``, ``b16…``, plus ``x…`` for the
beyond-parity training-data operators).

Determinism rules applied throughout (driver hash-matches values):
- every computed column is aliased identically on both sides;
- double aggregates are rounded (2dp for money sums, 4dp for ratios) so
  summation-order float noise cannot flip the hash;
- integer-typed outputs are cast to BIGINT on both sides (Spark's
  ``length``/``size``/``year`` return int32 where DuckDB returns int64);
- window functions order by a unique key so ranks never tie.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kamu_engine_datafusion_spark.queries import layer_a, layer_b, pipeline
from kamu_engine_datafusion_spark.queries.layer_b import q_b16_groupby_agg

__all__ = ["registry", "oracles", "q_b16_groupby_agg"]


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (layer_a, layer_b, pipeline):
        out.update(mod.QUERIES)
    return out


def oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (layer_a, layer_b, pipeline):
        out.update(mod.ORACLES)
    return out
