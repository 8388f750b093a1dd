"""Dataset profiling: per-column statistics in one pass.

The ANALYZE-TABLE equivalent a pipeline runs before choosing dedup
blocks, sampling rates, or join strategies. Long-format output — one
row per profiled column — computed with a single unpivot + aggregate:
the table is scanned ONCE regardless of column count (vs one job per
column), and the shuffle carries only per-column partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile numeric columns: row count, nulls, exact distinct count,
    min, max — one row per column, one scan total.

    Returns ``(column, n_rows, n_nulls, n_distinct, min_val, max_val)``
    with values as doubles. Use ``approx_count_distinct`` upstream of
    this for quick-look profiling at extreme scale; exact distinct is
    the default because profiles feed correctness-sensitive decisions
    (e.g. join-key uniqueness checks).
    """
    unpivoted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("double").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.val")
    return unpivoted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count_distinct(F.col("val")).cast("long").alias("n_distinct"),
        # exact extrema: presentation/compare layers own any rounding
        # (cross-engine hash canonicalization lives in the query layer)
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
