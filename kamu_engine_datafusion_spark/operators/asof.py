"""Distributed as-of (temporal) join.

The reference engine has NO as-of join — its DTO carries a
``temporal_tables`` field that is always ignored, and the README defers
temporal joins to the Flink engine (reference
``tests/tests/test_transform.rs:252``, ``README.md:18``). This is the
beyond-parity Spark-native implementation.

Algorithm (the classic single-shuffle union trick, vs. the naive
range-join which explodes to O(left × right) per key):

1. tag right rows (0) and left rows (1), union by the common columns;
2. one shuffle: window partitioned by key, ordered by (ts, tag, ...);
3. ``last(right_value, ignorenulls=True)`` carried forward gives every
   left row the most recent right row with ``right.ts <= left.ts``;
4. filter back to left rows.

At scale this is one hash shuffle on the join key and a per-key sort —
the same cost as a regular sort-merge join, with no range blow-up. Skewed
keys behave like any skewed window (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the columns of the latest right row with
    the same key and ``right.ts_col <= left.ts_col``.

    ``how='inner'`` drops left rows with no prior right row;
    ``how='left'`` keeps them with nulls (DuckDB ``ASOF [LEFT] JOIN``
    semantics).
    """
    lhs = left.select(
        *key_cols,
        ts_col,
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
    )
    rhs = right.select(
        *key_cols,
        ts_col,
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__left_row"].dataType).alias("__left_row"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    unioned = lhs.unionByName(rhs)

    # Right rows (tag 0) sort before left rows at equal ts, so an exact
    # ts tie matches (<= semantics, like ASOF JOIN ON l.ts >= r.ts).
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__carried_{c}")
            for c in right_value_cols
        ],
    ).filter(F.col("__is_left") == 1)

    out = carried.select(
        F.col("__left_row.*"),
        *[F.col(f"__carried_{c}").alias(f"right_{c}") for c in right_value_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"right_{right_value_cols[0]}").isNotNull())
    return out
