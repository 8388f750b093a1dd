"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics Spark's built-in streaming aggregations can't express
(custom accumulators, decay logic, per-key models), the supported shape
is a grouped Pandas function with explicit per-key state. This module
provides a production-shaped example — a running per-key counter with
sum — demonstrating the full plumbing: state schema, Arrow batch
iteration, update-mode emission.

Scale: state lives in the state store partitioned by key (uniform hash
→ no skew from the operator itself); each micro-batch touches only the
keys present in the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Stateful running (count, sum) per key across micro-batches.

    Emits one updated row per key per batch (update semantics) — the
    minimal custom-state operator shape to copy for richer logic.
    """

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream.selectExpr(f"{key_col} AS key", f"{value_col} AS {value_col}")
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            _OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
