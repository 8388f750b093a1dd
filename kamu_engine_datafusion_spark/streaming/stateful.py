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


_DEBOUNCE_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)
_DEBOUNCE_STATE = T.StructType([T.StructField("anchor_us", T.LongType())])


def debounce_stream(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    gap_seconds: float = 600.0,
) -> DataFrame:
    """ANCHOR-based streaming debounce — the stateful twin of the batch
    ``operators/funnel.py::debounce_events``: an event is emitted only
    if it arrives more than ``gap_seconds`` after the last EMITTED
    (anchor) event of its key, and every emission advances the anchor.
    Unlike the batch lag form (gap vs the previous RAW event), a long
    slow-drip burst whose inter-event gaps all stay under the threshold
    collapses to ONE event per gap window — the semantics that need a
    running fold, which is exactly what per-key ``GroupState`` carries
    across micro-batches.

    State: one i64 (the anchor timestamp) per key — constant size, no
    growth with history. Events inside a batch are processed in
    ``(time, id)`` order so replays are deterministic.

    Scale: state store partitioned by key hash; each micro-batch
    touches only the keys present in it.
    """

    def fn(key, batches, state: GroupState):
        anchor = state.get[0] if state.exists else None
        rows_id, rows_ts = [], []
        pdfs = [pdf for pdf in batches if len(pdf)]
        if pdfs:
            both = pd.concat(pdfs).sort_values(["__ts_us", "__id"])
            gap_us = int(gap_seconds * 1_000_000)
            for ts_us, eid in zip(both["__ts_us"], both["__id"]):
                if anchor is None or ts_us - anchor > gap_us:
                    rows_id.append(int(eid))
                    rows_ts.append(int(ts_us))
                    anchor = int(ts_us)
        if anchor is not None:
            state.update((int(anchor),))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(rows_id),
                "event_id": rows_id,
                "ts_us": rows_ts,
            }
        )

    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.unix_micros(F.col(time_col).cast("timestamp")).alias("__ts_us"),
        F.col(id_col).cast("long").alias("__id"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        fn,
        _DEBOUNCE_OUTPUT,
        _DEBOUNCE_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
