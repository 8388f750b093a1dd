"""Output-contract validation (reference operators A10–A12).

Mirrors ``validate_raw_result`` (``src/engine.rs:375-473``): structured
:class:`InvalidQueryError` (never a crash) when the user query's output

- contains a column that collides with an engine-assigned system column
  (``offset`` / ``system_time``),
- has an ``op`` column that is not exactly Int32,
- lacks an ``event_time`` column, or has one that is neither Date nor a
  UTC timestamp.

Spark note: validation runs after normalization, which (like the
reference) has already rewritten naive timestamps to UTC — so the
naive-timestamp branch exists for contract completeness and fires only
if validation is invoked standalone on a ``TIMESTAMP_NTZ`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from kamu_engine_datafusion_spark.plans.types import (
    DatasetVocabulary,
    InvalidQueryError,
)


def validate_raw_result(df: DataFrame, vocab: DatasetVocabulary) -> None:
    """A10+A11+A12: enforce the transform output contract; raises
    :class:`InvalidQueryError` on violation."""
    schema = df.schema
    names = [f.name for f in schema.fields]

    # A10: engine-assigned columns must not already exist
    # (src/engine.rs:375-392)
    for system_column in (vocab.offset_column, vocab.system_time_column):
        if system_column in names:
            raise InvalidQueryError(
                "Transformed data contains a column that conflicts with the "
                "system column name, you should either rename the data column "
                "or configure the dataset vocabulary to use a different name: "
                f"{system_column}"
            )

    # A11: op column, if present, must be Int32 (src/engine.rs:394-413)
    if vocab.operation_type_column in names:
        dt = schema[vocab.operation_type_column].dataType
        if not isinstance(dt, T.IntegerType):
            raise InvalidQueryError(
                f"Operation type column '{vocab.operation_type_column}' should "
                f"be Int32, but found: {dt.simpleString()}"
            )

    # A12: event_time must exist and be Date or UTC Timestamp
    # (src/engine.rs:415-473)
    if vocab.event_time_column not in names:
        raise InvalidQueryError(
            f"Event time column {vocab.event_time_column} was not found "
            f"amongst: {', '.join(names)}"
        )
    dt = schema[vocab.event_time_column].dataType
    if isinstance(dt, (T.DateType, T.TimestampType)):
        pass  # TimestampType is session-TZ (pinned UTC) — the UTC case
    elif isinstance(dt, T.TimestampNTZType):
        raise InvalidQueryError(
            f"Event time column '{vocab.event_time_column}' should be "
            "adjusted to UTC, but local/naive timestamp found"
        )
    else:
        raise InvalidQueryError(
            f"Event time column '{vocab.event_time_column}' should be either "
            f"Date or Timestamp, but found: {dt.simpleString()}"
        )
