"""Result normalization (reference operators A8–A9).

Reference ``normalize_raw_result`` (``src/engine.rs:329-373``):

- every Timestamp column that is not already ``Timestamp(ms, "UTC")`` is
  cast to it (cross-engine compat — Flink can't read ns event time);
- an ``op`` column typed Int8/UInt8/Int16/UInt16/UInt32 is cast to Int32.

Spark mapping: ``TimestampType`` is session-TZ-based (we pin the session
to UTC) with µs internal precision, so "cast to ms UTC" becomes an
explicit truncation to millisecond precision; ``TimestampNTZType`` (the
naive type) is re-interpreted as UTC exactly like DataFusion's
naive→UTC cast. The Parquet writer is separately pinned to
``TIMESTAMP_MILLIS`` (session.py) so the at-rest type matches the
reference's ``Timestamp(MILLIS, adjusted_to_utc=true)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kamu_engine_datafusion_spark.plans.types import DatasetVocabulary

#: Small integer types the reference coerces to Int32 for the op column
#: (``src/engine.rs:353-358``). Spark has no unsigned types; Byte/Short
#: cover the signed side, and any unsigned source type would already have
#: been widened on read.
_SMALL_INT_TYPES = (T.ByteType, T.ShortType)


def _truncate_to_millis(col: F.Column) -> F.Column:
    """Truncate a TimestampType column to millisecond precision, matching
    the reference's cast to ``Timestamp(Millisecond, UTC)``."""
    return F.timestamp_millis(F.unix_millis(col))


def normalize_raw_result(df: DataFrame, vocab: DatasetVocabulary) -> DataFrame:
    """A8+A9: normalize timestamps to ms-UTC and the op column to Int32.

    Returns ``df`` unchanged when nothing needs normalizing (the
    reference's ``noop`` fast path, ``src/engine.rs:335,365-369``).
    """
    select = []
    noop = True
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.TimestampType):
            # µs-precision values must drop to ms; cheap no-op for data
            # already at ms precision.
            noop = False
            select.append(_truncate_to_millis(c).alias(field.name))
        elif isinstance(field.dataType, T.TimestampNTZType):
            # naive → UTC, then ms (DataFusion casts naive to UTC too).
            noop = False
            select.append(
                _truncate_to_millis(c.cast(T.TimestampType())).alias(field.name)
            )
        elif field.name == vocab.operation_type_column and isinstance(
            field.dataType, _SMALL_INT_TYPES
        ):
            noop = False
            select.append(c.cast(T.IntegerType()).alias(field.name))
        else:
            select.append(c)
    return df if noop else df.select(*select)
