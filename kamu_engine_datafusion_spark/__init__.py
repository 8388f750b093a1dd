"""kamu_engine_datafusion_spark — a PySpark-native ODF transform engine.

A brand-new engine with the query and data-processing capabilities of
kamu-data/kamu-engine-datafusion (the Open Data Fabric "Engine" contract
implemented on Apache Arrow DataFusion), re-expressed Spark-first:

- The ODF ledger data model (append-only Parquet datasets carrying
  ``offset`` / ``op`` / ``system_time`` / ``event_time`` system columns
  under a configurable :class:`DatasetVocabulary`).
- ``execute_transform`` / ``execute_raw_query`` entry points matching the
  reference engine's semantics (reference: ``src/engine.rs:127`` and
  ``src/engine.rs:56``), built on Spark SQL temp views + Catalyst.
- The full delegated SQL surface (joins, aggregates, windows, set ops,
  string/regex/crypto/date/array/JSON functions) provided by Spark SQL.
- Beyond-parity large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) under ``operators/``.
"""

from kamu_engine_datafusion_spark.plans.types import (
    DatasetVocabulary,
    ExecuteTransformError,
    InternalError,
    InvalidQueryError,
    OffsetInterval,
    RawQueryRequest,
    RawQueryResponse,
    SqlQueryStep,
    TransformRequest,
    TransformRequestInput,
    TransformResponse,
    Watermark,
)
from kamu_engine_datafusion_spark.plans.transform import (
    Engine,
    execute_raw_query,
    execute_transform,
)
from kamu_engine_datafusion_spark.session import odf_session, tune_session

__all__ = [
    "DatasetVocabulary",
    "Engine",
    "ExecuteTransformError",
    "InternalError",
    "InvalidQueryError",
    "OffsetInterval",
    "RawQueryRequest",
    "RawQueryResponse",
    "SqlQueryStep",
    "TransformRequest",
    "TransformRequestInput",
    "TransformResponse",
    "Watermark",
    "execute_raw_query",
    "execute_transform",
    "odf_session",
    "tune_session",
]
