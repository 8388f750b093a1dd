"""Ingest path: external files → preprocessing SQL → ODF ledger append.

In the reference deployment, ingest preprocessing runs through the
engine's raw-query entry point after the coordinator fetches/decodes the
source (``src/engine.rs:56`` — the coordinator hands it parquet). This
module provides the whole library-side ingest loop: read CSV / NDJSON /
parquet sources, apply optional preprocessing SQL, then append to a
ledger with correct continuing offsets and system columns.

Scale: readers take explicit schemas (inference is a full extra pass —
fine locally, wrong at 100 TB); the append reuses the transform path's
system-column machinery, so offsets/encodings match engine output
exactly.
"""

from __future__ import annotations

import glob
import os
from datetime import datetime

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kamu_engine_datafusion_spark.operators.normalize import normalize_raw_result
from kamu_engine_datafusion_spark.operators.system_columns import with_system_columns
from kamu_engine_datafusion_spark.operators.validate import validate_raw_result
from kamu_engine_datafusion_spark.plans.transform import run_transform_steps
from kamu_engine_datafusion_spark.plans.types import (
    DatasetVocabulary,
    SqlQueryStep,
)
from kamu_engine_datafusion_spark.sources.sink import write_parquet_single_file


def read_csv_source(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV source (schema strongly recommended — inference double-scans)."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(paths)


def read_ndjson_source(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Newline-delimited JSON source."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(paths)


def read_orc_source(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """ORC source (columnar, self-describing — schema optional; pass one
    to pin types when files disagree)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(paths)


def _ledger_next_offset(ledger_dir: str) -> int:
    """Offsets are dense from 0, so the next offset is the row total
    (footer metadata only — no data pages read)."""
    parts = sorted(glob.glob(os.path.join(ledger_dir, "*.parquet")))
    return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)


def ingest_batch(
    spark: SparkSession,
    source: DataFrame,
    ledger_dir: str,
    system_time: datetime,
    preprocess: list[SqlQueryStep] | None = None,
    vocab: DatasetVocabulary | None = None,
    part_filename: str | None = None,
) -> int:
    """Append one ingest batch to a ledger: optional preprocessing SQL
    (source registered as ``input``), then the engine's own
    normalize → validate → system-columns → single-file append, with
    offsets continuing from the ledger's current tail.

    ``part_filename`` overrides the auto-numbered part name — callers
    that need idempotent replay (the streaming sink) pass a name derived
    from their batch id so a crashed attempt can be identified and
    rolled back.

    Returns the number of records appended.
    """
    vocab = vocab or DatasetVocabulary()
    session = spark
    if preprocess:
        source.createOrReplaceTempView("input")
        df = run_transform_steps(session, preprocess)
    else:
        df = source

    df = normalize_raw_result(df, vocab)
    validate_raw_result(df, vocab)

    os.makedirs(ledger_dir, exist_ok=True)
    next_offset = _ledger_next_offset(ledger_dir)
    df = with_system_columns(df, vocab, system_time, next_offset)
    n_existing = len(glob.glob(os.path.join(ledger_dir, "*.parquet")))
    out = os.path.join(
        ledger_dir, part_filename or f"part-{n_existing:05d}.parquet"
    )
    return write_parquet_single_file(df, out)
