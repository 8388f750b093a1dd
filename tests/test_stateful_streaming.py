"""Custom stateful operator: per-key running totals across micro-batches."""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from kamu_engine_datafusion_spark.streaming.stateful import running_totals
from kamu_engine_datafusion_spark.streaming.structured import ledger_stream

UTC = timezone.utc


def _write_events(path: str, rows: list[tuple[int, float]]) -> None:
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "ts": pa.array(
                [datetime(2023, 1, 1, tzinfo=UTC)] * len(rows),
                pa.timestamp("ms", "UTC"),
            ),
        }
    )
    pq.write_table(tbl, path)


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    # two part files -> two micro-batches (maxFilesPerTrigger=1)
    _write_events(str(d / "part-0.parquet"), [(1, 10.0), (1, 5.0), (2, 1.0)])
    _write_events(str(d / "part-1.parquet"), [(1, 2.0), (3, 7.0)])
    schema = spark.read.parquet(str(d / "part-0.parquet")).schema

    stream = ledger_stream(spark, str(d), schema)
    out = running_totals(stream, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("running").collect()
    # last emission per key reflects the accumulated state
    latest = {}
    for r in rows:
        latest[r["key"]] = (r["n_events"], r["total_value"])
    assert latest[1] == (3, 17.0)  # 2 rows batch-1 + 1 row batch-2
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)
