"""Regression tests mirroring the reference's
``tests/tests/test_regressions.rs`` — fixture shapes synthesized per
FIXTURES.md (F2-F4), exercising the same upstream-bug scenarios:

1. UNION ALL over schema-divergent inputs + write/read round-trip
   (datafusion-issue-6463 shape).
2. ms-precision UTC timestamps surviving a read round-trip of a
   Spark-written file (arrow-issue-4308 shape).
3. Full transform with a separate schema file, offset interval, and
   explicit watermark (datafusion-issue-14281 shape).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from kamu_engine_datafusion_spark import (
    DatasetVocabulary,
    OffsetInterval,
    RawQueryRequest,
    SqlQueryStep,
    TransformRequest,
    TransformRequestInput,
    Watermark,
    execute_raw_query,
    execute_transform,
)

UTC = timezone.utc


def _covid_table(ids_type, gender_nullable: bool, n: int, start_id: int):
    """F3 schema: deliberately divergent across 'provinces'
    (id Int64 vs Int32, gender nullability)."""
    return pa.table(
        {
            "offset": pa.array(range(n), pa.int64()),
            "system_time": pa.array(
                [datetime(2023, 1, 1, tzinfo=UTC)] * n, pa.timestamp("ns", "UTC")
            ),
            "reported_date": pa.array(
                [datetime(2022, 6, 1 + i, tzinfo=UTC) for i in range(n)],
                pa.timestamp("ns", "UTC"),
            ),
            "id": pa.array(range(start_id, start_id + n), ids_type),
            "gender": pa.array(
                ["M" if i % 2 else "F" for i in range(n)], pa.string()
            ),
            "location": pa.array([f"loc{i}" for i in range(n)]),
        }
    )


def test_union_all_schema_divergent_roundtrip(spark, tmp_path):
    """≅ test_regressions.rs:12-77: literal-tagged UNION ALL across inputs
    whose schemas diverge (Int64 vs Int32 id), written and read back."""
    ab = str(tmp_path / "alberta.parquet")
    bc = str(tmp_path / "bc.parquet")
    pq.write_table(_covid_table(pa.int64(), False, 10, 0), ab)
    pq.write_table(_covid_table(pa.int32(), True, 10, 100), bc)

    out = str(tmp_path / "merged.parquet")
    resp = execute_raw_query(
        spark,
        RawQueryRequest(
            input_data_paths=[ab],
            transform=[
                SqlQueryStep(
                    query=(
                        "SELECT * FROM ("
                        " SELECT 'AB' as province, id, gender, location FROM input"
                        ") UNION ALL SELECT * FROM ("
                        " SELECT 'AB2' as province, cast(id as bigint) as id, "
                        "        gender, location FROM input)"
                    )
                )
            ],
            output_data_path=out,
        ),
    )
    assert resp.num_records == 20
    t = pq.read_table(out)
    assert t.num_rows == 20
    assert str(t.schema.field("id").type) == "int64"  # upcast survives round-trip


def test_ms_utc_timestamp_roundtrip(spark, tmp_path):
    """≅ test_regressions.rs:83-104: Timestamp(ms, UTC) must load back as
    ms-UTC after a Spark write (the original bug: ns inference)."""
    src = str(tmp_path / "data.parquet")
    tbl = pa.table(
        {
            "offset": pa.array([0, 1], pa.int64()),
            "system_time": pa.array(
                [datetime(2021, 1, 1, tzinfo=UTC)] * 2, pa.timestamp("ms", "UTC")
            ),
            "date_reported": pa.array(
                [datetime(2020, 3, 1, tzinfo=UTC), datetime(2020, 3, 2, tzinfo=UTC)],
                pa.timestamp("ms", "UTC"),
            ),
            "id": pa.array([1, 2], pa.int64()),
        }
    )
    pq.write_table(tbl, src)

    out = str(tmp_path / "copy.parquet")
    execute_raw_query(
        spark,
        RawQueryRequest(
            input_data_paths=[src],
            transform=[SqlQueryStep(query="SELECT * FROM input")],
            output_data_path=out,
        ),
    )
    s = pq.ParquetFile(out).schema_arrow
    assert str(s.field("system_time").type) == "timestamp[ms, tz=UTC]"
    assert str(s.field("date_reported").type) == "timestamp[ms, tz=UTC]"


def test_transform_with_separate_schema_file(spark, tmp_path):
    """≅ test_regressions.rs:110-183 (F2): data file + separate 0-row
    schema file, offset interval 0..2, explicit watermark, cast in query."""
    vocab = DatasetVocabulary()
    n = 3
    data = pa.table(
        {
            "offset": pa.array(range(n), pa.int64()),
            "op": pa.array([0] * n, pa.int32()),
            "system_time": pa.array(
                [datetime(2023, 1, 1, tzinfo=UTC)] * n, pa.timestamp("ms", "UTC")
            ),
            "event_time": pa.array(
                [datetime(2023, 1, 1, tzinfo=UTC)] * n, pa.timestamp("ms", "UTC")
            ),
            "city": pa.array(["a", "b", "c"]),
            "population": pa.array([1, 2, 3], pa.int32()),
        }
    )
    data_path = str(tmp_path / "data.parquet")
    schema_path = str(tmp_path / "schema.parquet")
    pq.write_table(data, data_path)
    pq.write_table(data.slice(0, 0), schema_path)

    out = str(tmp_path / "out.parquet")
    resp = execute_transform(
        spark,
        TransformRequest(
            dataset_alias="x10",
            system_time=datetime(2023, 2, 1, tzinfo=UTC),
            next_offset=0,
            vocab=vocab,
            transform=[
                SqlQueryStep(
                    query=(
                        "SELECT op, event_time, city, "
                        "cast(population * 10 as int) as population_x10 FROM root"
                    )
                )
            ],
            inputs=[
                TransformRequestInput(
                    dataset_alias="root",
                    query_alias="root",
                    schema_file=schema_path,
                    data_paths=[data_path],
                    offset_interval=OffsetInterval(0, 2),
                    vocab=vocab,
                    explicit_watermarks=[
                        Watermark(
                            system_time=datetime(2023, 1, 2, tzinfo=UTC),
                            event_time=datetime(2023, 1, 1, tzinfo=UTC),
                        )
                    ],
                )
            ],
            new_data_path=out,
        ),
    )
    assert resp.new_offset_interval == OffsetInterval(0, 2)
    assert resp.new_watermark == datetime(2023, 1, 1, tzinfo=UTC)
    d = pq.read_table(out).to_pydict()
    assert d["population_x10"] == [10, 20, 30]
    assert d["op"] == [0, 0, 0]
