"""Golden end-to-end transform tests mirroring the reference's
``tests/tests/test_transform.rs`` (13 scenarios, SURVEY.md §5).

Each test runs the full public pipeline — ledger parquet in, single
parquet file out — and asserts rows, physical Parquet schema, encodings,
and structured response values, exactly like the reference's
``test_query_common`` harness (``tests/tests/test_transform.rs:168-308``).
"""

from __future__ import annotations

from datetime import date, datetime, timezone

import pyarrow.parquet as pq
import pytest

from kamu_engine_datafusion_spark import (
    DatasetVocabulary,
    InvalidQueryError,
    OffsetInterval,
    SqlQueryStep,
    TransformRequest,
    TransformRequestInput,
    Watermark,
    execute_transform,
)
from tests.conftest import SYSTEM_TIME, T0, UTC, write_cities_ledger

DEFAULT_QUERY = (
    "select event_time, city, population + 100 as population from foo"
)


def make_request(
    tmp_path,
    query=DEFAULT_QUERY,
    steps=None,
    rows=None,
    ops=None,
    next_offset=0,
    offset_interval=None,
    watermarks=(),
    empty_input=False,
    vocab=None,
):
    """≅ reference test harness (``tests/tests/test_transform.rs:239-274``)."""
    ledger = write_cities_ledger(str(tmp_path / "cities.parquet"), rows, ops)
    n = pq.ParquetFile(ledger).metadata.num_rows
    if steps is None:
        steps = [SqlQueryStep(query=query)]
    inp = TransformRequestInput(
        dataset_alias="foo",
        query_alias="foo",
        schema_file=ledger,
        data_paths=[] if empty_input else [ledger],
        offset_interval=None
        if empty_input
        else (offset_interval or OffsetInterval(0, n - 1)),
        explicit_watermarks=list(watermarks),
    )
    return TransformRequest(
        dataset_alias="bar",
        system_time=SYSTEM_TIME,
        next_offset=next_offset,
        vocab=vocab or DatasetVocabulary(),
        transform=steps,
        inputs=[inp],
        new_data_path=str(tmp_path / "result.parquet"),
    )


def run(spark, req):
    resp = execute_transform(spark, req)
    out = pq.read_table(req.new_data_path)
    return resp, out


def test_result_schema_and_rows(spark, tmp_path):
    """≅ test_transform_result_schema (``test_transform.rs:312-330``)."""
    resp, out = run(spark, make_request(tmp_path))
    s = out.schema
    assert s.names == ["offset", "op", "system_time", "event_time", "city", "population"]
    assert str(s.field("offset").type) == "int64"
    assert str(s.field("op").type) == "int32"
    assert str(s.field("system_time").type) == "timestamp[ms, tz=UTC]"
    assert str(s.field("event_time").type) == "timestamp[ms, tz=UTC]"
    d = out.to_pydict()
    assert d["offset"] == [0, 1, 2]
    assert d["op"] == [0, 0, 0]
    assert d["city"] == ["vancouver", "seattle", "kyiv"]
    assert d["population"] == [675100, 733100, 2884100]
    assert all(t == SYSTEM_TIME for t in d["system_time"])
    assert all(t == T0 for t in d["event_time"])
    assert resp.new_offset_interval == OffsetInterval(0, 2)


def test_parquet_encodings(spark, tmp_path):
    """≅ test_transform_result_encoding (``test_transform.rs:334-395``):
    op and system_time must come out dictionary-encoded; snappy."""
    _, _ = run(spark, make_request(tmp_path))
    pf = pq.ParquetFile(str(tmp_path / "result.parquet"))
    rg = pf.metadata.row_group(0)
    cols = {rg.column(i).path_in_schema: rg.column(i) for i in range(rg.num_columns)}
    for name in ("op", "system_time"):
        assert any("DICTIONARY" in e for e in cols[name].encodings), (
            name,
            cols[name].encodings,
        )
        # v1 dictionary pages announce themselves as PLAIN_DICTIONARY
        # (RLE_DICTIONARY is the v2 spelling) — asserting the exact
        # encoding pins the writer-version parity too
        assert "PLAIN_DICTIONARY" in cols[name].encodings, cols[name].encodings
    assert cols["offset"].compression == "SNAPPY"
    # format-version parity with the reference's pinned writer v1
    # (src/engine.rs:568-572, asserted in test_transform.rs:349-391)
    assert pf.metadata.format_version == "1.0"


def test_multi_step_query(spark, tmp_path):
    """≅ test_transform_chained_queries (``test_transform.rs:399-427``)."""
    steps = [
        SqlQueryStep(
            query="select event_time, city, population + 100 as population from foo",
            alias="a",
        ),
        SqlQueryStep(
            query="select event_time, city, population + 50 as population from a"
        ),
    ]
    _, out = run(spark, make_request(tmp_path, steps=steps))
    assert out.to_pydict()["population"] == [675150, 733150, 2884150]


def test_watermark_propagation(spark, tmp_path):
    """≅ test_transform_watermark (``test_transform.rs:431-459``): output
    watermark = min over inputs of max explicit watermark."""
    wm_early = Watermark(SYSTEM_TIME, datetime(2023, 1, 2, tzinfo=UTC))
    wm_late = Watermark(SYSTEM_TIME, datetime(2023, 1, 5, tzinfo=UTC))
    resp, _ = run(spark, make_request(tmp_path, watermarks=[wm_early, wm_late]))
    assert resp.new_watermark == datetime(2023, 1, 5, tzinfo=UTC)


def test_empty_result(spark, tmp_path):
    """≅ test_transform_empty_result (``test_transform.rs:463-483``)."""
    resp, out = run(
        spark,
        make_request(
            tmp_path,
            query="select event_time, city, population from foo where city = 'mumbai'",
        ),
    )
    assert out.num_rows == 0
    assert resp.new_offset_interval is None
    # schema of the empty file still carries the system columns
    assert out.schema.names[:4] == ["offset", "op", "system_time", "event_time"]


def test_empty_input(spark, tmp_path):
    """≅ test_transform_empty_input (``test_transform.rs:487-508``):
    schema-only input → empty but correctly-typed table."""
    resp, out = run(spark, make_request(tmp_path, empty_input=True))
    assert out.num_rows == 0
    assert resp.new_offset_interval is None


def test_partial_offset_interval(spark, tmp_path):
    """≅ test_transform_partial_input (``test_transform.rs:512-540``)."""
    _, out = run(
        spark, make_request(tmp_path, offset_interval=OffsetInterval(1, 2))
    )
    d = out.to_pydict()
    assert d["city"] == ["seattle", "kyiv"]
    assert d["offset"] == [0, 1]  # offsets restart from next_offset


def test_nonzero_start_offset(spark, tmp_path):
    """≅ test_transform_non_zero_offset (``test_transform.rs:544-574``)."""
    resp, out = run(spark, make_request(tmp_path, next_offset=10))
    assert out.to_pydict()["offset"] == [10, 11, 12]
    assert resp.new_offset_interval == OffsetInterval(10, 12)


def test_invalid_sql_is_structured_error(spark, tmp_path):
    """≅ test_transform_bad_sql (``test_transform.rs:578-592``)."""
    with pytest.raises(InvalidQueryError):
        execute_transform(
            spark, make_request(tmp_path, query="select event_time bogus from")
        )


def test_event_time_as_date(spark, tmp_path):
    """≅ test_transform_event_time_as_date (``test_transform.rs:596-618``)."""
    _, out = run(
        spark,
        make_request(
            tmp_path,
            query="select cast(event_time as date) as event_time, city, population from foo",
        ),
    )
    assert str(out.schema.field("event_time").type) == "date32[day]"
    assert out.to_pydict()["event_time"] == [date(2023, 1, 1)] * 3


def test_invalid_event_time_type(spark, tmp_path):
    """≅ test_transform_event_time_as_invalid_type (``test_transform.rs:622-636``)."""
    with pytest.raises(InvalidQueryError, match="[Ee]vent time"):
        execute_transform(
            spark,
            make_request(
                tmp_path,
                query="select population as event_time, city from foo",
            ),
        )


def test_system_column_conflict(spark, tmp_path):
    """A10: query must not emit engine-assigned columns
    (``src/engine.rs:375-392``)."""
    with pytest.raises(InvalidQueryError, match="conflicts"):
        execute_transform(
            spark,
            make_request(
                tmp_path,
                query="select event_time, city, population as offset from foo",
            ),
        )


def test_op_type_validation(spark, tmp_path):
    """A11: op column must be Int32 (``src/engine.rs:394-413``)."""
    with pytest.raises(InvalidQueryError, match="[Oo]peration type"):
        execute_transform(
            spark,
            make_request(
                tmp_path,
                query="select event_time, city, cast(1 as bigint) as op from foo",
            ),
        )


def test_timestamp_coercion_to_millis(spark, tmp_path):
    """≅ test_transform_with_ts_coercion (``test_transform.rs:640-682``):
    µs-precision timestamps in the query output come back as ms UTC."""
    _, out = run(
        spark,
        make_request(
            tmp_path,
            query=(
                "select event_time + INTERVAL '0.001234' SECOND as event_time, "
                "city, population from foo"
            ),
        ),
    )
    assert str(out.schema.field("event_time").type) == "timestamp[ms, tz=UTC]"
    # 1234µs truncates to 1ms
    assert out.to_pydict()["event_time"][0] == datetime(
        2023, 1, 1, 0, 0, 0, 1000, tzinfo=UTC
    )


def test_case_sensitive_identifiers(spark, tmp_path):
    """≅ test_transform_case_sensitivity (``test_transform.rs:686-719``):
    mixed-case aliases survive to the output Parquet schema."""
    _, out = run(
        spark,
        make_request(
            tmp_path,
            query=(
                'select event_time, city as City, population as PoPuLaTiOn from foo'
            ),
        ),
    )
    assert out.schema.names == [
        "offset",
        "op",
        "system_time",
        "event_time",
        "City",
        "PoPuLaTiOn",
    ]


def test_json_functions(spark, tmp_path):
    """≅ test_transform_json_functions (``test_transform.rs:723-756``)."""
    _, out = run(
        spark,
        make_request(
            tmp_path,
            query=(
                "select event_time, "
                "cast(get_json_object('{\"foo\": 123}', '$.foo') as int) as value "
                "from foo"
            ),
        ),
    )
    assert out.to_pydict()["value"] == [123, 123, 123]


def test_retraction_correction_passthrough(spark, tmp_path):
    """≅ test_transform_carries_op_column (``test_transform.rs:760-818``):
    user-selected op values pass through untouched."""
    rows = [("vancouver", 1), ("vancouver", 1), ("vancouver", 2), ("seattle", 3)]
    ops = [0, 2, 3, 1]
    _, out = run(
        spark,
        make_request(
            tmp_path,
            rows=rows,
            ops=ops,
            query="select op, event_time, city, population from foo",
        ),
    )
    assert out.to_pydict()["op"] == [0, 2, 3, 1]


def test_custom_vocabulary(spark, tmp_path):
    """Vocabulary renames the system columns end-to-end
    (``tests/tests/test_regressions.rs:127-132`` constructs a custom vocab)."""
    vocab = DatasetVocabulary(
        offset_column="row_id",
        operation_type_column="action",
        system_time_column="ingested_at",
        event_time_column="event_time",
    )
    req = make_request(tmp_path, vocab=vocab)
    resp, out = run(spark, req)
    assert out.schema.names[:4] == ["row_id", "action", "ingested_at", "event_time"]
    assert resp.new_offset_interval == OffsetInterval(0, 2)
