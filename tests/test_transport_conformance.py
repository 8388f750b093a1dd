"""Wire-contract conformance: the HTTP/JSON façade accepts a request
shaped EXACTLY like the reference engine's TransformRequest and answers
with the reference's TransformResponseSuccess shape.

Field inventory pinned to the reference request construction at
``tests/tests/test_transform.rs:239-274``:

TransformRequest:        dataset_id, dataset_alias, system_time,
                         next_offset, vocab, transform, query_inputs,
                         prev_checkpoint_path, new_checkpoint_path,
                         new_data_path
Transform::Sql:          engine, version, query, queries,
                         temporal_tables      (engine reads `queries`;
                         src/engine.rs:139-140)
TransformRequestInput:   dataset_id, dataset_alias, query_alias,
                         offset_interval, vocab, data_paths,
                         schema_file, explicit_watermarks
DatasetVocabulary:       offset_column, operation_type_column,
                         system_time_column, event_time_column
OffsetInterval:          start, end
TransformResponseSuccess: new_offset_interval, new_watermark
                         (src/engine.rs:173-183)
"""

from __future__ import annotations

import json
import urllib.request

import pyarrow.parquet as pq
import pytest

from kamu_engine_datafusion_spark.transport.http_server import serve
from tests.conftest import write_cities_ledger


@pytest.fixture(scope="module")
def server(spark):
    s = serve(spark, port=28842)
    yield "http://127.0.0.1:28842"
    s.shutdown()


def _post(url: str, path: str, body: dict):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _reference_request(ledger: str, out: str, ckpt: str) -> dict:
    """Every field the reference request carries, with the reference
    test's values (tests/tests/test_transform.rs:239-274; data rows from
    :206-233 — the same rows write_cities_ledger pins)."""
    default_vocab = {
        "offset_column": "offset",
        "operation_type_column": "op",
        "system_time_column": "system_time",
        "event_time_column": "event_time",
    }
    return {
        "dataset_id": "did:odf:fed012126262ba49e1ba8392c26f7a39e1ba8d756c7469786d3365200c68402ff65dc",
        "dataset_alias": "bar",
        "system_time": "2023-03-01T00:00:00Z",
        "next_offset": 0,
        "vocab": default_vocab,
        "transform": {
            "engine": "spark",
            "version": None,
            "query": None,
            "queries": [
                {
                    "alias": None,
                    "query": "select event_time, city, population from foo",
                }
            ],
            "temporal_tables": None,
        },
        "query_inputs": [
            {
                "dataset_id": "did:odf:fed0100d72fc7a0d7ced1ff2d47339ed1ff2d47339e1ba8d756c7469786d3365200c6",
                "dataset_alias": "foo",
                "query_alias": "foo",
                "offset_interval": {"start": 0, "end": 2},
                "vocab": default_vocab,
                "data_paths": [ledger],
                "schema_file": ledger,
                "explicit_watermarks": [],
            }
        ],
        "prev_checkpoint_path": None,
        "new_checkpoint_path": ckpt,
        "new_data_path": out,
    }


def test_reference_shaped_request_field_for_field(server, tmp_path):
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    out = str(tmp_path / "new_data.parquet")
    body = _reference_request(ledger, out, str(tmp_path / "checkpoint"))
    status, resp = _post(server, "/execute_transform", body)
    assert status == 200
    # TransformResponseSuccess has exactly these two fields
    assert set(resp.keys()) == {"new_offset_interval", "new_watermark"}
    # reference expectation: Some(OffsetInterval{start: 0, end: 2})
    assert resp["new_offset_interval"] == {"start": 0, "end": 2}
    assert resp["new_watermark"] is None  # no explicit watermarks
    assert pq.ParquetFile(out).metadata.num_rows == 3


def test_reference_shape_multi_step_queries(server, tmp_path):
    """`queries` with intermediate aliases + unnamed final step — the
    shape the reference unwraps at src/engine.rs:139-144."""
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    out = str(tmp_path / "new_data.parquet")
    body = _reference_request(ledger, out, str(tmp_path / "ckpt"))
    body["transform"]["queries"] = [
        {"alias": "stage1", "query": "select * from foo where population > 700000"},
        {"alias": None, "query": "select event_time, city, population from stage1"},
    ]
    status, resp = _post(server, "/execute_transform", body)
    assert status == 200
    assert resp["new_offset_interval"] == {"start": 0, "end": 1}


def test_reference_shape_empty_input(server, tmp_path):
    """Schema-only input (data_paths empty iff offset_interval None —
    the src/engine.rs:193-196 invariant) with zero output rows must
    answer new_offset_interval: None like the reference's empty tick."""
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    out = str(tmp_path / "new_data.parquet")
    body = _reference_request(ledger, out, str(tmp_path / "ckpt"))
    body["query_inputs"][0]["data_paths"] = []
    body["query_inputs"][0]["offset_interval"] = None
    status, resp = _post(server, "/execute_transform", body)
    assert status == 200
    assert resp["new_offset_interval"] is None
    assert resp["new_watermark"] is None


def test_reference_shape_explicit_watermark_propagates(server, tmp_path):
    """new_watermark = min over inputs' explicit watermarks
    (src/engine.rs:313-330)."""
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    out = str(tmp_path / "new_data.parquet")
    body = _reference_request(ledger, out, str(tmp_path / "ckpt"))
    body["query_inputs"][0]["explicit_watermarks"] = [
        {
            "system_time": "2023-01-02T00:00:00Z",
            "event_time": "2023-01-01T00:00:00Z",
        }
    ]
    status, resp = _post(server, "/execute_transform", body)
    assert status == 200
    assert resp["new_watermark"].startswith("2023-01-01")


def test_reference_shape_bare_query_accepted(server, tmp_path):
    """The Transform::Sql DTO allows `query` with `queries: None` (the
    coordinator normally flattens it); accept it directly too."""
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    out = str(tmp_path / "new_data.parquet")
    body = _reference_request(ledger, out, str(tmp_path / "ckpt"))
    body["transform"]["queries"] = None
    body["transform"]["query"] = "select event_time, city, population from foo"
    status, resp = _post(server, "/execute_transform", body)
    assert status == 200
    assert resp["new_offset_interval"] == {"start": 0, "end": 2}
