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


# ---------------------------------------------------------------------------
# Golden wire bytes
#
# Pins the EXACT FlatBuffers bytes of one canonical TransformRequest and
# one TransformResponse(Success) so that any change to LAYOUTS' slot
# numbers or the response-union tag values (which are INFERRED from the
# reference DTO field order — the authoritative .fbs lives in the
# unvendored kamu-cli crate, unreachable offline) shows up as a VISIBLE
# fixture diff, never a silent wire change. Slot map under test
# (transport/odf_flatbuffers.py LAYOUTS):
#   TransformRequest: 0 dataset_id, 1 dataset_alias, 2 system_time,
#     3 vocab, 4 transform, 5 query_inputs, 6 next_offset,
#     7 new_checkpoint_path, 8 new_data_path
#   TransformRequestInput: 0 dataset_id, 1 dataset_alias, 2 query_alias,
#     3 vocab, 4 offset_interval, 5 data_paths, 6 schema_file,
#     7 explicit_watermarks
#   DatasetVocabulary: 0 offset, 1 op, 2 system_time, 3 event_time cols
#   TransformSql: 0 engine, 1 version, 2 query, 3 queries
#   SqlQueryStep: 0 query, 1 alias;  OffsetInterval: 0 start, 1 end
#   Response union tags: 1 Progress, 2 Success, 3 InvalidQuery,
#     4 InternalError
# ---------------------------------------------------------------------------

_GOLDEN_REQUEST = {
    "dataset_id": "did:odf:fed016b61",
    "dataset_alias": "golden",
    "system_time": "2024-01-02T03:04:05Z",
    "next_offset": 10,
    "vocab": {
        "offset_column": "offset",
        "operation_type_column": "op",
        "system_time_column": "system_time",
        "event_time_column": "event_time",
    },
    "transform": {
        "engine": "spark",
        "queries": [{"query": "select 1 as x", "alias": "step"}],
    },
    "query_inputs": [
        {
            "dataset_id": "did:odf:fed0142aa",
            "dataset_alias": "in",
            "query_alias": "in",
            "offset_interval": {"start": 0, "end": 4},
            "vocab": {
                "offset_column": "offset",
                "operation_type_column": "op",
                "system_time_column": "system_time",
                "event_time_column": "event_time",
            },
            "data_paths": ["/data/p0.parquet"],
            "schema_file": "/data/p0.parquet",
            "explicit_watermarks": [],
        }
    ],
    "new_checkpoint_path": "/ckpt",
    "new_data_path": "/out.parquet",
}

_GOLDEN_REQUEST_HEX = (
    "200000001800340018001c000800200024002800100000002c00300000000000"
    "1c0000000000000088d820c88c0100000a000000000000001c00000030000000"
    "48000000640000006c0000007000000078000000110000006469643a6f64663a"
    "66656430313662363100000006000000676f6c64656e00000c00140004000800"
    "0c001000000000001000000050000000580000005c000000680000000c000c00"
    "04000000000008000c000000640000006c000000010000008000000005000000"
    "2f636b70740000000c0000002f6f75742e706172717565740000000006000000"
    "6f66667365740000020000006f7000000b00000073797374656d5f74696d6500"
    "0a0000006576656e745f74696d65000005000000737061726b00000001000000"
    "4800000014002400040008000c001000140018001c0020001400000038000000"
    "4c00000050000000600000007c0000009000000094000000a800000008000c00"
    "04000800000000000c00000098000000a8000000110000006469643a6f64663a"
    "66656430313432616100000002000000696e000002000000696e00000c001400"
    "040008000c0010000c0000007800000080000000840000009000000008001800"
    "08001000000000000c0000000000000000000000000000000400000000000000"
    "0100000074000000100000002f646174612f70302e7061727175657400000000"
    "000000000d00000073656c656374203120617320780000000400000073746570"
    "00000000060000006f66667365740000020000006f7000000b00000073797374"
    "656d5f74696d65000a0000006576656e745f74696d650000100000002f646174"
    "612f70302e7061727175657400"
)


def test_transform_request_golden_bytes():
    """The canonical request encodes to EXACTLY the pinned bytes — a
    slot renumbering can only land as a visible diff of this fixture."""
    from kamu_engine_datafusion_spark.transport import odf_flatbuffers as fb

    got = fb.encode_transform_request(_GOLDEN_REQUEST)
    assert got == bytes.fromhex(_GOLDEN_REQUEST_HEX)
    # and the pinned bytes decode back to the canonical dict
    rt = fb.decode_transform_request(bytes.fromhex(_GOLDEN_REQUEST_HEX))
    assert rt["dataset_alias"] == "golden"
    assert rt["next_offset"] == 10
    assert rt["transform"]["queries"] == [
        {"query": "select 1 as x", "alias": "step"}
    ]
    assert rt["query_inputs"][0]["offset_interval"] == {"start": 0, "end": 4}


def test_transform_response_golden_bytes():
    """Response union tag 2 (Success) + payload slots pinned byte-exact."""
    from kamu_engine_datafusion_spark.transport import odf_flatbuffers as fb

    payload = {
        "new_offset_interval": {"start": 10, "end": 12},
        "new_watermark": "2024-01-02T03:04:05Z",
    }
    got = fb.encode_response(
        fb.UNION_SUCCESS, "TransformResponseSuccess", payload
    )
    assert got == bytes.fromhex(_GOLDEN_RESPONSE_HEX)
    kind, rd = fb.decode_response(
        bytes.fromhex(_GOLDEN_RESPONSE_HEX), "TransformResponseSuccess"
    )
    assert kind == fb.UNION_SUCCESS == 2
    assert rd == payload


_GOLDEN_RESPONSE_HEX = (
    "100000000800090008000400000000000c000000140000000200080014001000"
    "08000000000000000e0000000000000088d820c88c0100001000000008001800"
    "08001000000000000c000000000000000a000000000000000c00000000000000"
)


# ---------------------------------------------------------------------------
# property tests: codec round-trips over arbitrary inputs
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

_prop = settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_hname = hst.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=24
)
_hvalue = hst.text(
    alphabet=hst.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=64,
)


@_prop
@given(data=hst.binary(min_size=0, max_size=256))
def test_huffman_roundtrip_any_bytes(data):
    from kamu_engine_datafusion_spark.transport.hpack import (
        huffman_decode,
        huffman_encode,
    )

    assert huffman_decode(huffman_encode(data)) == data


@_prop
@given(headers=hst.lists(hst.tuples(_hname, _hvalue), min_size=0, max_size=12))
def test_hpack_roundtrip_any_headers(headers):
    from kamu_engine_datafusion_spark.transport.hpack import (
        HpackDecoder,
        encode_headers,
    )

    block = encode_headers(headers)
    assert HpackDecoder().decode(block) == headers


@_prop
@given(
    blocks=hst.lists(
        hst.lists(hst.tuples(_hname, _hvalue), min_size=0, max_size=6),
        min_size=1,
        max_size=4,
    )
)
def test_hpack_decoder_context_survives_across_blocks(blocks):
    # one connection-lifetime decoder over several header blocks (the
    # HTTP/2 contract): dynamic-table state from earlier blocks must
    # never corrupt later ones
    from kamu_engine_datafusion_spark.transport.hpack import (
        HpackDecoder,
        encode_headers,
    )

    dec = HpackDecoder()
    for hs in blocks:
        assert dec.decode(encode_headers(hs)) == hs


@_prop
@given(
    alias=hst.text(
        alphabet=hst.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=0, max_size=32,
    ),
    off=hst.integers(min_value=0, max_value=2**62),
    q=hst.text(
        alphabet=hst.characters(min_codepoint=0x20, max_codepoint=0x2FFF),
        min_size=0, max_size=80,
    ),
    start=hst.integers(min_value=0, max_value=2**31),
    end=hst.integers(min_value=0, max_value=2**31),
)
def test_flatbuffers_transform_request_roundtrip(alias, off, q, start, end):
    from kamu_engine_datafusion_spark.transport import odf_flatbuffers as fb

    req = {
        "dataset_alias": alias,
        "system_time": "2024-01-02T03:04:05Z",
        "next_offset": off,
        "transform": {
            "kind": "Sql",
            "engine": "spark",
            "queries": [{"query": q, "alias": "step"}],
        },
        "query_inputs": [
            {
                "dataset_alias": alias or "in",
                "query_alias": "in",
                "offset_interval": {"start": start, "end": end},
                "schema_file": "/s.parquet",
                "data_paths": ["/p0.parquet"],
                "vocab": {
                    "offset_column": "offset",
                    "operation_type_column": "op",
                    "system_time_column": "system_time",
                    "event_time_column": "event_time",
                },
            }
        ],
        "new_data_path": "/out.parquet",
        "vocab": {
            "offset_column": "offset",
            "operation_type_column": "op",
            "system_time_column": "system_time",
            "event_time_column": "event_time",
        },
    }
    rt = fb.decode_transform_request(fb.encode_transform_request(req))
    assert rt["dataset_alias"] == alias
    assert rt["next_offset"] == off
    assert rt["transform"]["queries"][0]["query"] == q
    assert rt["query_inputs"][0]["offset_interval"] == {
        "start": start, "end": end,
    }
