"""Coordinator-shaped integration tests for the gRPC transport.

A pure-stdlib gRPC client (HTTP/2 prior-knowledge + HPACK + the ODF
protobuf/flatbuffers envelope) drives the served engine over a real TCP
socket — the wire shape of ``/root/reference/src/grpc.rs:74-182`` /
``src/main.rs:20``. Also pins the HPACK implementation to RFC 7541's
published test vectors and the flatbuffers codec to hand-decoded bytes.
"""

from __future__ import annotations

import socket
import struct

import pyarrow.parquet as pq
import pytest

from kamu_engine_datafusion_spark.transport import odf_flatbuffers as fb
from kamu_engine_datafusion_spark.transport.grpc_server import (
    grpc_frame,
    grpc_unframe,
    proto_unwrap,
    proto_wrap,
    serve_grpc,
)
from kamu_engine_datafusion_spark.transport.hpack import (
    HpackDecoder,
    _write_int,
    huffman_decode,
    huffman_encode,
)
from kamu_engine_datafusion_spark.transport.http2 import (
    F_DATA,
    F_GOAWAY,
    F_HEADERS,
    F_PING,
    F_SETTINGS,
    FLAG_ACK,
    FLAG_END_HEADERS,
    FLAG_END_STREAM,
    PREFACE,
    pack_frame,
)
from tests.conftest import write_cities_ledger


# ---------------------------------------------------------------------------
# RFC 7541 pins
# ---------------------------------------------------------------------------


def test_hpack_huffman_rfc7541_appendix_c_vectors():
    vectors = [
        (b"www.example.com", "f1e3c2e5f23a6ba0ab90f4ff"),
        (b"no-cache", "a8eb10649cbf"),
        (b"custom-key", "25a849e95ba97d7f"),
        (b"custom-value", "25a849e95bb8e8b4bf"),
        (b"302", "6402"),
        (b"private", "aec3771a4b"),
        (
            b"Mon, 21 Oct 2013 20:13:21 GMT",
            "d07abe941054d444a8200595040b8166e082a62d1bff",
        ),
        (b"https://www.example.com", "9d29ad171863c78f0b97c8e9ae82ae43d3"),
        (b"307", "640eff"),
        (b"gzip", "9bd9ab"),
    ]
    for raw, hexs in vectors:
        assert huffman_encode(raw).hex() == hexs
        assert huffman_decode(bytes.fromhex(hexs)) == raw


def test_hpack_decoder_rfc7541_header_blocks():
    # C.3.1 plain literals + indexed
    d = HpackDecoder()
    got = d.decode(bytes.fromhex("828684410f7777772e6578616d706c652e636f6d"))
    assert got == [
        (":method", "GET"),
        (":scheme", "http"),
        (":path", "/"),
        (":authority", "www.example.com"),
    ]
    # C.4.1/C.4.2: huffman literals + dynamic-table reuse across blocks
    d2 = HpackDecoder()
    first = d2.decode(bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff"))
    assert first == got
    second = d2.decode(bytes.fromhex("828684be5886a8eb10649cbf"))
    assert second == got + [("cache-control", "no-cache")]


# ---------------------------------------------------------------------------
# flatbuffers format pins
# ---------------------------------------------------------------------------


def test_flatbuffers_bytes_hand_decoded():
    """Pin the generic builder to the public wire format by decoding
    its output with raw struct ops (no shared code paths)."""
    buf = fb.build(fb.encode_table("OffsetInterval", {"start": 5, "end": 9}))
    root = struct.unpack_from("<I", buf, 0)[0]
    soff = struct.unpack_from("<i", buf, root)[0]
    vt = root - soff
    vsize, tsize = struct.unpack_from("<HH", buf, vt)
    assert vsize == 4 + 2 * 2  # two slots
    rel0 = struct.unpack_from("<H", buf, vt + 4)[0]
    rel1 = struct.unpack_from("<H", buf, vt + 6)[0]
    assert struct.unpack_from("<q", buf, root + rel0)[0] == 5
    assert struct.unpack_from("<q", buf, root + rel1)[0] == 9
    assert tsize >= rel1 + 8


def test_flatbuffers_transform_request_round_trip():
    body = {
        "dataset_alias": "bar",
        "system_time": "2023-03-01T00:00:00Z",
        "next_offset": 10,
        "transform": {
            "queries": [{"query": "select 1", "alias": None}],
        },
        "query_inputs": [
            {
                "dataset_alias": "foo",
                "query_alias": "foo",
                "schema_file": "/tmp/s.parquet",
                "data_paths": ["/tmp/a.parquet", "/tmp/b.parquet"],
                "offset_interval": {"start": 0, "end": 2},
                "explicit_watermarks": [
                    {
                        "system_time": "2023-03-01T00:00:00Z",
                        "event_time": "2023-02-01T00:00:00Z",
                    }
                ],
            }
        ],
        "new_data_path": "/tmp/out.parquet",
    }
    got = fb.decode_transform_request(fb.encode_transform_request(body))
    assert got["dataset_alias"] == "bar"
    assert got["system_time"] == "2023-03-01T00:00:00Z"
    assert got["next_offset"] == 10
    assert got["transform"]["queries"] == [{"query": "select 1"}]
    (inp,) = got["query_inputs"]
    assert inp["data_paths"] == ["/tmp/a.parquet", "/tmp/b.parquet"]
    assert inp["offset_interval"] == {"start": 0, "end": 2}
    assert inp["explicit_watermarks"][0]["event_time"] == (
        "2023-02-01T00:00:00Z"
    )


# ---------------------------------------------------------------------------
# the stdlib gRPC client
# ---------------------------------------------------------------------------


def _client_headers(path: str, authority: str) -> bytes:
    """Literal-without-indexing, HUFFMAN-coded values — exercises the
    server's huffman decode path like a real tonic client would."""
    out = bytearray()
    for name, value in [
        (":method", "POST"),
        (":scheme", "http"),
        (":path", path),
        (":authority", authority),
        ("content-type", "application/grpc"),
        ("te", "trailers"),
    ]:
        out.append(0x00)
        nb = huffman_encode(name.encode())
        out += _write_int(len(nb), 7, 0x80) + nb
        vb = huffman_encode(value.encode())
        out += _write_int(len(vb), 7, 0x80) + vb
    return bytes(out)


class GrpcTestClient:
    def __init__(self, port: int) -> None:
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.decoder = HpackDecoder()
        self.stream_id = 1
        self.sock.sendall(PREFACE + pack_frame(F_SETTINGS, 0, 0, b""))

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        return bytes(buf)

    def call(self, path: str, message: bytes):
        sid = self.stream_id
        self.stream_id += 2
        self.sock.sendall(
            pack_frame(
                F_HEADERS,
                FLAG_END_HEADERS,
                sid,
                _client_headers(path, "127.0.0.1"),
            )
            + pack_frame(F_DATA, FLAG_END_STREAM, sid, grpc_frame(message))
        )
        headers: list[tuple[str, str]] = []
        body = bytearray()
        while True:
            head = self._recv_exact(9)
            length = int.from_bytes(head[:3], "big")
            ftype, flags = head[3], head[4]
            payload = self._recv_exact(length) if length else b""
            if ftype == F_SETTINGS:
                if not flags & FLAG_ACK:
                    self.sock.sendall(pack_frame(F_SETTINGS, FLAG_ACK, 0, b""))
            elif ftype == F_PING:
                if not flags & FLAG_ACK:
                    self.sock.sendall(pack_frame(F_PING, FLAG_ACK, 0, payload))
            elif ftype == F_HEADERS:
                headers += self.decoder.decode(payload)
                if flags & FLAG_END_STREAM:
                    return dict(headers), grpc_unframe(bytes(body))
            elif ftype == F_DATA:
                body += payload
                if flags & FLAG_END_STREAM:
                    return dict(headers), grpc_unframe(bytes(body))
            elif ftype == F_GOAWAY:
                raise ConnectionError(f"GOAWAY: {payload!r}")

    def close(self) -> None:
        self.sock.close()


# ---------------------------------------------------------------------------
# end-to-end over :2884-shaped wire
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def grpc_port(spark):
    server = serve_grpc(spark, port=0)  # ephemeral port, same wire
    yield server.server_address[1]
    server.shutdown()


def _reference_request(ledger: str, out: str, ckpt: str) -> dict:
    vocab = {
        "offset_column": "offset",
        "operation_type_column": "op",
        "system_time_column": "system_time",
        "event_time_column": "event_time",
    }
    return {
        "dataset_id": "did:odf:fed01212626",
        "dataset_alias": "bar",
        "system_time": "2023-03-01T00:00:00Z",
        "next_offset": 0,
        "vocab": vocab,
        "transform": {
            "engine": "spark",
            "queries": [
                {"query": "select event_time, city, population from foo"}
            ],
        },
        "query_inputs": [
            {
                "dataset_id": "did:odf:fed0100d72",
                "dataset_alias": "foo",
                "query_alias": "foo",
                "offset_interval": {"start": 0, "end": 2},
                "vocab": vocab,
                "data_paths": [ledger],
                "schema_file": ledger,
                "explicit_watermarks": [],
            }
        ],
        "new_checkpoint_path": ckpt,
        "new_data_path": out,
    }


def test_grpc_execute_transform_success(grpc_port, tmp_path):
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    out = str(tmp_path / "new_data.parquet")
    body = _reference_request(ledger, out, str(tmp_path / "ckpt"))
    client = GrpcTestClient(grpc_port)
    try:
        headers, msgs = client.call(
            "/engine.Engine/ExecuteTransform",
            proto_wrap(fb.encode_transform_request(body)),
        )
    finally:
        client.close()
    assert headers[":status"] == "200"
    assert headers["content-type"] == "application/grpc"
    assert headers["grpc-status"] == "0"
    assert len(msgs) == 1
    kind, resp = fb.decode_response(
        proto_unwrap(msgs[0]), "TransformResponseSuccess"
    )
    assert kind == fb.UNION_SUCCESS
    assert resp["new_offset_interval"] == {"start": 0, "end": 2}
    assert pq.ParquetFile(out).metadata.num_rows == 3


def test_grpc_invalid_query_travels_in_the_response_union(grpc_port, tmp_path):
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    body = _reference_request(
        ledger, str(tmp_path / "o.parquet"), str(tmp_path / "ckpt")
    )
    body["transform"]["queries"] = [{"query": "select bogus !!syntax"}]
    client = GrpcTestClient(grpc_port)
    try:
        headers, msgs = client.call(
            "/engine.Engine/ExecuteTransform",
            proto_wrap(fb.encode_transform_request(body)),
        )
    finally:
        client.close()
    # like the reference: protocol-level OK, error in the union
    assert headers["grpc-status"] == "0"
    kind, resp = fb.decode_response(
        proto_unwrap(msgs[0]), "TransformResponseSuccess"
    )
    assert kind == fb.UNION_INVALID_QUERY
    assert resp["message"]


def test_grpc_execute_raw_query(grpc_port, tmp_path):
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    out = str(tmp_path / "raw_out.parquet")
    client = GrpcTestClient(grpc_port)
    try:
        headers, msgs = client.call(
            "/engine.Engine/ExecuteRawQuery",
            proto_wrap(
                fb.encode_raw_query_request(
                    {
                        "input_data_paths": [ledger],
                        "transform": {
                            "queries": [
                                {
                                    "query": (
                                        "select city, population * 2 as pop2 "
                                        "from input"
                                    )
                                }
                            ]
                        },
                        "output_data_path": out,
                    }
                )
            ),
        )
    finally:
        client.close()
    assert headers["grpc-status"] == "0"
    kind, resp = fb.decode_response(
        proto_unwrap(msgs[0]), "RawQueryResponseSuccess"
    )
    assert kind == fb.UNION_SUCCESS
    assert resp["num_records"] == 3
    assert pq.ParquetFile(out).metadata.num_rows == 3


def test_grpc_unknown_method_gets_unimplemented(grpc_port):
    client = GrpcTestClient(grpc_port)
    try:
        headers, msgs = client.call("/engine.Engine/Nope", proto_wrap(b""))
    finally:
        client.close()
    assert headers["grpc-status"] == "12"
    assert msgs == []


def test_grpc_two_sequential_calls_one_connection(grpc_port, tmp_path):
    """gRPC multiplexing basics: stream ids 1 and 3 on one connection,
    shared HPACK context on both sides."""
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    client = GrpcTestClient(grpc_port)
    try:
        for i in range(2):
            out = str(tmp_path / f"o{i}.parquet")
            body = _reference_request(ledger, out, str(tmp_path / f"c{i}"))
            headers, msgs = client.call(
                "/engine.Engine/ExecuteTransform",
                proto_wrap(fb.encode_transform_request(body)),
            )
            assert headers["grpc-status"] == "0"
            kind, resp = fb.decode_response(
                proto_unwrap(msgs[0]), "TransformResponseSuccess"
            )
            assert kind == fb.UNION_SUCCESS
    finally:
        client.close()


def test_grpc_interleaved_streams_demultiplex(grpc_port, tmp_path):
    """A coordinator may pipeline: HEADERS(1), HEADERS(3), DATA(1),
    DATA(3) interleaved on one connection. The server must track each
    stream independently and answer both (responses demultiplexed by
    stream id)."""
    ledger = write_cities_ledger(str(tmp_path / "input.parquet"))
    bodies = []
    for i in range(2):
        out = str(tmp_path / f"ix{i}.parquet")
        bodies.append(
            _reference_request(ledger, out, str(tmp_path / f"ic{i}"))
        )

    sock = socket.create_connection(("127.0.0.1", grpc_port), timeout=30)
    try:
        decoder = HpackDecoder()
        sock.sendall(PREFACE + pack_frame(F_SETTINGS, 0, 0, b""))
        # interleave: both HEADERS first, then both DATA frames
        frames = b""
        for sid, body in zip((1, 3), bodies):
            frames += pack_frame(
                F_HEADERS,
                FLAG_END_HEADERS,
                sid,
                _client_headers("/engine.Engine/ExecuteTransform", "x"),
            )
        for sid, body in zip((1, 3), bodies):
            frames += pack_frame(
                F_DATA,
                FLAG_END_STREAM,
                sid,
                grpc_frame(proto_wrap(fb.encode_transform_request(body))),
            )
        sock.sendall(frames)

        done: dict[int, dict] = {}
        headers: dict[int, list] = {1: [], 3: []}
        data: dict[int, bytearray] = {1: bytearray(), 3: bytearray()}

        def recv_exact(n):
            buf = bytearray()
            while len(buf) < n:
                chunk = sock.recv(n - len(buf))
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            return bytes(buf)

        while len(done) < 2:
            head = recv_exact(9)
            length = int.from_bytes(head[:3], "big")
            ftype, flags = head[3], head[4]
            sid = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
            payload = recv_exact(length) if length else b""
            if ftype == F_SETTINGS and not flags & FLAG_ACK:
                sock.sendall(pack_frame(F_SETTINGS, FLAG_ACK, 0, b""))
            elif ftype == F_HEADERS:
                headers[sid] += decoder.decode(payload)
                if flags & FLAG_END_STREAM:
                    done[sid] = dict(headers[sid])
            elif ftype == F_DATA:
                data[sid] += payload
                if flags & FLAG_END_STREAM:
                    done[sid] = dict(headers[sid])

        for sid in (1, 3):
            assert done[sid]["grpc-status"] == "0", done[sid]
            msgs = grpc_unframe(bytes(data[sid]))
            kind, resp = fb.decode_response(
                proto_unwrap(msgs[0]), "TransformResponseSuccess"
            )
            assert kind == fb.UNION_SUCCESS
            assert resp["new_offset_interval"] == {"start": 0, "end": 2}
    finally:
        sock.close()


def test_garbage_peer_gets_goaway_not_thread_crash(grpc_port, tmp_path):
    """A peer sending a valid preface followed by garbage (bad HPACK,
    oversized frame length) must get a clean GOAWAY / connection close
    — and the server must keep serving OTHER connections afterwards."""
    import pyarrow as pa
    import pyarrow.parquet as pq  # noqa: F401  (fixture helper below)

    # 1. truncated-HPACK peer: HEADERS frame whose fragment is a lone
    #    continuation-prefix byte (0x7F needs continuation bytes)
    s = socket.create_connection(("127.0.0.1", grpc_port))
    s.sendall(b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")
    s.sendall(struct.pack("!I", 1)[1:] + bytes([0x1, 0x4]) + struct.pack("!I", 1) + b"\x7f")
    s.settimeout(5)
    got = bytearray()
    try:
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            got += chunk
    except TimeoutError:
        pass
    s.close()
    # frames received: SETTINGS first, then a GOAWAY (type 0x7) before close
    types = []
    pos = 0
    while pos + 9 <= len(got):
        ln = int.from_bytes(got[pos : pos + 3], "big")
        types.append(got[pos + 3])
        pos += 9 + ln
    assert 0x7 in types, types

    # 2. oversized-frame-length peer: length field beyond our 16384
    s = socket.create_connection(("127.0.0.1", grpc_port))
    s.sendall(b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")
    s.sendall(b"\xff\xff\xff" + bytes([0x0, 0x0]) + struct.pack("!I", 1))
    s.settimeout(5)
    got = bytearray()
    try:
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            got += chunk
    except TimeoutError:
        pass
    s.close()
    types = []
    pos = 0
    while pos + 9 <= len(got):
        ln = int.from_bytes(got[pos : pos + 3], "big")
        types.append(got[pos + 3])
        pos += 9 + ln
    assert 0x7 in types, types

    # 3. the server still serves a real request on a fresh connection
    ledger = write_cities_ledger(str(tmp_path / "g-ledger.parquet"))
    out = str(tmp_path / "g-out.parquet")
    body = _reference_request(ledger, out, str(tmp_path / "g-ckpt"))
    client = GrpcTestClient(grpc_port)
    try:
        headers, msgs = client.call(
            "/engine.Engine/ExecuteTransform",
            proto_wrap(fb.encode_transform_request(body)),
        )
    finally:
        client.close()
    assert headers["grpc-status"] == "0"
    kind, _ = fb.decode_response(proto_unwrap(msgs[0]), "TransformResponseSuccess")
    assert kind == fb.UNION_SUCCESS


# ---------------------------------------------------------------------------
# send-side flow control (RFC 9113 §5.2 / §6.9) — r8 ADVICE regression
# ---------------------------------------------------------------------------


class _NullSock:
    """Captures sends; enough socket for H2Connection's write path."""

    def __init__(self):
        self.sent = bytearray()

    def sendall(self, b):
        self.sent += b


def _conn():
    from kamu_engine_datafusion_spark.transport.http2 import H2Connection

    return H2Connection(_NullSock(), handler=lambda *a: None)


def _parse_frames(buf: bytes) -> list[tuple[int, int, bytes]]:
    """Split a captured send buffer into (type, stream_id, payload)."""
    out, i = [], 0
    while i + 9 <= len(buf):
        ln = int.from_bytes(buf[i : i + 3], "big")
        ftype = buf[i + 3]
        sid = int.from_bytes(buf[i + 5 : i + 9], "big") & 0x7FFFFFFF
        out.append((ftype, sid, bytes(buf[i + 9 : i + 9 + ln])))
        i += 9 + ln
    return out


def test_send_window_cumulative_debit_and_overrun():
    from kamu_engine_datafusion_spark.transport.http2 import (
        H2FlowControlError,
        ResponseWriter,
    )

    conn = _conn()
    w = ResponseWriter(conn, 1)
    w.send_data(b"x" * 40_000)
    assert conn.stream_send_windows[1] == 65535 - 40_000
    assert conn.conn_send_window == 65535 - 40_000
    # second send on the SAME stream exceeds the remaining credit —
    # the old per-call assert would have passed it (30k < 64k)
    with pytest.raises(H2FlowControlError):
        w.send_data(b"x" * 30_000)


def test_connection_window_shared_across_streams():
    from kamu_engine_datafusion_spark.transport.http2 import (
        H2FlowControlError,
        ResponseWriter,
    )

    conn = _conn()
    ResponseWriter(conn, 1).send_data(b"x" * 60_000, end_stream=True)
    # stream 3 has a fresh 64k stream window, but the CONNECTION window
    # only has ~5.5k left — must refuse
    with pytest.raises(H2FlowControlError):
        ResponseWriter(conn, 3).send_data(b"x" * 10_000)
    assert conn.conn_send_window == 65535 - 60_000


def test_window_update_replenishes_send_credit():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_WINDOW_UPDATE,
        ResponseWriter,
    )

    conn = _conn()
    w = ResponseWriter(conn, 1)
    w.send_data(b"x" * 60_000)
    # peer grants 100k more on both the connection and the stream
    incr = struct.pack("!I", 100_000)
    conn._dispatch(F_WINDOW_UPDATE, 0, 0, incr)
    conn._dispatch(F_WINDOW_UPDATE, 0, 1, incr)
    w.send_data(b"x" * 80_000)  # now fits both windows
    assert conn.conn_send_window == 65535 - 60_000 + 100_000 - 80_000
    assert conn.stream_send_windows[1] == 65535 - 60_000 + 100_000 - 80_000


def test_settings_initial_window_rebases_stream_windows():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_SETTINGS,
        ResponseWriter,
    )

    conn = _conn()
    ResponseWriter(conn, 1).send_data(b"x" * 1_000)
    # peer shrinks the initial stream window to 2000: §6.9.2 — existing
    # stream windows move by the delta (65535→2000 ⇒ −63535)
    conn._dispatch(F_SETTINGS, 0, 0, struct.pack("!HI", 0x4, 2_000))
    assert conn.initial_stream_window == 2_000
    assert conn.stream_send_windows[1] == 2_000 - 1_000
    # connection window unaffected by SETTINGS (§6.9.2)
    assert conn.conn_send_window == 65535 - 1_000


def test_window_update_zero_increment_is_protocol_error():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_GOAWAY,
        F_WINDOW_UPDATE,
    )

    # RFC 9113 §6.9: a 0 increment is a PROTOCOL_ERROR — the connection
    # is torn down with a GOAWAY, not silently tolerated
    conn = _conn()
    alive = conn._dispatch(F_WINDOW_UPDATE, 0, 0, struct.pack("!I", 0))
    assert alive is False
    assert conn.sock.sent[3] == F_GOAWAY  # frame type byte of GOAWAY


def test_window_update_overflow_is_flow_control_error():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_RST_STREAM,
        F_WINDOW_UPDATE,
    )

    # §6.9.1: a window past 2^31-1 on stream 0 is a CONNECTION
    # FLOW_CONTROL_ERROR (GOAWAY)
    conn = _conn()
    big = struct.pack("!I", 0x7FFFFFFF)
    assert conn._dispatch(F_WINDOW_UPDATE, 0, 0, big) is False
    # ... but on a live stream it is a STREAM error: RST_STREAM
    # (FLOW_CONTROL_ERROR), the connection stays up (§5.4.2)
    conn2 = _conn()
    from kamu_engine_datafusion_spark.transport.http2 import ResponseWriter

    conn2.max_client_stream = 1  # HEADERS would have recorded this
    ResponseWriter(conn2, 1).send_data(b"x")  # opens the window record
    assert conn2._dispatch(F_WINDOW_UPDATE, 0, 1, big) is not False
    ftype, _sid, payload = _parse_frames(conn2.sock.sent)[-1]
    assert ftype == F_RST_STREAM
    assert struct.unpack("!I", payload)[0] == 0x3
    assert 1 not in conn2.stream_send_windows  # stream state dropped


def test_window_update_zero_increment_on_stream_is_stream_error():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_RST_STREAM,
        F_WINDOW_UPDATE,
        ResponseWriter,
    )

    # §6.9: 0 increment on a non-zero stream is a STREAM error —
    # RST_STREAM(PROTOCOL_ERROR), connection survives
    conn = _conn()
    conn.max_client_stream = 1
    ResponseWriter(conn, 1).send_data(b"x")
    assert conn._dispatch(
        F_WINDOW_UPDATE, 0, 1, struct.pack("!I", 0)
    ) is not False
    ftype, _sid, payload = _parse_frames(conn.sock.sent)[-1]
    assert ftype == F_RST_STREAM
    assert struct.unpack("!I", payload)[0] == 0x1


def test_window_update_on_idle_stream_is_connection_error():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_GOAWAY,
        F_WINDOW_UPDATE,
    )

    # §5.1: a WINDOW_UPDATE for a stream NEVER opened (id above the
    # highest HEADERS seen) is a connection PROTOCOL_ERROR
    conn = _conn()
    assert conn._dispatch(
        F_WINDOW_UPDATE, 0, 7, struct.pack("!I", 100)
    ) is False
    assert conn.sock.sent[3] == F_GOAWAY


def test_window_update_zero_increment_on_idle_stream_is_connection_error():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_GOAWAY,
        F_WINDOW_UPDATE,
    )

    # §5.1 beats §6.9: a 0-increment WINDOW_UPDATE on a NEVER-opened
    # stream is a connection PROTOCOL_ERROR (GOAWAY) — it must NOT take
    # the 0-increment RST_STREAM branch, because RST_STREAM on an idle
    # stream is itself a protocol violation
    conn = _conn()
    assert conn._dispatch(
        F_WINDOW_UPDATE, 0, 7, struct.pack("!I", 0)
    ) is False
    assert conn.sock.sent[3] == F_GOAWAY


def test_window_update_for_finished_stream_does_not_leak():
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_WINDOW_UPDATE,
        ResponseWriter,
    )

    conn = _conn()
    conn.max_client_stream = 1  # HEADERS would have recorded this
    w = ResponseWriter(conn, 1)
    w.send_data(b"x", end_stream=True)  # finishes: window record popped
    assert 1 not in conn.stream_send_windows
    # a late §6.9 WINDOW_UPDATE for the closed stream is ignored and
    # must NOT re-create a stream_send_windows entry (per-conn leak)
    assert conn._dispatch(
        F_WINDOW_UPDATE, 0, 1, struct.pack("!I", 100)
    ) is not False
    assert 1 not in conn.stream_send_windows


def test_window_update_errors_over_live_connection(grpc_port):
    """Socket-level conformance for the §6.9 error paths: a 0-increment
    WINDOW_UPDATE on stream 0 and a WINDOW_UPDATE on a never-opened
    stream must each draw GOAWAY + close — and the server must keep
    serving new connections afterwards."""
    from kamu_engine_datafusion_spark.transport.http2 import (
        F_GOAWAY,
        F_SETTINGS,
        F_WINDOW_UPDATE,
        pack_frame,
    )

    def frames_until_close(payload_frame):
        s = socket.create_connection(("127.0.0.1", grpc_port))
        s.sendall(b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")
        s.sendall(pack_frame(F_SETTINGS, 0, 0, b""))
        s.sendall(payload_frame)
        s.settimeout(5)
        got = bytearray()
        try:
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    break
                got += chunk
        except TimeoutError:
            pass
        s.close()
        types, pos = [], 0
        while pos + 9 <= len(got):
            ln = int.from_bytes(got[pos : pos + 3], "big")
            types.append(got[pos + 3])
            pos += 9 + ln
        return types

    # 0 increment on the connection window: PROTOCOL_ERROR GOAWAY
    t1 = frames_until_close(
        pack_frame(F_WINDOW_UPDATE, 0, 0, struct.pack("!I", 0))
    )
    assert F_GOAWAY in t1, t1
    # WINDOW_UPDATE on an idle, never-opened stream: GOAWAY (§5.1)
    t2 = frames_until_close(
        pack_frame(F_WINDOW_UPDATE, 0, 7, struct.pack("!I", 100))
    )
    assert F_GOAWAY in t2, t2
