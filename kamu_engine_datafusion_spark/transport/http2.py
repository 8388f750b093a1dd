"""Minimal HTTP/2 (RFC 9113) server core for serving gRPC — stdlib-only.

Covers exactly what a gRPC client needs from a server over cleartext
prior-knowledge HTTP/2 (gRPC never uses the HTTP/1.1 upgrade dance):

- connection preface + SETTINGS exchange (+acks)
- HEADERS (+CONTINUATION) with HPACK, DATA, PING, RST_STREAM, GOAWAY,
  WINDOW_UPDATE, PRIORITY (accepted, not used for pacing)
- per-stream request assembly and a response API that sends response
  HEADERS, any number of DATA chunks, and HTTP trailers (the gRPC
  status channel)
- receive-side flow control replenished via WINDOW_UPDATE; send side
  tracks the cumulative per-stream AND connection windows (peer
  WINDOW_UPDATEs and SETTINGS_INITIAL_WINDOW_SIZE honored) and raises
  H2FlowControlError on overrun rather than blocking — the server is
  synchronous and engine responses are tiny (file paths and offsets,
  never data pages)

Deliberately NOT covered: push promises, priorities, TLS — gRPC
doesn't need them from a server in this deployment shape.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from kamu_engine_datafusion_spark.transport.hpack import (
    HpackDecoder,
    encode_headers,
)

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

F_DATA = 0x0
F_HEADERS = 0x1
F_PRIORITY = 0x2
F_RST_STREAM = 0x3
F_SETTINGS = 0x4
F_PUSH_PROMISE = 0x5
F_PING = 0x6
F_GOAWAY = 0x7
F_WINDOW_UPDATE = 0x8
F_CONTINUATION = 0x9

FLAG_END_STREAM = 0x1
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20
FLAG_ACK = 0x1

#: What WE accept per frame: we send empty SETTINGS, so our advertised
#: SETTINGS_MAX_FRAME_SIZE stays the RFC default.
_RECV_MAX_FRAME = 16384

#: RFC 9113 default connection/stream initial send windows. The send
#: side tracks both cumulatively: DATA consumes them, peer
#: WINDOW_UPDATEs and SETTINGS_INITIAL_WINDOW_SIZE replenish/adjust
#: them, and a send that would overrun raises H2FlowControlError (a
#: real exception — the server is synchronous, so it cannot block
#: waiting for credit; engine responses are tiny, an overrun is a bug).
_SEND_WINDOW = 65535


class H2FlowControlError(RuntimeError):
    """A DATA send would exceed the peer's advertised flow-control
    credit (RFC 9113 §5.2). Raised instead of silently violating the
    window: this synchronous server cannot park a response waiting for
    WINDOW_UPDATE, and every legitimate engine response fits the
    default windows."""


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    return (
        struct.pack("!I", len(payload))[1:]
        + bytes([ftype, flags])
        + struct.pack("!I", stream_id & 0x7FFFFFFF)
        + payload
    )


class _Stream:
    __slots__ = ("headers", "data", "ended", "header_frags", "in_headers")

    def __init__(self) -> None:
        self.headers: list[tuple[str, str]] = []
        self.data = bytearray()
        self.ended = False
        self.header_frags = bytearray()
        self.in_headers = False


class H2Connection:
    """One server-side connection. ``handler(headers, body, respond)``
    is called per completed request stream; ``respond`` is a
    :class:`ResponseWriter` bound to that stream."""

    def __init__(self, sock: socket.socket, handler) -> None:
        self.sock = sock
        self.handler = handler
        self.decoder = HpackDecoder()
        self.streams: dict[int, _Stream] = {}
        self.send_lock = threading.Lock()
        self.max_frame_size = 16384
        # send-side flow control (RFC 9113 §5.2): connection window +
        # per-stream windows, consumed by DATA, replenished by peer
        # WINDOW_UPDATEs; SETTINGS_INITIAL_WINDOW_SIZE re-bases every
        # stream window by its delta (§6.9.2).
        self.conn_send_window = _SEND_WINDOW
        self.initial_stream_window = _SEND_WINDOW
        self.stream_send_windows: dict[int, int] = {}
        # highest client-initiated stream id seen at HEADERS — lets
        # WINDOW_UPDATE distinguish a recently-CLOSED stream (§6.9
        # permits, ignore) from an IDLE never-opened one (§5.1:
        # connection PROTOCOL_ERROR)
        self.max_client_stream = 0

    def _stream_window(self, stream_id: int) -> int:
        return self.stream_send_windows.setdefault(
            stream_id, self.initial_stream_window
        )

    def consume_send_window(self, stream_id: int, n: int) -> None:
        """Debit ``n`` DATA bytes against BOTH send windows, raising
        :class:`H2FlowControlError` if either lacks credit."""
        sw = self._stream_window(stream_id)
        if n > sw:
            raise H2FlowControlError(
                f"stream {stream_id}: DATA of {n}B exceeds the remaining "
                f"stream send window ({sw}B)"
            )
        if n > self.conn_send_window:
            raise H2FlowControlError(
                f"DATA of {n}B exceeds the remaining connection send "
                f"window ({self.conn_send_window}B)"
            )
        self.stream_send_windows[stream_id] = sw - n
        self.conn_send_window -= n

    # -- io ---------------------------------------------------------------
    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return bytes(buf)

    def send_frame(
        self, ftype: int, flags: int, stream_id: int, payload: bytes
    ) -> None:
        with self.send_lock:
            self.sock.sendall(pack_frame(ftype, flags, stream_id, payload))

    def _goaway(self, error_code: int, last_stream_id: int = 0) -> None:
        try:
            self.send_frame(
                F_GOAWAY,
                0,
                0,
                struct.pack("!II", last_stream_id & 0x7FFFFFFF, error_code),
            )
        except OSError:
            pass  # peer already gone; the close below is all that's left

    def _rst_stream(self, stream_id: int, error_code: int) -> None:
        """Per-stream error (RFC 9113 §5.4.2): RST_STREAM the one
        stream and drop its state; the connection stays up."""
        try:
            self.send_frame(
                F_RST_STREAM, 0, stream_id, struct.pack("!I", error_code)
            )
        except OSError:
            pass
        self.streams.pop(stream_id, None)
        self.stream_send_windows.pop(stream_id, None)

    # -- main loop --------------------------------------------------------
    def run(self) -> None:
        preface = self._recv_exact(len(PREFACE))
        if preface != PREFACE:
            raise ConnectionError("bad HTTP/2 preface")
        self.send_frame(F_SETTINGS, 0, 0, b"")  # our (all-default) settings
        while True:
            try:
                head = self._recv_exact(9)
            except ConnectionError:
                return
            length = int.from_bytes(head[:3], "big")
            ftype, flags = head[3], head[4]
            stream_id = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
            if length > _RECV_MAX_FRAME:
                # RFC 9113 §4.2: exceeding OUR advertised (default 16384)
                # SETTINGS_MAX_FRAME_SIZE is FRAME_SIZE_ERROR — a garbage
                # or hostile length must not drive _recv_exact
                self._goaway(0x6)
                return
            payload = self._recv_exact(length) if length else b""
            if not self._dispatch(ftype, flags, stream_id, payload):
                return

    def _dispatch(
        self, ftype: int, flags: int, stream_id: int, payload: bytes
    ) -> bool:
        if ftype == F_SETTINGS:
            if not flags & FLAG_ACK:
                for off in range(0, len(payload), 6):
                    ident, value = struct.unpack_from("!HI", payload, off)
                    if ident == 0x5:  # SETTINGS_MAX_FRAME_SIZE
                        self.max_frame_size = value
                    elif ident == 0x4:  # SETTINGS_INITIAL_WINDOW_SIZE
                        # §6.9.2: re-base every stream send window by
                        # the delta (connection window is unaffected)
                        delta = value - self.initial_stream_window
                        self.initial_stream_window = value
                        for sid in self.stream_send_windows:
                            self.stream_send_windows[sid] += delta
                self.send_frame(F_SETTINGS, FLAG_ACK, 0, b"")
        elif ftype == F_PING:
            if not flags & FLAG_ACK:
                self.send_frame(F_PING, FLAG_ACK, 0, payload)
        elif ftype == F_GOAWAY:
            return False
        elif ftype == F_WINDOW_UPDATE:
            if len(payload) == 4:
                incr = struct.unpack("!I", payload)[0] & 0x7FFFFFFF
                if (
                    stream_id != 0
                    and stream_id not in self.stream_send_windows
                    and stream_id > self.max_client_stream
                ):
                    # §5.1: any frame on an IDLE never-opened stream is
                    # a connection PROTOCOL_ERROR — checked BEFORE the
                    # 0-increment branch, because RST_STREAM on an idle
                    # stream is itself a protocol violation
                    self._goaway(0x1)
                    return False
                if incr == 0:
                    # §6.9: 0 increment — connection PROTOCOL_ERROR on
                    # stream 0, STREAM error (RST_STREAM) otherwise
                    if stream_id == 0:
                        self._goaway(0x1)  # PROTOCOL_ERROR
                        return False
                    self._rst_stream(stream_id, 0x1)  # PROTOCOL_ERROR
                elif stream_id == 0:
                    if self.conn_send_window + incr > 0x7FFFFFFF:
                        # §6.9.1: window past 2^31-1 = FLOW_CONTROL_ERROR
                        self._goaway(0x3)  # FLOW_CONTROL_ERROR
                        return False
                    self.conn_send_window += incr
                elif stream_id in self.stream_send_windows:
                    # stream_send_windows doubles as the open-for-
                    # sending record (created at HEADERS, popped at
                    # RST / END_STREAM) WITHOUT setdefault-ing an entry
                    # nothing would remove — a per-connection leak
                    nw = self.stream_send_windows[stream_id] + incr
                    if nw > 0x7FFFFFFF:
                        # §6.9.1: per-stream overflow is a STREAM error
                        self._rst_stream(stream_id, 0x3)
                    else:
                        self.stream_send_windows[stream_id] = nw
                # updates for recently-CLOSED streams (id ≤ max seen,
                # window record popped) are ignored — §6.9 permits
                # them briefly after close; the idle case was handled
                # above before any increment inspection
        elif ftype == F_PRIORITY:
            pass
        elif ftype == F_RST_STREAM:
            self.streams.pop(stream_id, None)
            self.stream_send_windows.pop(stream_id, None)
        elif ftype == F_HEADERS:
            st = self.streams.setdefault(stream_id, _Stream())
            if stream_id > self.max_client_stream:
                self.max_client_stream = stream_id
            # open the send-window record now: _complete pops
            # self.streams before the handler writes its response, so
            # WINDOW_UPDATE liveness must be tracked here instead
            self._stream_window(stream_id)
            frag = self._strip_padding(payload, flags)
            if frag is None:
                return False  # pad length exceeds the frame: PROTOCOL_ERROR
            if flags & FLAG_PRIORITY:
                frag = frag[5:]
            st.header_frags += frag
            st.in_headers = True
            if flags & FLAG_END_STREAM:
                st.ended = True
            if flags & FLAG_END_HEADERS:
                self._finish_headers(stream_id, st)
        elif ftype == F_CONTINUATION:
            st = self.streams.get(stream_id)
            if st is None or not st.in_headers:
                return False
            st.header_frags += payload
            if flags & FLAG_END_HEADERS:
                self._finish_headers(stream_id, st)
        elif ftype == F_DATA:
            st = self.streams.get(stream_id)
            if st is None:
                return True
            frag = self._strip_padding(payload, flags)
            if frag is None:
                return False
            st.data += frag
            if len(payload):  # replenish receive windows
                incr = struct.pack("!I", len(payload))
                self.send_frame(F_WINDOW_UPDATE, 0, 0, incr)
                self.send_frame(F_WINDOW_UPDATE, 0, stream_id, incr)
            if flags & FLAG_END_STREAM:
                st.ended = True
                self._complete(stream_id, st)
        return True

    @staticmethod
    def _strip_padding(payload: bytes, flags: int) -> bytes | None:
        """RFC 9113 §6.1/§6.2 pad removal; ``None`` = malformed (pad
        length ≥ remaining payload → connection PROTOCOL_ERROR)."""
        if not flags & FLAG_PADDED:
            return payload
        if not payload or payload[0] >= len(payload):
            return None
        return payload[1 : len(payload) - payload[0]]

    def _finish_headers(self, stream_id: int, st: _Stream) -> None:
        # trailers from clients don't occur in gRPC requests; a second
        # HEADERS block on the stream is simply appended
        st.headers += self.decoder.decode(bytes(st.header_frags))
        st.header_frags = bytearray()
        st.in_headers = False
        if st.ended:
            self._complete(stream_id, st)

    def _complete(self, stream_id: int, st: _Stream) -> None:
        self.streams.pop(stream_id, None)
        self.handler(
            dict(st.headers), bytes(st.data), ResponseWriter(self, stream_id)
        )


class ResponseWriter:
    def __init__(self, conn: H2Connection, stream_id: int) -> None:
        self.conn = conn
        self.stream_id = stream_id

    def send_headers(
        self, headers: list[tuple[str, str]], end_stream: bool = False
    ) -> None:
        flags = FLAG_END_HEADERS | (FLAG_END_STREAM if end_stream else 0)
        self.conn.send_frame(
            F_HEADERS, flags, self.stream_id, encode_headers(headers)
        )

    def send_data(self, data: bytes, end_stream: bool = False) -> None:
        # Debit the cumulative per-stream + connection send windows
        # (replenished by peer WINDOW_UPDATEs); raises
        # H2FlowControlError — a real exception, not a strippable
        # assert — if the peer hasn't extended enough credit.
        self.conn.consume_send_window(self.stream_id, len(data))
        if end_stream:
            self.conn.stream_send_windows.pop(self.stream_id, None)
        mfs = self.conn.max_frame_size
        chunks = [data[i : i + mfs] for i in range(0, len(data), mfs)] or [b""]
        for i, chunk in enumerate(chunks):
            last = i == len(chunks) - 1
            self.conn.send_frame(
                F_DATA,
                FLAG_END_STREAM if (end_stream and last) else 0,
                self.stream_id,
                chunk,
            )

    def send_trailers(self, trailers: list[tuple[str, str]]) -> None:
        self.send_headers(trailers, end_stream=True)


class H2Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, handler) -> None:
        self._h2_handler = handler

        class _Req(socketserver.BaseRequestHandler):
            def handle(inner) -> None:  # noqa: N805
                conn = H2Connection(inner.request, self._h2_handler)
                try:
                    conn.run()
                except (ConnectionError, OSError):
                    pass  # peer hung up: nothing to tell it
                except Exception:
                    # malformed input (truncated HPACK int/string, bad
                    # frame shape, garbage preface…) must kill THIS
                    # connection with a clean GOAWAY, not unwind the
                    # handler thread with a raw traceback
                    conn._goaway(0x1)  # PROTOCOL_ERROR

        super().__init__(addr, _Req)

    def serve_background(self) -> "H2Server":
        threading.Thread(target=self.serve_forever, daemon=True).start()
        return self
