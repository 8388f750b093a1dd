"""Transport façades over the library Engine.

The reference fronts its engine with gRPC/FlatBuffers on port 2884
(A22, ``src/grpc.rs``, ``src/main.rs:20``) — pure transport over the
same two entry points. This package provides:

- ``grpc_server.serve_grpc`` — the reference's wire: gRPC (unary →
  server-streaming) over cleartext HTTP/2, each message a protobuf
  envelope holding one FlatBuffers-encoded ODF payload. No
  grpcio/h2/hpack/flatbuffers package exists in this environment and
  there is no network to install one, so the stack is implemented
  stdlib-only from the public specs (``http2.py`` RFC 9113 subset,
  ``hpack.py`` RFC 7541 incl. Huffman — validated against the RFC's
  test vectors, ``odf_flatbuffers.py`` generic codec + ODF layouts;
  see the layout caveat there).
- ``http_server.serve`` — an HTTP/JSON façade over the same Engine,
  field-for-field DTO-conformant with the reference request shape.
"""

from kamu_engine_datafusion_spark.transport.grpc_server import serve_grpc
from kamu_engine_datafusion_spark.transport.http_server import serve

__all__ = ["serve", "serve_grpc"]
