"""Transport façades over the library Engine.

The reference fronts its engine with gRPC/FlatBuffers on port 2884
(A22, ``src/grpc.rs``, ``src/main.rs:20``) — pure transport over the
same two entry points. This package provides an equivalent stdlib-only
HTTP/JSON façade; a gRPC/FlatBuffers binding would wrap the same
``Engine`` class unchanged (grpcio is not available in this
environment, so it stays behind this seam).
"""
