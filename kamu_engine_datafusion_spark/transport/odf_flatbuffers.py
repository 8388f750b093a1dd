"""FlatBuffers codec for the ODF engine-protocol payloads — stdlib-only.

The reference's gRPC messages each carry ONE ``bytes`` field holding a
FlatBuffers-encoded ODF request/response
(``/root/reference/src/grpc.rs:84-86,115-121``:
``FlatbuffersEngineProtocol.read_transform_request(&req.flatbuffer)``).
This module provides:

1. a **generic FlatBuffers builder/reader** implementing the public
   wire format exactly (little-endian scalars; u32 forward uoffsets;
   tables = i32 soffset to a vtable of u16 slot offsets; length-
   prefixed strings/vectors) — format-level behavior is fully testable
   and tested (round-trip + hand-decoded golden bytes);
2. **layout tables for the ODF messages** mapping flatbuffers field
   slots to the same dict shape the JSON transport uses.

**Layout caveat (documented environment blocker):** the authoritative
``.fbs`` schema lives in the ``opendatafabric-metadata`` crate
(``kamu-data/kamu-cli``), which is NOT vendored into the reference
checkout and cannot be fetched here (no network). Slot numbers below
follow the reference DTO field order; regenerating them against the
official schema is a constants-only change to ``LAYOUTS`` — the wire
framing above it (gRPC, HTTP/2, protobuf envelope) is exact either
way. Timestamps travel as int64 Unix epoch milliseconds UTC (the
engine's own timestamp normal form).
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

# ---------------------------------------------------------------------------
# generic builder
# ---------------------------------------------------------------------------

_SCALARS = {
    "bool": ("<b", 1),
    "uint8": ("<B", 1),
    "int32": ("<i", 4),
    "int64": ("<q", 8),
    "float64": ("<d", 8),
}


class _Node:
    pass


class _Str(_Node):
    def __init__(self, s: str) -> None:
        self.data = s.encode("utf-8")


class _Vec(_Node):
    def __init__(self, kind: str, items: list) -> None:
        self.kind = kind  # "offset" (nodes) or a scalar kind
        self.items = items


class _Table(_Node):
    def __init__(self, slots: list[tuple[int, str, object]]) -> None:
        # (slot_index, kind, value): kind "offset" -> value is _Node
        self.slots = slots


def _align(pos: int, a: int) -> int:
    return (pos + a - 1) & ~(a - 1)


def build(root: _Table) -> bytes:
    """Serialize the node graph: root uoffset first, nodes in BFS order
    (parents at lower addresses, all uoffsets point forward)."""
    order: list[_Node] = []
    seen: set[int] = set()
    queue: list[_Node] = [root]
    while queue:
        node = queue.pop(0)
        if id(node) in seen:
            continue
        seen.add(id(node))
        order.append(node)
        if isinstance(node, _Table):
            queue += [v for _, k, v in node.slots if k == "offset" and v is not None]
        elif isinstance(node, _Vec) and node.kind == "offset":
            queue += list(node.items)

    # --- plan table internals -------------------------------------------
    plans: dict[int, dict] = {}
    for node in order:
        if not isinstance(node, _Table):
            continue
        max_slot = max((s for s, _, _ in node.slots), default=-1)
        vsize = 4 + 2 * (max_slot + 1)
        fields = []  # (slot, kind, value, rel_off)
        rel = 4  # table starts with the i32 soffset
        for slot, kind, value in sorted(node.slots, key=lambda t: -_SCALARS.get(t[1], ("", 4))[1]):
            width = _SCALARS[kind][1] if kind in _SCALARS else 4
            rel = _align(rel, width)
            fields.append((slot, kind, value, rel))
            rel += width
        plans[id(node)] = {"vsize": vsize, "tsize": rel, "fields": fields}

    # --- assign addresses ------------------------------------------------
    addr: dict[int, int] = {}
    pos = 4  # root uoffset
    for node in order:
        if isinstance(node, _Table):
            plan = plans[id(node)]
            pos = _align(pos, 2)
            vt = pos
            pos = _align(pos + plan["vsize"], 8)
            addr[id(node)] = pos
            plan["vt"] = vt
            pos += plan["tsize"]
        elif isinstance(node, _Str):
            pos = _align(pos, 4)
            addr[id(node)] = pos
            pos += 4 + len(node.data) + 1
        elif isinstance(node, _Vec):
            width = 4 if node.kind == "offset" else _SCALARS[node.kind][1]
            pos = _align(pos, max(4, width))
            addr[id(node)] = pos
            pos += 4 + width * len(node.items)

    # --- emit ------------------------------------------------------------
    buf = bytearray(pos)
    struct.pack_into("<I", buf, 0, addr[id(root)])
    for node in order:
        p = addr[id(node)]
        if isinstance(node, _Table):
            plan = plans[id(node)]
            vt = plan["vt"]
            struct.pack_into("<H", buf, vt, plan["vsize"])
            struct.pack_into("<H", buf, vt + 2, plan["tsize"])
            struct.pack_into("<i", buf, p, p - vt)  # soffset
            for slot, kind, value, rel in plan["fields"]:
                struct.pack_into("<H", buf, vt + 4 + 2 * slot, rel)
                if kind == "offset":
                    struct.pack_into("<I", buf, p + rel, addr[id(value)] - (p + rel))
                else:
                    fmt = _SCALARS[kind][0]
                    struct.pack_into(fmt, buf, p + rel, value)
        elif isinstance(node, _Str):
            struct.pack_into("<I", buf, p, len(node.data))
            buf[p + 4 : p + 4 + len(node.data)] = node.data
        elif isinstance(node, _Vec):
            struct.pack_into("<I", buf, p, len(node.items))
            if node.kind == "offset":
                for i, item in enumerate(node.items):
                    at = p + 4 + 4 * i
                    struct.pack_into("<I", buf, at, addr[id(item)] - at)
            else:
                fmt, width = _SCALARS[node.kind]
                for i, item in enumerate(node.items):
                    struct.pack_into(fmt, buf, p + 4 + width * i, item)
    return bytes(buf)


class Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf

    def root(self) -> int:
        return struct.unpack_from("<I", self.buf, 0)[0]

    def field_pos(self, table_pos: int, slot: int) -> int | None:
        soff = struct.unpack_from("<i", self.buf, table_pos)[0]
        vt = table_pos - soff
        vsize = struct.unpack_from("<H", self.buf, vt)[0]
        entry = 4 + 2 * slot
        if entry + 2 > vsize:
            return None
        rel = struct.unpack_from("<H", self.buf, vt + entry)[0]
        return table_pos + rel if rel else None

    def scalar(self, table_pos: int, slot: int, kind: str, default=None):
        p = self.field_pos(table_pos, slot)
        if p is None:
            return default
        return struct.unpack_from(_SCALARS[kind][0], self.buf, p)[0]

    def offset(self, table_pos: int, slot: int) -> int | None:
        p = self.field_pos(table_pos, slot)
        if p is None:
            return None
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, table_pos: int, slot: int) -> str | None:
        p = self.offset(table_pos, slot)
        if p is None:
            return None
        n = struct.unpack_from("<I", self.buf, p)[0]
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def vector(self, table_pos: int, slot: int) -> list[int] | None:
        """Positions of offset-vector elements (tables/strings)."""
        p = self.offset(table_pos, slot)
        if p is None:
            return None
        n = struct.unpack_from("<I", self.buf, p)[0]
        out = []
        for i in range(n):
            at = p + 4 + 4 * i
            out.append(at + struct.unpack_from("<I", self.buf, at)[0])
        return out

    def str_at(self, pos: int) -> str:
        n = struct.unpack_from("<I", self.buf, pos)[0]
        return self.buf[pos + 4 : pos + 4 + n].decode("utf-8")


# ---------------------------------------------------------------------------
# ODF layouts: slot tables ↔ the JSON-DTO dict shape
# ---------------------------------------------------------------------------

# kind vocabulary: "string" | "int64" | "uint8" | "ts_millis" |
# "table:<Layout>" | "vector_table:<Layout>" | "vector_string"
LAYOUTS: dict[str, list[tuple[int, str, str]]] = {
    "DatasetVocabulary": [
        (0, "offset_column", "string"),
        (1, "operation_type_column", "string"),
        (2, "system_time_column", "string"),
        (3, "event_time_column", "string"),
    ],
    "SqlQueryStep": [
        (0, "query", "string"),
        (1, "alias", "string"),
    ],
    "TransformSql": [
        (0, "engine", "string"),
        (1, "version", "string"),
        (2, "query", "string"),
        (3, "queries", "vector_table:SqlQueryStep"),
    ],
    "OffsetInterval": [
        (0, "start", "int64"),
        (1, "end", "int64"),
    ],
    "Watermark": [
        (0, "system_time", "ts_millis"),
        (1, "event_time", "ts_millis"),
    ],
    "TransformRequestInput": [
        (0, "dataset_id", "string"),
        (1, "dataset_alias", "string"),
        (2, "query_alias", "string"),
        (3, "vocab", "table:DatasetVocabulary"),
        (4, "offset_interval", "table:OffsetInterval"),
        (5, "data_paths", "vector_string"),
        (6, "schema_file", "string"),
        (7, "explicit_watermarks", "vector_table:Watermark"),
    ],
    "TransformRequest": [
        (0, "dataset_id", "string"),
        (1, "dataset_alias", "string"),
        (2, "system_time", "ts_millis"),
        (3, "vocab", "table:DatasetVocabulary"),
        (4, "transform", "table:TransformSql"),
        (5, "query_inputs", "vector_table:TransformRequestInput"),
        (6, "next_offset", "int64"),
        (7, "prev_checkpoint_path", "string"),
        (8, "new_checkpoint_path", "string"),
        (9, "new_data_path", "string"),
    ],
    "RawQueryRequest": [
        (0, "input_data_paths", "vector_string"),
        (1, "transform", "table:TransformSql"),
        (2, "output_data_path", "string"),
    ],
    # responses: union (type tag + value table), flatbuffers convention
    # 0 = NONE then variants in declaration order
    "TransformResponseSuccess": [
        (0, "new_offset_interval", "table:OffsetInterval"),
        (1, "new_watermark", "ts_millis"),
    ],
    "ResponseInvalidQuery": [
        (0, "message", "string"),
    ],
    "ResponseInternalError": [
        (0, "message", "string"),
        (1, "backtrace", "string"),
    ],
    "RawQueryResponseSuccess": [
        (0, "num_records", "int64"),
    ],
    "ResponseRoot": [
        (0, "value_type", "uint8"),
        (1, "value", "table:?"),  # variant resolved via value_type
    ],
}

#: union tags, NONE=0 then declaration order (Progress reserved = 1)
UNION_PROGRESS, UNION_SUCCESS, UNION_INVALID_QUERY, UNION_INTERNAL_ERROR = (
    1,
    2,
    3,
    4,
)


def _ts_to_millis(v) -> int:
    if isinstance(v, (int, float)):
        return int(v)
    dt = datetime.fromisoformat(str(v).replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def millis_to_iso(ms: int) -> str:
    return (
        datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
        .isoformat()
        .replace("+00:00", "Z")
    )


def encode_table(layout_name: str, data: dict) -> _Table:
    slots: list[tuple[int, str, object]] = []
    for slot, key, kind in LAYOUTS[layout_name]:
        v = data.get(key)
        if v is None:
            continue
        if kind == "string":
            slots.append((slot, "offset", _Str(v)))
        elif kind in ("int64", "uint8"):
            slots.append((slot, kind, int(v)))
        elif kind == "ts_millis":
            slots.append((slot, "int64", _ts_to_millis(v)))
        elif kind == "vector_string":
            slots.append((slot, "offset", _Vec("offset", [_Str(s) for s in v])))
        elif kind.startswith("table:"):
            slots.append((slot, "offset", encode_table(kind[6:], v)))
        elif kind.startswith("vector_table:"):
            sub = kind.split(":", 1)[1]
            slots.append(
                (slot, "offset", _Vec("offset", [encode_table(sub, x) for x in v]))
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown kind {kind}")
    return _Table(slots)


def decode_table(r: Reader, pos: int, layout_name: str) -> dict:
    """Absent fields: scalars take the flatbuffers default (0 — standard
    builders omit default-valued scalars), reference kinds are OMITTED
    from the dict entirely so downstream ``dict.get``/dataclass-default
    logic applies (an explicit None would override e.g. the
    DatasetVocabulary column defaults)."""
    out: dict = {}
    for slot, key, kind in LAYOUTS[layout_name]:
        if kind == "string":
            v = r.string(pos, slot)
            if v is not None:
                out[key] = v
        elif kind in ("int64", "uint8"):
            out[key] = r.scalar(pos, slot, kind, 0)
        elif kind == "ts_millis":
            ms = r.scalar(pos, slot, "int64")
            if ms is not None:
                out[key] = millis_to_iso(ms)
        elif kind == "vector_string":
            ps = r.vector(pos, slot)
            if ps is not None:
                out[key] = [r.str_at(p) for p in ps]
        elif kind.startswith("table:") and not kind.endswith("?"):
            p = r.offset(pos, slot)
            if p is not None:
                out[key] = decode_table(r, p, kind[6:])
        elif kind.startswith("vector_table:"):
            sub = kind.split(":", 1)[1]
            ps = r.vector(pos, slot)
            if ps is not None:
                out[key] = [decode_table(r, p, sub) for p in ps]
    return out


# -- public payload API -----------------------------------------------------


def encode_transform_request(body: dict) -> bytes:
    return build(encode_table("TransformRequest", body))


def decode_transform_request(buf: bytes) -> dict:
    r = Reader(buf)
    return decode_table(r, r.root(), "TransformRequest")


def encode_raw_query_request(body: dict) -> bytes:
    return build(encode_table("RawQueryRequest", body))


def decode_raw_query_request(buf: bytes) -> dict:
    r = Reader(buf)
    return decode_table(r, r.root(), "RawQueryRequest")


def encode_response(kind: int, payload_layout: str, payload: dict) -> bytes:
    root = _Table(
        [
            (0, "uint8", kind),
            (1, "offset", encode_table(payload_layout, payload)),
        ]
    )
    return build(root)


def decode_response(buf: bytes, success_layout: str) -> tuple[int, dict]:
    r = Reader(buf)
    pos = r.root()
    kind = r.scalar(pos, 0, "uint8", 0)
    p = r.offset(pos, 1)
    if p is None:
        return kind, {}
    layout = {
        UNION_SUCCESS: success_layout,
        UNION_INVALID_QUERY: "ResponseInvalidQuery",
        UNION_INTERNAL_ERROR: "ResponseInternalError",
    }.get(kind)
    return kind, decode_table(r, p, layout) if layout else {}
