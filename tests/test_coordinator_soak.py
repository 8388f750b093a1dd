"""Coordinator soak over the real wire (r8 verdict item 3).

``streaming/incremental.py::IncrementalRunner`` — the coordinator state
machine — drives the engine THROUGH the gRPC façade
(``transport/grpc_server.py``) over a real TCP socket: ≥3 transform
ticks as the input ledger grows, one mid-run engine restart, and a raw
query over the produced output ledger. Asserts offset continuity (A20)
and watermark propagation (A19) end-to-end — the reference's whole
deployment shape (``src/grpc.rs:132``, ``src/main.rs:20``) in one test:
a stateless engine process serving :2884-shaped RPCs, all incremental
state living coordinator-side and surviving the engine restart.
"""

from __future__ import annotations

import glob
import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from kamu_engine_datafusion_spark.plans.types import (
    OffsetInterval,
    SqlQueryStep,
    TransformResponse,
    Watermark,
)
from kamu_engine_datafusion_spark.streaming.incremental import (
    IncrementalRunner,
    LedgerInput,
)
from kamu_engine_datafusion_spark.transport import odf_flatbuffers as fb
from kamu_engine_datafusion_spark.transport.grpc_server import (
    proto_unwrap,
    proto_wrap,
    serve_grpc,
)
from kamu_engine_datafusion_spark.transport.http_server import (
    transform_request_to_dict,
)
from tests.test_grpc_transport import GrpcTestClient

UTC = timezone.utc
T = [datetime(2023, 1, d, tzinfo=UTC) for d in range(1, 10)]


def _append_part(ledger_dir: str, part: int, start_offset: int, rows) -> None:
    """Append one offset-dense ledger part file (the coordinator's view
    of new upstream data between ticks)."""
    n = len(rows)
    tbl = pa.table(
        {
            "offset": pa.array(
                range(start_offset, start_offset + n), pa.int64()
            ),
            "op": pa.array([0] * n, pa.int32()),
            "system_time": pa.array(
                [datetime(2023, 1, 1, tzinfo=UTC)] * n, pa.timestamp("ms", "UTC")
            ),
            "event_time": pa.array(
                [r[0] for r in rows], pa.timestamp("ms", "UTC")
            ),
            "city": pa.array([r[1] for r in rows]),
            "population": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    os.makedirs(ledger_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(ledger_dir, f"slice-{part:03d}.parquet"))


def _wire_executor(port_holder: dict):
    """A tick executor that ships the TransformRequest over gRPC instead
    of calling the engine in-process — reconnecting per call, exactly
    like a coordinator that outlives engine restarts."""

    def run(spark, req) -> TransformResponse:
        body = transform_request_to_dict(req)
        client = GrpcTestClient(port_holder["port"])
        try:
            headers, msgs = client.call(
                "/engine.Engine/ExecuteTransform",
                proto_wrap(fb.encode_transform_request(body)),
            )
        finally:
            client.close()
        assert headers["grpc-status"] == "0"
        kind, resp = fb.decode_response(
            proto_unwrap(msgs[0]), "TransformResponseSuccess"
        )
        assert kind == fb.UNION_SUCCESS, resp
        oi = resp.get("new_offset_interval")
        wm = resp.get("new_watermark")
        return TransformResponse(
            new_offset_interval=(
                OffsetInterval(oi["start"], oi["end"]) if oi else None
            ),
            new_watermark=(
                datetime.fromisoformat(wm.replace("Z", "+00:00")) if wm else None
            ),
        )

    return run


def test_coordinator_soak_three_ticks_with_engine_restart(spark, tmp_path):
    ledger_dir = str(tmp_path / "input_ledger")
    out_dir = str(tmp_path / "output_ledger")
    port_holder: dict = {}
    server = serve_grpc(spark, port=0)
    port_holder["port"] = server.server_address[1]

    src = LedgerInput(
        dataset_alias="src", query_alias="src", ledger_dir=ledger_dir
    )
    runner = IncrementalRunner(
        spark=spark,
        transform=[
            SqlQueryStep(
                query=(
                    "select event_time, city, population * 2 as pop2 "
                    "from src"
                )
            )
        ],
        inputs=[src],
        output_dir=out_dir,
        executor=_wire_executor(port_holder),
    )

    try:
        # ---- tick 1: first slice, no watermark yet --------------------
        _append_part(
            ledger_dir, 0, 0,
            [(T[0], "vancouver", 675000), (T[0], "seattle", 733000),
             (T[1], "kyiv", 2884000)],
        )
        r1 = runner.tick(datetime(2023, 2, 1, tzinfo=UTC))
        assert r1 is not None
        assert r1.new_offset_interval == OffsetInterval(0, 2)
        assert runner.next_offset == 3
        assert runner.last_watermark is None  # no explicit watermarks yet

        # ---- idle tick: no new data → no request, state unchanged -----
        assert runner.tick(datetime(2023, 2, 2, tzinfo=UTC)) is None
        assert runner.next_offset == 3 and src.next_unread_offset == 3

        # ---- tick 2: second slice + first watermark -------------------
        _append_part(
            ledger_dir, 1, 3,
            [(T[2], "odesa", 1010000), (T[3], "lviv", 717000)],
        )
        src.watermarks = [Watermark(datetime(2023, 2, 3, tzinfo=UTC), T[2])]
        r2 = runner.tick(datetime(2023, 2, 3, tzinfo=UTC))
        assert r2.new_offset_interval == OffsetInterval(3, 4)  # A20: dense
        assert runner.last_watermark == T[2]  # A19 over the wire
        assert runner.next_offset == 5

        # ---- ENGINE RESTART: stateless engine, coordinator state lives
        # on. New server process-equivalent (fresh Engine + socket); the
        # coordinator just reconnects to the new port. -----------------
        server.shutdown()
        server = serve_grpc(spark, port=0)
        port_holder["port"] = server.server_address[1]

        # ---- tick 3 (post-restart): continuity must hold --------------
        _append_part(
            ledger_dir, 2, 5,
            [(T[4], "kharkiv", 1421000), (T[5], "dnipro", 968000),
             (T[5], "mariupol", 425000)],
        )
        src.watermarks = [
            Watermark(datetime(2023, 2, 3, tzinfo=UTC), T[2]),
            Watermark(datetime(2023, 2, 4, tzinfo=UTC), T[4]),
        ]
        r3 = runner.tick(datetime(2023, 2, 4, tzinfo=UTC))
        assert r3.new_offset_interval == OffsetInterval(5, 7)  # A20 across restart
        assert runner.last_watermark == T[4]  # max per input, advanced
        assert runner.next_offset == 8

        # ---- output ledger: one file per non-empty tick, offsets dense
        # 0..7 across files in tick order (A20 end-to-end) --------------
        parts = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
        assert len(parts) == 3
        offsets = []
        for p in parts:
            t = pq.read_table(p)
            offsets += t.column("offset").to_pylist()
            names = t.schema.names
            assert names[:4] == ["offset", "op", "system_time", "event_time"]
        assert offsets == list(range(8))

        # ---- raw query over the produced ledger, same wire ------------
        raw_out = str(tmp_path / "raw_out.parquet")
        client = GrpcTestClient(port_holder["port"])
        try:
            headers, msgs = client.call(
                "/engine.Engine/ExecuteRawQuery",
                proto_wrap(
                    fb.encode_raw_query_request(
                        {
                            "input_data_paths": parts,
                            "transform": {
                                "queries": [
                                    {
                                        "query": (
                                            "select count(*) as n, "
                                            "sum(pop2) as pop2_sum "
                                            "from input"
                                        )
                                    }
                                ]
                            },
                            "output_data_path": raw_out,
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
        assert resp["num_records"] == 1
        row = pq.read_table(raw_out).to_pylist()[0]
        assert row["n"] == 8
        assert row["pop2_sum"] == 2 * (
            675000 + 733000 + 2884000 + 1010000 + 717000
            + 1421000 + 968000 + 425000
        )
    finally:
        server.shutdown()
