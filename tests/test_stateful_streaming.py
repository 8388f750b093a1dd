"""Custom stateful operator: per-key running totals across micro-batches."""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from kamu_engine_datafusion_spark.streaming.stateful import running_totals
from kamu_engine_datafusion_spark.streaming.structured import ledger_stream

UTC = timezone.utc


def _write_events(path: str, rows: list[tuple[int, float]]) -> None:
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "ts": pa.array(
                [datetime(2023, 1, 1, tzinfo=UTC)] * len(rows),
                pa.timestamp("ms", "UTC"),
            ),
        }
    )
    pq.write_table(tbl, path)


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    # two part files -> two micro-batches (maxFilesPerTrigger=1)
    _write_events(str(d / "part-0.parquet"), [(1, 10.0), (1, 5.0), (2, 1.0)])
    _write_events(str(d / "part-1.parquet"), [(1, 2.0), (3, 7.0)])
    schema = spark.read.parquet(str(d / "part-0.parquet")).schema

    stream = ledger_stream(spark, str(d), schema)
    out = running_totals(stream, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("running").collect()
    # last emission per key reflects the accumulated state
    latest = {}
    for r in rows:
        latest[r["key"]] = (r["n_events"], r["total_value"])
    assert latest[1] == (3, 17.0)  # 2 rows batch-1 + 1 row batch-2
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)


def test_debounce_stream_anchor_semantics_across_batches(spark, tmp_path):
    """Anchor-based debounce: a slow-drip burst (every inter-event gap
    under the threshold) collapses to ONE event per gap window — the
    fold the batch lag form can't express — and the anchor survives
    across micro-batches (an early event in batch 2 is suppressed by
    batch 1's anchor)."""
    from datetime import timedelta

    from kamu_engine_datafusion_spark.streaming.stateful import (
        debounce_stream,
    )

    d = tmp_path / "dstream"
    d.mkdir()
    t0 = datetime(2023, 1, 1, tzinfo=UTC)

    def write(path, rows):  # rows: (event_id, user, offset_seconds)
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [t0 + timedelta(seconds=r[2]) for r in rows],
                    pa.timestamp("ms", "UTC"),
                ),
            }
        )
        pq.write_table(tbl, path)

    # batch 1: slow drip at 0, 400, 800, 1200s (each gap 400 < 600) —
    # anchor semantics keep 0s and the first event >600 past it (800s),
    # then next anchor at 800 suppresses 1200 (gap 400)
    write(str(d / "part-0.parquet"), [(0, 1, 0), (1, 1, 400), (2, 1, 800), (3, 1, 1200)])
    # batch 2: 1500s (gap 300 from anchor 1200? anchor is 800 -> gap 700 > 600: kept)
    # and user 2's first event: always kept
    write(str(d / "part-1.parquet"), [(4, 1, 1500), (5, 2, 100)])
    # FileStreamSource orders micro-batches by file modification time;
    # back-to-back writes can tie (observed flaky under full-suite
    # load, where part-1 then processes FIRST and batch-1's anchor
    # suppresses batch-0's events). The anchor semantics under test
    # REQUIRE part-0 before part-1 — pin mtimes seconds apart.
    import os
    import time

    now = time.time()
    os.utime(str(d / "part-0.parquet"), (now - 10, now - 10))
    os.utime(str(d / "part-1.parquet"), (now, now))
    schema = spark.read.parquet(str(d / "part-0.parquet")).schema

    stream = ledger_stream(spark, str(d), schema)
    out = debounce_stream(stream, "user_id", "ts", "event_id", gap_seconds=600.0)
    q = (
        out.writeStream.format("memory")
        .queryName("debounced")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = sorted(r["event_id"] for r in spark.table("debounced").collect())
    # user 1: 0 (first), 2 (800s: 800-0 > 600), 4 (1500-800 > 600); 1, 3 suppressed
    # user 2: 5 (first)
    assert kept == [0, 2, 4, 5]


def test_hll_register_stream_matches_batch_union(spark, tmp_path):
    """Streaming HLL registers across two micro-batches must equal the
    batch registers of the full union — register max is associative +
    idempotent, so incremental maintenance is exact, not approximate-r."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq2
    from pyspark.sql import functions as F  # noqa: N812

    from kamu_engine_datafusion_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from kamu_engine_datafusion_spark.streaming.structured import (
        hll_register_stream,
        ledger_stream,
        run_to_memory,
    )

    words_a = [f"w{i * 37 % 101}x{i}" for i in range(200)]
    words_b = [f"w{i * 37 % 101}x{i}" for i in range(150, 350)]  # overlap

    d = tmp_path / "hllstream"
    d.mkdir()

    def write(path, words):
        pq2.write_table(
            pa.table({"k": pa.array(words, pa.string())}), path
        )

    write(str(d / "part-0.parquet"), words_a)
    write(str(d / "part-1.parquet"), words_b)
    now = time.time()
    os.utime(str(d / "part-0.parquet"), (now - 10, now - 10))
    os.utime(str(d / "part-1.parquet"), (now, now))

    schema = spark.read.parquet(str(d / "part-0.parquet")).schema
    stream = ledger_stream(spark, str(d), schema).withColumn(
        "g", F.lit("all")
    )
    out = run_to_memory(
        spark,
        hll_register_stream(stream, ["g"], "k", b=6),
        "hll_regs",
        output_mode="update",
    )
    # update mode re-emits a (g, bucket) row whenever its max changes;
    # the LAST emission per bucket is the maintained register
    rows = out.collect()
    streamed = {}
    for r in rows:
        streamed[r["bucket"]] = r["r"]

    batch = spark.createDataFrame(
        [(w,) for w in words_a + words_b], ["k"]
    ).withColumn("g", F.lit("all"))
    want = {
        r["bucket"]: r["r"]
        for r in hll_registers(batch, ["g"], "k", b=6).collect()
    }
    assert streamed == want

    # ... and the estimate over the maintained registers is the batch
    # estimate (bit-equal: same register multiset, dyadic-exact sum)
    maintained = spark.createDataFrame(
        [("all", bkt, r) for bkt, r in streamed.items()],
        "g string, bucket long, r long",
    )
    got_est = hll_estimate(maintained, ["g"], b=6).collect()[0]["hll_raw"]
    want_est = hll_estimate(
        hll_registers(batch, ["g"], "k", b=6), ["g"], b=6
    ).collect()[0]["hll_raw"]
    assert got_est == want_est
