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
HEADLINE = [
    "b16_groupby_agg",
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
    for name in HEADLINE:
        fn = registry.get(name)
        if fn is None:
            continue
        # two runs, report the min: run 1 pays one-time janino/codegen
        # compilation (~2x inflation measured), which a long-lived engine
        # amortizes away
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
