"""Dump .explain('formatted') for the headline bench queries into
plans/r18/<query>_<tag>.txt (judge evidence for OPTIMIZATION_r18.md).

Usage: python tools/dump_r18_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kamu_engine_datafusion_spark import queries as q  # noqa: E402
from kamu_engine_datafusion_spark.session import odf_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")
    os.makedirs(outdir, exist_ok=True)
    spark = odf_session("r18-plans")
    registry = q.registry()
    for name in names:
        fn = registry[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
