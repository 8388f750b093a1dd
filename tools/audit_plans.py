"""Full-registry physical-plan anti-pattern audit.

The pytest net (`tests/test_plans.py::
test_no_plan_antipatterns_in_verification_window`) pins the driver's
~50-key verification window; this tool sweeps EVERY registry key and
reports, per key:

- ``CartesianProduct`` / ``BatchEvalPython`` in the executed plan —
  HARD failures (an unbroadcast cross join scans quadratically; a
  row-at-a-time Python UDF abandons Arrow batching). Exit code 1 if
  any key has one.
- logical ``Window`` nodes with an EMPTY partition spec — a global
  window serializes through one task, so every occurrence must be
  justified by a bounded-input contract (top-k lists, vocab-sized
  aggregates) or have a distributed twin. These are LISTED for review,
  not failed: the audit's value is that the list is exhaustive and
  each entry is accounted for in SCALE.md.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kamu_engine_datafusion_spark import queries as q  # noqa: E402
from kamu_engine_datafusion_spark.session import odf_session  # noqa: E402


def _walk(jnode):
    yield jnode
    kids = jnode.children()
    for i in range(kids.length()):
        yield from _walk(kids.apply(i))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = odf_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    hard: dict[str, list[str]] = {}
    global_windows: dict[str, int] = {}
    errors: dict[str, str] = {}
    n = 0
    for name, fn in q.registry().items():
        n += 1
        try:
            df = fn(spark, sf)
            qe = df._jdf.queryExecution()
            phys = qe.executedPlan().toString()
            hits = [
                p
                for p in ("CartesianProduct", "BatchEvalPython")
                if p in phys
            ]
            if hits:
                hard[name] = hits
            empties = 0
            for node in _walk(qe.optimizedPlan()):
                if (
                    node.getClass().getSimpleName() == "Window"
                    and node.partitionSpec().isEmpty()
                ):
                    empties += 1
            if empties:
                global_windows[name] = empties
        except Exception as e:  # noqa: BLE001 — audit must cover all keys
            errors[name] = f"{type(e).__name__}: {e}"[:120]
    print(f"audited {n} keys at {sf}")
    print(f"HARD anti-patterns (CartesianProduct/BatchEvalPython): {hard or 'none'}")
    print("keys with partitionBy-less Window nodes (review list):")
    for k, c in sorted(global_windows.items()):
        print(f"  {k}: {c}")
    if errors:
        print(f"errors: {errors}")
    return 1 if hard or errors else 0


if __name__ == "__main__":
    sys.exit(main())
