"""r17: one-rep noop-sink timing of EVERY registered query at the
given SF dir — the coverage pass behind the optimization checklist
(guide §1.2: find where the time actually is before touching code).

Usage: python tools/time_all_keys.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kamu_engine_datafusion_spark import queries as q  # noqa: E402
from kamu_engine_datafusion_spark.session import odf_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = odf_session("r17-time-all")
    reg = q.registry()
    results = {}
    for name, fn in reg.items():
        best = None
        try:
            for i in range(reps):
                spark.sparkContext.setJobDescription(f"{name} #{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name] = best
            print(f"TIME {name}: {best:.3f}s", flush=True)
        except Exception as e:  # keep sweeping
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
    print("== slowest ==")
    for name, t in sorted(results.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {t:8.3f}s  {name}")


if __name__ == "__main__":
    main()
