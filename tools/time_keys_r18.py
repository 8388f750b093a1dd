"""r18: per-rep noop-sink timing of a named set of registered query
keys at the given SF dir — the round-18 measurement pass (guide §1).

Usage: python tools/time_keys_r18.py [sf_dir] [reps] key [key ...]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    keys = sys.argv[3:]
    spark = odf_session("r18-time-keys")
    reg = q.registry()
    for name in keys:
        fn = reg.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry", flush=True)
            continue
        times = []
        try:
            for i in range(reps):
                spark.sparkContext.setJobDescription(f"{name} #{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            reps_s = " ".join(f"{t:.3f}" for t in times)
            print(f"TIME {name}: [{reps_s}] min={min(times):.3f}", flush=True)
        except Exception as e:  # keep sweeping
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
