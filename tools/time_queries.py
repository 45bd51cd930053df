"""Time EVERY queries() entry with the noop sink (guide §1.4) at a given
SF — the round-6 full-contract timing audit behind OPTIMIZATION_r06.md's
checklist. Output: one JSON line per query to stdout.

Usage: python tools/time_queries.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entrymod
    from frontier_engine.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("time-queries", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entrymod.queries()
    out = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(name)
        try:
            t_build0 = time.time()
            df = fn(spark, sf)
            t_build = time.time() - t_build0
            best = None
            for _ in range(reps):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            print(json.dumps({"q": name, "sec": round(best, 3), "build": round(t_build, 3)}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": name, "error": f"{type(exc).__name__}: {exc}"[:200]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    total = round(sum(out.values()), 2)
    print(json.dumps({"total_all_queries": total, "n": len(out), "sf": sf}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
