"""Interleaved A/B: histogram pre-cut (DrainConfig.precut_bins) on vs off
on the frontier path, at pinned 2 and 8 cores. Strictly interleaved so
co-tenant load hits both arms equally.

    python tools/ab_precut.py 2     # 2 interleaved rounds
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "tools", "scaling_bench.py")
LEVELS = (2, 8)
MEM_PER_CORE = float(os.environ.get("SCALING_MEM_PER_CORE_GB", "1.5"))


def run_worker(cpus: int, precut: bool) -> dict:
    env = dict(os.environ)
    env["SCALING_SKIP_EXTRACT"] = "1"
    env["SCALING_PRECUT"] = "1" if precut else "0"
    env["SPARK_DRIVER_MEM"] = f"{max(2, round(MEM_PER_CORE * cpus))}g"
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, BENCH, "--worker", str(cpus)],
        capture_output=True, text=True, env=env, cwd=REPO, check=False,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    thr: dict[tuple[str, int], list[float]] = {}
    effs: dict[str, list[float]] = {"precut": [], "nocut": []}
    shas = set()
    for i in range(rounds):
        for name, on in (("precut", True), ("nocut", False)):
            r = {c: run_worker(c, on) for c in LEVELS}
            lo, hi = LEVELS
            eff = r[hi]["frontier_throughput"] / ((hi / lo) * r[lo]["frontier_throughput"])
            effs[name].append(round(eff, 3))
            for c in LEVELS:
                thr.setdefault((name, c), []).append(r[c]["frontier_throughput"])
            shas.update(x["schedule_sha256"] for x in r.values())
            print(f"round {i + 1} {name:7s} "
                  f"thr2={r[lo]['frontier_throughput']:>9,.0f} "
                  f"thr8={r[hi]['frontier_throughput']:>9,.0f} eff={eff:.3f}", flush=True)
    print("schedule shas all identical:", len(shas) == 1)
    for name, xs in effs.items():
        print(f"{name:7s} effs={xs} median={statistics.median(xs):.3f}  "
              f"best thr2={max(thr[(name, 2)]):,.0f} thr8={max(thr[(name, 8)]):,.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
