"""Run N back-to-back scaling sweeps and aggregate medians.

    python tools/sweep_batch.py 3            # 3 sweeps at SCALING_LEVELS
Appends one JSON line per sweep to BENCH/sweeps.jsonl (levels, throughputs,
efficiencies, schedule sha, timestamp-free) and prints the median
efficiency per path. BENCH/BASELINE.md cites these lines.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_sweep() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py")],
        capture_output=True, text=True, cwd=REPO, check=False,
    )
    res = {}
    for line in out.stdout.splitlines():
        m = re.match(r"local\[(\d+)\] \(pinned to \d+ cores[^)]*\): (\{.*\})", line)
        if m:
            cpus, r = int(m.group(1)), json.loads(m.group(2))
            # with SCALING_REPS > 1 there are several lines per level; keep
            # the best frontier throughput (same best-per-level rule as the
            # orchestrator: contention is one-sided, max ≈ uncontended)
            if cpus not in res or r["frontier_throughput"] > res[cpus]["frontier_throughput"]:
                res[cpus] = r
    if len(res) < 2:
        raise RuntimeError(out.stdout[-3000:] + out.stderr[-2000:])
    levels = sorted(res)
    lo, hi = levels[0], levels[1]
    ratio = hi / lo
    return {
        "levels": levels,
        "extract_thr": {c: res[c]["extract_throughput"] for c in levels},
        "frontier_thr": {c: res[c]["frontier_throughput"] for c in levels},
        "eff_extract": round(res[hi]["extract_throughput"] / (ratio * res[lo]["extract_throughput"]), 3),
        "eff_frontier": round(res[hi]["frontier_throughput"] / (ratio * res[lo]["frontier_throughput"]), 3),
        "schedule_sha": {c: res[c]["schedule_sha256"] for c in levels},
        "n_drained": res[lo]["n_drained"],
        "conf": os.environ.get("FE_SPARK_EXTRA_CONF", ""),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    path = os.path.join(REPO, "BENCH", "sweeps.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    effs_e, effs_f = [], []
    for i in range(n):
        s = one_sweep()
        assert len(set(s["schedule_sha"].values())) == 1, "schedule differs across levels"
        with open(path, "a") as f:
            f.write(json.dumps(s) + "\n")
        effs_e.append(s["eff_extract"])
        effs_f.append(s["eff_frontier"])
        print(f"sweep {i + 1}/{n}: extract={s['eff_extract']} frontier={s['eff_frontier']}")
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"medians over {n} sweeps: extract={med(effs_e)} frontier={med(effs_f)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
