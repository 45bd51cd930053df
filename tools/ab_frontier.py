"""Interleaved A/B of the frontier path's 2->8 scaling under different
Spark confs. Runs scaling_bench workers directly (frontier only), strictly
interleaving configs so co-tenant load hits both arms equally.

    python tools/ab_frontier.py 3     # 3 interleaved rounds
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "tools", "scaling_bench.py")

CONFIGS = {
    "defaults": "",
    "sizedparts": json.dumps({
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    }),
}
LEVELS = (2, 8)
MEM_PER_CORE = float(os.environ.get("SCALING_MEM_PER_CORE_GB", "1.5"))


def run_worker(cpus: int, conf: str) -> dict:
    env = dict(os.environ)
    env["SCALING_SKIP_EXTRACT"] = "1"
    env["SPARK_DRIVER_MEM"] = f"{max(2, round(MEM_PER_CORE * cpus))}g"
    if conf:
        env["FE_SPARK_EXTRA_CONF"] = conf
    else:
        env.pop("FE_SPARK_EXTRA_CONF", None)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, BENCH, "--worker", str(cpus)],
        capture_output=True, text=True, env=env, cwd=REPO, check=False,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    effs: dict[str, list[float]] = {k: [] for k in CONFIGS}
    shas = set()
    for i in range(rounds):
        for name, conf in CONFIGS.items():
            r = {c: run_worker(c, conf) for c in LEVELS}
            lo, hi = LEVELS
            eff = r[hi]["frontier_throughput"] / ((hi / lo) * r[lo]["frontier_throughput"])
            effs[name].append(round(eff, 3))
            shas.update(x["schedule_sha256"] for x in r.values())
            print(f"round {i + 1} {name:11s} "
                  f"thr2={r[lo]['frontier_throughput']:>9,.0f} "
                  f"thr8={r[hi]['frontier_throughput']:>9,.0f} eff={eff:.3f}", flush=True)
    print("schedule shas all identical:", len(shas) == 1)
    for name, xs in effs.items():
        print(f"{name:11s} effs={xs} median={statistics.median(xs):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
