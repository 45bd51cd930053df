"""Budget-cap drain overhead lab (BENCH/BASELINE.md "Budget-cap drain
overhead" follow-up): A/B the two ways of delivering per-host budget caps
to the drain on the same 2M-row / 2000-host workload at pinned cores.

    python tools/cap_lab.py               # orchestrate (default 8 cores)
    python tools/cap_lab.py --worker 8    # one level, all variants

Variants (identical drained set/order for the two capped ones):
  uncapped    drain_split with no caps — the floor the overhead is paid on
  cap_row     caps broadcast-probed onto every backlog row before the drain
              (the round-3 design this lab exists to retire)
  cap_route   caps joined onto the host-cardinality routing table and read
              back via its ``_bb`` column (current drain_epoch path)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_HOSTS = int(os.environ.get("CAPLAB_HOSTS", "2000"))
ROWS_PER_HOST = int(os.environ.get("CAPLAB_ROWS_PER_HOST", "1000"))
LEVELS = tuple(int(x) for x in os.environ.get("CAPLAB_LEVELS", "8").split(","))
ITERS = int(os.environ.get("CAPLAB_ITERS", "2"))


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from frontier_engine.frontier import DrainConfig, drain_split
    from frontier_engine.session import get_spark

    spark = get_spark(f"caplab-{cpus}", cores=cpus, shuffle_partitions=64)
    # deterministic synthetic backlog: N_HOSTS hosts x ROWS_PER_HOST urls,
    # priority a fixed permutation of the per-host sequence
    allowed = (
        spark.range(N_HOSTS * ROWS_PER_HOST)
        .select(
            F.concat(F.lit("h"), F.format_string("%04d", (F.col("id") % N_HOSTS).cast("int"))).alias("host"),
            F.col("id").alias("enqueue_seq"),
            F.xxhash64(F.col("id")).alias("url_hash"),
            ((F.pmod(F.xxhash64(F.col("id")), F.lit(100000))) / 100000.0).alias("priority"),
            F.lit(0).alias("depth"),
            F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
            F.lit(0).alias("fetch_attempts"),
            F.lit(1.0).alias("crawl_delay"),
        )
        .withColumn(
            "url",
            F.concat(F.lit("http://"), F.col("host"), F.lit("/p"), F.col("enqueue_seq")),
        )
        .repartition(128)
        .persist()
    )
    n = allowed.count()
    cfg = DrainConfig(epoch_seconds=30.0, max_salts=8)  # politeness budget 30/host
    # cap half the hosts at 10 (even numeric suffix)
    caps = (
        spark.range(N_HOSTS)
        .filter(F.col("id") % 2 == 0)
        .select(
            F.concat(F.lit("h"), F.format_string("%04d", F.col("id").cast("int"))).alias("host"),
            F.lit(10).cast("int").alias("_hb_cap"),
        )
        .persist()
    )
    caps.count()

    variants = {
        "uncapped": lambda: drain_split(allowed, cfg)[0],
        "cap_row": lambda: drain_split(
            allowed.join(F.broadcast(caps), "host", "left"), cfg
        )[0],
        "cap_route": lambda: drain_split(allowed, cfg, host_caps=caps)[0],
    }
    out = {"cpus": cpus, "n_allowed": n, "walls": {}, "counts": {}, "shas": {}}
    for name, fn in variants.items():
        best = float("inf")
        cnt = None
        for _ in range(ITERS):
            t0 = time.time()
            cnt = fn().count()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
            allowed.persist()
            allowed.count()
            caps.persist()
            caps.count()
        out["walls"][name] = round(best, 3)
        out["counts"][name] = cnt
    for name in ("cap_row", "cap_route"):
        rows = (
            variants[name]()
            .select("host", "slot", "url")
            .orderBy("host", "slot", "url")
            .collect()
        )
        out["shas"][name] = hashlib.sha256(
            "\n".join(f"{r['host']}\t{r['slot']}\t{r['url']}" for r in rows).encode()
        ).hexdigest()
        spark.catalog.clearCache()
        allowed.persist()
        allowed.count()
    print(json.dumps(out))
    spark.stop()


def orchestrate() -> int:
    mem_per_core = float(os.environ.get("SCALING_MEM_PER_CORE_GB", "1.5"))
    for cpus in LEVELS:
        env = dict(os.environ)
        env.setdefault("SPARK_DRIVER_MEM", f"{max(2, round(mem_per_core * cpus))}g")
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__), "--worker", str(cpus),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO, check=False)
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-2000:])
            return 1
        res = json.loads(lines[-1])
        print(f"local[{cpus}]:", lines[-1])
        assert res["counts"]["cap_row"] == res["counts"]["cap_route"]
        assert res["shas"]["cap_row"] == res["shas"]["cap_route"], "capped schedules differ"
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        sys.exit(orchestrate())
