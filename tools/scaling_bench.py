"""Scaling-efficiency evidence (BASELINE.md): the same crawl workload at
local[8] vs local[32] on the same input, reporting throughput at both plus
efficiency = throughput_32 / (4 × throughput_8), and verifying the drained
schedule is IDENTICAL at both parallelism levels (order determinism).

Each level runs in its own subprocess → fresh JVM, no cross-contamination.

    python tools/scaling_bench.py            # orchestrates, writes BENCH/BASELINE.md
    python tools/scaling_bench.py --worker 8 # one level, prints one JSON line
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

REPLICAS = int(os.environ.get("SCALING_REPLICAS", "8"))
LEVELS = (8, 32)


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from frontier_engine import canon, fixtures
    from frontier_engine.extract import text_udf
    from frontier_engine.frontier import DrainConfig, drain_epoch
    from frontier_engine.seen import (
        SeenConfig, empty_state, filter_unseen, update_bitmaps, with_bucket,
    )
    from frontier_engine.session import get_spark

    spark = get_spark(f"scaling-{cpus}", cores=cpus, shuffle_partitions=max(8, cpus))
    paths = fixtures.corpus("bench")
    base = spark.read.parquet(paths["pages"])
    robots = spark.read.parquet(paths["robots"])

    # replicate with distinct query-string URLs: scales candidate volume
    # without regenerating HTML (same bytes, distinct identities)
    reps = [
        base.select(
            F.concat(F.col("url"), F.lit(f"?r={i}")).alias("url"), "html"
        )
        for i in range(REPLICAS)
    ]
    pages = reps[0]
    for r in reps[1:]:
        pages = pages.unionByName(r)
    pages = pages.repartition(max(16, cpus * 4)).persist()
    n_pages = pages.count()  # materialize before timing

    # --- extraction throughput: two iterations, report steady state (the
    # first pays one-time python-worker spawn + cache settling, amortized to
    # nothing on long cluster jobs)
    t_extract = float("inf")
    for _ in range(2):
        t0 = time.time()
        pages.select(F.sum(F.length(text_udf(F.col("html")))).alias("n")).collect()
        t_extract = min(t_extract, time.time() - t0)

    # --- frontier throughput (candidates → two-tier dedup → drain)
    cfg = SeenConfig(n_buckets=256, bits_per_bucket=1 << 17)
    cu = canon.canonicalize_col(F.col("url"))
    cand = pages.select(
        cu.alias("url"),
        canon.url_hash_col(cu).alias("url_hash"),
        canon.host_col(cu).alias("host"),
        (F.pmod(F.xxhash64(cu), F.lit(1000)) / 1000.0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("enqueue_seq"),
        F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
        F.lit(0).alias("fetch_attempts"),
    )
    bm, su = empty_state(spark, cfg)
    pre = with_bucket(
        cand.filter(F.col("url_hash") % 2 == 0).select("url_hash"), cfg
    ).select("bucket", "url_hash")
    bm = update_bitmaps(bm, pre, cfg).persist()
    bm.count()
    su = pre.persist()
    su.count()

    t_frontier = float("inf")
    drained = None
    for _ in range(2):
        if drained is not None:
            drained.unpersist()
        t0 = time.time()
        unseen = filter_unseen(with_bucket(cand, cfg), bm, su, cfg).drop("bucket")
        drained, _, _ = drain_epoch(
            unseen, robots, DrainConfig(epoch_seconds=7200.0, skew_threshold=20000, max_salts=8)
        )
        drained = drained.persist()
        n_drained = drained.count()
        t_frontier = min(t_frontier, time.time() - t0)

    # determinism fingerprint: schedule must be identical at any parallelism
    rows = drained.select("host", "slot", "url").orderBy("host", "slot", "url").collect()
    h = hashlib.sha256("\n".join(f"{r['host']}\t{r['slot']}\t{r['url']}" for r in rows).encode()).hexdigest()

    print(json.dumps({
        "cpus": cpus,
        "n_pages": n_pages,
        "extract_seconds": round(t_extract, 3),
        "extract_throughput": round(n_pages / t_extract, 1),
        "frontier_candidates": n_pages,
        "frontier_seconds": round(t_frontier, 3),
        "frontier_throughput": round(n_pages / t_frontier, 1),
        "n_drained": n_drained,
        "schedule_sha256": h,
    }))
    spark.stop()


def orchestrate() -> int:
    results = {}
    for cpus in LEVELS:
        env = dict(os.environ)
        env.setdefault("SPARK_DRIVER_MEM", "48g")
        # taskset pins the whole process tree (JVM + GC threads + python
        # workers) to exactly `cpus` physical cores — without it, a local[8]
        # JVM still spreads its python workers and 32 GC threads across all
        # 32 cores and the "8-core" measurement is fiction
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__), "--worker", str(cpus),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, env=env, cwd=REPO, check=False,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}] (pinned to {cpus} cores): {line}")

    r8, r32 = results[8], results[32]
    assert r8["schedule_sha256"] == r32["schedule_sha256"], "schedule differs across parallelism!"
    assert r8["n_drained"] == r32["n_drained"]

    eff_extract = r32["extract_throughput"] / (4 * r8["extract_throughput"])
    eff_frontier = r32["frontier_throughput"] / (4 * r8["frontier_throughput"])

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

North-rule criterion: ≥ 0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox (32 cores, single JVM), so
per the driver instruction the SAME job ran at two parallelism levels on the
SAME input ({r8["n_pages"]:,} synthetic Common-Crawl-style pages = bench
corpus × {REPLICAS} URL replicas), one fresh JVM per level.

| metric | local[8] | local[32] | efficiency = thr32 / (4·thr8) |
|---|---|---|---|
| pages extracted/s (pandas-UDF extraction) | {r8["extract_throughput"]:,.1f} | {r32["extract_throughput"]:,.1f} | **{eff_extract:.3f}** |
| URLs scheduled+deduped/s (two-tier seen + politeness drain) | {r8["frontier_throughput"]:,.1f} | {r32["frontier_throughput"]:,.1f} | **{eff_frontier:.3f}** |

Wall seconds: extraction {r8["extract_seconds"]}s → {r32["extract_seconds"]}s;
frontier {r8["frontier_seconds"]}s → {r32["frontier_seconds"]}s.

**Determinism across parallelism** (SURVEY.md §7.4.1): the drained schedule
({r8["n_drained"]:,} URLs) is byte-identical at both levels —
sha256 `{r8["schedule_sha256"][:16]}…` at local[8] == local[32].

Reference-derived baseline for context (BASELINE.md): the reference crawls
~0.65 products/s end-to-end single-process; this engine schedules
{r32["frontier_throughput"]:,.0f} URLs/s and extracts
{r32["extract_throughput"]:,.0f} pages/s at 32 cores.

Reproduce: `python tools/scaling_bench.py` (env `SCALING_REPLICAS` scales
the corpus). Per-query timings: `python bench.py` → one JSON line.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"\nefficiency: extract={eff_extract:.3f} frontier={eff_frontier:.3f}")
    print("wrote BENCH/BASELINE.md")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        sys.exit(orchestrate())
