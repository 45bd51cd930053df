"""Extract-throughput measurement distribution (VERDICT r3 #2 follow-up).

BENCH_r03 reported pages_extracted_per_s 199,105 vs BENCH_r02's 268,809 with
ZERO code change behind it (`git diff ff24ee8..HEAD -- frontier_engine/extract.py`
is empty — same UDF, same corpus, same replica factor). Since both rounds ran
the identical workload, an A/B of "r2 code vs r3 code" is vacuous; what needs
evidence is the run-to-run spread of the measurement itself on this shared
box. This tool runs the bench extract microbench K times in FRESH pinned
JVMs (same protocol as bench.py: warm run + best-of-3) and prints every
sample plus min/median/max — if the r2 and r3 numbers both fall inside the
observed spread, the 26% drop is measurement noise, not a regression.

    python tools/ab_extract.py [K]      # default 5 samples
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXTRACT_REPS = 4  # same replica factor as bench.py


def worker() -> None:
    from pyspark.sql import functions as F

    from frontier_engine import fixtures
    from frontier_engine.extract import text_udf
    from frontier_engine.session import get_spark

    spark = get_spark("ab-extract", cores=CPUS, shuffle_partitions=max(8, CPUS))
    paths = fixtures.corpus("bench")
    base = spark.read.parquet(paths["pages"]).select("url", "html").repartition(128).persist()
    base_n = base.count()
    pages = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(EXTRACT_REPS - 1))).alias("r"), "html", "url"
    ).select(F.concat(F.col("url"), F.lit("?r="), F.col("r")).alias("url"), "html")
    n_pages = base_n * EXTRACT_REPS

    pages.limit(20000).select(F.sum(F.length(text_udf(F.col("html"))))).collect()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        pages.select(F.sum(F.length(text_udf(F.col("html")))).alias("n")).collect()
        best = min(best, time.time() - t0)
    print(json.dumps({
        "pages": n_pages,
        "seconds": round(best, 3),
        "pages_per_s": round(n_pages / best, 1),
    }))
    spark.stop()


def main() -> int:
    if "--worker" in sys.argv:
        worker()
        return 0
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    samples = []
    for i in range(k):
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
        out = subprocess.run(
            ["taskset", "-c", f"0-{CPUS - 1}", sys.executable,
             os.path.abspath(__file__), "--worker"],
            capture_output=True, text=True, cwd=REPO, check=False,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        r["loadavg_at_start"] = float(load)
        samples.append(r)
        print(f"sample {i + 1}/{k} (load {load}): {line}")
    rates = sorted(s["pages_per_s"] for s in samples)
    print(json.dumps({
        "samples": rates,
        "min": rates[0],
        "median": statistics.median(rates),
        "max": rates[-1],
        "spread_pct": round(100 * (rates[-1] - rates[0]) / rates[-1], 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
