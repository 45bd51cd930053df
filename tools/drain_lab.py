"""Drain-scaling lab: isolate the politeness-drain window sorts and A/B
physical variants at pinned core counts (the 2→8 north-rule deficit,
VERDICT r2 #1).

    python tools/drain_lab.py                 # orchestrate 2 vs 8 cores
    python tools/drain_lab.py --worker 8      # one level, all variants

Variants (all EXACT same drained set/order unless noted):
  p1only       phase-1 window alone (locate cost)
  base         current frontier.drain (two windows)
  hashlead     windows keyed (xxhash64(host[,salt]), host[, salt]) — same
               groups, but the sort's leading key is a radix-friendly long
               instead of a string
  narrow       phase-1 sorts a projected (host,salt,prio,seq,url,hash,
               budget,delay) row; full row re-attached semantics unchanged
               because drain output only adds slot/sched_offset
  ep600        base at epoch_seconds=600 (realistic budget≪backlog regime;
               different drained set BY DESIGN — labelled, not compared)
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

REPLICAS = int(os.environ.get("DRAINLAB_REPLICAS", "32"))
LEVELS = tuple(int(x) for x in os.environ.get("DRAINLAB_LEVELS", "2,8").split(","))
ITERS = int(os.environ.get("DRAINLAB_ITERS", "2"))


def _drain_hashlead(allowed, cfg):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frontier_engine.frontier import order_cols

    budget = F.greatest(
        F.lit(1), F.floor(F.lit(cfg.epoch_seconds) / F.col("crawl_delay"))
    ).cast("int")
    fr = (
        allowed.withColumn("budget", budget)
        .withColumn("salt", F.pmod(F.col("url_hash"), F.lit(cfg.max_salts)).cast("int"))
        .withColumn("hs", F.xxhash64(F.col("host"), F.col("salt")))
        .withColumn("hh", F.xxhash64(F.col("host")))
    )
    w1 = Window.partitionBy("hs", "host", "salt").orderBy(*order_cols())
    superset = (
        fr.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("budget"))
        .drop("_rn1")
    )
    w = Window.partitionBy("hh", "host").orderBy(*order_cols())
    return (
        superset.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("budget"))
        .withColumn("slot", (F.col("rn") - 1).cast("int"))
        .withColumn("sched_offset", (F.col("rn") - 1) * F.col("crawl_delay"))
        .drop("rn", "budget", "salt", "hs", "hh")
    )


def _phase1(allowed, cfg, hashlead=False):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frontier_engine.frontier import order_cols

    budget = F.greatest(
        F.lit(1), F.floor(F.lit(cfg.epoch_seconds) / F.col("crawl_delay"))
    ).cast("int")
    fr = allowed.withColumn("budget", budget).withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(cfg.max_salts)).cast("int")
    )
    if hashlead:
        fr = fr.withColumn("hs", F.xxhash64(F.col("host"), F.col("salt")))
        w1 = Window.partitionBy("hs", "host", "salt").orderBy(*order_cols())
    else:
        w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
    return (
        fr.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("budget"))
        .drop("_rn1")
    )


def _drain_r3base(allowed, cfg):
    """The round-3 drain shape (two branches off one shared (host,salt)
    Exchange, no survivor persist) — kept verbatim for A/B attribution of
    the round-4 drain_split redesign (single-pass final window + persisted
    survivor sets shared with the rest complement)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frontier_engine.frontier import (
        _budget_col, _precut_bin_col, _route_table, order_cols,
    )

    route = _route_table(allowed, cfg)
    nb = cfg.precut_bins
    bin_expr = _precut_bin_col(nb) if nb else F.lit(0).cast("long")
    fr = (
        allowed.join(F.broadcast(route), "host", "left")
        .filter(F.col("_tb").isNull() | (bin_expr >= F.col("_tb")))
        .withColumn("_mega", F.coalesce(F.col("_mega"), F.lit(False)))
        .withColumn("budget", _budget_col(cfg))
        .withColumn(
            "salt",
            F.when(
                F.col("_mega"), F.pmod(F.col("url_hash"), F.lit(cfg.max_salts))
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("_tb")
    )
    w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
    w2 = Window.partitionBy("host").orderBy(*order_cols())
    ranked = fr.withColumn("_rn1", F.row_number().over(w1))

    def finish(df, rank_col):
        return (
            df.filter(F.col(rank_col) <= F.col("budget"))
            .withColumn("slot", (F.col(rank_col) - 1).cast("int"))
            .withColumn("sched_offset", (F.col(rank_col) - 1) * F.col("crawl_delay"))
            .drop(rank_col, "budget", "salt", "_mega")
        )

    small = finish(ranked.filter(~F.col("_mega")), "_rn1")
    superset = ranked.filter(
        F.col("_mega") & (F.col("_rn1") <= F.col("budget"))
    ).drop("_rn1")
    return small.unionByName(
        finish(superset.withColumn("rn", F.row_number().over(w2)), "rn")
    )


def _drain_narrow(allowed, cfg):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frontier_engine.frontier import order_cols

    slim = allowed.select(
        "host", "priority", "enqueue_seq", "url", "url_hash", "crawl_delay"
    )
    budget = F.greatest(
        F.lit(1), F.floor(F.lit(cfg.epoch_seconds) / F.col("crawl_delay"))
    ).cast("int")
    fr = slim.withColumn("budget", budget).withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(cfg.max_salts)).cast("int")
    )
    w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
    superset = (
        fr.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("budget"))
        .drop("_rn1")
    )
    w = Window.partitionBy("host").orderBy(*order_cols())
    return (
        superset.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("budget"))
        .withColumn("slot", (F.col("rn") - 1).cast("int"))
        .withColumn("sched_offset", (F.col("rn") - 1) * F.col("crawl_delay"))
        .drop("rn", "budget", "salt")
    )


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from frontier_engine import canon, fixtures
    from frontier_engine.frontier import DrainConfig, apply_robots, drain
    from frontier_engine.session import get_spark

    spark = get_spark(f"drainlab-{cpus}", cores=cpus, shuffle_partitions=64)
    paths = fixtures.corpus("bench")
    base = spark.read.parquet(paths["pages"]).select("url").repartition(128).persist()
    base.count()
    robots = spark.read.parquet(paths["robots"])

    cand = canon.identity_first(
        base.select(
            F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("r"), "url"
        )
        .select(F.concat(F.col("url"), F.lit("?r="), F.col("r")).alias("raw"))
        .select("raw"),
        F.col("raw"),
        "c_url",
    ).select(
        F.col("c_url").alias("url"),
        "url_hash",
        "host",
        (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("enqueue_seq"),
        F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
        F.lit(0).alias("fetch_attempts"),
    )
    cfg = DrainConfig(epoch_seconds=7200.0, max_salts=8)
    allowed, _ = apply_robots(cand, robots, cfg)
    allowed = allowed.persist()
    n_allowed = allowed.count()

    def fine(fn, advisory="8m"):
        # AQE parallelismFirst=true coalesces the drain shuffle down to
        # ~defaultParallelism partitions -> per-task sort working sets of
        # hundreds of MB (cache-hostile). Pin a size-based target instead.
        def run():
            spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
            try:
                return fn()
            finally:
                pass
        return run

    def restore():
        spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")

    variants = {
        "p1only": lambda: _phase1(allowed, cfg, hashlead=False),
        "p1_fine8m": fine(lambda: _phase1(allowed, cfg, hashlead=False), "8m"),
        "p1_fine16m": fine(lambda: _phase1(allowed, cfg, hashlead=False), "16m"),
        "p1_fine32m": fine(lambda: _phase1(allowed, cfg, hashlead=False), "32m"),
        "base": lambda: drain(allowed, cfg),
        "r3base": lambda: _drain_r3base(allowed, cfg),
        "nocut": lambda: drain(
            allowed, DrainConfig(epoch_seconds=7200.0, max_salts=8, precut_bins=None)
        ),
        "base_fine8m": fine(lambda: drain(allowed, cfg), "8m"),
        "ep600": lambda: drain(allowed, DrainConfig(epoch_seconds=600.0, max_salts=8)),
    }
    out = {"cpus": cpus, "n_allowed": n_allowed, "walls": {}, "counts": {}, "shas": {}}
    for name, fn in variants.items():
        best = float("inf")
        cnt = None
        for _ in range(ITERS):
            t0 = time.time()
            cnt = fn().count()
            best = min(best, time.time() - t0)
            # drain() persists its survivor sets internally; drop them
            # between iterations or the repeat measures a cache hit
            spark.catalog.clearCache()
            allowed.persist()
            allowed.count()
        restore()
        out["walls"][name] = round(best, 3)
        out["counts"][name] = cnt
    for name in ("base", "r3base", "nocut", "base_fine8m"):
        rows = (
            variants[name]()
            .select("host", "slot", "url")
            .orderBy("host", "slot", "url")
            .collect()
        )
        out["shas"][name] = hashlib.sha256(
            "\n".join(f"{r['host']}\t{r['slot']}\t{r['url']}" for r in rows).encode()
        ).hexdigest()
    print(json.dumps(out))
    spark.stop()


def orchestrate() -> int:
    mem_per_core = float(os.environ.get("SCALING_MEM_PER_CORE_GB", "1.5"))
    results = {}
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
        results[cpus] = json.loads(lines[-1])
        print(f"local[{cpus}]:", lines[-1])
    if len(LEVELS) == 2:
        lo, hi = LEVELS
        ratio = hi / lo
        for name in results[lo]["walls"]:
            eff = results[lo]["walls"][name] / (ratio * results[hi]["walls"][name])
            print(f"{name:14s} {results[lo]['walls'][name]:7.2f}s -> "
                  f"{results[hi]['walls'][name]:7.2f}s  eff={eff:.3f}")
        same = results[lo]["shas"] == results[hi]["shas"]
        print("schedule shas identical across levels:", same)
        print("base==hashlead==narrow sha:",
              len(set(results[lo]["shas"].values())) == 1)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        sys.exit(orchestrate())
