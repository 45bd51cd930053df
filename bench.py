"""Benchmark harness — prints ONE JSON line.

Measures (a) headline relational/text/ANN queries from the driver contract
at $SPARK_GRAFT_SF_DIR, and (b) the engine's north-star crawl metrics on the
synthetic bench corpus: URLs scheduled+deduped/sec through the two-tier
seen set + politeness drain, and pages extracted/sec through the pandas-UDF
extractor.

    python bench.py                  # local[$SPARK_GRAFT_CPUS or 32]
    SPARK_GRAFT_CPUS=8 python bench.py

Scaling-efficiency evidence (N vs 4N cores per BASELINE.md) is produced by
tools/scaling_bench.py, a self-contained harness that runs the same
extract/frontier workloads in separate core-pinned JVMs and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pruned_agg",
    "dim_join",
    "topk_per_group",
    "window_running",
    "cdc_gate",
    "token_stats",
    "ngram_counts",
    "quality",
    "lang_id",
    "exact_dedup",
    "minhash_near_dup",
    "simhash_near_dup",
    "fingerprint",
    "ngram_search",
    "batch_infer",
    "embedding_near_dup",
    "ann_topk",
]


def _time_action(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def _best3(fn) -> float:
    """Fastest of 3 timed runs — steady-state capability, immune to a
    single co-tenant noise spike (same convention as scaling_bench's
    min-of-2)."""
    return min(_time_action(fn) for _ in range(3))


def run_workload(spark, sf_dir: str, corpus_tier: str = "bench") -> dict:
    """The full benched workload; returns per-query seconds + crawl metrics."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from frontier_engine import canon, fixtures
    from frontier_engine.extract import text_udf
    from frontier_engine.frontier import DrainConfig, drain_epoch
    from frontier_engine.seen import (
        SeenConfig, empty_state, filter_unseen, update_state, with_bucket,
    )

    qs = entrymod.queries()
    out: dict = {"queries": {}}

    # warm the JVM/Arrow paths once so per-query numbers measure the
    # operator, not first-call class loading or python-worker spawn
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(64).select(
        F.sum(F.length(text_udf(F.lit("<p>w</p>").cast("binary"))))
    ).collect()

    # ----- crawl microbench FIRST: the north-star throughput numbers are
    # measured on a session that hasn't accumulated GC/shuffle state from
    # the heavy dedup queries (the queries are each noop-written and
    # individually timed, so ordering does not affect their numbers)
    # ----- crawl microbench on the synthetic Common-Crawl-style corpus,
    # replicated via explode (distinct ?r=i URLs) so throughput reflects
    # steady-state work rather than fixed per-stage latency
    paths = fixtures.corpus(corpus_tier)
    base = spark.read.parquet(paths["pages"]).select("url", "html").repartition(128).persist()
    base_n = base.count()
    robots = spark.read.parquet(paths["robots"])

    def replicated(n, cols):
        return base.select(
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("r"), *cols, "url"
        ).select(F.concat(F.col("url"), F.lit("?r="), F.col("r")).alias("url"), *cols)

    ext_reps = 4
    pages = replicated(ext_reps, ["html"])
    n_pages = base_n * ext_reps

    # pages extracted/sec: pandas-UDF extraction over every page, forced;
    # warm run first (worker spawn), then best of 3 timed runs — single
    # runs swing +/-30% with co-tenant noise on this box
    pages.limit(20000).select(F.sum(F.length(text_udf(F.col("html"))))).collect()
    t_extract = _best3(
        lambda: pages.select(F.sum(F.length(text_udf(F.col("html")))).alias("n"))
        .collect()
    )
    out["pages_extracted"] = n_pages
    out["extract_seconds"] = t_extract
    out["pages_extracted_per_s"] = round(n_pages / t_extract, 1)

    # URLs scheduled+deduped/sec: candidates = every corpus URL (+50%
    # pre-seen) → two-tier seen filter → politeness drain, one epoch.
    # The two phases are timed SEPARATELY (VERDICT r3 #2): the seen phase
    # includes the persist+count materialization run_crawl's snapshot
    # boundary forces (that cost belongs to dedup, and folding it into the
    # drain number in r3 broke cross-round comparability); the drain phase
    # times drain_epoch alone over the already-materialized unseen set.
    cfg = SeenConfig(n_buckets=256, bits_per_bucket=1 << 17)

    fr_reps = 8
    cand = canon.identity_first(
        replicated(fr_reps, []).withColumnRenamed("url", "raw"), F.col("raw"), "c_url"
    ).select(
        F.col("c_url").alias("url"),
        "url_hash",
        "url_hash2",
        "host",
        (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("enqueue_seq"),
        F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
        F.lit(0).alias("fetch_attempts"),
    )
    n_cand = base_n * fr_reps
    state = empty_state(spark, cfg)
    pre = with_bucket(
        cand.filter(F.col("url_hash") % 2 == 0).select("url_hash", "url_hash2"), cfg
    ).select("bucket", "url_hash", "url_hash2")
    state = state.unionByName(update_state(state, pre, cfg, epoch=0)).persist()
    state.count()

    def build_unseen():
        return (
            filter_unseen(with_bucket(cand, cfg), state, cfg)
            .drop("bucket", "url_hash2")
            .persist()
        )

    def seen_phase():
        u = build_unseen()
        u.count()
        u.unpersist()

    def drain_phase(unseen):
        res = drain_epoch(
            unseen, robots, DrainConfig(epoch_seconds=3600.0, max_salts=8)
        )
        n = res.drained.count()
        res.unpersist()
        return n

    seen_phase()  # warm
    t_seen = _best3(seen_phase)

    unseen = build_unseen()
    unseen.count()
    n_drained = drain_phase(unseen)  # warm
    t_drain = _best3(lambda: drain_phase(unseen))
    unseen.unpersist()

    t_frontier = round(t_seen + t_drain, 3)
    out["frontier_candidates"] = n_cand
    out["frontier_drained"] = n_drained
    out["seen_filter_seconds"] = t_seen
    out["drain_seconds"] = t_drain
    out["frontier_seconds"] = t_frontier
    out["urls_scheduled_deduped_per_s"] = round(n_cand / t_frontier, 1)

    state.unpersist()
    base.unpersist()

    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        # best-of-2: single runs are bimodal on this box (hypervisor steal
        # is invisible to load average) — report steady state, same
        # convention as the throughput microbenches
        out["queries"][name] = min(
            _time_action(lambda: df.write.format("noop").mode("overwrite").save())
            for _ in range(2)
        )

    return out


def main() -> int:
    from frontier_engine.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(8, cpus))

    res = run_workload(spark, sf_dir)
    # the headline value is the SUM of the reported steady-state
    # measurements (each query's best-of-2 + the two microbench bests),
    # not the harness wall clock — warmups and repeat runs are excluded
    total = round(
        sum(res["queries"].values()) + res["extract_seconds"] + res["frontier_seconds"], 2
    )

    line = {
        "metric": "headline_queries_plus_crawl_microbench_seconds",
        "value": total,
        "unit": "sec",
        "queries": res["queries"],
        "sf": sf_dir,
        "cpus": cpus,
        "pages_extracted_per_s": res["pages_extracted_per_s"],
        "extract_seconds": res["extract_seconds"],
        "seen_filter_seconds": res["seen_filter_seconds"],
        "drain_seconds": res["drain_seconds"],
        "urls_scheduled_deduped_per_s": res["urls_scheduled_deduped_per_s"],
        "frontier_drained": res["frontier_drained"],
        "pages_extracted": res["pages_extracted"],
    }
    print(json.dumps(line))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
