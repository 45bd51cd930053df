"""Politeness budgets, drain determinism, skew-salting equivalence."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from frontier_engine.canon import canonicalize_py, host_of_py, url_hash_col
from frontier_engine.frontier import DrainConfig, drain_epoch, frontier_from_seeds


def _mk_frontier(spark, rows):
    """rows: list of (url, priority, depth, enqueue_seq)."""
    df = spark.createDataFrame(rows, ["url", "priority", "depth", "enqueue_seq"])
    from frontier_engine import canon

    cu = canon.canonicalize_col(F.col("url"))
    return df.select(
        cu.alias("url"),
        url_hash_col(cu).alias("url_hash"),
        canon.host_col(cu).alias("host"),
        F.col("priority").cast("double"),
        F.col("depth").cast("int"),
        F.col("enqueue_seq").cast("long"),
        F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
        F.lit(0).alias("fetch_attempts"),
    )


def _mk_robots(spark, hosts, delay=1.0, disallow=()):
    return spark.createDataFrame(
        [(h, delay, list(disallow)) for h in hosts],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    )


def test_budget_and_slots(spark):
    rows = [(f"https://a.example/p{i}", 1.0, 0, 0) for i in range(50)]
    fr = _mk_frontier(spark, rows)
    robots = _mk_robots(spark, ["a.example"], delay=2.0)
    cfg = DrainConfig(epoch_seconds=10.0)
    drained, rest, blocked = drain_epoch(fr, robots, cfg)
    d = drained.orderBy("slot").collect()
    assert len(d) == 5  # floor(10 / 2.0)
    assert [r["slot"] for r in d] == [0, 1, 2, 3, 4]
    assert [r["sched_offset"] for r in d] == [0.0, 2.0, 4.0, 6.0, 8.0]
    # politeness: consecutive slots spaced exactly crawl_delay
    assert rest.count() == 45 and blocked.count() == 0
    # deterministic order: p0, p1, p10, ... lexicographic on equal priority
    urls = [r["url"] for r in d]
    assert urls == sorted([f"https://a.example/p{i}" for i in range(50)])[:5]


def test_priority_wins_then_fifo(spark):
    rows = [
        ("https://a.example/low", 0.1, 1, 5),
        ("https://a.example/hi", 9.0, 1, 7),
        ("https://a.example/old", 1.0, 1, 1),
        ("https://a.example/new", 1.0, 1, 2),
    ]
    fr = _mk_frontier(spark, rows)
    robots = _mk_robots(spark, ["a.example"], delay=1.0)
    drained, _, _ = drain_epoch(fr, robots, DrainConfig(epoch_seconds=3.0))
    urls = [r["url"] for r in drained.orderBy("slot").collect()]
    assert urls == [
        "https://a.example/hi",
        "https://a.example/old",
        "https://a.example/new",
    ]


def test_robots_blocking(spark):
    rows = [
        ("https://a.example/ok", 1.0, 0, 0),
        ("https://a.example/private/x", 1.0, 0, 0),
        ("https://b.example/private/y", 1.0, 0, 0),  # b has no disallows
    ]
    fr = _mk_frontier(spark, rows)
    robots = spark.createDataFrame(
        [("a.example", 1.0, ["/private"]), ("b.example", 1.0, [])],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    )
    drained, rest, blocked = drain_epoch(fr, robots, DrainConfig(epoch_seconds=60.0))
    assert sorted(r["url"] for r in drained.collect()) == [
        "https://a.example/ok",
        "https://b.example/private/y",
    ]
    assert [r["url"] for r in blocked.collect()] == ["https://a.example/private/x"]


def test_salted_drain_equals_unsalted(spark):
    rng = random.Random(7)
    rows = [
        (f"https://mega.example/p{i}", rng.random(), 1, rng.randrange(5))
        for i in range(3000)
    ] + [(f"https://small{j}.example/p{i}", 1.0, 0, 0) for j in range(3) for i in range(5)]
    fr = _mk_frontier(spark, rows)
    hosts = ["mega.example"] + [f"small{j}.example" for j in range(3)]
    robots = _mk_robots(spark, hosts, delay=0.5)
    # three physical paths, one answer: census-salted (mega takes the
    # two-phase path), census-all-small (one window per host), and the
    # no-census unconditional salting fallback (skew_threshold=None)
    cfg_salted = DrainConfig(epoch_seconds=20.0, skew_threshold=100, max_salts=8)
    cfg_plain = DrainConfig(epoch_seconds=20.0, skew_threshold=10**9)
    cfg_uncond = DrainConfig(epoch_seconds=20.0, skew_threshold=None, max_salts=8)
    d1, _, _ = drain_epoch(fr, robots, cfg_salted)
    d2, _, _ = drain_epoch(fr, robots, cfg_plain)
    d3, _, _ = drain_epoch(fr, robots, cfg_uncond)
    got1 = sorted((r["url"], r["slot"]) for r in d1.collect())
    got2 = sorted((r["url"], r["slot"]) for r in d2.collect())
    got3 = sorted((r["url"], r["slot"]) for r in d3.collect())
    assert got1 == got2 == got3
    # mega host drained exactly its budget
    assert sum(1 for u, _ in got1 if u.startswith("https://mega")) == 40


def test_unknown_host_gets_default_delay(spark):
    fr = _mk_frontier(spark, [("https://x.example/a", 1.0, 0, 0)])
    robots = _mk_robots(spark, ["other.example"])
    drained, _, _ = drain_epoch(fr, robots, DrainConfig(epoch_seconds=5.0, default_crawl_delay=1.0))
    assert drained.count() == 1


def test_frontier_from_seeds(spark):
    seeds = spark.createDataFrame(
        [("https://A.Example:443/#x", 1.0), ("garbage", 1.0)], ["url", "priority"]
    )
    fr = frontier_from_seeds(seeds)
    rows = fr.collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://a.example/"
    assert rows[0]["host"] == "a.example"
    assert rows[0]["url"] == canonicalize_py("https://A.Example:443/#x")
    assert rows[0]["host"] == host_of_py("https://a.example/")
