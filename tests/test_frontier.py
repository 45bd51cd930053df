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


def test_histogram_precut_exact_and_tight(spark):
    """The priority-histogram pre-cut (DrainConfig.precut_bins) must never
    change the drained schedule — at any bin count, under degenerate ties
    (whole backlog in one bin), and with NULL priorities — while keeping
    only ~budget rows per host when priorities do discriminate."""
    rng = random.Random(11)
    rows = (
        # a: continuous priorities — tight cut expected
        [(f"https://a.example/p{i}", rng.random(), 0, 0) for i in range(2000)]
        # b: ALL priorities tied — one fat bin, cut impossible, keep all
        + [(f"https://b.example/p{i}", 0.5, 0, 0) for i in range(500)]
        # c: budget crossed inside the spread tail after a tied head
        + [(f"https://c.example/hi{i}", 0.9, 0, 0) for i in range(30)]
        + [(f"https://c.example/lo{i}", rng.random() * 0.5, 0, 0) for i in range(470)]
        # d: under budget, NULLs included (NULL sorts last; bin -1)
        + [(f"https://d.example/p{i}", None if i % 2 else 0.7, 0, 0) for i in range(6)]
    )
    fr = _mk_frontier(spark, rows)
    hosts = [f"{h}.example" for h in "abcd"]
    robots = _mk_robots(spark, hosts, delay=0.5)  # budget = 20/0.5 = 40

    base = None
    for bins in (4096, 7, None):
        cfg = DrainConfig(epoch_seconds=20.0, precut_bins=bins)
        d, _, _ = drain_epoch(fr, robots, cfg)
        got = sorted((r["url"], r["slot"]) for r in d.collect())
        if base is None:
            base = got
        assert got == base, f"precut_bins={bins} changed the schedule"
    assert sum(1 for u, _ in base if "://a." in u) == 40
    assert sum(1 for u, _ in base if "://d." in u) == 6

    # mechanism: survivors per host = budget + at most one tie bin
    from frontier_engine.frontier import _histogram_precut, apply_robots

    allowed, _ = apply_robots(fr, robots, DrainConfig(epoch_seconds=20.0))
    surv = dict(
        _histogram_precut(allowed, DrainConfig(epoch_seconds=20.0))
        .groupBy("host").count().collect()
    )
    assert 40 <= surv["a.example"] <= 60      # ~2000/4096 rows per bin
    assert surv["b.example"] == 500           # degenerate: nothing provably out
    assert 40 <= surv["c.example"] <= 60
    assert surv["d.example"] == 6             # under budget: keep all
    # survivors ⊇ drained (the cut only removes provably-unranked rows)
    kept = {r["url"] for r in _histogram_precut(
        allowed, DrainConfig(epoch_seconds=20.0)).select("url").collect()}
    assert {u for u, _ in base} <= kept


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


def test_host_budget_cap(spark):
    # politeness alone allows 10 fetches (epoch 10s, delay 1s); an
    # external allocation caps a.example at 3 and leaves b.example alone
    rows = [(f"https://a.example/p{i}", 1.0, 0, 0) for i in range(20)] + [
        (f"https://b.example/p{i}", 1.0, 0, 0) for i in range(20)
    ]
    fr = _mk_frontier(spark, rows)
    robots = _mk_robots(spark, ["a.example", "b.example"], delay=1.0)
    cfg = DrainConfig(epoch_seconds=10.0)
    caps = spark.createDataFrame(
        [("a.example", 3), ("zzz.example", 1)], "host string, budget long"
    )
    drained, rest, blocked = drain_epoch(fr, robots, cfg, host_budgets=caps)
    per = {
        r["host"]: r["n"]
        for r in drained.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"a.example": 3, "b.example": 10}
    # capped rows are carried forward, not dropped
    assert rest.count() == 40 - 13 and blocked.count() == 0
    # the cap never RAISES a budget above politeness
    caps_high = spark.createDataFrame(
        [("a.example", 999)], "host string, budget long"
    )
    d2 = drain_epoch(fr, robots, cfg, host_budgets=caps_high).drained
    assert d2.filter(F.col("host") == "a.example").count() == 10
    # drained set identical whether the capped host drains via the salted
    # or unsalted physical path
    d_salted = drain_epoch(
        fr, robots, DrainConfig(epoch_seconds=10.0, skew_threshold=None),
        host_budgets=caps,
    ).drained
    a = sorted(r["url"] for r in drained.collect())
    b = sorted(r["url"] for r in d_salted.collect())
    assert a == b
