"""T3 recrawl/freshness gating + T4 snapshot change detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier_engine import fixtures
from frontier_engine.crawl import CrawlConfig, run_crawl
from frontier_engine.frontier import DrainConfig, FRONTIER_SCHEMA, drain_epoch
from frontier_engine.seen import SeenConfig
from frontier_engine.snapshot import SnapshotStore, diff_table, latest_records


def test_ready_ts_gating(spark):
    rows = [
        ("https://a.example/now", 1.0, "2025-06-14 00:00:00"),
        ("https://a.example/later", 9.0, "2025-06-14 01:00:00"),
    ]
    fr = spark.createDataFrame(
        [
            (u, hash(u), "a.example", p, 0, 0, ts, 0)
            for (u, p, ts) in rows
        ],
        "url string, url_hash long, host string, priority double, depth int,"
        " enqueue_seq long, ready_ts string, fetch_attempts int",
    ).withColumn("ready_ts", F.col("ready_ts").cast("timestamp"))
    robots = spark.createDataFrame(
        [("a.example", 1.0, [])],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    )
    cfg = DrainConfig(epoch_seconds=60.0)

    res = drain_epoch(fr, robots, cfg, epoch_ts="2025-06-14 00:00:00")
    drained = [r["url"] for r in res.drained.collect()]
    rest = [r["url"] for r in res.rest.collect()]
    # the higher-priority URL is NOT ready yet → deferred to rest
    assert drained == ["https://a.example/now"]
    assert rest == ["https://a.example/later"]

    res2 = drain_epoch(fr, robots, cfg, epoch_ts="2025-06-14 01:00:00")
    assert sorted(r["url"] for r in res2.drained.collect()) == sorted(
        u for u, _, _ in rows
    )


def test_recrawl_refetches_after_n_epochs(spark, tmp_path):
    corpus = fixtures.corpus("mini")
    wh = str(tmp_path / "wh")
    cfg = CrawlConfig(
        max_depth=1,
        max_epochs=6,
        recrawl_after_epochs=2,
        drain=DrainConfig(epoch_seconds=30.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh, cfg)
    store = SnapshotStore(wh)
    sched = store.read(spark, "schedule").collect()
    by_url: dict[str, list[int]] = {}
    for r in sched:
        by_url.setdefault(r["url"], []).append(r["epoch"])
    seeds = [u for u in by_url if u.endswith(".example/")]
    # every seed fetched at epoch 0 must be fetched again at epoch 2 (and 4)
    refetched = [u for u in seeds if len(by_url[u]) >= 2]
    assert len(refetched) == len(seeds) > 0
    for u in refetched:
        epochs = sorted(by_url[u])
        assert epochs[1] - epochs[0] == 2, (u, epochs)


def test_latest_records_upsert_view_over_recrawl(spark, tmp_path):
    """records is append-only, so a recrawled URL has one row per fetch
    epoch; latest_records must collapse that history to exactly one row per
    URL — the newest epoch — reproducing the reference's
    ``update_one(upsert=True)`` read contract (/root/reference/db/__init__.py:63)."""
    corpus = fixtures.corpus("mini")
    wh = str(tmp_path / "wh_lr")
    cfg = CrawlConfig(
        max_depth=1,
        max_epochs=4,
        recrawl_after_epochs=2,
        drain=DrainConfig(epoch_seconds=30.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh, cfg)
    store = SnapshotStore(wh)
    recs = store.read(spark, "records")

    hist_counts = {
        (r["url_hash"], r["url"]): r["n"]
        for r in recs.groupBy("url_hash", "url").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert any(n >= 2 for n in hist_counts.values()), "no URL was recrawled"

    latest = latest_records(recs).collect()
    # exactly one row per key, and it is the max-epoch row of the history
    assert len(latest) == len(hist_counts)
    max_epoch = {
        (r["url_hash"], r["url"]): r["e"]
        for r in recs.groupBy("url_hash", "url").agg(F.max("epoch").alias("e")).collect()
    }
    assert latest[0].__fields__ == recs.select(
        "url_hash", "url", *[c for c in recs.columns if c not in ("url_hash", "url")]
    ).columns
    for r in latest:
        assert r["epoch"] == max_epoch[(r["url_hash"], r["url"])]


def test_diff_table_detects_changes(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "wh2"))
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, price double"
    )
    store.commit(0, replace={"prices": v1}, append={})
    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0)],
        "k long, name string, price double",
    )
    store.commit(1, replace={"prices": v2}, append={})
    diff = diff_table(spark, store, "prices", ["k"], ["price"], from_id=0, to_id=1)
    got = {r["k"]: r["change_type"] for r in diff.collect()}
    assert got == {2: "changed", 3: "added"}


def test_recrawl_schedule_rates_and_clamps(spark):
    from frontier_engine.transforms import recrawl_schedule

    rows = [
        # churny: changes every visit -> interval = base * 3 // 3 = 86400
        ("a", 1, "x"), ("a", 2, "y"), ("a", 3, "z"), ("a", 4, "w"),
        # static: never changes -> max_interval
        ("b", 1, "s"), ("b", 2, "s"), ("b", 3, "s"),
        # single visit: no evidence -> max_interval, change_rate null
        ("c", 1, "q"),
        # slow: 1 change over 4 intervals -> 86400*4 = 345600
        ("d", 1, "k"), ("d", 2, "k"), ("d", 3, "m"), ("d", 4, "m"), ("d", 5, "m"),
    ]
    df = spark.createDataFrame(rows, ["url", "visit_ts", "fingerprint"])
    out = {r["url"]: r for r in recrawl_schedule(df).collect()}
    assert out["a"]["n_changes"] == 3 and out["a"]["next_interval_s"] == 86400
    assert out["a"]["change_rate"] == 1.0
    assert out["b"]["n_changes"] == 0 and out["b"]["next_interval_s"] == 2592000
    assert out["c"]["change_rate"] is None
    assert out["c"]["next_interval_s"] == 2592000
    assert out["d"]["change_rate"] == 0.25
    assert out["d"]["next_interval_s"] == 345600


def test_recrawl_schedule_min_clamp(spark):
    from frontier_engine.transforms import recrawl_schedule

    # base 100s, 1 interval 1 change -> raw 100 clamped up to min 3600
    rows = [("a", 1, "x"), ("a", 2, "y")]
    df = spark.createDataFrame(rows, ["url", "visit_ts", "fingerprint"])
    out = recrawl_schedule(df, base_interval=100).collect()[0]
    assert out["next_interval_s"] == 3600
