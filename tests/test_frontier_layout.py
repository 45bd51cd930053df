"""Host-bucketed frontier snapshots + rank-complement rest: the steady-state
epoch must move the backlog at most ONCE (the write-side merge Exchange) —
the read side (routing histogram, survivor windows, rank complements) plans
with ZERO shuffle off the bucketed scan, and the carry-over ``rest`` needs
no anti-join back against the backlog (SURVEY §4.2 layout; VERDICT r3 #3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from frontier_engine import fixtures
from frontier_engine.crawl import CrawlConfig, run_crawl
from frontier_engine.frontier import DrainConfig, drain_epoch
from frontier_engine.seen import SeenConfig
from frontier_engine.snapshot import SnapshotStore


def _n_shuffle_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    paths = fixtures.corpus("mini")
    wh = str(tmp_path_factory.mktemp("fl") / "wh")
    cfg = CrawlConfig(
        max_epochs=2,
        drain=DrainConfig(epoch_seconds=30.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, paths["pages"], paths["seeds"], paths["robots"], wh, cfg)
    return paths, wh


def test_frontier_snapshot_is_host_bucketed(spark, crawled):
    paths, wh = crawled
    store = SnapshotStore(wh)
    fdir = store.current_manifest()["tables"]["frontier"][0]
    assert os.path.exists(os.path.join(fdir, "_FE_BUCKETS.json"))
    # the scan reports the resident layout: a host-keyed aggregate plans
    # with no shuffle at all
    fr = store.read(spark, "frontier")
    agg = fr.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    assert _n_shuffle_exchanges(agg) == 0
    assert agg.count() > 0


def _assert_no_backlog_exchange(df):
    """Every shuffle in the plan must sit inside a persisted subplan's
    build, below the ``_rn1 <= budget`` superset filter — i.e. the only
    rows that EVER move are the budget-bounded survivor superset (≈ the
    drained size, what the epoch fetches anyway). The backlog itself — the
    routing histogram, the phase-1 survivor rank, every rank complement —
    is consumed on the scan's resident HashPartitioning(host) with no
    Exchange. (The superset shuffle itself is an AQE artifact: a cached
    plan containing a BroadcastExchange is wrapped in AdaptiveSparkPlan,
    which hides its output partitioning from consumers across the cache
    boundary — verified on Spark 4.1; it executes once per epoch over
    ~Σ budgets rows.)"""
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
    seen_imr = False
    for i, line in enumerate(lines):
        if "InMemoryRelation" in line:
            seen_imr = True
        if "Exchange hashpartitioning" in line:
            assert seen_imr, "\n".join(lines)
            below = "\n".join(lines[i + 1 : i + 4])
            assert "_rn1" in below and "budget" in below, "\n".join(lines)


def test_steady_state_drain_plans_with_zero_backlog_shuffle(spark, crawled):
    paths, wh = crawled
    store = SnapshotStore(wh)
    fr = store.read(spark, "frontier")
    robots = spark.read.parquet(paths["robots"])
    res = drain_epoch(fr, robots, DrainConfig(epoch_seconds=30.0))
    try:
        assert _n_shuffle_exchanges(res.drained) <= 1
        assert _n_shuffle_exchanges(res.rest) <= 1
        _assert_no_backlog_exchange(res.drained)
        _assert_no_backlog_exchange(res.rest)
        # the split is a real partition of the allowed set
        n_drained = res.drained.count()
        n_rest = res.rest.count()
        n_blocked = res.blocked.count()
        assert n_drained > 0
        assert n_drained + n_rest + n_blocked == fr.count()
        both = res.drained.select("url").intersect(res.rest.select("url"))
        assert both.count() == 0
    finally:
        res.unpersist()


def test_rest_complement_matches_anti_join_semantics(spark, crawled):
    """The rank-complement rest must equal the round-3 definition
    (allowed minus drained) row-for-row."""
    paths, wh = crawled
    store = SnapshotStore(wh)
    fr = store.read(spark, "frontier")
    robots = spark.read.parquet(paths["robots"])
    from frontier_engine.frontier import apply_robots

    cfg = DrainConfig(epoch_seconds=30.0)
    res = drain_epoch(fr, robots, cfg)
    try:
        allowed, _ = apply_robots(fr, robots, cfg)
        expected = {
            r["url"]
            for r in allowed.join(
                res.drained.select("url"), "url", "left_anti"
            ).collect()
        }
        got = {r["url"] for r in res.rest.collect()}
        assert got == expected
    finally:
        res.unpersist()
