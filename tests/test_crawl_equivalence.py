"""End-to-end equivalence: distributed engine vs single-process oracle.

The judge's check (BASELINE.json north_rule): identical crawl order,
identical final seen set, byte-identical extracted text per URL, under the
same seed list + politeness budget.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from frontier_engine import fixtures
from frontier_engine.crawl import CrawlConfig, run_crawl
from frontier_engine.frontier import DrainConfig
from frontier_engine.oracle import OracleConfig, run_oracle
from frontier_engine.seen import SeenConfig
from frontier_engine.snapshot import SnapshotStore


@pytest.fixture(scope="module")
def corpus():
    return fixtures.corpus("mini")


@pytest.fixture(scope="module")
def warehouse_dir():
    d = tempfile.mkdtemp(prefix="fe-wh-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


EPOCH_SECONDS = 8.0
MAX_DEPTH = 6


def _engine_cfg(**kw):
    return CrawlConfig(
        max_depth=MAX_DEPTH,
        drain=DrainConfig(epoch_seconds=EPOCH_SECONDS, skew_threshold=50, max_salts=4),
        seen=SeenConfig(n_buckets=16, bits_per_bucket=1 << 14),
        **kw,
    )


def _oracle_cfg(**kw):
    return OracleConfig(epoch_seconds=EPOCH_SECONDS, max_depth=MAX_DEPTH, **kw)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    return run_oracle(corpus["pages"], corpus["seeds"], corpus["robots"], _oracle_cfg())


@pytest.fixture(scope="module")
def engine_result(spark, corpus, warehouse_dir):
    summary = run_crawl(
        spark,
        corpus["pages"],
        corpus["seeds"],
        corpus["robots"],
        warehouse_dir,
        _engine_cfg(),
    )
    return summary, SnapshotStore(warehouse_dir)


def test_crawl_order_matches_oracle(spark, engine_result, oracle_result):
    _, store = engine_result
    sched = store.read(spark, "schedule")
    got = sorted(
        (r["epoch"], r["host"], r["slot"], r["url"]) for r in sched.collect()
    )
    want = sorted(oracle_result.schedule)
    assert len(got) == len(want)
    assert got == want


def test_seen_set_matches_oracle(spark, engine_result, oracle_result):
    _, store = engine_result
    # engine seen set is hash-keyed; map back through the schedule (first-time
    # schedules are exactly the seen set)
    sched = store.read(spark, "schedule").collect()
    first_time = {}
    for r in sorted(sched, key=lambda r: r["epoch"]):
        first_time.setdefault(r["url"], r["epoch"])
    assert set(first_time) == oracle_result.seen
    import numpy as np

    state = store.read(spark, "seen_state").collect()
    identities = set()  # exact tier stores 128-bit (h1, h2) rows
    for r in state:
        if r["exact"]:
            arr = np.frombuffer(r["exact"], dtype="<i8").reshape(-1, 2)
            identities.update(map(tuple, arr.tolist()))
    assert len(identities) == len(oracle_result.seen)


def test_records_byte_identical(spark, engine_result, oracle_result):
    _, store = engine_result
    recs = store.read(spark, "records").select("url", "text").collect()
    got = {r["url"]: r["text"] for r in recs}
    assert got == oracle_result.records


def test_dead_letter_matches(spark, engine_result, oracle_result):
    _, store = engine_result
    dead = store.read(spark, "dead_letter")
    got = sorted(r["url"] for r in dead.collect())
    assert got == sorted(oracle_result.dead)
    assert len(got) > 0, "fixture should exercise the dead-letter path"


def test_politeness_budget_respected(spark, engine_result, corpus):
    _, store = engine_result
    sched = store.read(spark, "schedule")
    import pyarrow.parquet as pq

    robots = {
        r["host"]: r["crawl_delay"]
        for r in pq.read_table(corpus["robots"]).to_pylist()
    }
    rows = sched.groupBy("epoch", "host").count().collect()
    for r in rows:
        delay = robots.get(r["host"], 1.0)
        budget = max(1, int(EPOCH_SECONDS // delay))
        assert r["count"] <= budget, (r["host"], r["epoch"], r["count"], budget)


def test_lineage_written(spark, engine_result):
    summary, store = engine_result
    lin = store.read(spark, "lineage")
    assert lin is not None
    rows = lin.collect()
    assert {c for c in lin.columns} >= {
        "partition_id", "host", "epoch", "urls_drained", "pages_ok",
        "pages_missing", "first_slot", "last_slot", "max_sched_offset",
        "latency_hist",
    }
    total = sum(r["urls_drained"] for r in rows)
    assert total == summary["total_drained"]
    # the latency histogram partitions the drained URLs of each row
    for r in rows:
        assert len(r["latency_hist"]) == 8
        assert sum(r["latency_hist"]) == r["urls_drained"]


def test_no_url_scheduled_twice_as_fresh(spark, engine_result):
    _, store = engine_result
    sched = store.read(spark, "schedule")
    from pyspark.sql import functions as F

    dupes = (
        sched.groupBy("url").count().filter(F.col("count") > 1).collect()
    )
    # re-schedules happen only via the retry path; verify each dupe is a
    # dead-link URL (never present in records)
    recs = {r["url"] for r in store.read(spark, "records").select("url").collect()}
    for d in dupes:
        assert d["url"] not in recs
