"""Adaptive per-host budget enforcement inside the crawl loop: the trap
census over fetched records demotes a duplicate-content host's drain
budget while clean hosts keep their politeness budget."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier_engine.crawl import CrawlConfig, run_crawl
from frontier_engine.frontier import DrainConfig
from frontier_engine.seen import SeenConfig
from frontier_engine.snapshot import SnapshotStore


@pytest.fixture(scope="module")
def spark():
    from frontier_engine.session import get_spark

    yield get_spark("test-budget", cores=4)


def _write_corpus(spark, base):
    # trap.example: 60 session-id URLs all serving the SAME bytes;
    # clean.example: 45 URLs each with distinct content
    trap = [
        (f"https://trap.example/p?sid={i}", b"<html><body>same trap body</body></html>")
        for i in range(60)
    ]
    clean = [
        (f"https://clean.example/p{i}",
         f"<html><body>distinct page {i}</body></html>".encode())
        for i in range(45)
    ]
    pages = spark.createDataFrame(
        [(u, "2025-06-14 00:00:00", h, "en") for u, h in trap + clean],
        "url string, warc_ts string, html binary, lang string",
    ).select(
        "url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "html", "lang"
    )
    pages.write.mode("overwrite").parquet(f"{base}/pages")
    spark.createDataFrame(
        [(u, 1.0) for u, _ in trap + clean], "url string, priority double"
    ).write.mode("overwrite").parquet(f"{base}/seeds")
    spark.createDataFrame(
        [("trap.example", 1.0, []), ("clean.example", 1.0, [])],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    ).write.mode("overwrite").parquet(f"{base}/robots")
    return f"{base}/pages", f"{base}/seeds", f"{base}/robots"


def _per_epoch_host_counts(spark, wh):
    sched = SnapshotStore(wh).read(spark, "schedule")
    out: dict[tuple[int, str], int] = {}
    for r in sched.groupBy("epoch", "host").agg(F.count("*").alias("n")).collect():
        out[(r["epoch"], r["host"])] = r["n"]
    return out


def test_trap_host_demoted_clean_host_untouched(spark, tmp_path):
    pages, seeds, robots = _write_corpus(spark, str(tmp_path / "corpus"))
    cfg = CrawlConfig(
        max_depth=0,
        max_epochs=4,
        max_fetch_attempts=1,
        budget_every=1,
        budget_min=5,
        drain=DrainConfig(epoch_seconds=20.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, pages, seeds, robots, str(tmp_path / "wh"), cfg)
    per = _per_epoch_host_counts(spark, str(tmp_path / "wh"))
    # epoch 0 runs uncapped (no census yet): both hosts at politeness budget
    assert per[(0, "trap.example")] == 20
    assert per[(0, "clean.example")] == 20
    # from epoch 1 the census (20 urls / 1 content => ratio 20) demotes the
    # trap host to budget_min; the clean host keeps its politeness budget
    assert per[(1, "trap.example")] == 5
    assert per[(1, "clean.example")] == 20
    assert per[(2, "trap.example")] == 5
    assert per[(2, "clean.example")] == 5  # its backlog simply ran out
    assert per[(3, "trap.example")] == 5
    assert (3, "clean.example") not in per
    # demotion defers, never discards: every trap URL is still in the
    # frontier or already scheduled
    store = SnapshotStore(str(tmp_path / "wh"))
    frontier_left = store.read(spark, "frontier").filter(
        F.col("host") == "trap.example"
    ).count()
    scheduled = sum(
        n for (e, h), n in per.items() if h == "trap.example"
    )
    assert scheduled + frontier_left == 60


def test_budget_run_is_deterministic(spark, tmp_path):
    pages, seeds, robots = _write_corpus(spark, str(tmp_path / "corpus"))
    cfg = CrawlConfig(
        max_depth=0,
        max_epochs=3,
        max_fetch_attempts=1,
        budget_every=1,
        budget_min=5,
        drain=DrainConfig(epoch_seconds=20.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    shas = []
    for name in ("wa", "wb"):
        run_crawl(spark, pages, seeds, robots, str(tmp_path / name), cfg)
        rows = (
            SnapshotStore(str(tmp_path / name))
            .read(spark, "schedule")
            .select("epoch", "host", "slot", "url")
            .collect()
        )
        shas.append(sorted((r["epoch"], r["host"], r["slot"], r["url"]) for r in rows))
    assert shas[0] == shas[1] and len(shas[0]) > 0


def test_budget_window_bounds_census(spark, tmp_path):
    """With a 1-epoch trailing window, the census forgets old evidence:
    a trap host that stops minting duplicate URLs earns its budget back
    once the offending epochs age out of the window."""
    pages, seeds, robots = _write_corpus(spark, str(tmp_path / "corpus"))
    cfg = CrawlConfig(
        max_depth=0,
        max_epochs=4,
        max_fetch_attempts=1,
        budget_every=1,
        budget_min=5,
        budget_window=1,
        drain=DrainConfig(epoch_seconds=20.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, pages, seeds, robots, str(tmp_path / "whw"), cfg)
    per = _per_epoch_host_counts(spark, str(tmp_path / "whw"))
    # epoch 1: census over epoch 0 (20 trap urls, 1 content) -> demoted
    assert per[(0, "trap.example")] == 20
    assert per[(1, "trap.example")] == 5
    # epoch 2: census over epoch 1 only — 5 urls < min_urls evidence floor,
    # so the trap flag drops and content yield over 5/1 gives base*1/5=200
    # -> politeness budget (20) applies again: probation, not a ban
    assert per[(2, "trap.example")] == 20
    # clean host unaffected throughout
    assert per[(0, "clean.example")] == 20 and per[(1, "clean.example")] == 20
