"""Mirror-replica suppression inside the crawl loop: after the first
census refresh, the non-canonical replica host is dropped from the
frontier (Bharat–Broder enforcement), while the canonical replica and a
clean host keep crawling to completion."""

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

    yield get_spark("test-mirror", cores=4)


def _write_corpus(spark, base):
    # m1/m2 serve the IDENTICAL 12-body content set on different URLs
    # (a full mirror); clean.example serves 12 distinct bodies. With a
    # 6-token politeness budget each host needs 2 epochs to finish.
    rows = []
    for host in ("m1.example", "m2.example"):
        rows += [
            (f"https://{host}/p{i}",
             f"<html><body>mirror body {i}</body></html>".encode())
            for i in range(12)
        ]
    rows += [
        (f"https://clean.example/p{i}",
         f"<html><body>clean body {i}</body></html>".encode())
        for i in range(12)
    ]
    pages = spark.createDataFrame(
        [(u, "2025-06-14 00:00:00", h, "en") for u, h in rows],
        "url string, warc_ts string, html binary, lang string",
    ).select(
        "url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "html", "lang"
    )
    pages.write.mode("overwrite").parquet(f"{base}/pages")
    spark.createDataFrame(
        [(u, 1.0) for u, _ in rows], "url string, priority double"
    ).write.mode("overwrite").parquet(f"{base}/seeds")
    spark.createDataFrame(
        [(h, 1.0, []) for h in ("m1.example", "m2.example", "clean.example")],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    ).write.mode("overwrite").parquet(f"{base}/robots")
    return f"{base}/pages", f"{base}/seeds", f"{base}/robots"


def _per_epoch_host_counts(spark, wh):
    sched = SnapshotStore(wh).read(spark, "schedule")
    out: dict[tuple[int, str], int] = {}
    for r in sched.groupBy("epoch", "host").agg(F.count("*").alias("n")).collect():
        out[(r["epoch"], r["host"])] = r["n"]
    return out


CFG = CrawlConfig(
    max_depth=0,
    max_epochs=4,
    max_fetch_attempts=1,
    mirror_every=1,
    drain=DrainConfig(epoch_seconds=6.0),
    seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
)


def test_replica_dropped_after_refresh(spark, tmp_path):
    pages, seeds, robots = _write_corpus(spark, str(tmp_path / "corpus"))
    run_crawl(spark, pages, seeds, robots, str(tmp_path / "wh"), CFG)
    per = _per_epoch_host_counts(spark, str(tmp_path / "wh"))
    # epoch 0 runs ungated (no census yet): all three hosts at budget
    assert per[(0, "m1.example")] == 6
    assert per[(0, "m2.example")] == 6
    assert per[(0, "clean.example")] == 6
    # epoch 1: m1<->m2 detected as a full mirror from epoch-0 records;
    # m2 (lexicographically larger) is the non-canonical replica — its
    # remaining frontier rows are dropped, never fetched
    assert per[(1, "m1.example")] == 6
    assert per[(1, "clean.example")] == 6
    assert (1, "m2.example") not in per
    assert not any(h == "m2.example" and e >= 1 for (e, h) in per)
    # the canonical replica and the clean host completed their 12 URLs
    recs = SnapshotStore(str(tmp_path / "wh")).read(spark, "records")
    by_host = {
        r["host"]: r["n"]
        for r in recs.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert by_host["m1.example"] == 12
    assert by_host["clean.example"] == 12
    assert by_host["m2.example"] == 6  # epoch-0 fetches only


def test_gate_off_fetches_everything(spark, tmp_path):
    pages, seeds, robots = _write_corpus(spark, str(tmp_path / "corpus"))
    cfg = CrawlConfig(
        max_depth=0,
        max_epochs=4,
        max_fetch_attempts=1,
        drain=DrainConfig(epoch_seconds=6.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, pages, seeds, robots, str(tmp_path / "wh"), cfg)
    recs = SnapshotStore(str(tmp_path / "wh")).read(spark, "records")
    assert recs.filter(F.col("host") == "m2.example").count() == 12


def test_windowed_census_matches_and_resumes(spark, tmp_path):
    """mirror_window bounds the periodic rescan to a trailing epoch slice
    (the 10^10-URL posture — full-history rescans grow without bound).
    Here the mirror manifests in every epoch's fetches, so the windowed
    drop decisions equal the full-history run's; and a kill+resume with
    the window rebuilds the identical schedule (the windowed slice is a
    pure function of the epoch number over committed snapshots)."""
    pages, seeds, robots = _write_corpus(spark, str(tmp_path / "corpus"))
    cfg_win = CrawlConfig(
        max_depth=0,
        max_epochs=4,
        max_fetch_attempts=1,
        mirror_every=1,
        mirror_window=1,
        drain=DrainConfig(epoch_seconds=6.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, pages, seeds, robots, str(tmp_path / "wh_win"), cfg_win)
    run_crawl(spark, pages, seeds, robots, str(tmp_path / "wh_full"), CFG)

    def sched_rows(wh):
        sched = SnapshotStore(wh).read(spark, "schedule")
        return sorted((r["epoch"], r["host"], r["url"]) for r in sched.collect())

    assert sched_rows(str(tmp_path / "wh_win")) == sched_rows(str(tmp_path / "wh_full"))

    # kill after epoch 1 (one census refresh already applied), resume with
    # the same windowed config: identical schedule, zero re-fetches
    import dataclasses

    run_crawl(
        spark, pages, seeds, robots, str(tmp_path / "wh_part"),
        dataclasses.replace(cfg_win, max_epochs=2),
    )
    run_crawl(spark, pages, seeds, robots, str(tmp_path / "wh_part"), cfg_win)
    assert sched_rows(str(tmp_path / "wh_part")) == sched_rows(str(tmp_path / "wh_win"))


def test_rerun_is_deterministic(spark, tmp_path):
    pages, seeds, robots = _write_corpus(spark, str(tmp_path / "corpus"))
    shas = []
    for d in ("wh_a", "wh_b"):
        run_crawl(spark, pages, seeds, robots, str(tmp_path / d), CFG)
        sched = SnapshotStore(str(tmp_path / d)).read(spark, "schedule")
        rows = sorted(
            (r["epoch"], r["host"], r["url"]) for r in sched.collect()
        )
        shas.append(rows)
    assert shas[0] == shas[1]
