"""Snapshot layer: atomic commit, time travel, kill+resume with zero
re-fetches (north_rule checkpoint requirement)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from frontier_engine import fixtures
from frontier_engine.crawl import CrawlConfig, run_crawl
from frontier_engine.frontier import DrainConfig
from frontier_engine.seen import SeenConfig
from frontier_engine.snapshot import SnapshotStore


def _cfg(**kw):
    return CrawlConfig(
        max_depth=4,
        drain=DrainConfig(epoch_seconds=8.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
        **kw,
    )


@pytest.fixture(scope="module")
def corpus():
    return fixtures.corpus("mini")


def test_snapshot_store_basics(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "wh"))
    df1 = spark.range(5).withColumnRenamed("id", "x")
    sid0 = store.commit(0, replace={"t": df1}, append={"log": df1})
    assert sid0 == 0
    df2 = spark.range(3).withColumnRenamed("id", "x")
    sid1 = store.commit(1, replace={"t": df2}, append={"log": df2})
    assert sid1 == 1
    # current state
    assert store.read(spark, "t").count() == 3
    assert store.read(spark, "log").count() == 8  # append accumulates
    # time travel
    assert store.read(spark, "t", snapshot_id=0).count() == 5
    assert store.read(spark, "log", snapshot_id=0).count() == 5
    hist = store.history()
    assert [m["snapshot_id"] for m in hist] == [0, 1]
    assert hist[1]["parent_id"] == 0


def test_kill_resume_equals_uninterrupted(spark, corpus):
    wh_full = tempfile.mkdtemp(prefix="fe-full-")
    wh_part = tempfile.mkdtemp(prefix="fe-part-")
    try:
        run_crawl(spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh_full, _cfg())

        # "kill" after 2 epochs, then resume to completion
        run_crawl(
            spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh_part,
            _cfg(max_epochs=2),
        )
        pre = SnapshotStore(wh_part)
        sched_before = pre.read(spark, "schedule").count()
        assert sched_before > 0
        run_crawl(spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh_part, _cfg())

        a = SnapshotStore(wh_full)
        b = SnapshotStore(wh_part)
        key = lambda r: (r["epoch"], r["host"], r["slot"], r["url"])
        sa = sorted(map(key, a.read(spark, "schedule").collect()))
        sb = sorted(map(key, b.read(spark, "schedule").collect()))
        assert sa == sb  # identical crawl order ⇒ zero re-fetches on resume

        ra = {r["url"]: r["text"] for r in a.read(spark, "records").collect()}
        rb = {r["url"]: r["text"] for r in b.read(spark, "records").collect()}
        assert ra == rb

        import numpy as np

        def seen_hashes(store):
            out = set()
            for r in store.read(spark, "seen_state").collect():
                if r["exact"]:
                    out.update(np.frombuffer(r["exact"], dtype="<i8").tolist())
            return sorted(out)

        assert seen_hashes(a) == seen_hashes(b)
    finally:
        shutil.rmtree(wh_full, ignore_errors=True)
        shutil.rmtree(wh_part, ignore_errors=True)


def test_compaction_and_expiry_preserve_crawl_equivalence(spark, corpus):
    """Seen-run compaction (every 3 epochs) + snapshot GC (keep 2) + a kill
    at epoch 3 with resume must yield the exact same crawl as a plain
    uninterrupted run — and must actually bound runs and delete garbage."""
    wh_plain = tempfile.mkdtemp(prefix="fe-plain-")
    wh_lsm = tempfile.mkdtemp(prefix="fe-lsm-")
    try:
        run_crawl(
            spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh_plain,
            _cfg(compact_every=None),
        )
        lsm_cfg = lambda **kw: _cfg(compact_every=3, expire_keep_last=2, **kw)  # noqa: E731
        run_crawl(
            spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh_lsm,
            lsm_cfg(max_epochs=3),
        )
        run_crawl(spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh_lsm, lsm_cfg())

        a, b = SnapshotStore(wh_plain), SnapshotStore(wh_lsm)
        key = lambda r: (r["epoch"], r["host"], r["slot"], r["url"])  # noqa: E731
        assert sorted(map(key, a.read(spark, "schedule").collect())) == sorted(
            map(key, b.read(spark, "schedule").collect())
        )

        # compaction bound: ≤ compact_every runs per bucket at any time
        state_rows = b.read(spark, "seen_state").groupBy("bucket").count().collect()
        assert max(r["count"] for r in state_rows) <= 3

        # GC: only the last 2 manifests remain, and no unreferenced data dirs
        manifests = os.listdir(os.path.join(wh_lsm, "manifests"))
        assert len(manifests) == 2
        kept_paths = {
            p
            for m in b.history()
            for ps in m["tables"].values()
            for p in ps
        }
        on_disk = {
            os.path.join(wh_lsm, "data", t, d)
            for t in os.listdir(os.path.join(wh_lsm, "data"))
            for d in os.listdir(os.path.join(wh_lsm, "data", t))
        }
        assert on_disk == kept_paths
    finally:
        shutil.rmtree(wh_plain, ignore_errors=True)
        shutil.rmtree(wh_lsm, ignore_errors=True)


def test_expire_snapshots_basics(spark, tmp_path):
    wh = str(tmp_path / "wh-gc")
    store = SnapshotStore(wh)
    for i in range(4):
        store.commit(i, replace={"t": spark.range(i + 1)}, append={"log": spark.range(1)})
    res = store.expire_snapshots(keep_last=2)
    assert res["removed_manifests"] == 2
    assert res["removed_dirs"] == 2  # two superseded versions of "t"
    assert store.read(spark, "t").count() == 4
    assert store.read(spark, "log").count() == 4  # append history survives
    assert [m["snapshot_id"] for m in store.history()] == [2, 3]


def test_failed_commit_leaves_previous_snapshot_live(spark, tmp_path):
    wh = str(tmp_path / "wh2")
    store = SnapshotStore(wh)
    store.commit(0, replace={"t": spark.range(4)}, append={})
    # simulate a crash mid-commit: data written but manifest/CURRENT not
    # swapped — reader must still see snapshot 0
    orphan = os.path.join(wh, "data", "t", "s1.tmp-deadbeef")
    os.makedirs(orphan, exist_ok=True)
    assert store.current_manifest()["snapshot_id"] == 0
    assert store.read(spark, "t").count() == 4
