"""Seen-set exactness: Bloom false positives must never drop URLs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from frontier_engine.seen import (
    SeenConfig,
    empty_state,
    filter_unseen,
    update_bitmaps,
    with_bucket,
)


def _cand_df(spark, hashes, cfg):
    df = spark.createDataFrame([(h, f"u{h}") for h in hashes], ["url_hash", "url"])
    return with_bucket(df, cfg)


def test_empty_state_passes_everything(spark):
    cfg = SeenConfig(n_buckets=8, bits_per_bucket=1 << 12)
    bm, su = empty_state(spark, cfg)
    hashes = [random.Random(1).randrange(-(2**63), 2**63) for _ in range(500)]
    cand = _cand_df(spark, hashes, cfg)
    out = filter_unseen(cand, bm, su, cfg)
    assert sorted(r["url_hash"] for r in out.collect()) == sorted(hashes)


def test_roundtrip_exact_with_tiny_bitmap(spark):
    # tiny bitmap → guaranteed Bloom false positives; backstop must keep it exact
    cfg = SeenConfig(n_buckets=4, bits_per_bucket=256, k=4)
    rng = random.Random(42)
    all_hashes = list({rng.randrange(-(2**63), 2**63) for _ in range(2000)})
    seen_half = all_hashes[:1000]
    unseen_half = all_hashes[1000:]

    bm, su = empty_state(spark, cfg)
    newly = _cand_df(spark, seen_half, cfg).select("bucket", "url_hash")
    bm2 = update_bitmaps(bm, newly, cfg)
    su2 = su.unionByName(newly)

    cand = _cand_df(spark, all_hashes, cfg)
    out = filter_unseen(cand, bm2, su2, cfg)
    got = sorted(r["url_hash"] for r in out.collect())
    assert got == sorted(unseen_half)

    # everything marked seen → nothing passes
    bm3 = update_bitmaps(bm2, _cand_df(spark, unseen_half, cfg).select("bucket", "url_hash"), cfg)
    su3 = su2.unionByName(_cand_df(spark, unseen_half, cfg).select("bucket", "url_hash"))
    assert filter_unseen(cand, bm3, su3, cfg).count() == 0


def test_incremental_updates_merge(spark):
    cfg = SeenConfig(n_buckets=4, bits_per_bucket=1 << 12)
    bm, su = empty_state(spark, cfg)
    batches = [[1, 2, 3], [4, 5], [6]]
    for b in batches:
        newly = _cand_df(spark, b, cfg).select("bucket", "url_hash")
        bm = update_bitmaps(bm, newly, cfg)
        su = su.unionByName(newly)
    cand = _cand_df(spark, list(range(10)), cfg)
    out = sorted(r["url_hash"] for r in filter_unseen(cand, bm, su, cfg).collect())
    assert out == [0, 7, 8, 9]
    # bitmap table stays one row per touched bucket
    counts = bm.groupBy("bucket").count().collect()
    assert all(r["count"] == 1 for r in counts)
