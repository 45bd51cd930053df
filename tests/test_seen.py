"""Seen-set exactness: Bloom false positives must never drop URLs, and the
128-bit (url_hash, url_hash2) identity must keep 64-bit collisions apart."""

from __future__ import annotations

import random

from frontier_engine.seen import (
    SeenConfig,
    compact_state,
    empty_state,
    filter_unseen,
    update_state,
    with_bucket,
)

NEW_COLS = ["bucket", "url_hash", "url_hash2"]


def _cand_df(spark, hashes, cfg, h2=None):
    """Candidates with a deterministic second hash (h2 defaults to a simple
    function of h1 — the seen set treats it opaquely)."""
    rows = [
        (h, (h ^ 0x5DEECE66D) if h2 is None else h2[i], f"u{h}")
        for i, h in enumerate(hashes)
    ]
    df = spark.createDataFrame(rows, ["url_hash", "url_hash2", "url"])
    return with_bucket(df, cfg)


def test_empty_state_passes_everything(spark):
    cfg = SeenConfig(n_buckets=8, bits_per_bucket=1 << 12)
    state = empty_state(spark, cfg)
    hashes = [random.Random(1).randrange(-(2**63), 2**63) for _ in range(500)]
    cand = _cand_df(spark, hashes, cfg)
    out = filter_unseen(cand, state, cfg)
    assert sorted(r["url_hash"] for r in out.collect()) == sorted(hashes)


def test_roundtrip_exact_with_tiny_bitmap(spark):
    # tiny bitmap → guaranteed Bloom false positives; the exact runs must
    # keep the seen set EXACT regardless
    cfg = SeenConfig(n_buckets=4, bits_per_bucket=256, k=4)
    rng = random.Random(42)
    all_hashes = list({rng.randrange(-(2**63), 2**63) for _ in range(2000)})
    seen_half = all_hashes[:1000]
    unseen_half = all_hashes[1000:]

    state = empty_state(spark, cfg)
    newly = _cand_df(spark, seen_half, cfg).select(*NEW_COLS)
    state = state.unionByName(update_state(state, newly, cfg, epoch=0))

    cand = _cand_df(spark, all_hashes, cfg)
    out = filter_unseen(cand, state, cfg)
    got = sorted(r["url_hash"] for r in out.collect())
    assert got == sorted(unseen_half)

    # everything marked seen → nothing passes
    newly2 = _cand_df(spark, unseen_half, cfg).select(*NEW_COLS)
    state2 = state.unionByName(update_state(state, newly2, cfg, epoch=1))
    assert filter_unseen(cand, state2, cfg).count() == 0


def test_hash_collision_does_not_merge_urls(spark):
    # two DISTINCT URLs with an equal 64-bit url_hash (the 10^10-scale
    # birthday case): marking one seen must NOT hide the other
    cfg = SeenConfig(n_buckets=4, bits_per_bucket=1 << 12)
    state = empty_state(spark, cfg)
    seen_one = _cand_df(spark, [42], cfg, h2=[1001]).select(*NEW_COLS)
    state = state.unionByName(update_state(state, seen_one, cfg, epoch=0))

    cand = _cand_df(spark, [42, 42], cfg, h2=[1001, 2002])  # same h1, two identities
    out = [r["url_hash2"] for r in filter_unseen(cand, state, cfg).collect()]
    assert out == [2002]  # the colliding twin survives

    # and after marking the twin, both are seen
    state = state.unionByName(
        update_state(state, _cand_df(spark, [42], cfg, h2=[2002]).select(*NEW_COLS), cfg, 1)
    )
    assert filter_unseen(cand, state, cfg).count() == 0


def test_incremental_runs_and_compaction(spark):
    cfg = SeenConfig(n_buckets=4, bits_per_bucket=1 << 12)
    state = empty_state(spark, cfg)
    for epoch, batch in enumerate([[1, 2, 3], [4, 5], [6]]):
        newly = _cand_df(spark, batch, cfg).select(*NEW_COLS)
        state = state.unionByName(update_state(state, newly, cfg, epoch))
    cand = _cand_df(spark, list(range(10)), cfg)
    out = sorted(r["url_hash"] for r in filter_unseen(cand, state, cfg).collect())
    assert out == [0, 7, 8, 9]

    # LSM compaction: one row per bucket afterwards, same membership
    compacted = compact_state(state, cfg, epoch=99)
    counts = compacted.groupBy("bucket").count().collect()
    assert all(r["count"] == 1 for r in counts)
    out2 = sorted(r["url_hash"] for r in filter_unseen(cand, compacted, cfg).collect())
    assert out2 == out


def test_bitmap_is_cumulative_across_epochs(spark):
    cfg = SeenConfig(n_buckets=1, bits_per_bucket=1 << 12)
    state = empty_state(spark, cfg)
    state = state.unionByName(
        update_state(state, _cand_df(spark, [10], cfg).select(*NEW_COLS), cfg, 0)
    )
    state = state.unionByName(
        update_state(state, _cand_df(spark, [20], cfg).select(*NEW_COLS), cfg, 1)
    )
    # both epochs' keys must test seen (latest bitmap covers epoch-0 keys)
    assert filter_unseen(_cand_df(spark, [10, 20, 30], cfg), state, cfg).count() == 1
