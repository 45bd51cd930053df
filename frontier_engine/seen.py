"""Two-tier distributed URL-seen set, LSM-style.

Generalizes the reference's upsert-as-dedup (Mongo ``update_one(upsert=True)``
keyed on ``(store, sku)``, /root/reference/db/__init__.py:40,:63) to a
10^10-key seen set with ONE state table:

    seen_state(bucket int, epoch int, bitmap binary, exact binary)

partitioned by ``bucket = pmod(url_hash, B)``. Per epoch, each touched
bucket appends one row:
- ``bitmap``: the bucket's FULL blocked-Bloom filter after the epoch
  (cumulative — reading the max-epoch row gives current tier 1),
- ``exact``: ONLY this epoch's new identities, as (h1, h2) int64 PAIRS
  sorted lexicographically (little-endian bytes, row-major) — the exact
  tier accumulates as immutable sorted runs, LSM-fashion; membership is a
  vectorized ``searchsorted`` per run, and :func:`compact_state` merges
  runs at leisure.

The identity is 128-bit: h1 = xxhash64(url), h2 = a salted second xxhash64
(canon.url_hash2_col). A 64-bit-only exact tier silently merges ~n²/2^65
distinct URLs (≈ 2-3 at 10^10 — each one a page never crawled); at 128
bits the expectation is ~10^-19, i.e. the seen set is exact in the same
sense as the reference's PK upsert (/root/reference/db/__init__.py:40).
Bloom probes still use h1 alone — tier 1 is allowed false positives
because tier 2 confirms, and false positives never drop a URL.

Epoch dedup is ONE cogrouped map (candidates×state aligned on bucket) that
tests tier 1 and, for Bloom-positives only, tier 2 — returning the
candidate rows that are NOT confirmed-seen. No driver-side state anywhere
(contrast ``df.stat.bloomFilter``, which cannot hold 10^10 keys).

Scale math: 10^10 URLs / 1% FPR ≈ 9.6 bits/key ≈ 12 GB of bitmap + 160 GB
of exact pair runs; with B = 2^14 buckets that is ~730 KB bitmap + ~10 MB
exact per bucket — one modest Arrow batch per cogroup task, appends
O(increment).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class SeenConfig:
    n_buckets: int = 64
    bits_per_bucket: int = 1 << 17  # 16 KiB/bucket at the test tier
    k: int = 8


SEEN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("epoch", T.IntegerType()),
        T.StructField("bitmap", T.BinaryType()),
        T.StructField("exact", T.BinaryType()),
    ]
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 finalizer, vectorized over uint64."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _probe_positions(hashes: np.ndarray, cfg: SeenConfig) -> np.ndarray:
    """(n, k) bit positions via double hashing: pos_i = h1 + i*h2 mod m."""
    h = hashes.astype(np.uint64)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(cfg.k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(cfg.bits_per_bucket)).astype(np.int64)


def _bitmap_test(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized membership test: True where ALL k bits are set."""
    byte_idx = pos >> 3
    bit_mask = np.uint8(1) << (pos & 7).astype(np.uint8)
    return ((bitmap[byte_idx] & bit_mask) == bit_mask).all(axis=1)


def _bitmap_set(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    flat = pos.reshape(-1)
    byte_idx = flat >> 3
    bit_mask = (np.uint8(1) << (flat & 7).astype(np.uint8)).astype(np.uint8)
    np.bitwise_or.at(bitmap, byte_idx, bit_mask)
    return bitmap


def _exact_runs(state: pd.DataFrame) -> list[np.ndarray]:
    """Each run: (n, 2) int64 array of (h1, h2) rows, lex-sorted."""
    return [
        np.frombuffer(b, dtype="<i8").reshape(-1, 2)
        for b in state["exact"]
        if b is not None and len(b) > 0
    ]


def _sort_pairs(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Distinct (h1, h2) rows in lexicographic order, as an (n, 2) array."""
    pairs = np.column_stack([h1, h2])
    if not np.issubdtype(pairs.dtype, np.integer):
        # a float dtype here means a null or out-of-range hash upstream —
        # casting would silently corrupt identities
        raise TypeError(f"hash columns must be int64, got {pairs.dtype}")
    return np.unique(pairs, axis=0)


def _run_contains(run: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized membership of (h1, h2) in one lex-sorted run."""
    rh1 = run[:, 0]
    left = np.searchsorted(rh1, h1, side="left")
    right = np.searchsorted(rh1, h1, side="right")
    out = np.zeros(len(h1), dtype=bool)
    width = right - left
    one = width == 1  # the overwhelmingly common case: unique h1 in the run
    idx = left[one]
    out[one] = run[idx, 1] == h2[one]
    for i in np.flatnonzero(width > 1):  # h1 collision inside the run: rare
        out[i] = bool((run[left[i] : right[i], 1] == h2[i]).any())
    return out


def _latest_bitmap(state: pd.DataFrame) -> np.ndarray | None:
    if state.empty:
        return None
    row = state.loc[state["epoch"].idxmax()]
    if row["bitmap"] is None:
        return None
    return np.frombuffer(row["bitmap"], dtype=np.uint8)


def with_bucket(df: DataFrame, cfg: SeenConfig, hash_col: str = "url_hash") -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.col(hash_col), F.lit(cfg.n_buckets)).cast("int"))


def empty_state(spark: SparkSession, cfg: SeenConfig) -> DataFrame:
    return spark.createDataFrame([], SEEN_STATE_SCHEMA)


def filter_unseen(
    candidates: DataFrame,
    seen_state: DataFrame,
    cfg: SeenConfig,
) -> DataFrame:
    """Return the candidate rows whose (url_hash, url_hash2) identity is NOT
    in the seen set.

    ``candidates`` must carry ``bucket`` (see :func:`with_bucket`) and both
    hash columns (``url_hash2`` via canon.url_hash2_col); all candidate
    columns pass through.

    One shuffle, zero joins: the full candidate rows flow through the
    bucket-aligned cogroup and only the unseen ones flow out. (A slim
    hash-only variant + anti-join was measured slower here: the extra join
    costs two more stage barriers, which dominate the saved Arrow bytes.)
    """
    k_cfg = cfg
    colnames = [f.name for f in candidates.schema.fields]

    def test_fn(key, cand: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return cand[colnames]
        bitmap = _latest_bitmap(state) if not state.empty else None
        if bitmap is None:
            return cand[colnames]
        h1 = cand["url_hash"].to_numpy()
        h2 = cand["url_hash2"].to_numpy()
        pos = _probe_positions(h1.view(np.uint64), k_cfg)
        maybe = _bitmap_test(bitmap, pos)
        if not maybe.any():
            return cand[colnames]
        sub1, sub2 = h1[maybe], h2[maybe]
        seen_mask = np.zeros(len(sub1), dtype=bool)
        for run in _exact_runs(state):  # runs are non-empty lex-sorted pairs
            seen_mask |= _run_contains(run, sub1, sub2)
        drop = np.zeros(len(cand), dtype=bool)
        drop[np.flatnonzero(maybe)[seen_mask]] = True
        return cand.loc[~drop, colnames]

    return (
        candidates.groupBy("bucket")
        .cogroup(seen_state.groupBy("bucket"))
        .applyInPandas(test_fn, schema=candidates.schema)
    )


def update_state(
    seen_state: DataFrame,
    newly_seen: DataFrame,
    cfg: SeenConfig,
    epoch: int,
) -> DataFrame:
    """One appended seen_state row per touched bucket: cumulative bitmap +
    this epoch's lex-sorted exact pair run. Input needs
    (bucket, url_hash, url_hash2)."""
    m_bytes = cfg.bits_per_bucket // 8
    k_cfg = cfg

    def merge_fn(key, new: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
        if new.empty:
            return pd.DataFrame(columns=["bucket", "epoch", "bitmap", "exact"])
        bucket = int(key[0])
        prior = _latest_bitmap(state)
        bitmap = np.zeros(m_bytes, dtype=np.uint8) if prior is None else prior.copy()
        pairs = _sort_pairs(new["url_hash"].to_numpy(), new["url_hash2"].to_numpy())
        pos = _probe_positions(pairs[:, 0].view(np.uint64), k_cfg)
        bitmap = _bitmap_set(bitmap, pos)
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "epoch": [epoch],
                "bitmap": [bitmap.tobytes()],
                "exact": [pairs.astype("<i8").tobytes()],
            }
        )

    return (
        newly_seen.select("bucket", "url_hash", "url_hash2")
        .groupBy("bucket")
        .cogroup(seen_state.groupBy("bucket"))
        .applyInPandas(merge_fn, schema=SEEN_STATE_SCHEMA)
    )


def compact_state(seen_state: DataFrame, cfg: SeenConfig, epoch: int) -> DataFrame:
    """LSM compaction: merge each bucket's exact runs into one sorted run
    (and keep only the latest bitmap). Run occasionally, off the hot path."""

    def compact_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        bitmap = _latest_bitmap(pdf)
        runs = _exact_runs(pdf)
        merged = (
            np.unique(np.concatenate(runs, axis=0), axis=0)
            if runs
            else np.empty((0, 2), dtype="<i8")
        )
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "epoch": [epoch],
                "bitmap": [bitmap.tobytes() if bitmap is not None else None],
                "exact": [merged.astype("<i8").tobytes()],
            }
        )

    return seen_state.groupBy("bucket").applyInPandas(compact_fn, schema=SEEN_STATE_SCHEMA)
