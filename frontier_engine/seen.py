"""Two-tier distributed URL-seen set.

Generalizes the reference's upsert-as-dedup (Mongo ``update_one(upsert=True)``
keyed on ``(store, sku)``, /root/reference/db/__init__.py:40,:63) to a
10^10-key seen set:

Tier 1 — ``seen_bitmap(bucket:int, bitmap:binary)``: B bucket shards, each a
blocked Bloom filter (k probes derived from the 64-bit xxhash64 identity via
a splitmix64 finalizer, all numpy-vectorized). A negative is DEFINITELY
unseen — the common case at crawl time — and never touches tier 2.

Tier 2 — ``seen_urls(bucket:int, url_hash:long)``: the exact backstop. Only
Bloom-positive candidates (true dupes + FPR·N false positives) are
anti-joined against it, so Bloom false positives can never drop a URL —
the seen set is EXACT, matching the reference's probe-then-upsert semantics.

Both tiers are partitioned by ``bucket = pmod(url_hash, B)`` so the bitmap
test/merge is a co-grouped map over aligned buckets (one Arrow batch per
bucket, no driver-side state — contrast ``df.stat.bloomFilter`` which
collects to the driver and cannot hold 10^10 keys).

Scale note: at 10^10 URLs / 1% FPR a classic Bloom needs ~9.6 bits/key ≈
12 GB total; with B = 2^14 buckets that is ~730 KB per bucket — one small
Arrow batch per cogroup task. ``bits_per_bucket`` is sized for the test tier
here and is a pure config knob.
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


def with_bucket(df: DataFrame, cfg: SeenConfig, hash_col: str = "url_hash") -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.col(hash_col), F.lit(cfg.n_buckets)).cast("int"))


def empty_state(spark: SparkSession, cfg: SeenConfig) -> tuple[DataFrame, DataFrame]:
    """(seen_bitmap, seen_urls) — both empty."""
    bitmap_schema = T.StructType(
        [T.StructField("bucket", T.IntegerType()), T.StructField("bitmap", T.BinaryType())]
    )
    urls_schema = T.StructType(
        [T.StructField("bucket", T.IntegerType()), T.StructField("url_hash", T.LongType())]
    )
    return (
        spark.createDataFrame([], bitmap_schema),
        spark.createDataFrame([], urls_schema),
    )


def filter_unseen(
    candidates: DataFrame,
    seen_bitmap: DataFrame,
    seen_urls: DataFrame,
    cfg: SeenConfig,
) -> DataFrame:
    """Return the candidate rows whose url_hash is NOT in the seen set.

    ``candidates`` must carry a ``bucket`` column (see :func:`with_bucket`);
    all candidate columns pass through.

    Arrow-payload discipline: only (bucket, url_hash) crosses into Python,
    and only the Bloom-POSITIVE hashes cross back (the common case — a fresh
    URL — never returns from the UDF). Positives are then confirmed against
    the exact backstop (semi-join) and removed from the candidates with a
    JVM-side int64 anti-join, so false positives can never drop a URL.
    """
    k_cfg = cfg

    def test_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty or right["bitmap"].iloc[0] is None:
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        bitmap = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
        hashes = left["url_hash"].to_numpy()
        pos = _probe_positions(hashes.view(np.uint64), k_cfg)
        flags = _bitmap_test(bitmap, pos)
        return pd.DataFrame({"url_hash": hashes[flags]})

    positives = (
        candidates.select("bucket", "url_hash")
        .groupBy("bucket")
        .cogroup(seen_bitmap.groupBy("bucket"))
        .applyInPandas(test_fn, schema="url_hash long")
    )
    confirmed_seen = positives.join(seen_urls.select("url_hash"), "url_hash", "left_semi")
    return candidates.join(confirmed_seen, "url_hash", "left_anti")


def update_bitmaps(
    seen_bitmap: DataFrame,
    newly_seen: DataFrame,
    cfg: SeenConfig,
) -> DataFrame:
    """Merge newly-seen url_hashes into the bucket bitmaps (cogrouped map).

    ``newly_seen`` needs (bucket, url_hash). Buckets untouched this epoch are
    passed through unchanged (cogroup yields keys present on either side).
    """
    m_bytes = cfg.bits_per_bucket // 8
    k_cfg = cfg

    def merge_fn(key, new: pd.DataFrame, old: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        if old.empty or old["bitmap"].iloc[0] is None:
            bitmap = np.zeros(m_bytes, dtype=np.uint8)
        else:
            bitmap = np.frombuffer(old["bitmap"].iloc[0], dtype=np.uint8).copy()
        if not new.empty:
            pos = _probe_positions(new["url_hash"].to_numpy().view(np.uint64), k_cfg)
            bitmap = _bitmap_set(bitmap, pos)
        return pd.DataFrame({"bucket": [bucket], "bitmap": [bitmap.tobytes()]})

    return (
        newly_seen.select("bucket", "url_hash")
        .groupBy("bucket")
        .cogroup(seen_bitmap.groupBy("bucket"))
        .applyInPandas(merge_fn, schema="bucket int, bitmap binary")
    )
