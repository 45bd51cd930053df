"""CDX-style URL index: range-sharded, SURT-sorted capture lookup.

The Common Crawl URL index (and OpenWayback's CDX format it derives
from) answers "which captures exist for this URL / this URL prefix /
this whole domain?" without scanning the archive: every capture is
keyed by its SURT (``canon.surt_col`` — host labels reversed, so one
organization's pages are lexicographically contiguous), the keys are
split into contiguous balanced ranges, each range's entries are stored
sorted, and a tiny driver-side manifest (Common Crawl's ``cluster.idx``
analogue) maps key ranges → shards so a lookup touches only the shards
whose range can intersect the query.

The reference has no index at all — it re-queries its stores' APIs per
crawl (/root/reference/crawler/stores/bhx.py:599-649); at 10^10 URLs an
index over what was already fetched IS the product (dedup, recrawl
diffing, archive lookup all start here).

Plan shape at 100 TB:

- shard planning runs at SURT-HOST cardinality (≈ number of hosts, not
  pages) through :func:`frontier_engine.shardplan.host_shard_plan` —
  the distributed exact prefix sum; never a global row sort;
- pages take exactly one shuffle: the join against the plan routes on
  surt_host, then ``partitionBy(shard)`` + ``sortWithinPartitions``
  writes each shard as internally-sorted parquet (min/max column stats
  on ``surt`` then prune ROW GROUPS inside a shard, on top of the
  manifest pruning whole shards);
- lookup reads the manifest (n_shards rows, driver-side), prunes to the
  shards whose key range intersects the prefix, and pushes
  ``shard IN (...)`` down as a partition filter plus a
  ``startswith(surt)`` scan predicate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import canon
from .shardplan import host_shard_plan

__all__ = [
    "cdx_entries",
    "build_cdx",
    "lookup_cdx",
    "latest_captures",
    "write_cdxj",
]

# lexicographic upper fence for a prefix range: no valid SURT character
# sorts above ￿, so [prefix, prefix + FENCE] covers every key the
# prefix can begin
_FENCE = "￿"


def cdx_entries(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pages → index entries ``(surt, surt_host, ts, url, *keep_cols)``.

    ``surt_host`` (the key's host part, before ``')'``) is the shard
    routing key; rows whose URL yields no SURT (non-http(s) garbage)
    are dropped, mirroring the frontier's host guard.
    """
    surt = canon.surt_col(F.col(url_col))
    out = pages.select(
        surt.alias("surt"),
        F.substring_index(surt, ")", 1).alias("surt_host"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
        *[F.col(c) for c in keep_cols],
    )
    return out.filter(F.col("surt") != "")


def build_cdx(
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    keep_cols: tuple[str, ...] = (),
) -> list[dict]:
    """Write the sharded sorted index; returns (and persists) the manifest.

    Manifest entries are ``{"shard", "lo", "hi", "n"}`` where ``[lo,
    hi]`` bounds the shard's ``surt_host`` range (contiguous by
    construction of the prefix-sum plan) and ``n`` is its entry count,
    counted by reading the committed files back (verifying the write).
    Written to ``<out_dir>/_cluster.json`` after the data commit — the
    underscore keeps it out of Spark's file index, and a reader that
    sees the manifest sees complete data.
    """
    entries = cdx_entries(pages, url_col, ts_col, keep_cols)
    weights = entries.groupBy("surt_host").agg(
        F.count(F.lit(1)).alias("weight")
    )
    plan = host_shard_plan(
        weights, n_shards, host_col="surt_host", weight_col="weight"
    ).select(F.col("host").alias("surt_host"), "shard")
    routed = entries.join(plan, "surt_host")
    (
        routed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "surt", "ts")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    written = pages.sparkSession.read.parquet(out_dir)
    bounds = (
        plan.groupBy("shard")
        .agg(F.min("surt_host").alias("lo"), F.max("surt_host").alias("hi"))
        .join(
            written.groupBy("shard").agg(F.count(F.lit(1)).alias("n")),
            "shard",
            "left",
        )
        .collect()
    )
    manifest = sorted(
        (
            {
                "shard": r["shard"],
                "lo": r["lo"],
                "hi": r["hi"],
                "n": int(r["n"] or 0),
            }
            for r in bounds
        ),
        key=lambda m: m["shard"],
    )
    with open(os.path.join(out_dir, "_cluster.json"), "w") as f:
        json.dump({"format": "cdx-parquet", "shards": manifest}, f, indent=1)
    return manifest


def write_cdxj(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    n_shards: int = 1,
) -> list[dict]:
    """pywb-compatible textual CDXJ export of a WARC sink's captures.

    ``warc_dir`` is a :func:`frontier_engine.warc.write_warc` output
    written with ``capture_index=True`` — its ``_captures/`` sidecar
    already holds each record's compressed member offset/length, so this
    never re-reads the archive.  Each capture becomes one line in the
    format standard replay tools (pywb / OpenWayback / cdxj-indexer)
    index::

        <surt> <yyyyMMddHHmmss> {"url": ..., "mime": ..., "status": ...,
                                 "digest": ..., "length": ..., "offset":
                                 ..., "filename": ...}

    JSON values are strings (pywb's convention), null fields omitted,
    key order fixed.  Output is ``n_shards`` text files, globally sorted
    by (surt, timestamp): range-partitioned on the key then sorted
    within each shard, so shard *k* holds keys entirely below shard
    *k+1* — exactly Common Crawl's sharded ``cdx-NNNNN.gz`` +
    ``cluster.idx`` layout.  A ``_cluster.json`` manifest (shard, lo/hi
    key, line count) commits the export.

    Scale shape: the capture index is (per-record metadata)-sized, never
    page-sized; one range shuffle + per-shard sort is the unavoidable
    cost of a globally-sorted text artifact.  Expression-only line
    building (``to_json`` over a struct) — no Python in the row path;
    the shard writer is the same one-file-per-partition ``mapInPandas``
    pattern as the WARC sink itself.
    """
    caps = spark.read.parquet(os.path.join(warc_dir, "_captures"))
    surt = canon.surt_col(F.col("url"))
    ts14 = F.regexp_replace(F.col("ts"), "[^0-9]", "")
    block = F.to_json(
        F.struct(
            F.col("url"),
            F.col("mime"),
            F.col("http_status").cast("string").alias("status"),
            F.col("payload_digest").alias("digest"),
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            F.col("filename"),
        )
    )
    lines = (
        caps.where(F.col("url").isNotNull())
        .select(
            surt.alias("surt"),
            ts14.alias("ts14"),
            F.concat_ws(" ", surt, ts14, block).alias("line"),
        )
        .where(F.col("surt") != "")
    )
    arranged = lines.repartitionByRange(
        n_shards, "surt", "ts14"
    ).sortWithinPartitions("surt", "ts14")
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"cdx-{pid:05d}.cdxj")
        n = 0
        lo = hi = None
        with open(path, "w", encoding="utf-8") as f:
            for pdf in batches:
                for s, t, line in zip(pdf["surt"], pdf["ts14"], pdf["line"]):
                    f.write(line + "\n")
                    if lo is None:
                        lo = f"{s} {t}"
                    hi = f"{s} {t}"
                    n += 1
        if n == 0:
            os.remove(path)
            return
        yield pd.DataFrame(
            {"shard": [os.path.basename(path)], "lo": [lo], "hi": [hi], "n": [n]}
        )

    manifest = [
        r.asDict()
        for r in arranged.mapInPandas(
            write_partition, "shard string, lo string, hi string, n long"
        ).collect()
    ]
    manifest.sort(key=lambda m: m["shard"])
    with open(os.path.join(out_dir, "_cluster.json"), "w") as f:
        json.dump({"format": "cdxj", "shards": manifest}, f, indent=1)
    return manifest


def _shards_for_prefix(manifest: list[dict], prefix: str) -> list[int]:
    """Shards whose surt_host range can contain a key starting with
    ``prefix``. A shard spans keys in ``[lo + ')', hi + ')' + FENCE]``;
    it intersects ``[prefix, prefix + FENCE]`` unless it lies entirely
    below or entirely above."""
    out = []
    for m in manifest:
        lo_key = m["lo"] + ")"
        hi_key = m["hi"] + ")" + _FENCE
        if hi_key >= prefix and lo_key <= prefix + _FENCE:
            out.append(m["shard"])
    return out


def lookup_cdx(spark: SparkSession, path: str, prefix: str) -> DataFrame:
    """All index entries whose SURT starts with ``prefix`` (``""`` = full
    scan), reading only the shards the manifest cannot rule out.

    The shard restriction is a ``shard IN (...)`` partition filter
    (directories prune before IO); inside a shard the sorted layout
    gives parquet min/max row-group pruning on ``surt``. An empty
    candidate set returns an empty DataFrame without touching data.
    """
    with open(os.path.join(path, "_cluster.json")) as f:
        manifest = json.load(f)["shards"]
    shards = _shards_for_prefix(manifest, prefix)
    df = spark.read.parquet(path)
    if not shards:
        return df.filter(F.lit(False))
    out = df.filter(F.col("shard").isin(shards))
    if prefix:
        out = out.filter(F.col("surt").startswith(prefix))
    return out


def latest_captures(spark: SparkSession, path: str, prefix: str = "") -> DataFrame:
    """Newest capture per SURT under ``prefix`` — the CDX "latest" query
    a recrawl/diff pipeline asks constantly ("what do we already hold for
    this site, and from when?").

    One map-side-combined ``max(struct(ts, …))`` per key over the
    manifest-pruned shards — no window sort, and the partial aggregate
    means a mega-site's captures combine inside each scan task before
    anything shuffles. Deterministic: struct comparison orders by ts
    first, remaining columns break exact-timestamp ties the same way on
    any engine.
    """
    df = lookup_cdx(spark, path, prefix)
    rest = ["ts"] + [c for c in df.columns if c not in ("surt", "ts")]
    packed = df.groupBy("surt").agg(
        F.max(F.struct(*[F.col(c) for c in rest])).alias("_m")
    )
    return packed.select(
        "surt", *[F.col(f"_m.{c}").alias(c) for c in rest]
    )
