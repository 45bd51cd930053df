"""Persistent bucketed corpus layout: the ``pages`` table written ONCE as a
Spark bucketed table on the fetch-join key, so no run ever shuffles the
corpus again (SURVEY.md §4.2 physical layout; the distributed re-expression
of the reference's per-shard DDL routing, /root/reference/db/init.sql:3-123).

``run_crawl`` without this layout hash-repartitions the corpus per run and
persists it for the run's epochs — one shuffle per run. With it, the
shuffle happens once at ``prepare_corpus`` time: every later job (and every
epoch inside it) scans the bucketed files, whose ``HashPartitioning(url)``
the fetch join consumes directly — the corpus side of the join carries NO
Exchange in the plan, only the (small) drained side moves. At 100 TB the
corpus is petabytes and the drained epoch is gigabytes; this asymmetry is
the whole game.

Bucket metadata lives in the session catalog; the files carry Spark bucket
ids in their names. A NEW session re-declares the same external bucketed
table over the existing files (``open_corpus``) — no rewrite, metadata
only — which is the offline stand-in for a shared metastore/Iceberg
catalog's bucket spec.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import canon

CORPUS_COLS = "url STRING, warc_ts TIMESTAMP, html BINARY, lang STRING"
_MARKER = "_FE_CORPUS.json"


def _table_name(location: str) -> str:
    return "fe_corpus_" + hashlib.md5(location.encode()).hexdigest()[:10]


def read_pages(spark: SparkSession, pages_path: str, source_format: str = "parquet") -> DataFrame:
    """The raw (un-canonicalized) pages source, normalized to the engine's
    page schema ``(url, warc_ts, html, lang)``.

    ``source_format="warc"`` reads Common-Crawl-compatible ``.warc.gz``
    shards (:func:`frontier_engine.warc.read_warc`): response records with a
    target URI and a 2xx status (or none recorded), ``lang`` recovered from
    the ``WARC-Identified-Content-Language`` header when present.  This is
    the front door for real Common Crawl data — the reference ingests what
    it fetched (/root/reference/crawler/stores/bhx.py:599-649); at 100 TB
    "what was fetched" arrives as WARC shards.
    """
    if source_format == "warc":
        from . import warc as warc_mod

        raw = warc_mod.read_warc(spark, pages_path)
        return raw.filter(
            (F.col("warc_type") == "response")
            & F.col("url").isNotNull()
            & (F.col("http_status").isNull() | F.col("http_status").between(200, 299))
        ).select("url", "warc_ts", "html", "lang")
    if source_format == "parquet":
        return spark.read.parquet(pages_path).select("url", "warc_ts", "html", "lang")
    raise ValueError(f"unknown pages source_format {source_format!r}")


def prepare_corpus(
    spark: SparkSession,
    pages_path: str,
    location: str,
    n_buckets: int = 32,
    force: bool = False,
    source_format: str = "parquet",
    bloom_filter: bool = True,
    bloom_ndv: int = 1 << 20,
) -> str:
    """Canonicalize the raw pages and write them once as a bucketed,
    bucket-sorted table at ``location``. Returns the catalog table name.

    Idempotent: an existing prepared location is reused (metadata
    re-declared if this session has never seen it) unless ``force``.
    The one shuffle here (repartition on the bucket key so each bucket is
    ONE file, making the ``sortBy`` usable) replaces every future run's
    corpus repartition.  ``source_format="warc"`` ingests .warc.gz shards
    (see :func:`read_pages`) — WARC-in, bucketed-parquet-out is the
    normalize-once step of a Common Crawl pipeline.
    """
    marker = os.path.join(location, _MARKER)
    name = _table_name(location)
    if os.path.exists(marker) and not force:
        return open_corpus(spark, location)

    pages = (
        canon.canonical_first(
            read_pages(spark, pages_path, source_format).withColumnRenamed("url", "raw"),
            F.col("raw"),
            "url",
        )
        .select("url", "warc_ts", "html", "lang")
        .repartition(n_buckets, F.col("url"))
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = pages.write.mode("overwrite").format("parquet")
    if bloom_filter:
        # Parquet bloom filter on the bucket/sort key: bucket pruning
        # narrows a URL point lookup to ONE file; the bloom then skips
        # every row group inside it that cannot hold the key via a footer
        # probe, so the lookup (CDC gate, revisit check, debugging a
        # single page out of 100 TB) touches ~0 data pages instead of a
        # whole bucket scan. ``bloom_ndv`` is the per-file expected
        # distinct count — size it to corpus_rows / n_buckets in real
        # deployments (a too-small NDV inflates the false-positive rate,
        # never correctness; parquet caps the bitset at
        # ``parquet.bloom.filter.max.bytes``, 1 MiB default).
        writer = writer.option("parquet.bloom.filter.enabled#url", "true").option(
            "parquet.bloom.filter.expected.ndv#url", str(int(bloom_ndv))
        )
    (
        writer.bucketBy(n_buckets, "url")
        .sortBy("url")
        .option("path", location)
        .saveAsTable(name)
    )
    with open(marker + ".tmp", "w") as f:
        json.dump(
            {
                "n_buckets": n_buckets,
                "source": pages_path,
                "source_format": source_format,
                "bloom_filter": bool(bloom_filter),
            },
            f,
        )
    os.replace(marker + ".tmp", marker)
    return name


def open_corpus(spark: SparkSession, location: str) -> str:
    """(Re-)declare the external bucketed table over an already-prepared
    location (fresh session / resumed job) and return its name. Metadata
    only — the data files are untouched."""
    marker = os.path.join(location, _MARKER)
    with open(marker) as f:
        meta = json.load(f)
    name = _table_name(location)
    if not spark.catalog.tableExists(name):
        spark.sql(
            f"CREATE TABLE {name} ({CORPUS_COLS}) USING PARQUET "
            f"CLUSTERED BY (url) SORTED BY (url) INTO {meta['n_buckets']} BUCKETS "
            f"LOCATION '{location}'"
        )
    return name


def corpus_df(spark: SparkSession, location: str) -> DataFrame:
    return spark.table(open_corpus(spark, location))
