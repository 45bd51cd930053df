"""spark-submit entry point for the crawl engine.

Usage (local sandbox):
    python jobs/crawl.py --tier mini --warehouse /tmp/wh [--max-epochs K]
    spark-submit --py-files frontier_engine.zip jobs/crawl.py ...

Replaces the reference CLI drivers run_products.py/run_stores.py
(/root/reference/crawler/stores/run_products.py:13-23 — Typer + importlib
catalog scan) with an argparse + SparkSession entry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="mini", choices=["mini", "test", "bench"])
    ap.add_argument("--pages"), ap.add_argument("--seeds"), ap.add_argument("--robots")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--epoch-seconds", type=float, default=30.0)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--no-stats", action="store_true")
    ap.add_argument("--robots-raw", action="store_true",
                    help="robots input is raw (host, body) robots.txt text; parse it")
    ap.add_argument("--recrawl-epochs", type=int, default=None,
                    help="re-fetch pages every N epochs (T3 freshness)")
    ap.add_argument("--bucketed-corpus", action="store_true",
                    help="prepare (once) and read the pages corpus as a "
                         "bucketed-on-url table: zero corpus shuffle per run")
    ap.add_argument("--corpus-location", default=None,
                    help="where the bucketed corpus lives (default: "
                         "<warehouse>/corpus)")
    ap.add_argument("--pages-format", default="parquet", choices=["parquet", "warc"],
                    help="pages source format: parquet tables or "
                         "Common-Crawl-compatible .warc.gz shards")
    ap.add_argument("--warc-out", default=None,
                    help="after the crawl, archive every fetched page as "
                         "Common-Crawl-compatible .warc.gz shards in this dir")
    ap.add_argument("--warc-dedup", nargs="?", const="", default=None,
                    metavar="PRIOR_WARC_DIR",
                    help="with --warc-out: archive re-fetches whose body was "
                         "already captured as identical-payload-digest "
                         "revisit records (bytes stored once); optional "
                         "value: a prior archive dir to also dedup against")
    ap.add_argument("--warc-requests", action="store_true",
                    help="with --warc-out: pair every capture with a "
                         "request record (WARC-Concurrent-To linkage), "
                         "Common Crawl's request/response layout")
    ap.add_argument("--cdxj-out", default=None,
                    help="with --warc-out: export a pywb-indexable CDXJ "
                         "(SURT-sorted text, member offset/length) of the "
                         "archive into this dir")
    ap.add_argument("--cdxj-shards", type=int, default=1,
                    help="number of range-sharded CDXJ text files")
    ap.add_argument("--wet-out", default=None,
                    help="after the crawl, export the latest extracted text "
                         "per URL as Common-Crawl-style WET .warc.gz shards "
                         "(conversion records) in this dir")
    ap.add_argument("--wat-out", default=None,
                    help="after the crawl, export per-page metadata (out-"
                         "links, rel=canonical) as Common-Crawl-style WAT "
                         ".warc.gz shards in this dir")
    ap.add_argument("--rank-every", type=int, default=None,
                    help="every N epochs, recompute URL-level PageRank over "
                         "the accumulated link graph and blend it into "
                         "frontier priorities (OPIC-style crawl ordering)")
    ap.add_argument("--rank-weight", type=float, default=1.0,
                    help="priority += rank-weight * pagerank on refresh epochs")
    ap.add_argument("--budget-every", type=int, default=None,
                    help="every N epochs, refresh the per-host trap census "
                         "over fetched records and cap each host's drain "
                         "budget at its allocation (IRLbot BEAST-style)")
    ap.add_argument("--budget-base", type=int, default=1000,
                    help="budget for a clean host (scaled by content yield)")
    ap.add_argument("--budget-min", type=int, default=10,
                    help="budget a trap host is demoted to")
    ap.add_argument("--mirror-every", type=int, default=None,
                    help="every N epochs, recompute mirror-replica families "
                         "over fetched records and drop non-canonical "
                         "replica hosts from the frontier (Bharat-Broder)")
    ap.add_argument("--image-pairs-out", default=None,
                    help="after the crawl, harvest LAION-style (page_url, "
                         "img_url, alt) caption pairs from the crawled "
                         "pages' html into parquet in this dir")
    ap.add_argument("--feeds-out", default=None,
                    help="after the crawl, autodiscover RSS/Atom feed URLs "
                         "(link rel=alternate) from the crawled pages' html "
                         "into parquet in this dir")
    ap.add_argument("--cdx-out", default=None,
                    help="after the crawl, build a SURT-keyed CDX-style "
                         "URL index over the captured records in this dir")
    ap.add_argument("--cdx-shards", type=int, default=16,
                    help="number of balanced key-range shards for --cdx-out")
    args = ap.parse_args(argv)
    if args.warc_out is None:
        for flag, val in (
            ("--warc-requests", args.warc_requests),
            ("--cdxj-out", args.cdxj_out),
            ("--warc-dedup", args.warc_dedup is not None),
        ):
            if val:
                ap.error(f"{flag} requires --warc-out (it describes the WARC archive)")

    from frontier_engine import fixtures
    from frontier_engine.crawl import CrawlConfig, run_crawl
    from frontier_engine.frontier import DrainConfig
    from frontier_engine.session import get_spark

    if args.pages:
        paths = {"pages": args.pages, "seeds": args.seeds, "robots": args.robots}
    else:
        paths = fixtures.corpus(args.tier)

    spark = get_spark("crawl-job", cores=args.cores)
    cfg = CrawlConfig(
        max_depth=args.max_depth,
        max_epochs=args.max_epochs,
        collect_stats=not args.no_stats,
        recrawl_after_epochs=args.recrawl_epochs,
        rank_every=args.rank_every,
        rank_weight=args.rank_weight,
        budget_every=args.budget_every,
        budget_base=args.budget_base,
        budget_min=args.budget_min,
        mirror_every=args.mirror_every,
        drain=DrainConfig(epoch_seconds=args.epoch_seconds),
    )
    robots_path = paths["robots"]
    if args.robots_raw:
        # raw (host, body) robots.txt parquet → parse to the structured
        # broadcast table once, persisted beside the warehouse
        from frontier_engine.robots import robots_table

        parsed_path = os.path.join(args.warehouse, "robots_parsed")
        robots_table(spark.read.parquet(robots_path)).write.mode("overwrite").parquet(parsed_path)
        robots_path = parsed_path

    corpus_location = None
    if args.bucketed_corpus or args.corpus_location:
        from frontier_engine.corpus import prepare_corpus

        corpus_location = args.corpus_location or os.path.join(args.warehouse, "corpus")
        prepare_corpus(
            spark, paths["pages"], corpus_location, source_format=args.pages_format
        )

    t0 = time.time()
    summary = run_crawl(
        spark, paths["pages"], paths["seeds"], robots_path, args.warehouse, cfg,
        corpus_location=corpus_location, pages_format=args.pages_format,
    )
    summary["wall_seconds"] = round(time.time() - t0, 2)

    if args.warc_out:
        # archive the raw fetched pages (records keeps extracted text only;
        # html comes from the corpus joined on the crawled URL set).  The
        # corpus side must be CANONICALIZED before the join: records.url is
        # canonical, so a raw URL changed by canonicalization (uppercase
        # host, default port, fragment) would otherwise never match and
        # silently vanish from the archive.
        from pyspark.sql import functions as F

        from frontier_engine import canon
        from frontier_engine.corpus import corpus_df, read_pages
        from frontier_engine.snapshot import SnapshotStore
        from frontier_engine.warc import write_warc

        store = SnapshotStore(args.warehouse)
        crawled = store.read(spark, "records").select("url", "warc_ts").dropDuplicates(["url"])
        if corpus_location is not None:
            # the prepared corpus is already canonical (and bucketed on url)
            raw = corpus_df(spark, corpus_location).select("url", "html", "lang")
        else:
            raw = canon.canonical_first(
                read_pages(spark, paths["pages"], args.pages_format)
                .withColumnRenamed("url", "raw"),
                F.col("raw"),
                "url",
            ).select("url", "html", "lang")
        frame = crawled.join(raw, "url").select("url", "warc_ts", "html", "lang")
        sink_kwargs = {}
        if args.warc_dedup is not None:
            # archive-side recrawl dedup: unchanged bodies become ~200-byte
            # revisit records instead of full captures (optionally probing a
            # prior archive, so a follow-up crawl never re-stores last
            # crawl's bytes)
            from frontier_engine.warc import mark_revisits, read_warc

            prior = read_warc(spark, args.warc_dedup) if args.warc_dedup else None
            frame = mark_revisits(frame, prior=prior).persist()
            summary["warc_revisits"] = frame.where("revisit").count()
            sink_kwargs["revisit_col"] = "revisit"
        if args.warc_requests:
            sink_kwargs["emit_requests"] = True
        if args.cdxj_out:
            sink_kwargs["capture_index"] = True
        manifest = write_warc(frame, args.warc_out, lang_col="lang", **sink_kwargs)
        if args.warc_dedup is not None:
            frame.unpersist()
        summary["warc_shards"] = len(manifest)
        summary["warc_records"] = sum(m["n_records"] for m in manifest)
        if args.cdxj_out:
            from frontier_engine.cdx import write_cdxj

            cdxj = write_cdxj(
                spark, args.warc_out, args.cdxj_out, n_shards=args.cdxj_shards
            )
            summary["cdxj_shards"] = len(cdxj)
            summary["cdxj_lines"] = sum(m["n"] for m in cdxj)

    if args.wet_out:
        # extracted-text twin of --warc-out: WET conversion records from the
        # upsert view (one row per URL, newest epoch wins), matching the
        # WARC/WET pair Common Crawl publishes per crawl
        from frontier_engine.snapshot import SnapshotStore, latest_records
        from frontier_engine.warc import write_wet

        store = SnapshotStore(args.warehouse)
        latest = latest_records(store.read(spark, "records"))
        manifest = write_wet(
            latest.select("url", "warc_ts", "text", "lang"),
            args.wet_out,
            lang_col="lang",
        )
        summary["wet_shards"] = len(manifest)
        summary["wet_records"] = sum(m["n_records"] for m in manifest)

    if args.wat_out:
        # metadata twin: out-links + rel=canonical per crawled page, from
        # the canonicalized corpus html joined on the crawled URL set (the
        # same join discipline as --warc-out)
        from pyspark.sql import functions as F

        from frontier_engine import canon
        from frontier_engine.corpus import corpus_df, read_pages
        from frontier_engine.extract import canonical_udf, links_udf
        from frontier_engine.snapshot import SnapshotStore
        from frontier_engine.warc import write_wat

        store = SnapshotStore(args.warehouse)
        crawled = store.read(spark, "records").select("url", "warc_ts").dropDuplicates(["url"])
        if corpus_location is not None:
            raw = corpus_df(spark, corpus_location).select("url", "html")
        else:
            raw = canon.canonical_first(
                read_pages(spark, paths["pages"], args.pages_format)
                .withColumnRenamed("url", "raw"),
                F.col("raw"),
                "url",
            ).select("url", "html")
        meta = (
            crawled.join(raw, "url")
            .withColumn("links", links_udf("html", "url"))
            .withColumn("canonical", canonical_udf("html", "url"))
        )
        manifest = write_wat(meta, args.wat_out, canonical_col="canonical")
        summary["wat_shards"] = len(manifest)
        summary["wat_records"] = sum(m["n_records"] for m in manifest)

    if args.image_pairs_out or args.feeds_out:
        # harvesting over what the crawl fetched: the same canonicalized-
        # corpus-joined-on-crawled-URLs discipline as --warc-out/--wat-out
        from pyspark.sql import functions as F

        from frontier_engine import canon
        from frontier_engine.corpus import corpus_df, read_pages
        from frontier_engine.snapshot import SnapshotStore

        store = SnapshotStore(args.warehouse)
        crawled = store.read(spark, "records").select("url").dropDuplicates(["url"])
        if corpus_location is not None:
            raw = corpus_df(spark, corpus_location).select("url", "html")
        else:
            raw = canon.canonical_first(
                read_pages(spark, paths["pages"], args.pages_format)
                .withColumnRenamed("url", "raw"),
                F.col("raw"),
                "url",
            ).select("url", "html")
        fetched = crawled.join(raw, "url")
        both = bool(args.image_pairs_out) and bool(args.feeds_out)
        if both:
            # two write actions consume the same corpus join — pay it once
            fetched = fetched.persist()

        if args.image_pairs_out:
            # LAION-style caption pairs: zero-shuffle img-alt map stage
            from frontier_engine.extract import image_text_pairs

            pairs = image_text_pairs(fetched)
            pairs.write.mode("overwrite").parquet(args.image_pairs_out)
            summary["image_pairs"] = spark.read.parquet(args.image_pairs_out).count()

        if args.feeds_out:
            # RSS/Atom autodiscovery: one map stage, one row per feed link;
            # min-aggregated survivor (NOT dropDuplicates) so the exported
            # (url, feed_type) is deterministic at any parallelism
            from frontier_engine.feeds import feeds_from_html

            found = (
                feeds_from_html(fetched)
                .groupBy("feed_url")
                .agg(
                    F.min("url").alias("url"),
                    F.min("feed_type").alias("feed_type"),
                )
                .select("url", "feed_url", "feed_type")
            )
            found.write.mode("overwrite").parquet(args.feeds_out)
            summary["feeds_found"] = spark.read.parquet(args.feeds_out).count()

        if both:
            fetched.unpersist()

    if args.cdx_out:
        # index what the crawl captured: SURT-keyed, range-sharded,
        # manifest-pruned (an archive without its CDX index is
        # unqueryable — Common Crawl ships the two together)
        from frontier_engine.cdx import build_cdx
        from frontier_engine.snapshot import SnapshotStore

        store = SnapshotStore(args.warehouse)
        captures = store.read(spark, "records").select(
            "url", "warc_ts", "epoch", "lang"
        )
        cdx_manifest = build_cdx(
            captures, args.cdx_out, n_shards=args.cdx_shards,
            keep_cols=("epoch", "lang"),
        )
        summary["cdx_shards"] = len(cdx_manifest)
        summary["cdx_entries"] = sum(m["n"] for m in cdx_manifest)

    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
