"""The epoch crawl driver: frontier → politeness drain → fetch-join →
extract → link expansion → seen update → snapshot commit, looped until the
frontier drains dry.

This is the distributed re-expression of the reference's main loop
(`run_products.py run` — SURVEY.md §3.1): its nested
branch×category×page iteration becomes frontier self-feed (paginated scan
S6, /root/reference/crawler/stores/bhx.py:583-647), its per-row upsert
dedup becomes the seen-set anti-join, its asyncio politeness sleep becomes
the per-host token budget, and its "Mongo is the state" becomes per-epoch
atomic snapshots with lineage.

"Fetch" is a batch join of the drained frontier against the Common-Crawl
-style ``pages`` corpus. The corpus is hash-repartitioned by ``url`` ONCE
(and persisted), so every epoch's fetch join reuses that distribution and
shuffles only the drained side; the drained side is NOT force-broadcast —
its size is Σ per-host budgets, which grows linearly with host count (at
millions of hosts a forced broadcast OOMs the driver), so AQE picks
broadcast only when the epoch's drain is actually small. At warehouse
scale the corpus would be a bucketed table on ``bucket(url_hash)`` with
the same effect across jobs.

Determinism: every ordering used anywhere is data-derived
(priority DESC, enqueue_seq ASC, url ASC) — never partition order, never
wall clock, never monotonically_increasing_id — so the schedule is
byte-identical at any parallelism (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import canon
from .extract import links_udf, text_meta_udf
from .frontier import FRONTIER_SCHEMA, DrainConfig, drain_epoch, frontier_from_seeds
from .seen import (
    SeenConfig,
    compact_state,
    empty_state,
    filter_unseen,
    update_state,
    with_bucket,
)
from .snapshot import SnapshotStore


BASE_TS = datetime(2025, 6, 14, 0, 0, 0)


@dataclass(frozen=True)
class CrawlConfig:
    max_depth: int = 6
    max_epochs: int | None = None
    priority_decay: float = 0.5
    retry_decay: float = 0.5
    max_fetch_attempts: int = 2
    collect_stats: bool = True
    # T3 freshness: re-enqueue each successfully fetched URL to be fetched
    # again N epochs later (with decayed priority); None disables recrawl
    recrawl_after_epochs: int | None = None
    recrawl_priority_decay: float = 0.25
    # LSM hygiene: every K epochs merge each seen bucket's exact runs into
    # one (bounds cogroup input at K runs/bucket); None disables
    compact_every: int | None = 8
    # snapshot GC: keep only the last K snapshots' manifests + data files
    # (resume only ever needs the latest; time travel needs history — set
    # None to retain everything)
    expire_keep_last: int | None = None
    # Link-graph authority blend (the OPIC/PageRank frontier-ordering a
    # web-scale crawler runs: pages that the crawl itself discovers to be
    # link-popular outrank their siblings within a host's budget). Every
    # rank_every epochs, recompute URL-level PageRank over the accumulated
    # link_edges table (persisted in snapshots, so resume reproduces the
    # same refresh points) and add rank_weight × rank to every frontier
    # row's priority. Reproducible: fixed-iteration PageRank + an exact
    # join — reruns at the same parallelism are byte-identical. (Unlike
    # the unranked path, ranks are IEEE float SUMS, so across different
    # parallelism the last ulp — and thus an exact priority tie — can
    # differ; the unranked schedule's any-parallelism sha guarantee is
    # scoped to rank_every=None.) None = off (the default;
    # crawl-equivalence-vs-oracle tests run unranked).
    rank_every: int | None = None
    rank_iterations: int = 3
    rank_damping: float = 0.85
    rank_weight: float = 1.0
    # IRLbot-style adaptive budget enforcement (BEAST, Lee et al. WWW 2009
    # §6; hostctl.trap_census → hostctl.crawl_budget): every budget_every
    # epochs, refresh the per-host trap census over the records fetched in
    # epochs BEFORE the refresh point and cap each host's drain budget at
    # its allocation (a cap only ever shrinks the politeness budget;
    # deferred rows stay in the frontier). The census cutoff is derived
    # from the epoch number and reads only committed snapshot tables, so a
    # resumed crawl recomputes byte-identical caps. None = off (the
    # default; crawl-equivalence-vs-oracle tests run uncapped).
    budget_every: int | None = None
    budget_base: int = 1000
    budget_min: int = 10
    budget_max: int = 100000
    # census scope: only records from the last budget_window epochs before
    # the refresh point feed the trap census. None = full history — exact
    # but rescans an ever-growing table; at 10^10 URLs a bounded trailing
    # window is the production posture (recent behavior is what predicts
    # the next epoch, and `records` is partitioned by epoch-correlated
    # snapshots so the window prunes the scan). Still resume-deterministic:
    # the window is a pure function of the epoch number.
    budget_window: int | None = None
    # Mirror-replica suppression (Bharat & Broder WWW 1999 — the
    # enforcement half of hostctl.mirror_hosts/mirror_families): every
    # mirror_every epochs, recompute replica families over records fetched
    # in epochs BEFORE the refresh point and DROP every non-canonical
    # replica host from the frontier (a broadcast anti-join before the
    # drain — the F2 blocklist pattern). Dropped rows leave the frontier
    # permanently (they are not in the drain's carry-over); children that
    # re-discover a replica are re-dropped at the next epoch's gate. The
    # census cutoff is a pure function of the epoch number over committed
    # snapshot tables, so a resumed crawl rebuilds the same drop set.
    # None = off (the default; equivalence-vs-oracle tests run ungated).
    mirror_every: int | None = None
    mirror_min_overlap: int = 2
    mirror_min_jaccard: float = 0.5
    # Census scope for the mirror rescan, mirroring budget_window: only
    # records from the last mirror_window epochs before the refresh point
    # feed mirror_hosts. None = full history — exact but the periodic
    # rescan grows without bound at 10^10 URLs; a bounded trailing window
    # is the production posture (mirrors keep re-manifesting in recent
    # fetches as long as they are being crawled). Resume-deterministic:
    # both bounds are pure functions of the epoch number over committed
    # snapshot tables.
    mirror_window: int | None = None
    drain: DrainConfig = field(default_factory=DrainConfig)
    seen: SeenConfig = field(default_factory=SeenConfig)


def _epoch_ts(cfg: CrawlConfig, epoch: int) -> str:
    """Deterministic logical clock: BASE + epoch × epoch_seconds (never
    wall clock — SURVEY.md §7.4.5)."""
    return (BASE_TS + timedelta(seconds=epoch * cfg.drain.epoch_seconds)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _merge_frontier(parts: list[DataFrame], n_buckets: int | None = None) -> DataFrame:
    """Union frontier row sources and merge per URL, componentwise:
    keep max priority, min depth/enqueue_seq/ready_ts, max fetch_attempts.
    (Last-wins dedup J3 generalized to an order-free deterministic merge —
    /root/reference/crawler/stores/cooponline.py:468-471.)

    The merge key is the full ``url`` (``host`` is in the groupBy only as a
    clustering prefix — it is a pure function of url, so the groups are
    identical): grouping on the 64-bit hash alone would silently merge
    distinct colliding URLs (~n²/2^65 expected — real at 10^10), and one of
    them would never be crawled.

    ``n_buckets``: when set, the union is repartitioned on ``host`` into
    exactly that many partitions BEFORE the merge — one Exchange that
    does double duty: ``HashPartitioning(host)`` satisfies the groupBy's
    ``ClusteredDistribution([host, url])`` (no second shuffle for the
    merge), and it is byte-identical to the bucket function of the
    host-bucketed ``frontier`` snapshot write (same murmur3-pmod), so the
    bucketed writer gets one-bucket-per-task input and adds NO Exchange of
    its own. Net: the whole write side of an epoch moves the backlog
    exactly once.
    """
    allf = parts[0]
    for p in parts[1:]:
        allf = allf.unionByName(p)
    if n_buckets is not None:
        allf = allf.repartition(n_buckets, F.col("host"))
    return allf.groupBy("host", "url").agg(
        F.min("url_hash").alias("url_hash"),
        F.max("priority").alias("priority"),
        F.min("depth").alias("depth"),
        F.min("enqueue_seq").alias("enqueue_seq"),
        F.min("ready_ts").alias("ready_ts"),
        F.max("fetch_attempts").alias("fetch_attempts"),
    ).select(*[f.name for f in FRONTIER_SCHEMA.fields])


def run_crawl(
    spark: SparkSession,
    pages_path: str,
    seeds_path: str,
    robots_path: str,
    warehouse: str,
    cfg: CrawlConfig = CrawlConfig(),
    corpus_location: str | None = None,
    pages_format: str = "parquet",
) -> dict:
    """Run (or resume) a crawl; returns summary stats.

    ``corpus_location``: a corpus prepared once by
    :func:`frontier_engine.corpus.prepare_corpus` (bucketed on ``url``).
    When given, every epoch's fetch join consumes the files' resident
    HashPartitioning directly — the corpus side carries NO shuffle in any
    run, ever, instead of one repartition+persist per run. ``records``
    snapshots are written ``partitionBy(lang)`` so downstream per-language
    reads prune partitions at the scan.

    ``pages_format``: ``"parquet"`` (default) or ``"warc"`` — the latter
    crawls straight out of Common-Crawl-compatible ``.warc.gz`` shards
    (:func:`frontier_engine.corpus.read_pages`); results are byte-identical
    to the parquet path for the same corpus.
    """
    from . import corpus as corpus_layout

    # frontier snapshots are host-bucketed: every epoch's drain (routing
    # histogram, survivor windows, rank complements) consumes the scan's
    # resident HashPartitioning(host) — ZERO shuffle on the read side
    frontier_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    store = SnapshotStore(
        warehouse,
        partition_spec={"records": ["lang"]},
        bucket_spec={"frontier": ("host", frontier_buckets)},
    )
    robots = spark.read.parquet(robots_path)

    if corpus_location is not None:
        # bucketed-table path: zero corpus shuffle in this (or any) run
        pages = corpus_layout.corpus_df(spark, corpus_location).select(
            "url", "warc_ts", "html", "lang"
        )
        pages_persisted = False
    else:
        # one corpus shuffle up front: hash-distribute by the join key so
        # every epoch's fetch join reuses this partitioning (only the
        # drained side moves per epoch); prepare_corpus persists this same
        # layout across jobs
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        pages = (
            canon.canonical_first(
                corpus_layout.read_pages(spark, pages_path, pages_format)
                .withColumnRenamed("url", "raw"),
                F.col("raw"),
                "url",
            )
            .select("url", "warc_ts", "html", "lang")
            .repartition(n_shuffle, "url")
            .persist()
        )
        pages_persisted = True

    manifest = store.current_manifest()
    if manifest is not None:
        frontier = store.read(spark, "frontier")
        seen_state = store.read(spark, "seen_state")
        if seen_state is None:
            seen_state = empty_state(spark, cfg.seen)
        epoch = manifest["epoch"] + 1
    else:
        frontier = frontier_from_seeds(spark.read.parquet(seeds_path))
        seen_state = empty_state(spark, cfg.seen)
        epoch = 0

    total_drained = 0
    total_records = 0
    epochs_run = 0
    host_caps: DataFrame | None = None
    caps_cutoff = -1  # census refresh point the current caps were built at
    mirror_drop: DataFrame | None = None
    mirror_cutoff = -1  # refresh point the current drop set was built at

    while True:
        if cfg.max_epochs is not None and epochs_run >= cfg.max_epochs:
            break

        if cfg.budget_every is not None:
            cutoff = (epoch // cfg.budget_every) * cfg.budget_every
            if cutoff > 0 and cutoff != caps_cutoff:
                from .hostctl import crawl_budget, trap_census

                hist = store.read(spark, "records")
                if hist is not None:
                    if host_caps is not None:
                        host_caps.unpersist()
                    # census over epochs strictly before the refresh point
                    # (optionally only the trailing budget_window of them):
                    # both bounds are pure functions of the epoch number, so
                    # a resumed crawl rebuilds the same caps from the same
                    # committed rows
                    in_scope = F.col("epoch") < cutoff
                    if cfg.budget_window is not None:
                        in_scope = in_scope & (
                            F.col("epoch") >= cutoff - cfg.budget_window
                        )
                    host_caps = crawl_budget(
                        trap_census(
                            hist.filter(in_scope).select(
                                "host", "url", F.col("text").alias("content")
                            )
                        ),
                        base_budget=cfg.budget_base,
                        min_budget=cfg.budget_min,
                        max_budget=cfg.budget_max,
                    ).persist()
                    caps_cutoff = cutoff

        if cfg.mirror_every is not None:
            cutoff = (epoch // cfg.mirror_every) * cfg.mirror_every
            if cutoff > 0 and cutoff != mirror_cutoff:
                from .hostctl import mirror_families, mirror_hosts

                hist = store.read(spark, "records")
                if hist is not None:
                    in_scope = F.col("epoch") < cutoff
                    if cfg.mirror_window is not None:
                        in_scope = in_scope & (
                            F.col("epoch") >= cutoff - cfg.mirror_window
                        )
                    pairs = mirror_hosts(
                        hist.filter(in_scope).select(
                            "host", F.col("text").alias("content")
                        ),
                        min_overlap=cfg.mirror_min_overlap,
                        min_jaccard=cfg.mirror_min_jaccard,
                    )
                    if mirror_drop is not None:
                        mirror_drop.unpersist()
                    mirror_drop = (
                        mirror_families(pairs)
                        .filter(F.col("host") != F.col("canonical"))
                        .select("host")
                        .persist()
                    )
                    mirror_cutoff = cutoff

        gated = frontier
        if mirror_drop is not None:
            # replica blocklist (F2 anti-join): the drop set is
            # host-cardinality — broadcast; everything on a non-canonical
            # replica host leaves the frontier here
            gated = frontier.join(F.broadcast(mirror_drop), "host", "left_anti")

        drain_res = drain_epoch(
            gated,
            robots,
            cfg.drain,
            epoch_ts=_epoch_ts(cfg, epoch),
            host_budgets=host_caps,
        )
        drained, rest, blocked = drain_res
        drained = drained.persist()
        n_drained = drained.count()
        if n_drained == 0:
            drained.unpersist()
            break

        # --- simulated fetch: corpus ⋈ drained on the corpus' resident
        # partitioning; no forced broadcast (AQE may still choose one when
        # the epoch's drain is genuinely small)
        ok = pages.join(drained, "url", "inner").persist()
        ok_urls = ok.select("url")
        missing = drained.join(ok_urls, "url", "left_anti")

        # --- extraction (vectorized pandas UDF; byte-identical invariant).
        # REP page-level compliance: a meta-robots noindex page is fetched,
        # scheduled and link-expanded (unless it also says nofollow — the
        # shared extractor handles that), but never stored in records —
        # one combined Arrow pass produces text + the verdict.
        records_inc = (
            ok.select(
                "url",
                "url_hash",
                "host",
                "depth",
                "warc_ts",
                "lang",
                text_meta_udf(F.col("html")).alias("_tm"),
                F.lit(epoch).alias("epoch"),
                "slot",
                "sched_offset",
            )
            .filter(~F.col("_tm").getField("noindex"))
            .select(
                "url",
                "url_hash",
                "host",
                "depth",
                "warc_ts",
                "lang",
                F.col("_tm").getField("text").alias("text"),
                "epoch",
                "slot",
                "sched_offset",
            )
        )

        schedule_inc = drained.select(
            F.lit(epoch).alias("epoch"), "host", "slot", "sched_offset", "url", "url_hash"
        )

        # --- seen update: first-time schedules only (retries already seen);
        # identity is the 128-bit (url_hash, url_hash2) pair
        newly = with_bucket(
            drained.filter(F.col("fetch_attempts") == 0).select(
                "url_hash", canon.url_hash2_col(F.col("url")).alias("url_hash2")
            ),
            cfg.seen,
        ).select("bucket", "url_hash", "url_hash2")
        seen_inc = update_state(seen_state, newly, cfg.seen, epoch)
        seen_after = seen_state.unionByName(seen_inc)

        # --- link expansion → child frontier rows (canonical URL gets its
        # own projection so the derived hash/host columns reference an
        # attribute, not 4 inlined copies of the canonical CASE — see
        # canon.canonical_first)
        exploded = ok.select(
            "depth",
            "priority",
            F.col("url_hash").alias("src_hash"),
            F.explode(links_udf(F.col("html"), F.col("url"))).alias("raw_link"),
        )
        expanded = canon.identity_first(exploded, F.col("raw_link"), "c_url")
        children = (
            expanded
            .select(
                F.col("c_url").alias("url"),
                "url_hash",
                "url_hash2",
                "host",
                (F.col("priority") * cfg.priority_decay).alias("priority"),
                (F.col("depth") + 1).alias("depth"),
                F.lit(epoch + 1).cast("long").alias("enqueue_seq"),
                F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
                F.lit(0).alias("fetch_attempts"),
            )
            .filter((F.col("host") != "") & (F.col("depth") <= cfg.max_depth))
        )
        children_unseen = filter_unseen(
            with_bucket(children, cfg.seen), seen_after, cfg.seen
        ).drop("bucket", "url_hash2")

        # --- retry / dead-letter (reference has print-and-continue only —
        #     /root/reference/crawler/stores/bhx.py:604-606; we re-enqueue
        #     with decayed priority, then dead-letter at max attempts)
        retry_src = missing.select(*[f.name for f in FRONTIER_SCHEMA.fields])
        retries = (
            retry_src.filter(F.col("fetch_attempts") + 1 < cfg.max_fetch_attempts)
            .withColumn("fetch_attempts", F.col("fetch_attempts") + 1)
            .withColumn("priority", F.col("priority") * cfg.retry_decay)
            .withColumn("enqueue_seq", F.lit(epoch + 1).cast("long"))
        )
        dead_inc = (
            retry_src.filter(F.col("fetch_attempts") + 1 >= cfg.max_fetch_attempts)
            .select("url", "url_hash", "host", F.lit(epoch).alias("epoch"),
                    (F.col("fetch_attempts") + 1).alias("fetch_attempts"))
        )

        rest_rows = rest.select(*[f.name for f in FRONTIER_SCHEMA.fields])
        merge_parts = [rest_rows, children_unseen, retries]

        if cfg.recrawl_after_epochs is not None:
            # T3 recrawl: fetched pages come back into the frontier, dormant
            # until their ready_ts (the reference re-runs whole groups every
            # ~1/4 day — /root/reference/crawler/json_fetch.py:29)
            recrawl_rows = ok.select(
                "url",
                "url_hash",
                "host",
                (F.col("priority") * cfg.recrawl_priority_decay).alias("priority"),
                "depth",
                F.lit(epoch + cfg.recrawl_after_epochs).cast("long").alias("enqueue_seq"),
                F.lit(_epoch_ts(cfg, epoch + cfg.recrawl_after_epochs))
                .cast("timestamp")
                .alias("ready_ts"),
                F.lit(0).alias("fetch_attempts"),
            )
            merge_parts.append(recrawl_rows)

        next_frontier = _merge_frontier(merge_parts, n_buckets=frontier_buckets)

        # --- link-graph authority refresh (optional; see CrawlConfig)
        edges_inc = None
        if cfg.rank_every is not None:
            edges_inc = expanded.filter(F.col("host") != "").select(
                F.col("src_hash").alias("src"),
                F.col("url_hash").alias("dst"),
                F.lit(epoch).cast("long").alias("epoch"),
            )
            if (epoch + 1) % cfg.rank_every == 0:
                from .graph import frontier_priority_from_ranks, pagerank

                hist = store.read(spark, "link_edges")
                all_edges = edges_inc.select("src", "dst")
                if hist is not None:
                    all_edges = hist.select("src", "dst").unionByName(all_edges)
                ranks = pagerank(
                    all_edges,
                    iterations=cfg.rank_iterations,
                    damping=cfg.rank_damping,
                )
                # URL-granular ranks: frontier-sized, so an honest hash
                # join (no broadcast) — then restore the host clustering
                # the bucketed frontier write expects. Both shuffles are
                # paid only on rank-refresh epochs.
                next_frontier = frontier_priority_from_ranks(
                    next_frontier,
                    ranks,
                    key="url_hash",
                    weight=cfg.rank_weight,
                    broadcast_ranks=False,
                ).repartition(frontier_buckets, F.col("host"))

        # --- per-partition lineage (north_star: partition id, host range,
        #     URLs emitted/deduped, politeness-latency spread)
        lineage_inc = (
            drained.withColumn("partition_id", F.spark_partition_id())
            .join(ok_urls.withColumn("fetched", F.lit(True)), "url", "left")
            .groupBy("partition_id", "host")
            .agg(
                F.lit(epoch).alias("epoch"),
                F.count(F.lit(1)).alias("urls_drained"),
                F.sum(F.when(F.col("fetched"), 1).otherwise(0)).alias("pages_ok"),
                F.sum(F.when(F.col("fetched").isNull(), 1).otherwise(0)).alias("pages_missing"),
                F.min("slot").alias("first_slot"),
                F.max("slot").alias("last_slot"),
                F.max("sched_offset").alias("max_sched_offset"),
                # fetch-latency histogram (north_star): log2 buckets over the
                # politeness scheduling latency in seconds — [0,1) [1,2)
                # [2,4) ... [64,inf). Same groupBy, zero extra shuffle.
                F.array(
                    *[
                        F.sum(
                            F.when(
                                (F.col("sched_offset") >= lo)
                                & (F.lit(hi is None) | (F.col("sched_offset") < F.lit(hi or 0))),
                                1,
                            ).otherwise(0)
                        )
                        for lo, hi in [
                            (0, 1), (1, 2), (2, 4), (4, 8),
                            (8, 16), (16, 32), (32, 64), (64, None),
                        ]
                    ]
                ).alias("latency_hist"),
            )
        )

        stats = {"epoch": epoch, "n_drained": n_drained}

        # stats come from df.observe() on DataFrames the commit writes
        # anyway — zero extra jobs (the old per-epoch .count() calls each
        # re-ran the full epoch DAG)
        observations: dict[str, Observation] = {}
        if cfg.collect_stats:
            observations["n_records"] = Observation()
            records_inc = records_inc.observe(
                observations["n_records"], F.count(F.lit(1)).alias("n")
            )
            observations["n_frontier_next"] = Observation()
            next_frontier = next_frontier.observe(
                observations["n_frontier_next"], F.count(F.lit(1)).alias("n")
            )
            observations["n_blocked"] = Observation()
            blocked = blocked.observe(
                observations["n_blocked"], F.count(F.lit(1)).alias("n")
            )

        # LSM compaction every K epochs: replace the seen table with one
        # merged run per bucket instead of appending another run
        compacting = (
            cfg.compact_every is not None
            and epoch > 0
            and (epoch + 1) % cfg.compact_every == 0
        )
        replace_tables = {"frontier": next_frontier}
        append_tables = {
            "records": records_inc,
            "schedule": schedule_inc,
            "lineage": lineage_inc,
            "dead_letter": dead_inc,
            "blocked": blocked,
        }
        if edges_inc is not None:
            append_tables["link_edges"] = edges_inc
        if compacting:
            replace_tables["seen_state"] = compact_state(seen_after, cfg.seen, epoch)
        else:
            append_tables["seen_state"] = seen_inc

        # stats_fn runs after the data writes (observations complete) but
        # before the manifest write, so the manifest is immutable-complete
        def observed_stats() -> dict:
            return {k: int(o.get["n"]) for k, o in observations.items()}

        store.commit(
            epoch,
            replace=replace_tables,
            append=append_tables,
            stats=stats,
            stats_fn=observed_stats if cfg.collect_stats else None,
        )

        if cfg.collect_stats:
            stats.update(observed_stats())
            total_records += stats["n_records"]

        if cfg.expire_keep_last is not None:
            store.expire_snapshots(keep_last=cfg.expire_keep_last)

        drained.unpersist()
        ok.unpersist()
        drain_res.unpersist()

        # re-read committed state: truncates the logical plan per epoch and is
        # exactly what a resumed job would see
        frontier = store.read(spark, "frontier")
        seen_state = store.read(spark, "seen_state")

        total_drained += n_drained
        epoch += 1
        epochs_run += 1

    if pages_persisted:
        pages.unpersist()
    if host_caps is not None:
        host_caps.unpersist()
    if mirror_drop is not None:
        mirror_drop.unpersist()
    return {
        "epochs_run": epochs_run,
        "last_epoch": epoch - 1,
        "total_drained": total_drained,
        "total_records": total_records,
    }
