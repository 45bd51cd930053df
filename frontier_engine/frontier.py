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
    # before any window sort, cut each host's backlog to ~budget rows via an
    # exact priority histogram (see _histogram_precut): the full backlog is
    # only ever AGGREGATED (map-side combined, tiny shuffle), never sorted.
    # None disables (sort the whole backlog, the round-2 behavior)
    precut_bins: int | None = 4096


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
    the longest matching Disallow rule is strictly longer than the longest
    matching Allow rule (no match = length 0, so a tie — including the
    no-rules case — allows). Rules support §2.2.3 wildcards: ``*`` (any
    chars) and trailing ``$`` (end anchor); plain rules keep the
    whole-stage-codegen ``startswith`` fast path, wildcard rules take a
    lazily-evaluated regexp branch (``frontier_engine.robots
    .rule_matches_py`` is the Python twin, property-tested for parity).
    The match target is the URL path INCLUDING the query string, per the
    RFC. Evaluated as pure column expressions over the broadcast robots
    table; a robots table without an ``allow_prefixes`` column (older
    caches, the reference fixtures) behaves as before.

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
    path = canon.pathq_col(F.col("url"))  # path + query: the RFC match target

    def rule_pattern(p: F.Column) -> F.Column:
        # rule → Java regex: trailing $ = end anchor, * = any run, all
        # other regex metachars escaped (mirrors robots.rule_matches_py)
        anchored = p.endswith("$")
        body = F.when(anchored, F.substring(p, F.lit(1), F.length(p) - 1)).otherwise(p)
        esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|*\\])", r"\\$1")
        star = F.regexp_replace(esc, r"\\\*", ".*")
        return F.concat(
            F.lit("^"), star, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
        )

    def rule_matches(p: F.Column) -> F.Column:
        plain = ~p.contains("*") & ~p.endswith("$")
        # CaseWhen is lazy per row: the regexp branch only evaluates for
        # wildcard rules, so plain-prefix tables never pay regex cost
        return F.when(plain, path.startswith(p)).otherwise(
            F.regexp_like(path, rule_pattern(p))
        )

    def longest_match(rules: F.Column) -> F.Column:
        # length of the longest matching rule (octet length of the rule
        # itself, wildcards included — reference-implementation precedence)
        return F.coalesce(
            F.array_max(
                F.transform(
                    rules,
                    lambda p: F.when(rule_matches(p), F.length(p)).otherwise(F.lit(0)),
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


def _budget_col(cfg: DrainConfig, cap_col: str = "_hb_cap"):
    """Per-host epoch budget: the politeness ceiling, optionally capped
    by an external per-host allocation (``cap_col``, e.g. from
    :func:`frontier_engine.hostctl.crawl_budget`). The cap only ever
    SHRINKS the budget. The precut route table applies the SAME
    least/coalesce (see ``_route_table``), so a capped host's histogram
    threshold keeps ~cap survivors — the cut stays exact under caps, not
    merely a safe superset.

    On the routed path ``cap_col`` is ``_bb`` — the capped budget carried
    on the (already-broadcast) routing table rather than probed onto every
    backlog row by a second broadcast join. Exact despite the route
    table's needs-routing-only emission: a host whose cap binds
    (cap < backlog) always has ``_bl > _bb`` and is emitted; a host NOT
    emitted has backlog ≤ min(politeness, cap), so every row's rank is
    ≤ the politeness fallback and ≤ the cap — both filters keep all rows.
    """
    pol = F.greatest(
        F.lit(1),
        F.floor(F.lit(cfg.epoch_seconds) / F.col("crawl_delay")),
    ).cast("int")
    return F.least(pol, F.coalesce(F.col(cap_col), pol).cast("int"))


def _finish(df: DataFrame, rank_col: str) -> DataFrame:
    return (
        df.filter(F.col(rank_col) <= F.col("budget"))
        .withColumn("slot", (F.col(rank_col) - 1).cast("int"))
        .withColumn("sched_offset", (F.col(rank_col) - 1) * F.col("crawl_delay"))
        .drop(rank_col, "budget", "salt", "_mega", "_hb_cap", "_bb")
    )


def _precut_bin_col(nb: int):
    """Histogram bin of ``priority``, monotone in the drain order's leading
    key: engine priorities live in (0, 1] (seeds 1.0, decayed multiplicatively
    — crawl.py), so ``floor(priority*nb)`` clamped into [0, nb-1]; values
    outside [0, 1] land in the edge bins (coarser cut, never wrong) and a
    NULL priority (sorts last under ``priority DESC``) gets bin -1."""
    clamped = F.least(
        F.lit(nb - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(F.col("priority") * nb)),
    )
    return F.when(F.col("priority").isNull(), F.lit(-1).cast("long")).otherwise(clamped)


def _route_table(
    allowed: DataFrame, cfg: DrainConfig, host_caps: DataFrame | None = None
) -> DataFrame:
    """ONE aggregate pass over the backlog → a tiny per-host routing table
    ``(host, _tb, _mega, _bb)`` driving the histogram pre-cut, the
    skew-salting census, and (``_bb``) the capped per-host budget.

    ``host_caps`` (optional, ``(host, _hb_cap)``) joins AFTER the
    ``groupBy(host, bin)`` aggregate — host×bins cardinality, never the
    backlog — so external budget caps cost a tiny-on-tiny join instead of
    a broadcast probe against every backlog row (the round-3 design's
    measured overhead). The drain reads the cap back off this table via
    ``_bb``; see :func:`_budget_col` for the exactness argument.

    Pre-cut (``_tb``): the drain must sort ~budget rows per host (they get
    slots); the round-2 design sorted the whole backlog to find them. At
    100 TB the backlog is ~1000× the budget — a full sort of the frontier
    per epoch is the single largest avoidable cost in the crawl loop. So
    aggregate instead: exact ``groupBy(host, bin(priority))`` counts
    (map-side combined, shuffle ≤ hosts × (bins+1) tiny rows, NO row
    movement), then per host walk bins top-down; the threshold bin ``_tb``
    is the largest bin whose top-down cumulative count reaches the budget
    (NULL when the backlog is under budget — keep everything). Dropping
    ``bin < _tb`` is EXACT, not approximate: ≥ budget rows survive by
    construction, and every dropped row has strictly smaller priority — the
    leading key of the drain order — than every survivor, so its final rank
    is > budget. Survivors ≤ budget + one tie bin; only degenerate priority
    distributions (a whole backlog in one bin) defeat the cut, which no
    priority-based cut can avoid. Integer counts make the threshold — and
    therefore the schedule — identical at any parallelism.

    Census (``_mega``): the same cumulative walk yields the SURVIVOR count
    per host (the cumulative count at ``_tb``), so skew routing needs no
    second scan: ``_mega`` = survivors-after-cut > ``skew_threshold``.

    Rows are emitted only for hosts that need routing (a real cut or a mega
    flag), bounding the broadcast by ~n_rows / min(budget, threshold) —
    over-budget hosts only, the same shape at 100 TB as a mega-host list.
    """
    nb = cfg.precut_bins
    bin_expr = _precut_bin_col(nb) if nb else F.lit(0).cast("long")
    w_host = Window.partitionBy("host")
    w_cum = w_host.orderBy(F.col("_bin").desc())
    aggs = [F.count(F.lit(1)).alias("_cnt"), F.min("crawl_delay").alias("_delay")]
    if host_caps is None and "_hb_cap" in allowed.columns:
        # legacy path: caps pre-joined onto backlog rows by the caller
        aggs.append(F.min("_hb_cap").alias("_cap"))
    hist = allowed.groupBy(F.col("host"), bin_expr.alias("_bin")).agg(*aggs)
    if host_caps is not None:
        hist = hist.join(
            F.broadcast(host_caps.select("host", F.col("_hb_cap").alias("_cap"))),
            "host",
            "left",
        )
    elif "_cap" not in hist.columns:
        hist = hist.withColumn("_cap", F.lit(None).cast("int"))
    return (
        hist.withColumn("_cum", F.sum("_cnt").over(w_cum))
        # the threshold budget is the TRUE per-host budget: politeness,
        # shrunk by an external allocation cap when one exists (same
        # least/coalesce as _budget_col) — so a budget-capped host's
        # pre-cut drops down to ~cap survivors instead of keeping the
        # uncapped-politeness superset through the window sort
        .withColumn(
            "_pol",
            F.greatest(
                F.lit(1.0),
                F.floor(F.lit(cfg.epoch_seconds) / F.min("_delay").over(w_host)),
            ).cast("long"),
        )
        .withColumn(
            "_b",
            F.least(
                F.col("_pol"),
                F.coalesce(
                    F.min("_cap").over(w_host).cast("long"), F.col("_pol")
                ),
            ),
        )
        .withColumn("_total", F.sum("_cnt").over(w_host))
        .groupBy("host")
        .agg(
            F.max(F.when(F.col("_cum") >= F.col("_b"), F.col("_bin"))).alias("_tb"),
            F.min(F.when(F.col("_cum") >= F.col("_b"), F.col("_cum"))).alias("_surv"),
            F.max("_total").alias("_bl"),
            F.max("_b").alias("_bb"),
        )
        # cut only when the backlog exceeds the budget; survivors = the
        # first top-down cumulative ≥ budget (= backlog when under budget)
        .withColumn("_tb", F.when(F.col("_bl") > F.col("_bb"), F.col("_tb")))
        .withColumn(
            "_mega",
            F.coalesce(
                F.when(F.col("_tb").isNotNull(), F.col("_surv")), F.col("_bl")
            ) > F.lit(cfg.skew_threshold),
        )
        .filter(F.col("_mega") | F.col("_tb").isNotNull())
        .select("host", "_tb", "_mega", F.col("_bb").cast("int").alias("_bb"))
    )


def _histogram_precut(allowed: DataFrame, cfg: DrainConfig) -> DataFrame:
    """The pre-cut alone (see :func:`_route_table`): drop rows that provably
    cannot make their host's politeness budget, before any sort sees them."""
    thr = _route_table(allowed, cfg).filter(F.col("_tb").isNotNull()).select("host", "_tb")
    nb = cfg.precut_bins
    bin_expr = _precut_bin_col(nb) if nb else F.lit(0).cast("long")
    return (
        allowed.join(F.broadcast(thr), "host", "left")
        .filter(F.col("_tb").isNull() | (bin_expr >= F.col("_tb")))
        .drop("_tb")
    )


def drain(allowed: DataFrame, cfg: DrainConfig, cached: list[DataFrame] | None = None) -> DataFrame:
    """Select the exact per-host politeness-budget top-k of ``allowed``
    (see :func:`drain_split` — this is its drained half, kept as the
    stable single-output API for labs/benches)."""
    return drain_split(allowed, cfg, cached)[0]


def drain_split(
    allowed: DataFrame,
    cfg: DrainConfig,
    cached: list[DataFrame] | None = None,
    host_caps: DataFrame | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """Select the exact per-host politeness-budget top-k of ``allowed``.

    Input must carry frontier columns + ``crawl_delay``. Output: the drained
    rows with ``slot`` (0-based politeness slot) and ``sched_offset``
    (seconds into the epoch = slot × crawl_delay).

    The default path does exactly TWO passes over the backlog and never
    sorts it:

    1. :func:`_route_table` — one aggregate pass → broadcast ``(host, _tb,
       _mega)``: the exact priority-histogram cut threshold (``_tb``) and
       the survivor-count skew census (``_mega``), from the same histogram.
    2. rank — join the routing table, drop rows that provably cannot make
       their host's budget (``bin < _tb``; proof in ``_route_table``), and
       ``row_number`` over ``(host, salt)`` where ``salt`` is 0 for small
       hosts and ``pmod(url_hash, max_salts)`` for mega hosts. For small
       hosts this rank IS the final per-host rank (their whole survivor set
       is one sort group). For mega hosts the per-salt top-``budget`` union
       is a superset (≤ max_salts × budget rows) of the true per-host
       top-k, and a phase-2 window over that small superset assigns the
       exact final ranks. Both branches hang off the SAME ``(host, salt)``
       Exchange, so Spark's ReuseExchange evaluates the scan+join+filter
       once; only the ~budget-per-host survivors are ever shuffled/sorted.

    The drained set, order, and slots are IDENTICAL on every path (all
    exact); the routing table only picks the physical plan, so the schedule
    is byte-identical at any parallelism, threshold, or bin count.
    ``cfg.skew_threshold=None`` = salt unconditionally with no routing pass
    — for callers whose input is too expensive to reference twice
    un-persisted (run_crawl's frontier is parquet-backed, so the routing
    scan is cheap and column-pruned). ``cfg.precut_bins=None`` keeps the
    census but disables the cut (the histogram degenerates to one bin).

    All phases are JVM ``row_number`` windows (sort-based, spill-safe via
    UnsafeExternalSorter) rather than an applyInPandas heap: measured 23%
    faster end-to-end at every parallelism level — the Arrow round-trip of
    full frontier rows through Python cost more than the O(n log n) vs
    O(n log b) sort difference saved.

    Returns ``(drained, rest_parts)``: ``rest_parts`` are the exact
    complement of ``drained`` within ``allowed`` (precut-dropped rows plus
    over-budget rank complements), derived from the SAME ranks as the
    drained set — so the carry-over frontier needs NO anti-join back
    against the backlog. The round-3 design computed rest as
    ``allowed ANTI JOIN drained`` on ``(url_hash, url)``, which shuffled
    the FULL backlog every epoch — at 10^10 URLs that one Exchange moves
    more bytes per epoch than everything else in the drain combined. Here
    the backlog rows that never survive the pre-cut are identified by a
    broadcast-join + filter (zero shuffle), and the over-budget survivors
    fall out of the rank filters the drain already computed. The ranked
    survivor set (small: ~budget rows/host) is persisted (appended to
    ``cached``) so its window sort runs once, not once per consumer branch.
    """
    if cfg.skew_threshold is None:
        # no routing pass to carry the caps on — probe them onto the rows
        if host_caps is not None and "_hb_cap" not in allowed.columns:
            allowed = allowed.join(F.broadcast(host_caps), "host", "left")
        if "_hb_cap" not in allowed.columns:
            allowed = allowed.withColumn("_hb_cap", F.lit(None).cast("int"))
        fr = allowed.withColumn("budget", _budget_col(cfg)).withColumn(
            "salt", F.pmod(F.col("url_hash"), F.lit(cfg.max_salts)).cast("int")
        )
        w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
        ranked1 = fr.withColumn("_rn1", F.row_number().over(w1))
        superset = ranked1.filter(F.col("_rn1") <= F.col("budget")).drop("_rn1")
        rest1 = ranked1.filter(F.col("_rn1") > F.col("budget"))
        w = Window.partitionBy("host").orderBy(*order_cols())
        final = superset.withColumn("rn", F.row_number().over(w)).withColumn(
            "_mega", F.lit(True)
        )
        return _finish(final, "rn"), [rest1, final.filter(F.col("rn") > F.col("budget"))]

    route = _route_table(allowed, cfg, host_caps)
    nb = cfg.precut_bins
    bin_expr = _precut_bin_col(nb) if nb else F.lit(0).cast("long")
    routed = allowed.join(F.broadcast(route), "host", "left")
    cut = F.col("_tb").isNotNull() & (bin_expr < F.col("_tb"))
    # rows the histogram proves can never make their budget: rest, with no
    # shuffle — a broadcast join + filter straight off the backlog scan
    precut_dropped = routed.filter(cut)
    fr = (
        routed.filter(~cut)
        .withColumn("_mega", F.coalesce(F.col("_mega"), F.lit(False)))
        # budget caps ride the routing table (_bb), not a per-row probe
        .withColumn("budget", _budget_col(cfg, "_bb"))
        .withColumn(
            "salt",
            F.when(
                F.col("_mega"), F.pmod(F.col("url_hash"), F.lit(cfg.max_salts))
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("_tb")
    )
    w2 = Window.partitionBy("host").orderBy(*order_cols())

    if nb:
        # one sort of the ~budget-per-host survivors, computed ONCE
        # (persisted) and consumed by the drained/rest branches. Small and
        # mega hosts take the SAME two windows: for a small host salt = 0,
        # so its phase-1 rank is already final and the phase-2 window
        # reproduces it bit-for-bit over ≤ budget rows — unifying the
        # branches keeps each query referencing each cached set exactly
        # ONCE, which is what lets the scan's resident HashPartitioning
        # (host-bucketed frontier snapshots) satisfy every window with no
        # Exchange: a plan that references one cache twice gets its
        # attribute ids deduplicated, and the remapped InMemoryTableScan no
        # longer advertises the partitioning (verified on Spark 4.1).
        w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
        ranked = fr.withColumn("_rn1", F.row_number().over(w1)).persist()
        if cached is not None:
            cached.append(ranked)
        rest_over = ranked.filter(F.col("_rn1") > F.col("budget"))
        superset = ranked.filter(F.col("_rn1") <= F.col("budget")).drop("_rn1")
        final = superset.withColumn("rn", F.row_number().over(w2)).persist()
        if cached is not None:
            cached.append(final)
        rest_merge = final.filter(F.col("rn") > F.col("budget"))
        return _finish(final, "rn"), [precut_dropped, rest_over, rest_merge]

    # no pre-cut: the windows sort FULL backlogs, so filter each branch
    # BELOW its window (separate Exchanges beat sorting everything twice)
    w_small = Window.partitionBy("host").orderBy(*order_cols())
    ranked_small = fr.filter(~F.col("_mega")).withColumn(
        "rn", F.row_number().over(w_small)
    )
    small = _finish(ranked_small, "rn")
    rest_small = ranked_small.filter(F.col("rn") > F.col("budget"))
    w1 = Window.partitionBy("host", "salt").orderBy(*order_cols())
    ranked_mega = (
        fr.filter(F.col("_mega")).withColumn("_rn1", F.row_number().over(w1))
    )
    superset = ranked_mega.filter(F.col("_rn1") <= F.col("budget")).drop("_rn1")
    rest_mega1 = ranked_mega.filter(F.col("_rn1") > F.col("budget"))
    final = superset.withColumn("rn", F.row_number().over(w2))
    rest_mega2 = final.filter(F.col("rn") > F.col("budget"))
    drained = small.unionByName(_finish(final, "rn"))
    return drained, [precut_dropped, rest_small, rest_mega1, rest_mega2]


def drain_epoch(
    frontier: DataFrame,
    robots: DataFrame,
    cfg: DrainConfig,
    epoch_ts: str | None = None,
    host_budgets: DataFrame | None = None,
) -> DrainResult:
    """One politeness epoch: → DrainResult(drained, rest, blocked).

    ``rest`` = allowed-but-over-budget rows plus not-yet-ready rows
    (``ready_ts > epoch_ts`` — the T3 recrawl/freshness gate, skipped when
    ``epoch_ts`` is None), in original frontier schema, carried to the next
    epoch. ``blocked`` = robots-disallowed rows (dropped from the frontier;
    counted in lineage).

    ``host_budgets`` (optional) is a host-cardinality ``(host, budget)``
    allocation table — e.g. :func:`frontier_engine.hostctl.crawl_budget`
    over the trap census — joined onto the drain's routing table (host
    cardinality, never the backlog) so each host's epoch budget becomes
    ``min(politeness budget, allocation)``. Hosts absent from the table
    keep the pure politeness budget; the cap never raises one. Rows a cap
    defers stay in ``rest`` (carried forward, not dropped) — budget
    control demotes, it never discards.
    """
    frontier_cols = [f.name for f in FRONTIER_SCHEMA.fields]
    if epoch_ts is not None:
        deferred = frontier.filter(F.col("ready_ts") > F.lit(epoch_ts).cast("timestamp"))
        frontier = frontier.filter(F.col("ready_ts") <= F.lit(epoch_ts).cast("timestamp"))
    else:
        deferred = None
    # NB: ``allowed`` is consumed by several drain branches, but it is a
    # cheap map-side projection of the (normally parquet-backed) frontier —
    # recomputing beats double-caching 10^8 wide rows.
    cached: list[DataFrame] = []
    allowed, blocked = apply_robots(frontier, robots, cfg)
    caps = None
    if host_budgets is not None:
        caps = host_budgets.select(
            F.col("host"), F.col("budget").cast("int").alias("_hb_cap")
        )
    drained, rest_parts = drain_split(allowed, cfg, cached, host_caps=caps)
    # rest = the rank complement of the drain (drain_split docstring): no
    # anti-join back against the backlog, so the only full-backlog motion
    # in an epoch is the scan itself
    rest = rest_parts[0].select(*frontier_cols)
    for p in rest_parts[1:]:
        rest = rest.unionByName(p.select(*frontier_cols))
    if deferred is not None:
        rest = rest.unionByName(deferred.select(*frontier_cols))
    return DrainResult(drained, rest, blocked.select(*frontier_cols), cached)
