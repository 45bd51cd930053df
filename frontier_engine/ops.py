"""Relational operator library: the reference's joins/filters/sinks as
named, reusable DataFrame combinators (SURVEY.md §2.2-2.6).

Each wraps the idiomatic Spark primitive so intent is explicit and the
physical strategy (broadcast, anti-join, window) is chosen once, centrally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_allowlist(df: DataFrame, allow: DataFrame, on: str | list[str]) -> DataFrame:
    """F3: keep rows whose key exists in the (small) allowlist — broadcast
    left-semi (cooponline.py:529-541 valid_titles)."""
    return df.join(F.broadcast(allow), on, "left_semi")


def anti_blocklist(df: DataFrame, block: DataFrame, on: str | list[str]) -> DataFrame:
    """F2 generalized: drop rows whose key exists in the blocklist
    (bhx.py:574-575 store blacklist → URL/host blocklist)."""
    return df.join(F.broadcast(block), on, "left_anti")


def last_wins(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """J3: deterministic last-wins dedup — row_number over an explicit
    order, NEVER arrival order (cooponline.py:468-471 store_map overwrite).
    ``order_by`` should put the winner first."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(existing: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """J4/K1: MERGE semantics — updates replace matching keys, others kept
    (db/__init__.py:27-63 update_one(upsert=True)). ``updates`` must be
    unique per key (use last_wins first if not). Anti-join + union: the
    Iceberg MERGE INTO equivalent without the runtime jar."""
    kept = existing.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def top_k_per_group(
    df: DataFrame, keys: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """§2.6: the frontier-drain pattern as a general operator."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def export_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """K5: CSV export sink. Always quoted+escaped — the reference's shipped
    CSV has 47 rows corrupted by unescaped embedded commas
    (/root/reference/bhx.csv, SURVEY.md §5.1); quoteAll prevents that class
    of corruption."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(path)
    )


def decode_cookie_json(cookie: Column, json_path: str) -> Column:
    """C15: URL-decode a cookie value then pull a field from its JSON
    payload (bhx.py:438-443 `unquote(cookie)` → json → device id)."""
    return F.get_json_object(F.url_decode(cookie), json_path)


def mapped_with_fallback(
    df: DataFrame, mapping: DataFrame, key: str, mapped_col: str, out_col: str
) -> DataFrame:
    """J6: broadcast-mapped value with identity fallback
    (categories_mapping.get(title, title), cooponline.py:542-588)."""
    m = mapping.select(F.col(key), F.col(mapped_col).alias("_mapped"))
    return (
        df.join(F.broadcast(m), key, "left")
        .withColumn(out_col, F.coalesce(F.col("_mapped"), F.col(key)))
        .drop("_mapped")
    )


def _parse_size_bytes(v: str) -> int:
    """Spark size-conf string → bytes ('134217728b', '128m', '1g', '128MB')."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(s) * mult


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition UP when the scan yields fewer partitions
    than ``min_parts`` (default: the cluster's default parallelism).

    A small parquet table often arrives as ONE file with one row group —
    unsplittable, so every downstream expression/UDF pipeline runs on a
    single core no matter how many executors exist. One cheap shuffle of
    the (small, by construction) input unlocks full parallelism; measured
    6x on the sf0.1 shingle pipeline at 32 cores. No-op when the scan is
    already parallel enough, so it is safe to call unconditionally on
    CPU-heavy paths.

    The partition estimate comes from the scan's file list + sizes
    (``df.inputFiles()`` — plan metadata, no job), NOT ``df.rdd`` — the RDD
    conversion materializes a deoptimized plan per call and breaks
    whole-stage reuse downstream.  Non-file-backed plans (in-memory
    relations) expose no partition count through plan metadata, so they
    are ALWAYS repartitioned to ``min_parts``: the helper's contract is
    "small input, CPU-heavy downstream", where one shuffle of a tiny
    relation is noise but a silently single-partition plan (e.g. anything
    downstream of ``coalesce(1)``) serializes the whole pipeline. This
    keeps the package free of ``.rdd`` in every path without trading away
    the guarantee the helper exists for.
    """
    import os as _os
    from urllib.parse import urlparse

    spark = df.sparkSession
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        max_pb = _parse_size_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        est = 0
        for f in files:
            path = urlparse(f).path or f
            try:
                size = _os.path.getsize(path)
            except OSError:
                size = 0
            est += max(1, -(-size // max_pb))  # ceil: a big file still splits
            if est >= min_parts:
                return df
        return df.repartition(min_parts)
    return df.repartition(min_parts)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum by
    a multiplicative hash of the id (Knuth's 2654435761 mod 2^32 — cheap,
    well-mixed, reproducible in any SQL engine) and keep the first ``k``.

    The id is reduced mod 2^31 BEFORE the multiply so the product stays
    within int64 for any id (2^31 × 2654435761 < 2^63): without the
    reduction, ids above ~3.5e9 silently wrap under non-ANSI Spark and
    throw under ANSI — deterministic on toy data, divergent at scale.
    Ties from the reduction are broken by the full id.

    The training-data curation staple ("N docs per language/quality band")
    as one window over the strata — no driver-side sampling state, stable
    under any partitioning, and rerunning on a grown corpus keeps a
    consistent pseudo-random order rather than resampling from scratch.
    """
    reduced = F.pmod(F.col(id_col).cast("long"), F.lit(2147483648))
    rank_key = F.pmod(reduced * F.lit(2654435761), F.lit(4294967296))
    w = Window.partitionBy(*strata).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 21600,
) -> DataFrame:
    """Gap-based sessionization — the batch twin of the streaming
    session window: consecutive events of one key belong to the same
    session while the inter-event gap stays <= ``gap_s`` seconds; a
    STRICTLY longer silence starts a new session.  This matches
    ``F.session_window`` exactly (Spark merges touching windows: an
    event at ``last + gap`` still extends the session), so this is
    value-for-value the batch twin of :func:`frontier_engine.streaming.
    session_rollup` — asserted boundary-for-boundary in
    tests/test_streaming.py.  In a crawler this is how
    host-visit activity rolls up into politeness epochs (sessions of
    contact with one host) and how robots-cache validity windows are
    audited; the reference's crawl loop has exactly one implicit session
    per store run (/root/reference/crawler/stores/bhx.py:614-641).

    Returns one row per session: (key_col, session_idx, session_start,
    session_end, n_events, duration_s) with session_idx numbered from 1
    in time order per key.

    Engine-exact: boundaries compare integer MICROsecond epochs
    (``unix_micros`` / ``epoch_us`` — never float seconds), the session
    index is a running integer sum, and duration_s is one exact
    int->double division.

    Plan shape at 100 TB: one window per key ordered by time — billions
    of small per-key groups, hash-partitioned; no second shuffle, the
    session aggregate reuses the same partitioning (Exchange appears
    once in the plan).
    """
    # NTZ-safe: sessions pin the TZ to UTC, so casting TIMESTAMP_NTZ to
    # TIMESTAMP is wall-clock identity and unix_micros stays exact.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    byk = Window.partitionBy(key_col).orderBy(us.asc())
    gap_us = int(gap_s) * 1_000_000
    new_sess = (
        F.when(F.lag(us).over(byk).isNull(), F.lit(1))
        .when(us - F.lag(us).over(byk) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    marked = df.select(
        F.col(key_col),
        F.col(ts_col),
        us.alias("_us"),
        F.sum(new_sess).over(byk).cast("long").alias("session_idx"),
    )
    return (
        marked.groupBy(key_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            ((F.max("_us") - F.min("_us")) / F.lit(1_000_000.0)).alias(
                "duration_s"
            ),
        )
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact per-group quantiles by counting — the scalable form of the
    fetch-latency SLO census (p50/p90/p99 per host) the north-star's
    lineage records as histograms. ``percentile_approx`` is not
    cross-engine reproducible and an exact ``percentile`` sorts every
    group's raw rows; this computes the classic lower quantile (smallest
    v whose cumulative count reaches ceil(q*n)) from a (group, value)
    COUNT table instead, so the window sorts distinct values, not
    occurrences — a host with a billion fetches at 3 latency buckets
    costs 3 rows after the map-side combine.

    ``pcts`` are integer percents so the target rank is pure integer
    arithmetic: ``rank = ceil(n * pct / 100) = (n * pct + 99) // 100`` —
    no float q*n whose last-ulp could flip a boundary row between
    engines.

    Returns one row per (group x pct): (group_cols..., pct, n, rank,
    q_value).

    Plan shape at 100 TB: one hash aggregate (counts), one window per
    group over distinct values, a constant-width explode (len(pcts)),
    one min-aggregate. No raw-row sort, no driver collect.
    """
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count("*").cast("long").alias("_c")
    )
    byg = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    cum = counts.select(
        *group_cols,
        value_col,
        F.sum("_c").over(byg).cast("long").alias("_cum"),
        F.sum("_c")
        .over(Window.partitionBy(*group_cols))
        .cast("long")
        .alias("n"),
    )
    fan = cum.select(
        *group_cols,
        value_col,
        "_cum",
        "n",
        F.explode(
            F.array(*[F.lit(int(p)).cast("long") for p in pcts])
        ).alias("pct"),
    ).withColumn(
        # integer DIV, not float /100: n*pct can pass 2^53 at cluster scale
        # and a double quotient could floor to the wrong rank
        "rank",
        F.expr("CAST((n * pct + 99) DIV 100 AS BIGINT)"),
    )
    return (
        fan.filter(F.col("_cum") >= F.col("rank"))
        .groupBy(*group_cols, "pct", "n", "rank")
        .agg(F.min(value_col).alias("q_value"))
    )


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: list[str],
    state_ts_alias: str = "state_ts",
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join: for every probe row, the state row with the LATEST
    timestamp at-or-before the probe's (``state.ts <= probe.ts``, per key) —
    the time-series join Spark has no built-in for.  In a crawler this is
    "which robots.txt / sitemap / host-policy snapshot governed THIS fetch":
    the reference re-reads its store config before every run
    (/root/reference/crawler/stores/bhx.py:614-641), which is exactly an
    as-of lookup of mutable state at fetch time.

    NOT implemented as a range join (per-probe inequality scan is O(n*m)
    per key and un-broadcastable at 10^10 fetches).  Instead the classic
    scalable formulation: UNION both sides tagged, ONE window per key
    ordered by (ts, tag) carrying the last non-null state forward
    (``last(..., ignorenulls=True)`` over rowsBetween(unboundedPreceding,
    current)), then keep the probe rows.  One shuffle on ``key_col``, one
    within-partition sort — the same cost as any keyed window, independent
    of how many state rows each probe skips over.  State rows sort BEFORE
    probe rows at an equal timestamp, so equality is visible (``>=``
    semantics, matching DuckDB/kdb ASOF JOIN).

    ``state`` must be unique per (key, ts) — dedupe with
    :func:`last_wins` first; the window carry would otherwise pick the
    physically-last duplicate, which is plan-dependent.

    ``direction='forward'`` flips the search: the EARLIEST state at-or-
    after the probe ("first fetch after this sitemap update") — same
    plan, window ordered descending.  ``tolerance_s`` bounds staleness
    (pandas merge_asof semantics): a match farther than tolerance_s
    seconds from the probe is nulled out, so "governed by a robots
    snapshot" can require the snapshot be fresh enough to trust.

    Returns all probe columns plus ``state_cols`` (null when no state row
    matches) and ``state_ts_alias`` (the matched state row's timestamp).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c) for c in state_cols]
    )
    s = state.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        payload.alias("_st"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns if c not in (key_col, ts_col)],
    )
    p = probe.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(s.schema["_st"].dataType).alias("_st"),
        *[c for c in probe.columns if c not in (key_col, ts_col)],
    )
    ts_order = (
        F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_order, F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = s.unionByName(p).withColumn(
        "_carry", F.last("_st", ignorenulls=True).over(w)
    )
    if tolerance_s is not None:
        gap = F.abs(
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.col("_carry.__ts"))
        )
        carried = carried.withColumn(
            "_carry", F.when(gap <= tolerance_s, F.col("_carry"))
        )
    return (
        carried.filter(F.col("_tag") == 1)
        .select(
            key_col,
            ts_col,
            *[c for c in probe.columns if c not in (key_col, ts_col)],
            F.col("_carry.__ts").alias(state_ts_alias),
            *[F.col(f"_carry.{c}").alias(c) for c in state_cols],
        )
    )


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Interval containment join — every (fact, interval) pair with
    ``start <= ts < end`` (half-open) — WITHOUT the O(n*m) cross product a
    naive theta-join plans.  The crawl use case: attributing fetches to
    incident/maintenance/burst windows (e.g. the windows
    ``hostctl.burst_detect`` emits) for blame analysis.

    Physical strategy: explode each interval to the fixed-width time
    buckets it overlaps (``F.sequence`` over ``floor(ts / bucket_s)``), put
    each fact in its single bucket, equi-join on the bucket, and apply the
    exact containment predicate as a post-filter.  A fact lives in exactly
    ONE bucket, so no pair can match twice — no dedup pass.  The join is a
    plain hash equi-join Catalyst can broadcast or shuffle (and AQE can
    skew-split); cost scales with interval-length/bucket_s, chosen by the
    caller to match interval width.  This is the standard bucketed
    range-join decomposition (Spark itself only has it behind the
    Databricks-proprietary range-join hint).

    Both inputs keep all their columns; interval columns win name clashes
    — alias beforehand.
    """
    f = facts.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_s)
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_s),
                # end is exclusive, but a fact at floor(end) can still
                # precede end inside the bucket: include end's bucket
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_s),
            )
        ),
    )
    return (
        f.join(iv, "_bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bucket")
    )


def weighted_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    id_col: str,
    weight_col: str,
) -> DataFrame:
    """Deterministic weighted k-per-stratum sample WITHOUT replacement —
    Efraimidis-Spirakis A-ES (IPL 2006): each row draws a reproducible
    uniform u from the same Knuth multiplicative hash
    :func:`stratified_sample` uses, scores ``key = ln(u) / w``, and the
    top-k keys per stratum win.  P(row in sample) is exactly the
    weighted-without-replacement probability; heavier rows draw keys
    nearer 0.  THE curation primitive quality-weighted corpus sampling
    needs (sample docs proportional to quality score, N per language)
    that uniform stratified sampling can't express.

    Same scale shape as stratified_sample: one window over the strata,
    no driver state, rerunning on a grown corpus keeps prior draws'
    keys unchanged (only the top-k cut moves).  ln is the only libm
    call; selection ties are broken by id.  Rows with ``w <= 0`` are
    excluded (A-ES is undefined there), matching "zero-quality docs
    never sampled".
    """
    reduced = F.pmod(F.col(id_col).cast("long"), F.lit(2147483648))
    h = F.pmod(reduced * F.lit(2654435761), F.lit(4294967296))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*strata).orderBy(
        key.desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each key, the earliest time it
    completed step 1, then step 2 AT-OR-AFTER that, then step 3
    at-or-after THAT, ... — the sequential-conversion census (the
    classic product-analytics query; in a crawl pipeline the same shape
    answers "discovered → fetched → extracted → stored" per URL cohort).

    Strictly sequential semantics: a step-2 event BEFORE the key's
    step-1 completion does not count — which is why this is not a plain
    pivot.  Computed as one aggregate per step over the events of the
    keys still alive, each keyed by ``key_col``: after the first
    shuffle the remaining joins and aggregates reuse the same hash
    partitioning, so the funnel costs ONE corpus-sized Exchange plus
    step-count small ones.  No window over raw events, no UDF.

    Returns one row per key that completed step 1:
    (key_col, t_1, t_2, ..., t_n) with NULL from the first uncompleted
    step onward; aggregate downstream for stage counts.
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(key_col, F.col(f"t_{i-1}")), key_col)
            .filter(F.col(ts_col) >= F.col(f"t_{i-1}"))
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt, key_col, "left")
    return cur


def trimmed_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    trim_num: int = 1,
    trim_den: int = 10,
) -> DataFrame:
    """Exact per-group trimmed mean: drop the lowest and highest
    ``floor(n · trim_num / trim_den)`` values (rank-ordered, id
    tie-break) and average the rest — the robust location estimate for
    per-host/per-language quality rollups, where one pathological page
    (a 100 MB blob, an empty doc) should not move the domain's number
    (Tukey; the standard robust-stats alternative to medians when you
    still want a mean's efficiency).

    The trim count is exact integer arithmetic on the rational
    ``trim_num/trim_den`` (never a float of n·α); with an integer
    ``value_col`` the kept-sum is exact int64 and the mean is one
    int→double division, bit-identical cross-engine.  One rank window
    per group plus a count — no second pass over rows.
    """
    if not 0 <= trim_num * 2 < trim_den:
        raise ValueError("trim fraction must be in [0, 0.5)")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col).cast("long").alias("_v"),
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("_n"),
    )
    cut = F.expr(f"(_n * {int(trim_num)}) DIV {int(trim_den)}")
    kept = ranked.filter((F.col("_rk") > cut) & (F.col("_rk") <= F.col("_n") - cut))
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.min("_n").cast("long").alias("n_total"),
        F.sum("_v").cast("long").alias("sum_kept"),
        (F.sum("_v").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "trimmed_mean"
        ),
    )


def holdout_split(
    df: DataFrame,
    domain_col: str,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Leakage-safe train/val/test split: the DOMAIN (not the row) is
    hashed into [0, 100), so every document from one registrable domain
    lands in exactly one split. Near-duplicates, templates and boilerplate
    siblings concentrate within domains; a row-level split leaks them
    across the train/test boundary — the exact contamination a holdout
    exists to prevent (the reference's per-store scrape loops make the
    same cut implicitly: one store's catalog is never half-refreshed,
    /root/reference/crawler/stores/bhx.py:599-649).

    The bucket is the first 8 hex digits of ``md5(domain)`` read as an
    integer mod 100 — deterministic, engine-portable (any SQL engine can
    reproduce it digit-by-digit), and stable under corpus growth: adding
    documents or whole new domains never moves an existing domain between
    splits, the property resampling-based splits lose on every refresh.
    Layout: ``bucket < test_pct`` → test, next ``val_pct`` → val, rest →
    train.

    Scale: one md5 over a short string per row and a CASE — a pure
    projection, no shuffle, no state; domain disjointness holds by
    construction rather than by a global distinct-and-check pass.
    """
    h = F.conv(F.substring(F.md5(F.col(domain_col)), 1, 8), 16, 10).cast("long")
    bucket = F.pmod(h, F.lit(100))
    split = (
        F.when(bucket < F.lit(int(test_pct)), F.lit("test"))
        .when(bucket < F.lit(int(test_pct + val_pct)), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)
