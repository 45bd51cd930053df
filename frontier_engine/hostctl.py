"""Host-level crawler control: spider-trap census and mirror detection.

Two aggregate defenses every production frontier runs that per-URL logic
cannot provide (generalizing the reference's single-store assumptions —
its per-store scrapers /root/reference/crawler/stores/*.py each hardcode
one well-behaved host, so it never needs either defense; a 10^10-URL
frontier over the open web does):

- :func:`trap_census` — per-host signals that identify spider traps and
  duplicate-content servers (session-id URL spaces, calendar traps,
  path-repetition loops), in the spirit of IRLbot's spam/trap budget
  control (Lee, Leonard, Wang, Loguinov, WWW 2009 §5) and Heritrix's
  path-repetition ("pathological URI") rules. Hosts flagged here get
  their frontier budget cut wholesale, which is the only place the
  defense can live: each individual trap URL looks fine.
- :func:`mirror_hosts` — host pairs serving near-identical content sets
  (Bharat & Broder, "Mirror, mirror on the Web", WWW 1999): detected by
  content-fingerprint overlap, so a crawl schedules only one replica of
  a mirrored site.

Both are pure DataFrame aggregations (no UDFs, no windows over the
corpus, no driver collects) and every emitted number is an integer or a
single IEEE division of two integers, so an independent SQL engine
reproduces the tables bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "trap_census",
    "url_path_features",
    "mirror_hosts",
    "politeness_audit",
    "dust_params",
    "crawl_budget",
    "apply_dust",
    "host_caps_from_pld",
    "mirror_families",
]

_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_path_features(url: F.Column) -> dict[str, F.Column]:
    """Expression-only path-shape features of a URL string.

    - ``depth``          number of ``/`` in the path component
    - ``seg_repeat``     highest multiplicity of any single path segment
                         (``/a/b/a/b/a`` -> 3) — the path-repetition trap
                         signature (Heritrix flags URIs whose path repeats
                         a segment more than N times)

    Scheme-relative and path-less URLs get depth 0 / repeat 0. Stays
    inside whole-stage codegen: ``regexp_extract`` + higher-order array
    functions, no Python.
    """
    path = F.regexp_extract(url, _PATH_RE, 1)
    depth = (F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))).cast(
        "long"
    )
    segs = F.filter(F.split(path, "/"), lambda s: F.length(s) > 0)
    seg_repeat = F.coalesce(
        F.array_max(
            F.transform(
                segs, lambda s: F.size(F.filter(segs, lambda x: x == s))
            )
        ),
        F.lit(0),
    ).cast("long")
    return {"depth": depth, "seg_repeat": seg_repeat}


def trap_census(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    content_col: str = "content",
    min_urls: int = 20,
    ratio_threshold: float = 5.0,
    depth_limit: int = 16,
    seg_repeat_limit: int = 3,
) -> DataFrame:
    """Per-host trap/duplicate-content census over fetched pages.

    Emitted per host:

    - ``n_pages``           fetch observations
    - ``n_urls``            distinct URLs (counted over xxhash64(url), so
                            only 8-byte hashes shuffle; a collision would
                            surface as an oracle gate mismatch)
    - ``n_contents``        distinct content fingerprints (same hashing)
    - ``urls_per_content``  n_urls / n_contents — the duplicate-content
                            server signal: a session-id or calendar trap
                            mints unbounded URLs over a tiny content set
    - ``max_depth``         deepest path seen on the host
    - ``max_seg_repeat``    worst path-segment repetition on the host
    - ``trap``              the budget-control gate: enough evidence
                            (``n_urls >= min_urls``) AND (URL-space
                            inflation over ``ratio_threshold`` OR a path
                            deeper than ``depth_limit`` OR a segment
                            repeated more than ``seg_repeat_limit`` times)

    Plan shape at 100 TB: the per-URL features are map-side expressions;
    the census is ONE hash aggregation keyed by host with map-side
    partial combine (two-level for the distinct counts). Output is
    host-cardinality. No join, no window, no Python — the same shape as
    :func:`frontier_engine.textops.domain_stats`, which is what lets the
    frontier re-run it every epoch.
    """
    feats = url_path_features(F.col(url_col))
    agg = (
        pages.select(
            F.col(host_col).alias("host"),
            F.xxhash64(F.coalesce(F.col(url_col), F.lit(""))).alias("_uh"),
            F.xxhash64(F.coalesce(F.col(content_col), F.lit(""))).alias("_ch"),
            feats["depth"].alias("_depth"),
            feats["seg_repeat"].alias("_rep"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.countDistinct("_uh").cast("long").alias("n_urls"),
            F.countDistinct("_ch").cast("long").alias("n_contents"),
            F.max("_depth").cast("long").alias("max_depth"),
            F.max("_rep").cast("long").alias("max_seg_repeat"),
        )
    )
    ratio = F.col("n_urls") / F.col("n_contents")
    return agg.select(
        "host",
        "n_pages",
        "n_urls",
        "n_contents",
        ratio.alias("urls_per_content"),
        "max_depth",
        "max_seg_repeat",
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & (
                (ratio >= F.lit(ratio_threshold))
                | (F.col("max_depth") > F.lit(depth_limit))
                | (F.col("max_seg_repeat") > F.lit(seg_repeat_limit))
            )
        ).alias("trap"),
    )


def politeness_audit(
    log: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts_ms",
    delay_col: str = "delay_ms",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Per-host politeness-compliance report over an observed fetch log.

    The operational twin of the scheduler (T1): the drain PLANS fetches
    so consecutive same-host requests sit ``crawl_delay`` apart; this op
    AUDITS what actually happened, from the fetch log the crawl's
    lineage already records — the check an operator runs before raising
    budgets (and the evidence a webmaster complaint is answered with).
    The reference never needs it (one asyncio process, politeness by
    construction: /root/reference/crawler/main.py's sequential per-store
    loop); a distributed fetcher does, because clock skew and task
    retries can violate spacing the plan promised.

    Per host: ``n_fetches``, ``min_gap_ms`` (smallest inter-fetch gap,
    NULL for a single fetch), the effective ``delay_ms`` (from
    ``delays``, else ``default_delay_ms``), ``violations`` (gaps
    strictly under the delay) and the ``compliant`` gate. All integer
    arithmetic (millisecond BIGINTs), bit-exact on any engine; with
    tied timestamps the sorted gap multiset — hence every output — is
    order-independent, so the report is deterministic at any
    parallelism.

    Plan shape at 100 TB: one window keyed by host over the fetch log
    (per-host partitions are epoch-budget-bounded by construction — the
    drain emits at most ``budget`` fetches per host per epoch), a
    broadcast join against the host-cardinality delay table, then one
    map-side-combined aggregate back to host cardinality.
    """
    w = Window.partitionBy("host").orderBy("_ts")
    gaps = log.select(
        F.col(host_col).alias("host"), F.col(ts_col).cast("long").alias("_ts")
    ).withColumn("_gap", F.col("_ts") - F.lag("_ts").over(w))
    j = gaps.join(
        F.broadcast(
            delays.select(
                F.col(host_col).alias("host"),
                F.col(delay_col).cast("long").alias("_d"),
            )
        ),
        "host",
        "left",
    ).withColumn("_d", F.coalesce(F.col("_d"), F.lit(default_delay_ms)))
    agg = j.groupBy("host").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.min("_gap").cast("long").alias("min_gap_ms"),
        F.max("_d").cast("long").alias("delay_ms"),
        F.sum(
            F.when(F.col("_gap") < F.col("_d"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("violations"),
    )
    return agg.withColumn("compliant", F.col("violations") == 0)


def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    content_col: str = "content",
    min_overlap: int = 2,
    min_jaccard: float = 0.5,
    max_fp_hosts: int = 50,
    cached: list[DataFrame] | None = None,
) -> DataFrame:
    """Host pairs serving near-identical content sets (site mirrors).

    Bharat & Broder (WWW 1999) detect mirrors by shared content
    fingerprints; a frontier uses the table to crawl one replica and
    blocklist the rest. Output per unordered pair (``host_a < host_b``):
    distinct-content sizes ``n_a``/``n_b``, ``overlap`` (shared
    fingerprints) and exact ``jaccard`` = overlap / (n_a + n_b -
    overlap), filtered to ``overlap >= min_overlap AND jaccard >=
    min_jaccard``.

    Scale shape — bucket-first, never all-pairs:

    1. ``(host, fingerprint)`` distinct: one shuffle of 16-byte rows
       with map-side partial dedup (fingerprint = xxhash64(content); the
       oracle joins on the raw content, so a collision would surface).
    2. Frequency cap: fingerprints on more than ``max_fp_hosts`` hosts
       are dropped BEFORE the self-join — boilerplate served everywhere
       (empty pages, error templates) would otherwise fan the join out
       k² per fingerprint. Same defense as the stop-fingerprint cap in
       the near-dup pipelines; the cap only removes evidence shared so
       widely it cannot distinguish a mirror PAIR anyway. The histogram
       feeding the cap is itself a map-side-combined aggregate.
    3. Candidate pairs come from the equi-self-join on fingerprint —
       cost is sum over fingerprints of k·(k-1)/2 with k <= max_fp_hosts,
       i.e. output-cardinality-bounded, never |hosts|².
    4. One hash aggregation to overlap counts, then a broadcast-size
       join against the per-host size table (host-cardinality).

    The deduped ``(host, fp)`` table is consumed four times (sizes,
    frequency histogram, both join sides); pass a ``cached`` list to
    persist it for the duration and unpersist after the result is
    materialized (caller owns the lifetime — same contract as
    :func:`frontier_engine.textops.minhash_candidates`).
    """
    fp = pages.select(
        F.col(host_col).alias("host"),
        F.xxhash64(F.coalesce(F.col(content_col), F.lit(""))).alias("fp"),
    ).distinct()
    if cached is not None:
        fp = fp.persist()
        cached.append(fp)
    rare = fp.join(
        fp.groupBy("fp")
        .agg(F.count("*").alias("_hosts"))
        .filter(F.col("_hosts") <= max_fp_hosts)
        .select("fp"),
        "fp",
    )
    # sizes over the CAPPED set, so jaccard is the exact Jaccard of the
    # fingerprint sets the overlap was computed on (a ubiquitous
    # boilerplate fingerprint neither adds evidence nor dilutes it)
    sizes = rare.groupBy("host").agg(F.count("*").cast("long").alias("n"))
    a = rare.select(F.col("host").alias("host_a"), "fp")
    b = rare.select(F.col("host").alias("host_b"), "fp")
    overlap = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("overlap"))
    )
    out = (
        overlap.join(
            F.broadcast(sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))),
            "host_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "n_a",
            "n_b",
            "overlap",
            (
                F.col("overlap")
                / (F.col("n_a") + F.col("n_b") - F.col("overlap"))
            ).alias("jaccard"),
        )
        .filter(
            (F.col("overlap") >= F.lit(min_overlap))
            & (F.col("jaccard") >= F.lit(min_jaccard))
        )
    )
    return out


_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]*)"
_QUERY_RE = r"\?([^#]*)"


def dust_params(
    pages: DataFrame,
    url_col: str = "url",
    fprint_col: str = "fprint",
    min_evidence: int = 2,
) -> DataFrame:
    """Per-(host, query-parameter) content-irrelevance census: learn
    which URL parameters a crawler can strip.

    The DUST problem ("Do Not Crawl in the DUST: different URLs with
    similar text", Bar-Yossef et al., WWW 2007; rewrite-rule mining per
    Dasgupta et al., KDD 2008): session ids, tracking tags and sort
    toggles mint unbounded distinct URLs over identical content, and no
    static blocklist keeps up — the rules must be LEARNED per host from
    fetched evidence. This is the table that feeds the learned side of
    :mod:`frontier_engine.canon`'s static canonicalizer: a parameter
    proven content-irrelevant on a host gets stripped before the seen
    check, collapsing its whole URL subspace.

    Method — for each URL, each distinct parameter key ``k`` yields one
    observation keyed by the URL's *residual*: host + path + the other
    params (sorted, so ``?a=1&b=2`` and ``?b=2&a=1`` land in the same
    group). Within a residual group, the key's observed values vary
    while everything else is fixed — a controlled experiment. Per
    (host, key):

    - ``n_groups``            residual groups observed
    - ``multi_groups``        groups with >1 distinct value for the key
                              (only these carry evidence)
    - ``irrelevant_groups``   multi-value groups whose content
                              fingerprint never changed
    - ``excess_urls``         URLs a strip rule would have collapsed
    - ``strip``               the verdict: every multi-value group was
                              content-constant AND there are at least
                              ``min_evidence`` such groups

    Parsing is deliberately simple and engine-portable: params =
    ``split(query, '&')`` dropping empties; key = text before the first
    ``'='`` (a valueless flag is its own key); a repeated key is
    treated as one multiset-valued observation. ASCII-lexicographic
    sorts keep Spark (UTF-16 compare) and byte-compare engines
    identical on the URL charset.

    Plan shape at 100 TB: the only row-count expansion is the explode
    over *distinct keys per URL* (bounded by the query string, a small
    constant); then two hash aggregations with map-side partial combine
    — (host, key, residual) cardinality, then (host, key) cardinality —
    both exact-distinct over already-grouped rows. Expression-only:
    regex extract + higher-order array functions, no Python, no window,
    no join.
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, _HOST_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(F.split(query, "&"), lambda p: F.length(p) > 0)
    keys = F.array_distinct(
        F.transform(params, lambda p: F.split(p, "=")[0])
    )
    exploded = pages.select(
        host.alias("host"),
        path.alias("_path"),
        params.alias("_params"),
        F.col(fprint_col).alias("_fp"),
        F.explode(keys).alias("param"),
    )
    k = F.col("param")
    kept = F.filter(F.col("_params"), lambda p: F.split(p, "=")[0] != k)
    mine = F.filter(F.col("_params"), lambda p: F.split(p, "=")[0] == k)
    obs = exploded.select(
        "host",
        "param",
        F.concat(
            F.col("host"),
            F.col("_path"),
            F.lit("?"),
            F.array_join(F.array_sort(kept), "&"),
        ).alias("_residual"),
        F.array_join(F.array_sort(mine), "&").alias("_value"),
        "_fp",
    )
    groups = obs.groupBy("host", "param", "_residual").agg(
        F.countDistinct("_value").cast("long").alias("_nv"),
        F.countDistinct("_fp").cast("long").alias("_nf"),
    )
    multi = F.col("_nv") > 1
    return groups.groupBy("host", "param").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(multi.cast("long")).cast("long").alias("multi_groups"),
        F.sum((multi & (F.col("_nf") == 1)).cast("long"))
        .cast("long")
        .alias("irrelevant_groups"),
        F.sum(F.when(multi, F.col("_nv") - 1).otherwise(F.lit(0)))
        .cast("long")
        .alias("excess_urls"),
    ).withColumn(
        "strip",
        (F.col("multi_groups") >= F.lit(min_evidence))
        & (F.col("irrelevant_groups") == F.col("multi_groups")),
    )


def crawl_budget(
    census: DataFrame,
    base_budget: int = 1000,
    min_budget: int = 10,
    max_budget: int = 100000,
) -> DataFrame:
    """Per-host crawl budget allocation from the trap census — the
    enforcement half of IRLbot's BEAST budget control (Lee et al., WWW
    2009 §6): the census measures, this decides how many frontier slots
    each host gets next epoch.

    Policy (deliberately integer-exact so any engine reproduces it):

    - a host flagged ``trap`` is demoted to ``min_budget`` — probation,
      not a ban, so a mis-flagged host can still earn its way back as
      fresh evidence arrives (IRLbot demotes, it never blacklists);
    - otherwise the budget scales with *content yield*:
      ``base_budget * n_contents div n_urls`` — a duplicate-content
      server that mints 50 URLs per distinct page gets 1/50th of base,
      a clean host gets ~base — clamped into
      ``[min_budget, max_budget]``.

    Output is (host, budget) at host cardinality; pure projection over
    the census (no shuffle of its own — it pipelines onto the census
    aggregate). Feed the result to the drain as its per-host token
    budget in place of a flat constant.
    """
    if not (0 < min_budget <= max_budget):
        raise ValueError("crawl_budget: need 0 < min_budget <= max_budget")
    yield_budget = F.expr(
        f"CAST({base_budget} AS BIGINT) * n_contents DIV greatest(n_urls, 1)"
    )
    clamped = F.greatest(
        F.lit(min_budget).cast("long"),
        F.least(F.lit(max_budget).cast("long"), yield_budget),
    )
    return census.select(
        "host",
        F.when(F.col("trap"), F.lit(min_budget).cast("long"))
        .otherwise(clamped)
        .alias("budget"),
    )


def apply_dust(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    sort_params: bool = False,
) -> DataFrame:
    """Rewrite URLs by the mined DUST rules — the enforcement half of
    :func:`dust_params` (Dasgupta et al., KDD 2008 apply rules the same
    way: learned rewrite → canonical target before the seen check).

    Every query parameter the rules table proves content-irrelevant on
    a URL's host (``strip = true``) is removed from that URL's query
    string; a query emptied entirely loses its ``?``. Hosts with no
    rules pass through byte-identical, so the transform is safe to run
    unconditionally in front of the frontier's seen filter — that is
    its whole point: ``?page=2&sess=819`` and ``?sess=23&page=2``
    collapse to one frontier row instead of minting unbounded session
    variants. ``sort_params=True`` additionally sorts the surviving
    parameters, collapsing pure order permutations (off by default:
    rewriting only what a rule licenses keeps untouched URLs stable).

    Input URLs are expected canonical (fragment-free —
    :mod:`frontier_engine.canon` strips ``#…``); any fragment present
    would be dropped by the rewrite.

    Plan shape at 100 TB: one broadcast left join against the
    host-level strip sets (rules aggregate to host cardinality — tiny
    vs the corpus) plus expression-only array surgery per row. No
    shuffle of ``df``, no Python.
    """
    strip_sets = (
        rules.filter(F.col("strip"))
        .groupBy("host")
        .agg(F.array_sort(F.collect_set("param")).alias("_strip"))
        .select(F.col("host").alias("_dust_host"), "_strip")
    )
    url = F.col(url_col)
    j = df.withColumn(
        "_uh", F.regexp_extract(url, _HOST_RE, 1)
    ).join(
        F.broadcast(strip_sets),
        F.col("_uh") == F.col("_dust_host"),
        "left",
    )
    prefix = F.regexp_extract(url, r"^([^?#]*)", 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(F.split(query, "&"), lambda p: F.length(p) > 0)
    kept = F.when(
        F.col("_strip").isNotNull(),
        F.filter(
            params,
            lambda p: ~F.array_contains(F.col("_strip"), F.split(p, "=")[0]),
        ),
    ).otherwise(params)
    if sort_params:
        kept = F.array_sort(kept)
    newq = F.array_join(kept, "&")
    rewritten = F.when(
        F.length(newq) > 0, F.concat(prefix, F.lit("?"), newq)
    ).otherwise(prefix)
    return j.withColumn(url_col, rewritten).drop("_uh", "_dust_host", "_strip")


def host_caps_from_pld(pld_budgets: DataFrame, hosts: DataFrame) -> DataFrame:
    """Expand pay-level-domain budgets to the host-keyed cap table the
    drain consumes: every host inherits its registrable domain's budget.

    IRLbot's STAR budgets are per PLD — a spammer minting
    ``a.spam.com … z.spam.com`` must share ONE allocation, not get a
    fresh per-host budget each (Lee et al., WWW 2009 §6). Build the
    census over ``registrable_domain_col(host)``, run
    :func:`crawl_budget` on it (its ``host`` column then holds PLDs),
    and expand here against the frontier's distinct hosts. One broadcast
    join at host cardinality; hosts whose PLD has no budget row are
    absent from the output (→ pure politeness budget downstream).
    """
    from .canon import registrable_domain_col

    plds = pld_budgets.select(
        F.col("host").alias("_pld"), F.col("budget")
    )
    h = hosts.select("host").distinct()
    return (
        h.withColumn("_hp", registrable_domain_col(F.col("host")))
        .join(F.broadcast(plds), F.col("_hp") == F.col("_pld"))
        .select("host", "budget")
    )


def mirror_families(
    pairs: DataFrame,
    host_a: str = "host_a",
    host_b: str = "host_b",
) -> DataFrame:
    """Mirror pairs → replica families with a canonical pick: the step
    that turns :func:`mirror_hosts`' pairwise output into action. A
    crawl keeps ONE replica per family (Bharat & Broder's stated use)
    — everything else goes to the frontier's blocklist anti-join (F2).

    Families are connected components over the pair graph
    (:func:`frontier_engine.textops.connected_components` with string
    vertices); ``canonical`` = the lexicographically smallest host in
    the family (deterministic on any engine — no hash involved).
    Returns ``(host, canonical)`` for every host that appears in a
    pair; ``host != canonical`` is the drop set.
    """
    from .textops import connected_components

    labels = connected_components(
        pairs.select(host_a, host_b), id_a=host_a, id_b=host_b,
        id_type="string",
    )
    return labels.select(F.col("v").alias("host"), F.col("label").alias("canonical"))


def soft404_detect(
    df: DataFrame,
    template_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "host",
    template_col: str = "template",
    threshold: float = 0.5,
) -> DataFrame:
    """Soft-404 detection by similarity to the host's error signature
    (Bar-Yossef, Broder, Kumar, Tomkins, WWW 2004 "Sic transit gloria
    telae" §3): a host that answers HTTP 200 for missing pages poisons a
    crawl with millions of identical "not found" bodies. The published
    defense: fetch a deliberately-bogus URL per host once, and flag any
    page whose content is near-identical to that per-host signature.
    ``template_df`` is that signature table — (host_col, template_col),
    one row per host.

    Similarity is token-set Jaccard (lowercased whitespace tokens,
    distinct), an exact rational |A∩B| / (|A| + |B| - |A∩B|) — one IEEE
    division of two integers, engine-exact, no rounding.

    Returns (id_col, host_col, n_doc_tokens, n_tpl_tokens, n_common,
    jacc, is_soft404).

    Plan shape at 100 TB: the signature table is one row per HOST (~1e8
    rows max, a few tokens each) — broadcast; everything else is per-row
    array arithmetic inside whole-stage codegen. No shuffle at all on
    the page side, no window, no UDF.
    """

    def _tokset(c):
        return F.array_distinct(
            F.filter(
                F.split(F.lower(F.coalesce(c, F.lit(""))), r"\s+"),
                lambda w: F.length(w) >= 1,
            )
        )

    tpl = F.broadcast(
        template_df.select(
            F.col(host_col).alias("__h"),
            _tokset(F.col(template_col)).alias("__tpl"),
        )
    )
    toks = _tokset(F.col(text_col))
    inter = F.size(F.array_intersect(F.col("__toks"), F.col("__tpl")))
    la = F.size(F.col("__toks"))
    lb = F.size(F.col("__tpl"))
    jacc = inter / (la + lb - inter)
    return (
        df.select(F.col(id_col), F.col(host_col), toks.alias("__toks"))
        .join(tpl, F.col(host_col) == F.col("__h"))
        .select(
            id_col,
            host_col,
            la.cast("long").alias("n_doc_tokens"),
            lb.cast("long").alias("n_tpl_tokens"),
            inter.cast("long").alias("n_common"),
            jacc.alias("jacc"),
            (jacc >= threshold).alias("is_soft404"),
        )
    )


def adaptive_delay(
    fetch_log: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    delay_col: str = "delay_s",
    pct: int = 95,
    target_ms: int = 500,
    min_delay_s: int = 1,
    max_delay_s: int = 64,
) -> DataFrame:
    """AIMD politeness adaptation from observed fetch latency — the
    feedback loop between a static per-host crawl delay (robots
    ``Crawl-delay`` / the reference's fixed ``asyncio.sleep(1)``,
    /root/reference/crawler/json_fetch.py:36) and what the server can
    actually sustain: hosts whose p95 latency exceeds ``target_ms`` are
    backing up — double their delay (multiplicative decrease of our
    rate); healthy hosts halve it (additive-ish increase), clamped to
    [min_delay_s, max_delay_s].  The TCP congestion-control discipline
    applied to crawl scheduling; conservative by construction because
    the latency census is a high quantile, not a mean a single slow
    response can't move.

    ``fetch_log`` is (host_col, latency_col) at fetch cardinality;
    ``delays`` is the current (host_col, delay_col) table.  Returns
    (host_col, n_fetches, p95_ms, delay_s, next_delay_s) — feed it back
    as the next epoch's delay table.

    Engine-exact: the quantile is :func:`frontier_engine.ops.
    grouped_quantiles` (integer ranks over a count table), the update
    rule is integer multiply / integer DIV / clamp.  Plan shape: one
    count aggregate + one distinct-value window per host + one join at
    HOST cardinality — the fetch log is never sorted row-wise.
    """
    from .ops import grouped_quantiles

    q = grouped_quantiles(fetch_log, [host_col], latency_col, (pct,))
    harder = F.col("q_value") > target_ms
    nxt = (
        F.when(harder, F.least(F.lit(max_delay_s), F.col(delay_col) * 2))
        .otherwise(
            F.greatest(
                F.lit(min_delay_s),
                F.expr(f"CAST({delay_col} DIV 2 AS BIGINT)"),
            )
        )
        .cast("long")
    )
    return (
        q.join(delays, host_col)
        .select(
            host_col,
            F.col("n").alias("n_fetches"),
            F.col("q_value").alias("p95_ms"),
            F.col(delay_col).cast("long").alias(delay_col),
            nxt.alias("next_delay_s"),
        )
    )


def fairness_gini(
    fetches: DataFrame,
    group_col: str = "pld",
    host_col: str = "host",
) -> DataFrame:
    """Gini coefficient of fetch allocation across hosts, per group —
    the fairness census a politeness scheduler publishes next to its
    throughput numbers: G = 0 when every host in the group got the same
    number of fetch slots, G → 1 when one host monopolized them. IRLbot's
    budget-control argument (Lee et al., WWW 2009 §5) is exactly that an
    unbudgeted frontier drifts toward G ≈ 1 on spam-heavy PLDs; this
    table is how the drift is detected per epoch.

    Uses the rank formulation over per-host counts sorted ascending
    (tie-broken by host for a total order):

        G = (2·Σ i·n_i − (N+1)·Σ n_i) / (N·Σ n_i)

    with i = 1..N the ascending rank. Every sum is exact int64; the
    coefficient is ONE IEEE division of two integers (round 6 to hash
    cross-engine). Output: ``(group, n_hosts, n_fetches, gini)``.

    Scale shape: the corpus collapses to (group, host) counts in one
    map-side-combined aggregate; the rank window and the final rollup
    run over HOST cardinality (orders below fetch cardinality),
    partitioned by group — a mega-group costs one sort of its own
    host list, never of its fetches."""
    counts = fetches.groupBy(
        F.col(group_col).alias("grp"), F.col(host_col).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("grp").orderBy(F.col("n").asc(), F.col("h").asc())
    ranked = counts.withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hosts"),
            F.sum("n").cast("long").alias("n_fetches"),
            F.sum(F.col("i") * F.col("n")).cast("long").alias("_iws"),
        )
        .select(
            group_col,
            "n_hosts",
            "n_fetches",
            (
                (
                    F.lit(2.0) * F.col("_iws").cast("double")
                    - (F.col("n_hosts") + F.lit(1)).cast("double")
                    * F.col("n_fetches").cast("double")
                )
                / (F.col("n_hosts").cast("double") * F.col("n_fetches").cast("double"))
            ).alias("gini"),
        )
    )


def burst_detect(
    df: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    bucket: str = "hour",
    k_num: int = 2,
    k_den: int = 1,
) -> DataFrame:
    """Per-host fetch-rate burst detection — the ops-side anomaly census
    a crawl controller runs before pointing fingers: a host whose
    request count in one bucket sits more than ``k = k_num/k_den``
    standard deviations above its own mean is either a crawler-trap
    explosion (see :func:`trap_census`), a mirror suddenly coming into
    scope, or a politeness bug about to get the fleet blocked.

    Exactness discipline: with integer bucket counts ``c_i`` over the
    host's ``n`` observed buckets (S = Σc, T = Σc²), the z-test

        (c - S/n) > k · sqrt(T/n - (S/n)²)

    cross-multiplies to the ALL-INTEGER predicate (multiply both sides
    by n and square; n·std = sqrt(n·T - S²))

        (n·c - S) > 0  AND  (n·c - S)²·k_den² > k_num²·(n·T - S²)

    so burst flags are int64-exact on any engine. The reported
    ``zscore = (n·c - S) / sqrt(n·T - S²)`` is also engine-exact:
    IEEE-754 specifies sqrt and division as correctly rounded, and both
    operands are single-cast integers (NULL when the variance is 0).

    Plan shape at 100 TB: one partial agg to (host, bucket) counts —
    map-side combined, the only pass over raw rows — then a host-level
    agg of three int64 moments and a broadcast-size join back. No
    window, no sort; a skewed mega-host is one row after the first agg.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    cells = df.groupBy(F.col(host_col).alias("host"), b).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    moments = cells.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("t"),
    )
    j = cells.join(moments, "host")
    dev = F.col("n") * F.col("c") - F.col("s")
    varn = F.col("n") * F.col("t") - F.col("s") * F.col("s")
    return j.select(
        "host",
        "bucket_ts",
        "c",
        F.col("n").alias("n_buckets"),
        F.when(
            varn > 0, dev.cast("double") / F.sqrt(varn.cast("double"))
        ).alias("zscore"),
        (
            (dev > 0)
            & (
                dev * dev * F.lit(k_den * k_den)
                > F.lit(k_num * k_num) * varn
            )
        ).alias("is_burst"),
    )
