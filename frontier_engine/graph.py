"""Link-graph analytics over crawl edges: PageRank-family authority
scoring for frontier prioritization.

A web-scale crawler ranks its frontier by more than per-page heuristics:
link-graph authority (PageRank / OPIC-style cash) decides which of a
trillion discovered URLs deserve fetch slots first. The reference crawls
a fixed curated store list, so its "priority" is hand-assigned per shop
category (``/root/reference/crawler/main.py`` drives a static store set);
this module is the scale generalization — compute authority from the
extracted link edges themselves and feed it into the frontier's
``priority`` column.

Semantics follow the public GraphX/Pregel formulation (Spark's own
``org.apache.spark.graphx.lib.PageRank``): every vertex starts at 1.0 and

    rank_{k+1}(v) = (1 - d) + d * sum_{u -> v} rank_k(u) / outdeg(u)

with damping ``d`` (default 0.85). Vertices with no in-links converge to
``1 - d``; dangling vertices (no out-links) leak their mass, exactly as
GraphX's default variant does. This definition is a pure fold over IEEE
doubles with no global normalization term, so an independent engine
(the DuckDB oracle unrolls the same iterations as chained CTEs)
reproduces every rank to rounding precision.

Scale shape: one distinct + two hash aggregates to build the vertex and
out-degree tables, then per iteration exactly ONE shuffle — the
edge ⋈ rank hash join feeding a map-side-combined sum keyed by ``dst``.
The edge table is persisted once and re-read every round; ranks are
eagerly ``localCheckpoint``-ed per round to cut the iterative lineage
(the standard Spark driver-loop idiom, same as
``textops.connected_components``). Iteration count is a fixed parameter,
not a convergence probe, so the whole run is a known number of jobs and
the result is byte-deterministic at any parallelism.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``edges`` rows are (src, dst) pairs; duplicates are collapsed (a page
    linking twice contributes once, matching how ``extract.link_edges``
    emits distinct hrefs). Returns ``(node, rank)`` for every vertex that
    appears as a source or destination.

    Deterministic: ranks are sums of ``rank/deg`` rationals in a fixed
    iteration structure; Spark's float aggregation order varies by
    partitioning, so callers that need cross-engine hash equality should
    round (the query layer rounds to 6 decimals — accumulated error is
    ~1e-13 at graph sizes where ranks are O(1)).
    """
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        # Pre-join degree onto the edge list once: each iteration then
        # needs only the single rank join (weight = 1/deg is iteration-
        # invariant, so pay its shuffle once, not per round).
        weighted = (
            e.join(outdeg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
            .persist()
        )
        ranks = nodes.withColumn("rank", F.lit(1.0)).localCheckpoint()
        try:
            for _ in range(iterations):
                contrib = (
                    weighted.join(
                        ranks.withColumnRenamed("node", "src"), "src"
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("rank") * F.col("w")).alias("_in"))
                )
                ranks = (
                    nodes.join(contrib, "node", "left")
                    .select(
                        "node",
                        (
                            F.lit(1.0 - damping)
                            + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                        ).alias("rank"),
                    )
                    .localCheckpoint()
                )
            return ranks
        finally:
            weighted.unpersist()
    finally:
        e.unpersist()


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg, JACM 1999) over a directed edge
    list: hub and authority scores per node, L1-normalized each
    half-step.

    The second classic authority signal next to :func:`pagerank` — HITS
    separates "pages many good pages point AT" (authorities: fetch
    these first) from "pages that point at many good pages" (hubs:
    directory/index pages whose outlinks seed the frontier). A crawl
    scheduler wants both columns; the reference's static store list
    needs neither (it IS a hand-curated hub).

    Semantics — the textbook power iteration with sum (L1)
    normalization, which keeps every update a pure fold over IEEE
    doubles (no sqrt), so an independent engine reproduces it to
    rounding precision::

        auth'(v) = sum over edges u->v of hub(u);    auth = auth'/Σauth'
        hub'(u)  = sum over edges u->v of auth(v);   hub  = hub'/Σhub'

    starting from hub_0 = 1 on every node. Duplicate edges collapse;
    nodes with no in-links hold authority 0, no out-links hub 0. With
    no edges at all, scores are all 0 (the normalizer guards division
    by zero). Iteration count is a fixed parameter — the run is a known
    number of jobs, byte-deterministic modulo float summation order
    (callers hash-compare after rounding, as with :func:`pagerank`).

    Scale shape: the deduped edge set is persisted once; each
    half-step is exactly ONE edge ⋈ score hash join feeding a
    map-side-combined sum, ``localCheckpoint``-ed to cut the iterative
    lineage (the same driver-loop idiom as :func:`pagerank`). The L1
    normalizer is a single-row aggregate over that checkpointed table
    pulled to the driver and folded back in as a literal — one 1-row
    collect per half-step, driver-small by construction (the
    broadcast-of-an-aggregate alternative plants a BroadcastExchange
    inside every step of an iterative plan: slower, and a scheduler
    hazard). The score table itself is never re-shuffled to normalize.
    """
    if iterations < 1:
        raise ValueError("hits: iterations must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        hub = nodes.select("node", F.lit(1.0).alias("hub")).localCheckpoint()
        auth = nodes.select("node", F.lit(0.0).alias("auth"))

        def _l1(df: DataFrame, col: str) -> DataFrame:
            # df is localCheckpoint-ed: the normalizer is a cheap scan
            # of materialized rows, and the division is a driver literal.
            total = df.agg(F.sum(col)).collect()[0][0] or 0.0
            if total == 0.0:
                return df.select("node", F.lit(0.0).alias(col))
            return df.select(
                "node", (F.col(col) / F.lit(float(total))).alias(col)
            )

        for _ in range(iterations):
            a_raw = (
                nodes.join(
                    e.join(
                        hub.select(F.col("node").alias("src"), "hub"), "src"
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("hub").alias("auth")),
                    "node",
                    "left",
                )
                .select("node", F.coalesce("auth", F.lit(0.0)).alias("auth"))
                .localCheckpoint()
            )
            auth = _l1(a_raw, "auth")
            h_raw = (
                nodes.join(
                    e.join(
                        auth.select(F.col("node").alias("dst"), "auth"), "dst"
                    )
                    .groupBy(F.col("src").alias("node"))
                    .agg(F.sum("auth").alias("hub")),
                    "node",
                    "left",
                )
                .select("node", F.coalesce("hub", F.lit(0.0)).alias("hub"))
                .localCheckpoint()
            )
            hub = _l1(h_raw, "hub")
        return hub.join(auth, "node").select("node", "hub", "auth")
    finally:
        e.unpersist()


def link_census(
    edges: DataFrame,
    src_host: str = "src_host",
    dst_host: str = "dst_host",
) -> DataFrame:
    """Per-source-host outlink census: the nepotistic-link spam signal.

    Link-farm and mirror-cluster detection (Fetterly et al., WebDB 2004;
    Castillo et al. WEBSPAM-UK) starts from exactly this table: how many
    outlinks a host emits, how many stay on-host (``n_intra``), how many
    leave (``n_cross``), how many distinct destination hosts it reaches
    (``n_dst_hosts``), and the intra-host ratio. Hosts with thousands of
    links all pointing at themselves or one partner host are frontier
    de-prioritization candidates — the host-graph twin of
    :func:`~frontier_engine.hostctl.trap_census`'s URL-shape census.

    Expression-only features feeding ONE map-side-combined aggregate
    keyed by source host (host cardinality out, never URL cardinality);
    ``intra_ratio`` is an exact DOUBLE of two BIGINTs, deterministic on
    any engine. Null destination hosts (unparseable targets) count as
    cross-host and do not enter ``n_dst_hosts``.
    """
    s, d = F.col(src_host), F.col(dst_host)
    intra = F.when(d.isNotNull() & (s == d), F.lit(1)).otherwise(F.lit(0))
    return (
        edges.groupBy(s.alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.sum(intra).cast("long").alias("n_intra"),
            F.count_distinct(d).cast("long").alias("n_dst_hosts"),
        )
        .select(
            "host",
            "n_links",
            "n_intra",
            (F.col("n_links") - F.col("n_intra")).alias("n_cross"),
            "n_dst_hosts",
            (F.col("n_intra") / F.col("n_links")).alias("intra_ratio"),
        )
    )


def anchor_stats(
    edges: DataFrame,
    k: int = 3,
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """Top-k anchor texts per link target, with counts.

    Anchor text is the web's free labeling signal: the words OTHER
    pages use for a URL describe it better than its own markup
    (the original PageRank paper §2.2 propagates anchors to targets;
    modern pipelines keep them as retrieval/quality features and as
    crawl-priority hints for still-unfetched URLs — anchors exist
    before the target is ever crawled). Per target: the ``k`` most
    frequent anchor strings and their counts.

    Shape: one map-side-combined count keyed by (dst, anchor) — the
    only shuffle over link cardinality — then a rank window over
    (dst) partitions whose size is already collapsed to DISTINCT
    anchors per target (bounded, not inlink-bounded: a UaURL with 10^9
    identical "click here" inlinks contributes ONE row past the first
    aggregate, so mega-targets cannot skew the window). Ties break
    lexicographically on the anchor string, making the top-k set
    deterministic at any parallelism. Null/empty anchors are dropped
    before counting.
    """
    if k < 1:
        raise ValueError("anchor_stats: k must be >= 1")
    counts = (
        edges.select(F.col(dst).alias("dst"), F.col(anchor).alias("anchor"))
        .filter(F.col("anchor").isNotNull() & (F.col("anchor") != ""))
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dst", "anchor", "n", "rank")
    )


def frontier_priority_from_ranks(
    frontier: DataFrame,
    ranks: DataFrame,
    key: str = "host",
    weight: float = 1.0,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Blend link-graph authority into frontier priority: left-join the
    (node, rank) table on ``key`` and add ``weight * rank`` to
    ``priority`` (keys absent from the rank table keep their base
    priority — rank coalesces to 0). With ``broadcast_ranks`` the rank
    side broadcasts and the frontier never shuffles — right for
    host-granular ranks (hosts are millions, not trillions). For
    URL-granular ranks (the crawl wiring) pass ``broadcast_ranks=False``:
    the rank table is frontier-sized and the blend is an honest hash
    join, paid only on rank-refresh epochs.
    """
    r = ranks.select(F.col("node").alias(key), F.col("rank").alias("_pr"))
    if broadcast_ranks:
        r = F.broadcast(r)
    return (
        frontier.join(r, key, "left")
        .withColumn(
            "priority",
            F.col("priority")
            + F.lit(weight) * F.coalesce(F.col("_pr"), F.lit(0.0)),
        )
        .drop("_pr")
    )


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve every redirect chain to its final landing URL by pointer
    doubling — ``ceil(log2(max_hops))`` self-joins instead of
    ``max_hops`` sequential ones.

    At web scale a quarter of fetches answer 3xx (the reference never
    sees this — Playwright follows redirects invisibly,
    /root/reference/crawler/stores/bhx.py:599-649; an archive crawler
    must resolve them itself to dedup aliases and credit link authority
    to the landing URL). ``edges`` holds one row per redirecting URL:
    ``(src, dst)`` — a *function* (one dst per src; duplicate srcs
    raise upstream data questions, here the min dst wins for
    determinism).

    Returns one row per src: ``(src, final, hops, resolved)`` —
    ``resolved`` when a non-redirecting URL is reached within
    ``max_hops``; cycles and over-long chains yield ``resolved=false``
    with NULL final/hops (a compliant crawler abandons them, as curl's
    --max-redirs does).

    Pointer doubling: the state table maps each src to the node reached
    after following up to 2^k redirects; composing the state with
    itself doubles k. Each round is ONE hash self-join at
    redirecting-URL cardinality (terminal URLs never enter the state),
    eagerly localCheckpoint-ed so round k+1 consumes a materialized
    table instead of recomputing round k twice (it appears as both
    probe and build side).
    """
    if max_hops < 1:
        raise ValueError("resolve_redirects: max_hops must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    state = e.select(
        "src", F.col("dst").alias("cur"), F.lit(1).cast("long").alias("hops")
    ).localCheckpoint()
    rounds = max(1, math.ceil(math.log2(max_hops))) if max_hops > 1 else 0
    for _ in range(rounds):
        g = state.select(
            F.col("src").alias("_g_src"),
            F.col("cur").alias("_g_cur"),
            F.col("hops").alias("_g_hops"),
        )
        state = (
            state.join(g, state["cur"] == g["_g_src"], "left")
            .select(
                "src",
                F.coalesce("_g_cur", "cur").alias("cur"),
                (
                    F.col("hops") + F.coalesce("_g_hops", F.lit(0))
                ).cast("long").alias("hops"),
            )
            .localCheckpoint()
        )
    is_src = e.select(F.col("src").alias("_t")).withColumn(
        "_redirects", F.lit(True)
    )
    out = state.join(is_src, state["cur"] == is_src["_t"], "left")
    ok = F.col("_redirects").isNull() & (F.col("hops") <= F.lit(max_hops))
    return out.select(
        "src",
        F.when(ok, F.col("cur")).alias("final"),
        F.when(ok, F.col("hops")).alias("hops"),
        ok.alias("resolved"),
    )


def opic(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous-batch OPIC (On-line Page Importance Computation,
    Abiteboul/Preda/Cobena, WWW 2003) — the crawl-ordering importance
    estimate a frontier can maintain WHILE crawling, unlike PageRank's
    offline fixpoint.

    Every node starts with cash ``1/N``. Each round, every node
    distributes its whole cash equally across its outlinks and banks it
    in its history (``H += C``); dangling nodes pay their cash to the
    virtual root, which redistributes it uniformly to all N nodes
    (OPIC's virtual page that links everywhere). Total cash is invariant
    at 1, so ``history + cash`` after k rounds estimates importance with
    no damping parameter. Returns ``(node, cash, history)``.

    Plan shape: outdegree weights are joined onto the edge list ONCE;
    each round is one hash join + one map-side-combined sum keyed by
    dst (identical to :func:`pagerank`'s round shape) plus a 1-row
    dangling-pot aggregate broadcast back — no driver action inside the
    loop; state is eagerly localCheckpoint-ed to cut iterative lineage.

    Determinism: same float-sum caveat as :func:`pagerank` — callers
    needing cross-engine hash equality round (the query layer uses 6
    decimals).
    """
    if iterations < 1:
        raise ValueError("opic: iterations must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        n = nodes.count()
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        weighted = (
            e.join(outdeg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
            .persist()
        )
        has_out = outdeg.select(F.col("src").alias("node")).withColumn(
            "_linked", F.lit(True)
        )
        state = (
            nodes.withColumn("cash", F.lit(1.0 / n))
            .withColumn("history", F.lit(0.0))
            .localCheckpoint()
        )
        try:
            for _ in range(iterations):
                dangling = (
                    state.join(has_out, "node", "left")
                    .filter(F.col("_linked").isNull())
                    .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("_pot"))
                )
                contrib = (
                    weighted.join(
                        state.select(F.col("node").alias("src"), "cash"), "src"
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("cash") * F.col("w")).alias("_in"))
                )
                state = (
                    state.join(contrib, "node", "left")
                    .crossJoin(F.broadcast(dangling))
                    .select(
                        "node",
                        (
                            F.coalesce(F.col("_in"), F.lit(0.0))
                            + F.col("_pot") / F.lit(float(n))
                        ).alias("cash"),
                        (F.col("history") + F.col("cash")).alias("history"),
                    )
                    .localCheckpoint()
                )
            return state
        finally:
            weighted.unpersist()
    finally:
        e.unpersist()


def degree_hist(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Web-graph degree distribution: ``(direction, bucket, n_nodes)`` where
    ``bucket = floor(log2(degree))`` — the power-law census (Broder et al.
    2000 report web in/out degrees as Zipfian; a crawl whose histogram
    bends away from the expected slope has a frontier bias or a trap).

    Exact integer arithmetic throughout: the bucket is
    ``length(bin(degree)) − 1`` (BIGINT bit length, no libm), so the
    output hashes identically in any engine. Two map-side-combined
    aggregates per direction — first at node cardinality, then at bucket
    cardinality (≤ 64 rows per direction); nothing is sorted and nothing
    corpus-sized shuffles twice."""

    def hist(col: str, direction: str) -> DataFrame:
        deg = (
            edges.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("node"))
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        return (
            deg.select(
                (F.length(F.bin(F.col("degree"))) - 1).cast("long").alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .select(F.lit(direction).alias("direction"), "bucket", "n_nodes")
        )

    return hist(src, "out").unionByName(hist(dst, "in"))


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank
    with the teleport mass personalized to a hand-vetted trusted seed set
    — trust flows out along links, so spam farms far from any seed score
    ≈ 0 and get demoted in the frontier, the inverse-PageRank use the
    paper describes. ``t = (1−d)·r₀ + d·Aᵀt`` with ``r₀ = 1/|S|`` on
    seeds (restricted to graph nodes), 0 elsewhere; ``t₀ = r₀``.

    Same scale shape as :func:`pagerank`: the 1/deg edge weights are
    joined ONCE, each round is one hash join + one map-side-combined sum,
    lineage is localCheckpoint-cut per round; the seed count is a
    broadcast 1-row aggregate. Cross-engine hash equality: round (the
    query layer rounds to 6 decimals)."""
    if iterations < 1:
        raise ValueError("trustrank: iterations must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        weighted = (
            e.join(outdeg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
            .persist()
        )
        seedset = (
            seeds.select(F.col(seed_col).alias("node")).distinct().join(nodes, "node")
        )
        n_seeds = seedset.agg(
            F.count(F.lit(1)).cast("double").alias("n_seeds")
        )
        reset = (
            nodes.join(seedset.withColumn("_s", F.lit(1)), "node", "left")
            .crossJoin(F.broadcast(n_seeds))
            .select(
                "node",
                F.when(
                    F.col("_s").isNotNull(), F.lit(1.0) / F.col("n_seeds")
                )
                .otherwise(F.lit(0.0))
                .alias("r0"),
            )
            .localCheckpoint()
        )
        ranks = reset.select("node", F.col("r0").alias("trust")).localCheckpoint()
        try:
            for _ in range(iterations):
                contrib = (
                    weighted.join(
                        ranks.withColumnRenamed("node", "src"), "src"
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("trust") * F.col("w")).alias("_in"))
                )
                ranks = (
                    reset.join(contrib, "node", "left")
                    .select(
                        "node",
                        (
                            F.lit(1.0 - damping) * F.col("r0")
                            + F.lit(damping)
                            * F.coalesce(F.col("_in"), F.lit(0.0))
                        ).alias("trust"),
                    )
                    .localCheckpoint()
                )
            return ranks
        finally:
            weighted.unpersist()
    finally:
        e.unpersist()


def reciprocity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-host link reciprocity: ``(node, n_out, n_recip, recip_rate)``
    where ``n_out`` is the node's distinct out-neighbor count (self-loops
    excluded), ``n_recip`` how many of those neighbors link back, and
    ``recip_rate = n_recip / n_out``.

    Mutual-link density is a classic nepotistic-spam feature (Fetterly
    et al., WebDB 2004; Castillo et al., WEBSPAM-UK): organic sites link
    out far more than they are linked back by the same hosts, while link
    farms and paid-exchange rings show reciprocity near 1.0 — the
    frontier demotes such hosts the same way it demotes mirror replicas.
    The reference crawls a vetted store list and never sees spam; this is
    the scale generalization that makes an open-web frontier survivable.

    Exact arithmetic: counts are integers; the rate is one double
    division (round to 6 decimals for cross-engine hash equality — the
    query layer does). Scale shape: ONE distinct over the host-pair edge
    list (host-graph cardinality, orders below the URL edge list), then a
    self-join on the reversed pair — both sides hash-partition on the
    same (a, b) key, so the probe co-locates; the per-node rollup is one
    map-side-combined aggregate. No corpus-sized shuffle, no sort, no
    all-pairs anywhere."""
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"), F.lit(1).alias("back"))
    marked = e.join(rev, ["a", "b"], "left")
    return (
        marked.groupBy(F.col("a").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.sum(F.coalesce(F.col("back"), F.lit(0))).cast("long").alias("n_recip"),
        )
        .withColumn(
            "recip_rate", F.col("n_recip").cast("double") / F.col("n_out").cast("double")
        )
    )


def outlink_entropy(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-source outlink diversity: Shannon entropy of each node's
    destination distribution, ``(node, n_edges, n_dst, entropy_bits)``.
    Link farms and template navigation emit thousands of edges into a
    handful of destinations (entropy ≈ 0 relative to log2(n_dst) ≈
    volume), while organic hosts spread wide — the WEBSPAM-UK feature
    set's link-diversity signals; pairs with :func:`reciprocity` and
    :func:`link_census` in the frontier's host-demotion score.

    Computed as ``H = log2(N) − (Σ n_i·log2(n_i)) / N`` over per-(src,
    dst) edge counts — two map-side-combined aggregates at edge-pair then
    node cardinality; counts exact int64, the entropy is a short libm
    fold (round 6 for cross-engine hash equality, as the query layer
    does). No window, no sort, no self-join."""
    pair = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .groupBy(F.col(src).alias("node"), F.col(dst).alias("_d"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    return (
        pair.groupBy("node")
        .agg(
            F.sum("_n").cast("long").alias("n_edges"),
            F.count(F.lit(1)).cast("long").alias("n_dst"),
            F.sum(F.col("_n").cast("double") * F.log2(F.col("_n").cast("double"))).alias("_nlogn"),
        )
        .select(
            "node",
            "n_edges",
            "n_dst",
            (
                F.log2(F.col("n_edges").cast("double"))
                - F.col("_nlogn") / F.col("n_edges").cast("double")
            ).alias("entropy_bits"),
        )
    )

# ------------------------------------------------- distance / centrality


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 8,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Crawl-depth census: BFS distance from a seed set over the link
    graph, ``(node, depth)`` for every node reachable within
    ``max_depth`` hops (seeds at depth 0).

    This is the graph-side twin of the crawl loop's epoch counter — the
    reference hard-wires a two-level walk (store list -> category pages,
    ``/root/reference/crawler/main.py``), while an open-web frontier
    budgets by *discovered* depth: depth caps are the classic spider-trap
    guard and "distance from the seed whitelist" is TrustRank's
    propagation metric in its simplest form. Running this census over
    persisted ``link_edges`` tells an operator how deep the crawl
    actually penetrated and which hosts only appear far from trusted
    seeds.

    Plan shape: one shuffle per level — the frontier ⋈ edges hash join,
    then a left-anti probe against the known set (both sides partition
    on the node key). The frontier DataFrame is the *newly discovered*
    layer only, so per-round work is proportional to the BFS wavefront,
    not the visited set; lineage is cut per round with localCheckpoint
    (the repo's standard driver-loop idiom, as in :func:`pagerank`).
    The loop probes the wavefront for emptiness (one cheap job) and
    stops early — depth is partitioning-invariant, so the result is
    byte-deterministic at any parallelism.
    """
    if max_depth < 0:
        raise ValueError("bfs_depth: max_depth must be >= 0")
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .persist()
    )
    try:
        dist = (
            seeds.select(F.col(node).alias("node"))
            .distinct()
            .withColumn("depth", F.lit(0).cast("long"))
            .localCheckpoint()
        )
        frontier = dist
        for k in range(1, max_depth + 1):
            nxt = (
                frontier.join(e, frontier["node"] == e["_s"])
                .select(F.col("_d").alias("node"))
                .distinct()
            )
            new = (
                nxt.join(dist, "node", "left_anti")
                .withColumn("depth", F.lit(k).cast("long"))
                .localCheckpoint()
            )
            if new.isEmpty():
                break
            dist = dist.unionByName(new).localCheckpoint()
            frontier = new
        return dist
    finally:
        e.unpersist()


def pairwise_distances(
    edges: DataFrame,
    max_depth: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact all-sources BFS: ``(root, node, depth)`` — the shortest
    directed path length from ``root`` to ``node`` for every ordered
    pair within ``max_depth`` hops (including ``(v, v, 0)``).

    State is O(V^2) pairs, so this is the small-graph DIAGNOSTIC tool
    (host graphs, seed neighborhoods) and the exactness oracle for
    :func:`hyperball`, which computes the same neighborhood function in
    O(V * 2^p) sketch state — at 10^10 URLs only the sketch survives.

    Same wavefront loop as :func:`bfs_depth`, keyed by (root, node):
    one hash join + one anti-join per level, wavefront-proportional
    work, localCheckpoint-cut lineage, deterministic at any parallelism.
    """
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("_s").alias("node"))
            .unionByName(e.select(F.col("_d").alias("node")))
            .distinct()
        )
        dist = (
            nodes.select(
                F.col("node").alias("root"),
                "node",
                F.lit(0).cast("long").alias("depth"),
            )
        ).localCheckpoint()
        frontier = dist
        for k in range(1, max_depth + 1):
            nxt = (
                frontier.join(e, frontier["node"] == e["_s"])
                .select("root", F.col("_d").alias("node"))
                .distinct()
            )
            new = (
                nxt.join(dist, ["root", "node"], "left_anti")
                .withColumn("depth", F.lit(k).cast("long"))
                .localCheckpoint()
            )
            if new.isEmpty():
                break
            dist = dist.unionByName(new).localCheckpoint()
            frontier = new
        return dist
    finally:
        e.unpersist()


def harmonic_centrality(
    edges: DataFrame,
    max_depth: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact harmonic centrality (Boldi & Vigna 2014, "Axioms for
    Centrality"): ``H(v) = sum over u != v reachable of 1 / d(u, v)``,
    distances along edge direction (incoming paths — on web graphs this
    is the authority flavor: pages many others reach quickly rank high).

    Returns ``(node, n_reach, harmonic)`` where ``n_reach`` counts
    ``u != v`` with ``d(u, v) <= max_depth``. Built on
    :func:`pairwise_distances`, so exact and O(V^2) — the sketch-backed
    scale path is :func:`hyperball` + :func:`hyperball_harmonic`.
    Arithmetic: a sum of 1/k for small-integer k — one map-side-combined
    aggregate; round to 6 dp for cross-engine hash equality (the query
    layer does).
    """
    d = pairwise_distances(edges, max_depth=max_depth, src=src, dst=dst)
    return (
        d.filter(F.col("depth") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reach"),
            F.sum(F.lit(1.0) / F.col("depth").cast("double")).alias("harmonic"),
        )
    )


def hyperball(
    edges: DataFrame,
    p: int = 6,
    max_depth: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function by
    HyperLogLog counters — ``(node, radius, v_zero, s_scaled, est)``
    where ``est`` estimates ``|{u : d(u -> node) <= radius}|``.

    The exact census (:func:`pairwise_distances`) carries O(V^2) state;
    HyperBall carries one 2^p-register sketch per node and converges in
    diameter rounds — the formulation that computed centralities on the
    85-billion-edge Facebook graph, and the only one that survives a
    10^10-URL link graph. Per round the update is
    ``ball_r(v) = merge(ball_{r-1}(v), union of ball_{r-1}(u) for u->v)``
    — register-wise max, i.e. exactly :func:`sketch.hll_merge` semantics
    over the sparse ``(node, reg, rank_max)`` register table.

    ENGINE-EXACT, like everything in ``sketch``: registers hash with the
    portable 60-bit md5 prefix and ranks are integer bit-lengths, so an
    independent SQL engine reproduces every register and the estimate to
    the literal bit (the query layer's DuckDB oracle unrolls the rounds
    as chained CTEs). Plan shape per round: ONE shuffle — registers ⋈
    edges feeding a map-side-combined groupBy(node, reg) max; sketch
    rows per node cap at 2^p regardless of ball size, so a mega-hub's
    billion-URL ball costs the same 64 rows as a leaf's.
    """
    from .sketch import _HASH_BITS, hll_estimate

    if not 4 <= p <= 16:
        raise ValueError(f"hyperball: p={p} out of range [4, 16]")
    m = 1 << p
    w_bits = _HASH_BITS - p
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("_s").alias("node"))
            .unionByName(e.select(F.col("_d").alias("node")))
            .distinct()
        )
        h = F.conv(
            F.substring(F.md5(F.col("node").cast("string")), 1, 15), 16, 10
        ).cast("long")
        w = F.shiftright(h, p)
        rank = (
            F.when(w == 0, F.lit(w_bits + 1))
            .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
            .cast("long")
        )
        regs = nodes.select(
            "node", (h % m).cast("long").alias("reg"), rank.alias("rank_max")
        ).localCheckpoint()
        out = hll_estimate(regs, ["node"], p).withColumn(
            "radius", F.lit(0).cast("long")
        )
        balls = [out]
        for r in range(1, max_depth + 1):
            contrib = regs.join(e, regs["node"] == e["_s"]).select(
                F.col("_d").alias("node"), "reg", "rank_max"
            )
            regs = (
                regs.unionByName(contrib)
                .groupBy("node", "reg")
                .agg(F.max("rank_max").alias("rank_max"))
                .localCheckpoint()
            )
            balls.append(
                hll_estimate(regs, ["node"], p).withColumn(
                    "radius", F.lit(r).cast("long")
                )
            )
        allb = balls[0]
        for b in balls[1:]:
            allb = allb.unionByName(b)
        return allb.select("node", "radius", "v_zero", "s_scaled", "est")
    finally:
        e.unpersist()


def hyperball_harmonic(balls: DataFrame) -> DataFrame:
    """Read harmonic-centrality estimates out of a :func:`hyperball`
    table: ``H(v) ~= sum over r >= 1 of (est_r - est_{r-1}) / r``
    (each shell's estimated new-node count, harmonically discounted).

    Returns ``(node, n_reach_est, harmonic_est)`` with ``n_reach_est``
    the max-radius ball estimate minus 1 (the node itself). Shell
    increments clamp at 0 — HLL estimates are monotone here by
    construction (register-wise max only grows), but the clamp makes
    that a guarantee, not an assumption. One per-node window over
    ``radius`` (a handful of rows per node — diameter-bounded), then one
    map-side-combined aggregate.
    """
    w = Window.partitionBy("node").orderBy("radius")
    shell = balls.withColumn("_prev", F.lag("est", 1).over(w)).filter(
        F.col("radius") > 0
    )
    inc = F.greatest(F.col("est") - F.col("_prev"), F.lit(0.0))
    return (
        shell.groupBy("node")
        .agg(
            (F.max(F.col("est")) - F.lit(1.0)).alias("n_reach_est"),
            F.sum(inc / F.col("radius").cast("double")).alias("harmonic_est"),
        )
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007, the GraphX ``LabelPropagation`` semantics): every node starts
    labelled with itself; each round it adopts the most frequent label
    among its (undirected) neighbors, ties broken by the smallest label.
    After a fixed number of rounds the labels ARE the communities —
    host-level site/mirror-family detection and the cheap first pass
    before anything spectral. Differs from hash-min connected components
    (textops.connected_components) in kind: CC converges to one label
    per reachable region; LPA finds DENSITY clusters inside a connected
    graph, which is what a link-farm census wants.

    Determinism: synchronous rounds + total-order tie-break (count DESC,
    label ASC) make the result a pure function of the graph — byte-equal
    at any parallelism, so a fixed-round unrolled SQL oracle reproduces
    it exactly. Isolated or fixed-point nodes keep their previous label
    via the left-join coalesce.

    Scale shape: per round, ONE edge⋈label hash join (edge list keyed on
    the neighbor end), one (node, label) map-side-combined count, one
    row_number window at node cardinality, and a left join back to carry
    unchanged nodes; lineage cut per round with localCheckpoint (the
    repo's driver-loop idiom). Rounds is a fixed small constant — LPA
    converges in a handful of sweeps on power-law graphs."""
    if rounds < 0:
        raise ValueError("label_propagation: rounds must be >= 0")
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label").asc())
    try:
        for _ in range(rounds):
            nb = und.join(
                labels.withColumnRenamed("node", "b"), "b"
            ).select(F.col("a").alias("node"), "label")
            top = (
                nb.groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("c"))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("node", F.col("label").alias("_new"))
            )
            labels = (
                labels.join(top, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("_new"), F.col("label")).alias("label"),
                )
                .localCheckpoint()
            )
        return labels
    finally:
        und.unpersist()


def coreness(
    edges: DataFrame,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition via synchronous H-index iteration (Lü et al.,
    Nature Communications 2016): start every node at its degree; each
    round replace a node's value with the H-index of its neighbors'
    values (the largest h with >= h neighbors valued >= h). The sequence
    is monotonically non-increasing and its fixpoint IS the coreness —
    graph degeneracy layers, the classic dense-link-farm signal (a spam
    ring is a high-k core; organic hosts live in shallow cores) and the
    peeling order behind densest-subgraph extraction.

    Distributed shape per round: one edge⋈value hash join keyed on the
    neighbor end, one groupBy(node) collecting ONLY that node's neighbor
    values (array_sort + one expression computes the H-index: count of
    rank-i values >= i+1 on the descending sort — per-node arrays, no
    global sort), lineage cut by localCheckpoint. Synchronous integer
    updates make every round a pure function of the graph, so a
    fixed-round unrolled SQL twin matches exactly; on bounded-degeneracy
    web graphs the fixpoint lands in a handful of sweeps (tests assert
    convergence on the fixture graph).

    Returns (node, core) after ``rounds`` sweeps (core = exact coreness
    once converged).
    """
    if rounds < 0:
        raise ValueError("coreness: rounds must be >= 0")
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    vals = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .localCheckpoint()
    )
    try:
        for _ in range(rounds):
            nb = und.join(
                vals.withColumnRenamed("node", "b"), "b"
            ).select(F.col("a").alias("node"), "v")
            hidx = F.size(
                F.filter(
                    F.reverse(F.array_sort(F.collect_list("v"))),
                    lambda x, i: x >= i + 1,
                )
            ).cast("long")
            vals = (
                nb.groupBy("node").agg(hidx.alias("v")).localCheckpoint()
            )
        return vals.select("node", F.col("v").alias("core"))
    finally:
        und.unpersist()


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-node triangle count + local clustering coefficient —
    the tightly-knit-neighborhood signal (link farms and copy rings
    close triangles; organic link neighborhoods are sparse — Becchetti
    et al. KDD'08 use exactly this census for web-spam demotion).

    Scalable shape (Schank-Wagner / Cohen's MapReduce orientation, the
    GraphX `TriangleCount` plan): orient every undirected edge from the
    lower-(degree, id) endpoint to the higher one — every triangle then
    has exactly ONE wedge at its minimum vertex, so the wedge self-join
    runs on out-degrees bounded by sqrt(m) (no hub ever enumerates its
    full neighborhood square; the power-law killer for naive wedge
    counting). One self-join on the wedge pivot + one membership probe
    against the oriented edge list + three per-corner rollups.

    clustering = 2*T / (d*(d-1)) is one exact int64->double division
    (NULL for degree < 2). Counts are integers; the whole op is
    engine-exact with no rounding anywhere.
    """
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # orient: keep (a,b) iff (deg_a, a) < (deg_b, b) — a total order, so
    # exactly one direction of every undirected edge survives
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_db"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .filter(
            (F.col("_da") < F.col("_db"))
            | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
        .persist()
    )
    # wedges at the minimum corner: (a->b, a->c) with b < c; the triangle
    # closes iff oriented edge (b, c) exists (b before c in the order is
    # not guaranteed — probe both directions via canonical min/max)
    w = (
        oriented.alias("x")
        .join(oriented.alias("y"), "a")
        .filter(F.col("x.b") < F.col("y.b"))
        .select(
            F.col("a").alias("v1"),
            F.col("x.b").alias("v2"),
            F.col("y.b").alias("v3"),
        )
    )
    closure = oriented.select(
        F.least("a", "b").alias("_lo"), F.greatest("a", "b").alias("_hi")
    )
    tris = w.join(
        closure,
        (F.least("v2", "v3") == F.col("_lo"))
        & (F.greatest("v2", "v3") == F.col("_hi")),
        "left_semi",
    ).persist()
    per_node = (
        tris.select(F.col("v1").alias("node"))
        .union(tris.select("v2"))
        .union(tris.select("v3"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0)).cast("long"))
        .withColumn(
            "clustering",
            F.when(
                F.col("deg") >= 2,
                (F.lit(2) * F.col("n_triangles")).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
            ),
        )
        .select("node", F.col("deg").alias("degree"), "n_triangles", "clustering")
    )


def _min_color_fixpoint(
    e: DataFrame, nodes: DataFrame, max_iters: int
) -> DataFrame:
    """Forward min-label propagation to fixpoint: color(v) = min node id
    (string order) over {v} ∪ {u : u reaches v} within the active
    subgraph. One hash join + map-side-combined min per round; lineage
    localCheckpoint-cut; stops early on the fixpoint probe. min() is
    order-free, so the coloring is byte-deterministic at any parallelism.
    """
    lab = nodes.select("node").withColumn("lab", F.col("node")).localCheckpoint()
    for _ in range(max_iters):
        cand = (
            e.join(lab, lab["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.min("lab").alias("_m"))
        )
        nxt = lab.join(cand, "node", "left").withColumn(
            "_lab2", F.least(F.col("lab"), F.coalesce(F.col("_m"), F.col("lab")))
        ).localCheckpoint()
        if nxt.filter(F.col("_lab2") < F.col("lab")).isEmpty():
            break
        lab = nxt.select("node", F.col("_lab2").alias("lab")).localCheckpoint()
    return lab


def scc(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 12,
    max_iters: int = 48,
) -> DataFrame:
    """Strongly connected components of a directed link graph —
    ``(node, scc_id)`` with ``scc_id`` = the lexicographically smallest
    member of the component.

    The web graph's macro-shape is Broder et al.'s bow-tie (WWW 2000):
    one giant SCC, an IN region feeding it, an OUT region fed by it, and
    a periphery of tendrils. Knowing each host's SCC is the first step of
    that census (see :func:`bowtie`) and a crawl-planning primitive: a
    frontier seeded inside the giant SCC will eventually see all of it,
    while OUT-region hosts can never lead back. The reference's static
    store list has no graph to decompose; this is the open-web
    generalization.

    Algorithm: the Multistep / FW-BW-coloring method used by every
    distributed SCC system (Slota et al. IPDPS'14; Orzan's coloring;
    same family as GraphX's ``StronglyConnectedComponents``) — per phase:

    1. **Trim** to fixpoint: an active node with no in-edges or no
       out-edges cannot sit on a cycle → settle it as a singleton SCC.
       On real web graphs trim alone removes most of the periphery; each
       round is one degree distinct + two anti-joins.
    2. **Color** forward to fixpoint: color(v) = min id that reaches v
       (:func:`_min_color_fixpoint` — one shuffle per round).
    3. **Settle**: within each color class, the nodes that can reach the
       color's root through same-color nodes are exactly SCC(root)
       (root reaches them by construction; they reach root). Found by a
       backward BFS from the roots restricted to same-color endpoints —
       per-round work proportional to the wavefront.

    Every phase settles at least the SCC of each color root, so phases
    are bounded by the longest ascending-id chain in the condensation
    DAG (on web graphs: shallow). Raises RuntimeError if ``max_phases``
    is exhausted with nodes still active — never returns a wrong label.
    """
    e0 = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
    )
    nodes = (
        e0.select(F.col("_s").alias("node"))
        .union(e0.select("_d"))
        .distinct()
        .localCheckpoint()
    )
    e = e0.localCheckpoint()
    remaining = nodes
    spark = edges.sparkSession
    result = spark.createDataFrame([], "node string, scc_id string")
    for _ in range(max_phases):
        # 1. trim periphery to fixpoint
        for _ in range(max_iters):
            has_in = e.select(F.col("_d").alias("node")).distinct()
            has_out = e.select(F.col("_s").alias("node")).distinct()
            trimmed = (
                remaining.join(has_in, "node", "left_anti")
                .union(remaining.join(has_out, "node", "left_anti"))
                .distinct()
                .localCheckpoint()
            )
            if trimmed.isEmpty():
                break
            result = result.unionByName(
                trimmed.withColumn("scc_id", F.col("node"))
            ).localCheckpoint()
            remaining = remaining.join(trimmed, "node", "left_anti").localCheckpoint()
            e = (
                e.join(trimmed.withColumnRenamed("node", "_s"), "_s", "left_anti")
                .join(trimmed.withColumnRenamed("node", "_d"), "_d", "left_anti")
                .localCheckpoint()
            )
        if remaining.isEmpty():
            break
        # 2. forward coloring
        colored = _min_color_fixpoint(e, remaining, max_iters)  # (node, lab)
        # 3. backward reach from each color root within its color class
        ec = (
            e.join(colored.withColumnRenamed("node", "_s"), "_s")
            .withColumnRenamed("lab", "_ls")
            .join(colored.withColumnRenamed("node", "_d"), "_d")
            .filter(F.col("_ls") == F.col("lab"))
            .select("_s", "_d", F.col("lab").alias("_c"))
            .localCheckpoint()
        )
        settled = colored.filter(F.col("node") == F.col("lab")).localCheckpoint()
        wave = settled
        for _ in range(max_iters):
            nxt = (
                ec.join(wave, (ec["_d"] == wave["node"]) & (ec["_c"] == wave["lab"]))
                .select(F.col("_s").alias("node"), F.col("_c").alias("lab"))
                .distinct()
            )
            new = nxt.join(settled, "node", "left_anti").localCheckpoint()
            if new.isEmpty():
                break
            settled = settled.unionByName(new).localCheckpoint()
            wave = new
        result = result.unionByName(
            settled.select("node", F.col("lab").alias("scc_id"))
        ).localCheckpoint()
        sn = settled.select("node")
        remaining = remaining.join(sn, "node", "left_anti").localCheckpoint()
        e = (
            e.join(sn.withColumnRenamed("node", "_s"), "_s", "left_anti")
            .join(sn.withColumnRenamed("node", "_d"), "_d", "left_anti")
            .localCheckpoint()
        )
        if remaining.isEmpty():
            break
    if not remaining.isEmpty():
        raise RuntimeError("scc: max_phases exhausted with active nodes remaining")
    return result


def bowtie(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_phases: int = 12,
    max_iters: int = 48,
) -> DataFrame:
    """Broder bow-tie census (WWW 2000): classify every node of the link
    graph relative to the largest SCC — ``(node, scc_id, region)`` with
    region ∈ {CORE, IN, OUT, TUBE, TENDRIL, DISC}.

    * CORE — the largest SCC (ties broken by smallest scc_id);
    * IN — reaches CORE but is not in it;
    * OUT — reachable from CORE but not in it;
    * TUBE — reachable from IN and reaches OUT, bypassing CORE;
    * TENDRIL — hangs off IN or leads into OUT (one side only);
    * DISC — everything else (disconnected from the bow-tie).

    The census that told the crawl community the web is not a ball: a
    crawler seeded in IN∪CORE covers CORE+OUT+tubes+out-tendrils but can
    NEVER discover the rest by link-following alone — the quantitative
    argument for sitemap/CDX side-channels (`sitemap.py`, `cdx.py`).

    Plan shape: one :func:`scc` run, one driver-side scalar (the core's
    id — a 1-row collect of an aggregate, the same idiom as
    ``hostctl``'s epoch scalars), then four wavefront BFS reachability
    passes (:func:`bfs_depth`) — from CORE forward, from CORE backward,
    from IN forward, from OUT backward. All label logic is exact string
    comparison; no floats anywhere.
    """
    labels = scc(edges, src=src, dst=dst, max_phases=max_phases, max_iters=max_iters)
    top = (
        labels.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("scc_id"))
        .limit(1)
        .collect()
    )
    if not top:
        return labels.withColumn("region", F.lit("DISC"))
    core_id = top[0]["scc_id"]
    labels = labels.localCheckpoint()
    core = labels.filter(F.col("scc_id") == F.lit(core_id)).select("node")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd = bfs_depth(e, core, max_depth=max_iters).select("node")  # CORE ∪ OUT
    bwd = bfs_depth(rev, core, max_depth=max_iters).select("node")  # CORE ∪ IN
    in_ = bwd.join(core, "node", "left_anti").localCheckpoint()
    out = fwd.join(core, "node", "left_anti").localCheckpoint()
    in_fwd = bfs_depth(e, in_, max_depth=max_iters).select("node")
    out_bwd = bfs_depth(rev, out, max_depth=max_iters).select("node")
    flag = lambda d, c: d.withColumn(c, F.lit(True))  # noqa: E731
    return (
        labels.join(flag(core, "_core"), "node", "left")
        .join(flag(in_, "_in"), "node", "left")
        .join(flag(out, "_out"), "node", "left")
        .join(flag(in_fwd.distinct(), "_if"), "node", "left")
        .join(flag(out_bwd.distinct(), "_ob"), "node", "left")
        .withColumn(
            "region",
            F.when(F.col("_core"), "CORE")
            .when(F.col("_in"), "IN")
            .when(F.col("_out"), "OUT")
            .when(F.col("_if") & F.col("_ob"), "TUBE")
            .when(F.col("_if") | F.col("_ob"), "TENDRIL")
            .otherwise("DISC"),
        )
        .select("node", "scc_id", "region")
    )


def cocitation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    by: str = "citer",
    min_common: int = 2,
    max_fanout: int | None = None,
) -> DataFrame:
    """Co-citation / bibliographic-coupling pair census — the classic
    related-page signal (Dean & Henzinger, WWW'99 "Finding related pages
    in the World Wide Web"): two URLs are related if many third pages
    link to both (``by='citer'``, co-citation) or if they cite many of
    the same targets (``by='cited'``, coupling). Output
    ``(a, b, n_common, jaccard)`` for unordered pairs ``a < b`` with at
    least ``min_common`` shared neighbors; ``jaccard`` is the exact
    |common| / |union| over neighbor sets (one int→double division).

    Complements the content-side mirror detectors (``textops.
    mirror_hosts`` hashes bodies): co-citation finds related/duplicate
    hosts from the *graph alone* — no fetch needed, so a frontier can
    demote probable mirrors before spending budget on them.

    Scale shape: one distinct, then a wedge self-join on the pivot
    (citing page for co-citation) feeding a map-side-combined count on
    the pair key. The quadratic risk is a pivot with huge fan-out (a
    directory page linking 10^5 URLs yields 10^10 pairs);
    ``max_fanout`` drops pivots above the cap *before* the self-join —
    the standard co-citation degeneracy guard (such hubs carry ~zero
    relatedness signal). With the cap on, per-pivot work is bounded by
    ``max_fanout**2`` and the join partitions on the pivot key; skewed
    pair keys are AQE's problem (counts map-side-combine first).
    Default ``None`` = exact census.
    """
    if by not in ("citer", "cited"):
        raise ValueError("cocitation: by must be 'citer' or 'cited'")
    pivot, leaf = (src, dst) if by == "citer" else (dst, src)
    p = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(pivot).alias("_p"), F.col(leaf).alias("_l"))
        .distinct()
    )
    if max_fanout is not None:
        ok = (
            p.groupBy("_p")
            .agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") <= max_fanout)
            .select("_p")
        )
        p = p.join(ok, "_p", "left_semi")
    p = p.persist()
    pairs = (
        p.alias("x")
        .join(p.alias("y"), "_p")
        .filter(F.col("x._l") < F.col("y._l"))
        .groupBy(F.col("x._l").alias("a"), F.col("y._l").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    deg = p.groupBy(F.col("_l").alias("_n")).agg(
        F.count(F.lit(1)).cast("long").alias("_d")
    )
    return (
        pairs.join(deg.withColumnRenamed("_n", "a").withColumnRenamed("_d", "_da"), "a")
        .join(deg.withColumnRenamed("_n", "b").withColumnRenamed("_d", "_db"), "b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("_da") + F.col("_db") - F.col("n_common")).cast("double"),
        )
        .select("a", "b", "n_common", "jaccard")
    )


def salsa(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration SALSA (Lempel & Moran, WWW 2000) — the stochastic
    cousin of :func:`hits` and the algorithm behind production
    who-to-follow / related-page systems (Twitter's WTF service runs
    SALSA on the follow graph, Goel et al. WSDM'13): authority mass
    moves by a random walk that steps BACKWARD to a uniform in-neighbor
    then FORWARD to a uniform out-neighbor, so each propagation divides
    by the degree instead of copying full scores. The division is what
    kills HITS's TKC tightly-knit-community capture: a link farm's
    k^2 internal links each carry only 1/k of a farm page's mass, while
    HITS multiplies farm scores together until the farm owns the top of
    the ranking.

    Power iteration with L1 normalization each half-step (same
    discipline as :func:`hits`; SALSA's walk is measure-preserving on
    its support, so the normalizer only absorbs dangling-node loss)::

        auth'(v) = Σ_{u→v} hub(u) / outdeg(u);   auth = auth'/Σauth'
        hub'(u)  = Σ_{u→v} auth(v) / indeg(v);   hub  = hub'/Σhub'

    from hub_0 = 1 everywhere. Fixed iteration count — a known number
    of jobs, reproducible modulo float summation order (query layer
    rounds to 6 decimals, as with :func:`pagerank`).

    Scale shape identical to :func:`hits`: the edge table is persisted
    once with both degree weights precomputed (two map-side-combined
    degree aggs + joins, done before the loop), each half-step is ONE
    edge ⋈ score join into a map-side-combined sum, lineage cut by
    localCheckpoint, L1 normalizer folded in as a driver literal from a
    1-row aggregate over materialized rows.
    """
    if iterations < 1:
        raise ValueError("salsa: iterations must be >= 1")
    e0 = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
    )
    outd = e0.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    ind = e0.groupBy("dst").agg(F.count(F.lit(1)).alias("_id"))
    e = (
        e0.join(outd, "src")
        .join(ind, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("_od")).alias("wo"),
            (F.lit(1.0) / F.col("_id")).alias("wi"),
        )
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        hub = nodes.select("node", F.lit(1.0).alias("hub")).localCheckpoint()
        auth = nodes.select("node", F.lit(0.0).alias("auth"))

        def _l1(df: DataFrame, col: str) -> DataFrame:
            total = df.agg(F.sum(col)).collect()[0][0] or 0.0
            if total == 0.0:
                return df.select("node", F.lit(0.0).alias(col))
            return df.select(
                "node", (F.col(col) / F.lit(float(total))).alias(col)
            )

        for _ in range(iterations):
            a_raw = (
                nodes.join(
                    e.join(hub.select(F.col("node").alias("src"), "hub"), "src")
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("hub") * F.col("wo")).alias("auth")),
                    "node",
                    "left",
                )
                .select("node", F.coalesce("auth", F.lit(0.0)).alias("auth"))
                .localCheckpoint()
            )
            auth = _l1(a_raw, "auth")
            h_raw = (
                nodes.join(
                    e.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
                    .groupBy(F.col("src").alias("node"))
                    .agg(F.sum(F.col("auth") * F.col("wi")).alias("hub")),
                    "node",
                    "left",
                )
                .select("node", F.coalesce("hub", F.lit(0.0)).alias("hub"))
                .localCheckpoint()
            )
            hub = _l1(h_raw, "hub")
        return hub.join(auth, "node").select("node", "hub", "auth")
    finally:
        e.unpersist()


def gap_bits_census(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Adjacency-list compressibility census — the WebGraph/BV question
    (Boldi & Vigna, WWW'04): how many bits per link does the link store
    actually need? Web adjacency lists compress ~10× under gap coding
    because outlinks cluster by locality; this census measures that on
    YOUR crawl so the 100 TB link-store budget is a number, not a hope.

    Per source node: sort its distinct integer destinations, take first
    gap ``d_1 + 1`` and successive gaps ``d_i − d_{i−1}`` (all ≥ 1 by
    distinctness), and charge each gap its Elias-γ length
    ``2·bits(gap) − 1`` (bits(x) = floor(log2 x) + 1 — an integer bit
    length, no libm). Returns ``(src, outdeg, gamma_bits, raw_bits,
    ratio)`` where raw_bits = 64·outdeg (uncompressed id list) and
    ratio = gamma_bits / raw_bits (one exact int→double division).

    Plan shape: ONE map-side-combined ``collect_set`` per source — each
    node's own list only, sorted per-row by ``array_sort`` (never a
    global sort) — then pure array expressions inside codegen. A
    mega-hub is one row with a long array, not a hot partition.
    """
    adj = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .groupBy(F.col(src).alias("node"))
        .agg(F.array_sort(F.collect_set(F.col(dst).cast("long"))).alias("_a"))
    )
    gaps = F.transform(
        F.sequence(F.lit(1), F.size("_a")),
        lambda i: F.element_at(F.col("_a"), i)
        - F.when(i > 1, F.element_at(F.col("_a"), i - 1)).otherwise(F.lit(-1).cast("long")),
    )
    gamma = F.aggregate(
        gaps,
        F.lit(0).cast("long"),
        lambda acc, g: acc + 2 * F.length(F.bin(g)) - 1,
    )
    return adj.select(
        F.col("node").alias("src"),
        F.size("_a").cast("long").alias("outdeg"),
        gamma.cast("long").alias("gamma_bits"),
        (F.size("_a") * F.lit(64)).cast("long").alias("raw_bits"),
        (
            gamma.cast("double") / (F.size("_a") * F.lit(64)).cast("double")
        ).alias("ratio"),
    )


def assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity of the directed link graph — Newman's r
    (PRL 2002) over (out-degree of source, in-degree of target) across
    edges: r < 0 is the disassortative signature of organic webs (hubs
    link to leaves), while link farms wire high-degree nodes together
    and push r toward +1 — a one-number structural spam/mirror smell
    for the whole crawl, and the standard sanity check that a synthetic
    or sampled graph still looks web-shaped.

    r is the Pearson correlation of the per-edge degree pairs (x_e,
    y_e). Exactness discipline: accumulate the five int64 moments
    (n, Σx, Σy, Σxy, Σx², Σy²) — order-free integer sums — then

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

    with single-cast IEEE doubles: two correctly-rounded sqrt-free
    products, one multiply, one sqrt, one division — engine-exact, the
    same discipline as ``hostctl.burst_detect``. NULL when either
    variance is zero.

    Plan shape: two degree aggregates, two joins keyed on the edge
    endpoints, ONE 1-row global aggregate. Nothing is ever collected
    per node; a mega-hub contributes its degree as a joined constant.
    """
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    )
    outd = e.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("x"))
    ind = e.groupBy("_d").agg(F.count(F.lit(1)).cast("long").alias("y"))
    m = (
        e.join(outd, "_s")
        .join(ind, "_d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.when(
            (vx > 0) & (vy > 0),
            cov.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")),
        ).alias("r"),
    )


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    precision: int = 6,
) -> DataFrame:
    """Link-spam mass estimation (Gyöngyi, Berkhin, Garcia-Molina &
    Pedersen, "Link Spam Detection Based on Mass Estimation", VLDB 2006):
    how much of a page's PageRank arrives from OUTSIDE the trusted part of
    the web. Pages whose rank is mostly untrusted mass are link-farm
    boostees — the complement of TrustRank's demotion view, and the
    paper's headline spam signal.

    ``p`` is uniform-teleport PageRank in GraphX units (rank₀ = 1, total
    mass ≈ N); ``t`` is :func:`trustrank` (teleport mass 1 spread over the
    seed set). Trust is rescaled into PageRank units (``t' = N·t``), then

        spam_mass = p − t'          (absolute mass)
        rel_mass  = (p − t') / p    (fraction of rank that is untrusted)

    ``rel_mass`` ∈ (−∞, 1]: ≈ 1 means virtually no trust reaches the node
    (spam candidate), ≤ 0 means trust flow covers its whole rank (seeds
    and their neighborhoods). ``p ≥ 1−d > 0`` so the division is total.

    Both input scores are rounded to ``precision`` BEFORE the arithmetic:
    each factor is already hash-checked cross-engine at that precision
    (q_pagerank / q_trustrank), so the composition stays bit-identical in
    any engine that replays the same rounded-operand expression.

    Scale shape: two fixed-iteration rank loops over the SAME cached
    distinct edge list (one shuffle per iteration each), one broadcast
    1-row node count, one node-keyed equi-join — nothing here exceeds the
    cost of running PageRank twice.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    p = pagerank(e, iterations=iterations, damping=damping)
    t = trustrank(
        e, seeds, iterations=iterations, damping=damping, seed_col=seed_col
    )
    n_nodes = p.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    pr = p.select("node", F.round("rank", precision).alias("rank"))
    tr = t.select("node", F.round("trust", precision).alias("trust"))
    joined = pr.join(tr, "node").crossJoin(F.broadcast(n_nodes))
    untrusted = F.col("rank") - F.col("trust") * F.col("n_nodes")
    return joined.select(
        "node",
        "rank",
        "trust",
        F.round(untrusted, precision).alias("spam_mass"),
        F.round(untrusted / F.col("rank"), precision).alias("rel_mass"),
    )
