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

from pyspark.sql import DataFrame, functions as F


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
