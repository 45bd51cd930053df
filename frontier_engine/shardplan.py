"""Frontier shard planning: balanced host→shard assignment from observed
page mass, as a distributed exact prefix sum.

The reference routes work with a hand-written static shard map
(``/root/reference/db/init.sql`` assigns each store chain its own shard);
a 10^10-URL frontier needs the same thing *derived from data*: given the
per-host page counts the crawl already aggregates (``textops.
domain_stats`` / ``hostctl.trap_census``), split the host universe into
``n_shards`` contiguous, load-balanced key ranges. The output table is
what a deployment feeds to ``repartitionByRange``-style routing, Iceberg
partition layouts, or the drain's bucket map — computed, versioned, and
reproducible instead of hand-maintained.

Algorithm — the classic two-pass distributed prefix sum, never a global
sort of rows:

1. range-partition hosts (the only full shuffle, at HOST cardinality,
   not URL/page cardinality) and pin the layout with ``localCheckpoint``
   so both passes see identical partitions;
2. one per-partition sum collected to the driver — P rows, driver-small
   by construction — turned into per-partition starting offsets;
3. a partition-LOCAL cumulative window (each partition sorts only its
   own slice) plus the broadcast offset gives every host its exact
   global ``cum_before``; the shard id is then pure integer arithmetic,
   ``(cum_before * n_shards) div total``.

Every number is a BIGINT fold — byte-identical on any engine, at any
parallelism (the partition count P changes which rows land where, never
the result; a test pins this). Weights must be non-negative and hosts
distinct (it is an aggregate table by construction); ties are impossible
so the plan is total-order deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["host_shard_plan"]


def host_shard_plan(
    weights: DataFrame,
    n_shards: int,
    host_col: str = "host",
    weight_col: str = "weight",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each host a shard id in ``[0, n_shards)`` such that shards
    are contiguous in host order and balanced by weight.

    ``weights`` holds one row per host (distinct hosts, weight >= 0,
    e.g. observed page counts). Returns ``(host, weight, cum_before,
    shard)`` where ``cum_before`` is the exact sum of all
    lexicographically-smaller hosts' weights and ``shard =
    min(n_shards - 1, (cum_before * n_shards) div total)``. Each
    shard's load deviates from ``total / n_shards`` by less than the
    heaviest single host (the bin-packing lower bound for contiguous
    ranges); a pathological mega-host still lands alone in its shard
    rather than sinking a neighbor.

    ``cum_before * n_shards`` stays in int64 for any realistic frontier
    (10^10 pages x 4096 shards ~ 4x10^13 << 2^63).
    """
    if n_shards < 1:
        raise ValueError("host_shard_plan: n_shards must be >= 1")
    spark = weights.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    d = (
        weights.select(
            F.col(host_col).alias("host"),
            F.col(weight_col).cast("long").alias("weight"),
        )
        .repartitionByRange(p, "host")
        .withColumn("_pid", F.spark_partition_id())
        # pin the partition layout: the per-partition sums below and the
        # final window must see the SAME row->partition assignment
        # (range sampling is order-sensitive, so recomputation could
        # legally move boundary rows between the two passes)
        .localCheckpoint()
    )
    per = {
        r["_pid"]: r["_s"]
        for r in d.groupBy("_pid").agg(F.sum("weight").alias("_s")).collect()
    }
    total = sum(per.values())
    if total <= 0:
        return d.select(
            "host",
            "weight",
            F.lit(0).cast("long").alias("cum_before"),
            F.lit(0).cast("int").alias("shard"),
        )
    offsets, acc = [], 0
    for pid in sorted(per):
        offsets.append((pid, acc))
        acc += per[pid]
    off = spark.createDataFrame(offsets, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy("host")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("weight").over(w), F.lit(0)) + F.col("_off")
    return (
        d.join(F.broadcast(off), "_pid")
        .withColumn("cum_before", cum.cast("long"))
        .withColumn(
            "shard",
            F.least(
                F.lit(n_shards - 1),
                F.expr(f"(cum_before * {n_shards}) DIV {total}"),
            ).cast("int"),
        )
        .select("host", "weight", "cum_before", "shard")
    )
