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


# ------------------------------------------------- Z-order layout


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) key over ``len(cols)`` integer dimensions — the
    multi-dimensional clustering key behind Delta's OPTIMIZE ZORDER and
    the classic UB-tree layout (Bayer 1997): interleaving the low
    ``bits`` bits of each dimension makes rows that are close in ANY
    dimension land close in the sort order, so parquet row-group min/max
    stats stay tight on EVERY keyed column at once — a range filter on
    the second or third dimension still prunes, which a lexicographic
    sort only gives the leading column.

    Inputs are masked to ``bits`` (callers bucket-reduce first — e.g.
    ``host_hash % 256``, ``epoch % 256``); the key fits int64 for
    ``len(cols) * bits <= 63``.  Pure bit arithmetic unrolled at plan
    time (one codegen expression, no UDF), reproducible in any SQL
    engine via :func:`zorder_oracle_expr`.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    terms = []
    for i, c in enumerate(cols):
        x = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            bit = F.shiftright(x, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out.cast("long")


def zorder_oracle_expr(col_exprs: list[str], bits: int = 8) -> str:
    """The ANSI-SQL twin of :func:`zorder_key` (same bit plan), for
    cross-engine verification."""
    n = len(col_exprs)
    terms = []
    for i, e in enumerate(col_exprs):
        x = f"(({e}) & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(f"((({x} >> {b}) & 1) << {b * n + i})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered by the Z-order key over ``cols``:
    range-partition by the key (contiguous key ranges per file, the same
    discipline as the CDX shard layout) and sort within partitions, so
    every file's min/max footer stats are tight on all keyed columns.

    At 100 TB this is the table-maintenance job that turns a
    two-dimensional access pattern (host x epoch, surt x timestamp) into
    row-group pruning on both axes; the write is one range shuffle at
    row cardinality and nothing else.
    """
    key = zorder_key([F.col(c) for c in cols], bits)
    (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    files: DataFrame,
    part_cols: list[str],
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction planner: assign each file to a rewrite BIN
    per table partition so every bin is ~``target_bytes`` — the plan
    behind Delta OPTIMIZE / Iceberg binpack, computed as data instead of
    driver-side listing loops.  A 100 TB ingest writes millions of
    sub-target files (one per task per epoch); the compactor's planning
    pass must itself be distributed, and this one is: ONE window per
    partition (running sum over files in deterministic ``file_col``
    order), then ``bin = cum_before DIV target`` — offset-based packing,
    so every bin except a partition's last holds >= target bytes once
    its straddling file lands, and no bin exceeds target by more than
    one file (the same guarantee greedy next-fit gives, without the
    sequential scan).

    Integer arithmetic only.  Returns one row per file:
    (part_cols..., file_col, size_col, bin_idx, bin_offset) — feed a
    groupBy(part, bin_idx) to drive the rewrite jobs.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(size_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    # integer DIV/MOD, never float division: cum can pass 2^53 at scale
    return files.withColumn("_cum", cum_before).select(
        *part_cols,
        file_col,
        F.col(size_col).cast("long").alias(size_col),
        F.expr(f"_cum DIV {int(target_bytes)}").alias("bin_idx"),
        F.pmod(F.col("_cum"), F.lit(int(target_bytes))).cast("long").alias(
            "bin_offset"
        ),
    )
