"""Cardinality sketches for frontier lineage — HyperLogLog, engine-exact.

The north-star frontier checkpoints "per-partition lineage (partition id,
host range, URLs emitted/deduped, ...)" every epoch.  Counting *distinct*
URLs per lineage cell exactly would re-shuffle the full URL set a second
time per epoch; at 10^10 URLs that is the single most expensive count in
the system.  A HyperLogLog sketch (Flajolet, Fusy, Gandouet, Meunier 2007)
gives the same census in one map-side-combinable aggregate over 2^p
registers per cell — and sketches from different epochs/partitions MERGE
by register-wise max, so lineage rolls up (partition -> host-range ->
crawl) without ever touching the URL strings again.

Everything here is ENGINE-EXACT, not merely statistically equivalent:

- the hash is the portable 60-bit md5 prefix (``textops.md5_hash60_col``)
  computable in any SQL engine, not a JVM-private hash;
- register ranks are integer bit-lengths (``length(bin(w))``), no float;
- the harmonic sum is kept as an exact BIGINT by scaling 2^-M_j by
  2^(W+1) (register weights become integers 2^(W+1-M_j)), so the sketch
  state compares bit-for-bit across engines;
- the only floats are the final estimate's one multiply + one divide
  (IEEE-identical everywhere) and libm ``ln`` in the small-range
  correction, rounded to 6 dp per the repo's libm convention.

Spark's own ``approx_count_distinct`` is also HLL but its register state
hashes with xxhash64 variants and is not reproducible outside the JVM —
useless as an auditable lineage artifact.  This one is.

Reference analogue: the reference's only cardinality control is the
SQLite PRIMARY KEY upsert (`/root/reference/db/init.sql`) — exact, single
node, and unmergeable.  SURVEY.md §2 A4 (distinct key set) is the exact
twin; this is its sub-linear, mergeable form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import md5_hash60_col

_HASH_BITS = 60


def _alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | Column,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., reg, rank_max).

    ``reg`` is the low ``p`` bits of the 60-bit portable hash; ``rank_max``
    is the max over values of (leading zeros of the remaining W=60-p bits,
    plus 1) — i.e. ``W + 1 - bitlength(w)``, with ``w == 0`` mapping to
    ``W + 1``.  This is the full sketch state: epochs/partitions merge via
    :func:`hll_merge` (register-wise max), and the estimate is read out by
    :func:`hll_estimate`.

    Plan shape at 100 TB: one hash aggregate with map-side combine — a
    billion URLs in a cell collapse to <= 2^p rows per task BEFORE the
    shuffle.  No window, no sort, no distinct.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} out of range [4, 16]")
    m = 1 << p
    w_bits = _HASH_BITS - p
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    h = md5_hash60_col(col)
    reg = (h % m).cast("long")
    w = F.shiftright(h, p)
    rank = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
        .cast("long")
    )
    return (
        df.select(*group_cols, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("rank_max"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two register tables (same ``p``): register-wise max.

    This is the whole point of the sketch: per-epoch lineage rows roll up
    to crawl-lifetime cardinality with a 2^p-row-per-cell aggregate —
    the raw URL sets are never revisited.
    """
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank_max").alias("rank_max"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Read an estimate out of a register table.

    Returns (group_cols..., v_zero, s_scaled, est):

    - ``v_zero``  — registers still at zero (drives small-range mode);
    - ``s_scaled`` — the harmonic sum as an EXACT integer,
      ``sum_j 2^(W+1-M_j)`` with zero registers contributing 2^(W+1);
      this is the engine-exact sketch fingerprint (max 2^p * 2^(W+1)
      = 2^(61) for p=8 — fits int64);
    - ``est``     — alpha_m * m^2 / sum(2^-M_j), with the standard
      small-range linear-counting correction ``m * ln(m / V)`` when
      est <= 2.5m and V > 0; rounded to 6 dp.
    """
    m = 1 << p
    w_bits = _HASH_BITS - p
    top = w_bits + 1  # scale exponent: weight_j = 2^(top - M_j)
    # alpha * m^2 * 2^top, computed once in Python and injected as the
    # same literal into both engines (see oracle) — one divide remains.
    num = _alpha(m) * m * m * (2.0 ** top)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({top} - rank_max AS INT))"
            )
        )
        .cast("long")
        .alias("s_obs"),
        F.count("*").cast("long").alias("n_obs"),
    )
    s = (
        F.col("s_obs")
        + (F.lit(m) - F.col("n_obs")) * F.shiftleft(F.lit(1).cast("long"), top)
    ).cast("long")
    v = (F.lit(m) - F.col("n_obs")).cast("long")
    e_raw = F.lit(num) / F.col("s_scaled")
    est = F.round(
        F.when(
            (e_raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
        ).otherwise(e_raw),
        6,
    )
    return (
        agg.select(*group_cols, v.alias("v_zero"), s.alias("s_scaled"))
        .withColumn("est", est)
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | Column,
    p: int = 8,
) -> DataFrame:
    """One-shot per-group distinct estimate: registers -> estimate."""
    return hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)


def hll_oracle_sql(
    source_sql: str, group_cols: list[str], value_expr: str, p: int = 8
) -> str:
    """The ANSI-SQL twin of :func:`hll_distinct` (DuckDB dialect), built
    from the same constants so both engines run the identical formula."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    top = w_bits + 1
    num = repr(_alpha(m) * m * m * (2.0 ** top))
    g = ", ".join(group_cols)
    return f"""
        WITH hashed AS (
            SELECT {g},
                   CAST('0x' || substr(md5({value_expr}), 1, 15) AS BIGINT) AS h
            FROM ({source_sql})),
        regs AS (
            SELECT {g}, h % {m} AS reg,
                   CAST(max(CASE WHEN h // {m} = 0 THEN {top}
                            ELSE {top} - length(bin(h // {m})) END) AS BIGINT)
                       AS rank_max
            FROM hashed GROUP BY {g}, reg),
        agg AS (
            SELECT {g},
                   CAST(sum((CAST(1 AS BIGINT) << ({top} - rank_max))) AS BIGINT) AS s_obs,
                   CAST(count(*) AS BIGINT) AS n_obs
            FROM regs GROUP BY {g}),
        fin AS (
            SELECT {g},
                   CAST({m} - n_obs AS BIGINT) AS v_zero,
                   CAST(s_obs + ({m} - n_obs) * (CAST(1 AS BIGINT) << {top})
                        AS BIGINT) AS s_scaled
            FROM agg)
        SELECT {g}, v_zero, s_scaled,
               round(CASE WHEN {num} / s_scaled <= {2.5 * m!r} AND v_zero > 0
                          THEN {float(m)!r} * ln({float(m)!r} / v_zero)
                          ELSE {num} / s_scaled END, 6) AS est
        FROM fin
    """


# ------------------------------------------------- count-min sketch


def _cms_row_cols(h: Column, d: int, w: int) -> Column:
    """(row, col) pairs for one hash: row j probes bit-slice j*8 of the
    portable hash, mod w.  d is a plan-time constant, so the fan-out is
    unrolled into a literal array (shiftright needs a literal shift)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("row"),
                (F.shiftright(h, j * 8) % w).cast("long").alias("col"),
            )
            for j in range(d)
        ]
    )


def cms_cells(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | Column,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Per-group count-min sketch (Cormode & Muthukrishnan 2005): the
    frequency companion to the HLL cardinality sketch.  d x w integer
    counters per cell answer "how often did key k occur?" with one-sided
    error (never an undercount, overcount <= 2N/w w.h.p.) in O(d*w)
    state — the bounded-memory per-epoch lineage form of a per-host key
    census that an exact groupBy would re-shuffle in full every epoch.

    The d row-hashes are disjoint 8-bit slices of the portable 60-bit
    md5 hash (``w`` must be <= 256 so slices stay independent and the
    oracle can reproduce them with integer div/mod) — no JVM-private
    hashing, every counter is an exact BIGINT, and sketches MERGE by
    cell-wise sum (:func:`cms_merge`).

    Returns (group_cols..., row, col, cnt), only non-zero cells.
    Plan shape: one explode (d rows per value — constant fan-out) into
    one hash aggregate with map-side combine; a billion occurrences of a
    hot key collapse to d rows per task before the shuffle.
    """
    if not 1 <= d <= 7:
        raise ValueError(f"d={d} out of range [1, 7]")
    if not 2 <= w <= 256:
        raise ValueError(f"w={w} out of range [2, 256]")
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    h = md5_hash60_col(col)
    rows = F.explode(_cms_row_cols(h, d, w))
    return (
        df.select(*group_cols, rows.alias("rc"))
        .select(*group_cols, "rc.row", "rc.col")
        .groupBy(*group_cols, "row", "col")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two cell tables (same d, w): cell-wise sum — epochs and
    partitions roll up without revisiting the keys."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_lookup(
    cells: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    key_col: str = "key",
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-query the sketch: est(k) = min_j cnt[j, h_j(k)].

    ``probes`` is (group_cols..., key_col).  Returns the probes with an
    ``est`` column (BIGINT, >= true count).  The probe side fans out d
    rows per key and joins the cell table on (group, row, col) — the
    sketch table is <= d*w rows per group, broadcastable for any real
    group count.
    """
    h = md5_hash60_col(F.col(key_col))
    rows = F.explode(_cms_row_cols(h, d, w))
    fan = probes.select(*group_cols, key_col, rows.alias("rc")).select(
        *group_cols, key_col, "rc.row", "rc.col"
    )
    return (
        fan.join(cells, [*group_cols, "row", "col"], "left")
        .groupBy(*group_cols, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


# ------------------------------------------------- KMV (k-minimum values)

_KMV_RANGE = float(1 << _HASH_BITS)  # hash space size, 2^60


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | Column,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch (Bar-Yossef et al. RANDOM'02 / Beyer et al.
    SIGMOD'07): the k smallest distinct portable 60-bit hashes of the
    values, sorted ascending.  What HLL cannot do and KMV can: sketches
    of two groups COMPOSE under union AND intersection, so pairwise
    audience/outlink overlap between hosts is answerable from k*8 bytes
    per host instead of re-shuffling the raw sets — the related-host /
    mirror-candidate primitive at 10^10 URLs.

    ENGINE-EXACT like the HLL here: portable md5-prefix hash, integer
    state, floats only in the final estimate division.

    Plan shape: one map-side-combinable distinct over (group, h), then a
    rank window per group (same shape as topk_per_group; the histogram
    precut pattern applies if a group's distinct set is pathological).
    Output: (group_cols..., sketch array<long> ascending, n_sk).
    """
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    from .textops import md5_hash60_col

    hashed = df.select(*group_cols, md5_hash60_col(col).alias("_h")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return kept.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_sk"),
    )


def kmv_estimate_col(sketch: Column, n_sk: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV sketch: exact when the group
    had fewer than k distinct values (the sketch IS the set), else the
    standard unbiased (k-1) * |hash space| / h_(k)."""
    return F.when(
        n_sk < k, n_sk.cast("double")
    ).otherwise(F.lit((k - 1) * _KMV_RANGE) / F.element_at(sketch, k))


def kmv_pair_overlap(sketches: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """All-pairs set-overlap estimates from per-group KMV sketches.

    For each pair (a < b): the merged sketch is the k smallest of
    ``union(sketch_a, sketch_b)``; with L = |merged| (< k only when the
    union is exact), the Jaccard estimate is |merged ∩ a ∩ b| / L, the
    union estimate follows the same exact-below-k rule as
    :func:`kmv_estimate_col`, and intersection = jaccard * union.  This
    is sketch algebra over arrays — the raw value sets are never
    revisited, and the sketch table (k longs per group) broadcasts, so
    the pair join is shuffle-free at any realistic host count.
    """
    a = sketches.select(
        F.col(group_col).alias("ga"),
        F.col("sketch").alias("sa"),
        F.col("n_sk").alias("na"),
    )
    b = sketches.select(
        F.col(group_col).alias("gb"),
        F.col("sketch").alias("sb"),
        F.col("n_sk").alias("nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
    merged_full = F.array_sort(F.array_union(F.col("sa"), F.col("sb")))
    merged = F.slice(merged_full, 1, k)
    L = F.size(merged).cast("long")
    shared = F.size(
        F.array_intersect(merged, F.array_intersect(F.col("sa"), F.col("sb")))
    ).cast("long")
    union_est = F.when(L < k, L.cast("double")).otherwise(
        F.lit((k - 1) * _KMV_RANGE) / F.element_at(merged, k)
    )
    jacc = shared.cast("double") / L.cast("double")
    return pairs.select(
        F.col("ga"),
        F.col("gb"),
        kmv_estimate_col(F.col("sa"), F.col("na"), k).alias("est_a"),
        kmv_estimate_col(F.col("sb"), F.col("nb"), k).alias("est_b"),
        L.alias("merged_n"),
        shared.alias("shared_n"),
        union_est.alias("union_est"),
        jacc.alias("jacc_est"),
        (jacc * union_est).alias("inter_est"),
    )


def kmv_merge(sketches: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge KMV sketch rows per group — union the epochs'/partitions'
    sketch tables and call this once: the merged sketch is the k smallest
    of the distinct union, which is EXACTLY the sketch of the unioned raw
    sets (KMV's lossless-merge property — what makes per-epoch lineage
    sketches roll up to per-crawl ones without revisiting URLs).  One
    map-side-combinable aggregate over tiny arrays."""
    merged = sketches.groupBy(*group_cols).agg(
        F.flatten(F.collect_list("sketch")).alias("_all")
    )
    m = F.slice(F.array_sort(F.array_distinct(F.col("_all"))), 1, k)
    return merged.select(
        *group_cols, m.alias("sketch"), F.size(m).cast("long").alias("n_sk")
    )
