"""Similarity search over embedding columns (array<float>).

Two tiers:
- brute-force cosine top-k — the exactness baseline; dot products as
  JVM-side ``zip_with``/``aggregate`` expressions (no Python in the loop),
  queries broadcast, corpus streamed: one pass, no corpus shuffle.
- LSH (random-hyperplane) bucketed top-k — the scale path: sign-bit
  sketches put near vectors in shared buckets; exact cosine is computed
  only inside buckets. Recall is tunable via n_tables × n_bits.

At 100 TB the brute-force variant stays viable per-query-batch because it
is a single broadcast-join scan (no state), while the LSH variant cuts the
scanned fraction; an IVF variant would swap the bucketer for a k-means
assignment joined from a small broadcast centroid table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast(queries) ⨯ corpus → window.

    Output: (query_id, vec_id, cosine, rank). Ties broken by id — fully
    deterministic.
    """
    q = queries.select(F.col(query_id_col), F.col(query_vec_col))
    crossed = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    scored = crossed.withColumn(
        "cosine", cosine_col(F.col(vec_col), F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hyperplane_bucket_udf(dim: int, n_bits: int = 12, table: int = 0, seed: int = 42):
    """pandas UDF: embedding → int bucket id (sign bits vs random planes).

    One matrix multiply per Arrow batch — no per-row Python.
    """
    rng = np.random.RandomState(seed + 1000 * table)
    planes = rng.normal(size=(dim, n_bits)).astype(np.float64)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy())
        signs = (mat @ planes) > 0
        return pd.Series((signs @ weights).astype(np.int64), index=vec.index)

    return bucket


def hyperplane_buckets_udf(dim: int, n_bits: int, n_tables: int, seed: int = 42):
    """pandas UDF: embedding → array of one bucket id per LSH table.

    All tables in ONE matrix multiply per Arrow batch (the planes of every
    table are stacked), so an n_tables LSH pass costs one UDF evaluation
    and one shuffle instead of n_tables of each.
    """
    planes = np.hstack(
        [
            np.random.RandomState(seed + 1000 * t).normal(size=(dim, n_bits))
            for t in range(n_tables)
        ]
    ).astype(np.float64)  # (dim, n_tables*n_bits)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy())
        signs = ((mat @ planes) > 0).reshape(len(mat), -1, n_bits)
        out = signs @ weights  # (rows, n_tables)
        return pd.Series(list(out.astype(np.int64)), index=vec.index)

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int | None = None,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table hyperplane LSH, exact
    cosine inside buckets only. Candidate set = docs sharing ≥1 bucket
    with the query in any table.

    ``n_bits`` DEFAULTS to None = derive the bucket count from corpus size
    (:func:`auto_bits` — one count job, amortizable on a cached corpus):
    a fixed width taken at 100× the corpus quietly turns the per-bucket
    joins quadratic. Pass an explicit int only when the corpus size is
    known and pinned (the oracle-checked test queries do)."""
    if n_bits is None:
        n_bits = auto_bits(corpus.count())
    # one stacked-planes UDF pass per side and ONE broadcast join keyed on
    # (table, bucket) — not n_tables UDF passes + joins + a union
    b = hyperplane_buckets_udf(dim, n_bits, n_tables, seed)
    c_b = corpus.select(
        F.col(id_col), F.col(vec_col), F.posexplode(b(F.col(vec_col))).alias("table", "bucket")
    )
    q_b = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.posexplode(b(F.col(query_vec_col))).alias("table", "bucket"),
    )
    cands = (
        c_b.join(F.broadcast(q_b), ["table", "bucket"])
        .drop("table", "bucket")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.withColumn("cosine", cosine_col(F.col(vec_col), F.col(query_vec_col)))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    sample_rows: int = 4096,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic k-means centroids trained on a fixed sample.

    Training on a bounded sample then broadcasting centroids is the
    standard IVF recipe at any scale (the full corpus is only ever
    ASSIGNED, one matrix multiply per Arrow batch). Sample = first
    ``sample_rows`` ordered by ``xxhash64(id)`` — deterministic AND
    unbiased (id order can correlate with insertion time/source; the hash
    order cannot), init = first ``n_centroids`` sample vectors — no RNG,
    so rebuilds are identical.
    """
    sample = np.vstack(
        [
            r[vec_col]
            for r in corpus.orderBy(
                F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc()
            )
            .limit(sample_rows)
            .collect()
        ]
    ).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cents = sample[:n_centroids].copy()
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """pandas UDF: embedding → array of the n_probe nearest centroid ids
    (one matrix multiply per Arrow batch)."""
    cents = centroids.astype(np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cents.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top), index=vec.index)

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in ONE inverted list (their
    nearest centroid); queries probe their ``n_probe`` nearest lists; exact
    cosine only inside probed lists. The scan fraction is ~n_probe/n_lists.
    """
    c_assign = ivf_assign_udf(centroids, 1)
    q_assign = ivf_assign_udf(centroids, n_probe)
    c = corpus.select(
        F.col(id_col), F.col(vec_col),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cluster"),
    )
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col),
        F.explode(q_assign(F.col(query_vec_col))).alias("cluster"),
    )
    cands = c.join(F.broadcast(q), "cluster").drop("cluster")
    scored = cands.withColumn("cosine", cosine_col(F.col(vec_col), F.col(query_vec_col)))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .dropDuplicates([query_id_col, id_col])
        .select(query_id_col, id_col, "cosine", "rank")
    )


def auto_bits(n_rows: int, target_bucket: int = 1024, min_bits: int = 4, max_bits: int = 24) -> int:
    """Derive hyperplane-LSH bit width from corpus size so expected bucket
    occupancy stays ~``target_bucket`` rows: ``n_bits ≈ log2(n/target)``.

    A fixed bit width makes the intra-bucket self-join quadratic in corpus
    size (N²/2^bits); deriving it keeps per-bucket work bounded as the
    corpus grows — the difference between sf0.1 and 100 TB.
    """
    import math

    if n_rows <= target_bucket:
        return min_bits
    return max(min_bits, min(max_bits, math.ceil(math.log2(n_rows / target_bucket))))


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int | None = None,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    target_bucket: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-dup detection: LSH self-join then exact cosine
    ≥ threshold. Output (id_a < id_b, cosine).

    ``n_bits`` DEFAULTS to None = derive the bucket count from the corpus
    size via :func:`auto_bits` (one count job — run it on the cached or
    written corpus), keeping the intra-bucket self-join bounded as the
    corpus grows. Pass an explicit int only for pinned-size corpora.
    """
    if n_bits is None:
        n_bits = auto_bits(corpus.count(), target_bucket)
    # ids-ONLY through bucketing and the cross-table dedup: a candidate
    # pair is 16 bytes instead of 2 x dim doubles (~60x less shuffle at
    # dim=64), and a pair colliding in several tables is deduped BEFORE
    # its cosine is computed rather than after. All tables hash in ONE
    # stacked-planes UDF pass. Round 6: in-bucket pairs come from a
    # (table, bucket)-keyed AGGREGATE + local pair explode over the
    # sorted id array, not a self-join — a self-join's two sides each
    # re-evaluate the hashing UDF chain (AQE stage reuse does not fire
    # across self-join sides; measured on the sf1.0 dedup queries), and
    # the aggregate ships each id once per table instead of twice.
    b = hyperplane_buckets_udf(dim, n_bits, n_tables, seed)
    withb = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(b(F.col(vec_col))).alias("table", "bucket"),
    )
    buckets = (
        withb.groupBy("table", "bucket")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    n = F.size("ids")
    # ids sorted asc, so successor pairing emits each unordered pair once
    # with id_a < id_b — same output convention as the old self-join
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # vectors joined back to the surviving deduped candidates only, with
    # the L2 norm computed ONCE PER VECTOR here rather than once per pair:
    # cosine = dot/(n_a*n_b) is the same expression tree per pair as the
    # old cosine_col (identical doubles), at a third of the fold work
    va = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        norm_col(F.col(vec_col)).alias("n_a"),
    )
    vb = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        norm_col(F.col(vec_col)).alias("n_b"),
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", dot_col(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def quantize_sq8_cols(vec: Column) -> tuple[Column, Column, Column]:
    """Symmetric scalar int8 quantization of one embedding (FAISS's public
    SQ8 scheme): per-vector scale ``s = max|x| / 127``, codes
    ``q_i = round(x_i / s)`` ∈ [−127, 127], plus the exact L2 norm of the
    ORIGINAL vector. Returns ``(codes, scale, norm)`` columns — all JVM
    expressions, no Python. A zero vector quantizes to all-zero codes
    with scale 0 (its approximate score against anything is 0, matching
    its true cosine's undefined-as-0 handling upstream)."""
    mx = F.aggregate(
        F.transform(vec, lambda x: F.abs(x)),
        F.lit(0.0).cast("double"),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = mx / F.lit(127.0)
    codes = F.when(scale > 0, F.transform(vec, lambda x: F.round(x / scale).cast("int"))).otherwise(
        F.transform(vec, lambda x: F.lit(0))
    )
    return codes, scale, norm_col(vec)


def int_dot_col(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int-code arrays (int64 fold —
    64-dim int8·int8 peaks at 64·127² ≈ 10⁶, nowhere near overflow)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Scalar-quantized (SQ8) cosine top-k with exact rerank — the
    memory-bound scale path: score the scan against 4×-smaller int8 codes
    (approx cosine = int_dot · s_c · s_q / (‖c‖·‖q‖)), keep a
    ``shortlist_factor × k`` shortlist per query, then rerank ONLY the
    shortlist with exact fp cosine. At 100 TB the scan's byte traffic —
    the binding resource for brute-force ANN — drops ~4× (codes + two
    doubles per vector instead of fp32/fp64 arrays), while the exact
    rerank touches just ``shortlist·n_queries`` original vectors via an
    id join. SQ8's max-abs error bound keeps true neighbors inside a
    4k shortlist except under adversarial distributions; the query layer
    verifies equality against the exact oracle on its corpora (same
    containment-proof pattern as the LSH/IVF tiers).

    Output: (query_id, vec_id, cosine, rank) — exact cosines, identical
    schema and tie-break (id asc) to :func:`brute_force_topk`."""
    codes, scale, norm = quantize_sq8_cols(F.col(vec_col))
    cq = corpus.select(
        F.col(id_col), F.col(vec_col),
        codes.alias("_cc"), scale.alias("_cs"), norm.alias("_cn"),
    )
    qcodes, qscale, qnorm = quantize_sq8_cols(F.col(query_vec_col))
    qq = queries.select(
        F.col(query_id_col),
        qcodes.alias("_qc"), qscale.alias("_qs"), qnorm.alias("_qn"),
    )
    approx = (
        cq.drop(vec_col)
        .crossJoin(F.broadcast(qq))
        .withColumn(
            "_approx",
            F.when(
                (F.col("_cn") > 0) & (F.col("_qn") > 0),
                int_dot_col(F.col("_cc"), F.col("_qc")).cast("double")
                * F.col("_cs") * F.col("_qs") / (F.col("_cn") * F.col("_qn")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w_short = Window.partitionBy(query_id_col).orderBy(
        F.col("_approx").desc(), F.col(id_col).asc()
    )
    shortlist = (
        approx.withColumn("_srank", F.row_number().over(w_short))
        .filter(F.col("_srank") <= shortlist_factor * k)
        .select(query_id_col, id_col)
    )
    # exact rerank: join the shortlist ids back to the original vectors
    rerank = (
        shortlist.join(corpus.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(
            F.broadcast(queries.select(F.col(query_id_col), F.col(query_vec_col))),
            query_id_col,
        )
        .withColumn("cosine", cosine_col(F.col(vec_col), F.col(query_vec_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering then within-cluster pairwise
    cosine — returns ``(id, cluster, keep)`` where ``keep`` is false for
    every row with a LOWER-id cluster-mate at cosine >= threshold
    (deterministic keep-first; the paper keeps one random member per
    duplicate neighborhood, this engine keeps min id so reruns are
    byte-identical).

    This is the embedding-space generalization of MinHash near-dup: web
    corpora carry huge volumes of semantically-identical-but-lexically-
    distinct text (templated product pages, syndicated articles) that
    token-level dedup never pairs up; SemDeDup removed ~50% of LAION/C4
    class corpora at negligible quality cost.

    Scale shape: assignment is one broadcast-centroid pandas-UDF pass
    (matrix multiply per Arrow batch, as :func:`ivf_topk`); the pairwise
    stage shuffles on ``cluster`` and is quadratic only WITHIN a cluster
    — the paper's own cost model; grow ``n_centroids`` with the corpus
    (as :func:`auto_bits` does for LSH) to hold per-cluster work
    bounded. No global sort, no all-pairs: the duplicate-id set is a
    cluster-keyed self-join projecting ids only, and verdicts join back
    by id.
    """
    # Round 6: in-cluster pairs come from a cluster-keyed AGGREGATE + local
    # pair explode rather than a cluster self-join — the self-join's two
    # sides (and the final keep join's third reference) each re-ran the
    # assignment UDF chain (AQE stage reuse does not fire across self-join
    # sides; measured on the near-dup family). The carried member array is
    # bounded by cluster size, which SemDeDup's own cost model bounds by
    # growing n_centroids with the corpus. Norms are computed once per
    # VECTOR in the aggregate input; cosine per pair is the identical
    # dot/(n_a*n_b) expression tree, so verdicts are bit-unchanged.
    assign = ivf_assign_udf(centroids, 1)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("n"),
        F.element_at(assign(F.col(vec_col)), 1).alias("cluster"),
    )
    grouped = c.groupBy("cluster").agg(
        F.sort_array(F.collect_list(F.struct("id", "v", "n"))).alias("members")
    )
    m = F.size("members")
    pair_structs = F.flatten(
        F.transform(
            "members",
            lambda x, i: F.transform(
                F.slice("members", i + F.lit(2), m - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    dropped = (
        grouped.filter(m >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.a.v").alias("v_a"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.b.v").alias("v_b"),
            F.col("p.b.n").alias("n_b"),
        )
        .withColumn(
            "cosine", dot_col(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        grouped.select("cluster", F.explode("members").alias("mm"))
        .select("cluster", F.col("mm.id").alias("id"))
        .join(dropped, "id", "left")
        .select(
            "id",
            "cluster",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def margin_mine(
    x_df: DataFrame,
    y_df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin_threshold_ppm: int = 1_020_000,
) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER recipe): for every vector x in the X pool, its best
    match y in the Y pool scored by the RATIO margin
        margin(x, y) = cos(x, y) / ((avg_k(x->Y) + avg_k(y->X)) / 2)
    — raw cosine is miscalibrated across hubs (some vectors are near
    everything), so the score normalizes by both endpoints' average
    top-k neighborhood similarity and a pair is "mined" only when it
    stands OUT of both neighborhoods (margin > ~1.02).

    Engine-exact arithmetic: cosines come from the same IEEE fold as
    :func:`brute_force_topk`; each is fixed-pointed to c6 =
    floor(cos*1e6) (bigint), the top-k averages become exact integer
    sums, and margin_ppm = (2e6*k*c6) div (sum_x + sum_y) is one
    integral division — order-free, bit-identical in any engine, no
    float accumulation anywhere. margin_ppm is NULL when the best
    cosine is negative or the denominator is non-positive (margin
    undefined).

    Plan shape at 100 TB: X is the mining batch (broadcast); one scan
    of Y computes every cosine, then two row_number windows (by x, by
    y) rank the SAME scored relation both directions — two shuffles of
    |X|x|Y| scored ids, never a second pass over the vectors. The
    per-endpoint sums are map-side-combined aggregates joined back on
    the endpoint keys.

    Output: (query_id, vec_id, cosine r4, margin_ppm, mined) — one row
    per x (its rank-1 y), ties broken by id.
    """
    x = x_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    y = y_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_ev"))
    scored = (
        y.crossJoin(F.broadcast(x))
        .withColumn("cosine", cosine_col(F.col("_ev"), F.col("_qv")))
        .withColumn("c6", F.floor(F.col("cosine") * 1000000.0).cast("long"))
        .select("query_id", "vec_id", "cosine", "c6")
    )
    wx = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    wy = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("query_id").asc()
    )
    ranked = scored.withColumn("rank_x", F.row_number().over(wx)).withColumn(
        "rank_y", F.row_number().over(wy)
    )
    ranked = ranked.persist()
    ax = (
        ranked.filter(F.col("rank_x") <= k)
        .groupBy("query_id")
        .agg(F.sum("c6").alias("ax_sum"), F.count("*").alias("cx"))
    )
    ay = (
        ranked.filter(F.col("rank_y") <= k)
        .groupBy("vec_id")
        .agg(F.sum("c6").alias("ay_sum"), F.count("*").alias("cy"))
    )
    # margin = 2*cos / (ax_sum/cx + ay_sum/cy), as one integral division
    # over cross-multiplied exact ints (cx/cy are the ACTUAL neighborhood
    # sizes — a pool smaller than k must divide by what it has).
    out = (
        ranked.filter(F.col("rank_x") == 1)
        .join(ax, "query_id")
        .join(ay, "vec_id")
        .withColumn(
            "margin_ppm",
            F.expr(
                "CASE WHEN c6 >= 0 AND ax_sum * cy + ay_sum * cx > 0 "
                "THEN (2000000 * c6 * cx * cy) div (ax_sum * cy + ay_sum * cx) END"
            ).cast("long"),
        )
        .withColumn("mined", F.col("margin_ppm") >= F.lit(margin_threshold_ppm))
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        "margin_ppm",
        "mined",
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    pos_id_col: str = "vec_id",
) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR / ANCE
    recipe, Karpukhin et al. 2020 / Xiong et al. 2021): per training
    query, the highest-cosine corpus docs NOT judged relevant — the
    negatives that actually move a dense retriever, vs. the random
    negatives in-batch sampling gives you.

    ``positives`` is the qrels side: (query_id, vec_id) pairs to
    exclude. The exclusion is an anti-join on the SCORED PAIRS — never a
    post-filter on a fixed-size top window, which silently under-fills
    whenever a query has many positives ranked high (exactly the queries
    hard negatives matter for). Exactness matches
    :func:`brute_force_topk`: same broadcast-queries ⨯ streamed-corpus
    scan, same JVM-side ``zip_with`` cosine, ties broken by id.

    Scale shape: one corpus scan (queries and qrels both broadcast —
    training-query batches are small by construction), zero corpus
    shuffle before the per-query top-k window, whose input is already
    pair-pruned. Swap the scorer for the LSH/IVF bucketed variants when
    the query batch outgrows a broadcast.
    """
    q = queries.select(F.col(query_id_col), F.col(query_vec_col))
    pos = positives.select(
        F.col(query_id_col), F.col(pos_id_col).alias(id_col)
    ).distinct()
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", cosine_col(F.col(vec_col), F.col(query_vec_col)))
        .join(F.broadcast(pos), [query_id_col, id_col], "left_anti")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    sample_rows: int = 4096,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic product-quantization codebooks (Jégou et al., TPAMI
    2011): split the (L2-normalized) vector into ``m`` contiguous
    subspaces of ``dim // m`` dims and run per-subspace k-means with
    ``n_codes`` centroids on a bounded sample.

    Same determinism recipe as :func:`train_ivf_centroids` — sample =
    first ``sample_rows`` rows ordered by ``xxhash64(id)`` (unbiased wrt
    insertion order, identical across rebuilds), init = the sample's
    first ``n_codes`` subvectors, fixed ``iters`` Lloyd iterations,
    argmin ties to the lowest code — so codebooks are reproducible
    byte-for-byte with no RNG. Returns shape ``(m, n_codes, dim // m)``.

    Assignment metric is L2 on normalized vectors (the standard PQ
    formulation); the ADC score downstream then approximates the inner
    product, which equals cosine on normalized inputs.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = np.vstack(
        [
            r[vec_col]
            for r in corpus.orderBy(
                F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc()
            )
            .limit(sample_rows)
            .collect()
        ]
    ).astype(np.float64)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sample = sample / norms
    books = np.zeros((m, n_codes, dsub), dtype=np.float64)
    for s in range(m):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        cents = sub[:n_codes].copy()
        for _ in range(iters):
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)  # ties -> lowest code, deterministic
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_encode_udf(codebooks: np.ndarray):
    """pandas UDF: embedding → ``array<int>`` of ``m`` PQ codes.

    L2-normalizes the vector, then per subspace picks the nearest
    codebook entry (squared-L2 argmin, ties to the lowest code). One
    ``(batch × n_codes)`` matmul per subspace per Arrow batch — no
    per-row Python.
    """
    books = codebooks.astype(np.float64)
    m, n_codes, dsub = books.shape
    b_sq = [(books[s] * books[s]).sum(axis=1)[None, :] for s in range(m)]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        codes = np.empty((len(mat), m), dtype=np.int32)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ books[s].T)
                + b_sq[s]
            )
            codes[:, s] = d2.argmin(axis=1).astype(np.int32)
        return pd.Series(list(codes), index=vec.index)

    return encode


def pq_lut_udf(codebooks: np.ndarray):
    """pandas UDF: query vector → flattened ADC lookup table
    (``array<double>`` of ``m · n_codes``): entry ``s·n_codes + c`` is the
    inner product of the query's (normalized) subvector ``s`` with
    codebook entry ``c``. Computed once per QUERY — the corpus scan then
    scores each row with ``m`` array lookups, never a dot product.
    """
    books = codebooks.astype(np.float64)
    m, n_codes, dsub = books.shape

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        out = np.empty((len(mat), m * n_codes), dtype=np.float64)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            out[:, s * n_codes : (s + 1) * n_codes] = sub @ books[s].T
        return pd.Series(list(out), index=vec.index)

    return lut


def pq_adc_col(codes: Column, lut: Column, m: int, n_codes: int) -> Column:
    """ADC (asymmetric distance computation) score as a pure JVM
    expression: ``sum_s lut[s·n_codes + codes[s]]`` — ``m`` 1-based
    ``element_at`` lookups folded with ``aggregate``. The scan side
    touches only the code bytes; no floats move per corpus row beyond
    the fold."""
    idx = F.sequence(F.lit(0), F.lit(m - 1))
    return F.aggregate(
        F.zip_with(
            codes,
            idx,
            lambda c, s: F.element_at(lut, (s * F.lit(n_codes) + c + F.lit(1)).cast("int")),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    shortlist_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Product-quantized cosine top-k with exact rerank — the third
    quantization tier beside :func:`sq8_topk` (4× compression) and
    :func:`ivf_topk` (scan pruning): PQ compresses each corpus vector to
    ``m`` small codes (64-dim fp32 → 8 bytes at m=8 is 32×), the scan
    scores rows via the per-query ADC lookup table as a JVM fold (no
    dot products, no Python), a ``shortlist_factor × k`` per-query
    shortlist survives, and ONLY the shortlist's original vectors are
    re-read for the exact-cosine rerank.

    At 100 TB this is the memory-bandwidth play: ADC makes the binding
    scan read ~8-16 bytes/vector instead of 256-512, and composes with
    IVF (encode only probed lists) for the classic IVFPQ layout. Queries
    and their LUTs are broadcast; the only shuffles are the two
    per-query top windows over (id, score) pairs.

    Output: (query_id, vec_id, cosine, rank) — exact cosines, identical
    schema and id-asc tie-break to :func:`brute_force_topk`."""
    m, n_codes, _ = codebooks.shape
    encode = pq_encode_udf(codebooks)
    lut = pq_lut_udf(codebooks)
    cq = corpus.select(F.col(id_col), encode(F.col(vec_col)).alias("_codes"))
    qq = queries.select(
        F.col(query_id_col), lut(F.col(query_vec_col)).alias("_lut")
    )
    approx = (
        cq.crossJoin(F.broadcast(qq))
        .withColumn("_adc", pq_adc_col(F.col("_codes"), F.col("_lut"), m, n_codes))
    )
    w_short = Window.partitionBy(query_id_col).orderBy(
        F.col("_adc").desc(), F.col(id_col).asc()
    )
    shortlist = (
        approx.withColumn("_srank", F.row_number().over(w_short))
        .filter(F.col("_srank") <= shortlist_factor * k)
        .select(query_id_col, id_col)
    )
    rerank = (
        shortlist.join(corpus.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(
            F.broadcast(queries.select(F.col(query_id_col), F.col(query_vec_col))),
            query_id_col,
        )
        .withColumn("cosine", cosine_col(F.col(vec_col), F.col(query_vec_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivfadc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    n_probe: int = 3,
    shortlist_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVFADC (Jégou et al., TPAMI 2011 §IV): the standard billion-vector
    layout — coarse IVF routing composed with PQ/ADC scoring, then exact
    rerank. :func:`ivf_topk` prunes WHICH rows are scanned
    (~n_probe/n_lists of the corpus); :func:`pq_topk` shrinks WHAT the
    scan reads (m code bytes per vector instead of the float vector);
    this composes both: corpus rows carry (cluster, pq_codes), queries
    probe their ``n_probe`` nearest lists, candidates inside probed lists
    are scored with the per-query ADC lookup-table fold (pure JVM
    ``element_at`` arithmetic — no dot products, no Python), a
    ``shortlist_factor × k`` shortlist survives, and only the shortlist's
    original vectors are re-read for the exact-cosine rerank.

    At 10^10 vectors the probe join is the partition-pruning play (the
    corpus would be written bucketed/partitioned by cluster id, so
    non-probed lists are never read) and ADC is the memory-bandwidth
    play; queries + LUTs are broadcast. Codes here quantize the raw
    (normalized) vector, not the IVF residual — residual encoding needs
    per-list codebook training which buys precision only below the exact
    rerank's noise floor at these list counts; the rerank makes the
    final scores exact either way.

    Output: (query_id, vec_id, cosine, rank) — exact cosines, id-asc
    tie-break, schema-identical to :func:`brute_force_topk`.
    """
    m, n_codes, _ = codebooks.shape
    c_assign = ivf_assign_udf(centroids, 1)
    q_assign = ivf_assign_udf(centroids, n_probe)
    encode = pq_encode_udf(codebooks)
    lut = pq_lut_udf(codebooks)
    c = corpus.select(
        F.col(id_col),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cluster"),
        encode(F.col(vec_col)).alias("_codes"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.explode(q_assign(F.col(query_vec_col))).alias("cluster"),
        lut(F.col(query_vec_col)).alias("_lut"),
    )
    # a corpus row lives in exactly one list and a query's probed lists are
    # distinct, so each (query, vec) candidate appears at most once
    approx = (
        c.join(F.broadcast(q), "cluster")
        .withColumn("_adc", pq_adc_col(F.col("_codes"), F.col("_lut"), m, n_codes))
    )
    w_short = Window.partitionBy(query_id_col).orderBy(
        F.col("_adc").desc(), F.col(id_col).asc()
    )
    shortlist = (
        approx.withColumn("_srank", F.row_number().over(w_short))
        .filter(F.col("_srank") <= shortlist_factor * k)
        .select(query_id_col, id_col)
    )
    rerank = (
        shortlist.join(corpus.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(
            F.broadcast(queries.select(F.col(query_id_col), F.col(query_vec_col))),
            query_id_col,
        )
        .withColumn("cosine", cosine_col(F.col(vec_col), F.col(query_vec_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def label_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vector as ONE map-side-combinable aggregate.

    ``posexplode`` the vector column and average per ``(label, position)``
    — the partial aggregate a 1000-executor cluster combines map-side, so
    the shuffle carries at most ``n_labels × dim`` cells per partition no
    matter how many vectors feed it. Returns a tiny DataFrame
    ``(label, centroid: array<double>)`` — n_labels rows, broadcast-sized
    by construction.
    """
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cells = (
        vectors.select(F.col(label_col).alias("clabel"), F.posexplode(cast))
        .groupBy("clabel", "pos")
        .agg(F.avg("col").alias("m"))
    )
    return cells.groupBy("clabel").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("m")))
        ).alias("_pm")
    ).select(
        "clabel", F.transform(F.col("_pm"), lambda s: s["m"]).alias("centroid")
    )


def centroid_classify(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-class-centroid (Rocchio) classification over an embedding
    column, reported as a confusion census ``(gold, pred, n_vecs)``.

    The pseudo-labeling / topic-routing staple of training-data curation:
    average the embeddings of each labeled class, then assign every
    vector to the class whose centroid is nearest by cosine — the
    cheapest usable classifier over a labeled seed set, and the standard
    probe for "are these labels even separable in embedding space?"
    before spending on a trained head.

    Physical plan, in order: centroids are :func:`label_centroids` (one
    combinable aggregate, ``n_labels × dim`` cells); scoring is a
    broadcast nested-loop join of the corpus against the n_labels-row
    centroid table with cosine as a JVM-side ``zip_with``/``aggregate``
    expression (no Python, no window); the per-vector argmax is a
    ``max_by`` over a ``(cosine, -label)`` struct — map-side combinable,
    deterministic under exact ties (smallest label wins) — and the final
    confusion rollup is the only shuffle that ever touches corpus
    cardinality, at ``n_labels²`` output rows.
    """
    cents = F.broadcast(label_centroids(vectors, id_col, vec_col, label_col))
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    v = vectors.select(
        F.col(id_col).alias("_vid"),
        F.col(label_col).alias("gold"),
        cast.alias("_v"),
    )
    scored = v.crossJoin(cents).withColumn(
        "_cos", cosine_col(F.col("_v"), F.col("centroid"))
    )
    best = scored.groupBy("_vid", "gold").agg(
        F.max_by(
            "clabel", F.struct(F.col("_cos"), (-F.col("clabel")).alias("nl"))
        ).alias("pred")
    )
    return (
        best.groupBy("gold", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    )
