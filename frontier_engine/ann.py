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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: union of n_tables hyperplane-bucket joins,
    exact cosine inside buckets only. Candidate set = docs sharing ≥1
    bucket with the query in any table."""
    cands = None
    for t in range(n_tables):
        b = hyperplane_bucket_udf(dim, n_bits, t, seed)
        c_b = corpus.select(F.col(id_col), F.col(vec_col), b(F.col(vec_col)).alias("bucket"))
        q_b = queries.select(
            F.col(query_id_col), F.col(query_vec_col), b(F.col(query_vec_col)).alias("bucket")
        )
        got = c_b.join(F.broadcast(q_b), "bucket").drop("bucket")
        cands = got if cands is None else cands.unionByName(got)
    cands = cands.dropDuplicates([query_id_col, id_col])
    scored = cands.withColumn("cosine", cosine_col(F.col(vec_col), F.col(query_vec_col)))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup detection: LSH self-join then exact cosine
    ≥ threshold. Output (id_a < id_b, cosine)."""
    pairs = None
    for t in range(n_tables):
        b = hyperplane_bucket_udf(dim, n_bits, t, seed)
        withb = corpus.select(F.col(id_col), F.col(vec_col), b(F.col(vec_col)).alias("bucket"))
        l = withb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "bucket")
        r = withb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "bucket")
        p = l.join(r, "bucket").filter(F.col("id_a") < F.col("id_b")).drop("bucket")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return (
        pairs.withColumn("cosine", cosine_col(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
