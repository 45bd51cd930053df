"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every operator family from SURVEY.md §2 over the
driver-provided tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
EVERY query, including the approximate/sketch ops (MinHash/SimHash/LSH/IVF/
fingerprint/multimodal) — each of those is designed so its output is
deterministically equal to an exact SQL recomputation on the fixed test
corpora (see the determinism notes above q_minhash_near_dup).

Float discipline for hash-stable comparisons: money sums are exact
fixed-point (floor-to-cents bigint), trig/cosine outputs are rounded, and
whole-valued double sums (TPC-H quantities) are exact in IEEE754 regardless
of order, so Spark and DuckDB hash identically.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frontier_engine import ann, graph as GR, ops, textops as TX  # noqa: E402
from frontier_engine import multimodal as MM  # noqa: E402
from frontier_engine import sketch as SK  # noqa: E402
from frontier_engine import feeds as FD  # noqa: E402
from frontier_engine.shardplan import zorder_oracle_expr  # noqa: E402
from frontier_engine.frontier import DrainConfig, drain_epoch  # noqa: E402
from frontier_engine.seen import SeenConfig, empty_state, filter_unseen, update_state, with_bucket  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name in ("documents", "embeddings"):
        # these feed expression/UDF-heavy pipelines (shingling, signatures,
        # cosine) but ship as one small unsplittable parquet file at test
        # SFs — spread them across the cluster before the CPU work
        df = ops.ensure_min_partitions(df)
    return df


def _cents(col):
    """Exact fixed-point: floor(x*100) as bigint — identical in Spark/DuckDB."""
    return F.floor(col * 100).cast("long")


# --------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: document-corpus curation pipeline on sf0.001 — exact dedup,
    exact-substring dedup (ExactSubstr plan + span cut), language-ID,
    quality + repetition scoring, a keep/drop gate, token accounting
    before and after the span cut, per-source rollup. The LLM-pretraining
    data path end-to-end."""
    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents")
    deduped = TX.exact_dedup(docs)
    ttr, dup = TX.repetition_stats_col(F.col("text"))
    enriched = deduped.select(
        "doc_id",
        "source",
        TX.lang_id_col(F.col("text")).alias("lang_guess"),
        TX.quality_score_col(F.col("text")).alias("quality"),
        ttr.alias("ttr"),
        dup.alias("dup_bigram"),
        TX.token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        TX.token_count_col(F.col("text"), "bpe").cast("long").alias("n_bpe_tokens"),
    )
    gated = enriched.withColumn(
        "keep",
        (F.col("quality") >= 0.5) & (F.col("dup_bigram") <= 0.5) & (F.col("n_tokens") >= 5),
    )
    corpus = deduped.select("doc_id", "text")
    cut = TX.apply_span_cuts(corpus, TX.substring_dedup(corpus, k=8)).select(
        "doc_id", F.col("n_kept").alias("n_tokens_after_cut")
    )
    gated = gated.join(cut, "doc_id")
    return (
        gated.groupBy("source", "lang_guess")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0)).alias("kept_tokens"),
            F.sum(
                F.when(F.col("keep"), F.col("n_tokens_after_cut")).otherwise(0)
            ).alias("kept_tokens_after_cut"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.round(F.avg("dup_bigram"), 4).alias("avg_dup_bigram"),
        )
        .orderBy("source", "lang_guess")
    )


# ---------------------------------------------------------------- queries


def q_pruned_agg(spark, sf):
    l = _t(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") < "1995-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


def q_dim_join(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_cents(F.col("c_acctbal"))).alias("acctbal_cents"),
        )
    )


ALLOWED_BRANDS = ["Brand#13", "Brand#19", "Brand#5"]


def q_semi_allowlist(spark, sf):
    p = _t(spark, sf, "part")
    allow = spark.createDataFrame([(b,) for b in ALLOWED_BRANDS], ["p_brand"])
    return ops.semi_allowlist(p, allow, "p_brand").select("p_partkey", "p_brand", "p_name")


def q_anti_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return ops.anti_blocklist(c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey").select(
        "c_custkey", "c_name"
    )


def q_last_wins(spark, sf):
    e = _t(spark, sf, "events")
    return ops.last_wins(
        e, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_id", "event_type", "value")


def q_cdc_gate(spark, sf):
    from frontier_engine.transforms import lag_cdc

    e = _t(spark, sf, "events").filter(F.col("event_type") == "purchase")
    flagged = lag_cdc(e, ("user_id",), "event_id", "value", pct=0.01)
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("price_changed"), 1).otherwise(0)).cast("long").alias("n_changes"),
    )


def q_topk_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    return ops.top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


def q_priority_extract_sum(spark, sf):
    # A1 pack-size-sum semantics: extract ints from text, aggregate
    o = _t(spark, sf, "orders")
    pr = F.regexp_extract(F.col("o_orderpriority"), r"(\d+)", 1).cast("long")
    return o.groupBy("o_orderstatus").agg(
        F.sum(pr).alias("priority_sum"), F.count(F.lit(1)).alias("n")
    )


def q_json_props(spark, sf):
    # C14 JSON payload parse
    e = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"), F.countDistinct("user_id").alias("n_users")
    )


def q_token_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        TX.token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        TX.token_count_col(F.col("text"), "bpe").cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) >= 1)))
        .cast("long")
        .alias("n_distinct_tokens"),
    )


def q_ngram_counts(spark, sf):
    from frontier_engine.transforms import token_ngrams_col

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(token_ngrams_col(F.col("text"), 2)).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(token_ngrams_col(F.col("text"), 2))).cast("long").alias("n_distinct_bigrams"),
    )


def q_exact_dedup(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
        .select("canonical_id", "group_size")
    )


def q_quality(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.quality_score_col(F.col("text")).alias("quality"))


def q_lang_id(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.lang_id_col(F.col("text")).alias("lang_guess"))


def q_merge_upsert(spark, sf):
    o = _t(spark, sf, "orders")
    existing = o.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey", "o_totalprice")
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    merged = ops.merge_upsert(existing, updates, ["o_orderkey"])
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
    )


def q_window_running(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        # round: DuckDB's window sum uses a different accumulation scheme
        # (1-ulp drift vs Spark); inputs have 2 decimals so cents are exact
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_value"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


def q_haversine(spark, sf):
    from frontier_engine.geo import haversine_km

    n = _t(spark, sf, "nation")
    lat = (F.col("n_nationkey") * 3.0 - 30.0).alias("lat")
    lon = (F.col("n_nationkey") * 7.0 - 80.0).alias("lon")
    pts = n.select("n_nationkey", "n_name", lat, lon)
    return pts.select(
        "n_nationkey",
        "n_name",
        F.round(
            haversine_km(F.col("lat"), F.col("lon"), F.lit(10.0), F.lit(106.0)), 3
        ).alias("dist_km"),
    )


def q_politeness_drain(spark, sf):
    """T1: the engine's real politeness drain (histogram pre-cut + census-
    salted JVM windows) on a frontier synthesized from events; budget =
    floor(30s / 10s delay) = 3 per host."""
    e = _t(spark, sf, "events")
    url = F.concat(
        F.lit("https://h"), (F.col("user_id") % 20).cast("string"),
        F.lit(".example/e"), F.col("event_id").cast("string"),
    )
    frontier = e.select(
        url.alias("url"),
        F.xxhash64(url).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string"), F.lit(".example")).alias("host"),
        F.col("value").alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("enqueue_seq"),
        F.lit("2025-06-14 00:00:00").cast("timestamp").alias("ready_ts"),
        F.lit(0).alias("fetch_attempts"),
    )
    hosts = frontier.select("host").distinct()
    robots = hosts.select(
        "host", F.lit(10.0).alias("crawl_delay"), F.array().cast("array<string>").alias("disallow_prefixes")
    )
    drained, _, _ = drain_epoch(frontier, robots, DrainConfig(epoch_seconds=30.0, skew_threshold=100, max_salts=4))
    return drained.select("host", "slot", "url", F.round("priority", 6).alias("priority"))


def q_seen_filter(spark, sf):
    """Two-tier seen-set (Bloom bitmap + exact backstop) vs plain anti-join."""
    from frontier_engine.canon import url_hash2_col

    e = _t(spark, sf, "events")
    url = F.concat(F.lit("https://x.example/e"), F.col("event_id").cast("string"))
    cand = e.select(
        url.alias("url"),
        F.xxhash64(url).alias("url_hash"),
        url_hash2_col(url).alias("url_hash2"),
        "event_id",
    )
    seen_rows = cand.filter(F.col("event_id") % 3 == 0).select("url_hash", "url_hash2")
    cfg = SeenConfig(n_buckets=16, bits_per_bucket=1 << 14)
    state = empty_state(spark, cfg)
    newly = with_bucket(seen_rows, cfg).select("bucket", "url_hash", "url_hash2")
    state = state.unionByName(update_state(state, newly, cfg, epoch=0))
    unseen = filter_unseen(with_bucket(cand, cfg), state, cfg)
    return unseen.select("url")


def q_ann_topk(spark, sf):
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = ann.brute_force_topk(emb, q, k=5)
    return top.select("query_id", "vec_id", F.round("cosine", 4).alias("cosine"), F.col("rank").cast("long").alias("rank"))


# ---------------------- formerly rows-only ops, now oracle-checked
#
# Determinism notes (why each approximate op can be hash-compared against an
# exact SQL oracle on the driver's FIXED sf0.01 tables — verified empirically
# at sf0.001/0.01/0.1 in tests/test_entry_oracles.py):
# - minhash: candidates go through an EXACT shingle-Jaccard verify, so the
#   only failure mode is a missed candidate. The corpus' true pairs are all
#   at jaccard ≥ 0.8 (none in [0.4, 0.8)); with 32 bands × 4 rows the miss
#   probability per such pair is (1-0.8^4)^32 < 5e-8, and the pipeline is
#   deterministic given the fixed data, so candidates ⊇ true pairs holds on
#   every run once verified.
# - simhash: chunk-LSH with n_chunks = max_hamming+1 has EXACT recall by
#   pigeonhole; the md5_60 token hash is recomputable in DuckDB SQL.
# - fingerprint: poly31 scheme = codepoint Horner mod 2^31-1, recomputable
#   via DuckDB list_reduce; winnowing mirrored with a window-min.
# - lsh/ivf ANN: candidate sets verified to contain the exact top-k at all
#   three SFs (nt=32/nb=4; nc=16/np=8), so the reranked output equals the
#   brute-force oracle deterministically on this data.
# - embedding near-dup: planted exact duplicates have identical sign
#   sketches (same bucket in every table → recall 1 by construction);
#   natural max cosine is ≤ 0.61 ≪ the 0.99 threshold at every SF.


def q_minhash_near_dup(spark, sf):
    """MinHash+LSH candidates → exact shingle-Jaccard verify ≥ 0.5.

    Round 6: the fused one-pass form (textops.minhash_near_dup_pairs) —
    one corpus scan/signature pass feeding a single group-by exchange that
    carries the distinct shingle-hash sets, with the exact verify done by
    array_intersect on the carried sets instead of a second corpus-wide
    shingle explode. Output proven equal to the legacy
    candidate_pairs→ngram_jaccard_pairs pipeline (and to the DuckDB
    oracle) at every shipped SF."""
    d = _t(spark, sf, "documents")
    verified = TX.minhash_near_dup_pairs(
        d, num_perm=128, bands=32, shingle_k=3, min_jaccard=0.5
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_simhash_near_dup(spark, sf):
    d = _t(spark, sf, "documents")
    pairs = TX.simhash_near_dup_pairs(d, max_hamming=3, token_hash="md5_60")
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q_fingerprint(spark, sf):
    d = _t(spark, sf, "documents")
    fp = TX.fingerprint_udf(window=8, k=16, scheme="poly31")
    return d.select("doc_id", F.size(fp(F.col("text"))).cast("long").alias("n_fingerprints"))


def _ann_inputs(spark, sf):
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return emb, q


def q_lsh_ann(spark, sf):
    emb, q = _ann_inputs(spark, sf)
    top = ann.lsh_topk(emb, q, dim=64, k=5, n_bits=4, n_tables=32)
    return top.select(
        "query_id", "vec_id", F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ivf_ann(spark, sf):
    emb, q = _ann_inputs(spark, sf)
    cents = ann.train_ivf_centroids(emb, dim=64, n_centroids=16)
    # the oracle is exact brute-force top-5, so the query probes ALL 16
    # lists (exact by construction on these toy corpora — a 500-vector
    # corpus has no meaningful Voronoi locality to prune). The recall-vs-
    # n_probe trade at n_probe < n_centroids is exercised separately in
    # tests/test_ann.py::test_ivf_topk_recall.
    top = ann.ivf_topk(emb, q, cents, k=5, n_probe=16)
    return top.select(
        "query_id", "vec_id", F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ivf_ann_pruned(spark, sf):
    """IVF at n_probe=2 of 8 lists — the PRUNING path, oracle-checked.

    The corpus is derived deterministically from the embeddings table's ids
    and planted on 8 orthogonal cluster axes: row vec_id gets cluster
    c = vec_id % 8 and vector v[j] = 1.0 at j=c, else t·(j+1)/10 with
    t = 0.02·(vec_id % 97)/97. Queries are the axes e_0..e_2; centroids are
    the identity — so every corpus row provably assigns to list c (v[c]=1 ≫
    t·g), every query provably probes its own axis list, and the true top-5
    (within-cluster cosine ≥ 0.997 vs cross-cluster ≤ 0.016) provably lies
    inside the probed lists. The exact brute-force oracle therefore equals
    the pruned IVF output while 6 of 8 inverted lists are genuinely never
    scanned. Within-cluster cosine gaps are ≥ 4e-8 (t-grid spacing), far
    above cross-engine float noise; rows with identical (c, t) have
    IDENTICAL vectors, so their tie breaks on vec_id in both engines.
    """
    import numpy as np

    ids = _t(spark, sf, "embeddings").select("vec_id")
    c = (F.col("vec_id") % 8).cast("int")
    t = F.lit(0.02) * (F.col("vec_id") % 97).cast("double") / F.lit(97.0)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.when(j == c, F.lit(1.0)).otherwise(
            t * (j + F.lit(1)).cast("double") / F.lit(10.0)
        ),
    )
    corpus = ids.select("vec_id", vec.alias("embedding"))
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.when(j.cast("long") == F.col("id"), F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    queries = spark.range(3).select(F.col("id").alias("query_id"), qvec.alias("query_vec"))
    top = ann.ivf_topk(corpus, queries, np.eye(8), k=5, n_probe=2)
    return top.select(
        "query_id", "vec_id", F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_pq_ann(spark, sf):
    """Product-quantized ADC top-k with exact rerank, oracle-checked on a
    corpus where PQ encoding is provably LOSSLESS.

    dim 8 = 4 subspaces × 2 dims; every corpus subvector is exactly e0 or
    e1 (choice bit b_s = (vec_id div (s+1)) % 2) scaled by a per-vector
    g = 1 + vec_id % 7 that L2 normalization cancels, so each normalized
    subvector is exactly e_b/2 — one of the TWO closed-form codebook
    entries per subspace. Encoding therefore has zero quantization error
    (squared-L2 of exactly 0 to its entry vs 0.5 to the other), the ADC
    fold returns 0.25·matches — the EXACT cosine matches/4, a dyadic
    rational both engines compute without rounding — and the reranked
    output equals brute force deterministically (ties on the duplicated
    vectors break vec_id-asc in both engines). The PQ machinery runs for
    real: codes via the encode UDF, scoring via the LUT element_at fold,
    a 20-row shortlist, exact rerank only on the shortlist. Natural-data
    recall (trained codebooks, 64-dim) is exercised separately in
    tests/test_ann.py.
    """
    import numpy as np

    books = np.array([[[0.5, 0.0], [0.0, 0.5]]] * 4)
    g = (F.lit(1) + F.col("vec_id") % 7).cast("double")
    ids = _t(spark, sf, "embeddings").select("vec_id")

    def choice_vec(key):
        # component j: subspace s = j div 2, within-slot w = j % 2,
        # value = scale·(w == (key div (s+1)) % 2)
        def comp(j, scale):
            b = F.floor(key / (F.floor(j / 2) + F.lit(1))) % 2
            return F.when((j % 2).cast("long") == b, scale).otherwise(F.lit(0.0))

        return comp

    cvec = F.transform(
        F.sequence(F.lit(0), F.lit(7)), lambda j: choice_vec(F.col("vec_id"))(j, g)
    )
    corpus = ids.select("vec_id", cvec.alias("embedding"))
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: choice_vec(F.col("id"))(j, F.lit(1.0)),
    )
    queries = spark.range(3).select(F.col("id").alias("query_id"), qvec.alias("query_vec"))
    top = ann.pq_topk(corpus, queries, books, k=5, shortlist_factor=4)
    return top.select(
        "query_id", "vec_id", F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ivfadc_ann(spark, sf):
    """IVFADC — coarse IVF routing over PQ codes with ADC + exact rerank
    (ann.ivfadc_topk), oracle-checked on a corpus where BOTH stages are
    provable: routing is exact and PQ encoding is lossless.

    dim 8 = 4 subspaces × 2. Row vec_id gets primary axis c = vec_id % 8
    (weight 2g), secondary axis c2 = (c + 2 + 2·((vec_id div 8) % 3)) % 8
    (weight g) — the even shift guarantees c2 lies in a DIFFERENT
    subspace, and g = 2^(vec_id % 3) is a power of two so ‖v‖ = g·√5 and
    every normalized component (2/√5, 1/√5) is bitwise independent of g.
    Centroids = identity ⇒ the row provably assigns to list c (2/√5 >
    1/√5 > 0) and query axis e_q provably probes its own list; the true
    top-5 (primary-match cosine 2/√5 ≈ 0.894 vs secondary-match 1/√5 ≈
    0.447) lies inside probed lists while 6 of 8 lists are never scanned.
    Codebooks hold exactly the five normalized subvectors that occur
    {0, 2e_b/√5, e_b/√5}, so PQ encoding has zero quantization error and
    the ADC fold reproduces the exact cosine — shortlist order = true
    order. Rows with equal (c, c2, g′-class) have cosines bitwise equal
    within each engine (power-of-two scaling), so the only ties are
    broken vec_id-asc in both engines; distinct cosine levels are ≥0.447
    apart — far above any cross-engine float noise at 4-decimal rounding.
    """
    import numpy as np

    r5 = float(np.sqrt(5.0))
    books = np.array(
        [[[0.0, 0.0], [2 / r5, 0.0], [0.0, 2 / r5], [1 / r5, 0.0], [0.0, 1 / r5]]] * 4
    )
    ids = _t(spark, sf, "embeddings").select("vec_id")
    c = (F.col("vec_id") % 8).cast("int")
    c2 = ((c + 2 + 2 * ((F.col("vec_id") / 8).cast("long") % 3)) % 8).cast("int")
    g = F.pow(F.lit(2.0), (F.col("vec_id") % 3).cast("double"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.when(j == c, F.lit(2.0) * g).otherwise(
            F.when(j == c2, g).otherwise(F.lit(0.0))
        ),
    )
    corpus = ids.select("vec_id", vec.alias("embedding"))
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.when(j.cast("long") == F.col("id"), F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    queries = spark.range(3).select(F.col("id").alias("query_id"), qvec.alias("query_vec"))
    top = ann.ivfadc_topk(
        corpus, queries, np.eye(8), books, k=5, n_probe=2, shortlist_factor=4
    )
    return top.select(
        "query_id", "vec_id", F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_embedding_near_dup(spark, sf):
    # near-uniform random embeddings have no high-cosine pairs, so plant
    # exact duplicates (id+100000) of vec_id<20 — the op must find them all
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    dup = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    planted = emb.unionByName(dup)
    # n_bits derived from the corpus size (auto_bits, target ~16 ids per
    # bucket): exact duplicates (identical vectors) collide in EVERY table
    # at any bucket count, so recall for the >=0.99 pairs the oracle finds
    # is 1.0 by construction at any width, while a fixed width taken at a
    # larger SF would quietly turn the in-bucket pair step quadratic
    # (round-5's n_bits=8 emitted 7.2M candidates for 20 true pairs at
    # sf1.0; the derived width emits ~0.4M)
    pairs = ann.embedding_near_dup_pairs(
        planted, dim=64, threshold=0.99, n_bits=None, n_tables=8, target_bucket=16
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_multimodal_decode(spark, sf):
    """Binary media plumbing: deterministic payloads derived from doc ids →
    decode/feature-extract via mapInPandas. The fake body is a closed form
    ((seed*31 + i*7) % 256), so the oracle recomputes the features in SQL."""
    import pandas as pd

    d = _t(spark, sf, "documents").select("doc_id")

    def make_media(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            kinds = ["image", "audio", "video"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        MM.fake_media_bytes(kinds[int(i) % 3], 32 + int(i) % 64, 32, seed=int(i))
                        for i in pdf["doc_id"]
                    ],
                }
            )

    media = d.mapInPandas(make_media, schema="media_id long, payload binary")
    return MM.decode_features(media).select(
        "media_id", "kind", "width", "n_bytes", F.round("mean_byte", 4).alias("mean_byte")
    )


def q_audio_features(spark, sf):
    """Audio-leg multimodal decode (multimodal.audio_features): real PCM
    WAV payloads built from a closed-form int16 sample sequence
    (((doc_id*31 + i*7) % 256) - 128), decoded and feature-extracted via
    mapInPandas. The WAV encode→parse round trip is INSIDE the gate; the
    oracle recomputes duration/peak/zero-crossings/rms from the closed
    form in SQL (spectral centroid is FFT-only and is covered by the
    module test against a direct numpy oracle instead)."""
    import numpy as np
    import pandas as pd

    d = _t(spark, sf, "documents").select("doc_id")

    def make_wav(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf["doc_id"]:
                n = 64 + int(i) % 64
                s = (((np.arange(n) * 7 + int(i) * 31) % 256) - 128).astype(
                    np.int16
                )
                payloads.append(MM.encode_wav(s, sample_rate=8000))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = d.mapInPandas(make_wav, schema="media_id long, payload binary")
    return MM.audio_features(media).select(
        "media_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        "peak",
        "zero_crossings",
        F.round("rms", 4).alias("rms"),
    )


def q_feed_seeds(spark, sf):
    """RSS/Atom feed ingestion (feeds.parse_feeds + seeds_from_feeds):
    deterministic Atom bodies built from doc ids — real XML through the
    real anchored-regex parser, RFC 3339 date normalization, canonical
    seed handoff with freshness-decayed priority (0.5^(age/7d) from a
    fixed logical as_of). The oracle recomputes url + decay closed-form;
    the parse itself is inside the gate because a parse slip changes
    url/updated and breaks the hash."""
    import pandas as pd

    d = _t(spark, sf, "documents").select("doc_id")

    def make_feed(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bodies = []
            for i in pdf["doc_id"]:
                i = int(i)
                day = 1 + i % 28
                bodies.append(
                    (
                        '<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
                        f'<link rel="alternate" href="https://h{i % 20}.example/p{i}"/>'
                        f"<updated>2026-01-{day:02d}T00:00:00Z</updated>"
                        "</entry></feed>"
                    ).encode()
                )
            yield pd.DataFrame(
                {
                    "url": ["https://feed.example/f"] * len(pdf),
                    "body": bodies,
                }
            )

    bodies = d.mapInPandas(make_feed, schema="url string, body binary")
    parsed = FD.parse_feeds(bodies)
    seeds = FD.seeds_from_feeds(
        parsed, priority=0.5, as_of="2026-03-01 00:00:00", half_life_days=7.0
    )
    return seeds.select("url", F.round("priority", 6).alias("priority"))


def q_ngram_search(spark, sf):
    """K6: token-bigram inverted index build + multi-term lookup.

    Round 6: the literal-term lookup is fused through the posting explode
    (index.match_counts_docs) — row-identical to
    match_counts(build_postings(d, 2), terms), proven by the oracle and
    tests/test_index.py, with the corpus-wide (ngram, doc_id) explode and
    its aggregation shuffle eliminated."""
    from frontier_engine import index as IX

    d = _t(spark, sf, "documents")
    return IX.match_counts_docs(d, NGRAM_TERMS, n=2)


NGRAM_TERMS = ["part filter", "table hash", "sort query"]

# STRAND language-token alternation — shared verbatim by q_strand_pairs'
# engine call and its DuckDB oracle (the token set is part of the
# operator contract, textops.STRAND_LANGS)
_STRAND_ALT = "|".join(TX.STRAND_LANGS)


def q_batch_infer(spark, sf):
    """C9: batched model inference (mapInPandas, per-worker model singleton)
    with a deterministic closed-form model the oracle recomputes in SQL."""
    from frontier_engine.infer import batch_infer, heuristic_quality_model

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return batch_infer(
        d, heuristic_quality_model, "doc_id long, score double, label string"
    )


def q_repetition(spark, sf):
    """Within-doc repetition quality signals: type-token ratio + duplicate
    bigram fraction (the Gopher-style repetition filters)."""
    d = _t(spark, sf, "documents")
    ttr, dup = TX.repetition_stats_col(F.col("text"))
    return d.select("doc_id", ttr.alias("ttr"), dup.alias("dup_bigram"))


def q_stratified_sample(spark, sf):
    """Deterministic k-per-stratum sample over (lang, source) strata."""
    d = _t(spark, sf, "documents")
    return ops.stratified_sample(d, ["lang", "source"], k=5, id_col="doc_id").select(
        "doc_id", "lang", "source"
    )


def q_latest_records(spark, sf):
    """Upsert read view over an append-only two-epoch records history:
    newest epoch wins per key (snapshot.latest_records — the reference's
    ``update_one(upsert=True)`` read contract, /root/reference/db/__init__.py:63,
    kept over an append-only write path). The two-epoch history is
    synthesized deterministically from ``documents``: every doc crawled at
    epoch 0, every third doc re-crawled at epoch 1 with revised text."""
    from frontier_engine.snapshot import latest_records

    d = _t(spark, sf, "documents")
    e0 = d.select(
        "doc_id", F.lit(0).cast("long").alias("epoch"), F.col("text")
    )
    e1 = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.lit(1).cast("long").alias("epoch"),
        F.concat(F.col("text"), F.lit(" [v2]")).alias("text"),
    )
    hist = e0.unionByName(e1)
    return latest_records(hist, key_cols=("doc_id",), order_col="epoch").select(
        "doc_id",
        F.col("epoch").alias("latest_epoch"),
        F.length("text").cast("long").alias("text_len"),
    )


def q_revisit_census(spark, sf):
    """Archive-side recrawl dedup plan (warc.mark_revisits — the WARC
    identical-payload-digest revisit profile Common Crawl uses): a
    re-fetch whose body sha1 was already captured is flagged ``revisit``
    and points at the first capture, so the archive stores the bytes
    once. Two-epoch history synthesized from ``documents``: every doc
    captured at epoch 0, every doc re-crawled at epoch 1 with text
    unchanged except every third doc (revised → NOT a revisit).
    Generalizes the reference's refetch-upsert posture
    (/root/reference/db/__init__.py:63) to the archival layer."""
    from frontier_engine.warc import mark_revisits

    d = _t(spark, sf, "documents")
    url0 = F.concat(F.lit("https://docs.example/"), F.col("doc_id").cast("string"))
    e0 = d.select(
        url0.alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
    )
    e1 = d.select(
        F.concat(url0, F.lit("?re=1")).alias("url"),
        F.lit("2026-01-02 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
            ).otherwise(F.col("text")),
            "UTF-8",
        ).alias("html"),
    )
    marked = mark_revisits(e0.unionByName(e1))
    return marked.select("url", "revisit", "refers_url")


def q_dedup_clusters(spark, sf):
    """Near-dup CLUSTERS: the minhash_near_dup pair set closed under
    transitivity via hash-min connected components, labelled by the min
    doc id per component — the survivor-selection step of a dedup
    pipeline. Pair recall rests on the same LSH band guarantee as
    minhash_near_dup (oracle-matched); the closure itself is exact and
    parallelism-independent, cross-checked against a recursive
    reachability CTE."""
    d = _t(spark, sf, "documents")
    pairs = (
        TX.minhash_near_dup_pairs(d, num_perm=128, bands=32, min_jaccard=0.5)
        .select("id_a", "id_b")
        .persist()
    )
    try:
        comp = TX.connected_components(pairs)
    finally:
        pairs.unpersist()
    return comp.select(F.col("v").alias("doc_id"), F.col("label").alias("cluster_id"))


def q_trustrank(spark, sf):
    """TrustRank spam demotion (graph.trustrank): personalized-teleport
    PageRank from a trusted seed set (node % 10 == 0) over the same
    orders-derived 100-node graph as q_pagerank. The DuckDB oracle
    unrolls the identical 5 iterations as chained CTEs; trust rounds to
    6 decimals (accumulated IEEE error ~1e-13 at this scale)."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    seeds = nodes.filter(F.col("node") % 10 == 0)
    out = GR.trustrank(edges, seeds, iterations=5, damping=0.85)
    return out.select("node", F.round("trust", 6).alias("trust"))


def q_image_dedup(spark, sf):
    """Perceptual image dedup (multimodal.dhash_features): deterministic
    36x32 grayscale images (pixel = (seed*7 + (x + seed%7)*3 + y*11
    + x*y*(1 + seed%5)) % 256 — seed-interacting, so distinct seeds give
    distinct gradient structure: 377 distinct hashes over 400 distinct
    seeds at sf0.01,
    r=g=b) are encoded as REAL 24-bit BMPs, so the engine's actual
    decode path sits INSIDE the hash check — the oracle recomputes the
    9x8 block means and dHash bits straight from the closed form, and
    they only match if decode(encode(pixels)) reproduces every pixel.
    Visual dups planted via seed sharing (doc_id % 5 == 4 reuses
    doc_id - 1's image) must land in the same dup group."""
    import numpy as np
    import pandas as pd

    d = _t(spark, sf, "documents").select("doc_id")

    def make_imgs(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf["doc_id"]:
                seed = int(i) - (1 if int(i) % 5 == 4 else 0)
                x = np.arange(36)[None, :, None]
                y = np.arange(32)[:, None, None]
                v = (
                    (seed * 7 + (x + seed % 7) * 3 + y * 11
                     + x * y * (1 + seed % 5)) % 256
                ).astype(np.uint8)
                payloads.append(MM.encode_bmp(np.broadcast_to(v, (32, 36, 3))))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = d.mapInPandas(make_imgs, schema="media_id long, payload binary")
    h = MM.dhash_features(media)
    w = Window.partitionBy("dhash")
    return h.select(
        "media_id", "dhash", F.count(F.lit(1)).over(w).cast("long").alias("dup_group_size")
    )


def q_containment(spark, sf):
    """Asymmetric containment dedup (textops.containment_pairs): winnowed
    fingerprints, stop-fingerprint cap BEFORE the self-join, both directed
    containments as exact divisions over TRUE (uncapped) set sizes. To
    plant real containment in the fixture, every doc_id % 10 == 7 doc is
    augmented with a verbatim quote of doc (doc_id - 7)'s text — the SAME
    concat runs in the oracle, so the pair (base, quoter) must surface
    with containment_a ~= 1 for the detection itself to be hash-checked."""
    d = _t(spark, sf, "documents")
    base = d.select("doc_id", "text")
    shifted = base.select(
        (F.col("doc_id") + 7).alias("doc_id"), F.col("text").alias("qtext")
    )
    aug = base.join(F.broadcast(shifted), "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 10 == 7) & F.col("qtext").isNotNull(),
            F.concat(F.col("text"), F.lit(" quoted: "), F.col("qtext")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return TX.containment_pairs(aug, min_overlap=2, min_containment=0.8)


def q_dedup_survivors(spark, sf):
    """Quality-aware survivor selection (textops.select_survivors): the
    dedup_clusters closure joined with the quality score; per cluster the
    highest-quality doc survives (ties -> min doc_id) via ONE partial-agg
    argmax — no window sort, mega-cluster-safe. The oracle recomputes the
    same pick with a recursive-CTE closure + a rank window."""
    d = _t(spark, sf, "documents")
    pairs = (
        TX.minhash_near_dup_pairs(d, num_perm=128, bands=32, min_jaccard=0.5)
        .select("id_a", "id_b")
        .persist()
    )
    try:
        comp = TX.connected_components(pairs)
    finally:
        pairs.unpersist()
    quality = d.select(
        "doc_id", TX.quality_score_col(F.col("text")).alias("quality")
    )
    return TX.select_survivors(comp, quality)


def q_decontaminate(spark, sf):
    """Benchmark decontamination (GPT-3 App. C / Dolma overlap filter):
    docs sharing any 3-word shingle with a deterministic eval subset
    (doc_id % 97 == 0), scored by distinct shingle hits. Eval shingles
    broadcast; corpus side explode + semi-count."""
    d = _t(spark, sf, "documents")
    return TX.decontaminate(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        k=3,
    )


def q_rare_terms(spark, sf):
    """Per-document top-3 rarity-weighted terms (TF-IDF-family keyword
    extraction): score = tf/(df+1), a pure-IEEE rational so the DuckDB
    oracle reproduces every score bit-for-bit. Explode → two hash aggs →
    broadcast vocabulary join → per-doc top-k window."""
    d = _t(spark, sf, "documents")
    return TX.rare_term_topk(d.select("doc_id", "text"), k=3)


def q_pii_scrub(spark, sf):
    """PII redaction (Dolma's mask step): emails/IPv4/intl-phone masked
    with typed placeholders + per-doc counts, all expression-only regex
    inside whole-stage codegen. The fixture text carries no PII, so the
    query plants one of each class deterministically from doc_id — the
    SAME concat expression runs in the DuckDB oracle, so the scrub itself
    (not the planting) is what's being checked."""
    d = _t(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +84-90-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("-123"),
        ).alias("text"),
    )
    return TX.pii_scrub(aug)


def q_paragraph_dedup(spark, sf):
    """Corpus-wide paragraph dedup (Dolma paragraph filter): first
    occurrence of each distinct paragraph wins, every other copy is
    flagged. The fixture docs are single-line, so the query derives a
    paragraph structure deterministically (3-word chunks joined by \\n —
    same expression in the oracle); the tiny shared vocabulary makes
    cross-document chunk collisions common, so the dedup genuinely drops
    rows. Winners via partial-agg min(struct) — skew-safe for
    boilerplate mega-paragraphs (see textops.paragraph_dedup)."""
    d = _t(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(3.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * 3 + 1, 3), " "),
    )
    aug = d.select("doc_id", F.array_join(paras, "\n").alias("text"))
    out = TX.paragraph_dedup(aug)
    return out.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paragraphs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )


def q_pagerank(spark, sf):
    """Link-graph authority for frontier prioritization: 5-iteration
    PageRank (GraphX semantics — rank0=1.0, no dangling redistribution)
    over a deterministic ~100-node graph derived from orders
    (custkey%100 -> orderkey%100, self-loops dropped). Each iteration is
    ONE shuffle (edge ⋈ rank join + map-side-combined sum); ranks are
    localCheckpoint-cut per round. The DuckDB oracle unrolls the same
    five iterations as chained CTEs, so the fixpoint math itself is
    hash-checked; ranks round to 6 decimals (accumulated IEEE error
    ~1e-13 at this scale)."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    ranks = GR.pagerank(edges, iterations=5, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


_MOJI_SUFFIXES = (
    "â€œcafÃ©â€\x9d â€” naÃ¯ve",
    "donâ€™t Â«quoteÂ» 25Â°",
    "rÃ©sumÃ© â€¦ seÃ±or",
)


def q_fix_mojibake(spark, sf):
    """Encoding repair (the ftfy-style pass of a web-text pipeline):
    fix UTF-8-decoded-as-cp1252 mojibake via an expression-only replace
    chain. The fixture text is clean ASCII, so the query plants a
    deterministic mojibake suffix per doc (3 rotating phrases covering
    curly quotes, dashes, ellipsis, accented letters, guillemets,
    degree) — the SAME concat runs in the DuckDB oracle, so the repair
    chain itself (not the planting) is what's hash-checked."""
    d = _t(spark, sf, "documents")
    sufs = F.array(*[F.lit(s) for s in _MOJI_SUFFIXES])
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" "),
            F.element_at(sufs, (F.col("doc_id") % 3 + 1).cast("int")),
        ).alias("text"),
    )
    return TX.fix_mojibake(aug)


_C4_SUFFIXES = (
    "This planted line ends with a period.\nshort line\nvar config = { a: 1 };",
    "Click here\nA clean sentence with enough words here.\n"
    "Please enable javascript to continue now.",
    "Lorem ipsum dolor sit amet.\nAnother proper sentence follows right here!",
    "Is this a question with words?\nno terminal punct on this line",
)


def q_c4_clean(spark, sf):
    """C4 line-level cleaning (Raffel et al. 2020): keep only lines that
    end in terminal punctuation, have >=3 words, and don't mention
    "javascript"; flag the page-level lorem-ipsum / curly-brace signals.
    The fixture text is single-line, so the query plants a deterministic
    multi-line suffix per doc (4 rotating blocks that each exercise a
    different rule: short line, code line, no-terminal-punct line,
    javascript line, lorem-ipsum line, and two clean survivors) — the
    SAME concat runs in the DuckDB oracle, so the filter itself is what's
    hash-checked. The base text gets '.' appended so it survives and the
    cleaned column is never empty."""
    d = _t(spark, sf, "documents")
    sufs = F.array(*[F.lit(s) for s in _C4_SUFFIXES])
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(".\n"),
            F.element_at(sufs, (F.col("doc_id") % 4 + 1).cast("int")),
        ).alias("text"),
    )
    return TX.c4_clean(aug)


def q_substring_dedup(spark, sf):
    """Exact-substring dedup (Lee et al. 2022 ExactSubstr, k-gram-hash
    formulation): every maximal token span whose 8-token windows all
    recur elsewhere in the corpus, first occurrence kept — the deletion
    plan a curation pipeline cuts from training text. The fixture's tiny
    shared vocabulary plus its planted near-duplicate documents produce
    real cross-document repeats, so the win/lose and span-merge logic is
    genuinely exercised. Spark marks windows by xxhash64; the oracle
    groups on the gram text itself, so a hash collision would surface as
    a gate mismatch (see textops.substring_dedup for the 100 TB shape)."""
    d = _t(spark, sf, "documents")
    return TX.substring_dedup(d.select("doc_id", "text"), k=8)


def q_substring_cut(spark, sf):
    """ExactSubstr applied end-to-end: compute the duplicated-span
    deletion plan (q_substring_dedup) and CUT it from the corpus,
    returning cleaned text + before/after token counts for every
    document. The cut is expression-only (indexed higher-order filter
    over a broadcast cuts array) — nothing corpus-sized shuffles."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    spans = TX.substring_dedup(d, k=8)
    return TX.apply_span_cuts(d, spans)


def q_url_features(spark, sf):
    """RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1): score
    URLs on path depth, parameter count, digit ratio and length, with a
    keep gate — the pre-fetch filter of a web pipeline. URLs are built
    deterministically from events (3 rotating path shapes, alternating
    query strings) with the SAME concat in the oracle, so the feature
    extraction itself is what's hash-checked. Expression-only."""
    from frontier_engine import canon as CN

    e = _t(spark, sf, "events")
    seg = F.element_at(
        F.array(F.lit("a/b/c/page"), F.lit("p"), F.lit("x/y/deep/q/r/s")),
        (F.col("event_id") % 3 + 1).cast("int"),
    )
    qs = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(
            F.lit("?id="), F.col("event_id").cast("string"),
            F.lit("&ref=u"), F.col("user_id").cast("string"),
        ),
    ).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://h"), (F.col("user_id") % 20).cast("string"),
        F.lit(".example/"), seg, F.col("event_id").cast("string"), qs,
    )
    d = e.select(url.alias("url"))
    feats = CN.url_features_col(F.col("url"))
    out = d.select("url", *[c.alias(k) for k, c in feats.items()])
    return out.withColumn(
        "keep",
        (F.col("path_depth") <= 4)
        & (F.col("n_params") <= 2)
        & (F.col("digit_ratio") <= 0.25)
        & (F.col("url_len") <= 80),
    )


def q_pack_sequences(spark, sf):
    """Sequence packing (GPT-style concat-and-chunk pretraining prep):
    each doc's tokens land at (seq_id, offset) in one of 8 independent
    shard streams chunked into 512-token sequences. The running token
    count windows per shard — never the global single-partition window
    that is the classic cumulative-sum scale trap. Integer-exact, so the
    oracle reproduces every assignment bit-for-bit."""
    d = _t(spark, sf, "documents")
    return TX.pack_sequences(
        d.select("doc_id", "text"), seq_len=512, n_shards=8
    )


def q_dsir_affinity(spark, sf):
    """DSIR-style data selection (Xie et al. 2023): score every document
    by hashed unigram+bigram target affinity against a deterministic
    in-domain subset (doc_id % 17 == 0 stands in for "the target domain"
    so the gate is reproducible). Integer-exact affinity ratio — see
    textops.dsir_affinity for why the scores hash-match bit-for-bit.
    Bucket stats (1024 rows) broadcast back; the corpus side is two
    partial aggregations."""
    d = _t(spark, sf, "documents")
    docs = d.select(
        "doc_id", "text", (F.col("doc_id") % 17 == 0).alias("is_target")
    )
    return TX.dsir_affinity(docs)


def q_domain_stats(spark, sf):
    """RefinedWeb/FineWeb-style domain reputation (Penedo et al.
    2023/2024 §host-level filtering): per-source doc counts, distinct-body
    counts, within-domain duplication rate, token volume, and a keep gate
    — the aggregate triage a web pipeline runs before per-document
    modeling. All integer / single-division arithmetic; the Spark side
    dedups on xxhash64(text) (8-byte shuffle) while the oracle counts
    distinct text itself, so a hash collision would surface here."""
    d = _t(spark, sf, "documents")
    return TX.domain_stats(d)


def q_unigram_surprisal(spark, sf):
    """CCNet-style LM quality bucketing (Wenzek et al. 2020): unigram-LM
    surprisal per document with head/middle/tail tertiles per
    (language, shard) cell — sharded tertiles are how CCNet buckets each
    dump, and what keeps the window off a whole-language single-partition
    sort at scale. Token surprisal is the integer log2 magnitude of the
    token's corpus count (length(bin(c))-1), so every score is
    integer-exact and the bucket boundaries reproduce bit-for-bit on any
    engine — no libm log whose last-ulp rounding differs between JVM
    and C."""
    d = _t(spark, sf, "documents")
    return TX.unigram_surprisal(d)


def q_mixture_sample(spark, sf):
    """Temperature-weighted domain mixture sampling (alpha=0.5, as in
    XLM-R / mT5 data mixing): per-source quota = min(n, ceil(4*sqrt(n)))
    — sqrt is IEEE-correctly-rounded and the scale is a power of two, so
    quotas are engine-exact — with deterministic smallest-hash-rank
    selection inside each domain (same Knuth scramble as
    stratified_sample)."""
    d = _t(spark, sf, "documents")
    return TX.mixture_sample(d)


def q_incremental_dedup(spark, sf):
    """Cross-snapshot incremental dedup (RefinedWeb/Dolma: each new dump
    dedups against ALL prior dumps via a hash-only ledger): docs with
    doc_id % 4 == 0 stand in for the already-ingested history (only
    their xxhash64 survives — 8 bytes/doc), the rest are the incoming
    batch. Survivors are incoming docs whose body is absent from history
    and first-in-batch by doc_id. The oracle reproduces the split and
    both gates on the text itself, so a hash collision would fail it.
    Every doc_id % 5 == 0 body is replaced by a shared boilerplate
    string so real duplicate clusters exist BOTH within the batch and
    across the batch/history split — otherwise the fixture corpus is
    all-unique and the gate would never exercise a drop."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit("boilerplate page"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    history = d.filter(F.col("doc_id") % 4 == 0).select(
        F.xxhash64(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    incoming = d.filter(F.col("doc_id") % 4 != 0)
    out = TX.incremental_dedup(incoming, history)
    # hashes are engine-internal; expose the ledger-append view minus h
    return out.select("doc_id", "text", "is_new_text")


def q_dup_profile(spark, sf):
    """Duplication profile: exact-duplicate cluster-size histogram —
    the per-dump observability metric (what share of the corpus is 2×,
    10×, 1000× duplicated). Two map-side-combined aggregations over
    8-byte hashes; the oracle clusters on the text itself. doc_id % 5
    and % 7 bodies collapse to planted boilerplate strings so the
    histogram has real multi-size clusters (the raw fixture is
    all-unique)."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit("boilerplate page"))
        .when(F.col("doc_id") % 7 == 0, F.lit("cookie notice"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return TX.dup_profile(d)


def q_bpe_pairs(spark, sf):
    """BPE merge-pair counting (Sennrich et al. 2016 — the tokenizer-
    training statistic): weighted adjacent-character-pair counts over
    the corpus, computed vocabulary-first (the corpus aggregates to its
    distinct words ONCE; pair explosion runs at vocabulary scale).
    Integer-exact; the argmax pair is the next BPE merge."""
    d = _t(spark, sf, "documents")
    return TX.bpe_pair_counts(d.select("text"), min_count=2)


def q_bpe_train(spark, sf):
    """Full BPE tokenizer TRAINING (Sennrich et al. 2016's iterative
    merge loop — bpe_pairs is one round's statistic, this is the whole
    trainer): 6 merge rounds over the corpus vocabulary, each = one
    vocabulary-scale pair count + a one-row argmax collect + one narrow
    fold applying the merge greedily left-to-right. Returns the learned
    merge table — deterministic via the (count DESC, lhs, rhs) tie-break.
    The oracle unrolls the 6 rounds in SQL: segmentation as a
    double-space-delimited symbol string, so ONE replace() per round is
    exactly greedy non-overlapping merge application."""
    d = _t(spark, sf, "documents")
    return TX.bpe_train(d.select("text"), n_merges=6, min_count=2)


def _bpe_train_oracle_sql(k: int = 6, min_count: int = 2) -> str:
    """Unrolled-round SQL twin of textops.bpe_train (same pattern as the
    perceptron's unrolled-epoch oracle). Each word's segmentation is
    encoded ' s1  s2  ...  sk ' — every symbol carries its OWN leading
    and trailing space, so replace(' l  r ' -> ' lr ') consumes no
    neighbouring delimiter and one SQL replace == greedy left-to-right
    non-overlapping merge (symbols never contain whitespace because
    words are whitespace-split). Early stop falls out naturally: an
    empty b{{i}} makes the round-i replace NULL the segmentation, so all
    later rounds produce zero rows."""
    parts = [
        f"""vocab AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_TOKS}) AS word FROM documents)
        GROUP BY word HAVING length(word) >= 2),
    seg0 AS MATERIALIZED (
        SELECT freq,
               ' ' || array_to_string(regexp_split_to_array(word, ''), '  ')
                   || ' ' AS seg
        FROM vocab)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""p{i} AS (
        SELECT syms[j] AS lhs, syms[j+1] AS rhs,
               CAST(sum(freq) AS BIGINT) AS pair_count
        FROM (SELECT freq, string_split(trim(seg), '  ') AS syms FROM seg{i-1}),
             unnest(generate_series(1, len(syms) - 1)) AS u(j)
        GROUP BY lhs, rhs HAVING sum(freq) >= {min_count}),
    b{i} AS MATERIALIZED (
        SELECT lhs, rhs, pair_count FROM p{i}
        ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"""
        )
        if i < k:
            parts.append(
                f"""seg{i} AS MATERIALIZED (
        SELECT freq, replace(seg,
            ' ' || (SELECT lhs FROM b{i}) || '  ' || (SELECT rhs FROM b{i}) || ' ',
            ' ' || (SELECT lhs FROM b{i}) || (SELECT rhs FROM b{i}) || ' ') AS seg
        FROM seg{i-1})"""
            )
    union = "\n            UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, lhs, rhs, pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n            " + union


def q_bpe_fertility(spark, sf):
    """Per-language tokenizer fertility (BPE tokens per word by language) —
    the multilingual-fairness statistic pretraining corpora are audited
    with (a language whose fertility is 2× pays 2× the context budget per
    word; cf. the tokenizer-parity analyses around XLM-R/NLLB). Pure
    composition: bpe_token_counts (vocabulary-first apply) joined back to
    the documents' lang, one map-side-combined aggregate. Integer sums;
    the ratio is one float64 division rounded to 6."""
    d = _t(spark, sf, "documents")
    counts = TX.bpe_token_counts(d, BPE_MERGES)
    joined = counts.join(d.select("doc_id", "lang"), "doc_id")
    return joined.groupBy("lang").agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.round(
            F.sum("n_bpe_tokens").cast("double") / F.sum("n_words").cast("double"),
            6,
        ).alias("fertility"),
    )


def _bpe_fertility_oracle_sql() -> str:
    """Per-language aggregate over the same delimited-replace-chain twin
    as _bpe_oracle_sql, joined to documents.lang."""
    expr = (
        "array_to_string(list_transform(string_split(word, ''),"
        " c -> '<' || c || '>'), '')"
    )
    for left, right in BPE_MERGES:
        expr = f"replace({expr}, '<{left}><{right}>', '<{left}{right}>')"
    return f"""
            WITH w AS (
                SELECT doc_id, unnest({_TOKS}) AS word FROM documents),
            tok AS (
                SELECT doc_id,
                       CAST(len(s) - len(replace(s, '<', '')) AS BIGINT) AS n_tok
                FROM (SELECT doc_id, {expr} AS s FROM w)),
            per_doc AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                       CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
                FROM tok GROUP BY doc_id)
            SELECT d.lang,
                   CAST(sum(p.n_words) AS BIGINT) AS n_words,
                   CAST(sum(p.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
                   round(CAST(sum(p.n_bpe_tokens) AS DOUBLE)
                         / CAST(sum(p.n_words) AS DOUBLE), 6) AS fertility
            FROM per_doc p JOIN documents d USING (doc_id)
            GROUP BY d.lang
        """


def q_recrawl_schedule(spark, sf):
    """Adaptive recrawl scheduling (Cho & Garcia-Molina 2003 freshness
    estimation): per-URL change rate from consecutive-visit fingerprint
    comparisons, next interval inversely proportional, clamped to
    [1h, 30d]. The fetch history is built deterministically from events
    (event_id % 120 buckets as URLs, visit order = event_id, the rotating
    event_type as the content fingerprint, so real change/no-change runs
    occur). Integer floor-division interval — engine-exact."""
    from frontier_engine import transforms as TR

    e = _t(spark, sf, "events")
    hist = e.select(
        F.concat(F.lit("u"), (F.col("event_id") % 120).cast("string")).alias(
            "url"
        ),
        F.col("event_id").alias("visit_ts"),
        F.col("event_type").alias("fingerprint"),
    )
    return TR.recrawl_schedule(hist, visit_col="visit_ts")


def q_corpus_stats(spark, sf):
    """Per-language dataset-card summary (C4/OSCAR/FineWeb-style): doc
    counts, token/char volumes, min/median/p90/max document length in
    one map-side-combined aggregate. Exact percentiles; linear
    interpolation over integers is IEEE-exact on both engines."""
    d = _t(spark, sf, "documents")
    return TX.corpus_stats(d)


def q_trap_detection(spark, sf):
    """Spider-trap / duplicate-content host census (IRLbot-style budget
    control, Lee et al. WWW 2009 §5; Heritrix pathological-URI rules):
    per-host distinct-URL vs distinct-content inflation, path depth and
    path-segment repetition, with the budget-cut gate. The fetch log is
    built deterministically from events: hosts ≡7 (mod 8) mint a fresh
    session URL per event over 3 contents (URL-space inflation), hosts
    ≡3 (mod 8) serve repeated-segment paths (/x/x/x/x/...), everything
    else is healthy. The census arithmetic is integer + one IEEE
    division, so the oracle reproduces it bit-for-bit; Spark dedups on
    xxhash64(url/content) (8-byte shuffles) while the oracle counts the
    raw strings, so a hash collision would surface here."""
    from frontier_engine import hostctl

    e = _t(spark, sf, "events")
    hostnum = (F.col("user_id") % 40).cast("string")
    eid = F.col("event_id").cast("string")
    kind = (F.col("user_id") % 40) % 8
    url = F.when(
        kind == 7,
        F.concat(
            F.lit("https://t"), hostnum, F.lit(".example/p?session="), eid
        ),
    ).when(
        kind == 3,
        F.concat(F.lit("https://t"), hostnum, F.lit(".example/x/x/x/x/p"), eid),
    ).otherwise(
        F.concat(F.lit("https://t"), hostnum, F.lit(".example/a/"), eid)
    )
    content = F.when(
        kind == 7, F.concat(F.lit("c"), (F.col("event_id") % 3).cast("string"))
    ).otherwise(F.concat(F.lit("b"), eid))
    pages = e.select(
        F.concat(F.lit("t"), hostnum).alias("host"),
        url.alias("url"),
        content.alias("content"),
    )
    return hostctl.trap_census(pages)


def q_mirror_hosts(spark, sf):
    """Mirror-site detection (Bharat & Broder WWW 1999): host pairs whose
    capped content-fingerprint sets overlap with Jaccard ≥ 0.5. Pages are
    synthesized from documents: hosts m3/m8 serve the same 4-content set
    (a full mirror), m2/m7 share a 6-of-8 subset (a partial mirror), a
    'boiler' fingerprint appears on 8+ hosts so the stop-fingerprint cap
    (max_fp_hosts=4) is exercised on the oracle-checked path, and every
    other page is unique. Join cost is fingerprint-bucketed (≤ cap² per
    fingerprint), never |hosts|²."""
    from frontier_engine import hostctl

    d = _t(spark, sf, "documents")
    tens = F.expr("doc_id div 10")
    content = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("boiler"))
        .when(
            (F.col("doc_id") % 10).isin(3, 8),
            F.concat(F.lit("shared:"), (tens % 4).cast("string")),
        )
        .when(
            F.col("doc_id") % 10 == 2,
            F.concat(F.lit("part:"), (tens % 6).cast("string")),
        )
        .when(
            F.col("doc_id") % 10 == 7,
            F.concat(F.lit("part:"), (tens % 8).cast("string")),
        )
        .otherwise(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")))
    )
    pages = d.select(
        F.concat(F.lit("m"), (F.col("doc_id") % 10).cast("string")).alias(
            "host"
        ),
        content.alias("content"),
    )
    return hostctl.mirror_hosts(
        pages, min_overlap=2, min_jaccard=0.5, max_fp_hosts=4
    )


def q_mirror_families(spark, sf):
    """Mirror replica selection: the pairwise mirror table (same derived
    pages as q_mirror_hosts) grouped into families by connected
    components over STRING host vertices, canonical = lexicographic min
    per family — the 'crawl one replica' decision Bharat & Broder's
    detector exists to feed. The oracle closes the pair graph with a
    recursive reachability CTE and takes min reachable host."""
    from frontier_engine import hostctl

    d = _t(spark, sf, "documents")
    tens = F.expr("doc_id div 10")
    content = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("boiler"))
        .when(
            (F.col("doc_id") % 10).isin(3, 8),
            F.concat(F.lit("shared:"), (tens % 4).cast("string")),
        )
        .when(
            F.col("doc_id") % 10 == 2,
            F.concat(F.lit("part:"), (tens % 6).cast("string")),
        )
        .when(
            F.col("doc_id") % 10 == 7,
            F.concat(F.lit("part:"), (tens % 8).cast("string")),
        )
        .otherwise(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")))
    )
    pages = d.select(
        F.concat(F.lit("m"), (F.col("doc_id") % 10).cast("string")).alias(
            "host"
        ),
        content.alias("content"),
    )
    pairs = hostctl.mirror_hosts(
        pages, min_overlap=2, min_jaccard=0.5, max_fp_hosts=4
    )
    return hostctl.mirror_families(pairs)


def q_politeness_audit(spark, sf):
    """Politeness-compliance audit over an observed fetch log — the
    operational twin of the T1 scheduler: per-host inter-fetch gaps vs
    the host's crawl delay, violation counts, and the compliance gate.
    The log is built deterministically from events (host = user_id % 8,
    fetch instant = event_id as milliseconds); hosts p0..p5 get delays
    300/700/1100 ms from a range-built table, p6/p7 fall back to the
    1000 ms default. Integer millisecond arithmetic — engine-exact; tied
    instants yield order-independent gap multisets, so the report is
    deterministic at any parallelism."""
    from frontier_engine import hostctl

    e = _t(spark, sf, "events")
    log = e.select(
        F.concat(F.lit("p"), (F.col("user_id") % 8).cast("string")).alias(
            "host"
        ),
        F.col("event_id").alias("ts_ms"),
    )
    delays = spark.range(6).select(
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("host"),
        (300 + 400 * (F.col("id") % 3)).cast("long").alias("delay_ms"),
    )
    return hostctl.politeness_audit(log, delays)


def q_crawl_budget(spark, sf):
    """Per-host crawl budget from the trap census (IRLbot BEAST-style
    budget enforcement): trap hosts demote to min_budget, everyone else
    scales with integer content yield base*n_contents DIV n_urls,
    clamped to [10, 100000]. Same deterministic pages derivation as
    q_trap_detection (hosts t0..t39; kind 7 = session-id dup-content
    trap, kind 3 = deep repeated path), so the session-id hosts come
    out demoted and clean hosts near base. Pure projection over the
    census aggregate — no extra shuffle."""
    from frontier_engine import hostctl

    e = _t(spark, sf, "events")
    hostnum = (F.col("user_id") % 40).cast("string")
    eid = F.col("event_id").cast("string")
    kind = (F.col("user_id") % 40) % 8
    url = F.when(
        kind == 7,
        F.concat(
            F.lit("https://t"), hostnum, F.lit(".example/p?session="), eid
        ),
    ).when(
        kind == 3,
        F.concat(F.lit("https://t"), hostnum, F.lit(".example/x/x/x/x/p"), eid),
    ).otherwise(
        F.concat(F.lit("https://t"), hostnum, F.lit(".example/a/"), eid)
    )
    content = F.when(
        kind == 7, F.concat(F.lit("c"), (F.col("event_id") % 3).cast("string"))
    ).otherwise(F.concat(F.lit("b"), eid))
    pages = e.select(
        F.concat(F.lit("t"), hostnum).alias("host"),
        url.alias("url"),
        content.alias("content"),
    )
    return hostctl.crawl_budget(hostctl.trap_census(pages))


def q_dust_params(spark, sf):
    """DUST rewrite-rule mining: per-(host, query parameter), does the
    parameter's value ever change content? URLs derive deterministically
    from events — host h<user_id%5>, path /p<event_id%7>, params
    page=<event_id%3> (content-bearing) and sess=<event_id%13>
    (session id, content-irrelevant), with the param ORDER swapped on
    even event_ids to exercise residual canonicalization (sorted kept
    params). fprint = host*1000 + path*10 + page — independent of sess
    by construction, so 'sess' must come out strip=true and 'page'
    strip=false (its multi-value groups change the fingerprint). Only
    the distinct-keys-per-URL explode expands rows; two map-side
    combined aggregates do the rest."""
    from frontier_engine import hostctl

    e = _t(spark, sf, "events")
    h = (F.col("user_id") % 5).cast("string")
    p = (F.col("event_id") % 7).cast("string")
    page = (F.col("event_id") % 3).cast("string")
    sess = (F.col("event_id") % 13).cast("string")
    qs = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit("page="), page, F.lit("&sess="), sess),
    ).otherwise(F.concat(F.lit("sess="), sess, F.lit("&page="), page))
    pages = e.select(
        F.concat(
            F.lit("https://h"), h, F.lit("/p"), p, F.lit("?"), qs
        ).alias("url"),
        (
            (F.col("user_id") % 5) * 1000
            + (F.col("event_id") % 7) * 10
            + (F.col("event_id") % 3)
        ).cast("long").alias("fprint"),
    )
    return hostctl.dust_params(pages, min_evidence=2)


def q_dust_apply(spark, sf):
    """DUST rule application: mine the per-(host, param) strip rules
    (same deterministic pages as q_dust_params — 'sess' provably
    content-irrelevant, 'page' content-bearing), then rewrite every URL
    by its host's rules and measure the collapse per host: distinct
    URLs before vs after. sess varies mod 13 and the param order flips
    on even event_ids, so stripping sess collapses both the session
    subspace AND the order variants (the lone surviving param has one
    spelling) — n_after = |paths|x|pages| exactly. One broadcast join
    (host-cardinality strip sets) + expression-only array surgery; the
    corpus is never shuffled for the rewrite itself."""
    from frontier_engine import hostctl

    e = _t(spark, sf, "events")
    h = (F.col("user_id") % 5).cast("string")
    p = (F.col("event_id") % 7).cast("string")
    page = (F.col("event_id") % 3).cast("string")
    sess = (F.col("event_id") % 13).cast("string")
    qs = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit("page="), page, F.lit("&sess="), sess),
    ).otherwise(F.concat(F.lit("sess="), sess, F.lit("&page="), page))
    pages = e.select(
        F.concat(
            F.lit("https://h"), h, F.lit("/p"), p, F.lit("?"), qs
        ).alias("url"),
        (
            (F.col("user_id") % 5) * 1000
            + (F.col("event_id") % 7) * 10
            + (F.col("event_id") % 3)
        ).cast("long").alias("fprint"),
    )
    rules = hostctl.dust_params(pages, min_evidence=2)
    rw = hostctl.apply_dust(pages.withColumn("_before", F.col("url")), rules)
    return (
        rw.select(
            F.regexp_extract(
                "_before", r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1
            ).alias("host"),
            F.col("_before"),
            F.col("url"),
        )
        .groupBy("host")
        .agg(
            F.countDistinct("_before").cast("long").alias("n_before"),
            F.countDistinct("url").cast("long").alias("n_after"),
        )
    )


def q_pld_stats(spark, sf):
    """Pay-level-domain aggregation (IRLbot budgets per PLD, not per
    host): hosts derive from events across plain and multi-part public
    suffixes — registrant r<user_id%20>, TLD rotating .com/.co.uk/
    .com.vn/.io by user_id%4, subdomain ''/www./s<event_id%5>. by
    event_id%3 — then canon.registrable_domain_col collapses every
    subdomain of one registrant+suffix into one PLD row with distinct-
    host and page counts. 'example.co.uk' must NOT collapse to 'co.uk';
    the oracle re-implements the suffix rule with list slicing."""
    from frontier_engine.canon import registrable_domain_col

    e = _t(spark, sf, "events")
    tld = (
        F.when(F.col("user_id") % 4 == 0, F.lit(".com"))
        .when(F.col("user_id") % 4 == 1, F.lit(".co.uk"))
        .when(F.col("user_id") % 4 == 2, F.lit(".com.vn"))
        .otherwise(F.lit(".io"))
    )
    sub = (
        F.when(F.col("event_id") % 3 == 0, F.lit(""))
        .when(F.col("event_id") % 3 == 1, F.lit("www."))
        .otherwise(
            F.concat(F.lit("s"), (F.col("event_id") % 5).cast("string"), F.lit("."))
        )
    )
    host = F.concat(
        sub, F.lit("r"), (F.col("user_id") % 20).cast("string"), tld
    )
    return (
        e.select(host.alias("host"))
        .select("host", registrable_domain_col(F.col("host")).alias("pld"))
        .groupBy("pld")
        .agg(
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.count(F.lit(1)).cast("long").alias("n_pages"),
        )
    )


def q_opic(spark, sf):
    """Synchronous-batch OPIC (Abiteboul et al., WWW 2003) — the online
    crawl-importance estimate: 3 rounds of cash distribution with a
    uniform virtual-root rebate for dangling nodes, over the same
    deterministic ~100-node orders-derived graph as q_pagerank. Returns
    (node, cash, history) rounded to 6 decimals; total cash is invariant
    at 1 and banked history grows by exactly 1 per round (the pytest
    pins both plus exact values vs a pure-python twin). One hash join +
    one map-side-combined sum per round; the DuckDB oracle unrolls the
    same 3 rounds as chained CTEs."""
    from frontier_engine.graph import opic

    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return opic(edges, iterations=3).select(
        "node", F.round("cash", 6).alias("cash"),
        F.round("history", 6).alias("history"),
    )


def q_redirects(spark, sf):
    """Redirect-chain resolution by pointer doubling (log2(K) self-joins,
    graph.resolve_redirects). Nodes n<k> for distinct k = event_id % 400;
    chain edges n<k> -> n<k-1> when k%8 != 0 (so each block of 8 is a
    chain into terminal n<base>), and blocks with base % 40 == 0 close
    into an 8-cycle via n<base> -> n<base+7>. With max_hops=8 chain
    nodes resolve to their terminal with exact hop counts and cycle
    blocks come out resolved=false/NULL — the oracle re-derives both via
    a bounded recursive CTE."""
    from frontier_engine.graph import resolve_redirects

    e = _t(spark, sf, "events")
    ks = e.select((F.col("event_id") % 400).alias("k")).distinct()
    n = lambda c: F.concat(F.lit("n"), c.cast("string"))  # noqa: E731
    chain = ks.filter(F.col("k") % 8 != 0).select(
        n(F.col("k")).alias("src"), n(F.col("k") - 1).alias("dst")
    )
    cyc = ks.filter((F.col("k") % 8 == 0) & (F.col("k") % 40 == 0)).select(
        n(F.col("k")).alias("src"), n(F.col("k") + 7).alias("dst")
    )
    return resolve_redirects(chain.unionByName(cyc), max_hops=8)


def q_surt(spark, sf):
    """SURT keying (the Common Crawl / OpenWayback CDX index sort key):
    URLs derive deterministically from events — host h<user_id%10>
    .example with a 'www.' prefix on even event_ids (SURT strips it),
    port :8080 on event_id%5==0 (SURT keeps it), path /p<event_id%7>,
    and params a=<user_id%3>, b=<event_id%4> with the order flipped on
    event_id%3==0 (SURT sorts them). Grouping by the key therefore
    collapses www- and param-order-variants while keeping port
    variants distinct — n_urls > 1 per key is the collapse evidence.
    Expression-only (canon.surt_col, whole-stage codegen) + one
    aggregate."""
    from frontier_engine.canon import surt_col

    e = _t(spark, sf, "events")
    u10 = (F.col("user_id") % 10).cast("string")
    www = F.when(F.col("event_id") % 2 == 0, F.lit("www.")).otherwise(F.lit(""))
    port = F.when(F.col("event_id") % 5 == 0, F.lit(":8080")).otherwise(F.lit(""))
    a = F.concat(F.lit("a="), (F.col("user_id") % 3).cast("string"))
    b = F.concat(F.lit("b="), (F.col("event_id") % 4).cast("string"))
    qs = F.when(F.col("event_id") % 3 == 0, F.concat(b, F.lit("&"), a)).otherwise(
        F.concat(a, F.lit("&"), b)
    )
    url = F.concat(
        F.lit("https://"), www, F.lit("h"), u10, F.lit(".example"), port,
        F.lit("/p"), (F.col("event_id") % 7).cast("string"), F.lit("?"), qs,
    )
    return (
        e.select(url.alias("url"), surt_col(url).alias("surt"))
        .groupBy("surt")
        .agg(
            F.countDistinct("url").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
        )
    )


def q_shard_plan(spark, sf):
    """Balanced host→shard plan from observed page mass: the distributed
    exact prefix sum over host-cardinality weights (range partition →
    per-partition sums collected as offsets → partition-local cumsum),
    never a global row sort. Weights derive from events (host =
    w<user_id % 40>, weight = page count); 8 shards. Every output is a
    BIGINT fold plus one integer division — engine-exact, and a pytest
    pins that the plan is identical at any partition count."""
    from frontier_engine.shardplan import host_shard_plan

    e = _t(spark, sf, "events")
    weights = e.groupBy(
        F.concat(F.lit("w"), (F.col("user_id") % 40).cast("string")).alias(
            "host"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("weight"))
    return host_shard_plan(weights, 8)


def q_hits(spark, sf):
    """Hub/authority scores for frontier prioritization: 5-iteration
    HITS (Kleinberg, L1-normalized half-steps — pure IEEE folds, no
    sqrt) over the SAME deterministic ~100-node orders-derived graph as
    q_pagerank. Each half-step is ONE edge ⋈ score join + map-side
    combined sum; the normalizer is a 1-row aggregate folded back in as
    a driver literal.
    The DuckDB oracle unrolls the identical iterations as chained CTEs;
    scores round to 6 decimals (values are O(1/N), accumulated IEEE
    error ~1e-15)."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    s = GR.hits(edges, iterations=5)
    return s.select(
        "node", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


def q_link_census(spark, sf):
    """Host-graph outlink census (the nepotistic-link spam signal):
    per source host, total/intra/cross outlinks, distinct destination
    hosts, and the intra-host ratio. Edges derive deterministically
    from events (src host = user_id % 20, dst host = event_id % 23,
    with every 11th destination NULL to exercise the unparseable-target
    path: counted cross, excluded from n_dst_hosts). Expression-only
    features, ONE map-side-combined aggregate at host cardinality."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias(
            "src_host"
        ),
        F.when(
            F.col("event_id") % 11 != 0,
            F.concat(F.lit("h"), (F.col("event_id") % 23).cast("string")),
        ).alias("dst_host"),
    )
    return GR.link_census(edges)


def q_anchor_stats(spark, sf):
    """Top-k anchor texts per link target — the web's free labeling
    signal (PageRank §2.2 anchor propagation): one (dst, anchor)
    map-side-combined count, then a rank window over DISTINCT anchors
    per target (mega-targets collapse before the window, so inlink
    skew cannot form a hot partition). Targets derive from events
    (dst = u<event_id % 50>), anchors from event_type with every 13th
    blanked to exercise the empty-anchor drop; ties break
    lexicographically so the top-2 set is parallelism-independent."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("u"), (F.col("event_id") % 50).cast("string")).alias(
            "dst"
        ),
        F.when(F.col("event_id") % 13 != 0, F.col("event_type")).otherwise(
            F.lit("")
        ).alias("anchor"),
    )
    return GR.anchor_stats(edges, k=2)


BM25_TERMS = ["filter", "hash", "query"]


def q_bm25_search(spark, sf):
    """BM25 ranked retrieval over term-frequency postings (index.tf_postings
    + index.bm25): the full-text ranking upgrade of the reference's
    websearch_to_tsquery lookup (init.sql:149-156). Corpus stats and the
    per-term idf table are broadcast; only isin-filtered candidate
    postings flow through the scoring join. Scores round to 6 decimals
    (the per-doc sum folds 3 doubles — cross-engine drift ≤ ulps)."""
    from frontier_engine import index as IX

    d = _t(spark, sf, "documents")
    tf = IX.tf_postings(d, n=1)
    out = IX.bm25(tf, BM25_TERMS, k1=1.2, b=0.75)
    return out.select("doc_id", "n_terms", F.round("score", 6).alias("score"))


_MIME_PREFIX_HEX = [
    "89504E470D0A1A0A",          # PNG magic
    "FFD8FFE000104A464946",      # JPEG SOI + APP0/JFIF
    "474946383961",              # GIF89a
    "52494646DEADBEEF57415645",  # RIFF <size> WAVE
    "000000186674797069736F6D",  # MP4: [size] ftyp isom
    "424DDEADBEEF",              # BMP
    "255044462D312E37",          # %PDF-1.7
    "1F8B08",                    # gzip
    "3C21444F43545950452068746D6C3E",  # <!DOCTYPE html>
    "",                          # bare text -> octet-stream
]


def q_mime_sniff(spark, sf):
    """Content-type triage by magic bytes (multimodal.sniff_mime_col): the
    expression-only CASE a crawler runs on every fetched body before
    routing to the right decode path. Payloads plant a rotating real
    signature prefix (doc_id % 10: PNG/JPEG/GIF/WAV-in-RIFF/MP4-ftyp/BMP/
    PDF/gzip/HTML/none) ahead of the document's own bytes, so every probe
    offset — including the RIFF inner fourcc at offset 9 and ftyp at
    offset 5 — is exercised and hash-checked against the same CASE over
    hex(payload) in DuckDB."""
    d = _t(spark, sf, "documents")
    prefixes = F.array(*[F.lit(h) for h in _MIME_PREFIX_HEX])
    payload = F.concat(
        F.unhex(F.element_at(prefixes, (F.col("doc_id") % 10 + 1).cast("int"))),
        F.encode(F.col("text"), "UTF-8"),
    )
    return d.select(
        "doc_id", MM.sniff_mime_col(payload).alias("mime")
    )


def q_char_entropy(spark, sf):
    """Character-entropy gibberish signal (textops.char_entropy): Shannon
    entropy of the codepoint distribution per document via one vectorized
    np.unique pass per Arrow batch — 3 scalars/doc out, no corpus-char
    explode. n_chars/n_distinct_chars are exact integers (a strong gate on
    the distribution itself); entropy_bits rounds to 6 decimals (libm
    log2 agrees cross-engine to ulps)."""
    d = _t(spark, sf, "documents")
    out = TX.char_entropy(d)
    return out.select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        F.round("entropy_bits", 6).alias("entropy_bits"),
    )


def q_degree_hist(spark, sf):
    """Link-graph degree distribution (graph.degree_hist): floor(log2(deg))
    histogram per direction — the power-law census over the same
    events-derived edge set as link_census (null dst = unparseable target,
    excluded). Integer-exact: the bucket is BIGINT bit length, no libm."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("src"),
        F.when(
            F.col("event_id") % 11 != 0,
            F.concat(F.lit("h"), (F.col("event_id") % 23).cast("string")),
        ).alias("dst"),
    )
    return GR.degree_hist(edges)


def q_gopher_gate(spark, sf):
    """The Gopher quality-rule gate (Rae et al. 2021 §A1.1 thresholds) as
    one whole-stage-codegen pass (textops.gopher_gate): word count, mean
    word length, symbol ratio, bullet/ellipsis line fractions, alphabetic
    word fraction, stop-word floor, and the conjunction `keep`. Every
    ratio is one exact integer division — bit-identical cross-engine, no
    rounding anywhere."""
    d = _t(spark, sf, "documents")
    return TX.gopher_gate(d)


BPE_MERGES = [
    # rank-ordered; includes a 3-deep cascade (h+a -> ha+s -> has+h) so the
    # oracle's replace chain must fire in exactly this order to match
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("h", "a"), ("ha", "s"), ("has", "h"),
    ("t", "a"), ("b", "a"), ("l", "e"),
]


def q_bpe_encode(spark, sf):
    """BPE tokenizer APPLICATION (textops.bpe_token_counts — the apply half
    of the bpe_pairs training statistic): per-doc word and BPE-token
    accounting under a rank-ordered merge list. Vocabulary-first: the
    merge loop runs per DISTINCT word; the token stream only ever sees an
    integer join-back. The DuckDB oracle recomputes the identical
    semantics as a chain of delimited string replaces, so merge ORDER
    (incl. the 3-deep cascade) is inside the hash check. Exact integers —
    no rounding."""
    d = _t(spark, sf, "documents")
    return TX.bpe_token_counts(d, BPE_MERGES)


def _bpe_oracle_sql() -> str:
    """Delimited-replace-chain twin of textops.bpe_encode_word: each word
    becomes <c><c>...<c> and each merge (l, r) in rank order is ONE
    replace('<l><r>' -> '<lr>') — non-overlapping left-to-right in both
    engines; token count = number of '<' delimiters left."""
    expr = (
        "array_to_string(list_transform(string_split(word, ''),"
        " c -> '<' || c || '>'), '')"
    )
    for left, right in BPE_MERGES:
        expr = f"replace({expr}, '<{left}><{right}>', '<{left}{right}>')"
    return f"""
            WITH w AS (
                SELECT doc_id, unnest({_TOKS}) AS word FROM documents),
            enc AS (
                SELECT doc_id, {expr} AS s FROM w),
            tok AS (
                SELECT doc_id,
                       CAST(len(s) - len(replace(s, '<', '')) AS BIGINT) AS n_tok
                FROM enc)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
            FROM tok GROUP BY doc_id
        """


def q_vocab_coverage(spark, sf):
    """Vocabulary-fit census (textops.vocab_coverage): per-doc OOV rate
    against the corpus' own top-10 token vocabulary (count DESC, token ASC
    tie-break → deterministic). Vocabulary derived once and broadcast;
    oov_rate is one integer division in float64 — bit-identical, no
    rounding needed."""
    d = _t(spark, sf, "documents")
    return TX.vocab_coverage(d, vocab_size=10)


def q_boilerplate(spark, sf):
    """Per-host boilerplate strip (CCNet/jusText signal): a paragraph
    occurring in >= 3 distinct documents of the SAME host is template
    noise — strip every copy, not all-but-one (contrast paragraph_dedup,
    which keeps first occurrences corpus-wide). Same deterministic
    3-word-chunk derivation as q_paragraph_dedup; the tiny shared fixture
    vocabulary makes real per-source repeats. Doc-frequency is a
    two-level partial aggregate (distinct (host,hash,doc) -> count), the
    oracle counts the paragraph strings themselves, so hash collisions
    would surface. Output includes the reassembled clean_text, so chunk
    ORDER is oracle-checked too."""
    d = _t(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(3.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * 3 + 1, 3), " "),
    )
    aug = d.select(
        "doc_id", "source", F.array_join(paras, "\n").alias("text")
    )
    return TX.boilerplate_strip(
        aug, host_col="source", sep="\n", min_docs=3
    )


def q_bigram_surprisal(spark, sf):
    """Second-order CCNet-style LM quality triage: per-doc conditional
    surprisal bits(c(prev·)) - bits(c(prev,term)) from corpus-fit bigram
    counts — catches common-word word-salad that unigram surprisal
    cannot (order-destroying spam keeps its unigram profile but loses
    its bigrams). Integer-exact end to end (bit lengths, integer sums,
    one exact division for the mean); tertiles per (lang, shard) cell as
    in unigram_surprisal."""
    d = _t(spark, sf, "documents")
    return TX.bigram_surprisal(d)


def q_sessionize(spark, sf):
    """Gap-based sessionization (6h gap): the batch twin of a streaming
    session window, and the shape host-visit politeness epochs take in a
    crawl ledger. Boundaries compare integer microsecond epochs — never
    float seconds — so session splits are engine-exact; one window + one
    same-key aggregate (single Exchange)."""
    e = _t(spark, sf, "events")
    return ops.sessionize(e, key_col="user_id", ts_col="ts", gap_s=21600)


def q_zorder(spark, sf):
    """Morton/Z-order clustering key (UB-tree, Bayer 1997 — the Delta
    OPTIMIZE ZORDER analogue) over two bucket-reduced dimensions
    (host-ish user_id and epoch-ish event_id): pure unrolled bit
    interleave in one codegen expression. The layout twin
    (shardplan.zorder_write) range-partitions on this key so parquet
    min/max footer stats stay tight on BOTH dimensions — pruning on the
    non-leading axis, which a lexicographic sort cannot give (asserted
    quantitatively in tests/test_shardplan.py)."""
    from frontier_engine.shardplan import zorder_key

    e = _t(spark, sf, "events")
    d1 = (F.col("user_id") % 256).cast("long")
    d2 = (F.col("event_id") % 256).cast("long")
    return e.select(
        "event_id",
        d1.alias("d1"),
        d2.alias("d2"),
        zorder_key([d1, d2], bits=8).alias("zkey"),
    )


def q_adaptive_delay(spark, sf):
    """AIMD politeness adaptation (hostctl.adaptive_delay): per-host p95
    fetch latency (exact counting quantile) drives the next epoch's
    crawl delay — double when the host is backing up past target,
    halve (clamped) when healthy; TCP congestion control applied to the
    scheduler. Synthetic fetch log adds a per-host latency offset so the
    fixture crosses the target in both directions; every number is
    integer arithmetic after one IEEE floor(value*10)."""
    from frontier_engine import hostctl

    e = _t(spark, sf, "events")
    k = F.col("user_id") % 20
    log = e.select(
        F.concat(F.lit("h"), k.cast("string")).alias("host"),
        (F.floor(F.col("value") * 10) + k * 80).cast("long").alias(
            "latency_ms"
        ),
    )
    delays = (
        e.select(k.alias("k"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("k").cast("string")).alias("host"),
            (1 + F.col("k") % 4).cast("long").alias("delay_s"),
        )
    )
    return hostctl.adaptive_delay(log, delays, target_ms=2000)


def q_quantiles(spark, sf):
    """Exact per-group p50/p90/p99 by counting (ops.grouped_quantiles) —
    the fetch-latency SLO census without percentile_approx (whose sketch
    state is not cross-engine reproducible) and without sorting raw
    occurrences: the window runs over the (group, value) COUNT table.
    Target ranks are pure integer arithmetic ((n*pct+99) DIV 100), so
    boundary rows can never flip between engines."""
    e = _t(spark, sf, "events")
    return ops.grouped_quantiles(e, ["event_type"], "value", (50, 90, 99))


def q_cms_counts(spark, sf):
    """Count-min frequency sketch (Cormode & Muthukrishnan 2005) — the
    frequency companion to q_hll_distinct's cardinality sketch: per
    event_type, 4x256 integer counters summarize the key stream; every
    distinct key is then point-queried and compared to its exact count.
    One-sided error (overcount >= 0 always — the oracle checks the bound
    row by row, not just the arithmetic). Portable md5 bit-slice hashes,
    all-BIGINT state: engine-exact, mergeable by cell-wise sum."""
    e = _t(spark, sf, "events")
    stream = e.select(
        "event_type", F.col("user_id").cast("string").alias("u")
    )
    cells = SK.cms_cells(stream, ["event_type"], "u")
    probes = stream.select("event_type", F.col("u").alias("key")).distinct()
    est = SK.cms_lookup(cells, probes, ["event_type"])
    exact = stream.groupBy(
        "event_type", F.col("u").alias("key")
    ).agg(F.count("*").cast("long").alias("n_exact"))
    return est.join(exact, ["event_type", "key"]).select(
        "event_type",
        "key",
        "est",
        "n_exact",
        (F.col("est") - F.col("n_exact")).cast("long").alias("overcount"),
    )


def q_soft404(spark, sf):
    """Soft-404 detection (Bar-Yossef et al., WWW 2004): flag pages
    near-identical to their host's known-error signature — the standard
    defense against hosts that answer 200 for missing pages. Signature
    table is one deterministic template per source; fixture injection
    plants pure-template pages (doc_id%11==5, jacc=1), partially-
    polluted pages (%11==7, template prefix + 8 original words), and
    leaves the rest clean. Token-set Jaccard is an exact integer
    rational; the whole page side is codegen'd array arithmetic under a
    broadcast join — zero page-side shuffle."""
    from frontier_engine import hostctl

    d = _t(spark, sf, "documents")
    tpl_text = F.concat(
        F.lit("error 404 page not found on "),
        F.col("source"),
        F.lit(" server"),
    )
    tpl = d.select("source").distinct().select(
        "source", tpl_text.alias("template")
    )
    first8 = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    aug = d.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 11 == 5, tpl_text)
        .when(
            F.col("doc_id") % 11 == 7,
            F.concat(F.lit("page not found "), first8),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return hostctl.soft404_detect(aug, tpl, host_col="source")


def q_hll_distinct(spark, sf):
    """Per-lineage-cell distinct-URL census as a HyperLogLog sketch
    (Flajolet et al. 2007) — the sub-linear, MERGEABLE form of the
    north-star's per-partition "URLs emitted/deduped" lineage counter.
    Engine-exact (not just statistically equivalent): portable md5-prefix
    hash, integer bit-length ranks, harmonic sum kept as an exact BIGINT
    (``s_scaled``), one IEEE divide for the estimate, libm ln only in the
    small-range correction (rounded 6 dp, repo convention). The exact
    distinct count and the relative error ride along, so the oracle
    checks the sketch's accuracy claim too, not just its arithmetic.
    Synthesized URL key = host-bucketed user x event (10^4 distinct at
    sf0.01 -> raw-estimator path; 10^3 at sf0.001 -> linear-counting
    path: both branches oracle-covered across the driver's SFs)."""
    e = _t(spark, sf, "events")
    url = F.concat(
        F.lit("https://h"),
        (F.col("user_id") % 50).cast("string"),
        F.lit(".example/e"),
        F.col("event_id").cast("string"),
    )
    d = e.select("event_type", url.alias("url"))
    est = SK.hll_distinct(d, ["event_type"], "url", p=8)
    exact = d.groupBy("event_type").agg(
        F.countDistinct("url").cast("long").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "v_zero",
        "s_scaled",
        "est",
        "n_exact",
        F.round(
            (F.col("est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )


def q_reciprocity(spark, sf):
    """Per-host link reciprocity (graph.reciprocity): the mutual-link
    nepotism census over the events-derived host graph — link farms show
    recip_rate near 1.0 and the frontier demotes them like mirror
    replicas. One distinct over host pairs + a co-partitioned reversed
    self-join; counts exact, the rate is one double division rounded to
    6 decimals."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("src"),
        F.when(
            F.col("event_id") % 11 != 0,
            F.concat(F.lit("h"), (F.col("event_id") % 23).cast("string")),
        ).alias("dst"),
    )
    out = GR.reciprocity(edges)
    return out.select(
        "node", "n_out", "n_recip", F.round("recip_rate", 6).alias("recip_rate")
    )


def q_rrf_hybrid(spark, sf):
    """Hybrid lexical+dense retrieval by reciprocal-rank fusion
    (index.rrf_fuse, RRF after Cormack et al. SIGIR 2009): channel A is
    the BM25 top-20 over BM25_TERMS (ranked by rounded score with doc_id
    tie-break — the global top-k runs as TakeOrderedAndProject via
    orderBy().limit(), never a single-partition corpus window; the rank
    window then sees only 20 rows), channel B the exact cosine top-20
    against doc 0's embedding (ann.brute_force_topk; vec_id ≡ doc_id in
    the fixed corpus). Each channel contributes 1/(60+rank); the per-doc
    sum folds at most TWO doubles (commutative — partitioning can't
    reorder it), rounded to 6."""
    from frontier_engine import index as IX

    d = _t(spark, sf, "documents")
    bm = IX.bm25(IX.tf_postings(d, n=1), BM25_TERMS, k1=1.2, b=0.75)
    bm20 = bm.orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    ).limit(20)
    bm_rank = bm20.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.round("score", 6).desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )
    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    dense_rank = ann.brute_force_topk(emb, q0, k=20).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    fused = IX.rrf_fuse({"bm25": bm_rank, "dense": dense_rank}, k0=60)
    return fused.select("doc_id", "n_channels", F.round("rrf", 6).alias("rrf"))


def q_budget_cut(spark, sf):
    """Token-budget corpus curation (textops.budget_cut): keep the
    highest-quality documents until half the corpus' tokens are spent —
    the greedy rank-and-take cut of LM-data recipes, run as a distributed
    range-partitioned prefix sum (per-range totals broadcast as offsets;
    the only corpus-sized movement is ONE range exchange — never a
    single-partition global window). cum_tokens is exact int64; quality
    is the engine's 6-decimal-rounded score, doc_id breaks ties, so the
    kept set is deterministic at any parallelism."""
    d = _t(spark, sf, "documents")
    base = d.select(
        "doc_id",
        TX.quality_score_col(F.col("text")).alias("quality"),
        TX.token_count_col(F.col("text")).cast("long").alias("n_tokens"),
    )
    budget = base.agg(F.sum("n_tokens")).first()[0] // 2
    return TX.budget_cut(base, int(budget), n_ranges=8)


def q_quality_calibrate(spark, sf):
    """Per-language empirical-CDF calibration of the quality score
    (textops.quality_calibrate): pct_rank = P(quality ≤ x | lang),
    computed by counting over (lang, value) cells — the corpus never
    sorts; the window runs over distinct-value cardinality and a join
    carries the rank back. The rank is the exact rational cum_le/n_lang
    rounded to 6 (the oracle's cume_dist computes the identical
    division)."""
    d = _t(spark, sf, "documents")
    base = d.select(
        "doc_id", "lang", TX.quality_score_col(F.col("text")).alias("quality")
    )
    out = TX.quality_calibrate(base)
    return out.select(
        "doc_id", "lang", "quality", F.round("pct_rank", 6).alias("pct_rank")
    )


def q_fairness_gini(spark, sf):
    """Per-PLD Gini of fetch allocation across hosts
    (hostctl.fairness_gini): the politeness-fairness census — G=0 equal
    slots, G→1 monopolized (IRLbot §5's budget-drift signal). Fetch
    events map onto hosts h0..h39 grouped into 5 synthetic PLDs; all
    sums exact int64, the coefficient is one division rounded 6."""
    e = _t(spark, sf, "events")
    from frontier_engine import hostctl

    fetches = e.select(
        F.concat(F.lit("p"), (F.col("user_id") % 5).cast("string")).alias("pld"),
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias("host"),
    )
    out = hostctl.fairness_gini(fetches)
    return out.select(
        "pld", "n_hosts", "n_fetches", F.round("gini", 6).alias("gini")
    )


def q_ann_sq8(spark, sf):
    """Scalar-quantized SQ8 ANN with exact rerank (ann.sq8_topk): the
    memory-bound scale tier — the corpus scan reads int8 codes + two
    doubles (~4× fewer bytes than fp vectors), a 4k shortlist per query
    is then reranked with EXACT cosine. On this corpus the shortlist
    provably spans the true top-5 (verified at 3 SFs), so the output
    equals the brute-force oracle deterministically — the same
    containment-proof pattern as the LSH/IVF tiers."""
    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = ann.sq8_topk(emb, q, k=5, shortlist_factor=4)
    return top.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_outlink_entropy(spark, sf):
    """Per-host outlink diversity entropy (graph.outlink_entropy): the
    WEBSPAM link-diversity signal over the events-derived host graph —
    link farms pour many edges into few destinations (low entropy per
    edge volume). Counts exact int64; entropy_bits is a short libm fold
    rounded to 6."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("src"),
        F.when(
            F.col("event_id") % 11 != 0,
            F.concat(F.lit("h"), (F.col("event_id") % 23).cast("string")),
        ).alias("dst"),
    )
    out = GR.outlink_entropy(edges)
    return out.select(
        "node", "n_edges", "n_dst", F.round("entropy_bits", 6).alias("entropy_bits")
    )


def q_semantic_dedup(spark, sf):
    """SemDeDup (ann.semantic_dedup, Abbas et al. 2023): k-means cluster
    the embedding corpus, then within-cluster pairwise cosine >= 0.99
    drops every lower-id duplicate — the embedding-space dedup that
    catches templated/syndicated text lexical dedup misses. Plants exact
    duplicates (vec_id+100000 of vec_id<20) like q_embedding_near_dup;
    identical vectors provably land in the SAME cluster (same argmax),
    and random 64-dim embeddings have no 0.99-cosine pairs, so the
    within-cluster greedy equals the global one and the DuckDB oracle is
    the exact global NOT-EXISTS brute force. Assignment is one broadcast-
    centroid Arrow pass; the pairwise stage shuffles on cluster only."""
    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    dup = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    planted = emb.unionByName(dup)
    cents = ann.train_ivf_centroids(planted, dim=64, n_centroids=8)
    out = ann.semantic_dedup(planted, cents, threshold=0.99)
    return out.select("id", "keep")


def q_collocations(spark, sf):
    """Corpus collocation census (textops.collocations): PMI over adjacent
    token bigrams seen >= 5 times — the phrase-detection signal (Church &
    Hanks 1990; word2vec's word2phrase step). Counts are exact int64;
    lift = n_pair*N^2/(M*n_w1*n_w2) is ONE int64->double cast pair + one
    division, emitted unrounded (bit-identical across engines); pmi =
    round(log2(lift), 6) is the only libm touch. Two explodes, two
    map-side-combined hash aggs, vocabulary-keyed joins, no windows."""
    d = _t(spark, sf, "documents")
    return TX.collocations(d.select("text"), min_count=5)


def q_margin_mine(spark, sf):
    """Margin-based bitext/pair mining (ann.margin_mine, Artetxe & Schwenk
    2019 — the CCMatrix recipe): even vec_ids < 200 form the mining batch
    X, odd vec_ids the pool Y; each x's best y is scored by the ratio
    margin against both endpoints' avg top-4 neighborhoods. Cosines use
    the brute_force_topk IEEE fold; the margin is computed on exact
    floor(cos*1e6) fixed-point sums with one integral division
    (margin_ppm), so no float accumulation exists anywhere — the DuckDB
    twin matches hash-exact. One broadcast of X, one scan of Y, two
    rank windows over the scored ids."""
    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    xs = emb.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 200))
    ys = emb.filter(F.col("vec_id") % 2 == 1)
    return ann.margin_mine(xs, ys, k=4)


def q_setsim_join(spark, sf):
    """Exact prefix-filtered set-similarity self-join (textops.
    set_similarity_join, Chaudhuri/PPJoin/Vernica lineage): every doc
    pair with 3-shingle Jaccard >= 1/2, zero false negatives — the
    provable-dedup sibling of minhash_near_dup. Selection is ALL-integer
    (rational threshold, cross-multiplied compares, integer ceil via
    div), so the DuckDB brute-force all-pairs oracle must match
    hash-exact; the prefix filter only prunes the candidate join."""
    d = _t(spark, sf, "documents")
    return TX.set_similarity_join(d.select("doc_id", "text"), t_num=1, t_den=2)


def q_lpa(spark, sf):
    """Label-propagation communities (graph.label_propagation, Raghavan
    2007 / GraphX semantics) over the events-derived host graph, 3
    synchronous rounds: density clusters for link-farm/site-family
    census — a different fixpoint than hash-min CC (which only finds
    reachability). Synchronous rounds + (count DESC, label ASC)
    tie-break make the labels a pure function of the graph, so the
    DuckDB oracle is the same 3 rounds unrolled as CTEs."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("src"),
        F.when(
            F.col("event_id") % 11 != 0,
            F.concat(F.lit("h"), (F.col("event_id") % 23).cast("string")),
        ).alias("dst"),
    )
    return GR.label_propagation(edges, rounds=3)


def q_phrase_search(spark, sf):
    """Exact phrase query "big order scan" over a positional inverted
    index (index.build_positional_postings + index.phrase_search):
    postings fetched per term, positions shifted by -i and
    array_intersect'ed down to surviving starts — 3 posting-list reads
    and doc_id-keyed joins, never a corpus rescan. Counts exact; the
    DuckDB oracle recounts adjacent-token windows directly on the
    text."""
    from frontier_engine import index as IX

    d = _t(spark, sf, "documents")
    postings = IX.build_positional_postings(d.select("doc_id", "text"))
    return IX.phrase_search(postings, ["big", "order", "scan"])


def q_kcore(spark, sf):
    """k-core decomposition (graph.coreness, Lü et al. 2016 H-index
    iteration) over the events-derived host graph, 4 synchronous
    sweeps: degeneracy layers — dense link farms live in deep cores,
    organic hosts in shallow ones. Integer H-index updates are a pure
    function of the graph per round, so the DuckDB oracle is the same
    4 rounds unrolled (row_number desc + count FILTER v >= rn)."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("src"),
        F.when(
            F.col("event_id") % 11 != 0,
            F.concat(F.lit("h"), (F.col("event_id") % 23).cast("string")),
        ).alias("dst"),
    )
    return GR.coreness(edges, rounds=4)


def q_triangles(spark, sf):
    """Per-host triangle + clustering-coefficient census (graph.
    triangle_counts, Becchetti KDD'08 spam signal) over the
    events-derived host graph: degree-ordered edge orientation makes
    every triangle ONE wedge at its minimum corner (out-degrees bounded
    by sqrt(m) — no hub squares its neighborhood), then one wedge
    self-join + one membership semi-join. All counts integer; the
    clustering coefficient is one exact int64->double division, so the
    brute-force DuckDB triple-join oracle matches hash-exact."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("src"),
        F.when(
            F.col("event_id") % 11 != 0,
            F.concat(F.lit("h"), (F.col("event_id") % 23).cast("string")),
        ).alias("dst"),
    )
    return GR.triangle_counts(edges)


def q_bowtie(spark, sf):
    """Broder bow-tie census (graph.scc + graph.bowtie, WWW 2000): SCC
    decomposition by the Multistep trim + FW-coloring method (Slota
    IPDPS'14), then CORE/IN/OUT/TUBE/TENDRIL/DISC classification via
    four wavefront BFS passes from the largest SCC. All labels exact
    strings — the DuckDB oracle computes the full recursive-CTE
    transitive closure and the identical region CASE, hash-exact.
    The graph layers an orders-derived 120-node cyclic web (the SCC
    body) with events-derived source-only 'x' feeders (the IN side)
    and sink-only 'y' leaves (OUT-side leaves / tendrils)."""
    o = _t(spark, sf, "orders")
    e = _t(spark, sf, "events")
    body = o.filter(F.col("o_orderkey") % 91 == 0).select(
        F.concat(F.lit("n"), (F.col("o_custkey") % 120).cast("string")).alias("src"),
        F.concat(
            F.lit("n"), ((F.col("o_orderkey") / 91).cast("long") % 120).cast("string")
        ).alias("dst"),
    )
    feeders = e.filter(F.col("event_id") % 151 == 0).select(
        F.concat(F.lit("x"), (F.col("event_id") % 13).cast("string")).alias("src"),
        F.concat(F.lit("n"), (F.col("user_id") % 120).cast("string")).alias("dst"),
    )
    leaves = e.filter(F.col("event_id") % 173 == 0).select(
        F.concat(F.lit("n"), (F.col("user_id") % 120).cast("string")).alias("src"),
        F.concat(F.lit("y"), (F.col("event_id") % 17).cast("string")).alias("dst"),
    )
    return GR.bowtie(body.unionByName(feeders).unionByName(leaves))


def q_cocitation(spark, sf):
    """Related-host discovery by co-citation (graph.cocitation, Dean &
    Henzinger WWW'99): pairs of pages cited by >=3 common citers, with
    exact neighbor-set Jaccard. Wedge self-join on the citing page with
    a max_fanout=64 degeneracy cap (directory-page guard) — the oracle
    applies the identical cap via a HAVING pre-filter."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("u"), (F.col("event_id") % 400).cast("string")).alias("src"),
        F.concat(F.lit("d"), (F.col("user_id") % 40).cast("string")).alias("dst"),
    )
    return GR.cocitation(edges, min_common=3, max_fanout=64)


def q_fuzzy_join(spark, sf):
    """Entity resolution across catalogs (textops.edit_distance_join,
    Ed-Join VLDB'08): match part names against a deterministically
    typo'd variant catalog (one char deleted at p_partkey mod len) with
    Levenshtein <= 2. Exact — q-gram prefix filtering guarantees zero
    false negatives, verified by built-in levenshtein; the DuckDB
    oracle brute-forces the banded cross join with its own
    levenshtein()."""
    p = _t(spark, sf, "part")
    left = p.filter(F.col("p_partkey") % 7 == 0).select(
        F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_name").alias("val"),
    )
    right = p.filter(F.col("p_partkey") % 3 == 0).select(
        F.concat(F.lit("q"), F.col("p_partkey").cast("string")).alias("id"),
        F.concat(
            F.expr("substring(p_name, 1, p_partkey % length(p_name))"),
            F.expr("substring(p_name, p_partkey % length(p_name) + 2, 300)"),
        ).alias("val"),
    )
    return TX.edit_distance_join(left, right, max_dist=2)


def q_kn_score(spark, sf):
    """Kneser-Ney bigram LM quality scoring (textops.kn_bigram_score) —
    the smoothing CCNet's KenLM filter uses, self-trained on the scored
    corpus. Per distinct bigram the probability is integerized once
    (floor(-log2 P * 1e6)); every per-document aggregate is exact int64
    and mean_bits is one int->double division, so the DuckDB oracle
    (same expression order, CAST(0.75 AS DOUBLE) discount) matches
    hash-exact."""
    d = _t(spark, sf, "documents")
    return TX.kn_bigram_score(d)


def q_price_index(spark, sf):
    """Matched-item unit-value price index (transforms.price_index, the
    billion-prices-project CPI recipe) per part type and ship month:
    lineitem spend in exact floor-cents, integer quantities, matched
    against each category's earliest month. All aggregates int64; the
    index is two single-cast double products and one division —
    hash-exact vs the DuckDB twin."""
    from frontier_engine import transforms as TR

    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    rows = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_type").alias("category"),
        F.date_format("l_shipdate", "yyyy-MM").alias("period"),
        F.col("l_partkey").alias("item"),
        _cents(F.col("l_extendedprice")).alias("spend_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return TR.price_index(rows)


def q_burst(spark, sf):
    """Per-host fetch-rate burst census (hostctl.burst_detect): hourly
    event counts per host, z-tested against the host's own mean/std via
    the all-integer cross-multiplied predicate (no float enters
    selection); zscore itself is engine-exact because IEEE sqrt and
    division are correctly rounded over single-cast int64 moments."""
    from frontier_engine import hostctl as HC

    e = _t(spark, sf, "events")
    rows = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias("host"),
        F.col("ts"),
    )
    return HC.burst_detect(rows, bucket="hour", k_num=2, k_den=1)


def q_salsa(spark, sf):
    """SALSA hub/authority scores (graph.salsa, Lempel & Moran WWW'00;
    the WTF recommendation walk) over the same orders-derived 100-node
    graph as q_pagerank/q_hits, 5 iterations, L1-normalized half-steps.
    Degree-weighted propagation — the TKC-resistant HITS. Scores round
    to 6 decimals (float summation order)."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    r = GR.salsa(edges, iterations=5)
    return r.select(
        "node", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


def q_cdc_dedup(spark, sf):
    """Content-defined-chunking storage census (textops.cdc_chunks,
    LBFS/FastCDC family): split every document at rolling-hash
    boundaries (poly31, mod-64 mask) and report the per-source
    chunk-level dedup ratio — what a content-addressed archive store
    would actually keep. Pure expressions, no UDF; the oracle recomputes
    the identical hash/cuts with list_reduce and matches hash-exact
    (the ratio is one int->double division)."""
    d = _t(spark, sf, "documents")
    ch = TX.cdc_chunks(d).join(
        d.select("doc_id", "source"), "doc_id"
    )
    uniq = ch.groupBy("source", "chunk_hash").agg(
        F.count(F.lit(1)).cast("long").alias("copies"),
        F.min("chunk_len").alias("clen"),
    )
    return uniq.groupBy("source").agg(
        F.sum("copies").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum(F.col("copies") * F.col("clen")).cast("long").alias("chars_total"),
        F.sum("clen").cast("long").alias("chars_unique"),
    ).withColumn(
        "dedup_ratio",
        F.col("chars_unique").cast("double") / F.col("chars_total").cast("double"),
    )


def q_gap_bits(spark, sf):
    """Link-store compression planning (graph.gap_bits_census, the
    Boldi-Vigna WebGraph γ-coding cost): per-host Elias-γ bits over
    sorted outlink-id gaps vs the raw 64-bit id list. Integer bit
    lengths via length(bin(g)) — no libm; ratio one int->double
    division; oracle recomputes the identical list algebra."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 100).cast("string")).alias("src"),
        (F.col("event_id") % 1000).cast("long").alias("dst"),
    )
    return GR.gap_bits_census(edges)


def q_assortativity(spark, sf):
    """Degree assortativity r (graph.assortativity, Newman PRL'02) of
    the events-derived host graph — the one-number web-shape check
    (organic webs are disassortative; farms wire hubs together). Five
    exact int64 moments, then single-cast IEEE products/sqrt/division —
    engine-exact, no rounding."""
    e = _t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 60).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("event_id") % 97).cast("string")).alias("dst"),
    )
    return GR.assortativity(edges)


def _retrieval_eval_tables(d):
    """Shared ranking/qrels construction for the retrieval-eval queries:
    three tf-ranked queries over documents, judged by the graded tf of a
    correlated second term (rel = min(3, tf))."""
    toks = F.split(F.lower(F.col("text")), r"\s+")
    pairs = [("q_spark", "spark", "data"), ("q_table", "table", "query"),
             ("q_scan", "scan", "row")]
    ranked_parts, qrel_parts = [], []
    def _tf(term):
        return F.size(F.filter(toks, lambda w: w == F.lit(term)))

    for qid, term, relterm in pairs:
        tf = _tf(term)
        rtf = _tf(relterm)
        ranked_parts.append(
            d.select(
                F.lit(qid).alias("query_id"), "doc_id", tf.alias("_tf")
            ).filter(F.col("_tf") > 0)
        )
        qrel_parts.append(
            d.select(
                F.lit(qid).alias("query_id"),
                "doc_id",
                F.least(F.lit(3), rtf).cast("int").alias("rel"),
            ).filter(F.col("rel") > 0)
        )
    ranked = ranked_parts[0].unionByName(ranked_parts[1]).unionByName(ranked_parts[2])
    w = Window.partitionBy("query_id").orderBy(
        F.col("_tf").desc(), F.col("doc_id").asc()
    )
    ranked = (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    qrels = qrel_parts[0].unionByName(qrel_parts[1]).unionByName(qrel_parts[2])
    return ranked, qrels


def q_ndcg(spark, sf):
    """Retrieval evaluation (index.ndcg_eval, Järvelin & Kekäläinen
    NDCG@10): three term-frequency-ranked queries over documents,
    judged by the graded tf of a correlated second term (rel =
    min(3, tf)). Each gain/discount term integerized once
    (floor(gain·1e9/log2(rank+1))); per-query sums exact int64; ndcg is
    one int->double division — hash-exact vs the DuckDB twin."""
    from frontier_engine import index as IX

    ranked, qrels = _retrieval_eval_tables(_t(spark, sf, "documents"))
    return IX.ndcg_eval(ranked, qrels, k=10)


def q_recall_mrr(spark, sf):
    """Recall@10 + MRR (index.recall_mrr_eval, Voorhees TREC-8): the
    binary-relevance companions of q_ndcg over the SAME ranking/qrels
    tables — did the ranking find the relevant docs, and how fast. All
    counts exact int64; recall and rr are single int->int IEEE divisions
    (no rounding step), hash-exact vs the DuckDB twin."""
    from frontier_engine import index as IX

    ranked, qrels = _retrieval_eval_tables(_t(spark, sf, "documents"))
    return IX.recall_mrr_eval(ranked, qrels, k=10)


def q_script_census(spark, sf):
    """Unicode script census (textops.script_census): coarse per-doc
    codepoint buckets (latin/cyrillic/cjk/arabic/greek/digit/space/
    other) + argmax main_script — the pre-langid triage for a
    multilingual crawl. Non-Latin snippets planted per doc_id mod 7 so
    every bucket is exercised; all counts exact int64, argmax by
    greatest() with fixed tie order."""
    d = _t(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 1, F.lit(" Привет мир"))
            .when(F.col("doc_id") % 7 == 2, F.lit(" 日本語テキスト"))
            .when(F.col("doc_id") % 7 == 3, F.lit(" مرحبا بالعالم"))
            .when(F.col("doc_id") % 7 == 4, F.lit(" αβγδε"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return TX.script_census(aug)


def q_bfs_depth(spark, sf):
    """Crawl-depth census (graph.bfs_depth): BFS distance from a seed
    whitelist over the orders-derived 100-node link graph (custkey%100 ->
    orderkey%100, self-loops dropped), seeds = graph nodes divisible by
    10, depth cap 6 — the spider-trap depth guard and TrustRank's
    "distance from trusted seeds" metric in census form. One wavefront
    hash join + anti-join per level, wavefront-proportional work,
    localCheckpoint-cut lineage; depth is partitioning-invariant so the
    result is exact. The DuckDB oracle is a depth-capped recursive CTE
    with a min-depth rollup."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % 10 == 0)
    return GR.bfs_depth(edges, seeds, max_depth=6)


def q_harmonic(spark, sf):
    """Exact harmonic centrality (graph.harmonic_centrality, Boldi &
    Vigna's axiomatically-sound authority score) over a 60-node
    orders-derived graph, depth cap 6: H(v) = sum of 1/d(u,v) over
    incoming shortest paths. Exact all-sources BFS — O(V^2) pair state,
    the small-graph diagnostic twin of the HyperBall sketch path
    (q_hyperball). The DuckDB oracle runs the same census as a recursive
    CTE over (root, node) pairs with min-depth rollup; the harmonic sum
    is short rationals, rounded 6 dp both sides."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 60).alias("src"),
        (F.col("o_orderkey") % 60).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    out = GR.harmonic_centrality(edges, max_depth=6)
    return out.select(
        "node", "n_reach", F.round("harmonic", 6).alias("harmonic")
    )


def q_hyperball(spark, sf):
    """HyperBall (graph.hyperball, Boldi & Vigna 2013): the neighborhood
    function of the 100-node orders graph by per-node HyperLogLog
    counters, p=6, radii 0..4 — the O(V * 2^p) sketch that replaces the
    O(V^2) exact census at 10^10-URL scale (one registers ⋈ edges
    shuffle + map-side-combined register max per round). ENGINE-EXACT:
    portable md5-prefix registers, integer bit-length ranks, harmonic
    sum as exact BIGINT s_scaled — so the DuckDB oracle (rounds unrolled
    as chained CTEs) reproduces every register and the estimate to the
    bit, and this checks the SKETCH ITSELF, not a statistical claim."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    balls = GR.hyperball(edges, p=6, max_depth=4)
    return balls.select("node", "radius", "v_zero", "s_scaled", "est")


def q_asof_join(spark, sf):
    """As-of join (ops.asof_join): every click event joined to the
    user's LATEST purchase at-or-before it — the which-state-governed-
    this-fetch time-series join Spark lacks, implemented as the scalable
    union+window carry (one shuffle on the key; never a per-row range
    scan). Purchases are last-wins-deduped per (user, ts) first so the
    carry is deterministic. The DuckDB oracle is its native ASOF LEFT
    JOIN — an independent physical algorithm confirming value-for-value
    equality, including the state-at-equal-ts (>=) boundary."""
    e = _t(spark, sf, "events")
    probe = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    state = ops.last_wins(
        e.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value", "event_id"
        ),
        ["user_id", "ts"],
        [F.col("event_id").desc()],
    ).select("user_id", "ts", F.col("value").alias("purchase_value"))
    return ops.asof_join(
        probe, state, "user_id", "ts", ["purchase_value"], "purchase_ts"
    )


def q_range_join(spark, sf):
    """Interval containment join (ops.range_join): attribute every event
    to the 10-minute incident windows opened by sampled error events —
    the bucketed range-join decomposition (explode intervals to
    5-minute buckets, equi-join, exact containment post-filter; a fact
    matches in exactly one bucket so no dedup pass). The oracle is
    DuckDB's plain inequality join — a different algorithm entirely."""
    e = _t(spark, sf, "events")
    iv = e.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 97 == 0)
    ).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    joined = ops.range_join(
        e.select("event_id", "ts", "event_type"),
        iv,
        "ts",
        "w_start",
        "w_end",
        bucket_s=300,
    )
    return joined.select("interval_id", "event_id", "ts", "event_type")


def q_weighted_sample(spark, sf):
    """Weighted k-per-stratum sampling without replacement
    (ops.weighted_sample, Efraimidis-Spirakis A-ES IPL'06): 5 documents
    per language drawn proportional to n_chars — the quality-weighted
    curation draw. Deterministic u from the Knuth multiplicative hash of
    doc_id; key = ln(u)/w; top-k per stratum. The oracle replays the
    identical arithmetic in DuckDB."""
    d = _t(spark, sf, "documents")
    return ops.weighted_sample(d, ["lang"], 5, "doc_id", "n_chars").select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_kmv_overlap(spark, sf):
    """Pairwise host-audience overlap from KMV sketches (sketch.kmv_sketch
    / kmv_pair_overlap, Beyer et al. SIGMOD'07): what HLL cannot answer —
    union AND intersection estimates between every host pair from k=64
    longs per host, never re-shuffling the raw sets. Engine-exact portable
    md5-prefix hashes, integer sketch state, floats only in the final
    divisions. The exact union/Jaccard ride along so the oracle checks the
    sketch's accuracy claim too. sf0.001 puts every host below k (exact
    branch); sf0.01+ exercises the (k-1)*R/h_k estimator branch."""
    e = _t(spark, sf, "events")
    host = F.concat(F.lit("h"), (F.col("event_id") % 20).cast("string"))
    val = F.concat(
        F.lit("t"),
        ((F.col("event_id") * 7 + F.col("user_id")) % 3000).cast("string"),
    )
    src = e.select(host.alias("host"), val.alias("v")).distinct()
    k = 64
    ov = SK.kmv_pair_overlap(SK.kmv_sketch(src, ["host"], "v", k=k), "host", k=k)
    counts = src.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        src.alias("x")
        .join(
            src.alias("y"),
            (F.col("x.v") == F.col("y.v")) & (F.col("x.host") < F.col("y.host")),
        )
        .groupBy(F.col("x.host").alias("ga"), F.col("y.host").alias("gb"))
        .agg(F.count(F.lit(1)).cast("long").alias("inter_exact"))
    )
    out = (
        ov.join(counts.select(F.col("host").alias("ga"), F.col("n").alias("na")), "ga")
        .join(counts.select(F.col("host").alias("gb"), F.col("n").alias("nb")), "gb")
        .join(inter, ["ga", "gb"], "left")
        .withColumn("inter_exact", F.coalesce("inter_exact", F.lit(0)).cast("long"))
    )
    n_union_exact = (F.col("na") + F.col("nb") - F.col("inter_exact")).cast("long")
    return out.select(
        F.col("ga").alias("host_a"),
        F.col("gb").alias("host_b"),
        F.round("est_a", 6).alias("est_a"),
        F.round("est_b", 6).alias("est_b"),
        "merged_n",
        "shared_n",
        F.round("union_est", 6).alias("union_est"),
        F.round("jacc_est", 6).alias("jacc_est"),
        F.round("inter_est", 6).alias("inter_est"),
        n_union_exact.alias("n_union_exact"),
        F.round(
            F.col("inter_exact").cast("double") / n_union_exact.cast("double"), 6
        ).alias("jacc_exact"),
    )


def q_url_templates(spark, sf):
    """URL template census (canon.url_template_col): collapse URL paths
    to their structural pattern (digit runs -> {n}, long hex ids -> {h},
    query reduced to sorted parameter NAMES) and count URL-space mass per
    (host, template) — the pattern-cluster substrate of rule-learned URL
    de-dup (Koppula et al. WSDM'11) and per-template crawl budgeting.
    Expression-only template + one map-side-combined census. The oracle
    replays both regexes with DuckDB's 'g' flag and the same name sort."""
    e = _t(spark, sf, "events")
    hostnum = (F.col("user_id") % 15).cast("string")
    eid = F.col("event_id").cast("string")
    kind = (F.col("event_id") % 4).cast("int")
    url = F.concat(
        F.lit("https://m"),
        hostnum,
        F.lit(".example"),
        F.when(
            kind == 0,
            F.concat(
                F.lit("/product/"), eid, F.lit("/rev/"),
                (F.col("user_id") % 5).cast("string"),
            ),
        )
        .when(
            kind == 1,
            F.concat(F.lit("/obj/"), F.substring(F.md5(eid), 1, 12), F.lit("/view")),
        )
        .when(
            kind == 2,
            F.concat(
                F.lit("/list?page="), (F.col("event_id") % 50).cast("string"),
                F.lit("&sort=asc"),
            ),
        )
        .otherwise(F.lit("/about/team")),
    )
    from frontier_engine import canon as CN

    d = e.select(url.alias("url"))
    return (
        d.select(
            CN.host_col(F.col("url")).alias("host"),
            CN.url_template_col(F.col("url")).alias("template"),
            F.col("url"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("url").alias("example"),
        )
    )


def q_zipf_fit(spark, sf):
    """Zipf frequency-spectrum fit per language (textops.zipf_fit): OLS
    slope of ln(freq) on ln(rank) over the top-500 terms — the corpus-
    health one-number (natural text ~ -1). Integerize-early discipline:
    each term contributes floor(ln*1e3) ints once; all OLS sums are
    exact int64; slope and intercept are two closed-form float exprs the
    DuckDB oracle replays verbatim."""
    d = _t(spark, sf, "documents")
    return TX.zipf_fit(d, "text", "lang", top_n=500)


def q_compaction_plan(spark, sf):
    """Small-files compaction planning (shardplan.compaction_plan, the
    Delta-OPTIMIZE/Iceberg-binpack planner as a distributed query): a
    synthetic file census (one 'file' per (lang, source, doc_id%40)
    bucket, bytes = sum of n_chars) packed into ~20 KB rewrite bins per
    lang partition via one window running-sum + integer DIV — no
    driver-side listing loop. Integer-exact; the oracle replays the
    window with // and %."""
    d = _t(spark, sf, "documents")
    files = (
        d.select(
            "lang",
            F.concat(
                F.col("source"), F.lit("-"), (F.col("doc_id") % 40).cast("string")
            ).alias("file_id"),
            "n_chars",
        )
        .groupBy("lang", "file_id")
        .agg(F.sum("n_chars").cast("long").alias("bytes"))
    )
    from frontier_engine import shardplan as SP

    return SP.compaction_plan(files, ["lang"], "file_id", "bytes", 20000)


def q_heaps_fit(spark, sf):
    """Heaps-law vocabulary-growth fit per language (textops.heaps_fit):
    OLS of ln(vocab) on ln(tokens) over nested doc_id%8 prefix subsets —
    V(N) ~ K·N^beta, zipf_fit's growth-side companion. One explode +
    min(bucket)-per-term aggregate gives every point without rescans;
    integerize-early OLS (floor(ln·1e3), exact int64 sums) so the DuckDB
    twin matches hash-exact."""
    d = _t(spark, sf, "documents")
    return TX.heaps_fit(d, "text", "lang", "doc_id", n_buckets=8)


def q_funnel(spark, sf):
    """Ordered-funnel conversion census (ops.funnel): per user the
    earliest view, then the earliest click AT-OR-AFTER that view, then
    the earliest purchase at-or-after that click — strictly sequential
    (a click before the first view does not count), which is why it is
    not a pivot. One corpus-sized shuffle on user_id; later joins and
    aggregates reuse the partitioning. The oracle replays the chained
    min-after-min in SQL."""
    e = _t(spark, sf, "events")
    return ops.funnel(e, ["view", "click", "purchase"], "user_id", "ts")


def q_trimmed_mean(spark, sf):
    """Robust per-language doc-length rollup (ops.trimmed_mean, 10%
    two-sided trim): rank-ordered exact trim counts from integer
    rational arithmetic, int64 kept-sums, one int->double division —
    the domain-quality mean a single pathological page can't move."""
    d = _t(spark, sf, "documents")
    return ops.trimmed_mean(d, ["lang"], "n_chars", "doc_id", 1, 10)


def q_tfidf_keywords(spark, sf):
    """Per-document keyword extraction (textops.tfidf_keywords): top-3
    terms by tf·idf with idf integerized once per distinct term
    (floor(ln(N/df)·1e6)) so every score is exact int64 and ranking
    never compares floats; ties (score desc, term asc). The window
    partitions by document — thousands of tiny groups. DuckDB twin
    replays the identical arithmetic."""
    d = _t(spark, sf, "documents")
    return TX.tfidf_keywords(d, "text", "doc_id", k=3)


def q_canonical_clusters(spark, sf):
    """Page-level ``<link rel=canonical>`` alias clustering (the WAT-style
    dedup signal): synthesize per-doc HTML whose canonical target is the
    closed form ``http://ex.com/c{doc_id % 40}`` for doc_id % 7 != 0 (no
    canonical otherwise), extract it with the REAL head-bounded parser
    (extract.canonical_udf — attribute order, quoting, case, relative
    hrefs, and a conflicting second declaration all vary by doc_id so
    the parser is exercised, with first-declaration-wins semantics),
    then cluster: canonical target → page count + smallest doc id. The
    DuckDB twin recomputes the target arithmetic; parser edge cases are
    pinned separately in tests/test_extract.py."""
    import pandas as pd

    from frontier_engine import extract as EX

    d = _t(spark, sf, "documents").select("doc_id")

    def make_html(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                tgt = f"http://ex.com/c{i % 40}"
                if i % 7 == 0:
                    link = ""  # no canonical declared
                elif i % 3 == 0:
                    link = f'<link rel="canonical" href="{tgt}">'
                elif i % 3 == 1:
                    # relative href + flipped attribute order, single quotes
                    link = f"<link href='/c{i % 40}' rel='canonical'>"
                else:
                    # mixed case + a conflicting later declaration (first wins)
                    link = (
                        f'<LINK REL="Canonical" HREF="{tgt}">'
                        '<link rel="canonical" href="http://other.com/decoy">'
                    )
                payloads.append(
                    (
                        '<html><head><link rel="stylesheet" href="/s.css">'
                        f"{link}<title>p{i}</title></head>"
                        "<body>canonical text decoy</body></html>"
                    ).encode()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "html": payloads})

    pages = d.mapInPandas(make_html, schema="doc_id long, html binary").withColumn(
        "base_url", F.concat(F.lit("http://ex.com/p"), F.col("doc_id"))
    )
    return (
        pages.withColumn("canonical", EX.canonical_udf("html", "base_url"))
        .filter(F.col("canonical").isNotNull())
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("doc_id").alias("min_doc"),
        )
    )


def q_readability(spark, sf):
    """Flesch Reading Ease / Flesch–Kincaid grade per document
    (textops.readability): the published 1948/1975 formulas over fixed
    regexp-count word/sentence/vowel-group rules — three codegen'd
    regexp scans per row, no UDF, no tokenize-explode, no shuffle. The
    DuckDB twin replays the identical counting rules and IEEE-double
    operation order; both engines round to 6 decimals."""
    d = _t(spark, sf, "documents")
    return TX.readability(d, "text", "doc_id")


def q_spam_mass(spark, sf):
    """Link-spam mass estimation (graph.spam_mass; Gyöngyi et al., VLDB
    2006): PageRank minus seed-scaled TrustRank over the same
    orders-derived 100-node graph and node%10==0 seed set as
    q_pagerank/q_trustrank — the fraction of each node's rank that no
    trusted page vouches for. Factors round to 6 decimals BEFORE the
    composition (each is independently hash-checked cross-engine), so
    the subtraction/division stays bit-identical; the DuckDB twin
    unrolls both 5-iteration chains as CTEs and replays the same
    rounded-operand arithmetic."""
    o = _t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    seeds = nodes.filter(F.col("node") % 10 == 0)
    return GR.spam_mass(edges, seeds, iterations=5, damping=0.85)


def q_chunk_passages(spark, sf):
    """RAG passage chunking (textops.chunk_passages): 64-word windows
    every 48 words (16-word overlap) per document — split + sequence-
    posexplode + slice/array_join, expression-only, zero shuffle. The
    DuckDB twin replays the identical window arithmetic with
    range/list_slice."""
    d = _t(spark, sf, "documents")
    return TX.chunk_passages(d, "text", "doc_id", size=64, stride=48)


def q_term_drift(spark, sf):
    """Snapshot-to-snapshot term-distribution drift (textops.term_drift):
    even doc_ids play the old crawl, odd the new; top-20 terms by
    symmetric smoothed-probability ratio. Division-first double
    arithmetic (no ln, no overflow-able cross products); the DuckDB twin
    replays the identical expression and the top-k set is tie-broken
    deterministic."""
    d = _t(spark, sf, "documents")
    return TX.term_drift(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "text",
        k=20,
    )


def q_hard_negatives(spark, sf):
    """Hard-negative mining (ann.hard_negatives, the DPR/ANCE recipe):
    queries = vec_id < 3, qrels = vec_id % 50 == query_id (so each query
    excludes ~2% of the corpus including itself); top-5 highest-cosine
    non-relevant docs per query. The exclusion anti-joins the scored
    pairs (never a post-filter on a fixed top window); the DuckDB twin
    replays it with NOT EXISTS over the same closed-form qrels."""
    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pos = emb.select("vec_id").crossJoin(
        q.select("query_id")
    ).filter(F.col("vec_id") % 50 == F.col("query_id"))
    out = ann.hard_negatives(emb, q, pos, k=5)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_domain_holdout(spark, sf):
    """Leakage-safe train/val/test split (ops.holdout_split): the DOMAIN
    is hashed — first 8 hex digits of md5(source) mod 100 — so every
    document from one domain lands in exactly one split and near-dup
    siblings can never straddle the train/test boundary. Thresholds 20/25
    here so all three splits are populated on the 20-domain test corpus
    (API default is 5/5). Reported as a per-split census."""
    d = _t(spark, sf, "documents")
    out = ops.holdout_split(d, "source", val_pct=25, test_pct=20)
    return out.groupBy("split").agg(
        F.countDistinct("source").cast("long").alias("n_domains"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


def q_centroid_classify(spark, sf):
    """Nearest-class-centroid (Rocchio) classification confusion census
    (ann.centroid_classify): per-label mean embeddings from one
    map-side-combinable posexplode aggregate, broadcast nested-loop
    scoring with a JVM-side cosine, max_by argmax (ties to the smallest
    label), then an n_labels² confusion rollup — the separability probe
    run before spending on a trained classification head."""
    emb = _t(spark, sf, "embeddings")
    return ann.centroid_classify(
        emb, id_col="vec_id", vec_col="embedding", label_col="label"
    ).select("gold", "pred", "n_vecs")


def q_strand_pairs(spark, sf):
    """STRAND bitext candidate mining (textops.strand_pairs — Resnik &
    Smith 2003, the ParaCrawl document-alignment front end): URLs built
    deterministically from documents in two multilingual-site shapes
    (path segment ``/{lang}/doc-G`` for even groups, query ``?lang=``
    for odd), so the operator's token substitution, bucket cap and
    integer length-ratio gate are what the oracle hash-checks."""
    d = _t(spark, sf, "documents")
    grp = (F.col("doc_id") % 97).cast("long")
    host = F.concat(F.lit("site"), (grp % 11).cast("string"), F.lit(".example"))
    url = F.when(
        grp % 2 == 0,
        F.concat(
            F.lit("https://"), host, F.lit("/"), F.col("lang"),
            F.lit("/doc-"), grp.cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://"), host, F.lit("/doc-"), grp.cast("string"),
            F.lit("?lang="), F.col("lang"),
        )
    )
    dd = d.select("doc_id", "n_chars", url.alias("url"))
    return TX.strand_pairs(dd, id_col="doc_id", url_col="url", len_col="n_chars")


def q_image_alt_pairs(spark, sf):
    """LAION-style (image, alt caption) harvesting (extract.
    image_text_pairs): pages synthesized from documents carry one real
    ``<img>`` (alt = first 60 chars of the doc text) plus three decoys a
    correct extractor must drop (data: URI, sub-minimum alt, missing
    alt); relative src resolves against the page URL. The oracle
    recomputes the surviving pair closed-form."""
    from frontier_engine import extract as EX

    d = _t(spark, sf, "documents")
    # Sanitize every character that is load-bearing inside an HTML attribute
    # ('"' would close it, '<'/'>' would truncate the tag, '&' would be
    # entity-unescaped engine-side only) so the parity contract holds for
    # ANY corpus text, not just the current seed's.
    alt_src = F.substring(F.col("text"), 1, 60)
    for ch in ('"', "<", ">", "&"):
        alt_src = F.replace(alt_src, F.lit(ch), F.lit(" "))
    page_url = F.concat(
        F.lit("https://img"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/g/"), F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit('<html><body><img src="/img/'), F.col("doc_id").cast("string"),
        F.lit('.jpg" alt="'), alt_src,
        F.lit('"><img src="data:image/png;base64,x" alt="decoy data uri alt">'
              '<img src="/thumb.png" alt="ok">'
              '<img src="/noalt.png"></body></html>'),
    ).cast("binary")
    pages = d.select(page_url.alias("url"), html.alias("html"))
    return EX.image_text_pairs(pages, html_col="html", url_col="url")


def q_perceptron(spark, sf):
    """In-engine classifier TRAINING (infer.train_perceptron): a batch
    perceptron over hashed bag-of-words features learns to separate two
    source groups (±1 by source-name length), then scores every doc.
    Weights, bias and margins are all int64 — the synchronous-batch
    updates are order-free, so a 2-epoch unrolled-CTE oracle reproduces
    the trained model bit-for-bit (same precedent as pagerank/kcore)."""
    from frontier_engine import infer as IN

    d = _t(spark, sf, "documents")
    y = F.when(F.length("source") == 4, F.lit(1)).otherwise(F.lit(-1))
    dd = d.select("doc_id", "text", y.alias("y"))
    w, b = IN.train_perceptron(dd, label_col="y", dim=32, epochs=2)
    return IN.perceptron_margins(dd, w, b, label_col="y")


# trained language-ID fixture: three languages with distinct orthography,
# four phrase variants each, plus a shared per-doc noise token. French is
# the heuristic's designed failure: its accents (à é è û) sit inside
# textops.VI_CHARS, so lang_id_col mislabels every fr row 'vi' while the
# trained char-bigram model separates all three (tests/test_infer.py).
_LANGID_LANGS = ["en", "vi", "fr"]
_LANGID_PHRASES = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine said the old owl",
        "many hands make light work for the whole crew",
        "practice makes perfect when the going gets tough",
    ],
    "vi": [
        "con cáo nâu nhanh nhẹn nhảy qua con chó lười",
        "mỗi ngày học một chút kiến thức sẽ đầy thêm",
        "có công mài sắt có ngày nên kim bạn nhé",
        "ăn quả nhớ kẻ trồng cây uống nước nhớ nguồn",
    ],
    "fr": [
        "le renard brun saute par dessus le chien paresseux",
        "petit à petit l'oiseau fait son nid déjà",
        "il ne faut pas vendre la peau de l'ours",
        "après la pluie le beau temps sûrement arrivé",
    ],
}


def _langid_fixture(spark, sf):
    """(doc_id, gold_lang, text) derived deterministically from doc_id:
    gold = langs[doc_id % 3], phrase variant = (doc_id div 3) % 4, suffix
    token ' w<doc_id % 17>' adds cross-language shared vocabulary."""
    d = _t(spark, sf, "documents").select("doc_id")
    lang_idx = (F.col("doc_id") % 3).cast("int")
    variant = ((F.col("doc_id") / 3).cast("long") % 4).cast("int")
    gold = F.lit(_LANGID_LANGS[-1])
    for li in reversed(range(len(_LANGID_LANGS) - 1)):
        gold = F.when(lang_idx == li, F.lit(_LANGID_LANGS[li])).otherwise(gold)
    phrase_cases = []
    for li, lang in enumerate(_LANGID_LANGS):
        p = F.lit(_LANGID_PHRASES[lang][-1])
        for vi in reversed(range(3)):
            p = F.when(variant == vi, F.lit(_LANGID_PHRASES[lang][vi])).otherwise(p)
        phrase_cases.append((li, p))
    text = phrase_cases[-1][1]
    for li, p in reversed(phrase_cases[:-1]):
        text = F.when(lang_idx == li, p).otherwise(text)
    text = F.concat(text, F.lit(" w"), (F.col("doc_id") % 17).cast("string"))
    return d.select("doc_id", gold.alias("gold_lang"), text.alias("text"))


def q_langid_trained(spark, sf):
    """TRAINED language ID (infer.train_langid + langid_scores): one-vs-
    rest batch perceptrons over hashed char-bigram features — the
    fastText-style upgrade of the q_lang_id heuristic — trained and
    applied entirely in-engine on the deterministic multilingual fixture.
    Weights, biases and margins are all int64 (no float anywhere), and
    the synchronous-batch updates are order-free, so the DuckDB oracle
    unrolls the identical 2 epochs per language as chained CTEs and
    reproduces every margin bit-for-bit; pred_lang = first language in
    (en, vi, fr) order attaining the max margin in both engines."""
    from frontier_engine import infer as IN

    fx = _langid_fixture(spark, sf)
    models = IN.train_langid(
        fx, label_col="gold_lang", langs=_LANGID_LANGS, dim=64, epochs=2
    )
    scored = IN.langid_scores(fx, models, _LANGID_LANGS)
    return fx.select("doc_id", "gold_lang").join(scored, "doc_id").select(
        "doc_id", "gold_lang", "pred_lang",
        *[F.col(f"margin_{l}") for l in _LANGID_LANGS],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pruned_agg": q_pruned_agg,
        "dim_join": q_dim_join,
        "semi_allowlist": q_semi_allowlist,
        "anti_join": q_anti_join,
        "last_wins": q_last_wins,
        "cdc_gate": q_cdc_gate,
        "topk_per_group": q_topk_per_group,
        "priority_extract_sum": q_priority_extract_sum,
        "json_props": q_json_props,
        "token_stats": q_token_stats,
        "ngram_counts": q_ngram_counts,
        "exact_dedup": q_exact_dedup,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "merge_upsert": q_merge_upsert,
        "window_running": q_window_running,
        "haversine": q_haversine,
        "politeness_drain": q_politeness_drain,
        "seen_filter": q_seen_filter,
        "ann_topk": q_ann_topk,
        "minhash_near_dup": q_minhash_near_dup,
        "simhash_near_dup": q_simhash_near_dup,
        "fingerprint": q_fingerprint,
        "lsh_ann": q_lsh_ann,
        "ivf_ann": q_ivf_ann,
        "ivf_ann_pruned": q_ivf_ann_pruned,
        "pq_ann": q_pq_ann,
        "ivfadc_ann": q_ivfadc_ann,
        "domain_holdout": q_domain_holdout,
        "centroid_classify": q_centroid_classify,
        "embedding_near_dup": q_embedding_near_dup,
        "multimodal_decode": q_multimodal_decode,
        "audio_features": q_audio_features,
        "feed_seeds": q_feed_seeds,
        "ngram_search": q_ngram_search,
        "batch_infer": q_batch_infer,
        "repetition": q_repetition,
        "stratified_sample": q_stratified_sample,
        "latest_records": q_latest_records,
        "revisit_census": q_revisit_census,
        "rare_terms": q_rare_terms,
        "dedup_clusters": q_dedup_clusters,
        "decontaminate": q_decontaminate,
        "pii_scrub": q_pii_scrub,
        "paragraph_dedup": q_paragraph_dedup,
        "pagerank": q_pagerank,
        "fix_mojibake": q_fix_mojibake,
        "c4_clean": q_c4_clean,
        "substring_dedup": q_substring_dedup,
        "substring_cut": q_substring_cut,
        "dsir_affinity": q_dsir_affinity,
        "pack_sequences": q_pack_sequences,
        "url_features": q_url_features,
        "domain_stats": q_domain_stats,
        "unigram_surprisal": q_unigram_surprisal,
        "mixture_sample": q_mixture_sample,
        "incremental_dedup": q_incremental_dedup,
        "dup_profile": q_dup_profile,
        "bpe_pairs": q_bpe_pairs,
        "bpe_train": q_bpe_train,
        "bpe_fertility": q_bpe_fertility,
        "recrawl_schedule": q_recrawl_schedule,
        "corpus_stats": q_corpus_stats,
        "trap_detection": q_trap_detection,
        "mirror_hosts": q_mirror_hosts,
        "mirror_families": q_mirror_families,
        "politeness_audit": q_politeness_audit,
        "crawl_budget": q_crawl_budget,
        "dust_params": q_dust_params,
        "dust_apply": q_dust_apply,
        "pld_stats": q_pld_stats,
        "opic": q_opic,
        "redirects": q_redirects,
        "surt": q_surt,
        "shard_plan": q_shard_plan,
        "hits": q_hits,
        "link_census": q_link_census,
        "anchor_stats": q_anchor_stats,
        "bm25_search": q_bm25_search,
        "mime_sniff": q_mime_sniff,
        "char_entropy": q_char_entropy,
        "degree_hist": q_degree_hist,
        "reciprocity": q_reciprocity,
        "quality_calibrate": q_quality_calibrate,
        "fairness_gini": q_fairness_gini,
        "ann_sq8": q_ann_sq8,
        "outlink_entropy": q_outlink_entropy,
        "rrf_hybrid": q_rrf_hybrid,
        "budget_cut": q_budget_cut,
        "vocab_coverage": q_vocab_coverage,
        "bpe_encode": q_bpe_encode,
        "gopher_gate": q_gopher_gate,
        "trustrank": q_trustrank,
        "image_dedup": q_image_dedup,
        "containment": q_containment,
        "dedup_survivors": q_dedup_survivors,
        "hll_distinct": q_hll_distinct,
        "boilerplate": q_boilerplate,
        "bigram_surprisal": q_bigram_surprisal,
        "soft404": q_soft404,
        "cms_counts": q_cms_counts,
        "sessionize": q_sessionize,
        "quantiles": q_quantiles,
        "zorder": q_zorder,
        "adaptive_delay": q_adaptive_delay,
        "bfs_depth": q_bfs_depth,
        "harmonic": q_harmonic,
        "hyperball": q_hyperball,
        "semantic_dedup": q_semantic_dedup,
        "collocations": q_collocations,
        "margin_mine": q_margin_mine,
        "setsim_join": q_setsim_join,
        "lpa": q_lpa,
        "phrase_search": q_phrase_search,
        "kcore": q_kcore,
        "triangles": q_triangles,
        "bowtie": q_bowtie,
        "cocitation": q_cocitation,
        "fuzzy_join": q_fuzzy_join,
        "kn_score": q_kn_score,
        "price_index": q_price_index,
        "burst": q_burst,
        "salsa": q_salsa,
        "cdc_dedup": q_cdc_dedup,
        "gap_bits": q_gap_bits,
        "assortativity": q_assortativity,
        "ndcg": q_ndcg,
        "script_census": q_script_census,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "weighted_sample": q_weighted_sample,
        "kmv_overlap": q_kmv_overlap,
        "url_templates": q_url_templates,
        "zipf_fit": q_zipf_fit,
        "compaction_plan": q_compaction_plan,
        "recall_mrr": q_recall_mrr,
        "heaps_fit": q_heaps_fit,
        "funnel": q_funnel,
        "trimmed_mean": q_trimmed_mean,
        "tfidf_keywords": q_tfidf_keywords,
        "canonical_clusters": q_canonical_clusters,
        "readability": q_readability,
        "spam_mass": q_spam_mass,
        "chunk_passages": q_chunk_passages,
        "term_drift": q_term_drift,
        "strand_pairs": q_strand_pairs,
        "image_alt_pairs": q_image_alt_pairs,
        "perceptron": q_perceptron,
        "langid_trained": q_langid_trained,
        "hard_negatives": q_hard_negatives,
    }


_VI = TX.VI_CHARS
_SW = ", ".join(f"'{w}'" for w in TX.EN_STOPWORDS)


def _graph_edges_cte(mod: int) -> str:
    """The shared orders-derived test graph as a distinct-edge CTE."""
    return (
        f"e AS (SELECT DISTINCT (o_custkey % {mod}) AS src,"
        f" (o_orderkey % {mod}) AS dst FROM orders"
        f" WHERE (o_custkey % {mod}) <> (o_orderkey % {mod}))"
    )


def _bfs_oracle_sql(mod: int = 100, max_depth: int = 6) -> str:
    """Depth-capped recursive-CTE twin of graph.bfs_depth: DuckDB's
    recursive UNION dedups (node, depth) rows, the cap bounds recursion,
    and min(depth) per node is the BFS distance."""
    return f"""
        WITH RECURSIVE {_graph_edges_cte(mod)},
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        walk(node, depth) AS (
            SELECT node, CAST(0 AS BIGINT) FROM nodes WHERE node % 10 = 0
            UNION
            SELECT e.dst, w.depth + 1 FROM walk w
            JOIN e ON e.src = w.node WHERE w.depth < {max_depth}
        )
        SELECT node, min(depth) AS depth FROM walk GROUP BY node
    """


def _harmonic_oracle_sql(mod: int = 60, max_depth: int = 6) -> str:
    """Recursive-CTE twin of graph.harmonic_centrality over (root, node)
    pairs; min-depth rollup then the harmonic fold, forced DOUBLE."""
    return f"""
        WITH RECURSIVE {_graph_edges_cte(mod)},
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        walk(root, node, depth) AS (
            SELECT node, node, CAST(0 AS BIGINT) FROM nodes
            UNION
            SELECT w.root, e.dst, w.depth + 1 FROM walk w
            JOIN e ON e.src = w.node WHERE w.depth < {max_depth}
        ),
        d AS (SELECT root, node, min(depth) AS depth FROM walk
              GROUP BY root, node)
        SELECT node, CAST(count(*) AS BIGINT) AS n_reach,
               round(sum(CAST(1.0 AS DOUBLE) / CAST(depth AS DOUBLE)), 6)
                   AS harmonic
        FROM d WHERE depth > 0 GROUP BY node
    """


def _hyperball_oracle_sql(p: int = 6, rounds: int = 4, mod: int = 100) -> str:
    """Unrolled-round DuckDB twin of graph.hyperball: register init from
    the portable 60-bit md5 prefix, per round one UNION ALL + group-max
    (exactly sketch.hll_merge), then the hll_estimate readout per radius
    — every constant injected from the same Python source as the Spark
    side, so the comparison is bit-exact on (v_zero, s_scaled)."""
    m = 1 << p
    w_bits = 60 - p
    top = w_bits + 1
    num = repr(SK._alpha(m) * m * m * (2.0 ** top))
    ctes = [
        _graph_edges_cte(mod),
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h AS (SELECT node, CAST('0x' || substr(md5(CAST(node AS VARCHAR)),"
        " 1, 15) AS BIGINT) AS h FROM nodes)",
        f"b0 AS (SELECT node, h % {m} AS reg,"
        f" CAST(CASE WHEN h // {m} = 0 THEN {top}"
        f" ELSE {top} - length(bin(h // {m})) END AS BIGINT) AS rank_max"
        f" FROM h)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"b{r} AS (SELECT node, reg, max(rank_max) AS rank_max FROM ("
            f"SELECT node, reg, rank_max FROM b{r - 1}"
            f" UNION ALL SELECT e.dst AS node, b.reg, b.rank_max"
            f" FROM b{r - 1} b JOIN e ON e.src = b.node) GROUP BY node, reg)"
        )
    per_radius = []
    for r in range(rounds + 1):
        per_radius.append(
            f"SELECT node, radius, v_zero, s_scaled,"
            f" round(CASE WHEN {num} / s_scaled <= {2.5 * m!r}"
            f" AND v_zero > 0"
            f" THEN {float(m)!r} * ln({float(m)!r} / v_zero)"
            f" ELSE {num} / s_scaled END, 6) AS est FROM ("
            f"SELECT node, CAST({r} AS BIGINT) AS radius,"
            f" CAST({m} - count(*) AS BIGINT) AS v_zero,"
            f" CAST(sum(CAST(1 AS BIGINT) << ({top} - rank_max))"
            f" + ({m} - count(*)) * (CAST(1 AS BIGINT) << {top})"
            f" AS BIGINT) AS s_scaled FROM b{r} GROUP BY node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT node, radius, v_zero, s_scaled, est FROM (\n"
        + "\nUNION ALL\n".join(per_radius)
        + "\n)"
    )


def _pagerank_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled-iteration DuckDB twin of graph.pagerank over the q_pagerank
    edge derivation. All arithmetic is forced to DOUBLE so both engines run
    the identical IEEE ops (DuckDB's bare 1.0 literals are DECIMAL)."""
    d = repr(damping)
    ctes = [
        "e AS (SELECT DISTINCT (o_custkey % 100) AS src,"
        " (o_orderkey % 100) AS dst FROM orders"
        " WHERE (o_custkey % 100) <> (o_orderkey % 100))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
        "we AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / deg.d AS w"
        " FROM e JOIN deg ON deg.src = e.src)",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS (SELECT n.node AS node,"
            f" (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE))"
            f" + CAST({d} AS DOUBLE) * coalesce(sum(r.rank * we.w),"
            f" CAST(0.0 AS DOUBLE)) AS rank"
            f" FROM nodes n LEFT JOIN we ON we.dst = n.node"
            f" LEFT JOIN r{k - 1} r ON r.node = we.src GROUP BY n.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{iters}"
    )


def _trustrank_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled-iteration DuckDB twin of graph.trustrank over the
    q_trustrank edge/seed derivation (same CAST-to-DOUBLE discipline as
    the pagerank oracle)."""
    d = repr(damping)
    ctes = [
        "e AS (SELECT DISTINCT (o_custkey % 100) AS src,"
        " (o_orderkey % 100) AS dst FROM orders"
        " WHERE (o_custkey % 100) <> (o_orderkey % 100))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
        "we AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / deg.d AS w"
        " FROM e JOIN deg ON deg.src = e.src)",
        "seeds AS (SELECT node FROM nodes WHERE node % 10 = 0)",
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds)",
        "r0 AS (SELECT node, CASE WHEN node IN (SELECT node FROM seeds)"
        " THEN CAST(1.0 AS DOUBLE) / ns.n ELSE CAST(0.0 AS DOUBLE) END AS r0"
        " FROM nodes, ns)",
        "t0 AS (SELECT node, r0 AS trust FROM r0)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"t{k} AS (SELECT r0.node AS node,"
            f" (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE)) * r0.r0"
            f" + CAST({d} AS DOUBLE) * coalesce(sum(t.trust * we.w),"
            f" CAST(0.0 AS DOUBLE)) AS trust"
            f" FROM r0 LEFT JOIN we ON we.dst = r0.node"
            f" LEFT JOIN t{k - 1} t ON t.node = we.src"
            f" GROUP BY r0.node, r0.r0)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, round(trust, 6) AS trust FROM t{iters}"
    )


def _spam_mass_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """DuckDB twin of graph.spam_mass over the q_spam_mass derivation:
    both 5-iteration chains (uniform-teleport PageRank, seed-teleport
    TrustRank) unrolled over the SHARED e/nodes/deg/we CTEs, factors
    rounded to 6 decimals, then the paper's mass arithmetic replayed on
    the rounded operands — identical IEEE op order to the engine."""
    d = repr(damping)
    ctes = [
        "e AS (SELECT DISTINCT (o_custkey % 100) AS src,"
        " (o_orderkey % 100) AS dst FROM orders"
        " WHERE (o_custkey % 100) <> (o_orderkey % 100))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
        "we AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / deg.d AS w"
        " FROM e JOIN deg ON deg.src = e.src)",
        "pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)",
        "seeds AS (SELECT node FROM nodes WHERE node % 10 = 0)",
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds)",
        "t0r AS (SELECT node, CASE WHEN node IN (SELECT node FROM seeds)"
        " THEN CAST(1.0 AS DOUBLE) / ns.n ELSE CAST(0.0 AS DOUBLE) END AS r0"
        " FROM nodes, ns)",
        "tr0 AS (SELECT node, r0 AS trust FROM t0r)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"pr{k} AS (SELECT n.node AS node,"
            f" (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE))"
            f" + CAST({d} AS DOUBLE) * coalesce(sum(r.rank * we.w),"
            f" CAST(0.0 AS DOUBLE)) AS rank"
            f" FROM nodes n LEFT JOIN we ON we.dst = n.node"
            f" LEFT JOIN pr{k - 1} r ON r.node = we.src GROUP BY n.node)"
        )
        ctes.append(
            f"tr{k} AS (SELECT r0.node AS node,"
            f" (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE)) * r0.r0"
            f" + CAST({d} AS DOUBLE) * coalesce(sum(t.trust * we.w),"
            f" CAST(0.0 AS DOUBLE)) AS trust"
            f" FROM t0r r0 LEFT JOIN we ON we.dst = r0.node"
            f" LEFT JOIN tr{k - 1} t ON t.node = we.src"
            f" GROUP BY r0.node, r0.r0)"
        )
    return (
        "WITH " + ",\n".join(ctes) + ",\n"
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),\n"
        f"pv AS (SELECT node, round(rank, 6) AS rank FROM pr{iters}),\n"
        f"tv AS (SELECT node, round(trust, 6) AS trust FROM tr{iters})\n"
        "SELECT pv.node, pv.rank, tv.trust,\n"
        "       round(pv.rank - tv.trust * nn.n_nodes, 6) AS spam_mass,\n"
        "       round((pv.rank - tv.trust * nn.n_nodes) / pv.rank, 6)"
        " AS rel_mass\n"
        "FROM pv JOIN tv ON pv.node = tv.node, nn"
    )


def _hits_oracle_sql(iters: int = 5) -> str:
    """Unrolled-iteration DuckDB twin of graph.hits over the q_hits edge
    derivation (same graph as q_pagerank). Each iteration is two
    aggregate+L1-normalize half-steps; arithmetic forced to DOUBLE so
    both engines run identical IEEE ops. Every CTE is MATERIALIZED:
    the normalize step references its raw CTE twice, so inlining (the
    planner default for small CTEs) re-evaluates the whole iteration
    subtree ~4^iters times — minutes of CPU for a query that runs in
    milliseconds materialized."""
    ctes = [
        "e AS MATERIALIZED (SELECT DISTINCT (o_custkey % 100) AS src,"
        " (o_orderkey % 100) AS dst FROM orders"
        " WHERE (o_custkey % 100) <> (o_orderkey % 100))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"ar{k} AS MATERIALIZED (SELECT n.node AS node,"
            f" coalesce(sum(h.hub), CAST(0.0 AS DOUBLE)) AS auth"
            f" FROM nodes n LEFT JOIN e ON e.dst = n.node"
            f" LEFT JOIN h{k - 1} h ON h.node = e.src GROUP BY n.node)"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT node, CASE WHEN t.s <> CAST(0.0 AS DOUBLE)"
            f" THEN auth / t.s ELSE CAST(0.0 AS DOUBLE) END AS auth"
            f" FROM ar{k}, (SELECT sum(auth) AS s FROM ar{k}) t)"
        )
        ctes.append(
            f"hr{k} AS MATERIALIZED (SELECT n.node AS node,"
            f" coalesce(sum(a.auth), CAST(0.0 AS DOUBLE)) AS hub"
            f" FROM nodes n LEFT JOIN e ON e.src = n.node"
            f" LEFT JOIN a{k} a ON a.node = e.dst GROUP BY n.node)"
        )
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT node, CASE WHEN t.s <> CAST(0.0 AS DOUBLE)"
            f" THEN hub / t.s ELSE CAST(0.0 AS DOUBLE) END AS hub"
            f" FROM hr{k}, (SELECT sum(hub) AS s FROM hr{k}) t)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT h.node AS node, round(h.hub, 6) AS hub,"
        f" round(a.auth, 6) AS auth"
        f" FROM h{iters} h JOIN a{iters} a ON a.node = h.node"
    )


def _salsa_oracle_sql(iters: int = 5) -> str:
    """Unrolled-iteration DuckDB twin of graph.salsa over the q_salsa
    edge derivation (same graph as q_hits). Identical structure to
    _hits_oracle_sql but each propagation multiplies by the degree
    weight (wo = 1/outdeg on the forward step, wi = 1/indeg on the
    backward step). MATERIALIZED CTEs for the same reason as hits."""
    ctes = [
        "e0 AS MATERIALIZED (SELECT DISTINCT (o_custkey % 100) AS src,"
        " (o_orderkey % 100) AS dst FROM orders"
        " WHERE (o_custkey % 100) <> (o_orderkey % 100))",
        "od AS MATERIALIZED (SELECT src, count(*) AS d FROM e0 GROUP BY src)",
        "id_ AS MATERIALIZED (SELECT dst, count(*) AS d FROM e0 GROUP BY dst)",
        "e AS MATERIALIZED (SELECT e0.src, e0.dst,"
        " CAST(1.0 AS DOUBLE) / od.d AS wo,"
        " CAST(1.0 AS DOUBLE) / id_.d AS wi"
        " FROM e0 JOIN od ON od.src = e0.src JOIN id_ ON id_.dst = e0.dst)",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"ar{k} AS MATERIALIZED (SELECT n.node AS node,"
            f" coalesce(sum(h.hub * e.wo), CAST(0.0 AS DOUBLE)) AS auth"
            f" FROM nodes n LEFT JOIN e ON e.dst = n.node"
            f" LEFT JOIN h{k - 1} h ON h.node = e.src GROUP BY n.node)"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT node, CASE WHEN t.s <> CAST(0.0 AS DOUBLE)"
            f" THEN auth / t.s ELSE CAST(0.0 AS DOUBLE) END AS auth"
            f" FROM ar{k}, (SELECT sum(auth) AS s FROM ar{k}) t)"
        )
        ctes.append(
            f"hr{k} AS MATERIALIZED (SELECT n.node AS node,"
            f" coalesce(sum(a.auth * e.wi), CAST(0.0 AS DOUBLE)) AS hub"
            f" FROM nodes n LEFT JOIN e ON e.src = n.node"
            f" LEFT JOIN a{k} a ON a.node = e.dst GROUP BY n.node)"
        )
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT node, CASE WHEN t.s <> CAST(0.0 AS DOUBLE)"
            f" THEN hub / t.s ELSE CAST(0.0 AS DOUBLE) END AS hub"
            f" FROM hr{k}, (SELECT sum(hub) AS s FROM hr{k}) t)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT h.node AS node, round(h.hub, 6) AS hub,"
        f" round(a.auth, 6) AS auth"
        f" FROM h{iters} h JOIN a{iters} a ON a.node = h.node"
    )


def _moji_replace_sql(expr: str) -> str:
    """The fix_mojibake replace chain as nested DuckDB replace() calls,
    generated from the SAME table the Spark column uses."""
    out = expr
    for broken, fixed in TX.MOJIBAKE_PAIRS:
        b = broken.replace("'", "''")
        g = fixed.replace("'", "''")
        out = f"replace({out}, '{b}', '{g}')"
    return out


def _moji_suffix_case() -> str:
    c = [s.replace("'", "''") for s in _MOJI_SUFFIXES]
    return (
        "CASE CAST(doc_id % 3 AS INT)"
        f" WHEN 0 THEN '{c[0]}' WHEN 1 THEN '{c[1]}' ELSE '{c[2]}' END"
    )


def _langid_oracle_sql() -> str:
    """DuckDB twin of q_langid_trained: the same char-bigram hashed
    features and, per language, the same 2 unrolled synchronous-batch
    perceptron epochs as the 'perceptron' oracle (all int64 — exact),
    then first-max-in-langs-order prediction."""
    langs = _LANGID_LANGS

    def esc(s: str) -> str:
        return s.replace("'", "''")

    phrase_case = "CASE CAST(doc_id % 3 AS INT)"
    for li, lang in enumerate(langs):
        inner = "CASE CAST((doc_id // 3) % 4 AS INT)"
        for vi in range(3):
            inner += f" WHEN {vi} THEN '{esc(_LANGID_PHRASES[lang][vi])}'"
        inner += f" ELSE '{esc(_LANGID_PHRASES[lang][3])}' END"
        phrase_case += (
            f" WHEN {li} THEN ({inner})" if li < len(langs) - 1 else f" ELSE ({inner})"
        )
    phrase_case += " END"
    gold_case = "CASE CAST(doc_id % 3 AS INT)"
    for li, lang in enumerate(langs[:-1]):
        gold_case += f" WHEN {li} THEN '{lang}'"
    gold_case += f" ELSE '{langs[-1]}' END"

    ctes = [
        f"""base AS (
            SELECT doc_id, {gold_case} AS gold_lang,
                   {phrase_case} || ' w' || CAST(doc_id % 17 AS VARCHAR) AS text
            FROM documents)""",
        """t AS (
            SELECT doc_id, unnest(CASE WHEN len(lt) < 2 THEN [lt]
                ELSE list_transform(range(1, len(lt)), i -> substr(lt, CAST(i AS INT), 2)) END) AS g
            FROM (SELECT doc_id, lower(text) AS lt FROM base))""",
        """f AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 64 AS INT) AS feat,
                   count(*) AS cnt
            FROM t GROUP BY 1, 2)""",
    ]
    for L in langs:
        ctes += [
            f"""y_{L} AS (
                SELECT doc_id, CASE WHEN gold_lang = '{L}' THEN 1 ELSE -1 END AS yy
                FROM base)""",
            f"""w1_{L} AS (
                SELECT feat, SUM(yy * cnt) AS w
                FROM f JOIN y_{L} USING (doc_id) GROUP BY feat)""",
            f"b1_{L} AS (SELECT SUM(yy) AS b FROM y_{L})",
            f"""m2_{L} AS (
                SELECT y.doc_id, y.yy, COALESCE(s.dot, 0) + (SELECT b FROM b1_{L}) AS s
                FROM y_{L} y LEFT JOIN (
                    SELECT f.doc_id, SUM(f.cnt * w1_{L}.w) AS dot
                    FROM f JOIN w1_{L} USING (feat) GROUP BY f.doc_id
                ) s USING (doc_id))""",
            f"""u2_{L} AS (
                SELECT feat, SUM(m.yy * f.cnt) AS dw
                FROM f JOIN (
                    SELECT doc_id, yy FROM m2_{L} WHERE yy * s <= 0
                ) m USING (doc_id) GROUP BY feat)""",
            f"""w2_{L} AS (
                SELECT COALESCE(w1_{L}.feat, u2_{L}.feat) AS feat,
                       COALESCE(w1_{L}.w, 0) + COALESCE(u2_{L}.dw, 0) AS w
                FROM w1_{L} FULL JOIN u2_{L} ON w1_{L}.feat = u2_{L}.feat)""",
            f"""b2_{L} AS (
                SELECT (SELECT b FROM b1_{L})
                       + COALESCE((SELECT SUM(yy) FROM m2_{L} WHERE yy * s <= 0), 0) AS b)""",
            f"""mf_{L} AS (
                SELECT b.doc_id, COALESCE(s.dot, 0) + (SELECT b FROM b2_{L}) AS s
                FROM base b LEFT JOIN (
                    SELECT f.doc_id, SUM(f.cnt * w2_{L}.w) AS dot
                    FROM f JOIN w2_{L} USING (feat) GROUP BY f.doc_id
                ) s USING (doc_id))""",
        ]
    # first language in langs order attaining the max margin
    pred = "CASE"
    for li, L in enumerate(langs[:-1]):
        conds = " AND ".join(f"mf_{L}.s >= mf_{M}.s" for M in langs[li + 1 :])
        pred += f" WHEN {conds} THEN '{L}'"
    pred += f" ELSE '{langs[-1]}' END"
    margins = ", ".join(f"CAST(mf_{L}.s AS BIGINT) AS margin_{L}" for L in langs)
    joins = " ".join(f"JOIN mf_{L} USING (doc_id)" for L in langs)
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT base.doc_id, base.gold_lang, {pred} AS pred_lang, {margins} "
        + f"FROM base {joins}"
    )


def _sql_str(s: str) -> str:
    """A Python string as a DuckDB expression, newlines via chr(10) so the
    SQL source itself stays single-line."""
    quoted = "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
    return quoted


def _c4_suffix_case() -> str:
    c = [_sql_str(s) for s in _C4_SUFFIXES]
    return (
        "CASE CAST(doc_id % 4 AS INT)"
        f" WHEN 0 THEN {c[0]} WHEN 1 THEN {c[1]}"
        f" WHEN 2 THEN {c[2]} ELSE {c[3]} END"
    )

_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) >= 1)"
_TOKS2 = r"list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) >= 2)"

# exact shingle-Jaccard near-dup pairs (the minhash_near_dup oracle; also
# the edge set the dedup_clusters closure is built over)
_MINHASH_PAIRS_SQL = f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
              SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t)-1), i -> array_to_string(t[i:i+2], ' ')) END) AS s
              FROM toks),
            ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS sh FROM sh),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS i
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b, round(i/(na+nb-i), 4) AS jaccard FROM inter
            WHERE i/(na+nb-i) >= 0.5
"""

def _qscore_sql(extra: str = "") -> str:
    """Exact-integer twin of textops.quality_score_col: HUGEINT arithmetic +
    integral division reproduce Spark's decimal(38,0) path bit-for-bit at
    any SF (no engine-dependent float rounding at x.xxxxxx5 boundaries).
    `extra` threads additional passthrough columns (e.g. ', lang')."""
    return f"""
SELECT doc_id{extra}, CAST(
  (2000000::HUGEINT * (
      least(n, 200::HUGEINT) * n * nt
      + 200::HUGEINT * nt * (n - least(4::HUGEINT * p, n))
      + 160::HUGEINT * nt * (n - least(4::HUGEINT * d, n))
      + 120::HUGEINT * n * (nt - s)
      + 15::HUGEINT * n * least(n, 8::HUGEINT * nt)
  ) + 800::HUGEINT * n * nt) // (1600::HUGEINT * n * nt)
  AS DOUBLE) / 1000000.0 AS quality
FROM (SELECT doc_id{extra}, text,
             CAST(greatest(len(text), 1) AS HUGEINT) AS n,
             CAST(greatest(len({_TOKS}), 1) AS HUGEINT) AS nt,
             CAST(greatest(len(text), 1)
                  - len(regexp_replace(lower(text), '[^\\w\\s]', '', 'g')) AS HUGEINT) AS p,
             CAST(greatest(len(text), 1)
                  - len(regexp_replace(lower(text), '[0-9]', '', 'g')) AS HUGEINT) AS d,
             CAST(len(list_filter({_TOKS}, x -> len(x) < 2)) AS HUGEINT) AS s
      FROM documents)
"""


_QUALITY_SQL = _qscore_sql()

_LANG_SQL = f"""
SELECT doc_id,
  CASE WHEN (n - len(translate(lower(text), '{_VI}', ''))) / n > 0.01 THEN 'vi'
       WHEN len(list_filter({_TOKS}, x -> list_contains([{_SW}], x))) / nt > 0.08 THEN 'en'
       ELSE 'other' END AS lang_guess
FROM (SELECT doc_id, text,
             greatest(len(lower(text)), 1) AS n,
             greatest(len({_TOKS}), 1) AS nt
      FROM documents)
"""


_BRUTE_TOPK_SQL = """
    SELECT query_id, vec_id, round(cosine, 4) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC,
                                         c.vec_id ASC) AS rank
      FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 3) q)
    WHERE rank <= 5
"""


def _kcore_oracle_sql(rounds: int = 4) -> str:
    """graph.coreness unrolled: l0 = degree, then per round the H-index
    of neighbor values — row_number on the descending sort, count of
    ranks with v >= rn (tie order irrelevant: equal values satisfy the
    same condition set)."""
    parts = [
        """
        e0 AS (SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS a,
                      CASE WHEN event_id % 11 <> 0
                           THEN 'h' || CAST(event_id % 23 AS VARCHAR) END AS b
               FROM events),
        ed AS (SELECT DISTINCT a, b FROM e0 WHERE b IS NOT NULL AND a <> b),
        und AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
        l0 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS v
               FROM und GROUP BY a)
        """
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
        c{r} AS (SELECT u.a AS node, l.v FROM und u
                 JOIN l{r - 1} l ON l.node = u.b),
        r{r} AS (SELECT node, v, row_number() OVER (
                     PARTITION BY node ORDER BY v DESC) AS rn FROM c{r}),
        l{r} AS (SELECT node, CAST(count(*) FILTER (WHERE v >= rn) AS BIGINT) AS v
                 FROM r{r} GROUP BY node)
            """
        )
    return "WITH " + ",".join(parts) + f" SELECT node, v AS core FROM l{rounds}"


def _lpa_oracle_sql(rounds: int = 3) -> str:
    """graph.label_propagation unrolled: one (count, argmax, carry) CTE
    triple per synchronous round over the events-derived host graph."""
    parts = [
        """
        e0 AS (SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS a,
                      CASE WHEN event_id % 11 <> 0
                           THEN 'h' || CAST(event_id % 23 AS VARCHAR) END AS b
               FROM events),
        ed AS (SELECT DISTINCT a, b FROM e0 WHERE b IS NOT NULL AND a <> b),
        und AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
        l0 AS (SELECT DISTINCT a AS node, a AS label FROM und)
        """
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
        c{r} AS (SELECT u.a AS node, l.label, count(*) AS c
                 FROM und u JOIN l{r - 1} l ON l.node = u.b GROUP BY 1, 2),
        p{r} AS (SELECT node, label, row_number() OVER (
                     PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                 FROM c{r}),
        l{r} AS (SELECT prev.node, coalesce(p.label, prev.label) AS label
                 FROM l{r - 1} prev
                 LEFT JOIN (SELECT node, label FROM p{r} WHERE rn = 1) p
                 USING (node))
            """
        )
    return (
        "WITH " + ",".join(parts) + f" SELECT node, label FROM l{rounds}"
    )


def oracle_sql() -> dict[str, str]:
    brands = ", ".join(f"'{b}'" for b in ALLOWED_BRANDS)
    return {
        "pruned_agg": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_rows,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "dim_join": """
            SELECT n_name, r_name, count(*) AS n_customers,
                   CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
            FROM customer JOIN nation ON c_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('ASIA', 'EUROPE')
            GROUP BY n_name, r_name
        """,
        "semi_allowlist": f"""
            SELECT p_partkey, p_brand, p_name FROM part WHERE p_brand IN ({brands})
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "last_wins": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
              FROM events) WHERE rn = 1
        """,
        "cdc_gate": """
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(CASE WHEN prev IS NULL THEN 1
                                 WHEN prev = 0 THEN CASE WHEN value <> 0 THEN 1 ELSE 0 END
                                 WHEN abs(prev - value)/abs(prev) >= 0.01 THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_changes
            FROM (SELECT user_id, value,
                         lag(value) OVER (PARTITION BY user_id ORDER BY event_id) prev
                  FROM events WHERE event_type = 'purchase')
            GROUP BY user_id
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rn
              FROM orders) WHERE rn <= 3
        """,
        "priority_extract_sum": r"""
            SELECT o_orderstatus,
                   CAST(sum(CAST(regexp_extract(o_orderpriority, '(\d+)', 1) AS BIGINT)) AS BIGINT) AS priority_sum,
                   count(*) AS n
            FROM orders GROUP BY o_orderstatus
        """,
        "json_props": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "token_stats": f"""
            SELECT doc_id,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-zÀ-ỹ]+|[0-9]+|[^\\sA-Za-zÀ-ỹ0-9]')) AS BIGINT) AS n_bpe_tokens,
                   CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct_tokens
            FROM documents
        """,
        "ngram_counts": f"""
            SELECT doc_id,
                   CAST(coalesce(list_sum(list_transform({_TOKS2}, x -> len(x) - 1)), 0) AS BIGINT) AS n_bigrams,
                   CAST(len(list_distinct(flatten(list_transform({_TOKS2},
                        t -> list_transform(range(1, len(t)), i -> t[i:i+1]))))) AS BIGINT) AS n_distinct_bigrams
            FROM documents
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS canonical_id, count(*) AS group_size
            FROM documents GROUP BY text HAVING count(*) > 1
        """,
        "quality": _QUALITY_SQL,
        "lang_id": _LANG_SQL,
        "merge_upsert": """
            WITH existing AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
                 updates AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
                 merged AS (
                   SELECT * FROM existing WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
                   UNION ALL SELECT * FROM updates)
            SELECT count(*) AS n_rows,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM merged
        """,
        "window_running": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
                   CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
            FROM events
        """,
        "haversine": """
            SELECT n_nationkey, n_name,
                   round(2 * 6371.0088 * asin(sqrt(
                     pow(sin(radians(10.0 - (n_nationkey * 3.0 - 30.0)) / 2), 2)
                     + cos(radians(n_nationkey * 3.0 - 30.0)) * cos(radians(10.0))
                       * pow(sin(radians(106.0 - (n_nationkey * 7.0 - 80.0)) / 2), 2)
                   )), 3) AS dist_km
            FROM nation
        """,
        "politeness_drain": """
            SELECT host, CAST(rn - 1 AS INTEGER) AS slot, url, round(priority, 6) AS priority
            FROM (
              SELECT *, row_number() OVER (PARTITION BY host ORDER BY priority DESC, enqueue_seq ASC, url ASC) rn
              FROM (
                SELECT 'https://h' || CAST(user_id % 20 AS VARCHAR) || '.example/e' || CAST(event_id AS VARCHAR) AS url,
                       'h' || CAST(user_id % 20 AS VARCHAR) || '.example' AS host,
                       value AS priority, 0 AS enqueue_seq
                FROM events))
            WHERE rn <= 3
        """,
        "seen_filter": """
            SELECT 'https://x.example/e' || CAST(event_id AS VARCHAR) AS url
            FROM events WHERE event_id % 3 <> 0
        """,
        "ann_topk": _BRUTE_TOPK_SQL,
        # lsh/ivf candidate sets provably contain the exact top-k on the
        # fixed test corpora (see the determinism notes above q_lsh_ann), so
        # the reranked approximate output equals the brute-force oracle
        "lsh_ann": _BRUTE_TOPK_SQL,
        "ivf_ann": _BRUTE_TOPK_SQL,
        # exact brute force over the planted clustered corpus; equals the
        # pruned (n_probe=2 of 8) IVF output by construction — see
        # q_ivf_ann_pruned's docstring for the containment proof
        "ivf_ann_pruned": """
            WITH corpus AS (
              SELECT vec_id,
                     list_transform(range(0, 8), j -> CASE WHEN j = vec_id % 8 THEN 1.0
                        ELSE 0.02 * (vec_id % 97) / 97.0 * (j + 1) / 10.0 END) AS v
              FROM embeddings
            ), q AS (
              SELECT i AS query_id,
                     list_transform(range(0, 8), j -> CASE WHEN j = i THEN 1.0 ELSE 0.0 END) AS qv
              FROM range(0, 3) t(i)
            )
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(c.v, q.qv) AS cosine,
                     row_number() OVER (PARTITION BY q.query_id
                                        ORDER BY list_cosine_similarity(c.v, q.qv) DESC,
                                                 c.vec_id ASC) AS rank
              FROM corpus c, q)
            WHERE rank <= 5
        """,
        # exact brute force over the lossless-PQ corpus; equals the ADC +
        # rerank output by construction — see q_pq_ann's docstring
        "pq_ann": """
            WITH corpus AS (
              SELECT vec_id,
                     list_transform(range(0, 8), j -> CASE
                        WHEN j % 2 = (vec_id // (j // 2 + 1)) % 2
                        THEN CAST(1 + vec_id % 7 AS DOUBLE) ELSE 0.0 END) AS v
              FROM embeddings
            ), q AS (
              SELECT i AS query_id,
                     list_transform(range(0, 8), j -> CASE
                        WHEN j % 2 = (i // (j // 2 + 1)) % 2
                        THEN 1.0 ELSE 0.0 END) AS qv
              FROM range(0, 3) t(i)
            )
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(c.v, q.qv) AS cosine,
                     row_number() OVER (PARTITION BY q.query_id
                                        ORDER BY list_cosine_similarity(c.v, q.qv) DESC,
                                                 c.vec_id ASC) AS rank
              FROM corpus c, q)
            WHERE rank <= 5
        """,
        # exact brute force over the dual-axis power-of-two corpus; equals
        # the IVF-routed ADC + rerank output by construction — see
        # q_ivfadc_ann's docstring for the routing + losslessness proof
        "ivfadc_ann": """
            WITH base AS (
              SELECT vec_id,
                     CAST(vec_id % 8 AS INT) AS c,
                     CAST((vec_id % 8 + 2 + 2 * ((vec_id // 8) % 3)) % 8 AS INT) AS c2,
                     power(2.0, CAST(vec_id % 3 AS DOUBLE)) AS g
              FROM embeddings
            ), corpus AS (
              SELECT vec_id,
                     list_transform(range(0, 8), j -> CASE WHEN j = c THEN 2.0 * g
                        WHEN j = c2 THEN g ELSE 0.0 END) AS v
              FROM base
            ), q AS (
              SELECT i AS query_id,
                     list_transform(range(0, 8), j -> CASE WHEN j = i THEN 1.0 ELSE 0.0 END) AS qv
              FROM range(0, 3) t(i)
            )
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(c.v, q.qv) AS cosine,
                     row_number() OVER (PARTITION BY q.query_id
                                        ORDER BY list_cosine_similarity(c.v, q.qv) DESC,
                                                 c.vec_id ASC) AS rank
              FROM corpus c, q)
            WHERE rank <= 5
        """,
        "minhash_near_dup": _MINHASH_PAIRS_SQL,
        "decontaminate": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
              SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t)-1), i -> array_to_string(t[i:i+2], ' ')) END) AS s
              FROM t),
            ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_shingles
            FROM ex JOIN ev USING (g) GROUP BY doc_id
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_MINHASH_PAIRS_SQL})
            ), und AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), walk(v, r) AS (
              SELECT src, src FROM und
              UNION
              SELECT w.v, u.dst FROM walk w JOIN und u ON w.r = u.src
            )
            SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
            FROM walk GROUP BY v
        """,
        "simhash_near_dup": f"""
            WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
            h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok),1,15)) AS BIGINT) AS h FROM toks),
            bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                     FROM h, range(60) r(b) GROUP BY 1, 2),
            sim AS (SELECT d.doc_id,
                           coalesce((SELECT sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
                                     FROM bits WHERE bits.doc_id = d.doc_id), 0) AS simhash
                    FROM documents d)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "fingerprint": """
            WITH cps AS (
              SELECT doc_id, len(text) AS n,
                     CAST(list_transform(range(1, len(text)+1), i -> unicode(text[i])) AS BIGINT[]) AS cp
              FROM documents),
            pos AS (
              SELECT doc_id, n, cp, unnest(range(1, n - 16 + 2)) AS i
              FROM cps WHERE n >= 16),
            kg AS (
              SELECT doc_id, i,
                     list_reduce(cp[i:i+15], (acc, c) -> (acc * 257 + c) % 2147483647) AS h
              FROM pos),
            wm AS (
              SELECT doc_id, i,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin,
                     max(i) OVER (PARTITION BY doc_id) AS m
              FROM kg),
            cnt AS (
              SELECT doc_id, count(DISTINCT wmin) AS nf
              FROM wm WHERE i <= greatest(m - 7, 1) GROUP BY doc_id)
            SELECT d.doc_id, CAST(coalesce(cnt.nf, 0) AS BIGINT) AS n_fingerprints
            FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
        """,
        "embedding_near_dup": """
            WITH planted AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS embedding
              FROM embeddings WHERE vec_id < 20)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
            FROM planted a JOIN planted b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
        """,
        "multimodal_decode": """
            SELECT doc_id AS media_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   CAST(32 + doc_id % 64 AS INTEGER) AS width,
                   CAST(256 AS INTEGER) AS n_bytes,
                   round(list_sum(list_transform(range(0, 256), i -> (doc_id * 31 + i * 7) % 256)) / 256.0, 4) AS mean_byte
            FROM documents
        """,
        "feed_seeds": """
            SELECT 'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example/p'
                       || CAST(doc_id AS VARCHAR) AS url,
                   round(0.5 * pow(0.5,
                       ((epoch(TIMESTAMP '2026-03-01 00:00:00')
                         - epoch(CAST('2026-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                                      || ' 00:00:00' AS TIMESTAMP)))
                        / 86400.0) / 7.0), 6) AS priority
            FROM documents
        """,
        "audio_features": """
            WITH base AS (
                SELECT doc_id AS media_id, 64 + doc_id % 64 AS n,
                       list_transform(range(0, 64 + doc_id % 64),
                           i -> (doc_id * 31 + i * 7) % 256 - 128) AS s
                FROM documents)
            SELECT media_id,
                   CAST(8000 AS INTEGER) AS sample_rate,
                   CAST(n AS BIGINT) AS n_samples,
                   CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
                   CAST(list_max(list_transform(s, x -> abs(x))) AS INTEGER) AS peak,
                   CAST(list_sum(list_transform(range(1, n),
                        i -> CASE WHEN (s[i] < 0) <> (s[i+1] < 0)
                             THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings,
                   round(sqrt(list_sum(list_transform(s,
                        x -> CAST(x * x AS DOUBLE))) / n), 4) AS rms
            FROM base
        """,
        "ngram_search": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            bg AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 2 THEN []
                   ELSE list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' ')) END)) AS ngram
                   FROM toks)
            SELECT doc_id, count(DISTINCT ngram) AS n_terms FROM bg
            WHERE ngram IN ({", ".join(f"'{t}'" for t in NGRAM_TERMS)})
            GROUP BY doc_id
        """,
        "batch_infer": f"""
            SELECT doc_id,
                   (CAST(len({_TOKS}) * 7 + len(text) AS BIGINT) % 100) / 100.0 AS score,
                   CASE WHEN (CAST(len({_TOKS}) * 7 + len(text) AS BIGINT) % 100) / 100.0 > 0.5
                        THEN 'keep' ELSE 'drop' END AS label
            FROM documents
        """,
        "repetition": f"""
            WITH t AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), b AS (
                SELECT doc_id, toks, len(toks) AS n,
                       CASE WHEN len(toks) < 2 THEN [] ELSE
                         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                       END AS bigrams
                FROM t
            )
            SELECT doc_id,
                   round(CASE WHEN n <= 0 THEN 1.0 ELSE len(list_distinct(toks)) / n END, 6) AS ttr,
                   round(CASE WHEN len(bigrams) <= 0 THEN 0.0
                         ELSE 1 - len(list_distinct(bigrams)) / len(bigrams) END, 6) AS dup_bigram
            FROM b
        """,
        "stratified_sample": """
            SELECT doc_id, lang, source FROM (
                SELECT doc_id, lang, source,
                       row_number() OVER (
                           PARTITION BY lang, source
                           ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296 ASC, doc_id ASC
                       ) AS rn
                FROM documents
            ) WHERE rn <= 5
        """,
        "latest_records": """
            WITH hist AS (
                SELECT doc_id, CAST(0 AS BIGINT) AS epoch, text FROM documents
                UNION ALL
                SELECT doc_id, CAST(1 AS BIGINT) AS epoch, text || ' [v2]' AS text
                FROM documents WHERE doc_id % 3 = 0
            )
            SELECT doc_id,
                   max(epoch) AS latest_epoch,
                   CAST(len(arg_max(text, epoch)) AS BIGINT) AS text_len
            FROM hist GROUP BY doc_id
        """,
        "revisit_census": """
            WITH base AS (
                SELECT 'https://docs.example/' || doc_id AS url,
                       TIMESTAMP '2026-01-01 00:00:00' AS warc_ts,
                       text AS body
                FROM documents
                UNION ALL
                SELECT 'https://docs.example/' || doc_id || '?re=1' AS url,
                       TIMESTAMP '2026-01-02 00:00:00' AS warc_ts,
                       CASE WHEN doc_id % 3 = 0 THEN text || ' [v2]'
                            ELSE text END AS body
                FROM documents
            ), w AS (
                SELECT url,
                       row_number() OVER (
                           PARTITION BY body ORDER BY warc_ts, url
                       ) AS rn,
                       first_value(url) OVER (
                           PARTITION BY body ORDER BY warc_ts, url
                       ) AS first_url
                FROM base
            )
            SELECT url,
                   rn > 1 AS revisit,
                   CASE WHEN rn > 1 THEN first_url END AS refers_url
            FROM w
        """,
        "rare_terms": f"""
            WITH t AS (
                SELECT doc_id, unnest({_TOKS}) AS term FROM documents
            ), tf AS (
                SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM t GROUP BY doc_id, term
            ), dfq AS (
                SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
            ), s AS (
                SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                       tf.tf / (dfq.df + 1.0) AS score,
                       CAST(row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf / (dfq.df + 1.0) DESC, tf.term ASC
                       ) AS BIGINT) AS rank
                FROM tf JOIN dfq USING (term)
            )
            SELECT doc_id, term, tf, df, score, rank FROM s WHERE rank <= 3
        """,
        "pii_scrub": f"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact u' || CAST(doc_id AS VARCHAR)
                            || '@example.com from 10.0.'
                            || CAST(doc_id % 256 AS VARCHAR)
                            || '.7 call +84-90-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            || '-123' AS text
                FROM documents)
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{TX.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{TX.PII_IPV4_RE}', '<IP>', 'g'),
                       '{TX.PII_PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
                   CAST(len(regexp_extract_all(text, '{TX.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text, '{TX.PII_IPV4_RE}')) AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(text, '{TX.PII_PHONE_RE}')) AS BIGINT) AS n_phones
            FROM aug
        """,
        "paragraph_dedup": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            p AS (
                SELECT doc_id,
                       list_transform(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT)),
                                      i -> array_to_string(ws[i*3+1 : i*3+3], ' ')) AS paras
                FROM w),
            ex0 AS (
                SELECT doc_id,
                       CAST(unnest(range(0, len(paras))) AS INT) AS pos,
                       unnest(paras) AS para
                FROM p),
            ex AS (SELECT * FROM ex0 WHERE len(trim(para)) > 0),
            k AS (
                SELECT doc_id, pos, para,
                       row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
                FROM ex)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paragraphs,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM k GROUP BY doc_id
        """,
        "pagerank": _pagerank_oracle_sql(iters=5, damping=0.85),
        "fix_mojibake": f"""
            WITH aug AS (
                SELECT doc_id, text || ' ' || {_moji_suffix_case()} AS text
                FROM documents),
            f AS (SELECT doc_id, text,
                         {_moji_replace_sql("text")} AS fixed
                  FROM aug)
            SELECT doc_id, fixed,
                   (len(text) != len(fixed)) AS was_mojibake,
                   CAST(len(text) - len(fixed) AS BIGINT) AS n_chars_removed
            FROM f
        """,
        "substring_cut": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   w -> length(w) > 0) AS t
                FROM documents),
            grams AS (
                SELECT doc_id, CAST(u.i AS BIGINT) AS start,
                       array_to_string(t[u.i+1 : u.i+8], ' ') AS gram
                FROM toks,
                     UNNEST(range(0, greatest(len(t)-8+1, 0))) AS u(i)),
            winners AS (
                SELECT gram, count(*) AS c,
                       first(doc_id ORDER BY doc_id, start) AS wd,
                       first(start  ORDER BY doc_id, start) AS ws
                FROM grams GROUP BY gram),
            dups AS (
                SELECT g.doc_id, g.start, g.start + 8 AS e
                FROM grams g JOIN winners w USING (gram)
                WHERE w.c > 1
                  AND NOT (g.doc_id = w.wd AND g.start = w.ws)),
            marked AS (
                SELECT doc_id, start, e,
                       CASE WHEN start > coalesce(max(e) OVER (
                                PARTITION BY doc_id ORDER BY start
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), -1)
                            THEN 1 ELSE 0 END AS brk
                FROM dups),
            isl AS (
                SELECT *, sum(brk) OVER (
                    PARTITION BY doc_id ORDER BY start) AS island
                FROM marked),
            spans AS (
                SELECT doc_id,
                       CAST(min(start) AS BIGINT) AS span_start,
                       CAST(max(e) AS BIGINT) AS span_end
                FROM isl GROUP BY doc_id, island),
            cuts AS (
                SELECT doc_id,
                       list(struct_pack(s := span_start, e := span_end))
                           AS cuts
                FROM spans GROUP BY doc_id),
            cut AS (
                SELECT toks.doc_id, t,
                       list_filter(t, (x, i) ->
                           len(list_filter(
                               coalesce(cuts.cuts,
                                        CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
                               c -> i-1 >= c.s AND i-1 < c.e)) = 0) AS kept
                FROM toks LEFT JOIN cuts USING (doc_id))
            SELECT doc_id,
                   coalesce(array_to_string(kept, ' '), '') AS cleaned,
                   CAST(len(t) AS BIGINT) AS n_tokens,
                   CAST(len(kept) AS BIGINT) AS n_kept
            FROM cut
        """,
        "url_features": r"""
            WITH u AS (
                SELECT 'https://h' || CAST(user_id % 20 AS VARCHAR)
                       || '.example/'
                       || CASE CAST(event_id % 3 AS INT)
                            WHEN 0 THEN 'a/b/c/page'
                            WHEN 1 THEN 'p'
                            ELSE 'x/y/deep/q/r/s' END
                       || CAST(event_id AS VARCHAR)
                       || CASE WHEN event_id % 2 = 0
                               THEN '?id=' || CAST(event_id AS VARCHAR)
                                    || '&ref=u' || CAST(user_id AS VARCHAR)
                               ELSE '' END AS url
                FROM events),
            f AS (
                SELECT url,
                       split_part(split_part(url, '://', 2), '/', 1) AS host,
                       regexp_replace(url,
                           '^[a-z][a-z0-9+.-]*://[^/]*', '') AS pathq
                FROM u),
            g AS (
                SELECT url, host,
                       split_part(pathq, '?', 1) AS path,
                       split_part(pathq, '?', 2) AS query
                FROM f),
            h AS (
                SELECT url, host,
                       CAST(length(path) - length(replace(path, '/', ''))
                            AS BIGINT) AS path_depth,
                       CAST(CASE WHEN length(query) = 0 THEN 0
                                 ELSE length(query)
                                      - length(replace(query, '&', '')) + 1
                            END AS BIGINT) AS n_params,
                       CAST(length(regexp_replace(url, '[^0-9]', '', 'g'))
                            AS DOUBLE)
                           / CAST(greatest(length(url), 1) AS DOUBLE)
                           AS digit_ratio,
                       CAST(length(url) AS BIGINT) AS url_len
                FROM g)
            SELECT url, host, path_depth, n_params, digit_ratio, url_len,
                   (path_depth <= 4 AND n_params <= 2
                    AND digit_ratio <= 0.25 AND url_len <= 80) AS keep
            FROM h
        """,
        "pack_sequences": r"""
            WITH base AS (
                SELECT doc_id,
                       CAST(doc_id % 8 AS BIGINT) AS shard,
                       CAST(len(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           w -> length(w) > 0)) AS BIGINT) AS n_tokens
                FROM documents),
            cum AS (
                SELECT doc_id, shard, n_tokens,
                       coalesce(CAST(sum(n_tokens) OVER (
                           PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS BIGINT), 0) AS s
                FROM base)
            SELECT doc_id, shard, n_tokens,
                   s // 512 AS seq_id,
                   s % 512 AS offset_in_seq
            FROM cum
        """,
        "dsir_affinity": r"""
            WITH docs AS (
                SELECT doc_id, text, (doc_id % 17 = 0) AS is_target
                FROM documents),
            toks AS (
                SELECT doc_id, is_target,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   w -> length(w) > 0) AS t
                FROM docs),
            feats AS (
                SELECT doc_id, is_target, f.gram
                FROM toks,
                     UNNEST(list_concat(
                         t,
                         CASE WHEN len(t) >= 2
                              THEN list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i+1])
                              ELSE CAST([] AS VARCHAR[]) END)) AS f(gram)),
            b AS (
                SELECT doc_id, is_target,
                       CAST(('0x' || substr(md5(gram),1,15)) AS BIGINT)
                           % 1024 AS b
                FROM feats),
            stats AS (
                SELECT b,
                       CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END)
                            AS BIGINT) AS t_cnt,
                       count(*) AS a_cnt
                FROM b GROUP BY b)
            SELECT doc_id, is_target,
                   CAST(sum(t_cnt + 1) AS BIGINT) AS aff_num,
                   CAST(sum(a_cnt + 1) AS BIGINT) AS aff_den,
                   CAST(CAST(sum(t_cnt + 1) AS BIGINT) AS DOUBLE)
                       / CAST(CAST(sum(a_cnt + 1) AS BIGINT) AS DOUBLE)
                       AS affinity
            FROM b JOIN stats USING (b)
            GROUP BY doc_id, is_target
        """,
        "substring_dedup": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   w -> length(w) > 0) AS t
                FROM documents),
            grams AS (
                SELECT doc_id, CAST(u.i AS BIGINT) AS start,
                       array_to_string(t[u.i+1 : u.i+8], ' ') AS gram
                FROM toks,
                     UNNEST(range(0, greatest(len(t)-8+1, 0))) AS u(i)),
            winners AS (
                SELECT gram, count(*) AS c,
                       first(doc_id ORDER BY doc_id, start) AS wd,
                       first(start  ORDER BY doc_id, start) AS ws
                FROM grams GROUP BY gram),
            dups AS (
                SELECT g.doc_id, g.start, g.start + 8 AS e
                FROM grams g JOIN winners w USING (gram)
                WHERE w.c > 1
                  AND NOT (g.doc_id = w.wd AND g.start = w.ws)),
            marked AS (
                SELECT doc_id, start, e,
                       CASE WHEN start > coalesce(max(e) OVER (
                                PARTITION BY doc_id ORDER BY start
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), -1)
                            THEN 1 ELSE 0 END AS brk
                FROM dups),
            isl AS (
                SELECT *, sum(brk) OVER (
                    PARTITION BY doc_id ORDER BY start) AS island
                FROM marked)
            SELECT doc_id,
                   CAST(min(start) AS BIGINT) AS span_start,
                   CAST(max(e) AS BIGINT) AS span_end,
                   CAST(count(*) AS BIGINT) AS n_windows
            FROM isl GROUP BY doc_id, island
        """,
        "c4_clean": rf"""
            WITH aug AS (
                SELECT doc_id,
                       text || '.' || chr(10) || {_c4_suffix_case()} AS text
                FROM documents),
            l AS (SELECT doc_id, text,
                         string_split(text, chr(10)) AS lines
                  FROM aug),
            k AS (SELECT doc_id, text, lines,
                         list_filter(lines, x ->
                             regexp_matches(rtrim(x), '[.!?"{'”'}]$')
                             AND len(list_filter(
                                     string_split_regex(trim(x), '\s+'),
                                     w -> len(w) >= 1)) >= 3
                             AND NOT contains(lower(x), 'javascript')
                         ) AS kept
                  FROM l)
            SELECT doc_id,
                   array_to_string(kept, chr(10)) AS cleaned,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(text, '{{') AS has_brace
            FROM k
        """,
        "domain_stats": r"""
            WITH a AS (
                SELECT source AS domain,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(count(DISTINCT coalesce(text, ''))
                            AS BIGINT) AS n_unique_texts,
                       CAST(sum(len(list_filter(
                           string_split_regex(coalesce(text, ''), '\s+'),
                           w -> len(w) >= 1))) AS BIGINT) AS total_tokens
                FROM documents GROUP BY source)
            SELECT domain, n_docs, n_unique_texts,
                   (n_docs - n_unique_texts) / n_docs AS dup_rate,
                   total_tokens,
                   total_tokens / n_docs AS mean_tokens,
                   (n_docs >= 2
                    AND (n_docs - n_unique_texts) / n_docs <= 0.5) AS keep
            FROM a
        """,
        "unigram_surprisal": f"""
            WITH tf AS (
                SELECT doc_id, lang, CAST(doc_id % 16 AS BIGINT) AS shard,
                       term, CAST(count(*) AS BIGINT) AS tf
                FROM (SELECT doc_id, lang, unnest({_TOKS}) AS term
                      FROM documents)
                GROUP BY doc_id, lang, shard, term),
            vocab AS (
                SELECT term, CAST(sum(tf) AS BIGINT) AS c
                FROM tf GROUP BY term),
            per_doc AS (
                SELECT doc_id, lang, shard,
                       CAST(sum(tf) AS BIGINT) AS n_tokens,
                       CAST(sum(tf * (length(bin(c)) - 1))
                            AS BIGINT) AS sum_bits
                FROM tf JOIN vocab USING (term)
                GROUP BY doc_id, lang, shard)
            SELECT doc_id, lang, shard, n_tokens, sum_bits,
                   sum_bits / n_tokens AS mean_bits,
                   CAST(ntile(3) OVER (
                       PARTITION BY lang, shard
                       ORDER BY sum_bits / n_tokens DESC, doc_id ASC
                   ) AS BIGINT) AS bucket
            FROM per_doc
        """,
        "mixture_sample": r"""
            WITH q AS (
                SELECT source AS domain,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       least(CAST(count(*) AS BIGINT),
                             CAST(ceil(sqrt(count(*)) * 4.0)
                                  AS BIGINT)) AS quota
                FROM documents GROUP BY source),
            r AS (
                SELECT doc_id, source AS domain,
                       CAST(row_number() OVER (
                           PARTITION BY source
                           ORDER BY ((doc_id % 2147483648) * 2654435761)
                                    % 4294967296 ASC, doc_id ASC
                       ) AS BIGINT) AS rn
                FROM documents)
            SELECT r.doc_id, r.domain, r.rn, q.quota, q.n_docs
            FROM r JOIN q ON q.domain = r.domain
            WHERE r.rn <= q.quota
        """,
        "incremental_dedup": r"""
            WITH aug AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN 'boilerplate page'
                            ELSE text END AS text
                FROM documents),
            hist AS (
                SELECT DISTINCT coalesce(text, '') AS t
                FROM aug WHERE doc_id % 4 = 0),
            inc AS (
                SELECT doc_id, text, coalesce(text, '') AS t
                FROM aug WHERE doc_id % 4 <> 0),
            fresh AS (
                SELECT i.* FROM inc i
                WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.t = i.t)),
            first_in_batch AS (
                SELECT t, min(doc_id) AS doc_id FROM fresh GROUP BY t)
            SELECT f.doc_id, i.text, TRUE AS is_new_text
            FROM first_in_batch f JOIN inc i ON i.doc_id = f.doc_id
        """,
        "dup_profile": r"""
            WITH aug AS (
                SELECT CASE WHEN doc_id % 5 = 0 THEN 'boilerplate page'
                            WHEN doc_id % 7 = 0 THEN 'cookie notice'
                            ELSE text END AS text
                FROM documents),
            per AS (
                SELECT coalesce(text, '') AS t,
                       CAST(count(*) AS BIGINT) AS cluster_size
                FROM aug GROUP BY t)
            SELECT cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(cluster_size * count(*) AS BIGINT) AS n_docs
            FROM per GROUP BY cluster_size
        """,
        "bpe_pairs": f"""
            WITH vocab AS (
                SELECT word, CAST(count(*) AS BIGINT) AS freq
                FROM (SELECT unnest({_TOKS}) AS word FROM documents)
                GROUP BY word HAVING length(word) >= 2),
            pairs AS (
                SELECT word, freq,
                       unnest(list_transform(range(1, length(word)),
                              i -> word[i:i+1])) AS pair
                FROM vocab)
            SELECT pair,
                   CAST(sum(freq) AS BIGINT) AS pair_count,
                   CAST(count(DISTINCT word) AS BIGINT) AS n_words
            FROM pairs GROUP BY pair
            HAVING sum(freq) >= 2
        """,
        "recrawl_schedule": r"""
            WITH hist AS (
                SELECT 'u' || CAST(event_id % 120 AS VARCHAR) AS url,
                       event_id AS visit_ts,
                       event_type AS fingerprint
                FROM events),
            marked AS (
                SELECT url,
                       CASE WHEN lag(fingerprint) OVER (
                                PARTITION BY url ORDER BY visit_ts
                            ) IS NULL THEN NULL
                            WHEN lag(fingerprint) OVER (
                                PARTITION BY url ORDER BY visit_ts
                            ) <> fingerprint THEN 1 ELSE 0 END AS chg
                FROM hist),
            agg AS (
                SELECT url,
                       CAST(count(*) AS BIGINT) AS n_visits,
                       CAST(count(chg) AS BIGINT) AS n_intervals,
                       CAST(coalesce(sum(chg), 0) AS BIGINT) AS n_changes
                FROM marked GROUP BY url)
            SELECT url, n_visits, n_changes,
                   CASE WHEN n_intervals = 0 THEN NULL
                        ELSE n_changes / n_intervals END AS change_rate,
                   CAST(CASE WHEN n_changes = 0 OR n_intervals = 0
                             THEN 2592000
                             ELSE least(2592000, greatest(3600,
                                  (86400 * n_intervals) // n_changes))
                        END AS BIGINT) AS next_interval_s
            FROM agg
        """,
        "trap_detection": r"""
            WITH pages AS (
                SELECT 't' || CAST(user_id % 40 AS VARCHAR) AS host,
                       CASE WHEN (user_id % 40) % 8 = 7
                            THEN 'https://t' || CAST(user_id % 40 AS VARCHAR)
                                 || '.example/p?session='
                                 || CAST(event_id AS VARCHAR)
                            WHEN (user_id % 40) % 8 = 3
                            THEN 'https://t' || CAST(user_id % 40 AS VARCHAR)
                                 || '.example/x/x/x/x/p'
                                 || CAST(event_id AS VARCHAR)
                            ELSE 'https://t' || CAST(user_id % 40 AS VARCHAR)
                                 || '.example/a/'
                                 || CAST(event_id AS VARCHAR)
                       END AS url,
                       CASE WHEN (user_id % 40) % 8 = 7
                            THEN 'c' || CAST(event_id % 3 AS VARCHAR)
                            ELSE 'b' || CAST(event_id AS VARCHAR)
                       END AS content
                FROM events),
            feat AS (
                SELECT host, url, content,
                       coalesce(regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1),
                           '') AS path
                FROM pages),
            feat2 AS (
                SELECT host, url, content,
                       CAST(len(path) - len(replace(path, '/', ''))
                            AS BIGINT) AS depth,
                       CAST(coalesce(list_max(list_transform(
                            list_filter(string_split(path, '/'),
                                        u -> len(u) > 0),
                            s -> len(list_filter(
                                list_filter(string_split(path, '/'),
                                            v -> len(v) > 0),
                                w -> w = s)))), 0) AS BIGINT) AS rep
                FROM feat),
            agg AS (
                SELECT host,
                       CAST(count(*) AS BIGINT) AS n_pages,
                       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
                       CAST(count(DISTINCT content) AS BIGINT) AS n_contents,
                       CAST(max(depth) AS BIGINT) AS max_depth,
                       CAST(max(rep) AS BIGINT) AS max_seg_repeat
                FROM feat2 GROUP BY host)
            SELECT host, n_pages, n_urls, n_contents,
                   n_urls / n_contents AS urls_per_content,
                   max_depth, max_seg_repeat,
                   (n_urls >= 20 AND (n_urls / n_contents >= 5.0
                        OR max_depth > 16
                        OR max_seg_repeat > 3)) AS trap
            FROM agg
        """,
        "mirror_hosts": r"""
            WITH pages AS (
                SELECT 'm' || CAST(doc_id % 10 AS VARCHAR) AS host,
                       CASE WHEN doc_id % 7 = 0 THEN 'boiler'
                            WHEN doc_id % 10 IN (3, 8)
                            THEN 'shared:' || CAST((doc_id // 10) % 4 AS VARCHAR)
                            WHEN doc_id % 10 = 2
                            THEN 'part:' || CAST((doc_id // 10) % 6 AS VARCHAR)
                            WHEN doc_id % 10 = 7
                            THEN 'part:' || CAST((doc_id // 10) % 8 AS VARCHAR)
                            ELSE 'doc:' || CAST(doc_id AS VARCHAR)
                       END AS content
                FROM documents),
            fp AS (SELECT DISTINCT host, content FROM pages),
            rare AS (
                SELECT host, content FROM fp
                WHERE content IN (
                    SELECT content FROM fp
                    GROUP BY content HAVING count(*) <= 4)),
            sizes AS (
                SELECT host, CAST(count(*) AS BIGINT) AS n
                FROM rare GROUP BY host),
            ov AS (
                SELECT a.host AS host_a, b.host AS host_b,
                       CAST(count(*) AS BIGINT) AS overlap
                FROM rare a JOIN rare b
                  ON a.content = b.content AND a.host < b.host
                GROUP BY a.host, b.host)
            SELECT host_a, host_b, sa.n AS n_a, sb.n AS n_b, overlap,
                   overlap / (sa.n + sb.n - overlap) AS jaccard
            FROM ov
            JOIN sizes sa ON ov.host_a = sa.host
            JOIN sizes sb ON ov.host_b = sb.host
            WHERE overlap >= 2
              AND overlap / (sa.n + sb.n - overlap) >= 0.5
        """,
        "mirror_families": r"""
            WITH RECURSIVE pages AS (
                SELECT 'm' || CAST(doc_id % 10 AS VARCHAR) AS host,
                       CASE WHEN doc_id % 7 = 0 THEN 'boiler'
                            WHEN doc_id % 10 IN (3, 8)
                            THEN 'shared:' || CAST((doc_id // 10) % 4 AS VARCHAR)
                            WHEN doc_id % 10 = 2
                            THEN 'part:' || CAST((doc_id // 10) % 6 AS VARCHAR)
                            WHEN doc_id % 10 = 7
                            THEN 'part:' || CAST((doc_id // 10) % 8 AS VARCHAR)
                            ELSE 'doc:' || CAST(doc_id AS VARCHAR)
                       END AS content
                FROM documents),
            fp AS (SELECT DISTINCT host, content FROM pages),
            rare AS (
                SELECT host, content FROM fp
                WHERE content IN (
                    SELECT content FROM fp
                    GROUP BY content HAVING count(*) <= 4)),
            sizes AS (
                SELECT host, CAST(count(*) AS BIGINT) AS n
                FROM rare GROUP BY host),
            ov AS (
                SELECT a.host AS host_a, b.host AS host_b,
                       CAST(count(*) AS BIGINT) AS overlap
                FROM rare a JOIN rare b
                  ON a.content = b.content AND a.host < b.host
                GROUP BY a.host, b.host),
            pairs AS (
                SELECT host_a, host_b
                FROM ov
                JOIN sizes sa ON ov.host_a = sa.host
                JOIN sizes sb ON ov.host_b = sb.host
                WHERE overlap >= 2
                  AND overlap / (sa.n + sb.n - overlap) >= 0.5),
            und AS (
                SELECT host_a AS src, host_b AS dst FROM pairs
                UNION
                SELECT host_b, host_a FROM pairs),
            reach AS (
                SELECT src AS v, src AS r FROM und
                UNION
                SELECT reach.v, u.dst FROM reach JOIN und u ON reach.r = u.src)
            SELECT v AS host, min(r) AS canonical
            FROM reach GROUP BY v
        """,
        "politeness_audit": r"""
            WITH log AS (
                SELECT 'p' || CAST(user_id % 8 AS VARCHAR) AS host,
                       event_id AS ts_ms
                FROM events),
            d AS (
                SELECT 'p' || CAST(i AS VARCHAR) AS host,
                       CAST(300 + 400 * (i % 3) AS BIGINT) AS delay_ms
                FROM range(6) t(i)),
            gaps AS (
                SELECT host,
                       ts_ms - lag(ts_ms) OVER (
                           PARTITION BY host ORDER BY ts_ms
                       ) AS gap
                FROM log),
            j AS (
                SELECT g.host, g.gap,
                       coalesce(d.delay_ms, 1000) AS dd
                FROM gaps g LEFT JOIN d ON g.host = d.host)
            SELECT host,
                   CAST(count(*) AS BIGINT) AS n_fetches,
                   CAST(min(gap) AS BIGINT) AS min_gap_ms,
                   CAST(max(dd) AS BIGINT) AS delay_ms,
                   CAST(sum(CASE WHEN gap < dd THEN 1 ELSE 0 END)
                        AS BIGINT) AS violations,
                   (sum(CASE WHEN gap < dd THEN 1 ELSE 0 END) = 0)
                       AS compliant
            FROM j GROUP BY host
        """,
        "crawl_budget": r"""
            WITH pages AS (
                SELECT 't' || CAST(user_id % 40 AS VARCHAR) AS host,
                       CASE WHEN (user_id % 40) % 8 = 7
                            THEN 'https://t' || CAST(user_id % 40 AS VARCHAR)
                                 || '.example/p?session='
                                 || CAST(event_id AS VARCHAR)
                            WHEN (user_id % 40) % 8 = 3
                            THEN 'https://t' || CAST(user_id % 40 AS VARCHAR)
                                 || '.example/x/x/x/x/p'
                                 || CAST(event_id AS VARCHAR)
                            ELSE 'https://t' || CAST(user_id % 40 AS VARCHAR)
                                 || '.example/a/'
                                 || CAST(event_id AS VARCHAR)
                       END AS url,
                       CASE WHEN (user_id % 40) % 8 = 7
                            THEN 'c' || CAST(event_id % 3 AS VARCHAR)
                            ELSE 'b' || CAST(event_id AS VARCHAR)
                       END AS content
                FROM events),
            feat AS (
                SELECT host, url, content,
                       coalesce(regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1),
                           '') AS path
                FROM pages),
            feat2 AS (
                SELECT host, url, content,
                       CAST(len(path) - len(replace(path, '/', ''))
                            AS BIGINT) AS depth,
                       CAST(coalesce(list_max(list_transform(
                            list_filter(string_split(path, '/'),
                                        u -> len(u) > 0),
                            s -> len(list_filter(
                                list_filter(string_split(path, '/'),
                                            v -> len(v) > 0),
                                w -> w = s)))), 0) AS BIGINT) AS rep
                FROM feat),
            agg AS (
                SELECT host,
                       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
                       CAST(count(DISTINCT content) AS BIGINT) AS n_contents,
                       CAST(max(depth) AS BIGINT) AS max_depth,
                       CAST(max(rep) AS BIGINT) AS max_seg_repeat
                FROM feat2 GROUP BY host),
            gate AS (
                SELECT host, n_urls, n_contents,
                       (n_urls >= 20 AND (n_urls / n_contents >= 5.0
                            OR max_depth > 16
                            OR max_seg_repeat > 3)) AS trap
                FROM agg)
            SELECT host,
                   CAST(CASE WHEN trap THEN 10
                        ELSE greatest(10, least(100000,
                             1000 * n_contents // greatest(n_urls, 1)))
                   END AS BIGINT) AS budget
            FROM gate
        """,
        "dust_params": r"""
            WITH pages AS (
                SELECT 'https://h' || CAST(user_id % 5 AS VARCHAR)
                       || '/p' || CAST(event_id % 7 AS VARCHAR) || '?'
                       || CASE WHEN event_id % 2 = 0
                               THEN 'page=' || CAST(event_id % 3 AS VARCHAR)
                                    || '&sess=' || CAST(event_id % 13 AS VARCHAR)
                               ELSE 'sess=' || CAST(event_id % 13 AS VARCHAR)
                                    || '&page=' || CAST(event_id % 3 AS VARCHAR)
                          END AS url,
                       CAST((user_id % 5) * 1000 + (event_id % 7) * 10
                            + (event_id % 3) AS BIGINT) AS fprint
                FROM events),
            parsed AS (
                SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)
                           AS host,
                       regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
                       list_filter(string_split(
                           regexp_extract(url, '\?([^#]*)', 1), '&'),
                           p -> p <> '') AS params,
                       fprint
                FROM pages),
            expl AS (
                SELECT host, path, params, fprint,
                       unnest(list_distinct(list_transform(params,
                              p -> string_split(p, '=')[1]))) AS param
                FROM parsed),
            obs AS (
                SELECT host, param,
                       host || path || '?' || array_to_string(list_sort(
                           list_filter(params,
                               p -> string_split(p, '=')[1] <> param)), '&')
                           AS residual,
                       array_to_string(list_sort(
                           list_filter(params,
                               p -> string_split(p, '=')[1] = param)), '&')
                           AS val,
                       fprint
                FROM expl),
            g AS (
                SELECT host, param, residual,
                       count(DISTINCT val) AS nv,
                       count(DISTINCT fprint) AS nf
                FROM obs GROUP BY 1, 2, 3)
            SELECT host, param,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS multi_groups,
                   CAST(sum(CASE WHEN nv > 1 AND nf = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS irrelevant_groups,
                   CAST(sum(CASE WHEN nv > 1 THEN nv - 1 ELSE 0 END)
                        AS BIGINT) AS excess_urls,
                   (sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) >= 2
                    AND sum(CASE WHEN nv > 1 AND nf = 1 THEN 1 ELSE 0 END)
                        = sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END)) AS strip
            FROM g GROUP BY host, param
        """,
        "dust_apply": r"""
            WITH pages AS (
                SELECT 'https://h' || CAST(user_id % 5 AS VARCHAR)
                       || '/p' || CAST(event_id % 7 AS VARCHAR) || '?'
                       || CASE WHEN event_id % 2 = 0
                               THEN 'page=' || CAST(event_id % 3 AS VARCHAR)
                                    || '&sess=' || CAST(event_id % 13 AS VARCHAR)
                               ELSE 'sess=' || CAST(event_id % 13 AS VARCHAR)
                                    || '&page=' || CAST(event_id % 3 AS VARCHAR)
                          END AS url,
                       CAST((user_id % 5) * 1000 + (event_id % 7) * 10
                            + (event_id % 3) AS BIGINT) AS fprint
                FROM events),
            parsed AS (
                SELECT url,
                       regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)
                           AS host,
                       regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
                       list_filter(string_split(
                           regexp_extract(url, '\?([^#]*)', 1), '&'),
                           p -> p <> '') AS params,
                       fprint
                FROM pages),
            expl AS (
                SELECT host, path, params, fprint,
                       unnest(list_distinct(list_transform(params,
                              p -> string_split(p, '=')[1]))) AS param
                FROM parsed),
            obs AS (
                SELECT host, param,
                       host || path || '?' || array_to_string(list_sort(
                           list_filter(params,
                               p -> string_split(p, '=')[1] <> param)), '&')
                           AS residual,
                       array_to_string(list_sort(
                           list_filter(params,
                               p -> string_split(p, '=')[1] = param)), '&')
                           AS val,
                       fprint
                FROM expl),
            g AS (
                SELECT host, param, residual,
                       count(DISTINCT val) AS nv,
                       count(DISTINCT fprint) AS nf
                FROM obs GROUP BY 1, 2, 3),
            rules AS (
                SELECT host, param
                FROM g GROUP BY host, param
                HAVING sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) >= 2
                   AND sum(CASE WHEN nv > 1 AND nf = 1 THEN 1 ELSE 0 END)
                       = sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END)),
            strips AS (
                SELECT host, list_sort(list(param)) AS strip_list
                FROM rules GROUP BY host),
            rw AS (
                SELECT p.host, p.url AS before_url,
                       CASE WHEN len(kept) > 0
                            THEN prefix || '?' || array_to_string(kept, '&')
                            ELSE prefix END AS after_url
                FROM (
                    SELECT pr.host, pr.url,
                           regexp_extract(pr.url, '^([^?#]*)', 1) AS prefix,
                           CASE WHEN s.strip_list IS NULL THEN pr.params
                                ELSE list_filter(pr.params, q ->
                                     NOT list_contains(s.strip_list,
                                         string_split(q, '=')[1]))
                           END AS kept
                    FROM parsed pr LEFT JOIN strips s ON pr.host = s.host
                ) p)
            SELECT host,
                   CAST(count(DISTINCT before_url) AS BIGINT) AS n_before,
                   CAST(count(DISTINCT after_url) AS BIGINT) AS n_after
            FROM rw GROUP BY host
        """,
        "pld_stats": r"""
            WITH hosts AS (
                SELECT (CASE WHEN event_id % 3 = 0 THEN ''
                             WHEN event_id % 3 = 1 THEN 'www.'
                             ELSE 's' || CAST(event_id % 5 AS VARCHAR) || '.'
                        END)
                       || 'r' || CAST(user_id % 20 AS VARCHAR)
                       || (CASE WHEN user_id % 4 = 0 THEN '.com'
                                WHEN user_id % 4 = 1 THEN '.co.uk'
                                WHEN user_id % 4 = 2 THEN '.com.vn'
                                ELSE '.io' END) AS host
                FROM events),
            lab AS (SELECT host, string_split(host, '.') AS ls FROM hosts),
            pld AS (
                SELECT host,
                       CASE WHEN len(ls) <= 2 THEN host
                            WHEN array_to_string(ls[-2:], '.')
                                 IN ('co.uk', 'com.vn')
                            THEN array_to_string(ls[-3:], '.')
                            ELSE array_to_string(ls[-2:], '.')
                       END AS pld
                FROM lab)
            SELECT pld,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(count(*) AS BIGINT) AS n_pages
            FROM pld GROUP BY pld
        """,
        "opic": r"""
            WITH e AS (
                SELECT DISTINCT o_custkey % 100 AS src,
                                o_orderkey % 100 AS dst
                FROM orders WHERE o_custkey % 100 <> o_orderkey % 100),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
            od AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
                   FROM e GROUP BY src),
            w AS (SELECT e.src, e.dst, 1.0 / od.deg AS w
                  FROM e JOIN od ON e.src = od.src),
            s0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS cash,
                          0.0 AS history FROM nodes),
            p0 AS (SELECT coalesce(sum(s.cash), 0) AS pot FROM s0 s
                   LEFT JOIN od o ON s.node = o.src WHERE o.src IS NULL),
            i0 AS (SELECT w.dst AS node, sum(s.cash * w.w) AS i
                   FROM w JOIN s0 s ON w.src = s.node GROUP BY w.dst),
            s1 AS (SELECT s.node,
                          coalesce(i.i, 0)
                              + (SELECT pot FROM p0) / (SELECT n FROM nn)
                              AS cash,
                          s.history + s.cash AS history
                   FROM s0 s LEFT JOIN i0 i ON s.node = i.node),
            p1 AS (SELECT coalesce(sum(s.cash), 0) AS pot FROM s1 s
                   LEFT JOIN od o ON s.node = o.src WHERE o.src IS NULL),
            i1 AS (SELECT w.dst AS node, sum(s.cash * w.w) AS i
                   FROM w JOIN s1 s ON w.src = s.node GROUP BY w.dst),
            s2 AS (SELECT s.node,
                          coalesce(i.i, 0)
                              + (SELECT pot FROM p1) / (SELECT n FROM nn)
                              AS cash,
                          s.history + s.cash AS history
                   FROM s1 s LEFT JOIN i1 i ON s.node = i.node),
            p2 AS (SELECT coalesce(sum(s.cash), 0) AS pot FROM s2 s
                   LEFT JOIN od o ON s.node = o.src WHERE o.src IS NULL),
            i2 AS (SELECT w.dst AS node, sum(s.cash * w.w) AS i
                   FROM w JOIN s2 s ON w.src = s.node GROUP BY w.dst),
            s3 AS (SELECT s.node,
                          coalesce(i.i, 0)
                              + (SELECT pot FROM p2) / (SELECT n FROM nn)
                              AS cash,
                          s.history + s.cash AS history
                   FROM s2 s LEFT JOIN i2 i ON s.node = i.node)
            SELECT CAST(node AS BIGINT) AS node,
                   round(cash, 6) AS cash,
                   round(history, 6) AS history
            FROM s3
        """,
        "redirects": r"""
            WITH RECURSIVE ks AS (
                SELECT DISTINCT event_id % 400 AS k FROM events),
            raw_edges AS (
                SELECT 'n' || CAST(k AS VARCHAR) AS src,
                       'n' || CAST(k - 1 AS VARCHAR) AS dst
                FROM ks WHERE k % 8 <> 0
                UNION ALL
                SELECT 'n' || CAST(k AS VARCHAR),
                       'n' || CAST(k + 7 AS VARCHAR)
                FROM ks WHERE k % 8 = 0 AND k % 40 = 0),
            e AS (SELECT src, min(dst) AS dst FROM raw_edges GROUP BY src),
            walk AS (
                SELECT src, dst AS cur, CAST(1 AS BIGINT) AS hops FROM e
                UNION ALL
                SELECT w.src, e2.dst, w.hops + 1
                FROM walk w JOIN e e2 ON w.cur = e2.src
                WHERE w.hops < 8),
            res AS (
                SELECT w.src, w.cur AS final, w.hops
                FROM walk w LEFT JOIN e t ON w.cur = t.src
                WHERE t.src IS NULL)
            SELECT e.src,
                   r.final,
                   CAST(r.hops AS BIGINT) AS hops,
                   (r.src IS NOT NULL) AS resolved
            FROM e LEFT JOIN res r ON e.src = r.src
        """,
        "surt": r"""
            WITH pages AS (
                SELECT 'https://'
                       || CASE WHEN event_id % 2 = 0 THEN 'www.' ELSE '' END
                       || 'h' || CAST(user_id % 10 AS VARCHAR) || '.example'
                       || CASE WHEN event_id % 5 = 0 THEN ':8080' ELSE '' END
                       || '/p' || CAST(event_id % 7 AS VARCHAR) || '?'
                       || CASE WHEN event_id % 3 = 0
                               THEN 'b=' || CAST(event_id % 4 AS VARCHAR)
                                    || '&a=' || CAST(user_id % 3 AS VARCHAR)
                               ELSE 'a=' || CAST(user_id % 3 AS VARCHAR)
                                    || '&b=' || CAST(event_id % 4 AS VARCHAR)
                          END AS url
                FROM events),
            np AS (
                SELECT url,
                       regexp_replace(regexp_extract(url,
                           '^[a-z]+://([^/?#]+)', 1), '^.*@', '') AS hostport,
                       regexp_extract(url,
                           '^[a-z]+://[^/?#]+([^#]*)', 1) AS rest
                FROM pages),
            hp AS (
                SELECT url, rest,
                       regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
                       regexp_replace(hostport, ':[0-9]+$', '') AS host
                FROM np),
            hw AS (
                SELECT url, rest, port,
                       CASE WHEN len(regexp_replace(host,
                                     '^www[0-9]*\.', '')) > 0
                            THEN regexp_replace(host, '^www[0-9]*\.', '')
                            ELSE host END AS host2
                FROM hp),
            parts AS (
                SELECT url, port,
                       array_to_string(list_reverse(
                           string_split(host2, '.')), ',') AS revhost,
                       string_split(rest, '?')[1] AS path,
                       list_sort(list_filter(string_split(
                           regexp_extract(rest, '\?(.*)', 1), '&'),
                           p -> p <> '')) AS params
                FROM hw),
            keyed AS (
                SELECT url,
                       lower(revhost
                             || CASE WHEN port = '' THEN ''
                                     ELSE ':' || port END
                             || ')'
                             || CASE WHEN len(params) > 0
                                     THEN path || '?'
                                          || array_to_string(params, '&')
                                     ELSE path END) AS surt
                FROM parts)
            SELECT surt,
                   CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
                   CAST(count(*) AS BIGINT) AS n_fetches
            FROM keyed GROUP BY surt
        """,
        "shard_plan": r"""
            WITH w AS (
                SELECT 'w' || CAST(user_id % 40 AS VARCHAR) AS host,
                       CAST(count(*) AS BIGINT) AS weight
                FROM events GROUP BY 1),
            c AS (
                SELECT host, weight,
                       CAST(coalesce(sum(weight) OVER (
                           ORDER BY host
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT)
                           AS cum_before,
                       CAST(sum(weight) OVER () AS BIGINT) AS total
                FROM w)
            SELECT host, weight, cum_before,
                   CAST(least(7, (cum_before * 8) // total) AS INT) AS shard
            FROM c
        """,
        "hits": _hits_oracle_sql(5),
        "link_census": r"""
            WITH edges AS (
                SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS src_host,
                       CASE WHEN event_id % 11 <> 0
                            THEN 'h' || CAST(event_id % 23 AS VARCHAR)
                       END AS dst_host
                FROM events)
            SELECT src_host AS host,
                   CAST(count(*) AS BIGINT) AS n_links,
                   CAST(sum(CASE WHEN dst_host IS NOT NULL
                                  AND src_host = dst_host
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_intra,
                   CAST(count(*)
                        - sum(CASE WHEN dst_host IS NOT NULL
                                    AND src_host = dst_host
                                   THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_cross,
                   CAST(count(DISTINCT dst_host) AS BIGINT) AS n_dst_hosts,
                   CAST(sum(CASE WHEN dst_host IS NOT NULL
                                  AND src_host = dst_host
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS intra_ratio
            FROM edges GROUP BY src_host
        """,
        "anchor_stats": r"""
            WITH edges AS (
                SELECT 'u' || CAST(event_id % 50 AS VARCHAR) AS dst,
                       CASE WHEN event_id % 13 <> 0 THEN event_type
                            ELSE '' END AS anchor
                FROM events),
            counts AS (
                SELECT dst, anchor, CAST(count(*) AS BIGINT) AS n
                FROM edges
                WHERE anchor IS NOT NULL AND anchor <> ''
                GROUP BY dst, anchor),
            r AS (
                SELECT dst, anchor, n,
                       CAST(row_number() OVER (
                           PARTITION BY dst ORDER BY n DESC, anchor ASC
                       ) AS INT) AS rank
                FROM counts)
            SELECT dst, anchor, n, rank FROM r WHERE rank <= 2
        """,
        "corpus_stats": r"""
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(list_filter(
                       string_split_regex(coalesce(text, ''), '\s+'),
                       w -> len(w) >= 1))) AS BIGINT) AS total_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(min(n_chars) AS BIGINT) AS min_chars,
                   quantile_cont(n_chars, 0.5) AS median_chars,
                   quantile_cont(n_chars, 0.9) AS p90_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY lang
        """,
        "bm25_search": f"""
            WITH t AS (SELECT doc_id, unnest({_TOKS}) AS ngram FROM documents),
            tf AS (SELECT doc_id, ngram, CAST(count(*) AS BIGINT) AS tf
                   FROM t GROUP BY doc_id, ngram),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                             avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
            hits AS (SELECT * FROM tf
                     WHERE ngram IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})),
            dfq AS (SELECT ngram, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                    FROM hits GROUP BY ngram),
            idf AS (SELECT ngram,
                           ln(CAST(1.0 AS DOUBLE)
                              + (s.n_docs - df + CAST(0.5 AS DOUBLE))
                                / (df + CAST(0.5 AS DOUBLE))) AS idf
                    FROM dfq, stats s),
            scored AS (SELECT h.doc_id,
                              i.idf * (CAST(h.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                              / (CAST(h.tf AS DOUBLE)
                                 + CAST(1.2 AS DOUBLE)
                                   * (CAST(0.25 AS DOUBLE)
                                      + CAST(0.75 AS DOUBLE)
                                        * CAST(dl.dl AS DOUBLE) / s.avgdl)) AS contrib
                       FROM hits h
                       JOIN dl USING (doc_id)
                       JOIN idf i ON i.ngram = h.ngram, stats s)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                   round(sum(contrib), 6) AS score
            FROM scored GROUP BY doc_id
        """,
        "mime_sniff": f"""
            WITH p AS (
                SELECT doc_id,
                       hex(from_hex(([{", ".join(f"'{h}'" for h in _MIME_PREFIX_HEX)}])[CAST(doc_id % 10 + 1 AS INT)])
                           || encode(text)) AS hx
                FROM documents)
            SELECT doc_id, CASE
                WHEN substring(hx, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
                WHEN substring(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
                WHEN substring(hx, 1, 12) IN ('474946383761', '474946383961')
                     THEN 'image/gif'
                WHEN substring(hx, 1, 8) = '52494646'
                     AND substring(hx, 17, 8) = '57415645' THEN 'audio/x-wav'
                WHEN substring(hx, 1, 8) = '52494646'
                     AND substring(hx, 17, 8) = '41564920' THEN 'video/x-msvideo'
                WHEN substring(hx, 9, 8) = '66747970' THEN 'video/mp4'
                WHEN substring(hx, 1, 4) = '424D' THEN 'image/bmp'
                WHEN substring(hx, 1, 8) = '25504446' THEN 'application/pdf'
                WHEN substring(hx, 1, 4) = '1F8B' THEN 'application/gzip'
                WHEN substring(hx, 1, 8) = '504B0304' THEN 'application/zip'
                WHEN substring(hx, 1, 16) = '3C21444F43545950'
                     OR substring(hx, 1, 10) IN ('3C68746D6C', '3C48544D4C')
                     THEN 'text/html'
                ELSE 'application/octet-stream' END AS mime
            FROM p
        """,
        "char_entropy": r"""
            WITH c AS (
                SELECT doc_id, unnest(string_split(text, '')) AS ch
                FROM documents),
            cnt AS (
                SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
                FROM c GROUP BY doc_id, ch),
            agg AS (
                SELECT doc_id, sum(c) AS n, CAST(count(*) AS BIGINT) AS d,
                       sum(c * log2(c)) AS s
                FROM cnt GROUP BY doc_id)
            SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
                   d AS n_distinct_chars,
                   round(log2(n) - s / n, 6) AS entropy_bits
            FROM agg
        """,
        "degree_hist": r"""
            WITH e AS (
                SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS src,
                       CASE WHEN event_id % 11 <> 0
                            THEN 'h' || CAST(event_id % 23 AS VARCHAR) END AS dst
                FROM events),
            o AS (SELECT src AS node, count(*) AS degree FROM e GROUP BY src),
            i AS (SELECT dst AS node, count(*) AS degree FROM e
                  WHERE dst IS NOT NULL GROUP BY dst)
            SELECT 'out' AS direction,
                   CAST(length(bin(degree)) - 1 AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM o GROUP BY bucket
            UNION ALL
            SELECT 'in', CAST(length(bin(degree)) - 1 AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM i GROUP BY CAST(length(bin(degree)) - 1 AS BIGINT)
        """,
        "quality_calibrate": f"""
            WITH base AS ({_qscore_sql(", lang").strip()})
            SELECT doc_id, lang, quality,
                   round(cume_dist() OVER (
                       PARTITION BY lang ORDER BY quality ASC), 6) AS pct_rank
            FROM base
        """,
        # SQ8 shortlist provably contains the exact top-k on the fixed
        # corpora (verified at 3 SFs), so the exact-reranked output equals
        # the brute-force oracle — same pattern as lsh_ann/ivf_ann
        "ann_sq8": _BRUTE_TOPK_SQL,
        "outlink_entropy": r"""
            WITH e AS (
                SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS src,
                       CASE WHEN event_id % 11 <> 0
                            THEN 'h' || CAST(event_id % 23 AS VARCHAR) END AS dst
                FROM events),
            p AS (SELECT src AS node, dst, CAST(count(*) AS BIGINT) AS n
                  FROM e WHERE dst IS NOT NULL GROUP BY src, dst)
            SELECT node,
                   CAST(sum(n) AS BIGINT) AS n_edges,
                   CAST(count(*) AS BIGINT) AS n_dst,
                   round(log2(CAST(sum(n) AS DOUBLE))
                         - sum(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))
                           / CAST(sum(n) AS DOUBLE), 6) AS entropy_bits
            FROM p GROUP BY node
        """,
        "fairness_gini": r"""
            WITH f AS (
                SELECT 'p' || CAST(user_id % 5 AS VARCHAR) AS pld,
                       'h' || CAST(user_id % 40 AS VARCHAR) AS host
                FROM events),
            c AS (SELECT pld, host, CAST(count(*) AS BIGINT) AS n
                  FROM f GROUP BY pld, host),
            r AS (SELECT pld, n,
                         CAST(row_number() OVER (
                             PARTITION BY pld ORDER BY n ASC, host ASC
                         ) AS BIGINT) AS i
                  FROM c)
            SELECT pld,
                   CAST(count(*) AS BIGINT) AS n_hosts,
                   CAST(sum(n) AS BIGINT) AS n_fetches,
                   round(
                     (2.0 * CAST(sum(i * n) AS DOUBLE)
                      - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(n) AS DOUBLE))
                     / (CAST(count(*) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
                   , 6) AS gini
            FROM r GROUP BY pld
        """,
        "reciprocity": r"""
            WITH e AS (
                SELECT DISTINCT 'h' || CAST(user_id % 20 AS VARCHAR) AS a,
                       'h' || CAST(event_id % 23 AS VARCHAR) AS b
                FROM events
                WHERE event_id % 11 <> 0
                  AND 'h' || CAST(user_id % 20 AS VARCHAR)
                      <> 'h' || CAST(event_id % 23 AS VARCHAR))
            SELECT e.a AS node, CAST(count(*) AS BIGINT) AS n_out,
                   CAST(count(r.a) AS BIGINT) AS n_recip,
                   round(CAST(count(r.a) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS recip_rate
            FROM e LEFT JOIN e r ON r.a = e.b AND r.b = e.a
            GROUP BY e.a
        """,
        "rrf_hybrid": f"""
            WITH t AS (SELECT doc_id, unnest({_TOKS}) AS ngram FROM documents),
            tf AS (SELECT doc_id, ngram, CAST(count(*) AS BIGINT) AS tf
                   FROM t GROUP BY doc_id, ngram),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                             avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
            hits AS (SELECT * FROM tf
                     WHERE ngram IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})),
            dfq AS (SELECT ngram, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                    FROM hits GROUP BY ngram),
            idf AS (SELECT ngram,
                           ln(CAST(1.0 AS DOUBLE)
                              + (s.n_docs - df + CAST(0.5 AS DOUBLE))
                                / (df + CAST(0.5 AS DOUBLE))) AS idf
                    FROM dfq, stats s),
            scored AS (SELECT h.doc_id,
                              i.idf * (CAST(h.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                              / (CAST(h.tf AS DOUBLE)
                                 + CAST(1.2 AS DOUBLE)
                                   * (CAST(0.25 AS DOUBLE)
                                      + CAST(0.75 AS DOUBLE)
                                        * CAST(dl.dl AS DOUBLE) / s.avgdl)) AS contrib
                       FROM hits h
                       JOIN dl USING (doc_id)
                       JOIN idf i ON i.ngram = h.ngram, stats s),
            bm AS (SELECT doc_id, round(sum(contrib), 6) AS score
                   FROM scored GROUP BY doc_id),
            bmr AS (SELECT doc_id,
                           row_number() OVER (ORDER BY score DESC, doc_id ASC)
                               AS rank
                    FROM bm),
            bm20 AS (SELECT doc_id, rank FROM bmr WHERE rank <= 20),
            dq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0),
            dr AS (SELECT c.vec_id AS doc_id,
                          row_number() OVER (
                              ORDER BY list_cosine_similarity(
                                  CAST(c.embedding AS DOUBLE[]), dq.qv) DESC,
                              c.vec_id ASC) AS rank
                   FROM embeddings c, dq),
            d20 AS (SELECT doc_id, rank FROM dr WHERE rank <= 20),
            u AS (SELECT doc_id,
                         1.0 / (60.0 + CAST(rank AS DOUBLE)) AS contrib
                  FROM bm20
                  UNION ALL
                  SELECT doc_id, 1.0 / (60.0 + CAST(rank AS DOUBLE))
                  FROM d20)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_channels,
                   round(sum(contrib), 6) AS rrf
            FROM u GROUP BY doc_id
        """,
        "budget_cut": f"""
            WITH q AS ({_qscore_sql().strip()}),
            base AS (
                SELECT q.doc_id, q.quality, t.n_tokens
                FROM q JOIN (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
                             FROM documents) t USING (doc_id)),
            tot AS (SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS b FROM base),
            c AS (SELECT doc_id, quality, n_tokens,
                         CAST(sum(n_tokens) OVER (
                             ORDER BY quality DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                  FROM base)
            SELECT doc_id, quality, n_tokens, cum_tokens
            FROM c, tot
            WHERE cum_tokens - n_tokens < b
        """,
        "vocab_coverage": f"""
            WITH t AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            v AS (SELECT token FROM (
                      SELECT token, count(*) AS n FROM t GROUP BY token)
                  ORDER BY n DESC, token ASC LIMIT 10),
            j AS (SELECT t.doc_id,
                         CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
                  FROM t LEFT JOIN v ON v.token = t.token)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(oov) AS BIGINT) AS n_oov,
                   CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
            FROM j GROUP BY doc_id
        """,
        "bpe_encode": _bpe_oracle_sql(),
        "bpe_train": _bpe_train_oracle_sql(),
        "bpe_fertility": _bpe_fertility_oracle_sql(),
        "trustrank": _trustrank_oracle_sql(),
        "image_dedup": """
            WITH g AS (
              SELECT doc_id,
                     doc_id - CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS seed
              FROM documents),
            m AS (
              SELECT doc_id,
                     list_transform(range(0, 72), c ->
                       list_sum(list_transform(range(0, 16), t ->
                         (seed * 7
                          + ((c % 9) * 4 + t % 4 + seed % 7) * 3
                          + ((c // 9) * 4 + t // 4) * 11
                          + ((c % 9) * 4 + t % 4) * ((c // 9) * 4 + t // 4)
                            * (1 + seed % 5))
                         % 256)) / 16.0) AS gm
              FROM g),
            b AS (
              SELECT doc_id,
                     list_sum(list_transform(range(0, 32), k ->
                       CASE WHEN gm[(k // 8) * 9 + (k % 8) + 1]
                               > gm[(k // 8) * 9 + (k % 8) + 2]
                            THEN 1::BIGINT << k ELSE 0 END)) AS lo,
                     list_sum(list_transform(range(32, 64), k ->
                       CASE WHEN gm[(k // 8) * 9 + (k % 8) + 1]
                               > gm[(k // 8) * 9 + (k % 8) + 2]
                            THEN 1::BIGINT << (k - 32) ELSE 0 END)) AS hi
              FROM m),
            h AS (
              SELECT doc_id AS media_id,
                     lower(lpad(hex(hi), 8, '0') || lpad(hex(lo), 8, '0')) AS dhash
              FROM b)
            SELECT media_id, dhash,
                   CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS dup_group_size
            FROM h
        """,
        "containment": """
            WITH aug AS (
              SELECT b.doc_id,
                     CASE WHEN b.doc_id % 10 = 7 AND o.qtext IS NOT NULL
                          THEN b.text || ' quoted: ' || o.qtext
                          ELSE b.text END AS text
              FROM documents b
              LEFT JOIN (SELECT doc_id + 7 AS doc_id, text AS qtext
                         FROM documents) o USING (doc_id)),
            cps AS (
              SELECT doc_id, len(text) AS n,
                     CAST(list_transform(range(1, len(text)+1), i -> unicode(text[i])) AS BIGINT[]) AS cp
              FROM aug),
            pos AS (
              SELECT doc_id, n, cp, unnest(range(1, n - 16 + 2)) AS i
              FROM cps WHERE n >= 16),
            kg AS (
              SELECT doc_id, i,
                     list_reduce(cp[i:i+15], (acc, c) -> (acc * 257 + c) % 2147483647) AS h
              FROM pos),
            wm AS (
              SELECT doc_id, i,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin,
                     max(i) OVER (PARTITION BY doc_id) AS m
              FROM kg),
            fps AS (
              SELECT DISTINCT doc_id, wmin AS fp FROM wm
              WHERE i <= greatest(m - 7, 1)),
            sizes AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id),
            keepfp AS (SELECT fp FROM (SELECT fp, count(*) AS c FROM fps GROUP BY fp)
                       WHERE c <= 50),
            capped AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keepfp USING (fp)),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(count(*) AS BIGINT) AS overlap
              FROM capped a JOIN capped b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT id_a, id_b, overlap,
                   CAST(overlap AS DOUBLE) / sa.n_fp AS containment_a,
                   CAST(overlap AS DOUBLE) / sb.n_fp AS containment_b
            FROM p
            JOIN sizes sa ON sa.doc_id = p.id_a
            JOIN sizes sb ON sb.doc_id = p.id_b
            WHERE greatest(CAST(overlap AS DOUBLE) / sa.n_fp,
                           CAST(overlap AS DOUBLE) / sb.n_fp) >= 0.8
        """,
        "dedup_survivors": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_MINHASH_PAIRS_SQL})
            ), und AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), walk(v, r) AS (
              SELECT src, src FROM und
              UNION
              SELECT w.v, u.dst FROM walk w JOIN und u ON w.r = u.src
            ), comp AS (
              SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
              FROM walk GROUP BY v
            ), q AS ({_QUALITY_SQL.strip()})
            SELECT c.doc_id, c.cluster_id, q.quality,
                   (row_number() OVER (
                        PARTITION BY c.cluster_id
                        ORDER BY q.quality DESC, c.doc_id ASC) = 1) AS keep
            FROM comp c JOIN q ON q.doc_id = c.doc_id
        """,
        "gopher_gate": f"""
            WITH b AS (
                SELECT doc_id, text, {_TOKS} AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents),
            m AS (
                SELECT doc_id,
                       len(toks) AS n,
                       CAST(greatest(len(toks), 1) AS DOUBLE) AS n1,
                       coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS wc,
                       len(text) - len(replace(text, '#', '')) AS n_hash,
                       (len(text) - len(replace(text, '...', ''))) / 3 AS n_ell,
                       CAST(greatest(len(lines), 1) AS DOUBLE) AS n_lines,
                       len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*\u2022]'))) AS n_bullet,
                       len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|\u2026)\\s*$'))) AS n_ellline,
                       len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
                       len(list_filter(toks, t -> list_contains(['the','be','to','of','and','that','have','with'], t))) AS n_stop
                FROM b)
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_words,
                   CAST(wc AS DOUBLE) / n1 AS mean_word_len,
                   (n_hash + n_ell) / n1 AS symbol_ratio,
                   n_bullet / n_lines AS bullet_frac,
                   n_ellline / n_lines AS ellipsis_line_frac,
                   n_alpha / n1 AS alpha_word_frac,
                   CAST(n_stop AS BIGINT) AS n_stopwords,
                   (n >= 50 AND n <= 100000
                    AND CAST(wc AS DOUBLE) / n1 >= 3.0 AND CAST(wc AS DOUBLE) / n1 <= 10.0
                    AND (n_hash + n_ell) / n1 <= 0.1
                    AND n_bullet / n_lines < 0.9
                    AND n_ellline / n_lines < 0.3
                    AND n_alpha / n1 >= 0.8
                    AND n_stop >= 2) AS keep
            FROM m
        """,
        "hll_distinct": f"""
            WITH hll AS ({SK.hll_oracle_sql(
                "SELECT event_type, 'https://h' || CAST(user_id % 50 AS VARCHAR)"
                " || '.example/e' || CAST(event_id AS VARCHAR) AS url FROM events",
                ["event_type"], "url", p=8)}),
            x AS (
                SELECT event_type,
                       CAST(count(DISTINCT 'https://h' || CAST(user_id % 50 AS VARCHAR)
                            || '.example/e' || CAST(event_id AS VARCHAR)) AS BIGINT)
                           AS n_exact
                FROM events GROUP BY event_type)
            SELECT hll.event_type, v_zero, s_scaled, est, n_exact,
                   round((est - n_exact) / n_exact, 6) AS rel_err
            FROM hll JOIN x USING (event_type)
        """,
        "boilerplate": """
            WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                       FROM documents),
            p AS (
                SELECT doc_id, source,
                       list_transform(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT)),
                                      i -> array_to_string(ws[i*3+1 : i*3+3], ' ')) AS paras
                FROM w),
            ex0 AS (
                SELECT doc_id, source,
                       CAST(unnest(range(0, len(paras))) AS INT) AS pos,
                       unnest(paras) AS para
                FROM p),
            ex AS (SELECT * FROM ex0 WHERE len(trim(para)) > 0),
            dfq AS (
                SELECT source, para,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
                FROM ex GROUP BY source, para),
            m AS (
                SELECT ex.*, (df_docs >= 3) AS boiler
                FROM ex JOIN dfq USING (source, para))
            SELECT doc_id, source,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
                   coalesce(string_agg(CASE WHEN NOT boiler THEN para END,
                                       chr(10) ORDER BY pos), '') AS clean_text
            FROM m GROUP BY doc_id, source
        """,
        "bigram_surprisal": f"""
            WITH base AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
            tokp AS (
                SELECT doc_id, lang, CAST(doc_id % 16 AS BIGINT) AS shard,
                       i AS pos, toks[i] AS term
                FROM base, unnest(range(1, len(toks) + 1)) AS t(i)),
            big AS (
                SELECT doc_id, lang, shard,
                       lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
                       term
                FROM tokp QUALIFY prev IS NOT NULL),
            tf AS (
                SELECT doc_id, lang, shard, prev, term,
                       CAST(count(*) AS BIGINT) AS tf
                FROM big GROUP BY ALL),
            c2 AS (
                SELECT prev, term, CAST(sum(tf) AS BIGINT) AS c2
                FROM tf GROUP BY prev, term),
            c1 AS (
                SELECT prev, CAST(sum(c2) AS BIGINT) AS c1
                FROM c2 GROUP BY prev),
            per_doc AS (
                SELECT doc_id, lang, shard,
                       CAST(sum(tf) AS BIGINT) AS n_bigrams,
                       CAST(sum(tf * (length(bin(c1)) - length(bin(c2))))
                            AS BIGINT) AS sum_bits
                FROM tf JOIN c2 USING (prev, term) JOIN c1 USING (prev)
                GROUP BY doc_id, lang, shard)
            SELECT doc_id, lang, shard, n_bigrams, sum_bits,
                   sum_bits / n_bigrams AS mean_bits,
                   CAST(ntile(3) OVER (
                       PARTITION BY lang, shard
                       ORDER BY sum_bits / n_bigrams DESC, doc_id ASC
                   ) AS BIGINT) AS bucket
            FROM per_doc
        """,
        "soft404": """
            WITH aug AS (
                SELECT doc_id, source,
                       CASE WHEN doc_id % 11 = 5
                            THEN 'error 404 page not found on ' || source || ' server'
                            WHEN doc_id % 11 = 7
                            THEN 'page not found ' ||
                                 array_to_string(string_split(text, ' ')[1:8], ' ')
                            ELSE text END AS text
                FROM documents),
            tpl AS (
                SELECT DISTINCT source,
                       list_distinct(list_filter(string_split_regex(
                           lower('error 404 page not found on ' || source || ' server'),
                           '\\s+'), x -> len(x) >= 1)) AS tpl_toks
                FROM documents),
            t AS (
                SELECT doc_id, a.source,
                       list_distinct(list_filter(string_split_regex(
                           lower(coalesce(a.text, '')), '\\s+'),
                           x -> len(x) >= 1)) AS toks,
                       tpl_toks
                FROM aug a JOIN tpl USING (source)),
            m AS (
                SELECT doc_id, source,
                       CAST(len(toks) AS BIGINT) AS n_doc_tokens,
                       CAST(len(tpl_toks) AS BIGINT) AS n_tpl_tokens,
                       CAST(len(list_intersect(toks, tpl_toks)) AS BIGINT) AS n_common
                FROM t)
            SELECT doc_id, source, n_doc_tokens, n_tpl_tokens, n_common,
                   n_common / (n_doc_tokens + n_tpl_tokens - n_common) AS jacc,
                   (n_common / (n_doc_tokens + n_tpl_tokens - n_common) >= 0.5)
                       AS is_soft404
            FROM m
        """,
        "cms_counts": """
            WITH s AS (SELECT event_type, CAST(user_id AS VARCHAR) AS u
                       FROM events),
            h AS (SELECT event_type, u,
                         CAST('0x' || substr(md5(u), 1, 15) AS BIGINT) AS h
                  FROM s),
            fan AS (
                SELECT event_type, u, CAST(j AS BIGINT) AS j,
                       CAST((h >> (j * 8)) % 256 AS BIGINT) AS col
                FROM h, unnest([0, 1, 2, 3]) AS t(j)),
            cells AS (
                SELECT event_type, j AS row, col,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM fan GROUP BY event_type, j, col),
            probe AS (SELECT DISTINCT event_type, u, j, col FROM fan),
            est AS (
                SELECT p.event_type, p.u AS key,
                       CAST(min(c.cnt) AS BIGINT) AS est
                FROM probe p
                JOIN cells c ON c.event_type = p.event_type
                            AND c.row = p.j AND c.col = p.col
                GROUP BY p.event_type, p.u),
            x AS (SELECT event_type, u AS key,
                         CAST(count(*) AS BIGINT) AS n_exact
                  FROM s GROUP BY event_type, u)
            SELECT event_type, key, est, n_exact,
                   CAST(est - n_exact AS BIGINT) AS overcount
            FROM est JOIN x USING (event_type, key)
        """,
        "sessionize": """
            WITH m AS (
                SELECT user_id, ts, epoch_us(ts) AS us,
                       CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                            WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                 > 21600000000 THEN 1
                            ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC)),
            s AS (
                SELECT user_id, ts, us,
                       CAST(sum(ns) OVER (PARTITION BY user_id
                                          ORDER BY us ASC) AS BIGINT)
                           AS session_idx
                FROM m)
            SELECT user_id, session_idx,
                   min(ts) AS session_start,
                   max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   (max(us) - min(us)) / CAST(1000000 AS DOUBLE) AS duration_s
            FROM s GROUP BY user_id, session_idx
        """,
        "quantiles": """
            WITH c AS (
                SELECT event_type, value, CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY event_type, value),
            cum AS (
                SELECT event_type, value,
                       CAST(sum(c) OVER (PARTITION BY event_type
                                         ORDER BY value ASC) AS BIGINT) AS cum,
                       CAST(sum(c) OVER (PARTITION BY event_type)
                            AS BIGINT) AS n
                FROM c),
            fan AS (
                SELECT event_type, value, cum, n, CAST(p AS BIGINT) AS pct,
                       CAST((n * p + 99) // 100 AS BIGINT) AS rank
                FROM cum, unnest([50, 90, 99]) AS t(p))
            SELECT event_type, pct, n, rank, min(value) AS q_value
            FROM fan WHERE cum >= rank
            GROUP BY event_type, pct, n, rank
        """,
        "zorder": f"""
            SELECT event_id,
                   CAST(user_id % 256 AS BIGINT) AS d1,
                   CAST(event_id % 256 AS BIGINT) AS d2,
                   {zorder_oracle_expr(['user_id % 256', 'event_id % 256'], 8)} AS zkey
            FROM events
        """,
        "adaptive_delay": """
            WITH log AS (
                SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS host,
                       CAST(floor(value * 10) + (user_id % 20) * 80
                            AS BIGINT) AS latency_ms
                FROM events),
            c AS (SELECT host, latency_ms, CAST(count(*) AS BIGINT) AS c
                  FROM log GROUP BY host, latency_ms),
            cum AS (
                SELECT host, latency_ms,
                       CAST(sum(c) OVER (PARTITION BY host
                                         ORDER BY latency_ms ASC)
                            AS BIGINT) AS cum,
                       CAST(sum(c) OVER (PARTITION BY host) AS BIGINT) AS n
                FROM c),
            q AS (
                SELECT host, n, min(latency_ms) AS p95_ms
                FROM (SELECT *, CAST((n * 95 + 99) // 100 AS BIGINT) AS rank
                      FROM cum)
                WHERE cum >= rank GROUP BY host, n),
            d AS (
                SELECT DISTINCT 'h' || CAST(user_id % 20 AS VARCHAR) AS host,
                       CAST(1 + (user_id % 20) % 4 AS BIGINT) AS delay_s
                FROM events)
            SELECT q.host, n AS n_fetches, p95_ms, delay_s,
                   CAST(CASE WHEN p95_ms > 2000
                             THEN least(64, delay_s * 2)
                             ELSE greatest(1, delay_s // 2)
                        END AS BIGINT) AS next_delay_s
            FROM q JOIN d ON d.host = q.host
        """,
        "bfs_depth": _bfs_oracle_sql(mod=100, max_depth=6),
        "harmonic": _harmonic_oracle_sql(mod=60, max_depth=6),
        "hyperball": _hyperball_oracle_sql(p=6, rounds=4, mod=100),
        "semantic_dedup": """
            WITH planted AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
              FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id,
                     CAST(embedding AS DOUBLE[]) AS embedding
              FROM embeddings WHERE vec_id < 20),
            dup AS (
              SELECT DISTINCT b.vec_id AS id
              FROM planted a JOIN planted b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99)
            SELECT p.vec_id AS id, (d.id IS NULL) AS keep
            FROM planted p LEFT JOIN dup d ON d.id = p.vec_id
        """,
        "collocations": f"""
            WITH t AS (SELECT {_TOKS} AS t FROM documents),
            uni AS (SELECT unnest(t) AS w FROM t),
            uc AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM uni GROUP BY w),
            pairs AS (
              SELECT unnest(list_transform(range(1, len(t)),
                            i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
              FROM t),
            pc AS (SELECT (p).w1 AS w1, (p).w2 AS w2,
                          CAST(count(*) AS BIGINT) AS n_pair
                   FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5),
            tot AS (SELECT (SELECT CAST(sum(n_w) AS BIGINT) FROM uc) AS n_total,
                           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS m_total)
            SELECT w1, w2, n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
                   CAST(n_pair * n_total * n_total AS DOUBLE)
                     / CAST(m_total * u1.n_w * u2.n_w AS DOUBLE) AS lift,
                   round(log2(CAST(n_pair * n_total * n_total AS DOUBLE)
                     / CAST(m_total * u1.n_w * u2.n_w AS DOUBLE)), 6) AS pmi
            FROM pc JOIN uc u1 ON u1.w = pc.w1 JOIN uc u2 ON u2.w = pc.w2, tot
        """,
        "margin_mine": """
            WITH x AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 200),
            y AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                  FROM embeddings WHERE vec_id % 2 = 1),
            s AS (SELECT x.query_id, y.vec_id,
                         list_cosine_similarity(ev, qv) AS cosine,
                         CAST(floor(list_cosine_similarity(ev, qv) * 1000000.0)
                              AS BIGINT) AS c6
                  FROM y, x),
            r AS (SELECT *,
                         row_number() OVER (PARTITION BY query_id
                             ORDER BY cosine DESC, vec_id ASC) AS rank_x,
                         row_number() OVER (PARTITION BY vec_id
                             ORDER BY cosine DESC, query_id ASC) AS rank_y
                  FROM s),
            ax AS (SELECT query_id, CAST(sum(c6) AS BIGINT) AS ax_sum,
                          CAST(count(*) AS BIGINT) AS cx
                   FROM r WHERE rank_x <= 4 GROUP BY query_id),
            ay AS (SELECT vec_id, CAST(sum(c6) AS BIGINT) AS ay_sum,
                          CAST(count(*) AS BIGINT) AS cy
                   FROM r WHERE rank_y <= 4 GROUP BY vec_id),
            m AS (SELECT r.query_id, r.vec_id, r.cosine,
                         CASE WHEN c6 >= 0 AND ax_sum * cy + ay_sum * cx > 0
                              THEN CAST((2000000 * c6 * cx * cy)
                                        // (ax_sum * cy + ay_sum * cx)
                                        AS BIGINT) END AS margin_ppm
                  FROM r JOIN ax USING (query_id) JOIN ay USING (vec_id)
                  WHERE rank_x = 1)
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, margin_ppm,
                   margin_ppm >= 1020000 AS mined
            FROM m
        """,
        "setsim_join": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE list_transform(range(1, len(t)-1),
                                         i -> array_to_string(t[i:i+2], ' ')) END
              )) AS sh
              FROM toks),
            n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
            i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(count(*) AS BIGINT) AS inter
                  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
            SELECT id_a, id_b, na.n AS n_a, nb.n AS n_b, inter,
                   CAST(inter AS DOUBLE)
                     / CAST(na.n + nb.n - inter AS DOUBLE) AS jaccard
            FROM i JOIN n na ON na.doc_id = i.id_a JOIN n nb ON nb.doc_id = i.id_b
            WHERE 2 * inter >= 1 * (na.n + nb.n - inter)
        """,
        "lpa": _lpa_oracle_sql(rounds=3),
        "phrase_search": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            m AS (SELECT doc_id,
                         CAST(len(list_filter(range(1, len(t) - 1),
                              i -> t[i] = 'big' AND t[i+1] = 'order'
                                   AND t[i+2] = 'scan')) AS BIGINT)
                           AS n_occurrences
                  FROM t)
            SELECT doc_id, n_occurrences FROM m WHERE n_occurrences > 0
        """,
        "kcore": _kcore_oracle_sql(rounds=4),
        "triangles": """
            WITH e0 AS (SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS a,
                               CASE WHEN event_id % 11 <> 0
                                    THEN 'h' || CAST(event_id % 23 AS VARCHAR) END AS b
                        FROM events),
            ed AS (SELECT DISTINCT a, b FROM e0 WHERE b IS NOT NULL AND a <> b),
            und AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
            deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
                    FROM und GROUP BY a),
            tri AS (SELECT x.a AS v1, x.b AS v2, y.b AS v3
                    FROM und x JOIN und y ON y.a = x.b
                    JOIN und z ON z.a = x.a AND z.b = y.b
                    WHERE x.a < x.b AND x.b < y.b),
            per AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
                    FROM (SELECT v1 AS node FROM tri
                          UNION ALL SELECT v2 FROM tri
                          UNION ALL SELECT v3 FROM tri)
                    GROUP BY node)
            SELECT d.node, d.degree,
                   coalesce(p.n_triangles, 0) AS n_triangles,
                   CASE WHEN d.degree >= 2
                        THEN CAST(2 * coalesce(p.n_triangles, 0) AS DOUBLE)
                             / CAST(d.degree * (d.degree - 1) AS DOUBLE)
                        END AS clustering
            FROM deg d LEFT JOIN per p ON p.node = d.node
        """,
        "bowtie": """
            WITH RECURSIVE
            e0 AS (SELECT 'n' || CAST(o_custkey % 120 AS VARCHAR) AS a,
                          'n' || CAST((o_orderkey // 91) % 120 AS VARCHAR) AS b
                   FROM orders WHERE o_orderkey % 91 = 0
                   UNION ALL
                   SELECT 'x' || CAST(event_id % 13 AS VARCHAR),
                          'n' || CAST(user_id % 120 AS VARCHAR)
                   FROM events WHERE event_id % 151 = 0
                   UNION ALL
                   SELECT 'n' || CAST(user_id % 120 AS VARCHAR),
                          'y' || CAST(event_id % 17 AS VARCHAR)
                   FROM events WHERE event_id % 173 = 0),
            e AS (SELECT DISTINCT a, b FROM e0 WHERE a <> b),
            nds AS (SELECT a AS n FROM e UNION SELECT b FROM e),
            reach(a, b) AS (
                SELECT a, b FROM e
                UNION
                SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b),
            mutual AS (SELECT r1.a AS v, r1.b AS u
                       FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a),
            scc AS (SELECT n.n AS node, least(n.n, coalesce(min(m.u), n.n)) AS scc_id
                    FROM nds n LEFT JOIN mutual m ON m.v = n.n GROUP BY n.n),
            core_id AS (SELECT scc_id FROM (SELECT scc_id, count(*) AS c
                                            FROM scc GROUP BY scc_id)
                        ORDER BY c DESC, scc_id LIMIT 1),
            core AS (SELECT node FROM scc WHERE scc_id = (SELECT scc_id FROM core_id)),
            inn AS (SELECT DISTINCT r.a AS node FROM reach r
                    WHERE r.b IN (SELECT node FROM core)
                      AND r.a NOT IN (SELECT node FROM core)),
            outt AS (SELECT DISTINCT r.b AS node FROM reach r
                     WHERE r.a IN (SELECT node FROM core)
                       AND r.b NOT IN (SELECT node FROM core)),
            infwd AS (SELECT DISTINCT r.b AS node FROM reach r
                      WHERE r.a IN (SELECT node FROM inn)),
            outbwd AS (SELECT DISTINCT r.a AS node FROM reach r
                       WHERE r.b IN (SELECT node FROM outt))
            SELECT s.node, s.scc_id,
                   CASE WHEN s.node IN (SELECT node FROM core) THEN 'CORE'
                        WHEN s.node IN (SELECT node FROM inn) THEN 'IN'
                        WHEN s.node IN (SELECT node FROM outt) THEN 'OUT'
                        WHEN s.node IN (SELECT node FROM infwd)
                             AND s.node IN (SELECT node FROM outbwd) THEN 'TUBE'
                        WHEN s.node IN (SELECT node FROM infwd)
                             OR s.node IN (SELECT node FROM outbwd) THEN 'TENDRIL'
                        ELSE 'DISC' END AS region
            FROM scc s
        """,
        "cocitation": """
            WITH e0 AS (SELECT DISTINCT
                            'u' || CAST(event_id % 400 AS VARCHAR) AS p,
                            'd' || CAST(user_id % 40 AS VARCHAR) AS l
                        FROM events),
            ok AS (SELECT p FROM e0 GROUP BY p HAVING count(*) <= 64),
            pv AS (SELECT e0.p, e0.l FROM e0 JOIN ok USING (p)),
            deg AS (SELECT l, CAST(count(*) AS BIGINT) AS d FROM pv GROUP BY l),
            pairs AS (SELECT x.l AS a, y.l AS b, CAST(count(*) AS BIGINT) AS n_common
                      FROM pv x JOIN pv y ON y.p = x.p AND x.l < y.l
                      GROUP BY x.l, y.l HAVING count(*) >= 3)
            SELECT p.a, p.b, p.n_common,
                   CAST(p.n_common AS DOUBLE)
                       / CAST(da.d + db.d - p.n_common AS DOUBLE) AS jaccard
            FROM pairs p JOIN deg da ON da.l = p.a JOIN deg db ON db.l = p.b
        """,
        "fuzzy_join": """
            WITH l AS (SELECT 'p' || CAST(p_partkey AS VARCHAR) AS id, p_name AS val
                       FROM part WHERE p_partkey % 7 = 0),
            r AS (SELECT 'q' || CAST(p_partkey AS VARCHAR) AS id,
                         substring(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
                         || substring(p_name,
                                      CAST(p_partkey % length(p_name) AS INT) + 2, 300)
                             AS val
                  FROM part WHERE p_partkey % 3 = 0)
            SELECT l.id AS l_id, r.id AS r_id, l.val AS l_val, r.val AS r_val,
                   CAST(levenshtein(l.val, r.val) AS BIGINT) AS dist
            FROM l, r
            WHERE abs(length(l.val) - length(r.val)) <= 2
              AND levenshtein(l.val, r.val) <= 2
        """,
        "kn_score": f"""
            WITH base AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
            tokp AS (SELECT doc_id, lang, i AS pos, toks[i] AS term
                     FROM base, unnest(range(1, len(toks) + 1)) AS t(i)),
            big AS (SELECT doc_id, lang,
                           lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
                           term
                    FROM tokp QUALIFY prev IS NOT NULL),
            tf AS (SELECT doc_id, lang, prev, term, CAST(count(*) AS BIGINT) AS tf
                   FROM big GROUP BY ALL),
            c2 AS (SELECT prev, term, CAST(sum(tf) AS BIGINT) AS c2
                   FROM tf GROUP BY prev, term),
            ctx AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1,
                           CAST(count(*) AS BIGINT) AS n1v
                    FROM c2 GROUP BY prev),
            cont AS (SELECT term, CAST(count(*) AS BIGINT) AS n1w
                     FROM c2 GROUP BY term),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n1tot FROM c2),
            model AS (
                SELECT prev, term,
                       CAST(floor(-log2(
                           (c2 - CAST(0.75 AS DOUBLE)) / c1
                           + (CAST(0.75 AS DOUBLE) * n1v * n1w) / (c1 * n1tot)
                       ) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS microbits
                FROM c2 JOIN ctx USING (prev) JOIN cont USING (term) CROSS JOIN tot),
            per_doc AS (
                SELECT doc_id, lang,
                       CAST(sum(tf) AS BIGINT) AS n_bigrams,
                       CAST(sum(tf * microbits) AS BIGINT) AS sum_microbits
                FROM tf JOIN model USING (prev, term)
                GROUP BY doc_id, lang)
            SELECT doc_id, lang, n_bigrams, sum_microbits,
                   CAST(sum_microbits AS DOUBLE)
                       / CAST(n_bigrams * 1000000 AS DOUBLE) AS mean_bits
            FROM per_doc
        """,
        "price_index": """
            WITH rows_ AS (
                SELECT p.p_type AS category,
                       strftime(l.l_shipdate, '%Y-%m') AS period,
                       l.l_partkey AS item,
                       CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS spend_cents,
                       CAST(l.l_quantity AS BIGINT) AS qty
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
            cells AS (
                SELECT category, item, period,
                       CAST(sum(spend_cents) AS BIGINT) AS v,
                       CAST(sum(qty) AS BIGINT) AS q
                FROM rows_ GROUP BY ALL),
            basep AS (SELECT category, min(period) AS period FROM cells GROUP BY category),
            base AS (SELECT c.category, c.item, c.v AS v0, c.q AS q0
                     FROM cells c JOIN basep USING (category, period)),
            agg AS (
                SELECT c.category, c.period,
                       CAST(count(*) AS BIGINT) AS n_matched,
                       CAST(sum(c.v) AS BIGINT) AS vt,
                       CAST(sum(c.q) AS BIGINT) AS qt,
                       CAST(sum(b.v0) AS BIGINT) AS v0,
                       CAST(sum(b.q0) AS BIGINT) AS q0
                FROM cells c JOIN base b USING (category, item)
                GROUP BY c.category, c.period)
            SELECT category, period, n_matched,
                   CASE WHEN qt > 0 AND v0 > 0
                        THEN CAST(100.0 AS DOUBLE)
                             * (CAST(vt AS DOUBLE) * CAST(q0 AS DOUBLE))
                             / (CAST(qt AS DOUBLE) * CAST(v0 AS DOUBLE))
                        END AS index
            FROM agg
        """,
        "burst": """
            WITH cells AS (
                SELECT 'h' || CAST(user_id % 50 AS VARCHAR) AS host,
                       date_trunc('hour', ts) AS bucket_ts,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY ALL),
            m AS (SELECT host, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(c) AS BIGINT) AS s,
                         CAST(sum(c * c) AS BIGINT) AS t
                  FROM cells GROUP BY host)
            SELECT c.host, c.bucket_ts, c.c, m.n AS n_buckets,
                   CASE WHEN m.n * m.t - m.s * m.s > 0
                        THEN CAST(m.n * c.c - m.s AS DOUBLE)
                             / sqrt(CAST(m.n * m.t - m.s * m.s AS DOUBLE))
                        END AS zscore,
                   (m.n * c.c - m.s > 0
                    AND (m.n * c.c - m.s) * (m.n * c.c - m.s) * 1
                        > 4 * (m.n * m.t - m.s * m.s)) AS is_burst
            FROM cells c JOIN m USING (host)
        """,
        "salsa": _salsa_oracle_sql(5),
        "cdc_dedup": """
            WITH cps AS (
              SELECT doc_id, source, coalesce(text, '') AS t,
                     len(coalesce(text, '')) AS n,
                     CAST(list_transform(range(1, len(coalesce(text, '')) + 1),
                                         i -> unicode(coalesce(text, '')[i]))
                          AS BIGINT[]) AS cp
              FROM documents),
            cuts AS (
              SELECT doc_id, source, t, n,
                     list_filter(range(2, greatest(n - 6, 2)),
                                 i -> list_reduce(cp[i:i+7],
                                      (acc, c) -> (acc * 257 + c) % 2147483647)
                                      % 64 = 0) AS cut
              FROM cps),
            bounds AS (
              SELECT doc_id, source, t,
                     list_concat(list_concat([1], cut), [n + 1]) AS b
              FROM cuts),
            chunks AS (
              SELECT doc_id, source,
                     unnest(list_transform(range(1, len(b)),
                            ti -> t[b[ti]:b[ti+1] - 1])) AS chunk
              FROM bounds),
            uniq AS (
              SELECT source, md5(chunk) AS h,
                     CAST(count(*) AS BIGINT) AS copies,
                     CAST(min(len(chunk)) AS BIGINT) AS clen
              FROM chunks GROUP BY source, md5(chunk))
            SELECT source,
                   CAST(sum(copies) AS BIGINT) AS n_chunks,
                   CAST(count(*) AS BIGINT) AS n_unique,
                   CAST(sum(copies * clen) AS BIGINT) AS chars_total,
                   CAST(sum(clen) AS BIGINT) AS chars_unique,
                   CAST(sum(clen) AS DOUBLE) / CAST(sum(copies * clen) AS DOUBLE)
                       AS dedup_ratio
            FROM uniq GROUP BY source
        """,
        "gap_bits": """
            WITH adj AS (
              SELECT 'h' || CAST(user_id % 100 AS VARCHAR) AS src,
                     list_sort(list(DISTINCT CAST(event_id % 1000 AS BIGINT))) AS a
              FROM events GROUP BY 1),
            g AS (
              SELECT src, a,
                     list_transform(range(1, len(a) + 1),
                         i -> a[i] - CASE WHEN i > 1 THEN a[i-1]
                                          ELSE CAST(-1 AS BIGINT) END) AS gaps
              FROM adj)
            SELECT src,
                   CAST(len(a) AS BIGINT) AS outdeg,
                   CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(gaps, x -> CAST(2 * length(bin(x)) - 1 AS BIGINT))),
                        (acc, v) -> acc + v) AS BIGINT) AS gamma_bits,
                   CAST(len(a) * 64 AS BIGINT) AS raw_bits,
                   CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(gaps, x -> CAST(2 * length(bin(x)) - 1 AS BIGINT))),
                        (acc, v) -> acc + v) AS DOUBLE)
                       / CAST(len(a) * 64 AS DOUBLE) AS ratio
            FROM g
        """,
        "assortativity": """
            WITH e AS (SELECT 'h' || CAST(user_id % 60 AS VARCHAR) AS s,
                              'h' || CAST(event_id % 97 AS VARCHAR) AS d
                       FROM events),
            od AS (SELECT s, CAST(count(*) AS BIGINT) AS x FROM e GROUP BY s),
            id_ AS (SELECT d, CAST(count(*) AS BIGINT) AS y FROM e GROUP BY d),
            m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum(x * y) AS BIGINT) AS sxy,
                         CAST(sum(x * x) AS BIGINT) AS sxx,
                         CAST(sum(y * y) AS BIGINT) AS syy
                  FROM e JOIN od USING (s) JOIN id_ USING (d))
            SELECT n, sx, sy, sxy, sxx, syy,
                   CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                        THEN CAST(n * sxy - sx * sy AS DOUBLE)
                             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                    * CAST(n * syy - sy * sy AS DOUBLE))
                        END AS r
            FROM m
        """,
        "ndcg": """
            WITH prs(query_id, term, relterm) AS (
                VALUES ('q_spark', 'spark', 'data'),
                       ('q_table', 'table', 'query'),
                       ('q_scan', 'scan', 'row')),
            tf AS (
                SELECT p.query_id, d.doc_id,
                       len(list_filter(string_split_regex(lower(d.text), '\\s+'),
                                       x -> x = p.term)) AS tf,
                       least(3, len(list_filter(
                           string_split_regex(lower(d.text), '\\s+'),
                           x -> x = p.relterm))) AS rel
                FROM documents d CROSS JOIN prs p),
            ranked AS (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY tf DESC, doc_id ASC) AS rank
                FROM tf WHERE tf > 0 QUALIFY rank <= 10),
            qrels AS (SELECT query_id, doc_id, rel FROM tf WHERE rel > 0),
            got AS (
                SELECT r.query_id,
                       CAST(sum(CASE WHEN coalesce(q.rel, 0) > 0
                                THEN CAST(floor(CAST(((1 << q.rel) - 1)
                                     * 1000000000 AS DOUBLE)
                                     / log2(r.rank + 1)) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS dcg_micro,
                       CAST(count(*) AS BIGINT) AS n_ranked,
                       CAST(sum(CASE WHEN coalesce(q.rel, 0) > 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_relevant_found
                FROM ranked r LEFT JOIN qrels q USING (query_id, doc_id)
                GROUP BY r.query_id),
            ideal AS (
                SELECT query_id,
                       CAST(sum(CAST(floor(CAST(((1 << rel) - 1)
                            * 1000000000 AS DOUBLE) / log2(irank + 1))
                            AS BIGINT)) AS BIGINT) AS idcg_micro,
                       CAST(count(*) AS BIGINT) AS n_judged_pos
                FROM (SELECT query_id, rel,
                             row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, doc_id ASC) AS irank
                      FROM qrels) WHERE irank <= 10 GROUP BY query_id)
            SELECT g.query_id, g.n_ranked, g.n_relevant_found, g.dcg_micro,
                   coalesce(i.idcg_micro, 0) AS idcg_micro,
                   CASE WHEN coalesce(i.idcg_micro, 0) > 0
                        THEN CAST(g.dcg_micro AS DOUBLE)
                             / CAST(i.idcg_micro AS DOUBLE) END AS ndcg
            FROM got g LEFT JOIN ideal i USING (query_id)
        """,
        "script_census": """
            WITH aug AS (
                SELECT doc_id,
                       text || CASE WHEN doc_id % 7 = 1 THEN ' Привет мир'
                                    WHEN doc_id % 7 = 2 THEN ' 日本語テキスト'
                                    WHEN doc_id % 7 = 3 THEN ' مرحبا بالعالم'
                                    WHEN doc_id % 7 = 4 THEN ' αβγδε'
                                    ELSE '' END AS t
                FROM documents),
            cp AS (
                SELECT doc_id, len(t) AS n_chars,
                       list_transform(range(1, len(t) + 1), i -> unicode(t[i])) AS c
                FROM aug),
            b AS (
                SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                       CAST(len(list_filter(c, x -> x >= 65 AND x <= 591)) AS BIGINT) AS n_latin,
                       CAST(len(list_filter(c, x -> x >= 1024 AND x <= 1279)) AS BIGINT) AS n_cyrillic,
                       CAST(len(list_filter(c, x -> (x >= 12352 AND x <= 12543)
                                OR (x >= 13312 AND x <= 40959))) AS BIGINT) AS n_cjk,
                       CAST(len(list_filter(c, x -> x >= 1536 AND x <= 1791)) AS BIGINT) AS n_arabic,
                       CAST(len(list_filter(c, x -> x >= 880 AND x <= 1023)) AS BIGINT) AS n_greek,
                       CAST(len(list_filter(c, x -> x >= 48 AND x <= 57)) AS BIGINT) AS n_digit,
                       CAST(len(list_filter(c, x -> x = 32 OR x = 9 OR x = 10 OR x = 13)) AS BIGINT) AS n_space
                FROM cp)
            SELECT doc_id, n_chars, n_latin, n_cyrillic, n_cjk, n_arabic, n_greek,
                   n_digit, n_space,
                   CAST(n_chars - n_latin - n_cyrillic - n_cjk - n_arabic - n_greek
                        - n_digit - n_space AS BIGINT) AS n_other,
                   CASE WHEN greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_greek) = 0
                             THEN 'none'
                        WHEN n_latin = greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_greek)
                             THEN 'latin'
                        WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_greek)
                             THEN 'cyrillic'
                        WHEN n_cjk = greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_greek)
                             THEN 'cjk'
                        WHEN n_arabic = greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_greek)
                             THEN 'arabic'
                        ELSE 'greek' END AS main_script
            FROM b
        """,
        "asof_join": """
            WITH probe AS (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'click'),
            st0 AS (
                SELECT user_id, ts, value AS purchase_value,
                       row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'),
            st AS (SELECT user_id, ts, purchase_value FROM st0 WHERE rn = 1)
            SELECT p.user_id, p.ts, p.event_id, p.value,
                   s.ts AS purchase_ts, s.purchase_value
            FROM probe p ASOF LEFT JOIN st s
              ON p.user_id = s.user_id AND p.ts >= s.ts
        """,
        "range_join": """
            WITH iv AS (
                SELECT event_id AS interval_id, ts AS w_start,
                       ts + INTERVAL 10 MINUTES AS w_end
                FROM events
                WHERE event_type = 'error' AND event_id % 97 = 0)
            SELECT interval_id, e.event_id, e.ts, e.event_type
            FROM events e JOIN iv ON e.ts >= w_start AND e.ts < w_end
        """,
        "weighted_sample": """
            WITH d AS (
                SELECT doc_id, lang, source, n_chars,
                       ((doc_id % 2147483648) * 2654435761) % 4294967296 AS h
                FROM documents WHERE n_chars > 0),
            k AS (
                SELECT doc_id, lang, source, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY ln((h + 0.5) / 4294967296.0)
                                    / CAST(n_chars AS DOUBLE) DESC,
                                    doc_id ASC) AS rn
                FROM d)
            SELECT doc_id, lang, source, n_chars FROM k WHERE rn <= 5
        """,
        "kmv_overlap": """
            WITH src AS (
                SELECT DISTINCT 'h' || CAST(event_id % 20 AS VARCHAR) AS host,
                       't' || CAST((event_id * 7 + user_id) % 3000 AS VARCHAR) AS v
                FROM events),
            hs AS (
                SELECT DISTINCT host,
                       CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
                FROM src),
            rnk AS (
                SELECT host, h,
                       row_number() OVER (PARTITION BY host ORDER BY h) AS rn
                FROM hs),
            sk AS (SELECT host, h FROM rnk WHERE rn <= 64),
            card AS (
                SELECT host, CAST(count(*) AS BIGINT) AS n_sk, max(h) AS kth
                FROM sk GROUP BY host),
            est AS (
                SELECT host, n_sk,
                       CASE WHEN n_sk < 64 THEN CAST(n_sk AS DOUBLE)
                            ELSE 63.0 * 1152921504606846976.0 / kth END AS d_est
                FROM card),
            pairs AS (
                SELECT a.host AS ha, b.host AS hb
                FROM card a JOIN card b ON a.host < b.host),
            pu AS (
                SELECT p.ha, p.hb, s.h, CAST(count(*) AS BIGINT) AS cnt
                FROM pairs p JOIN sk s ON s.host = p.ha OR s.host = p.hb
                GROUP BY p.ha, p.hb, s.h),
            purn AS (
                SELECT ha, hb, h, cnt,
                       row_number() OVER (PARTITION BY ha, hb ORDER BY h) AS rn
                FROM pu),
            mg AS (SELECT ha, hb, h, cnt FROM purn WHERE rn <= 64),
            mstat AS (
                SELECT ha, hb, CAST(count(*) AS BIGINT) AS merged_n,
                       max(h) AS kth,
                       CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
                           AS shared_n
                FROM mg GROUP BY ha, hb),
            ovr AS (
                SELECT ha, hb, merged_n, shared_n,
                       CASE WHEN merged_n < 64 THEN CAST(merged_n AS DOUBLE)
                            ELSE 63.0 * 1152921504606846976.0 / kth END AS union_est,
                       CAST(shared_n AS DOUBLE) / CAST(merged_n AS DOUBLE) AS jacc
                FROM mstat),
            fullc AS (
                SELECT host, CAST(count(*) AS BIGINT) AS n FROM src GROUP BY host),
            ix AS (
                SELECT x.host AS ha, y.host AS hb,
                       CAST(count(*) AS BIGINT) AS inter_exact
                FROM src x JOIN src y ON x.v = y.v AND x.host < y.host
                GROUP BY x.host, y.host)
            SELECT o.ha AS host_a, o.hb AS host_b,
                   round(ea.d_est, 6) AS est_a,
                   round(eb.d_est, 6) AS est_b,
                   o.merged_n, o.shared_n,
                   round(o.union_est, 6) AS union_est,
                   round(o.jacc, 6) AS jacc_est,
                   round(o.jacc * o.union_est, 6) AS inter_est,
                   CAST(ca.n + cb.n - coalesce(ix.inter_exact, 0) AS BIGINT)
                       AS n_union_exact,
                   round(CAST(coalesce(ix.inter_exact, 0) AS DOUBLE)
                         / CAST(ca.n + cb.n - coalesce(ix.inter_exact, 0) AS DOUBLE),
                         6) AS jacc_exact
            FROM ovr o
            JOIN est ea ON ea.host = o.ha
            JOIN est eb ON eb.host = o.hb
            JOIN fullc ca ON ca.host = o.ha
            JOIN fullc cb ON cb.host = o.hb
            LEFT JOIN ix ON ix.ha = o.ha AND ix.hb = o.hb
        """,
        "url_templates": r"""
            WITH src AS (
                SELECT 'https://m' || CAST(user_id % 15 AS VARCHAR) || '.example'
                       || CASE CAST(event_id % 4 AS INT)
                            WHEN 0 THEN '/product/' || CAST(event_id AS VARCHAR)
                                 || '/rev/' || CAST(user_id % 5 AS VARCHAR)
                            WHEN 1 THEN '/obj/'
                                 || substr(md5(CAST(event_id AS VARCHAR)), 1, 12)
                                 || '/view'
                            WHEN 2 THEN '/list?page='
                                 || CAST(event_id % 50 AS VARCHAR) || '&sort=asc'
                            ELSE '/about/team' END AS url
                FROM events),
            f AS (
                SELECT url,
                       split_part(split_part(url, '://', 2), '/', 1) AS host,
                       regexp_replace(url,
                           '^[a-z][a-z0-9+.-]*://[^/]*', '') AS pathq
                FROM src),
            g AS (
                SELECT url, host,
                       split_part(pathq, '?', 1) AS path,
                       split_part(pathq, '?', 2) AS query
                FROM f),
            t AS (
                SELECT url, host,
                       regexp_replace(regexp_replace(path,
                           '[0-9a-f]{8,}', '{h}', 'g'), '[0-9]+', '{n}', 'g')
                           AS tpath,
                       coalesce(array_to_string(list_sort(list_filter(
                           list_transform(string_split(query, '&'),
                                          kv -> split_part(kv, '=', 1)),
                           s -> length(s) > 0)), ','), '') AS names
                FROM g)
            SELECT host,
                   CASE WHEN length(names) = 0 THEN tpath
                        ELSE tpath || '?' || names END AS template,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   min(url) AS example
            FROM t GROUP BY 1, 2
        """,
        "zipf_fit": f"""
            WITH base AS (
                SELECT lang, unnest({_TOKS}) AS term FROM documents),
            tf AS (
                SELECT lang, term, CAST(count(*) AS BIGINT) AS tf
                FROM base GROUP BY lang, term),
            rk AS (
                SELECT lang, tf,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY tf DESC, term ASC) AS rank
                FROM tf),
            xy AS (
                SELECT lang,
                       CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000.0) AS BIGINT)
                           AS ix,
                       CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000.0) AS BIGINT)
                           AS iy
                FROM rk WHERE rank <= 500),
            s AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
                       CAST(sum(ix) AS BIGINT) AS sx,
                       CAST(sum(iy) AS BIGINT) AS sy,
                       CAST(sum(ix * iy) AS BIGINT) AS sxy,
                       CAST(sum(ix * ix) AS BIGINT) AS sxx
                FROM xy GROUP BY lang HAVING count(*) >= 2)
            SELECT lang, n_terms,
                   round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                         / CAST(n_terms * sxx - sx * sx AS DOUBLE), 6) AS slope,
                   round((CAST(sy AS DOUBLE)
                          - (CAST(n_terms * sxy - sx * sy AS DOUBLE)
                             / CAST(n_terms * sxx - sx * sx AS DOUBLE))
                            * CAST(sx AS DOUBLE))
                         / (CAST(n_terms AS DOUBLE) * 1000.0), 6)
                       AS intercept_ln
            FROM s
        """,
        "compaction_plan": """
            WITH files AS (
                SELECT lang,
                       source || '-' || CAST(doc_id % 40 AS VARCHAR) AS file_id,
                       CAST(sum(n_chars) AS BIGINT) AS bytes
                FROM documents GROUP BY 1, 2),
            c AS (
                SELECT lang, file_id, bytes,
                       CAST(coalesce(sum(bytes) OVER (
                           PARTITION BY lang ORDER BY file_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS cum
                FROM files)
            SELECT lang, file_id, bytes,
                   CAST(cum // 20000 AS BIGINT) AS bin_idx,
                   CAST(cum % 20000 AS BIGINT) AS bin_offset
            FROM c
        """,
        "recall_mrr": """
            WITH prs(query_id, term, relterm) AS (
                VALUES ('q_spark', 'spark', 'data'),
                       ('q_table', 'table', 'query'),
                       ('q_scan', 'scan', 'row')),
            tf AS (
                SELECT p.query_id, d.doc_id,
                       len(list_filter(string_split_regex(lower(d.text), '\\s+'),
                                       x -> x = p.term)) AS tf,
                       least(3, len(list_filter(
                           string_split_regex(lower(d.text), '\\s+'),
                           x -> x = p.relterm))) AS rel
                FROM documents d CROSS JOIN prs p),
            ranked AS (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY tf DESC, doc_id ASC) AS rank
                FROM tf WHERE tf > 0 QUALIFY rank <= 10),
            qrels AS (SELECT query_id, doc_id, rel FROM tf WHERE rel > 0),
            got AS (
                SELECT r.query_id,
                       CAST(count(*) AS BIGINT) AS n_ranked,
                       CAST(sum(CASE WHEN coalesce(q.rel, 0) > 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_relevant_found,
                       CAST(min(CASE WHEN coalesce(q.rel, 0) > 0 THEN r.rank END)
                            AS BIGINT) AS first_rel_rank
                FROM ranked r LEFT JOIN qrels q USING (query_id, doc_id)
                GROUP BY r.query_id),
            pos AS (
                SELECT query_id, CAST(count(*) AS BIGINT) AS n_judged_pos
                FROM qrels GROUP BY query_id)
            SELECT g.query_id, g.n_ranked, g.n_relevant_found,
                   coalesce(p.n_judged_pos, 0) AS n_judged_pos,
                   g.first_rel_rank,
                   CASE WHEN coalesce(p.n_judged_pos, 0) > 0
                        THEN CAST(g.n_relevant_found AS DOUBLE)
                             / CAST(p.n_judged_pos AS DOUBLE) END AS recall_at_k,
                   CASE WHEN coalesce(p.n_judged_pos, 0) = 0 THEN NULL
                        WHEN g.first_rel_rank IS NOT NULL
                        THEN 1.0 / CAST(g.first_rel_rank AS DOUBLE)
                        ELSE 0.0 END AS rr
            FROM got g LEFT JOIN pos p USING (query_id)
        """,
        "heaps_fit": f"""
            WITH tok AS (
                SELECT lang, doc_id % 8 AS b, unnest({_TOKS}) AS term
                FROM documents),
            fs AS (
                SELECT lang, term, min(b) AS min_b
                FROM tok GROUP BY lang, term),
            vb AS (
                SELECT lang, min_b, CAST(count(*) AS BIGINT) AS nv
                FROM fs GROUP BY lang, min_b),
            nb AS (
                SELECT lang, b, CAST(count(*) AS BIGINT) AS nt
                FROM tok GROUP BY lang, b),
            ms(m) AS (VALUES (1), (2), (4), (8)),
            pts AS (
                SELECT v.lang, m.m, v.v, n.n
                FROM ms m
                JOIN (SELECT lang, m, CAST(sum(nv) AS BIGINT) AS v
                      FROM vb JOIN ms ON min_b < m GROUP BY lang, m) v
                  ON v.m = m.m
                JOIN (SELECT lang, m, CAST(sum(nt) AS BIGINT) AS n
                      FROM nb JOIN ms ON b < m GROUP BY lang, m) n
                  ON n.lang = v.lang AND n.m = m.m),
            xy AS (
                SELECT lang,
                       CAST(floor(ln(CAST(n AS DOUBLE)) * 1000.0) AS BIGINT) AS ix,
                       CAST(floor(ln(CAST(v AS DOUBLE)) * 1000.0) AS BIGINT) AS iy
                FROM pts WHERE v > 0 AND n > 0),
            s AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n_points,
                       CAST(sum(ix) AS BIGINT) AS sx,
                       CAST(sum(iy) AS BIGINT) AS sy,
                       CAST(sum(ix * iy) AS BIGINT) AS sxy,
                       CAST(sum(ix * ix) AS BIGINT) AS sxx
                FROM xy GROUP BY lang
                HAVING count(*) >= 2
                   AND count(*) * sum(ix * ix) - sum(ix) * sum(ix) > 0)
            SELECT lang, n_points,
                   round(CAST(n_points * sxy - sx * sy AS DOUBLE)
                         / CAST(n_points * sxx - sx * sx AS DOUBLE), 6) AS beta,
                   round((CAST(sy AS DOUBLE)
                          - (CAST(n_points * sxy - sx * sy AS DOUBLE)
                             / CAST(n_points * sxx - sx * sx AS DOUBLE))
                            * CAST(sx AS DOUBLE))
                         / (CAST(n_points AS DOUBLE) * 1000.0), 6) AS k_ln
            FROM s
        """,
        "funnel": """
            WITH t1 AS (
                SELECT user_id, min(ts) AS t_1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (
                SELECT e.user_id, min(e.ts) AS t_2
                FROM events e JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'click' AND e.ts >= t1.t_1
                GROUP BY e.user_id),
            t3 AS (
                SELECT e.user_id, min(e.ts) AS t_3
                FROM events e JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= t2.t_2
                GROUP BY e.user_id)
            SELECT t1.user_id, t1.t_1, t2.t_2, t3.t_3
            FROM t1
            LEFT JOIN t2 ON t1.user_id = t2.user_id
            LEFT JOIN t3 ON t1.user_id = t3.user_id
        """,
        "trimmed_mean": """
            WITH r AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS v,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars ASC, doc_id ASC) AS rk,
                       CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
                FROM documents),
            kept AS (
                SELECT lang, v, n FROM r
                WHERE rk > (n * 1) // 10 AND rk <= n - (n * 1) // 10)
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(min(n) AS BIGINT) AS n_total,
                   CAST(sum(v) AS BIGINT) AS sum_kept,
                   CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS trimmed_mean
            FROM kept GROUP BY lang
        """,
        "tfidf_keywords": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split_regex(lower(text), '\s+'),
                           x -> len(x) >= 2)) AS term
                FROM documents),
            tf AS (
                SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY doc_id, term),
            dfreq AS (
                SELECT term, CAST(count(*) AS BIGINT) AS df_docs
                FROM tf GROUP BY term),
            nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
                   FROM documents),
            idf AS (
                SELECT term,
                       CAST(floor(ln(CAST(n_docs AS DOUBLE)
                                     / CAST(df_docs AS DOUBLE)) * 1000000.0)
                            AS BIGINT) AS idf_micro
                FROM dfreq CROSS JOIN nd),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf, idf.idf_micro,
                       CAST(tf.tf * idf.idf_micro AS BIGINT) AS score_micro
                FROM tf JOIN idf USING (term)),
            rk AS (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                           ORDER BY score_micro DESC, term ASC) AS rank
                FROM scored)
            SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf,
                   idf_micro, score_micro
            FROM rk WHERE rank <= 3
        """,
        "canonical_clusters": """
            SELECT 'http://ex.com/c' || CAST(doc_id % 40 AS VARCHAR) AS canonical,
                   CAST(count(*) AS BIGINT) AS n_pages,
                   min(doc_id) AS min_doc
            FROM documents
            WHERE doc_id % 7 <> 0
            GROUP BY 1
        """,
        "readability": r"""
            WITH c AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                           AS words,
                       CAST(greatest(len(regexp_extract_all(text, '[.!?]+')),
                                     1) AS BIGINT) AS sentences,
                       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                           AS BIGINT) AS vg
                FROM documents),
            s AS (
                SELECT doc_id, words, sentences,
                       greatest(vg, words) AS syllables
                FROM c WHERE words >= 1),
            r AS (
                SELECT doc_id, words, sentences, syllables,
                       CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)
                           AS wps,
                       CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)
                           AS spw
                FROM s)
            SELECT doc_id, words, sentences, syllables,
                   round(CAST(206.835 AS DOUBLE)
                         - CAST(1.015 AS DOUBLE) * wps
                         - CAST(84.6 AS DOUBLE) * spw, 6) AS flesch,
                   round(CAST(0.39 AS DOUBLE) * wps
                         + CAST(11.8 AS DOUBLE) * spw
                         - CAST(15.59 AS DOUBLE), 6) AS fk_grade
            FROM r
        """,
        "spam_mass": _spam_mass_oracle_sql(),
        "chunk_passages": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS words
                FROM documents),
            base AS (
                SELECT doc_id, words FROM w WHERE len(words) >= 1),
            st AS (
                SELECT doc_id, words,
                       unnest(range(1, len(words) + 1, 48)) AS start
                FROM base)
            SELECT doc_id,
                   CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
                   CAST(len(list_slice(words, start, start + 64 - 1))
                       AS BIGINT) AS n_words,
                   array_to_string(list_slice(words, start, start + 64 - 1),
                                   ' ') AS passage
            FROM st
        """,
        "strand_pairs": f"""
            WITH u AS (
                SELECT doc_id, n_chars,
                       CASE WHEN (doc_id % 97) % 2 = 0
                            THEN 'https://site' || CAST((doc_id % 97) % 11 AS VARCHAR)
                                 || '.example/' || lang || '/doc-'
                                 || CAST(doc_id % 97 AS VARCHAR)
                            ELSE 'https://site' || CAST((doc_id % 97) % 11 AS VARCHAR)
                                 || '.example/doc-' || CAST(doc_id % 97 AS VARCHAR)
                                 || '?lang=' || lang
                       END AS url
                FROM documents),
            k AS (
                SELECT doc_id, n_chars,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
                           '/({_STRAND_ALT})/', '/~L~/', 'g'),
                           '/({_STRAND_ALT})/', '/~L~/', 'g'),
                           '/({_STRAND_ALT})$', '/~L~', 'g'),
                           '(^|[?&])lang=({_STRAND_ALT})(&|$)',
                           '\\1lang=~L~\\3', 'g') AS key,
                       coalesce(
                           nullif(regexp_extract(url, '/({_STRAND_ALT})(/|$)', 1), ''),
                           nullif(regexp_extract(url,
                               '(^|[?&])lang=({_STRAND_ALT})(&|$)', 2), '')
                       ) AS lang
                FROM u),
            f AS (SELECT * FROM k WHERE lang IS NOT NULL),
            g AS (SELECT key FROM f GROUP BY key HAVING count(*) <= 64),
            s AS (SELECT f.* FROM f JOIN g USING (key))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.lang AS lang_a, b.lang AS lang_b,
                   CAST((abs(a.n_chars - b.n_chars) * 1000)
                        // greatest(a.n_chars, b.n_chars, 1) AS BIGINT)
                       AS len_ratio_pm
            FROM s a JOIN s b ON a.key = b.key AND a.lang < b.lang
            WHERE abs(a.n_chars - b.n_chars) * 1000
                  <= 250 * greatest(a.n_chars, b.n_chars, 1)
        """,
        "perceptron": r"""
            WITH y AS (
                SELECT doc_id,
                       CASE WHEN length(source) = 4 THEN 1 ELSE -1 END AS yy
                FROM documents),
            t AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split_regex(lower(text), '\s+'),
                           x -> x <> '')) AS tok
                FROM documents),
            f AS (
                SELECT doc_id,
                       CAST(CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)
                            % 32 AS INT) AS feat,
                       count(*) AS cnt
                FROM t GROUP BY 1, 2),
            -- epoch 1: w = 0, b = 0 -> every margin is 0 -> every doc
            -- is misclassified, so the first update sums y*x over all
            w1 AS (
                SELECT feat, SUM(yy * cnt) AS w
                FROM f JOIN y USING (doc_id) GROUP BY feat),
            b1 AS (SELECT SUM(yy) AS b FROM y),
            m2 AS (
                SELECT y.doc_id, y.yy,
                       COALESCE(s.dot, 0) + (SELECT b FROM b1) AS s
                FROM y LEFT JOIN (
                    SELECT f.doc_id, SUM(f.cnt * w1.w) AS dot
                    FROM f JOIN w1 USING (feat) GROUP BY f.doc_id
                ) s USING (doc_id)),
            u2 AS (
                SELECT feat, SUM(m.yy * f.cnt) AS dw
                FROM f JOIN (
                    SELECT doc_id, yy FROM m2 WHERE yy * s <= 0
                ) m USING (doc_id) GROUP BY feat),
            w2 AS (
                SELECT COALESCE(w1.feat, u2.feat) AS feat,
                       COALESCE(w1.w, 0) + COALESCE(u2.dw, 0) AS w
                FROM w1 FULL JOIN u2 ON w1.feat = u2.feat),
            b2 AS (
                SELECT (SELECT b FROM b1)
                       + COALESCE((SELECT SUM(yy) FROM m2 WHERE yy * s <= 0), 0)
                           AS b),
            mf AS (
                SELECT y.doc_id, y.yy,
                       COALESCE(s.dot, 0) + (SELECT b FROM b2) AS s
                FROM y LEFT JOIN (
                    SELECT f.doc_id, SUM(f.cnt * w2.w) AS dot
                    FROM f JOIN w2 USING (feat) GROUP BY f.doc_id
                ) s USING (doc_id))
            SELECT doc_id, CAST(yy AS BIGINT) AS gold,
                   CAST(s AS BIGINT) AS margin,
                   CAST(CASE WHEN s > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
            FROM mf
        """,
        "langid_trained": _langid_oracle_sql(),
        "image_alt_pairs": r"""
            SELECT 'https://img' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example/g/' || CAST(doc_id AS VARCHAR) AS page_url,
                   'https://img' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example/img/' || CAST(doc_id AS VARCHAR) || '.jpg'
                       AS img_url,
                   trim(regexp_replace(
                       translate(substr(text, 1, 60), '"<>&', '    '),
                       '\s+', ' ', 'g')) AS alt
            FROM documents
            WHERE length(trim(regexp_replace(
                      translate(substr(text, 1, 60), '"<>&', '    '),
                      '\s+', ' ', 'g'))) >= 5
        """,
        "term_drift": r"""
            WITH tok_old AS (
                SELECT unnest(list_filter(
                           string_split_regex(lower(text), '\s+'),
                           x -> x <> '')) AS term
                FROM documents WHERE doc_id % 2 = 0),
            tok_new AS (
                SELECT unnest(list_filter(
                           string_split_regex(lower(text), '\s+'),
                           x -> x <> '')) AS term
                FROM documents WHERE doc_id % 2 = 1),
            co AS (SELECT term, CAST(count(*) AS BIGINT) AS c_old
                   FROM tok_old GROUP BY term),
            cn AS (SELECT term, CAST(count(*) AS BIGINT) AS c_new
                   FROM tok_new GROUP BY term),
            j AS (
                SELECT coalesce(co.term, cn.term) AS term,
                       CAST(coalesce(c_old, 0) AS BIGINT) AS c_old,
                       CAST(coalesce(c_new, 0) AS BIGINT) AS c_new
                FROM co FULL OUTER JOIN cn ON co.term = cn.term),
            s AS (
                SELECT CAST(sum(c_old) AS DOUBLE) AS n_old,
                       CAST(sum(c_new) AS DOUBLE) AS n_new,
                       CAST(count(*) AS DOUBLE) AS vocab
                FROM j),
            p AS (
                SELECT term, c_old, c_new,
                       CAST(c_old + 1 AS DOUBLE) / (n_old + vocab) AS p_old,
                       CAST(c_new + 1 AS DOUBLE) / (n_new + vocab) AS p_new
                FROM j, s)
            SELECT term, c_old, c_new,
                   round(greatest(p_new / p_old, p_old / p_new), 6) AS drift,
                   CAST(CASE WHEN p_new >= p_old THEN 1 ELSE -1 END
                       AS INTEGER) AS direction
            FROM p
            ORDER BY drift DESC, term ASC
            LIMIT 20
        """,
        "hard_negatives": """
            SELECT query_id, vec_id, round(cosine, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[]))
                         AS cosine,
                     row_number() OVER (
                         PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(
                                      CAST(c.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])) DESC,
                                  c.vec_id ASC) AS rank
              FROM embeddings c,
                   (SELECT * FROM embeddings WHERE vec_id < 3) q
              WHERE c.vec_id % 50 <> q.vec_id)
            WHERE rank <= 5
        """,
        # domain-hash split: first 8 hex digits of md5(source) decoded
        # digit-by-digit (strpos over the hex alphabet — every product and
        # the sum stay below 2^32, exact in doubles), mod 100, same 20/25
        # thresholds as the Spark side
        "domain_holdout": """
            WITH hashed AS (
                SELECT source, n_chars,
                       CAST(list_sum(list_transform(range(0, 8),
                           i -> (strpos('0123456789abcdef',
                                        substr(md5(source), i + 1, 1)) - 1)
                                * (16.0 ** (7 - i)))) AS BIGINT) % 100 AS bucket
                FROM documents
            )
            SELECT CASE WHEN bucket < 20 THEN 'test'
                        WHEN bucket < 45 THEN 'val'
                        ELSE 'train' END AS split,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_domains,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM hashed GROUP BY 1
        """,
        # independent recomputation: centroids as per-(label, position)
        # averages via UNNEST(range(dim)), cosine against every centroid,
        # argmax by (cosine DESC, label ASC) — the min top1/top2 margin on
        # this corpus is ~1e-4, far above cross-engine double noise, and
        # the output carries counts only
        "centroid_classify": """
            WITH e AS (
                SELECT vec_id, label,
                       CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings
            ),
            flat AS (
                SELECT label, i, emb[i + 1] AS x
                FROM e, UNNEST(range(0, len(emb))) AS t(i)
            ),
            cent AS (
                SELECT label AS clabel, list(xm ORDER BY i) AS c
                FROM (SELECT label, i, avg(x) AS xm FROM flat GROUP BY 1, 2)
                GROUP BY 1
            ),
            scored AS (
                SELECT e.vec_id, e.label AS gold, c.clabel AS pred,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(e.emb, c.c) DESC,
                                    c.clabel ASC) AS rn
                FROM e CROSS JOIN cent c
            )
            SELECT gold, pred, CAST(count(*) AS BIGINT) AS n_vecs
            FROM scored WHERE rn = 1 GROUP BY 1, 2
        """,
    }
