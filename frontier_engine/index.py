"""Token-ngram inverted index (K6) — the distributed re-expression of the
reference's text-search DDL: a GIN index on to_tsvector(title) plus a
compound (store_id, token_ngrams) index (/root/reference/db/init.sql:149-162).

The index is a plain DataFrame of postings ``(ngram, doc_id)`` — one
explode + distinct, fully shuffle-partitioned by ngram — persisted with a
DECLARATIVE ``write.partitionBy(shard)`` layout where
``shard = pmod(xxhash64(ngram), n_shards)``. A term lookup then computes
the shard of each query term on the driver and reads ONLY those shard
directories (partition pruning: the scan's PartitionFilters prune
``n_shards - len(terms)`` directories before any IO).

At 100 TB: postings for stop-ngrams are the skew risk — the build caps a
posting list at ``max_postings`` per ngram (keeping the lowest doc_ids,
deterministic), the standard "drop stop-words from the index" trade
search engines make; capped ngrams are recorded in a side table rather
than silently dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def token_ngrams_col(text: Column, n: int = 2) -> Column:
    """Space-joined token n-grams of the lowercased whitespace token stream
    (mirrors transforms.token_ngrams_col; re-declared here so the index
    module is self-contained for --py-files shipping)."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) >= 1)
    cnt = F.size(toks)
    return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def build_postings(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """(ngram, doc_id) distinct postings; optionally cap per-ngram list size
    (lowest doc_ids kept — deterministic) to bound stop-ngram skew."""
    # postings are distinct by construction: array_distinct dedupes within
    # a doc and each doc contributes once — no dropDuplicates shuffle needed
    postings = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(token_ngrams_col(F.col(text_col), n))).alias("ngram"),
    )
    if max_postings is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("ngram").orderBy(F.col("doc_id").asc())
        postings = (
            postings.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_postings)
            .drop("_rn")
        )
    return postings


def shard_col(ngram: Column, n_shards: int) -> Column:
    return F.pmod(F.xxhash64(ngram), F.lit(n_shards)).cast("int")


def write_index(postings: DataFrame, path: str, n_shards: int = 16) -> None:
    """Persist postings with a declarative partition layout: one directory
    per ``shard = pmod(xxhash64(ngram), n_shards)`` — the Spark-native form
    of the reference's per-shard DDL (init.sql CREATE TABLE per shard)."""
    (
        postings.withColumn("shard", shard_col(F.col("ngram"), n_shards))
        .repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def search_terms(
    spark: SparkSession, path: str, terms: list[str], n_shards: int = 16
) -> DataFrame:
    """Docs containing ALL ``terms`` (AND semantics).

    Shards are computed driver-side from the literal terms, so the read
    plan carries ``shard IN (...)`` as a PartitionFilter — only the
    matching directories are listed or scanned.
    """
    idx = spark.read.parquet(path)
    shards = _shards_py(spark, terms, n_shards)
    hits = idx.filter(F.col("shard").isin(shards) & F.col("ngram").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("ngram").alias("n_terms"))
        .filter(F.col("n_terms") == len(terms))
        .select("doc_id")
    )


def _shards_py(spark: SparkSession, terms: list[str], n_shards: int) -> list[int]:
    # ONE local job evaluates the write-time shard expression for every
    # term (a literal one-column DataFrame) — not one spark.range(1) job
    # per term, which is driver noise on a 100-term query; avoids
    # re-implementing xxhash64 in Python
    if not terms:
        return []
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select(shard_col(F.col("term"), n_shards).alias("s")).collect()
    return sorted({int(r["s"]) for r in rows})


def _shard_py(spark: SparkSession, term: str, n_shards: int) -> int:
    return _shards_py(spark, [term], n_shards)[0]


def search_postings(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Same AND-search against an in-memory postings DataFrame (no layout);
    used by tests so the correctness surface does not depend on a
    filesystem path."""
    hits = postings.filter(F.col("ngram").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("ngram").alias("n_terms"))
        .filter(F.col("n_terms") == len(terms))
        .select("doc_id")
    )


def match_counts(postings: DataFrame, terms: list[str]) -> DataFrame:
    """OR-search with ranking signal: (doc_id, n_terms matched) for every
    doc matching at least one term — the index-backed form of the
    reference's ``websearch_to_tsquery`` lookup (init.sql:149-156)."""
    hits = postings.filter(F.col("ngram").isin(terms))
    return hits.groupBy("doc_id").agg(F.countDistinct("ngram").alias("n_terms"))


def _term_regex(term: str, n: int) -> str | None:
    """Java regex matching lowercased text iff the space-joined token
    n-gram ``term`` occurs in the whitespace token stream: each token
    \\Q-quoted, tokens joined by ``\\s+``, anchored on token boundaries.
    None for terms that cannot equal any width-``n`` posting (wrong token
    count, or empty/whitespace-bearing tokens — n-grams are single-space
    joins of \\s-free tokens)."""
    toks = term.split(" ")
    if len(toks) != n or any(t == "" or any(c.isspace() for c in t) for t in toks):
        return None
    quoted = [r"\Q" + t.replace(r"\E", r"\E\\E\Q") + r"\E" for t in toks]
    return r"(?:^|\s)" + r"\s+".join(quoted) + r"(?:\s|$)"


def match_counts_docs(
    docs: DataFrame,
    terms: list[str],
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``match_counts(build_postings(docs, n), terms)`` with the term
    lookup pushed THROUGH the posting explode (guide §1.2: don't compute
    what you throw away): a literal n-gram occurs in a document's token
    stream iff its boundary-anchored regex matches the lowercased text
    (token streams are ``\\s+`` splits, so ``tok1\\s+tok2`` between
    boundaries IS n-gram containment), so the per-term presence tests are
    three regexp_likes per row and the corpus-wide posting explode — and
    with it the whole (ngram, doc_id) shuffle — never materializes.
    Each doc emits at most one row straight off the scan: no exchange at
    any corpus size. (Building the distinct n-gram ARRAY per row and
    intersecting was 5x slower than the explode it replaced once the
    pushed-down ``n_terms >= 1`` filter duplicated the array expression
    below the projection — measured 25s vs 1.0s at sf1.0; cheap per-term
    predicates make that duplication irrelevant.)

    Output is row-identical to the posting-based form (duplicate terms
    deduped like countDistinct; malformed terms match nothing); use this
    when the index does not already exist as a written layout (for a
    persisted shard layout, ``search_terms`` pruning stays the right
    tool)."""
    patterns = [p for p in (_term_regex(t, n) for t in dict.fromkeys(terms)) if p]
    lower = F.lower(F.col(text_col))
    if not patterns:
        return docs.select(
            F.col(id_col).alias("doc_id"), F.lit(0).cast("long").alias("n_terms")
        ).filter(F.lit(False))
    hits = [F.regexp_like(lower, F.lit(p)) for p in patterns]
    n_terms = sum(
        (h.cast("int") for h in hits[1:]), hits[0].cast("int")
    ).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"), n_terms.alias("n_terms")
    ).filter(F.col("n_terms") >= 1)


def tf_postings(
    docs: DataFrame,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Term-FREQUENCY postings ``(doc_id, ngram, tf)`` — the ranked-retrieval
    companion to :func:`build_postings` (which is presence-only). One
    explode of the token n-gram stream followed by one map-side-combined
    count; nothing but (doc, term, count) triples ever shuffles, so the
    build cost is bounded by corpus token volume, not corpus bytes.

    The unigram path deliberately avoids higher-order-function lambdas
    (explode + row filter instead of ``F.filter(arr, lambda ...)``):
    lambda variables get fresh IDs per invocation, which defeats plan
    canonicalization — and with it ``ReusedExchange`` — so a consumer
    that branches over these postings (e.g. :func:`bm25`) would rescan
    and re-aggregate the corpus once per branch."""
    if n == 1:
        exploded = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("ngram"),
        ).filter(F.length("ngram") >= 1)
    else:
        exploded = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(token_ngrams_col(F.col(text_col), n)).alias("ngram"),
        )
    return exploded.groupBy("doc_id", "ngram").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25(
    postings_tf: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009) over tf postings:
    ``(doc_id, n_terms, score)`` for every document matching at least one
    query term, ``score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``
    with the Lucene idf ``ln(1 + (N−df+0.5)/(df+0.5))`` (always ≥ 0).

    Scale shape: ONE per-doc aggregate builds both the document length and
    the matched-term array (``collect_list`` skips the NULLs the isin
    filter leaves, so the array is query-term-bounded, never
    vocabulary-sized) — candidates are never joined back against a
    doc-cardinality length table. The corpus stats (N, avgdl) and the
    per-term idf table collapse to broadcast single-row/map literals; the
    score is a fold over the per-doc hits array, so after the two corpus
    aggregates (tf, per-doc) NOTHING shuffles at all. The shared postings
    subtree is canonicalization-stable (see :func:`tf_postings`), so the
    stats/df branches collapse to ``ReusedExchange`` instead of rescanning
    the corpus.

    Float determinism: per-(doc, term) contributions are pure IEEE scalar
    ops, identical in any engine; the final per-doc fold adds ≤ len(terms)
    doubles, so cross-engine addition-order drift is ≤ a few ulps — round
    the score for hash-stable comparisons (the `bm25_search` query rounds
    to 6 decimals)."""
    perdoc = postings_tf.groupBy("doc_id").agg(
        F.sum("tf").alias("dl"),
        F.collect_list(
            F.when(F.col("ngram").isin(terms), F.struct("ngram", "tf"))
        ).alias("hits"),
    )
    stats = perdoc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dfq = (
        perdoc.select(F.explode("hits").alias("h"))
        .groupBy(F.col("h.ngram").alias("ngram"))
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    # query-term-sized: fold the idf table into ONE broadcast map row
    idfmap = (
        dfq.crossJoin(F.broadcast(stats))
        .select(
            "ngram",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("ngram", "idf"))
            ).alias("idfmap")
        )
    )
    matched = perdoc.filter(F.size("hits") > 0)
    return (
        matched.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(idfmap))
        .select(
            "doc_id",
            F.size("hits").cast("long").alias("n_terms"),
            F.aggregate(
                "hits",
                F.lit(0.0),
                lambda acc, h: acc
                + F.col("idfmap")[h["ngram"]]
                * (h["tf"] * F.lit(k1 + 1.0))
                / (
                    h["tf"]
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                ),
            ).alias("score"),
        )
    )


def rrf_fuse(
    channels: dict[str, DataFrame],
    k0: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    named per-channel rankings into one hybrid list: each channel
    contributes ``1 / (k0 + rank)`` for the documents it ranked, scores
    sum across channels, and absent channels contribute 0 —
    ``rrf = Σ_c 1/(k0 + rank_c(d))``. This is the standard lexical+dense
    hybrid (BM25 ∪ embedding ANN) that retrieval-augmented data pipelines
    run over a crawled corpus; RRF needs no score calibration between
    channels because it consumes only ranks.

    Input channels are ``(id_col, rank_col)`` tables (rank 1 = best, as
    :func:`bm25`-derived windows and ``ann.brute_force_topk`` emit).
    Output: ``(id_col, n_channels, rrf)`` — callers that want the fused
    ORDER should window over ``(rrf DESC, id ASC)``.

    Determinism: ranks are integers, so each contribution is the exact
    double ``1/(k0+r)``; with two channels the per-doc sum is one IEEE
    addition (commutative — partitioning cannot reorder it). With ≥ 3
    channels the fold order is engine-dependent in the last ulps — round
    to 6 decimals, as the query layer does. Scale shape: inputs are
    top-k tables (k·n_queries rows, NOT corpus-sized); the union +
    map-side-combined sum is one shuffle of that small frame. The
    expensive work lives in the channels themselves, whose plans are
    audited where they are built."""
    if not channels:
        raise ValueError("rrf_fuse: need at least one channel")
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "contrib"
            ),
        )
        for df in channels.values()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_channels"),
        F.sum("contrib").alias("rrf"),
    )


def build_positional_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted index: ``(term, doc_id, positions)`` with
    0-based token offsets, sorted — the structure phrase and proximity
    queries run on (Manning et al., IIR §2.4; Lucene's position-enabled
    postings). One posexplode + one (term, doc_id) hash aggregate with
    map-side combine; positions sort per-posting arrays only (array_sort
    in the agg), never a corpus sort. Layout/sharding composes with
    write_index exactly like the n-gram postings."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) >= 1
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
    )


def phrase_search(postings: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact phrase query over positional postings: a document matches
    when some start s has term_i at position s+i for every i. Classic
    positional intersection — fetch each term's postings, shift term_i's
    positions by -i, array_intersect down to the surviving starts; the
    doc is dropped the moment the running start-set empties.

    Scale shape: one doc_id-keyed hash join per phrase term (terms
    beyond the first probe only the docs still alive — selectivity
    compounds left to right); the position arithmetic is JVM expression
    work on per-doc arrays. Postings for a term are vocabulary-pruned
    scans when the postings table is written via write_index
    (partitionBy shard + term pruning), so a 3-word phrase reads 3
    posting lists, not the corpus.

    Output: (doc_id, n_occurrences) for matching docs, exact counts.
    """
    if not phrase:
        raise ValueError("phrase_search: phrase must be non-empty")
    cur = postings.filter(F.col("term") == phrase[0]).select(
        "doc_id", F.col("positions").alias("_starts")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == term).select(
            "doc_id", F.col("positions").alias("_q")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .withColumn(
                "_starts",
                F.array_intersect(
                    "_starts", F.transform("_q", lambda x: x - i)
                ),
            )
            .filter(F.size("_starts") > 0)
            .select("doc_id", "_starts")
        )
    return cur.select(
        "doc_id", F.size("_starts").cast("long").alias("n_occurrences")
    )


def ndcg_eval(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k retrieval evaluation (Järvelin & Kekäläinen, TOIS 2002;
    the burnout-style exponential gain used by every TREC-era leader
    board): score a ranking table against graded relevance judgments —
    the missing piece that turns the retrieval stack (bm25 / phrase /
    RRF fusion) into something you can TUNE, because a ranking change
    without an eval number is a vibe, not an improvement.

        DCG@k  = Σ_{rank ≤ k} (2^rel − 1) / log2(rank + 1)
        NDCG@k = DCG@k / IDCG@k   (IDCG: judged docs re-ranked by rel
                                   desc, doc id asc — the ideal order)

    Unjudged retrieved docs gain 0 (left join); queries with no
    positive judgment report NULL ndcg. Exactness discipline: each
    (gain, rank) term is integerized ONCE — floor(gain·1e9 /
    log2(rank+1)) — so per-query accumulation is exact int64 and ndcg
    is one int→double division, the same isolation as
    ``textops.kn_bigram_score``.

    Plan shape: one left join of the top-k ranking (k·|queries| rows —
    never the corpus) against qrels on (query, doc), one aggregate; the
    ideal side is a row_number window over qrels partitioned by query.
    """
    if k < 1:
        raise ValueError("ndcg_eval: k must be >= 1")
    q, d, rk, rl = query_col, doc_col, rank_col, rel_col

    def micro(gain_col, rank_col_):
        return F.floor(
            (gain_col * F.lit(1000000000)).cast("double")
            / F.log2(rank_col_ + F.lit(1))
        ).cast("long")

    gain = F.expr(f"shiftleft(1, cast({rl} as int))").cast("long") - 1
    got = (
        ranked.filter(F.col(rk) <= k)
        .join(
            qrels.select(F.col(q), F.col(d), F.col(rl)),
            [q, d],
            "left",
        )
        .withColumn("_g", F.coalesce(gain, F.lit(0)).cast("long"))
        .groupBy(q)
        .agg(
            F.sum(F.when(F.col("_g") > 0, micro(F.col("_g"), F.col(rk))).otherwise(0))
            .cast("long")
            .alias("dcg_micro"),
            F.count(F.lit(1)).cast("long").alias("n_ranked"),
            F.sum(F.when(F.col("_g") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_relevant_found"),
        )
    )
    w = Window.partitionBy(q).orderBy(F.col(rl).desc(), F.col(d).asc())
    ideal = (
        qrels.filter(F.col(rl) > 0)
        .withColumn("_irank", F.row_number().over(w))
        .filter(F.col("_irank") <= k)
        .withColumn("_g", gain.cast("long"))
        .groupBy(q)
        .agg(
            F.sum(micro(F.col("_g"), F.col("_irank"))).cast("long").alias("idcg_micro"),
            F.count(F.lit(1)).cast("long").alias("n_judged_pos"),
        )
    )
    return (
        got.join(ideal, q, "left")
        .withColumn("idcg_micro", F.coalesce("idcg_micro", F.lit(0)).cast("long"))
        .withColumn("n_judged_pos", F.coalesce("n_judged_pos", F.lit(0)).cast("long"))
        .withColumn(
            "ndcg",
            F.when(
                F.col("idcg_micro") > 0,
                F.col("dcg_micro").cast("double") / F.col("idcg_micro").cast("double"),
            ),
        )
        .select(q, "n_ranked", "n_relevant_found", "dcg_micro", "idcg_micro", "ndcg")
    )


def recall_mrr_eval(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Recall@k and MRR@k — the binary-relevance companions of
    :func:`ndcg_eval` (recall: did the ranking FIND the relevant docs;
    reciprocal rank: how FAST — Voorhees TREC-8's QA metric), completing
    the eval pair every retrieval stack tunes against.

    Binary relevance is ``rel > 0``.  recall@k = |relevant ∩ top-k| /
    |relevant|; rr = 1/rank of the first relevant hit within k, 0 when
    positives exist but none was retrieved, NULL when the query has no
    positive judgment.  All counting is exact int64; recall and rr are
    single int→int IEEE divisions (correctly rounded, identical in any
    engine — no rounding step needed).

    Plan shape: same as ndcg_eval — one left join of the top-k table
    (k·|queries| rows) against qrels, two aggregates at query
    cardinality.
    """
    if k < 1:
        raise ValueError("recall_mrr_eval: k must be >= 1")
    q, d, rk, rl = query_col, doc_col, rank_col, rel_col
    hit = F.coalesce(F.col(rl), F.lit(0)) > 0
    got = (
        ranked.filter(F.col(rk) <= k)
        .join(qrels.select(F.col(q), F.col(d), F.col(rl)), [q, d], "left")
        .groupBy(q)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ranked"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_relevant_found"),
            F.min(F.when(hit, F.col(rk))).cast("long").alias("first_rel_rank"),
        )
    )
    pos = (
        qrels.filter(F.col(rl) > 0)
        .groupBy(q)
        .agg(F.count(F.lit(1)).cast("long").alias("n_judged_pos"))
    )
    return (
        got.join(pos, q, "left")
        .withColumn("n_judged_pos", F.coalesce("n_judged_pos", F.lit(0)).cast("long"))
        .withColumn(
            "recall_at_k",
            F.when(
                F.col("n_judged_pos") > 0,
                F.col("n_relevant_found").cast("double")
                / F.col("n_judged_pos").cast("double"),
            ),
        )
        .withColumn(
            "rr",
            F.when(F.col("n_judged_pos") == 0, F.lit(None).cast("double"))
            .when(
                F.col("first_rel_rank").isNotNull(),
                F.lit(1.0) / F.col("first_rel_rank").cast("double"),
            )
            .otherwise(F.lit(0.0)),
        )
        .select(
            q,
            "n_ranked",
            "n_relevant_found",
            "n_judged_pos",
            "first_rel_rank",
            "recall_at_k",
            "rr",
        )
    )
