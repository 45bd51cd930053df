"""Large-scale training-data text operators over a ``documents`` table
(doc_id, text, ...): deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard), language-ID, quality scoring, token counting, fingerprinting.

Design rules: expression-only where possible (whole-stage codegen);
numpy-vectorized pandas UDFs where hashing math needs Python; NEVER
row-at-a-time Python; no driver-side collection — every op is a dataflow
that scales by adding partitions. Pair-generating ops (LSH) bucket first so
the quadratic verify step runs only inside small candidate buckets, never
across the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------ exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: keep the smallest id per distinct text.

    xxhash64 + min-by is one shuffle; ties on hash are broken by the id so
    the survivor set is deterministic. (At 100 TB: hash-partitioned
    aggregation with partial map-side combine — no sort, no full-text
    comparisons except the pathological collision case.)
    """
    h = F.xxhash64(F.col(text_col))
    return (
        df.withColumn("_h", h)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_h").orderBy(F.col(id_col).asc())),
        )
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-dup groups: (canonical_id, doc_id) for every duplicated doc."""
    h = F.xxhash64(F.col(text_col)).alias("_h")
    withh = df.select(F.col(id_col), h)
    canon = withh.groupBy("_h").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        withh.join(canon, "_h")
        .filter(F.col("group_size") > 1)
        .select("canonical_id", id_col, "group_size")
    )


# -------------------------------------------------------------- shingling


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles (space-joined) of the lowercased token stream."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) >= 1)
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    scope_to_pairs: bool = False,
) -> DataFrame:
    """Exact shingle-Jaccard for given (id_a, id_b) pairs.

    Distinct shingles per doc → explode → count intersections per pair.
    Cost is O(corpus shingles) shuffle with ``pairs`` referenced once.

    ``scope_to_pairs=True`` first semi-joins ``df`` to the ids appearing in
    ``pairs``, making the cost O(candidate shingles) — the right plan at
    warehouse scale, but it references the ``pairs`` plan two extra times,
    so ONLY use it when ``pairs`` is materialized (persisted / a table):
    on a lazy LSH pipeline it re-evaluates the whole candidate DAG per
    reference (measured 3x slower than the corpus-wide shuffle at sf0.1).
    """
    if scope_to_pairs:
        cand_ids = pairs.select(
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col)
        ).distinct()
        docs = df.join(cand_ids, id_col, "left_semi")
    else:
        docs = df
    # the shingle expression must live ONLY inside the generator: any
    # reference to it in a projection above the Generate (e.g. a size()
    # alongside the explode, even in a separate select — CollapseProject
    # merges them) is re-evaluated per exploded ROW, and the higher-order
    # shingle chain costs ~0.5ms per evaluation — measured 30x slower on
    # the sf0.1 verify. The per-doc shingle count is recovered AFTER the
    # explode with a window (one small shuffle, expression evaluated once
    # per doc).
    from pyspark.sql import Window

    exploded = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("sh"),
    )
    sh = exploded.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("_id"))
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("sh"), F.col("_n").alias("n_a"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("sh"), F.col("_n").alias("n_b"))
    joined = pairs.join(a, "id_a").join(b, ["id_b", "sh"])
    inter = joined.groupBy("id_a", "id_b", "n_a", "n_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    return inter.select(
        "id_a",
        "id_b",
        (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias("jaccard"),
    )


# ----------------------------------------------------------- MinHash + LSH

_MINHASH_PRIME = np.uint64((1 << 61) - 1)

# splitmix64-style mixing constants for the fused near-dup path's rolling
# token-hash folds (shingle hashes, band hashes, group keys) — public
# constants from the splitmix64 reference generator
_MIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_MIX_C2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_C3 = np.uint64(0x94D049BB133111EB)
_S29 = np.uint64(29)
_S32 = np.uint64(32)
_S61 = np.uint64(61)


def _mix_fold(x: np.ndarray, h) -> np.ndarray:
    """One rolling-fold step: absorb ``h`` into state ``x`` (uint64 wrap)."""
    x = (x ^ h) * _MIX_C2
    return x ^ (x >> _S29)


def _mix_finalize(x: np.ndarray) -> np.ndarray:
    x = x * _MIX_C3
    return x ^ (x >> _S32)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature_udf(num_perm: int = 128, seed: int = 42):
    """pandas UDF: array<long> shingle HASHES → array<long> MinHash signature.

    String hashing stays JVM-side (``xxhash64`` inside a higher-order
    ``transform`` — see :func:`shingle_hashes`); the UDF is pure numpy:
    universal hashing (a*x+b mod Mersenne-61) over the 64-bit shingle
    hashes, min per permutation.
    """
    a, b = _minhash_params(num_perm, seed)

    def _sig_of(hashes) -> np.ndarray:
        if hashes is None or len(hashes) == 0:
            return np.full(num_perm, np.int64(2**62), dtype=np.int64)
        hs = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        vals = (a[None, :] * hs[:, None] + b[None, :]) % _MINHASH_PRIME
        return vals.min(axis=0).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(shingle_hashes: pd.Series) -> pd.Series:
        return shingle_hashes.map(_sig_of)

    return sig


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Distinct 64-bit shingle hashes, computed entirely JVM-side."""
    return F.transform(
        F.array_distinct(word_shingles(text, k)), lambda s: F.xxhash64(s)
    )


def minhash_bands(sig_col: Column, bands: int, rows: int) -> Column:
    """Split a signature into band-hash structs for LSH bucketing."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda band: F.struct(
            band.alias("band"),
            F.xxhash64(
                F.concat_ws(",", F.transform(F.slice(sig_col, band * rows + 1, rows), lambda v: v.cast("string")))
            ).alias("band_hash"),
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    attach_estimate: bool = True,
    cached: list[DataFrame] | None = None,
    pair_mode: str = "all",
) -> DataFrame:
    """MinHash+LSH near-dup candidates: (id_a < id_b[, est_jaccard]).

    shingle → signature (pandas UDF) → collapse docs with IDENTICAL
    signatures into one group → band-bucket the DISTINCT signatures →
    in-bucket signature pairs → expand back to id pairs.

    SKEW SAFETY (same distinct-hash discipline as
    :func:`simhash_near_dup_pairs`): web corpora concentrate mass on
    identical signatures (boilerplate/template clusters, empty docs). A
    doc-level band bucket over a K-doc identical-signature cluster holds a
    K-long array in EVERY band and emits K²/2 pairs per band before the
    cross-band dedup; here such a cluster contributes exactly ONE row per
    band, the cross-band dedup runs over distinct-signature pairs (bounded
    by the LSH design — genuinely different signatures colliding in a
    band), and id pairs are produced by membership joins that cost exactly
    the output cardinality. The emitted pair SET is identical to the
    doc-level formulation: identical signatures share every band hash.

    ``pair_mode``:

    - ``"all"`` (default): every colliding id pair — K members with the
      same signature emit the full K²/2 clique. Output-compatible with the
      historical behavior; required when a downstream exact-verify step
      (e.g. :func:`ngram_jaccard_pairs`) filters individual edges.
    - ``"star"``: a spanning star instead of a clique — within an
      identical-signature group, (min_id, member) edges only (O(K)); and
      only each group's representative (min id) participates in
      cross-signature edges. Connected components over star pairs equal
      components over all pairs (the star spans each group; every member
      reaches its rep), so use this when the consumer is clustering
      (:func:`connected_components` / :func:`select_survivors`) WITHOUT a
      per-edge verify in between. At 10¹⁰ URLs this is the difference
      between O(K²) and O(K) pairs for a K-doc template cluster.

    ``attach_estimate=False`` skips the estimate computation — use it when
    the candidates feed an exact verify step. Signature agreement is
    computed per distinct-signature PAIR (before membership expansion), so
    the estimate costs distinct-pair work, not id-pair work; intra-group
    pairs have est_jaccard = 1.0 by construction (identical signatures
    agree on all ``num_perm`` slots). Pass a ``cached`` list to persist
    the per-signature group table for the duration (the caller owns the
    lifetime — an unconditional persist here leaked cache in long-lived
    sessions).

    ``skey`` (the group key) is a 128-bit struct of two independent
    xxhash64s of the signature, 16 shuffle bytes instead of the ~1 KB
    signature. A single 64-bit key would see a few expected collisions at
    10¹⁰ docs, and a collision here MERGES groups — the merged intra pair
    carries est_jaccard = 1.0 (unfilterable) and star mode would drop the
    absorbed member's genuine edges; at 128 bits the collision probability
    across 10²⁰ pairs is ~10⁻¹⁹, i.e. zero in any feasible corpus.
    """
    if pair_mode not in ("all", "star"):
        raise ValueError(f"pair_mode must be 'all' or 'star', got {pair_mode!r}")
    rows = num_perm // bands
    sig_udf = minhash_signature_udf(num_perm, seed)
    sigs = df.select(
        F.col(id_col).alias("id"),
        sig_udf(shingle_hashes(F.col(text_col), shingle_k)).alias("sig"),
    )
    sig_str = F.concat_ws(
        ",", F.transform(F.col("sig"), lambda v: v.cast("string"))
    )
    skey = F.struct(
        F.xxhash64(sig_str).alias("h1"),
        F.xxhash64(F.lit("minhash-skey-2"), sig_str).alias("h2"),
    )
    # ONE shuffle keyed by the signature hash; the banded, membership and
    # estimate branches all hang off this aggregate, so their canonical
    # Exchanges are identical and ReuseExchange computes the shingle+sig
    # chain once per job even unmaterialized.
    groups = (
        sigs.withColumn("skey", skey)
        .groupBy("skey")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"), F.first("sig").alias("sig"))
    )
    if cached is not None:
        groups = groups.persist()
        cached.append(groups)
    # band bucketing over DISTINCT signatures — a K-doc identical-signature
    # cluster is ONE row per band here, not K
    banded = groups.select(
        "skey", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bh")
    ).select("skey", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.collect_set("skey").alias("ks"))
        .filter(F.size("ks") >= 2)
    )
    n = F.size("ks")
    kpair_structs = F.flatten(
        F.transform(
            "ks",
            lambda x, i: F.transform(
                F.slice("ks", i + F.lit(2), n - i - 1),
                lambda y: F.struct(
                    F.least(x, y).alias("k_a"), F.greatest(x, y).alias("k_b")
                ),
            ),
        )
    )
    kpairs = (
        buckets.select(F.explode(kpair_structs).alias("p"))
        .select(F.col("p.k_a").alias("k_a"), F.col("p.k_b").alias("k_b"))
        .dropDuplicates(["k_a", "k_b"])
    )
    if attach_estimate:
        with_sigs = kpairs.join(
            groups.select(F.col("skey").alias("k_a"), F.col("sig").alias("sig_a")), "k_a"
        ).join(groups.select(F.col("skey").alias("k_b"), F.col("sig").alias("sig_b")), "k_b")
        agree = F.aggregate(
            F.zip_with(
                F.col("sig_a"), F.col("sig_b"), lambda x, y: F.when(x == y, 1).otherwise(0)
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        kpairs = with_sigs.withColumn(
            "est_jaccard", agree / F.lit(float(num_perm))
        ).select("k_a", "k_b", "est_jaccard")
    extra = ["est_jaccard"] if attach_estimate else []
    # membership expansion — cost = output cardinality; in star mode only
    # each group's representative carries cross-signature edges (members
    # reach it via the intra star, so components are preserved)
    if pair_mode == "star":
        member = groups.select("skey", F.element_at("ids", 1).alias("id"))
    else:
        member = groups.select("skey", F.explode("ids").alias("id"))
    a = member.select(F.col("skey").alias("k_a"), F.col("id").alias("ia"))
    b = member.select(F.col("skey").alias("k_b"), F.col("id").alias("ib"))
    cross = (
        kpairs.join(a, "k_a")
        .join(b, "k_b")
        .select(
            F.least("ia", "ib").alias("id_a"), F.greatest("ia", "ib").alias("id_b"), *extra
        )
    )
    # identical-signature docs: agreement is num_perm/num_perm = 1.0 by
    # construction, no join-back needed
    m = F.size("ids")
    if pair_mode == "star":
        intra_structs = F.transform(
            F.slice("ids", 2, m - 1),
            lambda y: F.struct(F.element_at("ids", 1).alias("id_a"), y.alias("id_b")),
        )
    else:
        intra_structs = F.flatten(
            F.transform(
                "ids",
                lambda x, i: F.transform(
                    F.slice("ids", i + F.lit(2), m - i - 1),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
    intra = (
        groups.filter(m >= 2)
        .select(F.explode(intra_structs).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            *([F.lit(1.0).alias("est_jaccard")] if attach_estimate else []),
        )
    )
    return cross.unionByName(intra)


def _minhash_feature_udf(num_perm: int, bands: int, shingle_k: int, seed: int):
    """pandas UDF: array<long> token hashes → struct(h1, h2, bands, sh).

    The entire per-document MinHash feature set in ONE Python pass:

    - ``sh``: the distinct shingle-hash set (rolling splitmix64 fold over
      each ``shingle_k``-token window of xxhash64 token hashes; documents
      with fewer than k tokens collapse to a single whole-doc fold, the
      same semantics as :func:`word_shingles`'s short-doc branch). Used
      downstream for the EXACT set-Jaccard verify (array_intersect) —
      Jaccard over the distinct hash set equals Jaccard over the distinct
      shingle-string set except under 64-bit hash collisions
      (~1e-16/pair; the oracle gate verifies equality empirically).
    - the MinHash signature (same universal-hash family as
      :func:`minhash_signature_udf`, Mersenne-61 reduction done with
      shift/add — bit-identical to ``% (2^61-1)``) — consumed internally:
    - ``bands``: per-band rolling-fold hashes of the signature (the LSH
      bucket keys), and
    - ``h1``/``h2``: two independent folds of the full signature — the
      128-bit group key (same birthday-collision argument as
      :func:`minhash_candidate_pairs`'s ``skey``).

    Everything after the per-row shingle fold is vectorized ACROSS the
    Arrow batch (signature matrix folds), so per-row Python overhead is
    one small numpy pass; the JVM never sees the 1 KB signature at all —
    only 16 bytes of key + ``bands`` longs + the shingle set cross the
    boundary, which is also exactly what the group-by shuffle ships.

    A ``None`` token array (null text) yields null features: no bands
    (never bucketed), null ``sh`` (null Jaccard → filtered) — matching
    the legacy pipeline, where null texts produce no shingle rows and
    therefore no verified pairs.
    """
    a, b = _minhash_params(num_perm, seed)
    rows = num_perm // bands
    k = shingle_k

    def _shingles_of(th: np.ndarray) -> np.ndarray:
        n = len(th)
        if n >= k:
            x = np.full(n - k + 1, _MIX_GAMMA, dtype=np.uint64)
            for j in range(k):
                x = _mix_fold(x, th[j : n - k + 1 + j])
            return _mix_finalize(x)
        x = np.full(1, _MIX_GAMMA, dtype=np.uint64)
        for j in range(n):
            x = _mix_fold(x, th[j])
        return _mix_finalize(x)

    schema = T.StructType(
        [
            T.StructField("h1", T.LongType()),
            T.StructField("h2", T.LongType()),
            T.StructField("bands", T.ArrayType(T.LongType())),
            T.StructField("sh", T.ArrayType(T.LongType())),
        ]
    )

    @F.pandas_udf(schema)
    def feat(tok_hashes: pd.Series) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            arrs = tok_hashes.to_numpy()
            nr = len(arrs)
            live = np.fromiter((h is not None for h in arrs), dtype=bool, count=nr)
            idx = np.flatnonzero(live)
            shs: list = [None] * nr
            sigs = np.empty((idx.size, num_perm), dtype=np.uint64)
            for j, i in enumerate(idx):
                th = np.asarray(arrs[i], dtype=np.int64).view(np.uint64)
                sh = np.unique(_shingles_of(th))
                vals = a[None, :] * sh[:, None] + b[None, :]
                r = (vals & _MINHASH_PRIME) + (vals >> _S61)
                r -= (r >= _MINHASH_PRIME) * _MINHASH_PRIME
                sigs[j] = r.min(axis=0)
                shs[i] = sh.astype(np.int64)
            # batch-vectorized folds over the signature matrix
            v = sigs.reshape(idx.size, bands, rows)
            bx = np.full((idx.size, bands), _MIX_GAMMA, dtype=np.uint64)
            for j in range(rows):
                bx = _mix_fold(bx, v[:, :, j])
            bnd = _mix_finalize(bx).astype(np.int64)
            k1 = np.full(idx.size, np.uint64(0x51CE1), dtype=np.uint64)
            k2 = np.full(idx.size, np.uint64(0x51CE2), dtype=np.uint64)
            for j in range(num_perm):
                col = sigs[:, j]
                k1 = _mix_fold(k1, col)
                k2 = _mix_fold(k2, col)
            k1 = _mix_finalize(k1).astype(np.int64)
            k2 = _mix_finalize(k2).astype(np.int64)
            h1s = np.zeros(nr, dtype=np.int64)
            h2s = np.zeros(nr, dtype=np.int64)
            h1s[idx] = k1
            h2s[idx] = k2
            bandss: list = [None] * nr
            for j, i in enumerate(idx):
                bandss[i] = bnd[j]
            return pd.DataFrame({"h1": h1s, "h2": h2s, "bands": bandss, "sh": shs})

    return feat


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Fused MinHash LSH candidates + EXACT shingle-set Jaccard verify:
    ``(id_a < id_b, jaccard)`` with ``jaccard ≥ min_jaccard`` — the
    one-pass form of ``minhash_candidate_pairs`` → ``ngram_jaccard_pairs``.

    Plan shape (the whole point — guide §2.4 "remove shuffles outright"):
    the corpus is scanned, tokenized, hashed and signed ONCE; every
    downstream branch (band bucketing, membership expansion, intra-group
    pairs) hangs off a single ``groupBy(h1, h2)`` exchange that carries
    the per-doc distinct shingle-hash sets, so the exact verify is a pair
    of array_intersects on already-carried arrays instead of a second
    corpus-wide shingle explode + window + two joins. Each consumer
    carries a benign reference to EVERY aggregate column (the
    ``size(...) >= 1``/``>= 0`` filters below, all tautologies): column
    pruning would otherwise specialize the aggregate per branch, the
    canonical plans would diverge, and AQE's stage reuse — which is what
    makes the N references cost ONE evaluation — could no longer fire
    (measured 2x on the sf1.0 corpus: divergent 4.18s vs benign 2.49s).

    Skew discipline is inherited from :func:`minhash_candidate_pairs`:
    banding runs over DISTINCT signatures (one row per band per group,
    whatever the group size), in-bucket pairs are generated at
    distinct-signature cardinality, and id-level pairs cost exactly the
    output cardinality. The carried per-group member array is bounded by
    the duplicate-group size, whose verified pair OUTPUT is quadratic
    anyway — the array is never the binding term.

    Exactness: candidates are a probabilistic superset (32x4 banding —
    same miss bound as minhash_candidate_pairs, < 5e-8 per true pair);
    every emitted pair's jaccard is EXACT set-Jaccard over distinct
    shingle hashes, equal to shingle-string Jaccard modulo 64-bit
    collisions (~1e-16/pair). Both are verified against the exact-SQL
    oracle at every shipped SF by the contract gate.
    """
    rows = num_perm // bands
    if bands * rows != num_perm:
        raise ValueError("num_perm must be divisible by bands")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) >= 1
    )
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    udf = _minhash_feature_udf(num_perm, bands, shingle_k, seed)
    feat = df.select(F.col(id_col).alias("id"), udf(tok_hashes).alias("f")).select(
        "id",
        F.col("f.h1").alias("h1"),
        F.col("f.h2").alias("h2"),
        F.col("f.bands").alias("bands"),
        F.col("f.sh").alias("sh"),
    )
    grouped = feat.groupBy("h1", "h2").agg(
        F.sort_array(F.collect_list(F.struct("id", "sh"))).alias("members"),
        F.first("bands").alias("bands"),
    )
    # band bucketing over distinct signatures; benign members reference
    # keeps this branch's aggregate identical to the others (see docstring)
    banded = grouped.filter(F.size("members") >= 1).select(
        "h1", "h2", F.posexplode("bands").alias("band", "bh")
    )
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list(F.struct("h1", "h2"))).alias("ks"))
        .filter(F.size("ks") >= 2)
    )
    n = F.size("ks")
    kpair_structs = F.flatten(
        F.transform(
            "ks",
            lambda x, i: F.transform(
                F.slice("ks", i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("ka"), y.alias("kb")),
            ),
        )
    )
    kpairs = (
        buckets.select(F.explode(kpair_structs).alias("p"))
        .select(F.col("p.ka").alias("ka"), F.col("p.kb").alias("kb"))
        .dropDuplicates(["ka", "kb"])
    )
    member = (
        grouped.filter(F.size("bands") >= 1)
        .select(F.struct("h1", "h2").alias("k"), F.explode("members").alias("m"))
        .select("k", F.col("m.id").alias("id"), F.col("m.sh").alias("sh"))
    )
    am = member.select(
        F.col("k").alias("ka"), F.col("id").alias("ia"), F.col("sh").alias("sha")
    )
    bm = member.select(
        F.col("k").alias("kb"), F.col("id").alias("ib"), F.col("sh").alias("shb")
    )
    cross = (
        kpairs.join(am, "ka")
        .join(bm, "kb")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            F.col("sha").alias("sh_a"),
            F.col("shb").alias("sh_b"),
        )
    )
    m = F.size("members")
    intra_structs = F.flatten(
        F.transform(
            "members",
            lambda x, i: F.transform(
                F.slice("members", i + F.lit(2), m - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    intra = (
        grouped.filter((m >= 2) & (F.size("bands") >= 1))
        .select(F.explode(intra_structs).alias("p"))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a.sh").alias("sh_a"),
            F.col("p.b.sh").alias("sh_b"),
        )
    )
    allp = cross.unionByName(intra)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    na, nb = F.size("sh_a"), F.size("sh_b")
    return (
        allp.withColumn("jaccard", inter / (na + nb - inter))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- SimHash


def simhash_udf(seed: int = 42):
    """pandas UDF: array<long> token HASHES → long 64-bit SimHash.

    Token hashing stays JVM-side (xxhash64 in a higher-order transform);
    the UDF is pure numpy bit-vote math.
    """

    @F.pandas_udf(T.LongType())
    def sim(token_hashes: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)

        def one(hashes) -> int:
            if hashes is None or len(hashes) == 0:
                return 0
            hs = np.asarray(hashes, dtype=np.int64).view(np.uint64)
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            word = np.where(v > 0, np.uint64(1), np.uint64(0)) << shifts
            return int(word.sum(dtype=np.uint64).astype(np.int64))

        return token_hashes.map(one)

    return sim


def md5_hash60_col(c: Column) -> Column:
    """60-bit token hash from the md5 hex prefix: ``conv(substr(md5, 1, 15))``.

    Chosen because the identical value is computable in ANSI-ish SQL on
    other engines (DuckDB: ``CAST('0x' || substr(md5(t),1,15) AS BIGINT)``),
    which makes every simhash built on it cross-engine verifiable. Top 4
    bits are always zero — the simhash degrades to 60 effective bits, which
    the chunk-LSH guarantee below is insensitive to.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int | None = None,
    token_hash: str = "xxhash64",
    cached: list[DataFrame] | None = None,
) -> DataFrame:
    """SimHash near-dups via chunk LSH: split the 64-bit simhash into
    ``n_chunks`` bit-chunks; any pair within Hamming ≤ n_chunks-1 must share
    at least one exact chunk (pigeonhole), so with the default
    ``n_chunks = max_hamming + 1`` recall is EXACT, not probabilistic.
    Candidates are verified with ``bit_count`` so precision is always exact.

    SKEW SAFETY: candidate generation runs over DISTINCT simhashes, not
    docs.  Web corpora concentrate mass on identical hashes (boilerplate
    pages, empty docs); a doc-level chunk self-join would inflate such a
    K-doc group to K²·n_chunks intermediate candidates.  Here the chunk
    join sees each hash once; id pairs are produced afterwards by
    membership joins that cost exactly the output cardinality — identical-
    hash groups pay only for the (hamming 0) pairs they genuinely emit.

    ``token_hash``: 'xxhash64' (default, fastest) or 'md5_60'
    (cross-engine-verifiable — see :func:`md5_hash60_col`).
    ``cached``: the (id, simhash) table — 2 longs/doc — is referenced by
    the distinct, expansion, and intra-group branches; pass a list to
    persist it for the duration (caller owns the lifetime, same contract
    as :func:`minhash_candidate_pairs`).  Without it each branch re-runs
    the tokenize+simhash chain.
    """
    if n_chunks is None:
        n_chunks = max_hamming + 1
    if n_chunks < max_hamming + 1:
        raise ValueError(
            f"n_chunks={n_chunks} < max_hamming+1={max_hamming + 1}: chunk-LSH "
            "recall would be probabilistic, not guaranteed"
        )
    if n_chunks > 64:
        raise ValueError("n_chunks > 64")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) >= 1)
    hash_fn = {"xxhash64": F.xxhash64, "md5_60": md5_hash60_col}[token_hash]
    tok_hashes = F.transform(toks, lambda t: hash_fn(t))
    sims = df.select(F.col(id_col).alias("id"), simhash_udf()(tok_hashes).alias("simhash"))
    # ONE shuffle keyed by simhash; every downstream branch (distinct
    # hashes, membership expansion, intra-group pairs) hangs off this same
    # aggregate, so their canonical Exchanges are identical and Spark's
    # ReuseExchange computes the tokenize+simhash chain ONCE per job even
    # unmaterialized.  ``ids`` is one array per DISTINCT hash — bounded by
    # the duplicate-group size, whose pair OUTPUT is quadratic anyway long
    # before the array is a memory problem.
    groups = sims.groupBy("simhash").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    if cached is not None:
        groups = groups.persist()
        cached.append(groups)
    # chunk i covers bits [bounds[i], bounds[i+1]); widths differ by ≤1 bit
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]

    def chunk_val(i: int) -> Column:
        width = bounds[i + 1] - bounds[i]
        shifted = F.shiftright(F.col("simhash"), bounds[i])
        if width >= 64:  # n_chunks == 1: the whole word is the chunk
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    # Round 6 restructure (see OPTIMIZATION_r06.md): candidate generation is
    # a chunk-keyed AGGREGATE with the pair explode (and the hamming filter)
    # inside the bucket array, not a chunk self-join. Two measured reasons:
    # (a) a self-join's two sides each re-evaluate the tokenize+simhash+
    #     group chain — AQE stage reuse, which does collapse same-pruning
    #     UNION branches, does not fire across self-join sides (measured
    #     0.7s from a materialized input vs 5.2s live at sf1.0);
    # (b) hot chunk values (templated corpora) made the join emit 21.5M
    #     intermediate pairs for 50k true ones; filtering by hamming INSIDE
    #     the in-bucket pair lambda materializes only survivors as rows.
    # The bucket aggregate also CARRIES each distinct hash's id array, so
    # membership expansion is a local explode instead of two joins, and the
    # aggregate's two consumers (buckets, intra) reference the same columns
    # (simhash, ids) — identical canonical plans, stage reuse applies.
    chunks = groups.select(
        "simhash",
        "ids",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("chunk"), chunk_val(i).alias("val"))
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("simhash", "ids", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    buckets = (
        chunks.groupBy("chunk", "val")
        .agg(F.sort_array(F.collect_list(F.struct("simhash", "ids"))).alias("ks"))
        .filter(F.size("ks") >= 2)
    )
    nk = F.size("ks")
    # ks is sorted by simhash asc (distinct within a bucket), so pairing
    # each element with its successors yields each unordered pair once with
    # sh_a < sh_b; the hamming predicate prunes inside the lambda
    pair_structs = F.flatten(
        F.transform(
            "ks",
            lambda x, i: F.transform(
                F.filter(
                    F.slice("ks", i + F.lit(2), nk - i - 1),
                    lambda y: F.bit_count(
                        x["simhash"].bitwiseXOR(y["simhash"])
                    ) <= max_hamming,
                ),
                lambda y: F.struct(
                    x["simhash"].alias("sh_a"),
                    y["simhash"].alias("sh_b"),
                    x["ids"].alias("ids_a"),
                    y["ids"].alias("ids_b"),
                ),
            ),
        )
    )
    sh_pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.sh_a", "p.sh_b", "p.ids_a", "p.ids_b")
        .dropDuplicates(["sh_a", "sh_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
    )
    # expand surviving distinct-hash pairs to id pairs by exploding the
    # CARRIED id arrays (sh_a < sh_b, so each unordered id pair appears
    # exactly once; least/greatest restores the id_a < id_b convention)
    cross = (
        sh_pairs.select(F.explode("ids_a").alias("ia"), "ids_b", "hamming")
        .select("ia", F.explode("ids_b").alias("ib"), "hamming")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
    )
    # identical-simhash docs are Hamming-0 near-dups by definition: emit
    # in-group combinations from the sorted ids array (same pattern as
    # minhash's in-bucket pair gen) — costs exactly the emitted pairs
    n = F.size("ids")
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    intra = (
        groups.filter(n >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


# --------------------------------------------------- language ID / quality

EN_STOPWORDS = (
    "the of and to in a is that for it as was with be by on not he i this are "
    "or his from at which but have an had they you were their one all we can"
).split()

VI_CHARS = "ăâđêôơưáàảãạắằẳẵặấầẩẫậéèẻẽẹếềểễệíìỉĩịóòỏõọốồổỗộớờởỡợúùủũụứừửữựýỳỷỹỵ"


def lang_id_col(text: Column) -> Column:
    """Heuristic language ID (expression-only): Vietnamese diacritic density
    vs English stopword hit-rate; falls back to 'other'."""
    lower = F.lower(text)
    n_chars = F.greatest(F.length(lower), F.lit(1))
    vi_hits = n_chars - F.length(F.translate(lower, VI_CHARS, ""))
    toks = F.filter(F.split(lower, r"\s+"), lambda t: F.length(t) >= 1)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    en_hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return (
        F.when((vi_hits / n_chars) > 0.01, F.lit("vi"))
        .when((en_hits / n_toks) > 0.08, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score (expression-only): penalizes extreme
    length, high punctuation/digit density, one-char tokens — the classic
    pre-training corpus filters, cf. C4's min-token-length rule.

    score = 0.25*min(n,200)/200 + 0.25*(1 - min(4p/n, 1))
          + 0.20*(1 - min(4d/n, 1)) + 0.15*(1 - s/nt)
          + 0.15*min(n/(8*nt), 1)
    with n = max(len, 1) chars, nt = max(tokens, 1), p punct chars,
    d digit chars, s one-char tokens.

    Evaluated in EXACT integer arithmetic: the score is the rational
    P / (800*n*nt) and the 6-decimal half-up rounding is an integral
    division, so the emitted double is bit-identical across engines at
    any SF. Rounding the float directly is engine-dependent at
    x.xxxxxx5 boundaries (Spark rounds the exact BigDecimal expansion;
    DuckDB rounds x*1e6 in float) — the round-3 "6-row ulp artifact".
    decimal(38,0) (HUGEINT on the oracle side) keeps 2e6*P exact for
    documents far beyond int64's ~95k-char limit."""
    DEC = "decimal(38,0)"
    lower = F.lower(text)
    n = F.greatest(F.length(lower), F.lit(1)).cast(DEC)
    toks = F.filter(F.split(lower, r"\s+"), lambda t: F.length(t) >= 1)
    nt = F.greatest(F.size(toks), F.lit(1)).cast(DEC)
    p = n - F.length(F.regexp_replace(lower, r"[^\w\s]", "")).cast(DEC)
    d = n - F.length(F.regexp_replace(lower, r"[0-9]", "")).cast(DEC)
    s = F.size(F.filter(toks, lambda t: F.length(t) < 2)).cast(DEC)

    def dec(v: int) -> Column:
        return F.lit(v).cast(DEC)

    num = (
        F.least(n, dec(200)) * n * nt
        + dec(200) * nt * (n - F.least(dec(4) * p, n))
        + dec(160) * nt * (n - F.least(dec(4) * d, n))
        + dec(120) * n * (nt - s)
        + dec(15) * n * F.least(n, dec(8) * nt)
    )
    den = dec(800) * n * nt
    # round-half-up(num/den, 6) == floor((2e6*num + den) / (2*den)); the
    # subtract-pmod form keeps the decimal division itself exact-integer.
    a = dec(2_000_000) * num + den
    b = dec(2) * den
    score6 = ((a - F.pmod(a, b)) / b).cast("long")
    return score6.cast("double") / F.lit(1000000.0)


TOKEN_REGEX = r"[A-Za-zÀ-ỹ]+|[0-9]+|[^\sA-Za-zÀ-ỹ0-9]"


def _bpe_token_count_udf():
    """pandas UDF: text → count of TOKEN_REGEX matches, computed as
    vectorized codepoint-class math instead of a Java regex scan.

    The regex ``[A-Za-zÀ-ỹ]+|[0-9]+|[^\\sA-Za-zÀ-ỹ0-9]`` consumes, at
    each position, a maximal letter run, else a maximal digit run, else
    one non-space char (whitespace is skipped), so its match count is
    exactly (# letter runs) + (# digit runs) + (# other non-space chars).
    Each class is a codepoint-range test (À-ỹ is the contiguous block
    U+00C0..U+1EF9; Java ``\\s`` is the ASCII set {9..13, 32}; astral
    chars are single codepoints on both sides), evaluated over the
    UTF-32 view of each string — ~8 numpy ops per row vs a per-char
    alternation scan; measured 3.5x on the sf1.0 corpus. Equality with
    the regex form is property-tested (tests/test_textops.py)."""

    def count_one(s):
        if s is None:
            return None  # size(regexp_extract_all(NULL, ...)) is NULL
        c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        if c.size == 0:
            return 0
        letter = (
            ((c >= 65) & (c <= 90))
            | ((c >= 97) & (c <= 122))
            | ((c >= 0xC0) & (c <= 0x1EF9))
        )
        digit = (c >= 48) & (c <= 57)
        space = (c == 32) | ((c >= 9) & (c <= 13))
        other = ~(letter | digit | space)
        lruns = int(letter[0]) + int((letter[1:] & ~letter[:-1]).sum())
        druns = int(digit[0]) + int((digit[1:] & ~digit[:-1]).sum())
        return lruns + druns + int(other.sum())

    @F.pandas_udf(T.IntegerType())
    def bpe_count(text: pd.Series) -> pd.Series:
        return pd.Series(
            [count_one(s) for s in text], index=text.index, dtype="Int32"
        )

    return bpe_count


_BPE_COUNT_UDF = None


def token_count_col(text: Column, mode: str = "whitespace") -> Column:
    """Token counting: whitespace or BPE-ish regex segmentation (the
    latter as an equivalent vectorized codepoint scan — see
    :func:`_bpe_token_count_udf`)."""
    if mode == "whitespace":
        return F.size(F.filter(F.split(text, r"\s+"), lambda t: F.length(t) >= 1))
    if mode == "bpe":
        global _BPE_COUNT_UDF
        if _BPE_COUNT_UDF is None:
            _BPE_COUNT_UDF = _bpe_token_count_udf()
        return _BPE_COUNT_UDF(text)
    raise ValueError(mode)


# ---------------------------------------------------------- fingerprinting


def fingerprint_udf(window: int = 8, k: int = 16, scheme: str = "poly31"):
    """pandas UDF: text → array<long> winnowed rolling-hash fingerprint.

    Rabin-Karp-style hash over k-char grams, then winnowing (min hash per
    sliding window of ``window`` hashes, deduplicated, sorted) — the
    standard local-fingerprint scheme for copy detection, numpy-vectorized.

    Schemes:
    - 'poly31' (default): Horner polynomial over CODEPOINTS, base 257
      mod 2^31-1 — every step fits int64, and the identical value is
      computable in SQL on other engines (DuckDB ``list_reduce`` over
      ``unicode()`` codepoints), making the operator oracle-verifiable.
    - 'bytes64': wrapping uint64 polynomial over UTF-8 BYTES — the wider
      hash space (negligible collisions at corpus scale), not
      SQL-reproducible.
    """
    if scheme not in ("poly31", "bytes64"):
        raise ValueError(scheme)

    def kgram_hashes(text: str) -> np.ndarray | None:
        if scheme == "poly31":
            cp = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            m = len(cp) - k + 1
            if m <= 0:
                return None
            acc = np.zeros(m, dtype=np.int64)
            for j in range(k):  # k vectorized Horner steps, max value < 2^40
                acc = (acc * 257 + cp[j : j + m]) % 2147483647
            return acc
        data = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
        m = len(data) - k + 1
        if m <= 0:
            return None
        powers = np.array([pow(257, k - 1 - i, 1 << 64) for i in range(k)], dtype=np.uint64)
        idx = np.arange(m)[:, None] + np.arange(k)[None, :]
        return (
            (data[idx].astype(np.uint64) * powers[None, :]).sum(axis=1)
        ).astype(np.int64)

    def one(text: str | None):
        if not text:
            return []
        hashes = kgram_hashes(text)
        if hashes is None:
            return []
        m = len(hashes)
        if m <= window:
            return hashes.min(keepdims=True)
        w_idx = np.arange(m - window + 1)[:, None] + np.arange(window)[None, :]
        mins = hashes[w_idx].min(axis=1)
        # np.unique == sorted(set(...)) — C-speed, same array contract
        return np.unique(mins)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp(text: pd.Series) -> pd.Series:
        return text.map(one)

    return fp


def repetition_stats_col(text: Column) -> tuple[Column, Column]:
    """Within-document repetition signals (expression-only):

    - type_token_ratio: distinct tokens / total tokens (low = repetitive)
    - dup_bigram_ratio: 1 - distinct bigrams / total bigrams (high = the
      boilerplate/listing pages pre-training filters drop, cf. Gopher's
      repetition rules)

    Returns the two columns; exact integer-ratio arithmetic so an
    independent SQL engine reproduces the values bit-for-bit.
    """
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) >= 1)
    n = F.size(toks)
    ttr = F.when(n <= 0, F.lit(1.0)).otherwise(
        F.size(F.array_distinct(toks)) / n
    )
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        )
    )
    nb = F.size(bigrams)
    dup = F.when(nb <= 0, F.lit(0.0)).otherwise(
        1 - F.size(F.array_distinct(bigrams)) / nb
    )
    return F.round(ttr, 6), F.round(dup, 6)


def rare_term_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document top-k rarity-weighted terms (TF-IDF-family keyword
    extraction, the term-weighting step behind topic filtering and quality
    weighting in web-corpus pipelines).

    score = tf / (df + 1) where tf is the term's in-document count and df
    its corpus document frequency — the same monotone ranking as
    tf·idf with an add-one-smoothed idf, but a pure-IEEE rational (one
    integer division, no transcendental log), so an independent SQL engine
    reproduces every score bit-for-bit.

    Plan shape at 100 TB: one explode, two hash aggregations with map-side
    partial combine (per-doc tf, then per-term df over the already-distinct
    (doc, term) pairs — df never rescans the corpus), a broadcast join on
    the vocabulary table (post-tokenization vocabularies are tens of
    millions of terms vs billions of documents; set broadcast_vocab=False
    to shuffle-join a pathological vocabulary), and one per-doc top-k
    window over ≤ vocabulary-sized groups. Ties break on the term string,
    so the result is deterministic at any parallelism.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) >= 1)
    tf = (
        df.select(id_col, F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("score", F.col("tf") / (F.col("df") + F.lit(1.0)))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 30,
    id_type: str = "long",
) -> DataFrame:
    """Connected components over near-dup candidate pairs: the step that
    turns pairwise dedup output into CLUSTERS so a pipeline can pick one
    survivor per group (min-id convention). Hash-min label propagation
    (the MapReduce-CC baseline of Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): every vertex starts labelled with its
    own id and repeatedly takes the min label over its neighborhood.

    Returns (v, label) with label = min vertex id in v's component —
    deterministic at any parallelism, so an independent engine reproduces
    it exactly (the DuckDB oracle is a recursive reachability CTE).

    Scale shape: each round is one hash join edge⋈label + one map-side-
    combined min aggregate — the edge list is shuffled per round, the
    label table stays keyed by vertex; rounds = component diameter
    (near-dup clusters are shallow: dozens of docs, diameter ≤ a few).
    Labels are eagerly localCheckpoint'ed per round to cut the iterative
    lineage (the standard Spark idiom for driver-looped fixpoints); the
    convergence probe is a count, not a collect. Raises after
    ``max_iters`` rounds rather than looping forever on bad input.
    """
    # id_type: any orderable Spark type — "long" for doc ids, "string"
    # for host names (hash-min degenerates to lexicographic-min labels)
    a, b = F.col(id_a).cast(id_type), F.col(id_b).cast(id_type)
    und = (
        edges.select(a.alias("src"), b.alias("dst"))
        .union(edges.select(b.alias("src"), a.alias("dst")))
        .distinct()
        .persist()
    )
    labels = und.select(F.col("src").alias("v")).distinct().withColumn(
        "label", F.col("v")
    ).localCheckpoint()
    try:
        for _ in range(max_iters):
            prop = und.join(
                labels.withColumnRenamed("v", "src"), "src"
            ).select(F.col("dst").alias("v"), "label")
            new = (
                labels.unionByName(prop)
                .groupBy("v")
                .agg(F.min("label").alias("label"))
                .localCheckpoint()
            )
            changed = (
                new.join(labels.withColumnRenamed("label", "_old"), "v")
                .filter(F.col("label") < F.col("_old"))
                .count()
            )
            labels = new
            if changed == 0:
                return labels
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")
    finally:
        und.unpersist()


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any k-word
    shingle with an evaluation set (the overlap filter pre-training
    pipelines run so eval questions don't leak into training data —
    GPT-3 App. C / Dolma use 13-grams; k is a parameter here).

    Returns (id_col, n_hit_shingles) for contaminated docs only:
    n_hit_shingles = how many DISTINCT shingles of the doc occur anywhere
    in the eval set (severity signal for threshold tuning).

    Scale shape: the eval side is distinct-shingled and broadcast (eval
    sets are benchmark-sized — thousands of docs — vs a billion-doc
    corpus); the corpus side is one explode + broadcast semi-join +
    map-side-combined count. No corpus-side shuffle except the final
    per-doc count of hits (output-sized). A pathological eval set can
    shuffle-join instead by passing it pre-distincted; the plan degrades
    to one hash join keyed on the shingle.
    """
    ev = eval_set.select(
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("sh")
    ).distinct()
    hits = (
        corpus.select(
            id_col,
            F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("sh"),
        )
        .join(F.broadcast(ev), "sh")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hit_shingles"))
    )
    return hits


# ------------------------------------------------------------- PII scrub

# Deliberately simple, cross-dialect patterns (valid and identical in Java
# regex and RE2/DuckDB): no backreferences, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,3}(-\d{2,4}){2,4}"


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PII redaction (expression-only): mask emails, IPv4 addresses and
    international phone numbers with typed placeholders and report per-doc
    counts — the scrub step every public web-text pipeline runs before
    training (Dolma masks exactly these three classes; C4 drops pages on
    a badwords list the same way).

    Returns (id_col, scrubbed, n_emails, n_ipv4, n_phones). Counts are
    measured on the ORIGINAL text; masking applies email -> ipv4 -> phone
    in that order (emails may contain digits, so they are removed before
    the numeric patterns run).

    Scale shape: pure narrow `regexp_replace`/`regexp_extract_all`
    expressions inside whole-stage codegen — no UDF, no shuffle, no
    Python. At 100 TB this is a map-only pass that pushes through the
    scan; generalizes the reference's per-row regex normalization
    (/root/reference/crawler/stores/bhx.py:59-97) to redaction.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).cast("long")
    n_ipv4 = F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), 0)).cast("long")
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0)).cast("long")
    scrubbed = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")
    return df.select(
        id_col,
        scrubbed.alias("scrubbed"),
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
    )


# ------------------------------------------------- paragraph-level dedup


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (the Dolma paragraph
    filter): split every document on `sep`, and for each distinct
    paragraph keep only its FIRST occurrence — ordered by (id, position)
    — marking every other copy as a drop. Kills boilerplate (nav bars,
    cookie banners, license blurbs) that document-level dedup can't see.

    Returns one row per paragraph: (id_col, pos, paragraph, keep).

    Scale shape: winners are computed with a partial-aggregating
    `groupBy(hash).agg(min(struct(id, pos)))` — map-side combine collapses
    a boilerplate paragraph repeated a billion times to one candidate per
    task BEFORE the shuffle, so hot paragraphs cost nothing extra (the
    skew-safety a window `row_number() OVER (PARTITION BY hash)` cannot
    give: a window must sort the full mega-group on one task). The
    winners join back on the 64-bit hash; AQE skew-join splits any hot
    probe side. Dedup identity is xxhash64(paragraph) — at 100 TB you
    dedup on the hash, never on the string (collision odds at 2^64 are
    dwarfed by data corruption rates).
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "paragraph"),
    ).filter(F.length(F.trim(F.col("paragraph"))) > 0)
    paras = paras.withColumn("h", F.xxhash64("paragraph"))
    winners = paras.groupBy("h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("w")
    )
    return (
        paras.join(winners, "h")
        .select(
            id_col,
            "pos",
            "paragraph",
            (
                (F.col(id_col) == F.col("w.i")) & (F.col("pos") == F.col("w.p"))
            ).alias("keep"),
        )
    )


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "host",
    sep: str = "\n",
    min_docs: int = 3,
) -> DataFrame:
    """Per-host boilerplate removal — the CCNet/jusText signal that
    document-level AND corpus-level paragraph dedup both miss: a nav bar,
    cookie banner, or footer repeats across *most pages of its own site*
    but is unique to that site, so corpus-wide first-occurrence dedup
    keeps one copy per crawl while every page of the host still carries
    it into training data.  Rule: a paragraph is boilerplate on host H if
    it occurs in >= ``min_docs`` DISTINCT documents of H; strip all its
    occurrences there (no first-copy exemption — boilerplate is noise,
    not content).

    Returns (id_col, host_col, n_chunks, n_boiler, clean_text) with
    ``clean_text`` the surviving paragraphs rejoined in document order
    ('' if everything was boilerplate).

    Scale shape: doc-frequency is a two-level aggregate — distinct
    (host, hash, doc) with map-side combine collapses a banner repeated
    on a million pages to one row per task per doc, then a second
    partial-agg count; never a count-distinct over raw occurrences and
    never a window.  The boilerplate set per host is tiny (it IS the
    template), so the join back is AQE-broadcastable; reassembly sorts
    each doc's own chunks only (array_sort over a per-doc list, no
    cross-doc sort).  Dedup identity is xxhash64(paragraph) — the oracle
    counts the strings themselves, so a collision would surface as a
    mismatch.
    """
    paras = (
        df.select(
            F.col(id_col),
            F.col(host_col).alias("__host"),
            F.posexplode(F.split(F.col(text_col), sep)).alias(
                "pos", "paragraph"
            ),
        )
        .filter(F.length(F.trim(F.col("paragraph"))) > 0)
        .withColumn("h", F.xxhash64("paragraph"))
    )
    docfreq = (
        paras.select("__host", "h", id_col)
        .distinct()
        .groupBy("__host", "h")
        .agg(F.count("*").cast("long").alias("df_docs"))
    )
    marked = paras.join(docfreq, ["__host", "h"]).withColumn(
        "boiler", F.col("df_docs") >= min_docs
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("boiler"),
                F.struct(F.col("pos").alias("p"), F.col("paragraph").alias("t")),
            )
        )
    )
    return (
        marked.groupBy(id_col, "__host")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.col("boiler").cast("long")).alias("n_boiler"),
            F.array_join(
                F.transform(kept, lambda s: s["t"]), sep
            ).alias("clean_text"),
        )
        .withColumnRenamed("__host", host_col)
    )


# ------------------------------------------------- encoding repair


def _as_cp1252_mojibake(ch: str) -> str:
    """How `ch` renders after the classic corruption: its UTF-8 bytes
    decoded as Windows-1252 (bytes undefined in cp1252 — 0x81 0x8D 0x8F
    0x90 0x9D — pass through as their Latin-1 control codepoints, the
    lenient behavior of real-world decoders and of ftfy's
    "sloppy-windows-1252")."""
    out = []
    for b in ch.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# Characters repaired by fix_mojibake, in the order the replace chain
# runs. All start with â/Ã/Â after corruption (UTF-8 lead bytes 0xE2,
# 0xC3, 0xC2 decoded as cp1252), so no rule's input overlaps another
# rule's output and chain order across groups is immaterial.
MOJIBAKE_CHARS: tuple[str, ...] = (
    "‘", "’", "“", "”",  # curly quotes
    "–", "—", "…",            # dashes, ellipsis
    "é", "è", "á", "ó", "ú", "í", "ï", "ñ", "ü", "ö", "ä", "ç",
    "°", "«", "»", " ",                 # symbols, nbsp
)

MOJIBAKE_PAIRS: tuple[tuple[str, str], ...] = tuple(
    (_as_cp1252_mojibake(ch), ch) for ch in MOJIBAKE_CHARS
)


def fix_mojibake_col(text: Column) -> Column:
    """Repair UTF-8-decoded-as-Windows-1252 mojibake ("â€™" -> "'",
    "Ã©" -> "é", …) — the ftfy-style encoding-fix pass web-text pipelines
    run before any tokenization (crawled pages routinely declare the
    wrong charset). Expression-only: a chain of literal `replace`s over
    the curated table above, fully inside whole-stage codegen — no UDF,
    and exactly mirrorable as SQL `replace()` calls so an independent
    engine reproduces it byte-for-byte. The table covers the dominant
    3-byte punctuation family (U+2013..U+2026) and the Latin-1
    supplement letters most frequent in web corpora; it deliberately does
    NOT attempt statistical re-decoding (that needs bytes, not text, and
    belongs at ingestion)."""
    out = text
    for broken, fixed in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(broken), F.lit(fixed))
    return out


def fix_mojibake(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply `fix_mojibake_col` and report per-doc repair evidence:
    (id_col, fixed, was_mojibake, n_chars_removed). Every repair strictly
    shortens the text (each mojibake sequence is 2-3 chars for a 1-char
    original), so `n_chars_removed` counts repaired bytes-worth and
    `was_mojibake` flags any change. Map-only; pushes through the scan
    at any scale."""
    t = F.col(text_col)
    fixed = fix_mojibake_col(t)
    return df.select(
        id_col,
        fixed.alias("fixed"),
        (F.length(t) != F.length(fixed)).alias("was_mojibake"),
        (F.length(t) - F.length(fixed)).cast("long").alias("n_chars_removed"),
    )


# ------------------------------------------------- C4-style line cleaning


#: A line survives the C4 line filter only if it ends in one of these
#: (after right-trimming spaces) — period, bang, question mark, straight
#: or curly closing quote (Raffel et al. 2020, §2.2 "we only retained
#: lines that ended in a terminal punctuation mark").
C4_TERMINAL_RE = '[.!?"”]$'


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
) -> DataFrame:
    """The C4 line-level cleaning pass (Raffel et al. 2020, public):
    split the document on newlines and keep only lines that (a) end in a
    terminal punctuation mark, (b) contain at least ``min_words``
    whitespace words, and (c) do not mention "javascript"; also surface
    the two C4 page-level drop signals — "lorem ipsum" and a curly
    brace — as boolean flags so the caller applies page policy
    downstream. Output: (id_col, cleaned, n_lines, n_kept, has_lorem,
    has_brace).

    Entirely expression-level (`split` + higher-order `filter` +
    `array_join`), so the whole pass runs inside whole-stage codegen with
    no UDF and pushes through the parquet scan at any scale — and it is
    exactly mirrorable in ANSI-ish SQL (list_filter/regexp), which is how
    the oracle checks it byte-for-byte."""
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def _keep(l):  # noqa: E741  (l = line, conventional here)
        words = F.filter(
            F.split(F.trim(l), r"\s+"), lambda w: F.length(w) >= 1
        )
        return (
            F.regexp_like(F.rtrim(l), F.lit(C4_TERMINAL_RE))
            & (F.size(words) >= min_words)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    kept = F.filter(lines, _keep)
    return df.select(
        id_col,
        F.array_join(kept, "\n").alias("cleaned"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.contains(F.lower(t), F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains(t, F.lit("{")).alias("has_brace"),
    )


# ------------------------------------------------- exact-substring dedup


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", ExactSubstr): find every
    maximal token span whose k-token windows ALL occur elsewhere in the
    corpus, keeping the first occurrence — the spans are the deletion
    plan a curation pipeline cuts out of the training text. Lee et al.
    build a corpus-wide suffix array; the standard distributed
    formulation (used by the Dolma and RedPajama dedup passes) slides a
    k-token window, hashes each window, and marks every non-first
    occurrence of a repeated window, then merges overlapping marked
    windows into maximal spans.

    Returns one row per duplicated span:
    (id_col, span_start, span_end, n_windows) — token positions, 0-based,
    end-exclusive; n_windows = number of k-gram windows merged into it.

    Scale shape, stage by stage:
    * window hashing is expression-only (`transform` over a `sequence`
      of start offsets; `xxhash64(array_join(slice(...)))`) inside
      whole-stage codegen — the only shuffled representation of a window
      is its 8-byte hash plus (id, start): ~24 bytes/row at any corpus
      size, never the gram text;
    * first-occurrence winners come from a partial-aggregating
      `groupBy(h).agg(min(struct(id, start)), count)` — map-side combine
      collapses a boilerplate window repeated a billion times before the
      shuffle (same skew-safety argument as `paragraph_dedup`; a window
      function would sort the mega-group on one task);
    * the join back on the hash is AQE-skew-splittable;
    * span merge (gaps-and-islands) windows only per document, bounded
      by document length, never corpus-wide.

    Dedup identity is the 64-bit window hash: at 100 TB you dedup on the
    hash, never on the string (the oracle groups on the gram text itself,
    so a collision would surface as a hash mismatch in the gate).
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) >= 1
    )
    n = F.size(toks)
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    window_hashes = F.transform(
        starts,
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, k), " ")),
    )
    grams = df.select(
        F.col(id_col),
        F.posexplode(window_hashes).alias("start", "h"),
    )
    winners = grams.groupBy("h").agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("start").alias("p"))
        ).alias("w"),
        F.count("*").alias("c"),
    )
    dups = (
        grams.join(winners, "h")
        .filter(
            (F.col("c") > 1)
            & ~(
                (F.col(id_col) == F.col("w.i"))
                & (F.col("start") == F.col("w.p"))
            )
        )
        .select(id_col, "start", (F.col("start") + k).alias("e"))
    )
    by_doc = Window.partitionBy(id_col).orderBy("start")
    prev_max_e = F.max("e").over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dups.withColumn(
        "brk",
        F.when(F.col("start") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("brk").over(by_doc))
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("start").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .drop("island")
    )


# ------------------------------------------------- DSIR target affinity


def dsir_affinity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
    n_buckets: int = 1024,
) -> DataFrame:
    """Data-selection scoring with hashed n-gram features, after DSIR
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling", public): featurize every document into hashed unigram+
    bigram buckets, estimate per-bucket occurrence counts for a small
    in-domain TARGET subset and for the RAW corpus, and score each
    document by how target-like its features are. Pipelines rank or
    sample by the score to pick pretraining data that matches a target
    domain.

    This variant keeps the paper's featurization (hashed n-grams, here
    60-bit md5 prefix mod ``n_buckets``) but scores with the pure-integer
    affinity ratio

        affinity = sum_f (target_count[b(f)] + 1)
                 / sum_f (raw_count[b(f)]    + 1)

    summed over the document's feature OCCURRENCES — both sums are exact
    int64 arithmetic, so an independent engine reproduces every score
    bit-for-bit (the true DSIR log-likelihood-ratio sums floats, whose
    value depends on summation order; the ratio above is the same
    monotone "target-frequency over corpus-frequency" signal with +1
    smoothing, chosen for oracle exactness the same way `rare_terms`
    uses tf/(df+1)).

    Returns (id_col, target_col, aff_num, aff_den, affinity) — one row
    per document with at least one token.

    Scale shape: the only corpus-sized dataflow is the feature explode
    (expression-only: `split` + `transform` bigrams + `explode`); bucket
    stats aggregate to exactly ``n_buckets`` rows (partial map-side
    combine does almost all the work) and broadcast back, so scoring a
    100 TB corpus is two partial aggregations and one broadcast join —
    no shuffle ever carries gram text, and no bucket can be skewed into
    a straggler because the join side is broadcast.
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) >= 1
    )
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = df.select(
        F.col(id_col),
        F.col(target_col),
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    ).select(
        id_col,
        target_col,
        (md5_hash60_col(F.col("gram")) % n_buckets).alias("b"),
    )
    stats = feats.groupBy("b").agg(
        F.sum(F.col(target_col).cast("long")).alias("t_cnt"),
        F.count("*").alias("a_cnt"),
    )
    return (
        feats.join(F.broadcast(stats), "b")
        .groupBy(id_col, target_col)
        .agg(
            F.sum(F.col("t_cnt") + 1).cast("long").alias("aff_num"),
            F.sum(F.col("a_cnt") + 1).cast("long").alias("aff_den"),
        )
        .withColumn(
            "affinity",
            F.col("aff_num").cast("double") / F.col("aff_den").cast("double"),
        )
    )


def apply_span_cuts(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_plan: bool = True,
) -> DataFrame:
    """Apply an ExactSubstr deletion plan: cut the token ranges produced
    by `substring_dedup` out of each document and re-join the survivors
    with single spaces (Lee et al. 2022 delete the duplicated spans from
    the training copy; this is that step). Token positions use the same
    indexing as `substring_dedup` (whitespace split, empties dropped).

    Returns (id_col, cleaned, n_tokens, n_kept) for every input document
    — docs with no spans pass through with their tokens re-joined.

    Scale shape: spans aggregate to one small array per AFFECTED doc and
    join back on the id; the cut itself is expression-only (indexed
    higher-order `filter` + `exists` over the cuts array) inside
    whole-stage codegen — no explode, no re-group, no window. With
    ``broadcast_plan=True`` (default) the cuts table is broadcast —
    right when the plan is small relative to the corpus (the usual
    case). On a heavy-dup corpus where the plan itself is huge (e.g.
    30%+ of a 100 TB corpus marked duplicated), pass
    ``broadcast_plan=False`` to fall back to a shuffled equi-join on the
    id — one well-partitioned shuffle, never a driver-sized broadcast.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda w: F.length(w) >= 1
    )
    cuts = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("cuts")
    )
    joined = df.join(
        F.broadcast(cuts) if broadcast_plan else cuts, id_col, "left"
    )
    cuts_col = F.coalesce(
        F.col("cuts"), F.array().cast("array<struct<s:long,e:long>>")
    )
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            cuts_col, lambda c: (i >= c["s"]) & (i < c["e"])
        ),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("cleaned"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept"),
    )


# ------------------------------------------------- sequence packing


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining prep
    step (public: Radford et al. 2019 / Brown et al. 2020 train on
    fixed-length windows over concatenated documents): lay every
    document's tokens end-to-end in a deterministic order and chunk the
    stream into ``seq_len``-token training sequences, reporting where
    each document lands (which sequence, at what offset).

    Packing is SHARDED: docs hash to ``n_shards`` independent streams
    (``id % n_shards``) and each shard packs its own docs in id order —
    exactly how real pipelines shard pretraining data, and what makes
    this scale: the running token count is a window partitioned BY SHARD
    (never a global single-partition window, the classic cumulative-sum
    scale trap). Raise ``n_shards`` with the cluster; each shard's
    window sorts only its own docs.

    Returns (id_col, shard, n_tokens, seq_id, offset_in_seq): the doc's
    tokens occupy positions [seq_id*seq_len + offset_in_seq, +n_tokens)
    of its shard's stream — documents straddle sequence boundaries, as
    in the reference recipes. All arithmetic is integer-exact, so an
    independent engine reproduces every assignment bit-for-bit.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda w: F.length(w) >= 1
    )
    base = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    by_shard = Window.partitionBy("shard").orderBy(id_col)
    start = (
        F.sum("n_tokens").over(
            by_shard.rowsBetween(Window.unboundedPreceding, -1)
        )
    )
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (F.coalesce(start, F.lit(0)) / seq_len).cast("long").alias("seq_id"),
        (F.coalesce(start, F.lit(0)) % seq_len).cast("long").alias("offset_in_seq"),
    )


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    max_dup_rate: float = 0.5,
) -> DataFrame:
    """Per-domain reputation table — the host/domain-level filter of
    RefinedWeb/FineWeb-style pipelines (Penedo et al. 2023/2024): before
    any per-document modeling, a web corpus is triaged by aggregate
    domain signals (volume, within-domain duplication, document length),
    and spammy domains are cut wholesale. Generalizes the reference's
    per-store scrape bookkeeping (/root/reference/crawler/stores) to
    corpus curation.

    Every emitted number is integer or a single integer division, so an
    independent SQL engine reproduces the table bit-for-bit:

    - ``n_docs``            documents in the domain
    - ``n_unique_texts``    distinct document bodies (counted over
                            xxhash64(text) so only 8-byte hashes shuffle,
                            never the bodies; the oracle counts distinct
                            text itself, so a hash collision would surface
                            as a gate mismatch)
    - ``dup_rate``          (n_docs - n_unique_texts) / n_docs
    - ``total_tokens``      whitespace tokens summed over the domain
    - ``mean_tokens``       total_tokens / n_docs
    - ``keep``              n_docs >= min_docs AND dup_rate <= max_dup_rate

    Plan shape at 100 TB: one hash aggregation with map-side partial
    combine keyed by domain (output is domain-cardinality, millions of
    rows, never corpus-sized). countDistinct rewrites to a two-level
    aggregate (expand + merge), still fully partial-aggregated; no join,
    no window, no Python.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    agg = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("h"),
            F.size(toks).cast("long").alias("ntok"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_unique_texts"),
            F.sum("ntok").cast("long").alias("total_tokens"),
        )
    )
    return agg.select(
        "domain",
        "n_docs",
        "n_unique_texts",
        ((F.col("n_docs") - F.col("n_unique_texts")) / F.col("n_docs")).alias(
            "dup_rate"
        ),
        "total_tokens",
        (F.col("total_tokens") / F.col("n_docs")).alias("mean_tokens"),
        (
            (F.col("n_docs") >= F.lit(min_docs))
            & (
                (F.col("n_docs") - F.col("n_unique_texts")) / F.col("n_docs")
                <= F.lit(float(max_dup_rate))
            )
        ).alias("keep"),
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    broadcast_vocab: bool = True,
    n_shards: int = 16,
) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al. 2020):
    score every document by how surprising its tokens are under a unigram
    LM fit on the corpus itself, then split each language into
    head/middle/tail tertiles — the standard perplexity triage that
    decides which web text is worth keeping for LLM pretraining.

    The surprisal of a token with corpus count ``c`` is approximated by
    its INTEGER log2 magnitude: ``bits(c) = length(bin(c)) - 1`` (i.e.
    floor(log2 c)). A rarer token has fewer bits, so a document's mean
    bits is a monotone inverse-surprisal score — the same ordering a
    float -log2(c/N) produces up to within-octave ties, but every term is
    an INTEGER, the per-doc sum is order-independent, and an independent
    SQL engine reproduces every score bit-for-bit (no libm log, whose
    last-ulp rounding differs across engines).

    Tertiles are computed PER (language, shard) with ``shard =
    id % n_shards`` — how CCNet itself operates (it buckets each shard
    of a dump independently) and what makes this scale: an ntile
    partitioned by language alone would sort the entire English web in
    one partition. Each shard is a uniform random sample of its
    language, so shard tertile boundaries converge to the language's
    true tertiles; raise ``n_shards`` with the cluster.

    Returns (id_col, lang, shard, n_tokens, sum_bits, mean_bits, bucket)
    with bucket 1=head (most-predictable) .. 3=tail within the doc's
    (language, shard) cell.

    Plan shape at 100 TB: explode -> two hash aggregations with map-side
    combine (per-(doc,term) tf with lang/shard carried as grouping keys
    — no join-back to the corpus for metadata — then per-term corpus
    counts over the already-distinct pairs) -> broadcast vocabulary join
    (vocabularies are ~1e7 terms vs 1e10 docs; set broadcast_vocab=False
    for a pathological vocabulary) -> per-doc sum -> ntile window over
    (lang, shard) cells.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    tf = (
        df.select(
            F.col(id_col),
            F.col(lang_col).alias("lang"),
            (F.col(id_col) % n_shards).cast("long").alias("shard"),
            F.explode(toks).alias("term"),
        )
        .groupBy(id_col, "lang", "shard", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("c"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    per_doc = (
        tf.join(vocab, "term")
        .groupBy(id_col, "lang", "shard")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * (F.length(F.bin("c")) - 1))
            .cast("long")
            .alias("sum_bits"),
        )
    )
    by_cell = Window.partitionBy("lang", "shard").orderBy(
        (F.col("sum_bits") / F.col("n_tokens")).desc(), F.col(id_col).asc()
    )
    return per_doc.select(
        id_col,
        "lang",
        "shard",
        "n_tokens",
        "sum_bits",
        (F.col("sum_bits") / F.col("n_tokens")).alias("mean_bits"),
        F.ntile(3).over(by_cell).cast("long").alias("bucket"),
    )


def _adjacent_pairs_col(text_col: str) -> Column:
    """array<struct(prev, term)> of adjacent token pairs: the token array
    zipped against its own 1-shifted slice. Same (prev, term) multiset as
    a posexplode + per-doc ``lag`` window, with no corpus-wide window sort
    (round 6; shared by :func:`bigram_surprisal` / :func:`kn_bigram_score`).
    Documents with <2 tokens yield an empty array (absent downstream, the
    documented single-token behavior)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("term")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,term:string>>"))


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    broadcast_vocab: bool = True,
    n_shards: int = 16,
) -> DataFrame:
    """Conditional (bigram) LM quality scoring — the second-order
    companion to :func:`unigram_surprisal` and the integer-exact analogue
    of CCNet's KenLM perplexity triage (Wenzek et al. 2020): score each
    document by how predictable each token is GIVEN its predecessor,
    ``-log2 P(w_i | w_{i-1}) ~= bits(c(w_{i-1}·)) - bits(c(w_{i-1} w_i))``
    where ``bits(c) = floor(log2 c)`` (``length(bin(c)) - 1``) and both
    counts come from the corpus itself.  Word-salad that sails through a
    unigram filter (common words, nonsense order) scores high here,
    because its bigrams are rare while its contexts are common.  Every
    term is an INTEGER >= 0 (``c2 <= c1`` by construction), so scores
    reproduce bit-for-bit on any engine — no libm log.

    Head/middle/tail tertiles per (language, shard) cell exactly as in
    :func:`unigram_surprisal` (CCNet buckets per shard; keeps the window
    off a whole-language single-partition sort).

    Returns (id_col, lang, shard, n_bigrams, sum_bits, mean_bits,
    bucket); single-token documents have no bigram and are absent.

    Plan shape at 100 TB: posexplode -> one per-doc window (lag over
    billions of tiny doc-sized groups — hash partitioned, no skew) ->
    per-(doc,bigram) tf with map-side combine -> bigram counts over the
    already-distinct pairs -> context counts as a second partial agg over
    the bigram vocabulary (never re-reads the corpus) -> vocabulary join
    (broadcast by default; web bigram vocabularies at the tail are
    Zipf-light because tf pre-aggregation already collapsed repeats) ->
    per-doc sum -> ntile over (lang, shard) cells.
    """
    # adjacent-pair construction by zipping the token array against its
    # own 1-shifted slice (round 6): the same (prev, term) multiset as the
    # posexplode + per-doc lag window (verified), at a third of the cost —
    # no corpus-wide window sort, no pos column
    big = df.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.explode(_adjacent_pairs_col(text_col)).alias("bg"),
    ).select(
        id_col,
        "lang",
        "shard",
        F.col("bg.prev").alias("prev"),
        F.col("bg.term").alias("term"),
    )
    tf = big.groupBy(id_col, "lang", "shard", "prev", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    c2 = tf.groupBy("prev", "term").agg(F.sum("tf").cast("long").alias("c2"))
    # benign c2 reference in the context aggregate (same trick as
    # minhash_near_dup_pairs): identical pruning across c2's consumers
    # keeps the canonical plans equal so the corpus tf chain materializes
    # once instead of once per branch
    c1 = (
        c2.filter(F.length("term") >= 0)
        .groupBy("prev")
        .agg(F.sum("c2").cast("long").alias("c1"))
    )
    vocab = c2.join(c1, "prev")
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    per_doc = (
        tf.join(vocab, ["prev", "term"])
        .groupBy(id_col, "lang", "shard")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(
                F.col("tf")
                * (
                    (F.length(F.bin("c1")) - 1)
                    - (F.length(F.bin("c2")) - 1)
                )
            )
            .cast("long")
            .alias("sum_bits"),
        )
    )
    by_cell = Window.partitionBy("lang", "shard").orderBy(
        (F.col("sum_bits") / F.col("n_bigrams")).desc(), F.col(id_col).asc()
    )
    return per_doc.select(
        id_col,
        "lang",
        "shard",
        "n_bigrams",
        "sum_bits",
        (F.col("sum_bits") / F.col("n_bigrams")).alias("mean_bits"),
        F.ntile(3).over(by_cell).cast("long").alias("bucket"),
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    scale: int = 4,
) -> DataFrame:
    """Temperature-weighted domain mixture sampling — the alpha-sampling
    recipe of multilingual/multi-source LM training (public: XLM-R,
    Conneau et al. 2020; mT5, Xue et al. 2021): sample each domain in
    proportion to ``n_docs**alpha`` with alpha=0.5, so head domains are
    downweighted and tail domains upsampled relative to natural
    frequency. The per-domain quota is ``min(n_docs,
    ceil(scale * sqrt(n_docs)))`` — sqrt is IEEE-correctly-rounded and
    ``scale`` is a power of two, so the quota is bit-identical on any
    engine (no libm pow).

    Selection within a domain is deterministic: rows rank by a Knuth
    multiplicative hash of the id (the same order-scrambling used by
    stratified_sample) with the id as tie-break, and the first
    ``quota`` ranks win. Same seed -> same sample, at any parallelism.

    Plan shape at 100 TB: one domain-cardinality aggregate (map-side
    combined), broadcast back as the quota table, then ONE window
    partitioned by domain for the rank. No corpus self-join; the only
    corpus-sized shuffle is the window's hash partition by domain.
    Skewed mega-domains cost one sort of their own partition — cap them
    upstream via domain_stats.keep if a single domain dominates.
    """
    scramble = (
        ((F.col(id_col) % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    )
    quotas = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            "domain",
            "n_docs",
            F.least(
                F.col("n_docs"),
                F.ceil(
                    F.sqrt(F.col("n_docs").cast("double"))
                    * F.lit(float(scale))
                ).cast("long"),
            ).alias("quota"),
        )
    )
    ranked = (
        df.select(F.col(id_col), F.col(domain_col).alias("domain"))
        .withColumn(
            "rn",
            F.row_number()
            .over(
                Window.partitionBy("domain").orderBy(
                    scramble.asc(), F.col(id_col).asc()
                )
            )
            .cast("long"),
        )
        .join(F.broadcast(quotas), "domain")
    )
    return ranked.filter(F.col("rn") <= F.col("quota")).select(
        id_col, "domain", "rn", "quota", "n_docs"
    )


def incremental_dedup(
    incoming: DataFrame,
    history_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-snapshot incremental deduplication — the RefinedWeb/Dolma
    production shape (each new CommonCrawl dump is deduplicated against
    ALL previously ingested dumps, not just itself): keep an incoming
    document iff its body hash is absent from the accumulated history
    AND it is the first occurrence within its own batch.

    ``history_hashes`` is a hash-only table (one ``h: long`` column,
    8 bytes/doc) — the whole point at 100 TB: the history side never
    stores or shuffles bodies, it is the running xxhash64 ledger each
    ingest appends to. The op returns the surviving incoming rows plus
    an ``is_new_text`` marker so the caller can append exactly the
    surviving hashes to the ledger.

    Plan shape: one left-anti-style join on the 8-byte hash (history
    side shuffles hash-only; broadcastable while the ledger is small,
    AQE re-plans when it is not) + one within-batch first-wins via
    partial-agg min(struct) keyed by hash — no window sort, same
    skew-safe winners pattern as paragraph_dedup.
    """
    inc = incoming.withColumn(
        "h", F.xxhash64(F.coalesce(F.col(text_col), F.lit("")))
    )
    hist = history_hashes.select(F.col("h").cast("long").alias("h")).distinct()
    fresh = inc.join(hist, "h", "left_anti")
    winners = fresh.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col(text_col))).alias("w")
    )
    return winners.select(
        F.col(f"w.{id_col}").alias(id_col),
        F.col(f"w.{text_col}").alias(text_col),
        "h",
        F.lit(True).alias("is_new_text"),
    )


def dup_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplication profile — the cluster-size histogram curation teams
    track per dump (how much of the corpus is 2×, 10×, 1000×
    duplicated): for every exact-duplicate cluster size, the number of
    clusters of that size and the documents they account for.

    Two map-side-combined hash aggregations over 8-byte hashes
    (count per text-hash, then count per cluster size); output is
    max-cluster-size rows. Integer-exact.
    """
    per_hash = (
        df.select(F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("h"))
        .groupBy("h")
        .agg(F.count("*").cast("long").alias("cluster_size"))
    )
    return (
        per_hash.groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Distributed BPE merge-pair counting — the inner statistic of
    byte-pair-encoding tokenizer training (Sennrich et al. 2016; the
    GPT-2/SentencePiece recipe): for every adjacent symbol pair, its
    corpus frequency counted over words, weighted by word frequency.
    The highest-count pair is the next BPE merge; re-running after each
    merge trains the tokenizer.

    The scale trick is the same one real distributed BPE trainers use:
    aggregate the corpus to its DISTINCT vocabulary first (one hash
    aggregation; output is vocabulary-sized, ~1e7 rows, not
    corpus-sized), then explode each distinct word's character pairs
    exactly once and weight by the word's frequency. The corpus text is
    read once; everything after the first aggregate is vocabulary-scale.

    Returns (pair, pair_count, n_words): the weighted adjacent-pair
    count and the number of distinct words containing the pair. All
    integer arithmetic — bit-exact on any engine.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    vocab = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        "word",
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").cast("long").alias("pair_count"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
        .filter(F.col("pair_count") >= min_count)
    )


def corpus_stats(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-language corpus summary — the dataset card every published
    dump ships (C4/mC4, OSCAR, FineWeb all report per-language document
    counts, token volumes and length distributions): doc count, token
    and character volume, min/median/p90/max document length.

    One hash aggregation keyed by language, map-side combined; exact
    percentiles run as Spark's percentile aggregate (sorted-merge within
    the aggregation buffer, no window, no global sort). Linear
    interpolation on integers is IEEE-exact, so an independent engine
    reproduces the quantiles bit-for-bit.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            F.size(toks).cast("long").alias("ntok"),
            F.col(chars_col).cast("long").alias("nch"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.sum("nch").cast("long").alias("total_chars"),
            F.min("nch").cast("long").alias("min_chars"),
            F.expr("percentile(nch, 0.5)").alias("median_chars"),
            F.expr("percentile(nch, 0.9)").alias("p90_chars"),
            F.max("nch").cast("long").alias("max_chars"),
        )
    )


# ------------------------------------------------- char entropy (gibberish)


def char_entropy_udf():
    """Arrow-batched pandas UDF: text → struct(n_chars, n_distinct_chars,
    entropy_bits). Shannon entropy of the codepoint distribution — the
    classic gibberish / binary-junk / keyboard-mash signal (low entropy =
    repeated filler, high entropy ≈ random bytes; natural language sits in
    a narrow band, so both tails are drop candidates in a web-text
    pipeline, cf. the C4/Gopher heuristic filter families).

    Per doc the distribution is computed by ONE vectorized
    ``np.unique(counts)`` over the UTF-32 codepoint view — no per-char
    Python loop, no corpus-char-sized explode/shuffle (the expression-only
    alternative shuffles every character of every document; this streams
    each Arrow batch once and emits 3 scalars/doc). ``entropy_bits`` is
    ``log2(n) − Σ c·log2(c) / n`` in float64: pure libm — cross-engine
    agreement is within a few ulps, so hash-stable consumers round (the
    `char_entropy` query rounds to 6 decimals)."""
    schema = T.StructType(
        [
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_distinct_chars", T.LongType()),
            T.StructField("entropy_bits", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def _entropy(texts: pd.Series) -> pd.DataFrame:
        n_out, d_out, h_out = [], [], []
        for s in texts:
            if s is None or len(s) == 0:
                n_out.append(0)
                d_out.append(0)
                h_out.append(0.0)
                continue
            cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            _, counts = np.unique(cps, return_counts=True)
            n = float(cps.size)
            c = counts.astype(np.float64)
            h = np.log2(n) - float((c * np.log2(c)).sum()) / n
            n_out.append(int(cps.size))
            d_out.append(int(counts.size))
            h_out.append(float(h))
        return pd.DataFrame(
            {"n_chars": n_out, "n_distinct_chars": d_out, "entropy_bits": h_out}
        )

    return _entropy


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, entropy_bits) per document."""
    s = df.select(
        F.col(id_col).alias("doc_id"),
        char_entropy_udf()(F.col(text_col)).alias("s"),
    )
    return s.select("doc_id", "s.n_chars", "s.n_distinct_chars", "s.entropy_bits")


# ------------------------------------------------- vocabulary coverage / OOV


def vocab_topk(
    df: DataFrame, vocab_size: int, text_col: str = "text"
) -> DataFrame:
    """The corpus' top-``vocab_size`` whitespace tokens by frequency
    (count DESC, token ASC tie-break → deterministic at any parallelism).
    One token explode + map-side-combined count at vocabulary cardinality,
    then a global ``orderBy().limit()`` — Spark plans that as TakeOrdered
    (per-partition top-k, merged on the driver), NOT a single-partition
    sort of the vocabulary."""
    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: F.length(t) >= 1,
            )
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(
        vocab_size
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document vocabulary coverage against the corpus' own top-V
    token vocabulary: ``(doc_id, n_tokens, n_oov, oov_rate)`` — the
    tokenizer-fit / OOV-rate census run before committing a vocabulary to
    a pretraining corpus (a high OOV tail = wrong tokenizer or wrong
    corpus slice). ``oov_rate`` is ONE integer division in float64 —
    bit-identical in any engine.

    Scale shape: the vocabulary is derived once (:func:`vocab_topk`,
    vocabulary-cardinality dataflow) and broadcast; the per-doc pass is
    one token explode + a broadcast left join + one map-side-combined
    aggregate at document cardinality. Nothing corpus-sized is ever
    sorted."""
    vocab = vocab_topk(df, vocab_size, text_col=text_col)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: F.length(t) >= 1,
            )
        ).alias("token"),
    )
    tagged = toks.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("_inv"))),
        "token",
        "left",
    )
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        (
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


# ------------------------------------------------- BPE tokenizer application


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference semantics for BPE application (Sennrich et al. 2016 apply
    step, rank-order variant): start from the codepoint sequence; for each
    merge ``(left, right)`` in rank order, fuse all non-overlapping
    left-to-right adjacent occurrences. Deterministic, total, and exactly
    reproducible as a chain of delimited string ``replace``s — which is
    how the DuckDB oracle recomputes it."""
    seq = list(word)
    for left, right in merges:
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned BPE merge list and account tokens per document:
    ``(doc_id, n_words, n_bpe_tokens)`` — the tokenizer-application half of
    the BPE story (:func:`bpe_pair_counts` is the training half), i.e. the
    "how many tokens is this corpus under this tokenizer" pass every
    pretraining-data budget starts from.

    Vocabulary-first, like the trainer: the corpus aggregates to
    ``(doc_id, word, count)`` once (map-side combined), the merge loop runs
    per DISTINCT word (vocabulary cardinality — the expensive Python work
    never touches the token stream), and the per-word token counts join
    back by word (AQE broadcasts the vocabulary side when small). Exact
    integers throughout — hash-stable with no rounding."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) >= 1
    )
    wc = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = wc.select("word").distinct()

    merges_local = [tuple(m) for m in merges]

    @F.pandas_udf(T.LongType())
    def _ntok(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(bpe_encode_word(w, merges_local)))

    vtok = vocab.select("word", _ntok(F.col("word")).alias("n_tok"))
    joined = wc.join(vtok, "word")
    return joined.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_words"),
        F.sum(F.col("n") * F.col("n_tok")).cast("long").alias("n_bpe_tokens"),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Full distributed BPE tokenizer TRAINING (Sennrich et al. 2016's
    iterative loop, not just the one-round statistic of
    :func:`bpe_pair_counts`): repeatedly count adjacent symbol pairs over
    the vocabulary, fuse the most frequent pair everywhere, and record the
    merge — the learned merge table IS the tokenizer.

    Scale shape — the standard distributed-BPE recipe: the corpus
    aggregates ONCE to its distinct vocabulary ``(symbols, freq)``
    (vocabulary-cardinality from then on, ~1e7 rows at web scale, never
    the corpus again). Each merge round costs one map-side-combined pair
    count plus a driver ``TakeOrdered(1)`` (a bounded one-row collect —
    the argmax pair), then one narrow vocabulary-scale map applying the
    merge as an ``F.aggregate`` fold (greedy left-to-right non-overlap,
    the exact apply semantics of :func:`bpe_encode_word`; a fold never
    re-merges a token it just created because ``left+right != left``).
    Lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
    rounds so the nested-fold expression tree stays codegen-sized.

    Determinism: argmax ties break on (count DESC, lhs ASC, rhs ASC) in
    binary UTF-8 order — bit-identical on any engine, any parallelism.

    Returns ``(merge_rank, lhs, rhs, pair_count)``, one row per learned
    merge in rank order; stops early when no pair reaches ``min_count``.
    """
    spark = df.sparkSession
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    vocab = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .filter(F.length("word") >= 2)
        .select(
            F.expr(
                "transform(sequence(1, char_length(word)),"
                " i -> substring(word, i, 1))"
            ).alias("syms"),
            "freq",
        )
    )

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(syms, 1, size(syms) - 1)").alias("lhs"),
                    F.expr("slice(syms, 2, size(syms) - 1)").alias("rhs"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(
                F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
            )
            .agg(F.sum("freq").cast("long").alias("pair_count"))
            .filter(F.col("pair_count") >= min_count)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0].lhs, best[0].rhs, best[0].pair_count
        merges.append((rank, lhs, rhs, cnt))
        fused = lhs + rhs
        vocab = vocab.select(
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(lhs))
                    & (x == F.lit(rhs)),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(fused)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("syms"),
            "freq",
        )
        if rank % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)

    schema = T.StructType(
        [
            T.StructField("merge_rank", T.IntegerType(), False),
            T.StructField("lhs", T.StringType(), False),
            T.StructField("rhs", T.StringType(), False),
            T.StructField("pair_count", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(merges, schema)


# ------------------------------------------------------ Gopher quality rules

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_gate(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021 §A1.1) as ONE
    expression-only pass — the published thresholds, not a lookalike:

    - 50 ≤ word count ≤ 100,000
    - 3 ≤ mean word length ≤ 10
    - symbol-to-word ratio (``#`` or ``...``) ≤ 0.1
    - < 90% of lines start with a bullet; < 30% end with an ellipsis
    - ≥ 80% of words contain an alphabetic character
    - ≥ 2 of the 8 Gopher stop words (the/be/to/of/and/that/have/with)

    ``keep`` is the conjunction. Every ratio is one exact integer division
    in float64 (bit-identical cross-engine, no rounding); the whole gate
    is whole-stage codegen — no UDF, safe on 100 TB of text."""
    text = F.col(text_col)
    toks = F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: F.length(t) >= 1
    )
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1)).cast("double")
    word_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_wl = word_chars.cast("double") / n1
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ell).cast("double") / n1
    lines = F.split(text, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
        ).cast("double")
        / n_lines
    )
    ell_line_frac = (
        F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
        ).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n1
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS))).cast(
        "long"
    )
    keep = (
        (n >= 50)
        & (n <= 100000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac < 0.9)
        & (ell_line_frac < 0.3)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ell_line_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stopwords"),
        keep.alias("keep"),
    )


# --------------------------------------------- quality-aware survivor select


def select_survivors(
    labels: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Quality-aware survivor selection over near-dup clusters — the
    FineWeb/RefinedWeb refinement of "keep min-id per cluster": within
    each cluster keep the HIGHEST-quality document (ties break to the
    smallest id, so the pick is deterministic at any parallelism).

    ``labels`` is :func:`connected_components` output ``(v, label)``;
    ``quality`` is ``(id, score)``. The winner per cluster is one
    map-side-combined ``max(struct(quality, -id))`` — an argmax with NO
    window sort, so a mega-cluster (the classic boilerplate component
    with millions of members) costs a partial aggregate, never a hot
    sorted partition. Output ``(id, cluster_id, quality, keep)``."""
    labeled = labels.select(
        F.col("v").alias(id_col), F.col("label").alias("cluster_id")
    ).join(quality, id_col)
    winners = labeled.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col(quality_col).alias("q"),
                (-F.col(id_col)).alias("neg_id"),
            )
        ).alias("w")
    )
    return labeled.join(winners, "cluster_id").select(
        id_col,
        "cluster_id",
        quality_col,
        (F.col(id_col) == -F.col("w.neg_id")).alias("keep"),
    )


# ------------------------------------------------- fingerprint containment


def containment_pairs(
    df: DataFrame,
    window: int = 8,
    k: int = 16,
    min_overlap: int = 2,
    min_containment: float = 0.5,
    max_fp_docs: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric near-dup CONTAINMENT over winnowed fingerprints
    (Broder 1997 §2: resemblance AND containment are the two dup
    measures; MinHash/SimHash estimate only the symmetric one). A short
    document quoted inside a long wrapper page has low Jaccard but
    containment ≈ 1 — this catches the quote/wrapper/boilerplate-inflation
    duplicates the resemblance family misses.

    Output per unordered pair (``id_a < id_b``): shared-fingerprint
    ``overlap`` and both directed containments ``overlap / |fp(doc)|``,
    kept when ``max(c_a, c_b) ≥ min_containment``. Exact integers + one
    division each — hash-stable with no rounding.

    Scale shape, same defenses as :func:`~frontier_engine.hostctl.mirror_hosts`:
    fingerprints on more than ``max_fp_docs`` docs (site chrome shared
    everywhere) are dropped BEFORE the self-join, bounding fanout at
    ``max_fp_docs²`` per fingerprint instead of docs²; containment
    denominators stay the TRUE uncapped set sizes, so the cap only
    removes non-discriminating evidence, never inflates a score."""
    fp = fingerprint_udf(window=window, k=k, scheme="poly31")
    fps = df.select(
        F.col(id_col).alias("doc_id"), F.explode(fp(F.col(text_col))).alias("fp")
    )
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    keepfp = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= max_fp_docs)
        .select("fp")
    )
    capped = fps.join(keepfp, "fp")
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
        .filter(F.col("overlap") >= min_overlap)
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("n_b"))
    out = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "overlap",
            (F.col("overlap").cast("double") / F.col("n_a")).alias(
                "containment_a"
            ),
            (F.col("overlap").cast("double") / F.col("n_b")).alias(
                "containment_b"
            ),
        )
    )
    return out.filter(
        F.greatest("containment_a", "containment_b") >= min_containment
    )


def budget_cut(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_ranges: int = 32,
) -> DataFrame:
    """Token-budget corpus curation: greedily keep the highest-quality
    documents until a token budget is spent. Rows are totally ordered by
    ``(quality DESC, id ASC)``; a document is kept iff the tokens consumed
    BEFORE it are still under ``budget_tokens`` (so the crossing document
    is included and the budget is overshot by at most one document —
    the standard greedy cut of LM-data curation recipes: rank by quality,
    take until the token target is met).

    Output: kept rows as ``(id, quality, tokens, cum_tokens)`` where
    ``cum_tokens`` is the inclusive running total — exact int64
    arithmetic, deterministic at any parallelism because the order key is
    total (ties impossible with the id tie-break).

    Scale shape — a distributed prefix sum, NOT a single-partition global
    window: (1) ``repartitionByRange(n_ranges, quality DESC, id)`` range-
    partitions the corpus on the order key; (2) one map-side-combined
    aggregate computes per-range token totals — ``n_ranges`` rows,
    driver-small by construction — whose exclusive prefix becomes a
    broadcast offset map; (3) each range sorts locally and adds its
    offset to a partition-local running sum. The only corpus-sized
    movement is the ONE range exchange; no partition ever holds more than
    its range. Range boundaries come from Spark's reservoir sample, so
    WHICH partition a row lands in can vary — but the prefix sum is over
    the global total order, so ``cum_tokens`` (and therefore the kept
    set) is identical regardless of where the boundaries fall. A trailing
    filter drops ranges that start at/after the budget before their local
    sort (their offset alone disqualifies every row; predicate is on the
    broadcast offset, evaluated before the window).
    """
    if budget_tokens < 0:
        raise ValueError("budget_cut: budget_tokens must be >= 0")
    base = df.select(
        F.col(id_col),
        F.col(quality_col).cast("double").alias("_q"),
        F.col(tokens_col).cast("long").alias("_tok"),
    )
    ranged = base.repartitionByRange(
        n_ranges, F.col("_q").desc(), F.col(id_col).asc()
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.persist()
    try:
        totals = sorted(
            (r["_pid"], r["_t"])
            for r in ranged.groupBy("_pid")
            .agg(F.sum("_tok").alias("_t"))
            .collect()
        )
        offsets, acc = {}, 0
        for pid, tot in totals:
            offsets[pid] = acc
            acc += tot
        off_col = F.coalesce(
            *[
                F.when(F.col("_pid") == F.lit(pid), F.lit(off))
                for pid, off in offsets.items()
            ],
            F.lit(0),
        ) if offsets else F.lit(0)
        w = (
            Window.partitionBy("_pid")
            .orderBy(F.col("_q").desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            ranged.withColumn("_off", off_col)
            # ranges whose offset already exhausts the budget can't keep
            # any row: prune them before their local sort runs
            .filter(F.col("_off") < F.lit(int(budget_tokens)))
            .withColumn("cum_tokens", F.sum("_tok").over(w) + F.col("_off"))
            .filter(F.col("cum_tokens") - F.col("_tok") < F.lit(int(budget_tokens)))
            .select(
                id_col,
                F.col("_q").alias(quality_col),
                F.col("_tok").alias(tokens_col),
                "cum_tokens",
            )
        )
        # materialize before unpersist: the plan references the cached frame
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        ranged.unpersist()


def quality_calibrate(
    df: DataFrame,
    quality_col: str = "quality",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group percentile rank (empirical CDF) of a quality score —
    the calibration step before applying one keep-threshold across
    languages: a raw quality cut biases against languages whose score
    distribution sits lower (CCNet keeps per-language percentile buckets
    for exactly this reason), so downstream filters consume
    ``pct_rank = P(quality ≤ x | group)`` instead of the raw score.

    Computed by COUNTING, never by sorting the corpus (same philosophy
    as the grouped-quantiles op): one map-side-combined aggregate
    collapses the corpus to ``(group, value, n)`` rows at distinct-value
    cardinality, a window over THAT small table forms the running
    ``cum_le``, and a join keyed on ``(group, value)`` carries the rank
    back to the rows. The percentile is the exact rational
    ``cum_le / n_group`` (int64 ÷ int64 in IEEE doubles — identical in
    any engine; round 6 for hash compare). Skewed mega-groups cost a
    window over their distinct VALUES, not their rows.

    Output: ``(id, group, quality, pct_rank)``, one row per input row.
    """
    counts = df.groupBy(
        F.col(group_col).alias("_g"), F.col(quality_col).alias("_v")
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    w = (
        Window.partitionBy("_g")
        .orderBy(F.col("_v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = counts.withColumn("_cum_le", F.sum("_n").over(w)).withColumn(
        "_n_group", F.sum("_n").over(Window.partitionBy("_g"))
    )
    return df.join(
        ranked,
        (F.col(group_col) == F.col("_g")) & (F.col(quality_col) == F.col("_v")),
    ).select(
        id_col,
        group_col,
        quality_col,
        (F.col("_cum_le").cast("double") / F.col("_n_group").cast("double")).alias(
            "pct_rank"
        ),
    )


def collocations(
    df: DataFrame,
    min_count: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level collocation census: pointwise mutual information over
    adjacent whitespace-token bigrams — the classic phrase-detection /
    multi-word-expression signal (Church & Hanks 1990; the phrasing step
    of word2vec's ``word2phrase``). The reference tokenizes product names
    for matching (crawler/stores/bhx.py:59-97); over a web corpus the
    same token stream yields the phrase lexicon.

    Output: one row per bigram seen >= min_count times —
    (w1, w2, n_pair, n_w1, n_w2, lift, pmi) where
    lift = P(w1,w2)/(P(w1)P(w2)) = (n_pair * N^2) / (M * n_w1 * n_w2)
    and pmi = round(log2(lift), 6), with N total tokens and M total
    bigrams. Both integer products stay in int64 (N ~ 1e6 tokens at
    sf0.1 -> n_pair*N^2 ~ 1e17 < 2^63) and the int64->double casts plus
    the single division are IEEE-identical across engines, so ``lift``
    is emitted UNROUNDED and hash-compares bit-for-bit; only ``pmi``
    touches libm (rounded to 6dp, the repo's standard).

    Plan shape at 100 TB: one explode per stream (token / bigram), two
    hash aggregations with map-side partial combine, two joins against
    the unigram table keyed on the word (vocabulary-sized, not
    corpus-sized), scalar totals broadcast via a 1-row cross join. No
    windows, no sorts; the min_count filter prunes the hapax tail
    before the joins.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) >= 1
    )
    t = df.select(toks.alias("t"))
    uni = (
        t.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("n_w"))
    )
    n_pairs = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = t.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, n_pairs),
                F.slice("t", 2, n_pairs),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    totals = uni.agg(
        F.sum("n_w").cast("long").alias("n_total"),
    ).crossJoin(
        pairs.agg(F.count("*").cast("long").alias("m_total"))
    )
    scored = (
        big.join(F.broadcast(totals))
        .join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .withColumn(
            "lift",
            (F.col("n_pair") * F.col("n_total") * F.col("n_total")).cast("double")
            / (F.col("m_total") * F.col("n_w1") * F.col("n_w2")).cast("double"),
        )
        .withColumn("pmi", F.round(F.log2("lift"), 6))
    )
    return scored.select("w1", "w2", "n_pair", "n_w1", "n_w2", "lift", "pmi")


def set_similarity_join(
    df: DataFrame,
    t_num: int = 1,
    t_den: int = 2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT all-pairs set-similarity self-join with prefix filtering
    (Chaudhuri et al. ICDE'06; Xiao et al. PPJoin WWW'08; the MapReduce
    formulation is Vernica et al. SIGMOD'10): every document pair whose
    k-word-shingle sets have Jaccard >= t, with NO sketching — the
    exactness-guaranteed sibling of minhash/simhash near-dup (those
    trade recall for speed; this trades a filtered candidate join for
    zero false negatives, the right tool when dedup must be provable).

    Completeness comes from the prefix-filter theorem: order every
    set by one global total order (corpus frequency asc, shingle asc —
    rare first), keep each set's first n - ceil(t*n) + 1 elements; any
    pair with J >= t must share an element inside both prefixes, so the
    candidate join runs on prefixes (dominated by rare shingles) plus a
    size-ratio filter n_b*t <= n_a <= n_b/t, never on full sets.

    The threshold is the RATIONAL t = t_num/t_den: ceil(t*n) is the
    integer (t_num*n + t_den - 1) div t_den and the final gate is the
    cross-multiplied compare t_den*inter >= t_num*(n_a+n_b-inter) —
    no float touches selection anywhere, and the emitted jaccard is one
    exact int64->double division (bit-identical in any engine).

    Plan shape at 100 TB: one explode; frequency agg at vocabulary
    cardinality; per-doc sort of ITS OWN shingle list (array_sort in the
    agg, no corpus sort); candidate self-join keyed on prefix shingles —
    rare-first prefixes keep bucket sizes near 1, the frequency-ordered
    twin of the LSH band join; exact verification joins only candidate
    ids back to the shingle table. persist() on the shingle relation is
    internal (it is read three times: frequency, prefix, verify).
    """
    if not 0 < t_num <= t_den:
        raise ValueError("set_similarity_join: need 0 < t_num <= t_den")
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), k))
        ).alias("sh"),
    ).persist()
    freq = sh.groupBy("sh").agg(F.count("*").cast("long").alias("df_sh"))
    # per_doc is persisted like sh: the prefix self-join's two sides and
    # the two size joins each re-ran the freq-join + collect_list aggregate
    # otherwise (self-join sides share no stages — measured round 6)
    per_doc = (
        sh.join(freq, "sh")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("df_sh", "sh"))).alias("els"))
        .withColumn("n", F.size("els").cast("long"))
        .persist()
    )
    prefix_len = (
        F.col("n") - F.expr(f"({t_num} * n + {t_den} - 1) div {t_den}") + 1
    ).cast("int")
    p = per_doc.select(
        "_id", "n", F.explode(F.slice("els", F.lit(1), prefix_len)).alias("e")
    ).select(F.col("e.sh").alias("sh"), "_id", "n")
    cand = (
        p.alias("a")
        .join(p.alias("b"), "sh")
        .filter(
            (F.col("a._id") < F.col("b._id"))
            & (F.lit(t_num) * F.col("a.n") <= F.lit(t_den) * F.col("b.n"))
            & (F.lit(t_num) * F.col("b.n") <= F.lit(t_den) * F.col("a.n"))
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # exact verify on CARRIED shingle arrays (round 6): each candidate pair
    # fetches both docs' sorted element arrays from the persisted per_doc
    # tier and intersects them locally — the round-5 verify exploded the
    # shingle relation into two corpus-sized joins plus a count aggregate;
    # array_intersect over per-doc distinct sets yields the identical
    # intersection cardinality with only candidate-cardinality join work.
    feats_a = per_doc.select(
        F.col("_id").alias("id_a"),
        F.transform("els", lambda e: e["sh"]).alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    feats_b = per_doc.select(
        F.col("_id").alias("id_b"),
        F.transform("els", lambda e: e["sh"]).alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("inter")
    return (
        cand.join(feats_a, "id_a")
        .join(feats_b, "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        )
        .filter(F.lit(t_den) * F.col("inter") >= F.lit(t_num) * union_sz)
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "inter",
            (F.col("inter").cast("double") / union_sz.cast("double")).alias(
                "jaccard"
            ),
        )
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    max_dist: int = 2,
    q: int = 2,
    left_id: str = "id",
    right_id: str = "id",
    left_val: str = "val",
    right_val: str = "val",
) -> DataFrame:
    """EXACT similarity join on Levenshtein distance with q-gram prefix
    filtering (Ed-Join, Xiao et al. VLDB'08; the q-gram count bound is
    Gravano et al. VLDB'01) — every (left, right) pair with
    ``levenshtein(lv, rv) <= max_dist``, zero false negatives, never a
    cross join. Entity resolution for crawled records: the reference
    matches scraped product titles across store chains by normalized
    name equality (`/root/reference/crawler/*/main.py` upserts on the
    cleaned name), which silently drops every typo'd / reordered /
    re-spaced variant — this operator is the scale-safe fuzzy
    generalization.

    Completeness argument (the Ed-Join prefix theorem): ``d`` edits
    destroy at most ``q*d`` of a string's positional q-gram occurrences.
    Order all gram occurrences by one global total order (corpus
    frequency asc, gram asc, position asc — rare first) and keep each
    string's first ``q*d + 1``; if ed <= d, both prefixes must contain a
    preserved occurrence, and whichever ranks lower appears in BOTH
    prefixes (a prefix contains every own-string occurrence ranking
    below any member). Candidates therefore come from a prefix ⋈ prefix
    equi-join on the gram value plus the length band |len_l - len_r| <=
    d, then one built-in ``levenshtein`` verify (JVM codegen, no UDF).

    Strings too short to own a guaranteed shared gram (len < q*(d+1))
    are routed to a length-banded nested-loop among themselves — a
    vanishing fraction of any real corpus — and any short↔long pair is
    impossible by the length band. Plan shape at 100 TB: one explode per
    side, a vocabulary-sized frequency agg, per-string window row_number
    (partitioned by the string id — no global sort), and a candidate
    join dominated by RARE grams, the same economics as
    :func:`set_similarity_join`.
    """
    if max_dist < 0 or q < 1:
        raise ValueError("edit_distance_join: max_dist >= 0 and q >= 1 required")
    pref_n = q * max_dist + 1
    short_len = q * (max_dist + 1)

    def _prep(df, idc, vc, side):
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            F.col(vc).alias(f"{side}_val"),
            F.length(F.col(vc)).alias(f"{side}_len"),
        )

    L = _prep(left, left_id, left_val, "l").persist()
    R = _prep(right, right_id, right_val, "r").persist()

    # positional q-grams via substring over a 1..len-q+1 index sequence
    def _gram_arr(vcol, lncol):
        return F.transform(
            F.sequence(F.lit(1), F.col(lncol) - q + 1),
            lambda i: F.col(vcol).substr(i, F.lit(q)),
        )

    lg = L.filter(F.col("l_len") >= q).select(
        "l_id", "l_val", "l_len", F.posexplode(_gram_arr("l_val", "l_len")).alias("pos", "gram")
    )
    rg = R.filter(F.col("r_len") >= q).select(
        "r_id", "r_val", "r_len", F.posexplode(_gram_arr("r_val", "r_len")).alias("pos", "gram")
    )
    freq = (
        lg.select("gram")
        .unionAll(rg.select("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    w_l = Window.partitionBy("l_id").orderBy("_f", "gram", "pos")
    w_r = Window.partitionBy("r_id").orderBy("_f", "gram", "pos")
    lp = (
        lg.join(freq, "gram")
        .withColumn("_rn", F.row_number().over(w_l))
        .filter(F.col("_rn") <= pref_n)
        .select("l_id", "l_val", "l_len", "gram")
    )
    rp = (
        rg.join(freq, "gram")
        .withColumn("_rn", F.row_number().over(w_r))
        .filter(F.col("_rn") <= pref_n)
        .select("r_id", "r_val", "r_len", "gram")
    )
    cand = (
        lp.join(rp, "gram")
        .filter(F.abs(F.col("l_len") - F.col("r_len")) <= max_dist)
        .select("l_id", "l_val", "r_id", "r_val")
        .distinct()
    )
    shorts = (
        L.filter(F.col("l_len") < short_len)
        .join(
            R.filter(F.col("r_len") < short_len),
            F.abs(F.col("l_len") - F.col("r_len")) <= max_dist,
        )
        .select("l_id", "l_val", "r_id", "r_val")
    )
    out = (
        cand.unionByName(shorts)
        .distinct()
        .withColumn("dist", F.levenshtein("l_val", "r_val").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("l_id", "r_id", "l_val", "r_val", "dist")
    )
    return out


def kn_bigram_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    discount: float = 0.75,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM scoring — the smoothing CCNet's
    KenLM filter actually uses (Wenzek et al. 2020 score documents by a
    KN-smoothed 5-gram model; this is the bigram self-trained analogue,
    and the smoothing upgrade over :func:`bigram_surprisal`'s raw MLE
    bits):

        P(w|v) = (c(vw) - D)/c(v·) + D·N1+(v·)/c(v·) · N1+(·w)/N1+(··)

    with absolute discount ``D`` (Kneser & Ney 1995; Chen & Goodman
    1999). The continuation term is what separates KN from plain
    discounting: "francisco" is frequent but only ever follows "san",
    so its continuation count N1+(·francisco)=1 keeps word-salad built
    from frequent-but-glued tokens expensive — exactly the spam signal
    a web-quality filter wants. Self-trained on the scored corpus, so
    every scored bigram is in the model (no OOV path) and the result is
    a pure function of the corpus.

    Cross-engine exactness: per distinct bigram the score is integerized
    ONCE — ``microbits = floor(-log2(P) * 1e6)`` — then all per-document
    arithmetic is exact int64 (sum of tf·microbits); the reported
    ``mean_bits`` is a single int→double division. The only libm call
    sits behind a floor at 1e-6 grain on a per-row pure function, the
    same isolation discipline as the repo's other libm queries (no
    float ever enters an aggregation).

    Plan shape at 100 TB: identical to :func:`bigram_surprisal` — per-doc
    lag window over doc-sized groups, map-side-combined tf, model counts
    as THREE partial aggs over the already-collapsed bigram vocabulary
    (c1 by context, N1+ by context, N1+ by word — never re-reads the
    corpus), one scalar N1+(··) via a broadcast-joined 1-row aggregate,
    then a vocabulary join (broadcast by default).

    Returns ``(id_col, lang, n_bigrams, sum_microbits, mean_bits)``;
    single-token documents have no bigram and are absent.
    """
    # adjacent-pair zip instead of posexplode + lag window, and benign
    # all-column references on every c2 consumer so the corpus tf chain
    # materializes once (see _adjacent_pairs_col / minhash_near_dup_pairs)
    big = df.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.explode(_adjacent_pairs_col(text_col)).alias("bg"),
    ).select(
        id_col, "lang", F.col("bg.prev").alias("prev"), F.col("bg.term").alias("term")
    )
    tf = big.groupBy(id_col, "lang", "prev", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    c2 = tf.groupBy("prev", "term").agg(F.sum("tf").cast("long").alias("c2"))
    ctx = (
        c2.filter(F.length("term") >= 0)
        .groupBy("prev")
        .agg(
            F.sum("c2").cast("long").alias("c1"),
            F.count("*").cast("long").alias("n1v"),
        )
    )
    cont = (
        c2.filter((F.length("prev") >= 0) & (F.col("c2") >= 1))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n1w"))
    )
    tot = c2.filter(
        (F.length("prev") >= 0) & (F.length("term") >= 0)
    ).agg(F.count("*").cast("long").alias("n1tot"))
    model = (
        c2.join(ctx, "prev")
        .join(cont, "term")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_p",
            (F.col("c2").cast("double") - F.lit(float(discount))) / F.col("c1")
            + (F.lit(float(discount)) * F.col("n1v") * F.col("n1w"))
            / (F.col("c1") * F.col("n1tot")),
        )
        .withColumn(
            "microbits",
            F.floor(-F.log2(F.col("_p")) * F.lit(1000000.0)).cast("long"),
        )
        .select("prev", "term", "microbits")
    )
    if broadcast_vocab:
        model = F.broadcast(model)
    return (
        tf.join(model, ["prev", "term"])
        .groupBy(id_col, "lang")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("microbits")).cast("long").alias("sum_microbits"),
        )
        .withColumn(
            "mean_bits",
            F.col("sum_microbits").cast("double")
            / (F.col("n_bigrams") * F.lit(1000000).cast("long")).cast("double"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    mask_mod: int = 64,
) -> DataFrame:
    """Content-defined chunking (Rabin-style CDC, the dedup family
    behind LBFS/Venti and every dedup storage engine; FastCDC is the
    tuned descendant): split each document at positions whose k-char
    rolling-hash value ≡ 0 (mod ``mask_mod``), so chunk boundaries move
    WITH the content — insert one word at the top of a mirrored page and
    every chunk after it still aligns, which is exactly why fixed-size
    or paragraph-boundary dedup misses shifted boilerplate that CDC
    catches. Expected chunk length ≈ ``mask_mod`` chars. This is the
    storage-planning census for a 100 TB crawl archive: chunk-level
    dedup ratio ≈ how much a content-addressed page store actually has
    to keep.

    Gram hashing is the same poly31 codepoint Horner (base 257 mod
    2^31-1) as :func:`fingerprint_udf`'s oracle-reproducible scheme.
    Round 6: the cut-position scan is a vectorized pandas UDF (k Horner
    steps over shifted codepoint slices per document — guide §4.2); the
    round-5 expression form recomputed the whole k-gram fold at EVERY
    character position through interpreted higher-order lambdas, an
    O(n·k) interpreted scan measured at 11.5s for the sf0.1 census
    (1.0s after). Chunk substrings and the md5 chunk identity stay
    JVM-side expressions over the returned bounds (~n/mask_mod chunks
    per doc). Documents shorter than k+1 chars yield one whole-doc
    chunk. The chunk identity is md5 (portable across engines); the
    DuckDB oracle recomputes the identical hash/cuts with list_reduce
    and matches hash-exact.

    Returns ``(id_col, chunk_idx, chunk_len, chunk_hash)`` — one row per
    chunk, 0-based index; downstream census is a plain aggregate.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)

    def cut_positions_udf():
        M = np.int64(2147483647)

        def one(s):
            if s is None:
                s = ""
            cp = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            m = len(cp) - k + 1
            if m < 2:
                return np.empty(0, dtype=np.int32)
            acc = np.zeros(m, dtype=np.int64)
            for j in range(k):  # same vectorized Horner as fingerprint_udf
                acc = (acc * 257 + cp[j : j + m]) % M
            # gram j (0-based) starts at 1-based position j+1; eligible
            # cut positions are i in [2, n-k+1] -> j in [1, m-1]
            js = np.flatnonzero(acc[1:] % mask_mod == 0) + 1
            return (js + 1).astype(np.int32)

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def cuts_of(text: pd.Series) -> pd.Series:
            return text.map(one)

        return cuts_of

    # the UDF column must be MATERIALIZED in its own projection before any
    # higher-order lambda references it (Spark rejects a Python UDF inside
    # a lambda body; an attribute reference to its output is fine)
    staged = df.select(
        F.col(id_col),
        t.alias("_t"),
        n.alias("_n"),
        cut_positions_udf()(t).alias("_cuts"),
    )
    bounds = F.concat(
        F.array(F.lit(1).cast("int")),
        F.col("_cuts"),
        F.array((F.col("_n") + 1).cast("int")),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(bounds) - 1),
        lambda ti: F.col("_t").substr(
            F.element_at(bounds, ti),
            F.element_at(bounds, ti + 1) - F.element_at(bounds, ti),
        ),
    )
    return staged.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_chunk")
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length("_chunk").cast("long").alias("chunk_len"),
        F.md5(F.col("_chunk")).alias("chunk_hash"),
    )


def script_census(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode script census per document — the pre-langid triage of a
    multilingual web corpus (CLD/fastText pipelines gate on script
    first: Latin text never needs the CJK model, and a "Latin" page
    that is 40% Cyrillic codepoints is mixed-script spam or mojibake
    the single-label langid hides). Counts codepoints in five coarse
    script buckets plus digits/whitespace/other:

        latin  U+0041–U+024F (incl. extended)   cyrillic U+0400–U+04FF
        cjk    U+3040–U+30FF, U+3400–U+9FFF     arabic   U+0600–U+06FF
        greek  U+0370–U+03FF

    Returns exact int64 counts ``(id_col, n_chars, n_latin, n_cyrillic,
    n_cjk, n_arabic, n_greek, n_digit, n_space, n_other)`` and
    ``main_script`` = argmax bucket (ties broken by the column order
    above, 'none' for empty docs). Pure expressions — one
    transform-to-codepoints + aggregate fold per row inside codegen, no
    UDF, no shuffle; the census aggregate downstream is the caller's.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    cps = F.transform(
        F.split(t, ""),
        lambda ch: F.ascii(ch),
    )

    def count_in(lo, hi, extra=None):
        def pred(c):
            p = (c >= lo) & (c <= hi)
            if extra:
                p = p | ((c >= extra[0]) & (c <= extra[1]))
            return p

        return F.size(F.filter(cps, pred)).cast("long")

    n_digit = F.size(
        F.filter(cps, lambda c: (c >= 0x30) & (c <= 0x39))
    ).cast("long")
    n_space = F.size(
        F.filter(cps, lambda c: (c == 0x20) | (c == 0x09) | (c == 0x0A) | (c == 0x0D))
    ).cast("long")
    buckets = {
        "n_latin": count_in(0x41, 0x24F),
        "n_cyrillic": count_in(0x400, 0x4FF),
        "n_cjk": count_in(0x3040, 0x30FF, extra=(0x3400, 0x9FFF)),
        "n_arabic": count_in(0x600, 0x6FF),
        "n_greek": count_in(0x370, 0x3FF),
    }
    out = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        *[v.alias(k) for k, v in buckets.items()],
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
    )
    out = out.withColumn(
        "n_other",
        (
            F.col("n_chars")
            - F.col("n_latin")
            - F.col("n_cyrillic")
            - F.col("n_cjk")
            - F.col("n_arabic")
            - F.col("n_greek")
            - F.col("n_digit")
            - F.col("n_space")
        ).cast("long"),
    )
    order = ["n_latin", "n_cyrillic", "n_cjk", "n_arabic", "n_greek"]
    best = F.lit("none")
    best_n = F.lit(0).cast("long")
    for name in order:  # strict '>' in forward order: first bucket wins ties
        cond = F.col(name) > best_n
        best = F.when(cond, F.lit(name[2:])).otherwise(best)
        best_n = F.when(cond, F.col(name)).otherwise(best_n)
    return out.withColumn("main_script", best)


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_n: int = 500,
) -> DataFrame:
    """Zipf-law fit per language: OLS slope of ln(freq) on ln(rank) over
    the ``top_n`` most frequent terms — the one-number corpus-health
    diagnostic (natural text sits near slope -1; boilerplate/spam floods
    flatten it, template explosions steepen it; cf. Piantadosi 2014
    review).  Companion to the Heaps-style ``vocab_coverage``: that one
    watches vocabulary growth, this one watches the frequency spectrum.

    Cross-engine exactness (the repo's integerize-early discipline):
    each term contributes ``ix = floor(ln(rank)*1e3)``, ``iy =
    floor(ln(tf)*1e3)`` ONCE per (lang, term) row; all sums (n, Σx, Σy,
    Σxy, Σx²) are exact int64 — with the 1e-3 grain, ``n·Σxy`` stays
    below ~2e13 for any corpus, nowhere near int64 — and the slope /
    intercept are two closed-form float expressions over those integers
    (the grain cancels in the slope; the intercept divides it back out).
    No float ever enters an aggregation.

    Plan shape at 100 TB: term frequencies are ONE map-side-combined
    aggregate over (lang, term); the rank window sorts only the already
    collapsed per-language vocabulary (the drain's histogram precut
    applies if a vocabulary is pathological); the OLS sums aggregate
    <= top_n rows per language.

    Returns (lang, n_terms, slope, intercept_ln) — slope unitless,
    intercept in ln-frequency units, both rounded 6 dp.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    tf = (
        df.select(F.col(lang_col).alias("lang"), F.explode(toks).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("tf").desc(), F.col("term").asc())
    ranked = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "lang",
            F.floor(F.log(F.col("rank").cast("double")) * 1000.0)
            .cast("long")
            .alias("ix"),
            F.floor(F.log(F.col("tf").cast("double")) * 1000.0)
            .cast("long")
            .alias("iy"),
        )
    )
    sums = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("ix").cast("long").alias("sx"),
        F.sum("iy").cast("long").alias("sy"),
        F.sum(F.col("ix") * F.col("iy")).cast("long").alias("sxy"),
        F.sum(F.col("ix") * F.col("ix")).cast("long").alias("sxx"),
    )
    n = F.col("n_terms")
    slope = (
        (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / (n.cast("double") * 1000.0)
    )
    return sums.filter(n >= 2).select(
        "lang",
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept_ln"),
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> DataFrame:
    """Heaps-law fit per language: OLS of ln(vocabulary) on ln(tokens)
    over nested corpus prefixes — V(N) ≈ K·N^β, the growth-side corpus
    diagnostic that pairs with :func:`zipf_fit`'s frequency side
    (Heaps 1978; natural text sits at β ≈ 0.4–0.6, template floods push
    β → 0, id-soup pushes β → 1).

    Nested prefixes WITHOUT re-reading the corpus per point: documents
    hash to ``n_buckets`` buckets (doc_id % n_buckets); the measurement
    points are the nested subsets ``bucket < m`` for m = 1, 2, 4, ...,
    n_buckets.  One explode gives (lang, term, bucket); per (lang, term)
    a map-side-combined ``min(bucket)`` marks WHERE the term first
    appears, so V_m = #terms with min_bucket < m and N_m = Σ tokens in
    buckets < m — both read from aggregates at vocabulary / bucket
    cardinality, never a per-point rescan.

    Same integerize-early OLS as zipf_fit: each point contributes
    ``floor(ln·1e3)`` ints once, sums exact int64, slope/intercept two
    closed-form float expressions.  Returns (lang, n_points, beta,
    k_ln) — k_ln is ln K; rounded 6 dp.
    """
    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two >= 2")
    import math as _math

    ms = [1 << i for i in range(int(_math.log2(n_buckets)) + 1)]
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) >= 1,
    )
    tok = df.select(
        F.col(lang_col).alias("lang"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).alias("b"),
        F.explode(toks).alias("term"),
    )
    first_seen = tok.groupBy("lang", "term").agg(F.min("b").alias("min_b"))
    v_by_bucket = first_seen.groupBy("lang", "min_b").agg(
        F.count(F.lit(1)).cast("long").alias("nv")
    )
    n_by_bucket = tok.groupBy("lang", "b").agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    # ONE lineage for all points: densify to the full (lang x bucket)
    # grid, one cumulative window over <= n_buckets rows per language,
    # then read V_m / N_m off the running totals at b = m-1.  (The naive
    # per-m union re-plans the token explode once per point — 4x the
    # scan in the static plan.)
    grid = (
        df.select(F.col(lang_col).alias("lang"))
        .distinct()
        .select(
            "lang",
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("b"),
        )
    )
    dense = (
        grid.join(
            v_by_bucket.withColumnRenamed("min_b", "b"), ["lang", "b"], "left"
        )
        .join(n_by_bucket, ["lang", "b"], "left")
        .select(
            "lang",
            "b",
            F.coalesce("nv", F.lit(0)).cast("long").alias("nv"),
            F.coalesce("nt", F.lit(0)).cast("long").alias("nt"),
        )
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy(F.col("b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.select(
        "lang",
        "b",
        F.sum("nv").over(wcum).cast("long").alias("v"),
        F.sum("nt").over(wcum).cast("long").alias("n"),
    )
    points = cum.filter(F.col("b").isin([m - 1 for m in ms]))
    xy = points.filter((F.col("v") > 0) & (F.col("n") > 0)).select(
        "lang",
        F.floor(F.log(F.col("n").cast("double")) * 1000.0).cast("long").alias("ix"),
        F.floor(F.log(F.col("v").cast("double")) * 1000.0).cast("long").alias("iy"),
    )
    sums = xy.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("ix").cast("long").alias("sx"),
        F.sum("iy").cast("long").alias("sy"),
        F.sum(F.col("ix") * F.col("iy")).cast("long").alias("sxy"),
        F.sum(F.col("ix") * F.col("ix")).cast("long").alias("sxx"),
    )
    n = F.col("n_points")
    beta = (
        (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    k_ln = (
        (F.col("sy").cast("double") - beta * F.col("sx").cast("double"))
        / (n.cast("double") * 1000.0)
    )
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.filter((n >= 2) & (denom > 0)).select(
        "lang",
        "n_points",
        F.round(beta, 6).alias("beta"),
        F.round(k_ln, 6).alias("k_ln"),
    )


def lsh_plan(num_perm: int = 128, target_jaccard: float = 0.8) -> dict:
    """Pick MinHash-LSH banding (bands b × rows r, b·r = num_perm) for a
    target Jaccard threshold — the design calculation behind
    :func:`minhash_candidate_pairs`'s defaults (Leskovec/Rajaraman/
    Ullman, MMDS ch.3): the S-curve P(candidate | J) = 1−(1−J^r)^b has
    its inflection near t ≈ (1/b)^(1/r); choose the divisor pair with
    the LARGEST t that does not exceed the target (recall bias: a
    threshold above target silently loses true pairs, below it only
    costs verify work — the side dedup must err on), falling back to
    the closest pair when every t is above target.  The full curve is
    reported so the caller can eyeball recall at J = target and
    precision below it.

    Driver-side arithmetic over ~a dozen divisor pairs — this is a
    PLANNER, not a distributed op; its output parameterizes the
    distributed one.  Returns {"bands", "rows", "threshold", "curve"}
    where curve maps J (0.1..0.9) to candidate probability for the
    chosen pair.
    """
    if num_perm < 2:
        raise ValueError("num_perm must be >= 2")
    if not 0.0 < target_jaccard < 1.0:
        raise ValueError("target_jaccard must be in (0, 1)")
    pairs = [
        (b, num_perm // b)
        for b in range(1, num_perm + 1)
        if num_perm % b == 0 and num_perm // b >= 1
    ]
    def t_of(br):
        return (1.0 / br[0]) ** (1.0 / br[1])

    under = [p for p in pairs if t_of(p) <= target_jaccard]
    best = (
        max(under, key=t_of)
        if under
        else min(pairs, key=lambda p: abs(t_of(p) - target_jaccard))
    )
    b, r = best
    curve = {
        round(j / 10.0, 1): round(1.0 - (1.0 - (j / 10.0) ** r) ** b, 6)
        for j in range(1, 10)
    }
    return {
        "bands": b,
        "rows": r,
        "threshold": round((1.0 / b) ** (1.0 / r), 6),
        "curve": curve,
    }


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: top-k terms by tf·idf (Salton &
    Buckley 1988 — the snippet/tagging/related-search workhorse;
    :func:`rare_term_topk` is its corpus-level census cousin, this is
    the per-document view).

    Exactness discipline: idf is integerized ONCE per distinct term —
    ``idf_micro = floor(ln(N/df)·1e6)`` — so every per-document score is
    exact int64 (``tf · idf_micro``; tf ≤ doc length, idf_micro ≤ ~21e6
    → far under 2^63) and ranking never compares floats.  Ties break
    (score desc, term asc): deterministic at any parallelism.

    Plan shape: tf = one map-side-combined aggregate at (doc, term)
    cardinality; df + N = two aggregates over the collapsed vocabulary
    (N via a broadcast 1-row aggregate, the repo's scalar idiom); the
    top-k window partitions BY DOCUMENT — thousands of tiny groups, the
    cheapest window shape there is.  Returns (id_col, rank, term, tf,
    idf_micro, score_micro).
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) >= 2,
    )
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    n_docs = df.select(
        F.countDistinct(id_col).cast("long").alias("n_docs")
    )
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.floor(
            F.log(F.col("n_docs").cast("double") / F.col("df_docs").cast("double"))
            * 1000000.0
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = tf.join(idf, "term").select(
        id_col,
        "term",
        "tf",
        "idf_micro",
        (F.col("tf") * F.col("idf_micro")).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "idf_micro", "score_micro")
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch Reading Ease + Flesch–Kincaid grade level per document — the
    oldest quality signals in the filter family (Flesch 1948; Kincaid et
    al. 1975), still used to triage boilerplate-ish legalese and
    SEO-stuffed word salad that length/stopword gates miss.

    Counting rules are fixed and engine-twin-exact, all evaluated inside
    whole-stage codegen (three ``regexp_count`` scans per row, no UDF, no
    explode — the expression-only alternative to tokenizing the corpus):

    - ``words``     = ``regexp_count(text, '\\S+')``
    - ``sentences`` = ``max(regexp_count(text, '[.!?]+'), 1)`` — runs of
      terminators count once ("!?" is one boundary), unterminated text is
      one sentence
    - ``syllables`` = ``max(regexp_count(lower(text), '[aeiouy]+'), words)``
      — the classic vowel-group heuristic with the one-syllable-per-word
      floor applied globally (exact per-word flooring needs a tokenize +
      explode; the global floor differs only on consonant-only tokens)

    Scores are the published formulas in fixed IEEE-double operation
    order, rounded to 6 decimals:

        flesch   = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
        fk_grade = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59

    Zero-word documents are dropped (both ratios are undefined).
    Per-document, embarrassingly parallel: no shuffle at any scale.
    """
    words = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("long")
    sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("long"),
        F.lit(1).cast("long"),
    )
    vgroups = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+")).cast(
        "long"
    )
    counted = df.select(
        F.col(id_col).alias("doc_id"),
        words.alias("words"),
        sentences.alias("sentences"),
        F.greatest(vgroups, words).alias("syllables"),
    ).filter(F.col("words") >= 1)
    wps = F.col("words").cast("double") / F.col("sentences").cast("double")
    spw = F.col("syllables").cast("double") / F.col("words").cast("double")
    return counted.select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
        ).alias("flesch"),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ).alias("fk_grade"),
    )


def chunk_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window passage chunking — the retrieval-side prep step
    (RAG / dense-passage indexing, cf. Karpukhin et al. 2020 DPR's
    100-word passages): split each document into ``size``-word windows
    every ``stride`` words (overlap = ``size − stride``), so a fact
    straddling a window boundary still appears whole in the next window.
    The retrieval twin of :func:`pack_sequences` (which packs for
    PRETRAINING — cross-doc concat, no overlap; this chunks for INDEXING —
    per-doc windows, overlap, no cross-doc mixing).

    Words are ``\\s+``-separated non-empty tokens (the same rule as
    :func:`readability`). Window starts are ``1, 1+stride, 1+2·stride, …``
    while ``start ≤ n_words``, so every word lands in ≥ 1 passage, the
    final passage may be short, and a document shorter than ``size``
    yields exactly one passage. ``chunk_id`` is the 0-based window index;
    ``n_words`` the window's actual word count.

    Expression-only: one split + one ``sequence``-explode + one
    ``slice``/``array_join`` per row — per-document, embarrassingly
    parallel, no shuffle at any scale; output cardinality is
    ``Σ ceil(max(n_i − size, 0)/stride) + 1`` rows, the index's true size.
    """
    if size < 1 or stride < 1:
        raise ValueError("chunk_passages: size and stride must be >= 1")
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), words.alias("_words")
    ).filter(F.size("_words") >= 1)
    starts = F.sequence(F.lit(1), F.size("_words"), F.lit(stride))
    exploded = base.select(
        "doc_id", "_words", F.posexplode(starts).alias("chunk_id", "_start")
    )
    window = F.slice(F.col("_words"), F.col("_start"), size)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("n_words"),
        F.array_join(window, " ").alias("passage"),
    )


def term_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Corpus drift census between two crawl snapshots: the terms whose
    unigram probability moved the most — the monitoring signal a
    continuously-refreshed training corpus needs (topic surges, spam
    injections, a broken extractor suddenly leaking markup tokens all
    show up here before any downstream metric moves).

    Terms are lowercased ``\\s+`` tokens. Each side's Laplace-smoothed
    probability is ``p = (c+1)/(N+V)`` (``N`` = side's token count,
    ``V`` = union vocabulary size, so unseen-on-one-side terms get a
    finite probability). Drift is the symmetric probability ratio
    ``max(p_new/p_old, p_old/p_new)`` — the exp of |log-ratio|, same
    ranking, but NO transcendental calls: two divisions and a
    ``greatest`` in fixed IEEE order, so any engine replaying the
    expression agrees bitwise (the house tfidf integerized-ln trick is
    unnecessary here). ``direction`` is +1 for rising terms, −1 falling.

    Scale shape: two map-side-combined term counts, three broadcast
    1-row scalars, ONE term-keyed full-outer join, and a global top-k
    that plans as TakeOrderedAndProject (never a full sort). Probability
    arithmetic is division-first, so no int64-overflowing cross
    products at any corpus size. Ties break (drift desc, term asc) —
    the returned SET is deterministic cross-engine.
    """
    if k < 1:
        raise ValueError("term_drift: k must be >= 1")

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        toks = F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("term")
        return df.select(toks).groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    co = side_counts(old, "c_old")
    cn = side_counts(new, "c_new")
    joined = co.join(cn, "term", "full_outer").select(
        "term",
        F.coalesce("c_old", F.lit(0)).cast("long").alias("c_old"),
        F.coalesce("c_new", F.lit(0)).cast("long").alias("c_new"),
    )
    scalars = joined.agg(
        F.sum("c_old").cast("double").alias("n_old"),
        F.sum("c_new").cast("double").alias("n_new"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    p_old = (F.col("c_old") + F.lit(1)).cast("double") / (
        F.col("n_old") + F.col("vocab")
    )
    p_new = (F.col("c_new") + F.lit(1)).cast("double") / (
        F.col("n_new") + F.col("vocab")
    )
    drift = F.greatest(p_new / p_old, p_old / p_new)
    return (
        joined.crossJoin(F.broadcast(scalars))
        .select(
            "term",
            "c_old",
            "c_new",
            F.round(drift, 6).alias("drift"),
            F.when(p_new >= p_old, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("int")
            .alias("direction"),
        )
        .orderBy(F.desc("drift"), F.asc("term"))
        .limit(k)
    )


# --------------------------------------------------- STRAND bitext candidates

# Language tokens recognized in URL structure. Deliberately a fixed,
# documented list (ISO 639-1 codes common on multilingual sites): the
# token set is part of the operator's contract — engine and any SQL
# oracle must agree on it, so it is data, not configuration magic.
STRAND_LANGS: tuple[str, ...] = (
    "en", "fr", "de", "es", "it", "pt", "nl", "ru", "zh", "ja", "ko",
    "ar", "vi", "tr", "pl", "sv", "cs", "el", "hi", "id", "th", "uk",
)


def strand_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    len_col: str = "n_chars",
    langs: tuple[str, ...] = STRAND_LANGS,
    max_ratio_pm: int = 250,
    max_bucket: int = 64,
) -> DataFrame:
    """STRAND-style bitext candidate mining from URL structure (Resnik &
    Smith, Computational Linguistics 2003 — "The Web as a Parallel
    Corpus"; the document-alignment front end of ParaCrawl): two pages on
    the same site whose URLs are IDENTICAL once a language token is
    substituted out (``/en/about`` vs ``/fr/about``, ``?lang=en`` vs
    ``?lang=de``) are candidate translations of each other. This is the
    cheap, structural first stage that feeds the embedding-margin stage
    (:func:`frontier_engine.ann.margin_mine`) — URLs alone cut the
    O(n²) cross-lingual search space to near-linear before any vector
    is computed. The reference's bilingual name columns (name/name_en,
    /root/reference/crawler/stores/cooponline.py:323-342) are the
    two-site special case of this "same key, two languages" pairing.

    Semantics: a URL participates iff a language token from ``langs``
    appears as (a) a whole path segment (``/en/`` or a trailing
    ``/en``) or (b) a ``lang=xx`` query value. The alignment key is the
    URL with every such token replaced by the placeholder ``~L~``; the
    page's URL-language is the FIRST token found (path wins over
    query). Pairs are emitted per distinct key for ``lang_a < lang_b``
    (same-language twins are mirrors, not translations — see
    :func:`frontier_engine.hostctl.mirror_hosts` for those), gated by
    the Resnik-Smith length-ratio filter: documents whose sizes differ
    by more than ``max_ratio_pm``/1000 of the larger are dropped
    (translations have near-proportional lengths). All arithmetic is
    integer permille — no float enters selection, so the emitted
    ``len_ratio_pm`` is engine-exact.

    Every expression here (alternation regexes with no lookaround, 'g'
    replacement, integer div) evaluates identically under Java regex
    and RE2, so a plain-SQL oracle can replay it verbatim.

    Plan shape at 100 TB: key/lang extraction is expression-only over
    the scan; one aggregate counts per-key group sizes and a key-keyed
    join filters buckets larger than ``max_bucket`` (a key shared by
    hundreds of pages is a template artifact, not a translation set —
    the same bucket-cap convention as the LSH band join), then ONE
    self-join on the key whose per-key output is bounded by
    ``max_bucket²``. Both join sides hash-partition on the key; no
    window, no sort, no UDF.
    """
    if max_ratio_pm < 0 or max_bucket < 2:
        raise ValueError("strand_pairs: need max_ratio_pm >= 0, max_bucket >= 2")
    alt = "|".join(langs)
    url = F.col(url_col)
    # The /xx/ replace runs TWICE: with adjacent segments ('/en/fr/x') the
    # first 'g' pass consumes the shared '/', so 'fr' survives pass one and
    # is substituted in pass two. The 'lang=' token is boundary-anchored
    # ('?slang=en', '?hreflang=en', '?lang=english' must not match) with
    # capture-group backreferences rather than lookaround, so the DuckDB
    # oracle (RE2: no lookbehind) replays the exact expression.
    key = F.regexp_replace(url, f"/({alt})/", "/~L~/")
    key = F.regexp_replace(key, f"/({alt})/", "/~L~/")
    key = F.regexp_replace(key, f"/({alt})$", "/~L~")
    key = F.regexp_replace(key, f"(^|[?&])lang=({alt})(&|$)", "$1lang=~L~$3")
    path_lang = F.regexp_extract(url, f"/({alt})(/|$)", 1)
    query_lang = F.regexp_extract(url, f"(^|[?&])lang=({alt})(&|$)", 2)
    lang = F.coalesce(
        F.nullif(path_lang, F.lit("")), F.nullif(query_lang, F.lit(""))
    )
    keyed = (
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(len_col).cast("long").alias("_len"),
            key.alias("_key"),
            lang.alias("_lang"),
        )
        .filter(F.col("_lang").isNotNull())
    )
    small = keyed.join(
        keyed.groupBy("_key").agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket).select("_key"),
        "_key",
    )
    a, b = small.alias("a"), small.alias("b")
    la, lb = F.col("a._len"), F.col("b._len")
    # the 1L floor keeps the ratio division total (two empty documents
    # pair at ratio 0 instead of dividing by zero — and keeps a plain-SQL
    # oracle's integer division total too)
    bigger = F.greatest(la, lb, F.lit(1).cast("long"))
    return (
        a.join(b, on=[F.col("a._key") == F.col("b._key"),
                      F.col("a._lang") < F.col("b._lang")])
        .filter(F.abs(la - lb) * 1000 <= F.lit(max_ratio_pm) * bigger)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._lang").alias("lang_a"),
            F.col("b._lang").alias("lang_b"),
            F.expr("abs(a._len - b._len) * 1000L div greatest(a._len, b._len, 1L)")
            .cast("long")
            .alias("len_ratio_pm"),
        )
    )
