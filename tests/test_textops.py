"""Dedup / text-analysis operators — duckdb-cross-checked where SQL can."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from frontier_engine import textops as TX

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_exact_dedup_vs_duckdb(spark, docs):
    kept = TX.exact_dedup(docs)
    got = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"select min(doc_id) from '{DOCS}' group by text"
        ).fetchall()
    )
    assert got == want


def test_duplicate_groups(spark, docs):
    groups = TX.duplicate_groups(docs).collect()
    n_dupes = duckdb.sql(
        f"select coalesce(sum(c),0) from (select count(*) c from '{DOCS}' group by text having count(*)>1)"
    ).fetchone()[0]
    assert len(groups) == n_dupes
    for g in groups:
        assert g["canonical_id"] <= g["doc_id"]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "text string")
    rows = df.select(TX.word_shingles(F.col("text"), 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == ["x y"]  # shorter than k → whole text


NEAR_DUP_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away home tonight"),
    (2, "the quick brown fox jumps over the lazy dog and runs far away home today"),
    (3, "completely different content about spark distributed dataflow engines at scale"),
    (4, "the quick brown fox jumps over the lazy dog and runs far away home tonight"),
    (5, "yet another unrelated document mentioning parquet columnar storage formats"),
]


@pytest.fixture(scope="module")
def near_df(spark):
    return spark.createDataFrame(NEAR_DUP_DOCS, "doc_id long, text string")


def test_minhash_lsh_finds_near_dups(spark, near_df):
    cand = TX.minhash_candidate_pairs(near_df, num_perm=64, bands=16)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cand.collect()}
    assert (1, 4) in got and got[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in got and got[(1, 2)] > 0.5   # near dup
    assert (3, 5) not in got                      # unrelated never collide


def test_minhash_mega_cluster_is_linear(spark):
    """A planted 1,000-doc identical cluster (the web-template skew case):

    - distinct-signature discipline: the cluster is ONE group row, so the
      banded intermediate is O(1) per band, not a K-long bucket array;
    - pair_mode='star' emits O(K) pairs (K-1 intra star edges), not K²/2;
    - pair_mode='all' still emits the exact historical clique, and its
      connected components equal the star components.
    """
    K = 1000
    cluster = [(i, "the exact same boilerplate template page body text here") for i in range(K)]
    singles = [
        (K + i, f"unique document number {i} with distinct content token{i} mark{i * 7}")
        for i in range(20)
    ]
    df = spark.createDataFrame(cluster + singles, "doc_id long, text string")

    cached: list = []
    star = TX.minhash_candidate_pairs(
        df, num_perm=64, bands=16, attach_estimate=False, pair_mode="star", cached=cached
    )
    star_pairs = {(r["id_a"], r["id_b"]) for r in star.collect()}
    try:
        # O(K) pair cardinality: the cluster contributes exactly K-1 star edges
        cluster_edges = {p for p in star_pairs if p[0] < K and p[1] < K}
        assert cluster_edges == {(0, i) for i in range(1, K)}
        # the intermediate is signature groups, not docs: one group row of
        # size K, so every band bucket saw the cluster once
        group_sizes = sorted(
            (len(r["ids"]) for r in cached[0].collect()), reverse=True
        )
        assert group_sizes[0] == K and (len(group_sizes) == 1 or group_sizes[1] == 1)
    finally:
        for c in cached:
            c.unpersist()

    # 'all' mode keeps the exact clique (historical output contract) on a
    # smaller planted cluster, and components agree with star mode
    small = spark.createDataFrame(
        [(i, "another identical body of text repeated") for i in range(60)]
        + [(100 + i, f"singleton number {i} content word{i}") for i in range(5)],
        "doc_id long, text string",
    )
    allp = TX.minhash_candidate_pairs(small, num_perm=64, bands=16, attach_estimate=False)
    all_pairs = {(r["id_a"], r["id_b"]) for r in allp.collect()}
    assert {p for p in all_pairs if p[0] < 100 and p[1] < 100} == {
        (a, b) for a in range(60) for b in range(a + 1, 60)
    }
    star_small = TX.minhash_candidate_pairs(
        small, num_perm=64, bands=16, attach_estimate=False, pair_mode="star"
    )
    comp_all = {
        (r["v"], r["label"]) for r in TX.connected_components(allp).collect()
    }
    comp_star = {
        (r["v"], r["label"]) for r in TX.connected_components(star_small).collect()
    }
    assert comp_all == comp_star


def test_ngram_jaccard_verifies(spark, near_df):
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
         TX.ngram_jaccard_pairs(near_df, pairs).collect()}
    assert j[(1, 4)] == 1.0
    assert 0.5 < j[(1, 2)] < 1.0
    assert (1, 3) not in j or j.get((1, 3), 0.0) == 0.0  # zero intersection drops out


def test_minhash_near_dup_pairs_fused(spark, near_df):
    """The round-6 fused candidates+verify path finds the same pairs with
    the same exact jaccard values as the two-stage legacy pipeline."""
    fused = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             TX.minhash_near_dup_pairs(near_df, num_perm=64, bands=16).collect()}
    assert fused[(1, 4)] == 1.0          # exact dup
    assert 0.5 < fused[(1, 2)] < 1.0     # near dup above threshold
    assert all(k not in fused for k in [(1, 3), (3, 5)])


def test_minhash_near_dup_pairs_equals_legacy(spark):
    """Fused path == candidate_pairs -> ngram_jaccard_pairs on the sf0.001
    documents corpus (pair set AND jaccard doubles, both ways)."""
    docs = spark.read.parquet(DOCS)
    fused = TX.minhash_near_dup_pairs(docs, num_perm=128, bands=32)
    cand = TX.minhash_candidate_pairs(docs, num_perm=128, bands=32, attach_estimate=False)
    legacy = (
        TX.ngram_jaccard_pairs(docs, cand, k=3, scope_to_pairs=True)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in fused.collect()}
    want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in legacy.collect()}
    assert got == want and len(got) > 0


def test_minhash_near_dup_pairs_mega_cluster(spark):
    """A planted identical-text cluster: the fused path emits the full
    clique at jaccard 1.0 (the 'all'-mode contract the exact verify
    needs) while banding stays at distinct-signature cardinality."""
    k = 40
    rows = [(i, "same boilerplate body repeated for every page in the site") for i in range(k)]
    rows += [(1000, "an entirely different document about something else entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.minhash_near_dup_pairs(df, num_perm=64, bands=16).collect()
    assert len(out) == k * (k - 1) // 2
    assert all(r["jaccard"] == 1.0 for r in out)


def test_simhash_near_dups(spark, near_df):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             TX.simhash_near_dup_pairs(near_df, max_hamming=6).collect()}
    assert pairs.get((1, 4)) == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (3, 5) not in pairs


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("vi", "sữa tươi đặc biệt cho trẻ em và gia đình"),
            ("en", "the quick brown fox is one of the animals in the story"),
            ("other", "zzz qqq kkk www"),
        ],
        "want string, text string",
    )
    rows = df.select("want", TX.lang_id_col(F.col("text")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], r


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            ("clean", "This is a well formed paragraph of reasonable length with many normal words present here."),
            ("junk", "!!! ??? ### 123 456 789 !!! a b c d e !!!"),
        ],
        "kind string, text string",
    )
    rows = {r["kind"]: r["q"] for r in df.select("kind", TX.quality_score_col(F.col("text")).alias("q")).collect()}
    assert rows["clean"] > rows["junk"]
    assert 0.0 <= rows["junk"] < rows["clean"] <= 1.0


def test_token_count_vs_duckdb(spark, docs):
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", TX.token_count_col(F.col("text")).alias("n")).collect()
    }
    want = dict(
        duckdb.sql(
            f"select doc_id, len(string_split_regex(trim(text), '\\s+')) from '{DOCS}'"
        ).fetchall()
    )
    assert got == want


def test_fingerprint(spark):
    fp = TX.fingerprint_udf()
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789"), (2, "abcdefghijklmnopqrstuvwxyz0123456789"),
         (3, "completely different text body here entirely"), (4, "xy")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["f"] for r in df.select("doc_id", fp(F.col("text")).alias("f")).collect()}
    assert rows[1] == rows[2] and len(rows[1]) > 0
    assert rows[1] != rows[3]
    assert rows[4] == []  # shorter than k-gram window


def test_repetition_stats(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "a a a a"),               # ttr 0.25, bigrams: all "a a" → dup 2/3
        (2, "w x y z"),               # all distinct
        (3, ""),                      # empty → ttr 1.0, dup 0.0
        (4, "one"),                   # single token → no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ttr, dup = TX.repetition_stats_col(F.col("text"))
    got = {r["doc_id"]: r for r in df.select("doc_id", ttr.alias("t"), dup.alias("d")).collect()}
    assert got[1]["t"] == 0.25 and abs(got[1]["d"] - (1 - 1 / 3)) < 1e-6
    assert got[2]["t"] == 1.0 and got[2]["d"] == 0.0
    assert got[3]["t"] == 1.0 and got[3]["d"] == 0.0
    assert got[4]["t"] == 1.0 and got[4]["d"] == 0.0


def test_stratified_sample_deterministic(spark):
    from frontier_engine import ops

    rows = [(i, "en" if i % 2 == 0 else "vi", f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    s1 = ops.stratified_sample(df, ["lang", "source"], k=4, id_col="doc_id")
    got = s1.groupBy("lang", "source").count().collect()
    assert all(r["count"] == 4 for r in got) and len(got) == 6
    # deterministic across repartitionings
    a = sorted(r["doc_id"] for r in s1.collect())
    s2 = ops.stratified_sample(df.repartition(13), ["lang", "source"], k=4, id_col="doc_id")
    assert sorted(r["doc_id"] for r in s2.collect()) == a


def test_rare_term_topk(spark):
    # corpus: "rare" appears in one doc only (df=1), "common" in all three
    # (df=3).  tf/(df+1): doc 1 scores rare 2/2=1.0 > common 3/4=0.75.
    rows = [
        (1, "rare rare common common common"),
        (2, "common mid"),
        (3, "common mid"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["rank"]): r
        for r in TX.rare_term_topk(df, k=2).collect()
    }
    assert got[(1, 1)]["term"] == "rare" and got[(1, 1)]["score"] == 1.0
    assert got[(1, 2)]["term"] == "common" and got[(1, 2)]["score"] == 0.75
    # docs 2/3: mid (tf 1, df 2) scores 1/3 > common (tf 1, df 4) 0.25;
    # rank is dense per doc and ties on score break by term asc
    assert got[(2, 1)]["term"] == "mid" and got[(3, 1)]["term"] == "mid"
    assert got[(2, 2)]["term"] == "common"
    # determinism across parallelism
    a = sorted(map(tuple, TX.rare_term_topk(df, k=2).collect()))
    b = sorted(map(tuple, TX.rare_term_topk(df.repartition(7), k=2).collect()))
    assert a == b


def test_connected_components(spark):
    # two components: a 4-chain 1-2-3-9 (transitivity across hops) and a
    # pair 5-7; labels must be the component-min id
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (9, 3), (5, 7)], ["id_a", "id_b"]
    )
    got = {r["v"]: r["label"] for r in TX.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}
    # deterministic across parallelism
    got2 = {
        r["v"]: r["label"]
        for r in TX.connected_components(edges.repartition(5)).collect()
    }
    assert got2 == got
    # self-loops and duplicate edges are harmless
    edges3 = edges.union(spark.createDataFrame([(1, 1), (2, 1)], ["id_a", "id_b"]))
    got3 = {r["v"]: r["label"] for r in TX.connected_components(edges3).collect()}
    assert got3 == got


def test_decontaminate(spark):
    # eval doc: "a b c d"; its 3-shingles: {"a b c", "b c d"}
    ev = spark.createDataFrame([(100, "a b c d")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "x a b c y"),        # hits "a b c" once → 1
            (2, "a b c d e"),        # hits both → 2
            (3, "c b a"),            # no shared shingle
            (4, "zz"),               # short doc, single-shingle path
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n_hit_shingles"] for r in TX.decontaminate(corpus, ev).collect()}
    assert got == {1: 1, 2: 2}
    # short eval doc exercises the n<k single-shingle branch on the eval side
    ev2 = spark.createDataFrame([(100, "zz")], ["doc_id", "text"])
    got2 = {r["doc_id"]: r["n_hit_shingles"] for r in TX.decontaminate(corpus, ev2).collect()}
    assert got2 == {4: 1}


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.b-c+x@sub.example.org today"),
            (2, "server 192.168.1.254 then call +84-90-1234-567"),
            (3, "no pii here"),
            (4, "two mails a@b.io c@d.co and ip 1.2.3.4"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in TX.pii_scrub(df).collect()}
    assert rows[1]["scrubbed"] == "mail me at <EMAIL> today"
    assert (rows[1]["n_emails"], rows[1]["n_ipv4"], rows[1]["n_phones"]) == (1, 0, 0)
    assert rows[2]["scrubbed"] == "server <IP> then call <PHONE>"
    assert (rows[2]["n_ipv4"], rows[2]["n_phones"]) == (1, 1)
    assert rows[3]["scrubbed"] == "no pii here"
    assert (rows[3]["n_emails"], rows[3]["n_ipv4"], rows[3]["n_phones"]) == (0, 0, 0)
    assert rows[4]["scrubbed"] == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert rows[4]["n_emails"] == 2


def test_paragraph_dedup_first_wins(spark):
    # "boiler" appears in docs 1, 2, 3; first occurrence is (1, pos 1)
    df = spark.createDataFrame(
        [
            (1, "alpha\nboiler\nbeta"),
            (2, "boiler\ngamma"),
            (3, "delta\n\nboiler"),   # empty paragraph is dropped entirely
        ],
        ["doc_id", "text"],
    )
    out = TX.paragraph_dedup(df).collect()
    got = {(r["doc_id"], r["pos"]): (r["paragraph"], r["keep"]) for r in out}
    # empty paragraph (3, pos 1) filtered out
    assert (3, 1) not in got
    assert got[(1, 1)] == ("boiler", True)
    assert got[(2, 0)] == ("boiler", False)
    assert got[(3, 2)] == ("boiler", False)
    # unique paragraphs all kept
    assert all(keep for (d, p), (para, keep) in got.items() if para != "boiler")
    assert len(got) == 7


# ------------------------------------------------- encoding repair


def test_fix_mojibake_round_trip_every_char(spark):
    from frontier_engine.textops import MOJIBAKE_CHARS, _as_cp1252_mojibake, fix_mojibake

    rows = [
        (i, f"x {_as_cp1252_mojibake(ch)} y", f"x {ch} y")
        for i, ch in enumerate(MOJIBAKE_CHARS)
    ]
    df = spark.createDataFrame(
        [(i, broken) for i, broken, _ in rows], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
    for i, broken, fixed in rows:
        assert got[i]["fixed"] == fixed, (broken, got[i]["fixed"], fixed)
        assert got[i]["was_mojibake"] is True
        assert got[i]["n_chars_removed"] == len(broken) - len(fixed) > 0


def test_fix_mojibake_sentence_and_clean_passthrough(spark):
    from frontier_engine.textops import fix_mojibake

    df = spark.createDataFrame(
        [
            (1, "donâ€™t visit the cafÃ© â€” itâ€™s â€œclosedâ€\x9d at 25Â°"),
            (2, "plain ascii stays untouched"),
            (3, "already-fixed don’t café — “closed” 25°"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
    assert got[1]["fixed"] == "don’t visit the café — it’s “closed” at 25°"
    assert got[1]["was_mojibake"] is True
    assert got[2]["fixed"] == "plain ascii stays untouched"
    assert got[2]["was_mojibake"] is False
    assert got[2]["n_chars_removed"] == 0
    assert got[3]["fixed"] == got[3]["fixed"] == "already-fixed don’t café — “closed” 25°"
    assert got[3]["was_mojibake"] is False


# ------------------------------------------------- C4 line cleaning


def test_c4_clean_each_rule(spark):
    from frontier_engine.textops import c4_clean

    doc = "\n".join(
        [
            "A good sentence with plenty of words.",   # kept
            "short line",                                # no terminal punct + <3 words
            "Two words.",                                # terminal punct but <3 words
            "var config = { a: 1 };",                    # ends ';'
            "Please enable JavaScript to continue now.", # javascript (case-insensitive)
            "Is this a proper question?",                # kept
            'He said "stop right there."',               # kept (quote-period)
            "Trailing spaces survive rtrim.   ",         # kept
        ]
    )
    df = spark.createDataFrame(
        [(1, doc), (2, "Lorem ipsum dolor sit amet."), (3, "code { x }")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}

    r1 = got[1]
    assert r1["n_lines"] == 8 and r1["n_kept"] == 4
    assert r1["cleaned"].split("\n") == [
        "A good sentence with plenty of words.",
        "Is this a proper question?",
        'He said "stop right there."',
        "Trailing spaces survive rtrim.   ",
    ]
    assert r1["has_lorem"] is False and r1["has_brace"] is True

    assert got[2]["has_lorem"] is True and got[2]["n_kept"] == 1
    assert got[3]["has_brace"] is True and got[3]["n_kept"] == 0
    assert got[3]["cleaned"] == ""


def test_c4_clean_min_words_knob(spark):
    from frontier_engine.textops import c4_clean

    df = spark.createDataFrame([(1, "Two words.")], ["doc_id", "text"])
    assert c4_clean(df, min_words=2).collect()[0]["n_kept"] == 1
    assert c4_clean(df, min_words=3).collect()[0]["n_kept"] == 0


# ------------------------------------------------- exact-substring dedup


def test_substring_dedup_marks_non_first_occurrences(spark):
    # Docs 1 and 2 share the 4-token run "a b c d"; doc 1 is first by
    # (doc_id, start), so only doc 2's copy is a duplicated span.
    df = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "p q a b c d r"),
            (3, "unrelated words only here"),
        ],
        ["doc_id", "text"],
    )
    out = TX.substring_dedup(df, k=4).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]) for r in out] == [
        (2, 2, 6, 1)
    ]


def test_substring_dedup_merges_overlapping_windows(spark):
    # Doc 2 repeats doc 1's full 6-token run: with k=4 that is three
    # overlapping duplicated windows (starts 0,1,2) merging to one span
    # [0, 6).
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")],
        ["doc_id", "text"],
    )
    out = TX.substring_dedup(df, k=4).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]) for r in out] == [
        (2, 0, 6, 3)
    ]


def test_substring_dedup_within_doc_repeat_and_short_docs(spark):
    # A repeat INSIDE one document is also a duplicate (second copy
    # marked); docs shorter than k produce no windows and never crash.
    df = spark.createDataFrame(
        [(1, "a b c d mid a b c d"), (2, "too short")],
        ["doc_id", "text"],
    )
    out = TX.substring_dedup(df, k=4).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]) for r in out] == [
        (1, 5, 9, 1)
    ]


def test_substring_dedup_disjoint_spans_stay_separate(spark):
    # Two repeated runs separated by unique filler produce two spans,
    # not one merged span.
    df = spark.createDataFrame(
        [
            (1, "a b c d unique1 unique2 e f g h"),
            (2, "a b c d filler3 filler4 e f g h"),
        ],
        ["doc_id", "text"],
    )
    out = sorted(
        TX.substring_dedup(df, k=4).collect(),
        key=lambda r: (r["doc_id"], r["span_start"]),
    )
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in out] == [
        (2, 0, 4),
        (2, 6, 10),
    ]


# ------------------------------------------------- DSIR target affinity


def test_dsir_affinity_ranks_target_like_docs_higher(spark):
    # Target domain speaks "alpha beta gamma"; doc 10 shares its
    # vocabulary, doc 11 does not — 10 must outscore 11.
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta", True),
            (2, "beta gamma alpha gamma", True),
            (10, "alpha beta gamma", False),
            (11, "one two three four", False),
        ],
        ["doc_id", "text", "is_target"],
    )
    out = {r["doc_id"]: r for r in TX.dsir_affinity(df).collect()}
    assert out[10]["affinity"] > out[11]["affinity"]
    # scores are the exact integer ratio
    for r in out.values():
        assert r["affinity"] == r["aff_num"] / r["aff_den"]


def test_dsir_affinity_bigrams_reward_target_word_order(spark):
    # Same unigrams, different order: the doc matching the target's
    # BIGRAMS outscores the scrambled one.
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", True),
            (10, "alpha beta gamma delta", False),
            (11, "delta gamma beta alpha", False),
        ],
        ["doc_id", "text", "is_target"],
    )
    out = {r["doc_id"]: r for r in TX.dsir_affinity(df).collect()}
    assert out[10]["affinity"] > out[11]["affinity"]


def test_apply_span_cuts_removes_planned_ranges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z")], ["doc_id", "text"]
    )
    spans = spark.createDataFrame(
        [(1, 1, 3, 1), (1, 4, 5, 1)],
        ["doc_id", "span_start", "span_end", "n_windows"],
    )
    out = {r["doc_id"]: r for r in TX.apply_span_cuts(df, spans).collect()}
    assert (out[1]["cleaned"], out[1]["n_tokens"], out[1]["n_kept"]) == ("a d f", 6, 3)
    # doc without spans passes through re-joined
    assert (out[2]["cleaned"], out[2]["n_kept"]) == ("x y z", 3)


def test_apply_span_cuts_round_trip_with_substring_dedup(spark):
    # End-to-end: the plan from substring_dedup, applied, leaves no
    # duplicated k-gram's non-first occurrence behind.
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "fresh words here now")],
        ["doc_id", "text"],
    )
    spans = TX.substring_dedup(df, k=4)
    out = {r["doc_id"]: r for r in TX.apply_span_cuts(df, spans).collect()}
    assert out[1]["cleaned"] == "a b c d e f"   # first occurrence kept
    assert out[2]["cleaned"] == ""              # exact dup fully cut
    assert out[3]["cleaned"] == "fresh words here now"


def test_substring_dedup_randomized_parity_vs_python_reference(spark):
    # 25 seeded random corpora, disjoint vocabularies so one Spark run
    # scores them all without cross-corpus gram collisions; compare
    # against a brute-force python reference of the same semantics.
    import numpy as np

    rng = np.random.RandomState(20260818)
    K = 3
    rows = []
    for ci in range(25):
        vocab = [f"c{ci}w{j}" for j in range(4)]
        for di in range(rng.randint(2, 7)):
            n = rng.randint(0, 31)
            text = " ".join(vocab[rng.randint(0, len(vocab))] for _ in range(n))
            rows.append((ci * 100 + di, text))

    def reference(rows):
        occ = {}
        for doc_id, text in rows:
            toks = [w for w in text.split() if w]
            for s in range(max(len(toks) - K + 1, 0)):
                occ.setdefault(" ".join(toks[s : s + K]), []).append((doc_id, s))
        dups = {}
        for gram, places in occ.items():
            if len(places) < 2:
                continue
            w = min(places)
            for p in places:
                if p != w:
                    dups.setdefault(p[0], []).append(p[1])
        spans = []
        for doc_id, starts in dups.items():
            starts.sort()
            cur_s, cur_e, n_w = starts[0], starts[0] + K, 1
            for s in starts[1:]:
                if s <= cur_e:
                    cur_e, n_w = max(cur_e, s + K), n_w + 1
                else:
                    spans.append((doc_id, cur_s, cur_e, n_w))
                    cur_s, cur_e, n_w = s, s + K, 1
            spans.append((doc_id, cur_s, cur_e, n_w))
        return sorted(spans)

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in TX.substring_dedup(df, k=K).collect()
    )
    assert got == reference(rows)


# ------------------------------------------------- sequence packing


def test_pack_sequences_concat_and_chunk(spark):
    # One shard (n_shards=1), seq_len=5, docs of 3/4/2 tokens in id
    # order: starts 0, 3, 7 -> (seq 0 off 0), (seq 0 off 3), (seq 1 off 2).
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h i")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["seq_id"], r["offset_in_seq"])
        for r in TX.pack_sequences(df, seq_len=5, n_shards=1).collect()
    }
    assert out == {1: (0, 3, 0, 0), 2: (0, 4, 0, 3), 3: (0, 2, 1, 2)}


def test_pack_sequences_shards_pack_independently(spark):
    # Two shards: even/odd ids each start their own stream at offset 0.
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "x y"), (2, "d d d d"), (3, "z")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["offset_in_seq"])
        for r in TX.pack_sequences(df, seq_len=4, n_shards=2).collect()
    }
    assert out[0] == (0, 0, 0)
    assert out[2] == (0, 0, 3)   # even stream: 3 tokens then doc 2
    assert out[1] == (1, 0, 0)
    assert out[3] == (1, 0, 2)   # odd stream: 2 tokens then doc 3


def test_null_text_is_safe_in_cut_and_pack(spark):
    from pyspark.sql import types as T_

    schema = T_.StructType(
        [
            T_.StructField("doc_id", T_.LongType()),
            T_.StructField("text", T_.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, None), (2, "a b c")], schema)
    spans = spark.createDataFrame(
        [], "doc_id LONG, span_start LONG, span_end LONG, n_windows LONG"
    )
    cut = {r["doc_id"]: r for r in TX.apply_span_cuts(df, spans).collect()}
    assert (cut[1]["cleaned"], cut[1]["n_tokens"], cut[1]["n_kept"]) == ("", 0, 0)
    pack = {r["doc_id"]: r for r in TX.pack_sequences(df, seq_len=4, n_shards=1).collect()}
    assert pack[1]["n_tokens"] == 0
    assert (pack[2]["seq_id"], pack[2]["offset_in_seq"]) == (0, 0)  # doc 1 contributes 0 tokens


def test_domain_stats_counts_and_gate(spark):
    # domain "a": 3 docs, one exact duplicate pair -> dup_rate 1/3, keep.
    # domain "b": 2 docs, both identical -> dup_rate 1/2, keep (== max).
    # domain "c": 1 doc -> fails min_docs.
    df = spark.createDataFrame(
        [
            (1, "x y z", "a"),
            (2, "x y z", "a"),
            (3, "p q", "a"),
            (4, "dup dup", "b"),
            (5, "dup dup", "b"),
            (6, "solo", "c"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {r["domain"]: r for r in TX.domain_stats(df).collect()}
    a = out["a"]
    assert (a["n_docs"], a["n_unique_texts"], a["total_tokens"]) == (3, 2, 8)
    assert a["dup_rate"] == 1 / 3 and a["keep"]
    assert out["b"]["dup_rate"] == 0.5 and out["b"]["keep"]
    assert not out["c"]["keep"]


def test_unigram_surprisal_rare_tokens_score_lower_bits(spark):
    # "the" appears 8x (3 bits), "rare" once (0 bits): the doc made of
    # rare tokens has strictly lower mean_bits and lands in the tail
    # bucket of its language.
    rows = [(i, "the the the the", "en") for i in range(4)]
    rows += [(10, "rare unique", "en"), (11, "the the rare unique", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r for r in TX.unigram_surprisal(df, n_shards=1).collect()
    }
    # "the" count = 4*4 + 2 = 18 -> bits 4; "rare"/"unique" count 2 -> 1
    assert out[0]["sum_bits"] == 16 and out[0]["mean_bits"] == 4.0
    assert out[10]["sum_bits"] == 2 and out[10]["bucket"] == 3
    assert out[11]["sum_bits"] == 10  # 2x"the"(4) + rare(1) + unique(1)
    assert out[0]["bucket"] == 1  # most-predictable = head


def test_unigram_surprisal_buckets_are_per_language_cell(spark):
    # Each (language, shard) cell gets its own tertiles: with 3 docs per
    # lang in one shard the buckets inside each lang are exactly {1,2,3};
    # with per-doc shards every doc is its own cell and buckets are all 1.
    rows = []
    for j, lang in enumerate(("en", "vi")):
        rows += [
            (j * 100 + k, " ".join(["tok"] * (k + 1)) + f" u{lang}{k}", lang)
            for k in range(3)
        ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = TX.unigram_surprisal(df, n_shards=1).collect()
    for lang in ("en", "vi"):
        assert sorted(r["bucket"] for r in out if r["lang"] == lang) == [1, 2, 3]
    sharded = TX.unigram_surprisal(df, n_shards=1000).collect()
    assert all(r["bucket"] == 1 for r in sharded)


def test_mixture_sample_quota_sqrt_and_determinism(spark):
    # 16 docs in "big" -> quota min(16, ceil(4*sqrt(16))) = 16 (all kept);
    # 100 docs in "huge" -> quota 40: tail domains keep a larger share.
    rows = [(i, "big") for i in range(16)]
    rows += [(100 + i, "huge") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = TX.mixture_sample(df).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert len(by_dom["big"]) == 16 and by_dom["big"][0]["quota"] == 16
    assert len(by_dom["huge"]) == 40 and by_dom["huge"][0]["quota"] == 40
    # deterministic: same input -> identical selected id set
    again = {r["doc_id"] for r in TX.mixture_sample(df).collect()}
    assert again == {r["doc_id"] for r in out}


def test_incremental_dedup_drops_history_and_batch_dups(spark):
    incoming = spark.createDataFrame(
        [
            (10, "seen before"),   # in history -> dropped
            (11, "fresh one"),
            (12, "fresh one"),     # batch dup of 11 -> dropped
            (13, "fresh two"),
        ],
        ["doc_id", "text"],
    )
    from pyspark.sql import functions as F
    history = spark.createDataFrame([("seen before",), ("old",)], ["text"]).select(
        F.xxhash64("text").alias("h")
    )
    out = TX.incremental_dedup(incoming, history)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {11, 13}
    assert all(r["is_new_text"] for r in out.collect())


def test_dup_profile_histogram(spark):
    # clusters: "a" x3, "b" x2, "c" x1, "d" x1 -> sizes {3:1, 2:1, 1:2}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a", "a", "a", "b", "b", "c", "d"])],
        ["doc_id", "text"],
    )
    out = {r["cluster_size"]: (r["n_clusters"], r["n_docs"]) for r in TX.dup_profile(df).collect()}
    assert out == {3: (1, 3), 2: (1, 2), 1: (2, 2)}


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    # "abab" x2 and "ab" x3: pair "ab" count = 2*2 + 3*1 = 7 in 2 words;
    # "ba" = 2*1 in 1 word. Single-char "a" contributes nothing.
    df = spark.createDataFrame(
        [(1, "abab ab a"), (2, "abab ab"), (3, "ab")], ["doc_id", "text"]
    )
    out = {r["pair"]: (r["pair_count"], r["n_words"]) for r in
           TX.bpe_pair_counts(df).collect()}
    assert out["ab"] == (7, 2)
    assert out["ba"] == (2, 1)
    assert set(out) == {"ab", "ba"}


def test_corpus_stats_exact_quantiles(spark):
    rows = [
        (1, "a b", "en", 10), (2, "c", "en", 20), (3, "d e f", "en", 30),
        (4, "x", "vi", 7), (5, "y z", "vi", 9),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    out = {r["lang"]: r for r in TX.corpus_stats(df).collect()}
    en = out["en"]
    assert (en["n_docs"], en["total_tokens"], en["total_chars"]) == (3, 6, 60)
    assert (en["min_chars"], en["median_chars"], en["max_chars"]) == (10, 20.0, 30)
    # even count interpolates: p50 of {7, 9} = 8.0
    assert out["vi"]["median_chars"] == 8.0


def test_boilerplate_strip_per_host(spark):
    """The host-local banner is stripped EVERYWHERE on its host (no
    first-copy exemption), never on the host where it's rare, and
    clean_text preserves original paragraph order."""
    from frontier_engine.textops import boilerplate_strip

    rows = [
        # host A: 'banner' on 3 docs -> boilerplate there
        (1, "A", "banner\nalpha one\nbanner"),
        (2, "A", "banner\nbeta two"),
        (3, "A", "gamma three\nbanner"),
        # host B: same string once -> content there
        (4, "B", "banner\ndelta four"),
        (5, "B", "epsilon five"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "host", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_strip(df, min_docs=3).collect()
    }
    assert out[1]["n_boiler"] == 2 and out[1]["clean_text"] == "alpha one"
    assert out[2]["clean_text"] == "beta two"
    assert out[3]["clean_text"] == "gamma three"
    assert out[4]["n_boiler"] == 0  # rare on B -> kept
    assert out[4]["clean_text"] == "banner\ndelta four"
    assert out[5]["clean_text"] == "epsilon five"


def test_boilerplate_strip_all_boiler_doc(spark):
    """A doc that is 100% template reassembles to '' (not NULL)."""
    from frontier_engine.textops import boilerplate_strip

    rows = [(i, "H", "nav bar") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "host", "text"])
    out = boilerplate_strip(df, min_docs=3).collect()
    assert all(r["clean_text"] == "" and r["n_boiler"] == 1 for r in out)


def test_bigram_surprisal_flags_word_salad(spark):
    """A scrambled doc keeps its unigram profile but loses its bigrams:
    its conditional surprisal must exceed every natural doc's."""
    from frontier_engine.textops import bigram_surprisal

    natural = "the cat sat on the mat"
    rows = [(i, natural, "en") for i in range(8)]
    rows.append((99, "mat the on sat cat the", "en"))  # same words, shuffled
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r["mean_bits"] for r in bigram_surprisal(df, n_shards=1).collect()}
    assert out[99] > max(v for k, v in out.items() if k != 99)


def test_bigram_surprisal_single_token_doc_absent(spark):
    from frontier_engine.textops import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "lonely", "en"), (2, "two words", "en")],
        ["doc_id", "text", "lang"],
    )
    ids = {r["doc_id"] for r in bigram_surprisal(df).collect()}
    assert ids == {2}


def test_sessionize_boundaries_and_single_exchange(spark):
    """Gap > threshold starts a new session; the session aggregate reuses
    the window's partitioning (exactly one Exchange in the plan)."""
    import datetime as dt

    from frontier_engine.ops import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0),
        ("u1", t0 + dt.timedelta(seconds=10)),
        ("u1", t0 + dt.timedelta(seconds=100)),  # > 60s gap -> new session
        ("u2", t0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, gap_s=60)
    got = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
    assert got[("u1", 1)]["n_events"] == 2
    assert got[("u1", 1)]["duration_s"] == 10.0
    assert got[("u1", 2)]["n_events"] == 1
    assert got[("u2", 1)]["n_events"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the plan twice
    assert final.count("Exchange") - final.count("ReusedExchange") <= 1


def test_grouped_quantiles_matches_numpy_lower(spark):
    """Lower-quantile semantics vs a brute-force sorted-list oracle,
    including duplicate values and the p100-ish boundary."""
    import math

    from frontier_engine.ops import grouped_quantiles

    vals = [3.0, 1.0, 2.0, 2.0, 5.0, 4.0, 2.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = {r["pct"]: r for r in grouped_quantiles(df, ["g"], "v", (50, 90, 100)).collect()}
    s = sorted(vals)
    for pct in (50, 90, 100):
        r = math.ceil(len(s) * pct / 100)
        assert out[pct]["q_value"] == s[r - 1]
        assert out[pct]["rank"] == r
        assert out[pct]["n"] == len(s)


def test_grouped_quantiles_per_group_independent(spark):
    from frontier_engine.ops import grouped_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", 7.0)], ["g", "v"]
    )
    out = {(r["g"], r["pct"]): r["q_value"]
           for r in grouped_quantiles(df, ["g"], "v", (50,)).collect()}
    assert out[("a", 50)] == 1.0
    assert out[("b", 50)] == 7.0


class TestBudgetCut:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, quality double, n_tokens long"
        )

    def test_greedy_cut_includes_crossing_doc(self, spark):
        df = self._frame(spark, [(i, float(5 - i), 10) for i in range(5)])
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in TX.budget_cut(df, 25).collect()
        }
        # quality order 0,1,2,...; 10+10=20 < 25 so doc 2 crosses and is kept
        assert got == {0: 10, 1: 20, 2: 30}

    def test_zero_budget_keeps_nothing(self, spark):
        df = self._frame(spark, [(0, 1.0, 5)])
        assert TX.budget_cut(df, 0).count() == 0

    def test_tie_broken_by_id(self, spark):
        df = self._frame(spark, [(3, 1.0, 4), (1, 1.0, 4), (2, 1.0, 4)])
        got = {r["doc_id"]: r["cum_tokens"] for r in TX.budget_cut(df, 8).collect()}
        assert got == {1: 4, 2: 8}

    def test_deterministic_across_range_counts(self, spark):
        """cum_tokens is the GLOBAL prefix sum regardless of where the
        range boundaries fall — 1 range vs 16 ranges give identical rows."""
        rows = [(i, float((i * 37) % 11), 1 + i % 7) for i in range(200)]
        df = self._frame(spark, rows)
        a = sorted(map(tuple, TX.budget_cut(df, 300, n_ranges=1).collect()))
        b = sorted(map(tuple, TX.budget_cut(df, 300, n_ranges=16).collect()))
        assert a == b and len(a) > 0

    def test_matches_duckdb_oracle(self, spark):
        rows = [(i, float((i * 53) % 13), 1 + (i * 7) % 9) for i in range(100)]
        df = self._frame(spark, rows)
        got = sorted(map(tuple, TX.budget_cut(df, 120, n_ranges=4).collect()))
        want = sorted(
            map(
                tuple,
                duckdb.sql(
                    """
            WITH base(doc_id, quality, n_tokens) AS (
                SELECT i, CAST((i * 53) % 13 AS DOUBLE), 1 + (i * 7) % 9
                FROM range(0, 100) t(i)),
            c AS (SELECT doc_id, quality, CAST(n_tokens AS BIGINT) AS n_tokens,
                         CAST(sum(n_tokens) OVER (
                             ORDER BY quality DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                  FROM base)
            SELECT doc_id, quality, n_tokens, cum FROM c
            WHERE cum - n_tokens < 120
                    """
                ).fetchall(),
            )
        )
        assert got == want

    def test_negative_budget_rejected(self, spark):
        df = self._frame(spark, [(0, 1.0, 5)])
        with pytest.raises(ValueError):
            TX.budget_cut(df, -1)


class TestQualityCalibrate:
    def test_percentiles_by_counting(self, spark):
        rows = [
            (1, "en", 0.1), (2, "en", 0.2), (3, "en", 0.2), (4, "en", 0.9),
            (5, "vi", 0.5),
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
        got = {r["doc_id"]: r["pct_rank"] for r in TX.quality_calibrate(df).collect()}
        # en: cdf(0.1)=1/4, cdf(0.2)=3/4 (both duplicates), cdf(0.9)=1
        assert got[1] == pytest.approx(0.25, abs=1e-15)
        assert got[2] == got[3] == pytest.approx(0.75, abs=1e-15)
        assert got[4] == 1.0
        # a singleton group is its own distribution
        assert got[5] == 1.0

    def test_row_count_preserved(self, spark):
        rows = [(i, "en", float(i % 3)) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
        assert TX.quality_calibrate(df).count() == 30


def test_collocations_hand_computed(spark):
    # doc1 tokens [a b a b a b] -> bigrams (a,b)x3, (b,a)x2; doc2 "c" has
    # one token (exercises the empty-bigram slice guard). N=7 tokens,
    # M=5 bigrams, n_a=n_b=3.
    df = spark.createDataFrame([("a b a b a b",), ("c",)], "text string")
    rows = {
        (r["w1"], r["w2"]): r
        for r in TX.collocations(df, min_count=2).collect()
    }
    assert set(rows) == {("a", "b"), ("b", "a")}
    ab = rows[("a", "b")]
    assert ab["n_pair"] == 3 and ab["n_w1"] == 3 and ab["n_w2"] == 3
    assert ab["lift"] == (3 * 49) / (5 * 9)
    ba = rows[("b", "a")]
    assert ba["n_pair"] == 2
    assert ba["lift"] == (2 * 49) / (5 * 9)
    import math
    assert abs(ab["pmi"] - round(math.log2(147 / 45), 6)) < 2e-6


def test_collocations_min_count_prunes(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    assert TX.collocations(df, min_count=2).count() == 0
    assert TX.collocations(df, min_count=1).count() == 2


def test_set_similarity_join_exact_vs_brute_force(spark):
    # Random token soup + planted near-identical pairs; the prefix filter
    # must lose NOTHING vs the all-pairs brute force (that's the theorem).
    import itertools
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(30))))
    for i in range(5):  # planted: copy with one token changed
        base = docs[i][1].split()
        base[7] = "changed"
        docs.append((100 + i, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_a"], r["n_b"], r["inter"])
        for r in TX.set_similarity_join(df, t_num=1, t_den=2).collect()
    }

    def shingleset(text):
        t = text.split()
        return set(" ".join(t[i : i + 3]) for i in range(len(t) - 2)) if len(t) >= 3 else {" ".join(t)}

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = shingleset(ta), shingleset(tb)
        inter = len(sa & sb)
        if 2 * inter >= len(sa | sb):
            a, b = (ia, ib) if ia < ib else (ib, ia)
            want[(a, b)] = (
                (len(sa), len(sb), inter) if ia < ib else (len(sb), len(sa), inter)
            )
    assert got == want
    assert len(want) >= 5  # the planted pairs actually qualified


def test_set_similarity_join_threshold_rational(spark):
    # Two docs sharing exactly half their shingles: J = 1/3 < 1/2 -> out;
    # at t = 1/3 (t_num=1, t_den=3) -> in, inter/union exact.
    d1 = "a b c d e f"   # shingles: abc bcd cde def (4)
    d2 = "a b c d x y"   # shingles: abc bcd cdx dxy (4), inter=2, union=6
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    assert TX.set_similarity_join(df, t_num=1, t_den=2).count() == 0
    rows = TX.set_similarity_join(df, t_num=1, t_den=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["inter"], r["n_a"], r["n_b"]) == (2, 4, 4)
    assert r["jaccard"] == 2 / 6


def _brute_ed_pairs(ls, rs, d):
    def ed(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    return {
        (li, ri, lv, rv, ed(lv, rv))
        for li, lv in ls
        for ri, rv in rs
        if ed(lv, rv) <= d
    }


def test_edit_distance_join_vs_brute_force(spark):
    import random

    from frontier_engine.textops import edit_distance_join

    rng = random.Random(41)
    alphabet = "abcde"
    def mk(n, pfx):
        out = []
        for i in range(n):
            L = rng.randrange(0, 12)
            out.append((f"{pfx}{i}", "".join(rng.choice(alphabet) for _ in range(L))))
        return out

    ls, rs = mk(40, "L"), mk(40, "R")
    ldf = spark.createDataFrame(ls, "id string, val string")
    rdf = spark.createDataFrame(rs, "id string, val string")
    for d in (0, 1, 2):
        got = {
            tuple(r) for r in edit_distance_join(ldf, rdf, max_dist=d).collect()
        }
        assert got == _brute_ed_pairs(ls, rs, d), d


def test_edit_distance_join_typo_variants(spark):
    from frontier_engine.textops import edit_distance_join

    ls = [("a", "heinz tomato ketchup 500ml"), ("b", "nutella hazelnut 750g")]
    rs = [
        ("x", "heinz tomato ketchup 500ml"),   # exact
        ("y", "heinz tomoto ketchup 500 ml"),  # 1 sub + 1 insert = 2
        ("z", "nutela hazelnut 750g"),         # 1 deletion
        ("w", "golden syrup 330g"),            # unrelated
    ]
    ldf = spark.createDataFrame(ls, "id string, val string")
    rdf = spark.createDataFrame(rs, "id string, val string")
    got = sorted(
        (r["l_id"], r["r_id"], r["dist"])
        for r in edit_distance_join(ldf, rdf, max_dist=2).collect()
    )
    assert got == [("a", "x", 0), ("a", "y", 2), ("b", "z", 1)]


def test_kn_bigram_score_vs_reference_impl(spark):
    import math
    from collections import Counter, defaultdict

    from frontier_engine.textops import kn_bigram_score

    docs = [
        ("d1", "the cat sat on the mat", "en"),
        ("d2", "the cat sat on the cat", "en"),
        ("d3", "mat the on sat cat the", "en"),   # same unigrams, scrambled
        ("d4", "one", "en"),                       # no bigram -> absent
        ("d5", "san francisco san francisco", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string, lang string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_microbits"], r["mean_bits"])
        for r in kn_bigram_score(df).collect()
    }

    D = 0.75
    bi = Counter()
    per_doc = {}
    for did, text, _ in docs:
        ws = text.split()
        pairs = list(zip(ws, ws[1:]))
        per_doc[did] = pairs
        bi.update(pairs)
    c1 = defaultdict(int)
    n1v = defaultdict(int)
    n1w = defaultdict(int)
    for (v, w), c in bi.items():
        c1[v] += c
        n1v[v] += 1
        n1w[w] += 1
    n1tot = len(bi)
    micro = {
        vw: math.floor(
            -math.log2((bi[vw] - D) / c1[vw[0]] + D * n1v[vw[0]] * n1w[vw[1]] / (c1[vw[0]] * n1tot))
            * 1e6
        )
        for vw in bi
    }
    want = {}
    for did, pairs in per_doc.items():
        if not pairs:
            continue
        s = sum(micro[p] for p in pairs)
        want[did] = (len(pairs), s, s / (len(pairs) * 1e6))
    assert got == want
    # the scrambled doc must be more surprising than the original
    assert got["d3"][2] > got["d1"][2]


def _py_cdc(text, k=8, mask_mod=64):
    n = len(text)
    cuts = []
    for i in range(2, n - k + 2):  # 1-based gram starts 2..n-k+1
        acc = 0
        for j in range(i - 1, i - 1 + k):
            acc = (acc * 257 + ord(text[j])) % 2147483647
        if acc % mask_mod == 0:
            cuts.append(i)
    bounds = [1] + cuts + [n + 1]
    return [text[bounds[t] - 1 : bounds[t + 1] - 1] for t in range(len(bounds) - 1)]


def test_cdc_chunks_vs_python_and_shift_invariance(spark):
    import hashlib
    import random

    from frontier_engine.textops import cdc_chunks

    rng = random.Random(7)
    body = " ".join(
        rng.choice(["alpha", "beta", "gamma", "delta", "eps", "zeta"]) for _ in range(200)
    )
    docs = [
        ("d1", body),
        ("d2", "INSERTED PREFIX " + body),   # shifted copy
        ("d3", "tiny"),                        # shorter than k+1
        ("d4", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_len"], r["chunk_hash"])
        )
    for did, text in docs:
        want = [
            (i, len(c), hashlib.md5(c.encode()).hexdigest())
            for i, c in enumerate(_py_cdc(text))
        ]
        assert sorted(got[did]) == want, did
    # content-defined: the shifted copy re-aligns — most chunk hashes shared
    h1 = {h for _, _, h in got["d1"]}
    h2 = {h for _, _, h in got["d2"]}
    assert len(h1 & h2) >= max(1, len(h1) - 2)
    assert got["d3"] == [(0, 4, __import__("hashlib").md5(b"tiny").hexdigest())]


def test_script_census_buckets_and_argmax(spark):
    from frontier_engine.textops import script_census

    docs = [
        ("d1", "Hello world 42"),
        ("d2", "Привет мир"),
        ("d3", "日本語のテキスト"),
        ("d4", "مرحبا"),
        ("d5", "αβγ abc"),       # greek 3, latin 3 -> latin wins the tie
        ("d6", ""),
        ("d7", "!!!"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in script_census(df).collect()}
    assert got["d1"]["n_latin"] == 10 and got["d1"]["n_digit"] == 2
    assert got["d1"]["n_space"] == 2 and got["d1"]["main_script"] == "latin"
    assert got["d2"]["n_cyrillic"] == 9 and got["d2"]["main_script"] == "cyrillic"
    assert got["d3"]["n_cjk"] == 8 and got["d3"]["main_script"] == "cjk"
    assert got["d4"]["n_arabic"] == 5 and got["d4"]["main_script"] == "arabic"
    assert got["d5"]["n_greek"] == 3 and got["d5"]["main_script"] == "latin"
    assert got["d6"]["main_script"] == "none" and got["d6"]["n_chars"] == 0
    assert got["d7"]["n_other"] == 3 and got["d7"]["main_script"] == "none"
    for d in got.values():
        assert (
            d["n_latin"] + d["n_cyrillic"] + d["n_cjk"] + d["n_arabic"]
            + d["n_greek"] + d["n_digit"] + d["n_space"] + d["n_other"]
        ) == d["n_chars"]


def test_zipf_fit_recovers_slope(spark):
    # synthetic corpus with EXACT zipf-ish counts: term i appears
    # floor(1000 / (i+1)) times -> ln f = ln 1000 - ln rank, slope -1
    rows = []
    for i in range(50):
        rows += [("en", f"w{i:03d}")] * (1000 // (i + 1))
    df = spark.createDataFrame(rows, "lang string, term string").groupBy(
        "lang"
    ).agg(F.concat_ws(" ", F.collect_list("term")).alias("text"))
    out = TX.zipf_fit(df, "text", "lang", top_n=50).collect()[0]
    assert out.n_terms == 50
    assert -1.05 < out.slope < -0.93, out.slope
    # intercept_ln ~ ln(1000) = 6.9
    assert 6.4 < out.intercept_ln < 7.2, out.intercept_ln


def test_heaps_fit_bounds_and_extremes(spark):
    # template flood: one token repeated -> vocabulary never grows, beta ~ 0
    flood = spark.createDataFrame(
        [(i, "en", "spam " * 50) for i in range(64)],
        "doc_id long, lang string, text string",
    )
    out = TX.heaps_fit(flood, "text", "lang", "doc_id", n_buckets=8).collect()[0]
    assert out.beta == 0.0
    # id-soup: every token globally unique -> V == N, beta == 1, k_ln ~ 0
    soup = spark.createDataFrame(
        [(i, "en", " ".join(f"u{i}x{j}" for j in range(20))) for i in range(64)],
        "doc_id long, lang string, text string",
    )
    out = TX.heaps_fit(soup, "text", "lang", "doc_id", n_buckets=8).collect()[0]
    assert abs(out.beta - 1.0) < 0.01 and abs(out.k_ln) < 0.02
    # natural-ish mix sits strictly between
    mix = spark.createDataFrame(
        [(i, "en", " ".join(
            (f"w{(i * 17 + j * 7) % 50}" if j % 2 else f"r{i}x{j}")
            for j in range(30)))
         for i in range(64)],
        "doc_id long, lang string, text string",
    )
    out = TX.heaps_fit(mix, "text", "lang", "doc_id", n_buckets=8).collect()[0]
    assert 0.3 < out.beta < 0.95


def test_lsh_plan_picks_sane_banding():
    plan80 = TX.lsh_plan(128, 0.8)
    assert plan80["bands"] * plan80["rows"] == 128
    assert 0.6 < plan80["threshold"] < 0.95
    # S-curve: near-certain capture above threshold, steep falloff below
    assert plan80["curve"][0.9] > 0.95
    assert plan80["curve"][0.2] < 0.2
    # lower target -> more bands (lower threshold)
    plan50 = TX.lsh_plan(128, 0.5)
    assert plan50["bands"] > plan80["bands"]
    assert plan50["threshold"] < plan80["threshold"]
    import pytest as _pt
    with _pt.raises(ValueError):
        TX.lsh_plan(128, 1.5)


def test_tfidf_keywords_hand_computed(spark):
    import math

    docs = [
        (1, "apple apple banana common common"),
        (2, "banana cherry common common"),
        (3, "cherry cherry common durian"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = TX.tfidf_keywords(df, "text", "doc_id", k=2).collect()
    got = {(r.doc_id, r.rank): (r.term, r.score_micro) for r in out}

    def idf_micro(dfreq):
        return math.floor(math.log(3.0 / dfreq) * 1e6)

    # doc 1: apple tf2·idf(1) beats banana tf1·idf(2); common idf=0
    assert got[(1, 1)] == ("apple", 2 * idf_micro(1))
    assert got[(1, 2)] == ("banana", idf_micro(2))
    # doc 3: cherry tf2·idf(2) vs durian tf1·idf(1): 2*405465 > 1098612
    assert got[(3, 1)] == ("durian", idf_micro(1)) or got[(3, 1)] == (
        "cherry", 2 * idf_micro(2)
    )
    top3 = max(v for k, v in got.items() if k[0] == 3)
    # exact winner: durian idf 1098612 > cherry 810930
    assert got[(3, 1)][0] == "durian"
    # ubiquitous term scores 0 and never ranks above idf-bearing terms
    assert all(term != "common" for (_, rk), (term, _) in got.items() if rk == 1)


def test_readability_hand_computed(spark):
    """Fixed counting rules on a hand-counted doc: 6 words, 2 sentence
    boundaries ('.', '!?' run counts once), 7 vowel groups."""
    from frontier_engine.textops import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. On a sofa!?")], "doc_id long, text string"
    )
    row = readability(df).collect()[0]
    assert row["words"] == 6
    assert row["sentences"] == 2
    assert row["syllables"] == 7  # e, a, a, o, a, o, a
    wps, spw = 6 / 2, 7 / 6
    assert row["flesch"] == round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    assert row["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 6)


def test_readability_floors_and_drops(spark):
    """Consonant-only tokens floor syllables at one per word; unterminated
    text is one sentence; zero-word docs are dropped."""
    from frontier_engine.textops import readability

    df = spark.createDataFrame(
        [(1, "tsk brr pfft"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    rows = readability(df).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["sentences"] == 1
    assert rows[0]["words"] == 3
    assert rows[0]["syllables"] == 3  # zero vowel groups, floored to words


def test_chunk_passages_windows_and_overlap(spark):
    """size=3, stride=2 over 5 words: three windows, overlap of 1, short
    tail window; every word appears in at least one passage."""
    from frontier_engine.textops import chunk_passages

    df = spark.createDataFrame(
        [(1, " a b  c d e"), (2, "x"), (3, "  ")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_words"], r["passage"])
        for r in chunk_passages(df, size=3, stride=2).collect()
    )
    assert rows == [
        (1, 0, 3, "a b c"),
        (1, 1, 3, "c d e"),
        (1, 2, 1, "e"),
        (2, 0, 1, "x"),
    ]


def test_chunk_passages_short_doc_single_window(spark):
    from frontier_engine.textops import chunk_passages

    df = spark.createDataFrame([(7, "only four words here")], "doc_id long, text string")
    rows = chunk_passages(df, size=128, stride=96).collect()
    assert len(rows) == 1
    assert rows[0]["n_words"] == 4
    assert rows[0]["passage"] == "only four words here"


def test_chunk_passages_validates_params(spark):
    import pytest as _pytest

    from frontier_engine.textops import chunk_passages

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_passages(df, size=0)
    with _pytest.raises(ValueError):
        chunk_passages(df, stride=0)


def test_term_drift_surged_term_ranks_first(spark):
    """A term that floods the new snapshot tops the drift ranking with
    direction +1; a term that vanished ranks with direction -1; stable
    vocabulary sits at drift ~1."""
    from frontier_engine.textops import term_drift

    old = spark.createDataFrame(
        [(i, "stable words here gone gone") for i in range(20)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, "stable words here surge surge surge") for i in range(20)],
        "doc_id long, text string",
    )
    rows = term_drift(old, new, k=10).collect()
    by_term = {r["term"]: r for r in rows}
    ranked = [r["term"] for r in rows]
    assert set(ranked[:2]) == {"surge", "gone"}
    assert by_term["surge"]["direction"] == 1
    assert by_term["surge"]["c_old"] == 0 and by_term["surge"]["c_new"] == 60
    assert by_term["gone"]["direction"] == -1
    assert by_term["stable"]["drift"] < by_term["surge"]["drift"]


def test_term_drift_identical_corpora_flat(spark):
    from frontier_engine.textops import term_drift

    df = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(5)], "doc_id long, text string"
    )
    rows = term_drift(df, df, k=5).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["drift"] == 1.0
        assert r["direction"] == 1


def test_bpe_token_count_matches_regex(spark):
    """The vectorized BPE token counter == size(regexp_extract_all(TOKEN_REGEX))
    on corpus docs plus adversarial rows (nulls, unicode classes, astral)."""
    docs = spark.read.parquet(DOCS).select("text")
    extra = spark.createDataFrame(
        [(None,), ("",), ("  \t\n ",), ("héllo wörld ỹ À",), ("a1b2c3",),
         ("!!!",), ("abc123!?x",), ("mixêd ѐcyrillic 漢字 🎉🎉 ok",),
         ("ỹỹỹ0xyzÀÀ",), ("a",), ("9",), (".",)],
        "text string",
    )
    df = docs.unionByName(extra)
    both = df.select(
        TX.token_count_col(F.col("text"), "bpe").alias("fast"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TX.TOKEN_REGEX), 0)).alias("ref"),
    )
    bad = both.filter(~F.col("fast").eqNullSafe(F.col("ref"))).count()
    assert bad == 0
