"""Inverted-index lookup equivalences (round-6 fused term lookup)."""

from __future__ import annotations

from frontier_engine import index as IX


def test_match_counts_docs_equals_posting_form(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = [
        "part filter",
        "table hash",
        "sort query",
        "absent bigram",
        "part filter",          # duplicate: countDistinct semantics
        "three token term",     # wrong width for n=2: matches nothing
        "bad  term",            # malformed (empty token): matches nothing
    ]
    fused = IX.match_counts_docs(docs, terms, n=2)
    legacy = IX.match_counts(IX.build_postings(docs, n=2), terms)
    got = {(r["doc_id"], r["n_terms"]) for r in fused.collect()}
    want = {(r["doc_id"], r["n_terms"]) for r in legacy.collect()}
    assert got == want and len(got) > 0
    assert dict(fused.dtypes) == dict(legacy.dtypes)


def test_match_counts_docs_boundaries(spark):
    rows = [
        (1, "alpha beta gamma"),        # bigram 'alpha beta' present
        (2, "xalpha beta gamma"),       # 'alpha' not a token here
        (3, "alpha betax gamma"),       # 'beta' not a token here
        (4, "alpha\t\n beta"),          # any \s+ run separates tokens
        (5, "ALPHA BETA"),              # lowercased before matching
        (6, "alpha"),                   # too short for a bigram
        (7, "beta alpha"),              # order matters
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fused = IX.match_counts_docs(docs, ["alpha beta"], n=2)
    legacy = IX.match_counts(IX.build_postings(docs, n=2), ["alpha beta"])
    got = {(r["doc_id"], r["n_terms"]) for r in fused.collect()}
    want = {(r["doc_id"], r["n_terms"]) for r in legacy.collect()}
    assert got == want == {(1, 1), (4, 1), (5, 1)}


def test_match_counts_docs_regex_metachars(spark):
    docs = spark.createDataFrame(
        [(1, "price (usd) total"), (2, "price usd total")],
        "doc_id long, text string",
    )
    fused = IX.match_counts_docs(docs, ["price (usd)"], n=2)
    legacy = IX.match_counts(IX.build_postings(docs, n=2), ["price (usd)"])
    got = {(r["doc_id"], r["n_terms"]) for r in fused.collect()}
    want = {(r["doc_id"], r["n_terms"]) for r in legacy.collect()}
    assert got == want == {(1, 1)}
