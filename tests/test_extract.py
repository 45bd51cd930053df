"""Byte-identical extraction invariant (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frontier_engine import fixtures
from frontier_engine.extract import extract_links_py, extract_text_py, links_udf, text_udf


def test_extract_text_basic():
    html = (
        b"<html><head><title>T</title><script>var a=1<2;</script>"
        b"<style>.x{}</style></head><body><p>Hello &amp; world</p>"
        b"<!-- <a href=\"https://no.example\"> --></body></html>"
    )
    assert extract_text_py(html) == "T Hello & world"


def test_extract_links_order_and_resolution():
    html = (
        b'<a href="/a">1</a><a href="b/c">2</a>'
        b'<a href="https://other.example/x">3</a>'
        b'<a href="/a">dup</a><a href="#frag">skip</a>'
        b'<a href="javascript:void(0)">skip</a>'
    )
    links = extract_links_py(html, "https://h.example/d/e")
    assert links == [
        "https://h.example/a",
        "https://h.example/d/b/c",
        "https://other.example/x",
    ]


def test_attribute_names_are_anchored():
    # lazy-loading 'data-href='/'data-src=' must not satisfy the href/src
    # patterns: a tag with ONLY data-src yields nothing, and a tag with
    # both harvests the real attribute (ADVICE round-4 finding)
    html = (
        b'<a data-href="/lazy">no real href</a>'
        b'<a data-href="/lazy" href="/real">both</a>'
    )
    assert extract_links_py(html, "https://h.example/") == [
        "https://h.example/real"
    ]
    from frontier_engine.extract import image_alt_pairs_py

    img = (
        b'<img data-src="/lazy.jpg" alt="lazy only, must be dropped">'
        b'<img data-src="/lazy.jpg" src="/real.jpg" data-alt="x" '
        b'alt="real caption here">'
    )
    assert image_alt_pairs_py(img, "https://h.example/") == [
        ("https://h.example/real.jpg", "real caption here")
    ]


def test_udf_matches_python_on_corpus(spark):
    paths = fixtures.corpus("mini")
    pages = spark.read.parquet(paths["pages"])
    sample = pages.limit(200)
    rows = sample.select(
        "url",
        "text",
        text_udf(F.col("html")).alias("engine_text"),
        links_udf(F.col("html"), F.col("url")).alias("engine_links"),
        "html",
    ).collect()
    assert len(rows) > 0
    for r in rows:
        # stored fixture text was produced by the same shared function —
        # the UDF output must match byte-for-byte
        assert r["engine_text"] == r["text"], r["url"]
        assert r["engine_links"] == extract_links_py(bytes(r["html"]), r["url"])


def test_corpus_shape():
    paths = fixtures.corpus("mini")
    import pyarrow.parquet as pq

    t = pq.read_table(paths["pages"])
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert t.num_rows > 500
    # mega-host skew present
    hosts = [u.split("/")[2] for u in t.column("url").to_pylist()]
    from collections import Counter

    top = Counter(hosts).most_common(1)[0]
    assert top[1] > t.num_rows * 0.25


def test_canonical_py_variants():
    from frontier_engine.extract import canonical_py

    base = "http://ex.com/page?x=1"
    # absolute, double quotes
    assert canonical_py(
        b'<html><head><link rel="canonical" href="http://ex.com/c1"></head>', base
    ) == "http://ex.com/c1"
    # flipped attribute order, single quotes, relative href
    assert canonical_py(
        b"<head><link href='/c2' rel='canonical'></head>", base
    ) == "http://ex.com/c2"
    # mixed case tag/rel; first declaration wins over a later conflict
    assert canonical_py(
        b'<head><LINK REL="Canonical" HREF="http://ex.com/c3">'
        b'<link rel="canonical" href="http://other.com/x"></head>',
        base,
    ) == "http://ex.com/c3"
    # rel token list (rel="alternate canonical") counts
    assert canonical_py(
        b'<head><link rel="alternate canonical" href="/c4"></head>', base
    ) == "http://ex.com/c4"
    # decoy: stylesheet link, canonical only in body text -> None
    assert canonical_py(
        b'<head><link rel="stylesheet" href="/s.css"></head>'
        b"<body>rel=canonical prose</body>",
        base,
    ) is None
    # entity-escaped href unescapes
    assert canonical_py(
        b'<head><link rel="canonical" href="/c?a=1&amp;b=2"></head>', base
    ) == "http://ex.com/c?a=1&b=2"
    # non-http target rejected; commented-out declaration ignored
    assert canonical_py(
        b'<head><link rel="canonical" href="ftp://x/y"></head>', base
    ) is None
    assert canonical_py(
        b'<head><!-- <link rel="canonical" href="/c9"> --></head>', base
    ) is None
    # missing href / empty page / None
    assert canonical_py(b'<head><link rel="canonical"></head>', base) is None
    assert canonical_py(b"", base) is None
    assert canonical_py(None, base) is None
