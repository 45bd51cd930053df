"""Robots Exclusion Protocol page-level compliance: meta robots
noindex/nofollow and per-link rel=nofollow — shared extractor semantics
plus engine-vs-oracle crawl equivalence on a corpus that uses them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier_engine.extract import (
    extract_links_py,
    meta_robots_py,
    noindex_py,
)


def test_meta_robots_parsing():
    assert meta_robots_py(b"<meta name=robots content='noindex, nofollow'>") == {
        "noindex",
        "nofollow",
    }
    assert meta_robots_py(b'<META NAME="ROBOTS" CONTENT="NOINDEX">') == {"noindex"}
    # 'none' is shorthand for both
    got = meta_robots_py(b"<meta name='robots' content='none'>")
    assert {"noindex", "nofollow"} <= got
    # other meta tags are ignored
    assert meta_robots_py(b"<meta name=viewport content='width=1'>") == frozenset()
    # commented-out directives are ignored
    assert meta_robots_py(b"<!-- <meta name=robots content=noindex> -->") == frozenset()
    assert meta_robots_py(None) == frozenset()
    assert not noindex_py(b"<html><body>x</body></html>")
    assert noindex_py(b"<meta name=robots content='noindex'>")


def test_rel_nofollow_links():
    html = (
        b"<a href='/a'>a</a>"
        b"<a rel='nofollow' href='/b'>b</a>"
        b"<a href='/c' rel='ugc nofollow'>c</a>"
        b"<a href='/d' rel='sponsored'>d</a>"
        b"<a href='/e' rel='NOFOLLOW'>e</a>"
    )
    got = extract_links_py(html, "https://h.example/")
    assert got == ["https://h.example/a", "https://h.example/d"]


def test_meta_nofollow_kills_all_links():
    html = (
        b"<meta name=robots content='nofollow'>"
        b"<a href='/a'>a</a><a href='/b'>b</a>"
    )
    assert extract_links_py(html, "https://h.example/") == []


def test_plain_pages_unchanged():
    # the pre-REP behavior is preserved bit-for-bit on pages without
    # rel/meta annotations (the crawl-equivalence fixtures' class)
    html = (
        b"<a href='/x'>x</a><a href='https://o.example/y#f'>y</a>"
        b"<a href='javascript:void(0)'>j</a><a name='anchor'>n</a>"
        b"<a href='/x'>dup</a>"
    )
    # fragments inside an href survive extraction (canonicalization strips
    # them downstream); a pure '#...' href never matches — both exactly as
    # before the REP change
    assert extract_links_py(html, "https://h.example/") == [
        "https://h.example/x",
        "https://o.example/y#f",
    ]
    assert extract_links_py(b"<a href='#top'>t</a>", "https://h.example/") == []


@pytest.fixture(scope="module")
def spark():
    from frontier_engine.session import get_spark

    yield get_spark("test-rep", cores=4)


def test_crawl_respects_meta_robots(spark, tmp_path):
    """noindex page: fetched + links followed, absent from records;
    nofollow page: stored, links NOT followed; engine == oracle."""
    from frontier_engine.crawl import CrawlConfig, run_crawl
    from frontier_engine.frontier import DrainConfig
    from frontier_engine.oracle import OracleConfig, run_oracle
    from frontier_engine.seen import SeenConfig
    from frontier_engine.snapshot import SnapshotStore

    base = str(tmp_path / "corpus")
    pages_rows = [
        # seed 1: noindex but followable — child A must be crawled
        ("https://h.example/noindex",
         b"<meta name=robots content='noindex'><body>hidden"
         b"<a href='/childA'>A</a></body>"),
        # seed 2: indexable but nofollow — child B must NOT be crawled
        ("https://h.example/nofollow",
         b"<meta name=robots content='nofollow'><body>kept"
         b"<a href='/childB'>B</a></body>"),
        ("https://h.example/childA", b"<body>child A</body>"),
        ("https://h.example/childB", b"<body>child B</body>"),
    ]
    pages = spark.createDataFrame(
        [(u, "2025-06-14 00:00:00", h, "en") for u, h in pages_rows],
        "url string, warc_ts string, html binary, lang string",
    ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "html", "lang")
    pages.write.mode("overwrite").parquet(f"{base}/pages")
    spark.createDataFrame(
        [("https://h.example/noindex", 1.0), ("https://h.example/nofollow", 1.0)],
        "url string, priority double",
    ).write.mode("overwrite").parquet(f"{base}/seeds")
    spark.createDataFrame(
        [("h.example", 1.0, [])],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    ).write.mode("overwrite").parquet(f"{base}/robots")

    cfg = CrawlConfig(
        max_depth=2,
        max_fetch_attempts=1,
        drain=DrainConfig(epoch_seconds=30.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    run_crawl(spark, f"{base}/pages", f"{base}/seeds", f"{base}/robots",
              str(tmp_path / "wh"), cfg)
    store = SnapshotStore(str(tmp_path / "wh"))
    recs = {r["url"]: r["text"] for r in store.read(spark, "records").collect()}
    sched = {r["url"] for r in store.read(spark, "schedule").collect()}

    assert "https://h.example/noindex" not in recs      # noindex: not stored
    assert "https://h.example/noindex" in sched          # ... but fetched
    assert "https://h.example/childA" in recs            # its links followed
    assert "https://h.example/nofollow" in recs          # nofollow: stored
    assert "https://h.example/childB" not in sched       # links not followed

    # oracle agreement (same shared extractor + noindex skip)
    ores = run_oracle(
        f"{base}/pages", f"{base}/seeds", f"{base}/robots",
        OracleConfig(epoch_seconds=30.0, max_depth=2, max_fetch_attempts=1),
    )
    assert dict(ores.records) == recs
    assert {u for (_, _, _, u) in ores.schedule} == sched


def test_charset_sniffing():
    from frontier_engine.extract import decode_html_py, sniff_charset_py

    # BOMs are authoritative
    assert sniff_charset_py("﻿hi".encode("utf-8")) == "utf-8-sig"
    # BOM-less utf-16 bytes have no marker to sniff: default stands
    assert sniff_charset_py("hi".encode("utf-16-le")) == "utf-8"
    # utf-16 with BOM
    assert sniff_charset_py(b"\xff\xfeh\x00i\x00") == "utf-16-le"
    assert sniff_charset_py(b"\xfe\xff\x00h\x00i") == "utf-16-be"
    # meta charset declaration, either form, any case
    assert sniff_charset_py(b"<meta charset='ISO-8859-1'>") == "cp1252"
    assert sniff_charset_py(
        b"<meta http-equiv=Content-Type content='text/html; CHARSET=windows-1252'>"
    ) == "cp1252"
    # unknown label / no declaration -> utf-8
    assert sniff_charset_py(b"<meta charset='klingon-9'>") == "utf-8"
    assert sniff_charset_py(b"<html><body>plain</body></html>") == "utf-8"
    assert sniff_charset_py(None) == "utf-8"


def test_cp1252_page_decodes_correctly():
    from frontier_engine.extract import extract_text_py

    body = "café résumé señor".encode("cp1252")
    page = b"<html><head><meta charset=iso-8859-1></head><body>" + body + b"</body></html>"
    assert extract_text_py(page) == "caf\xe9 r\xe9sum\xe9 se\xf1or"
    # the SAME bytes without the declaration mojibake under utf-8-replace —
    # pinning that the declaration is what fixes it
    plain = b"<html><body>" + body + b"</body></html>"
    assert "�" in extract_text_py(plain)


def test_undeclared_utf8_unchanged():
    from frontier_engine.extract import extract_text_py

    # the pre-charset behavior on undeclared pages is preserved bit-for-bit
    page = "<html><body>Sữa tươi 180ml</body></html>".encode("utf-8")
    assert extract_text_py(page) == "Sữa tươi 180ml"
