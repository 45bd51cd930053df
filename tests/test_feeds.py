"""RSS/Atom feed ingestion: autodiscovery from HTML link tags, item/entry
parsing (plain + gzip), RFC 822/3339 date normalization, entity
unescaping, caps, dead-lettering, and the frontier-seed handoff."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from frontier_engine import feeds


RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Blog</title>
  <link>https://blog.example/</link>
  <item>
    <title>A</title>
    <link>https://blog.example/a?x=1&amp;y=2</link>
    <pubDate>Tue, 03 Feb 2026 10:30:00 GMT</pubDate>
  </item>
  <item><link> https://blog.example/b </link><pubDate>garbage date</pubDate></item>
  <item><title>no link</title></item>
  <item><link>not a url</link></item>
</channel></rss>
"""

ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Site</title>
  <link rel="self" href="https://site.example/feed.atom"/>
  <entry>
    <link rel="alternate" href="https://site.example/p1"/>
    <updated>2026-02-03T10:30:00Z</updated>
  </entry>
  <entry>
    <link rel="enclosure" href="https://cdn.example/file.mp3"/>
    <link href="https://site.example/p2"/>
    <published>2026-02-01T00:00:00+02:00</published>
  </entry>
</feed>
"""

HTML = """<html><head>
<link rel="alternate" type="application/rss+xml" href="/feed.xml">
<link rel="alternate" type="application/atom+xml" href="https://site.example/feed.atom">
<link rel="stylesheet" type="text/css" href="/style.css">
<link rel="alternate" type="application/rss+xml" href="/feed.xml">
<link rel="alternate" type="application/rss+xml" data-href="/lazy.xml">
</head><body></body></html>"""


def test_parse_feed_body_rss_and_dates():
    entries = feeds.parse_feed_body(RSS)
    assert entries[0] == (
        "https://blog.example/a?x=1&y=2",
        "2026-02-03 10:30:00",
        "rss",
    )
    # bad date -> None, whitespace trimmed; linkless item skipped;
    # garbage loc kept here (seeds stage drops it, same as sitemaps)
    assert entries[1] == ("https://blog.example/b", None, "rss")
    assert [e[0] for e in entries] == [
        "https://blog.example/a?x=1&y=2",
        "https://blog.example/b",
        "not a url",
    ]


def test_parse_feed_body_atom_rel_and_offsets():
    entries = feeds.parse_feed_body(ATOM)
    # rel=self channel link is OUTSIDE entries and ignored; rel=enclosure
    # is skipped in favor of the rel-less alternate
    assert entries == [
        ("https://site.example/p1", "2026-02-03 10:30:00", "atom"),
        ("https://site.example/p2", "2026-01-31 22:00:00", "atom"),  # +02:00 -> UTC
    ]


def test_parse_feed_body_atom_rel_token_match():
    # 'alternate-media' must NOT pass as 'alternate' (token match, not
    # substring): the real alternate later in the entry wins
    body = (b'<feed><entry>'
            b'<link rel="alternate-media" href="https://cdn.example/x.mp4"/>'
            b'<link rel="alternate" href="https://site.example/post"/>'
            b"</entry></feed>")
    assert feeds.parse_feed_body(body) == [
        ("https://site.example/post", None, "atom")
    ]


def test_parse_feed_body_gzip_cap_and_dead_letter():
    assert feeds.parse_feed_body(gzip.compress(RSS))[0][0].endswith("x=1&y=2")
    import pytest

    with pytest.raises(ValueError):
        feeds.parse_feed_body(b"<html>not a feed</html>")
    with pytest.raises(ValueError):
        feeds.parse_feed_body(b"")
    with pytest.raises(ValueError):
        feeds.parse_feed_body(b"\x1f\x8bbroken gzip")
    # cap enforced
    many = b"<rss>" + b"".join(
        b"<item><link>https://h.example/p%d</link></item>" % i for i in range(20)
    ) + b"</rss>"
    old = feeds.FEED_MAX_ENTRIES
    feeds.FEED_MAX_ENTRIES = 5
    try:
        assert len(feeds.parse_feed_body(many)) == 5
    finally:
        feeds.FEED_MAX_ENTRIES = old


def test_discover_feeds_py_name_anchored_and_relative():
    got = feeds.discover_feeds_py("https://site.example/post/1", HTML)
    # relative href resolved, duplicate deduped, data-href NOT matched,
    # stylesheet ignored
    assert got == [
        ("https://site.example/feed.xml", "rss"),
        ("https://site.example/feed.atom", "atom"),
    ]


def test_feeds_pipeline_spark(spark):
    pages = spark.createDataFrame(
        [("https://site.example/", HTML), ("https://other.example/", "<p>no feeds</p>")],
        "url string, html string",
    )
    found = feeds.feeds_from_html(pages).collect()
    assert {(r.feed_url, r.feed_type) for r in found} == {
        ("https://site.example/feed.xml", "rss"),
        ("https://site.example/feed.atom", "atom"),
    }

    bodies = spark.createDataFrame(
        [
            ("https://blog.example/feed.xml", bytearray(RSS)),
            ("https://site.example/feed.atom", bytearray(gzip.compress(ATOM))),
            ("https://bad.example/feed.xml", bytearray(b"junk")),
        ],
        "url string, body binary",
    )
    parsed = feeds.parse_feeds(bodies)
    rows = {(r.loc, r.kind) for r in parsed.collect()}
    assert ("https://site.example/p1", "atom") in rows
    assert ("https://blog.example/a?x=1&y=2", "rss") in rows
    assert not any("bad.example" in r.feed_url for r in parsed.collect())

    # seeds: garbage locs drop, fresher entries outrank staler at the
    # same base priority, unparseable dates keep base priority
    seeds = feeds.seeds_from_feeds(
        parsed, priority=0.5, as_of="2026-02-04 00:00:00", half_life_days=7.0
    )
    pri = {r.url: r.priority for r in seeds.collect()}
    assert all(u.startswith("https://") for u in pri)  # 'not a url' dropped
    assert pri["https://blog.example/b"] == 0.5  # no date -> base
    # p1 updated 2026-02-03 (age ~0.56d) > p2 updated 2026-01-31 (age ~3d)
    assert pri["https://site.example/p1"] > pri["https://site.example/p2"] > 0
    assert pri["https://site.example/p1"] < 0.5  # decayed, not base


def test_crawl_cli_feeds_out(spark, tmp_path):
    """--feeds-out autodiscovers feed links from the crawled pages' html
    (same canonicalized-corpus join discipline as --image-pairs-out)."""
    import json
    import os
    import subprocess
    import sys
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    url = "https://news.example/home"
    html = (b'<html><head>'
            b'<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
            b'<link rel="stylesheet" href="/style.css">'
            b'</head><body>hello</body></html>')
    pq.write_table(
        pa.table({
            "url": [url],
            "warc_ts": [datetime(2026, 1, 2)],
            "html": [html],
            "lang": ["en"],
        }),
        str(tmp_path / "pages.parquet"),
    )
    pq.write_table(
        pa.table({"url": [url], "priority": [1.0]}),
        str(tmp_path / "seeds.parquet"),
    )
    pq.write_table(
        pa.table({
            "host": ["news.example"],
            "crawl_delay": [1.0],
            "disallow_prefixes": [[]],
        }),
        str(tmp_path / "robots.parquet"),
    )
    out = str(tmp_path / "feeds")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "crawl.py"),
         "--pages", str(tmp_path / "pages.parquet"),
         "--seeds", str(tmp_path / "seeds.parquet"),
         "--robots", str(tmp_path / "robots.parquet"),
         "--warehouse", str(tmp_path / "wh"),
         "--feeds-out", out, "--max-epochs", "2"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["feeds_found"] == 1
    got = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert got == [(url, "https://news.example/feed.xml", "rss")]
