"""Sitemap ingestion: robots Sitemap: discovery, urlset/sitemapindex
parsing (plain + gzip), entity unescaping, caps, dead-lettering, and the
frontier-seed handoff."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from frontier_engine import sitemap


URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://shop.example/p?a=1&amp;b=2</loc><lastmod>2026-01-05</lastmod></url>
  <url><loc> https://shop.example/about </loc></url>
  <url><priority>0.3</priority></url>
  <url><loc>not a url at all</loc></url>
</urlset>
"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://shop.example/sitemap-a.xml.gz</loc><lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>https://shop.example/sitemap-b.xml</loc></sitemap>
</sitemapindex>
"""

ROBOTS = """User-agent: *
Disallow: /admin
Sitemap: https://shop.example/sitemap.xml   # comment
sitemap: https://shop.example/sitemap2.xml
Sitemap: https://shop.example/sitemap.xml
User-agent: bot
Allow: /
"""


class TestPure:
    def test_robots_sitemap_lines(self):
        urls = sitemap.extract_sitemap_urls(ROBOTS)
        assert urls == [
            "https://shop.example/sitemap.xml",
            "https://shop.example/sitemap2.xml",
        ]  # case-insensitive, comment-stripped, deduped, order kept

    def test_urlset_entries(self):
        entries = sitemap.parse_sitemap_body(URLSET)
        locs = [(loc, kind) for loc, _, kind in entries]
        assert ("https://shop.example/p?a=1&b=2", "url") in locs  # &amp; unescaped
        assert ("https://shop.example/about", "url") in locs
        assert ("not a url at all", "url") in locs  # dropped later, at seeding
        lastmods = {loc: lm for loc, lm, _ in entries}
        assert lastmods["https://shop.example/p?a=1&b=2"] == "2026-01-05"

    def test_sitemapindex_entries(self):
        entries = sitemap.parse_sitemap_body(INDEX)
        assert [(loc, kind) for loc, _, kind in entries] == [
            ("https://shop.example/sitemap-a.xml.gz", "sitemap"),
            ("https://shop.example/sitemap-b.xml", "sitemap"),
        ]

    def test_gzip_body(self):
        entries = sitemap.parse_sitemap_body(gzip.compress(URLSET))
        assert any(loc == "https://shop.example/about" for loc, _, _ in entries)

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            sitemap.parse_sitemap_body(b"")
        with pytest.raises(ValueError):
            sitemap.parse_sitemap_body(b"<html>not a sitemap</html>")
        with pytest.raises(ValueError):
            sitemap.parse_sitemap_body(b"\x1f\x8b broken gzip")

    def test_entity_bomb_is_inert(self):
        """Billion-laughs-style entity declarations are plain text to the
        anchored scanner — no expansion, no blowup."""
        bomb = (
            b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY a "ha"><!ENTITY b "&a;&a;&a;&a;">]>'
            b"<urlset><url><loc>https://x.example/&b;</loc></url></urlset>"
        )
        entries = sitemap.parse_sitemap_body(bomb)
        assert entries == [("https://x.example/&b;", None, "url")]

    def test_50k_cap(self):
        body = b"<urlset>" + b"".join(
            b"<url><loc>https://x.example/p%d</loc></url>" % i for i in range(50_100)
        ) + b"</urlset>"
        assert len(sitemap.parse_sitemap_body(body)) == sitemap.SITEMAP_MAX_URLS


class TestSpark:
    def test_sitemaps_from_robots_expression_only(self, spark):
        df = spark.createDataFrame(
            [("shop.example", ROBOTS), ("empty.example", "User-agent: *\nDisallow:")],
            "host string, body string",
        )
        out = sitemap.sitemaps_from_robots(df)
        rows = {(r["host"], r["sitemap_url"]) for r in out.collect()}
        assert rows == {
            ("shop.example", "https://shop.example/sitemap.xml"),
            ("shop.example", "https://shop.example/sitemap2.xml"),
        }
        # stays JVM-side: no Python eval in the plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_parse_and_seed_pipeline(self, spark):
        rows = [
            ("https://shop.example/sitemap.xml", URLSET),
            ("https://shop.example/index.xml", INDEX),
            ("https://bad.example/sitemap.xml", b"<html>nope</html>"),  # dead-letter
            ("https://gz.example/sitemap.xml.gz", gzip.compress(URLSET)),
        ]
        df = spark.createDataFrame(rows, "url string, body binary")
        parsed = sitemap.parse_sitemaps(df)
        by_kind = {r["kind"] for r in parsed.collect()}
        assert by_kind == {"url", "sitemap"}
        # nested sitemaps surface for the crawl loop to fetch
        nested = {r["loc"] for r in parsed.filter(F.col("kind") == "sitemap").collect()}
        assert nested == {
            "https://shop.example/sitemap-a.xml.gz",
            "https://shop.example/sitemap-b.xml",
        }
        seeds = sitemap.seeds_from_sitemaps(parsed)
        got = {r["url"] for r in seeds.collect()}
        # canonicalized, garbage dropped, deduped across the two urlsets
        assert got == {
            "https://shop.example/p?a=1&b=2",
            "https://shop.example/about",
        }
        assert seeds.columns == ["url", "priority"]

    def test_seeds_feed_the_frontier(self, spark):
        from frontier_engine import frontier as FR

        df = spark.createDataFrame(
            [("https://shop.example/sitemap.xml", URLSET)], "url string, body binary"
        )
        seeds = sitemap.seeds_from_sitemaps(sitemap.parse_sitemaps(df))
        fr = FR.frontier_from_seeds(seeds)
        assert fr.count() == 2
        assert "host" in fr.columns


class TestUnescapeOrder:
    def test_nested_escapes_decode_once(self):
        # '&amp;lt;' is the LITERAL text '&lt;' — a sequential-replace
        # implementation double-decodes it to '<'
        assert sitemap._unescape("&amp;lt;") == "&lt;"
        assert sitemap._unescape("&amp;amp;") == "&amp;"
        assert sitemap._unescape("a&amp;b&lt;c&gt;d&quot;e&apos;f") == "a&b<c>d\"e'f"

    def test_loc_with_nested_escape_survives(self):
        body = (b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                b"<url><loc>https://x.example/?q=&amp;lt;tag&amp;gt;</loc></url>"
                b"</urlset>")
        entries = sitemap.parse_sitemap_body(body)
        assert entries == [("https://x.example/?q=&lt;tag&gt;", None, "url")]


LASTMOD_URLSET = b"""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://s.example/fresh</loc><lastmod>2026-06-13T00:00:00Z</lastmod></url>
  <url><loc>https://s.example/stale</loc><lastmod>2025-06-14</lastmod></url>
  <url><loc>https://s.example/nodate</loc></url>
  <url><loc>https://s.example/baddate</loc><lastmod>soonish</lastmod></url>
  <url><loc>https://s.example/future</loc><lastmod>2027-01-01</lastmod></url>
</urlset>
"""


class TestLastmodPriority:
    AS_OF = "2026-06-14 00:00:00"

    def _seeds(self, spark, **kw):
        df = spark.createDataFrame(
            [("https://s.example/sitemap.xml", LASTMOD_URLSET)],
            "url string, body binary",
        )
        parsed = sitemap.parse_sitemaps(df)
        seeds = sitemap.seeds_from_sitemaps(parsed, priority=0.5, **kw)
        return {r["url"]: r["priority"] for r in seeds.collect()}

    def test_without_as_of_flat_priority(self, spark):
        pri = self._seeds(spark)
        assert set(pri.values()) == {0.5}

    def test_fresh_outranks_stale(self, spark):
        pri = self._seeds(spark, as_of=self.AS_OF, half_life_days=30.0)
        # 1 day old at 30-day half-life ≈ 0.5 * 0.5^(1/30)
        assert pri["https://s.example/fresh"] == pytest.approx(0.5 * 0.5 ** (1 / 30))
        # 365 days old → heavily decayed
        assert pri["https://s.example/stale"] == pytest.approx(0.5 * 0.5 ** (365 / 30))
        # no/unparseable lastmod keeps the base; future lastmod clamps to age 0
        assert pri["https://s.example/nodate"] == 0.5
        assert pri["https://s.example/baddate"] == 0.5
        assert pri["https://s.example/future"] == 0.5
        order = sorted(pri, key=pri.get, reverse=True)
        assert order.index("https://s.example/fresh") < order.index(
            "https://s.example/stale"
        )

    def test_duplicate_url_keeps_best_priority(self, spark):
        two = (b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
               b"<url><loc>https://s.example/p</loc><lastmod>2026-06-13</lastmod></url>"
               b"<url><loc>https://s.example/p</loc><lastmod>2020-01-01</lastmod></url>"
               b"</urlset>")
        df = spark.createDataFrame(
            [("https://s.example/sm.xml", two)], "url string, body binary"
        )
        seeds = sitemap.seeds_from_sitemaps(
            sitemap.parse_sitemaps(df), priority=0.5, as_of=self.AS_OF
        )
        rows = seeds.collect()
        assert len(rows) == 1
        assert rows[0]["priority"] == pytest.approx(0.5 * 0.5 ** (1 / 30))

    def test_lastmod_drives_drain_order(self, spark):
        """End-to-end: fresh sitemap entries drain before stale ones."""
        from frontier_engine import frontier as FR

        df = spark.createDataFrame(
            [("https://s.example/sm.xml", LASTMOD_URLSET)], "url string, body binary"
        )
        seeds = sitemap.seeds_from_sitemaps(
            sitemap.parse_sitemaps(df), priority=0.5, as_of=self.AS_OF
        )
        fr = FR.frontier_from_seeds(seeds)
        robots = spark.createDataFrame(
            [("s.example", 3600.0, [])],
            "host string, crawl_delay double, disallow_prefixes array<string>",
        )
        # budget 1/epoch (crawl_delay == epoch_seconds): exactly one URL
        # drains, and it must be one of the age-0 group, never /stale
        drained, rest, blocked = FR.drain_epoch(
            fr, robots, FR.DrainConfig(epoch_seconds=3600.0)
        )
        got = [r["url"] for r in drained.collect()]
        assert len(got) == 1
        assert got[0] != "https://s.example/stale"
