"""RSS/Atom feed ingestion: feed autodiscovery from HTML plus feed XML
parsing into frontier seeds — the third URL-discovery channel next to
page links (:mod:`frontier_engine.extract`) and sitemaps
(:mod:`frontier_engine.sitemap`).

Feeds are how hosts advertise their FRESH inventory (sitemaps advertise
the full canonical one), so feed entries carry recency and deserve
freshness-weighted frontier priority. Generalizes the reference's
fixed-cadence refetch intent the same way sitemap ingestion does
(/root/reference/crawler/json_fetch.py:29).

Stages, all distributed:

1. :func:`feeds_from_html` — RSS/Atom autodiscovery
   (``<link rel="alternate" type="application/rss+xml|atom+xml"
   href=...>``) over fetched page heads; relative hrefs resolve against
   the page URL.
2. :func:`parse_feeds` — fetched feed bodies → ``(feed_url, loc,
   updated, kind)`` rows; RSS 2.0 ``<item>`` and Atom ``<entry>``
   dialects, gzip payloads inflated.
3. :func:`seeds_from_feeds` — entries → frontier-ready ``(url,
   priority)`` seeds, delegating canonicalization / garbage-drop /
   freshness weighting to :func:`sitemap.seeds_from_sitemaps` (one
   policy, two discovery channels).

Untrusted-input posture matches :mod:`frontier_engine.sitemap`: anchored
regex scanning (entity-bomb-immune by construction, no XML parser), a
per-feed entry cap, per-row dead-letter on malformed bodies. Timestamps
are normalized AT PARSE TIME — RSS's RFC 822 ``<pubDate>`` and Atom's
RFC 3339 ``<updated>`` both become ``YYYY-MM-DD HH:MM:SS`` UTC strings —
so the downstream freshness math is one shared ``try_to_timestamp``
expression regardless of dialect.
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator
from datetime import timezone
from email.utils import parsedate_to_datetime
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frontier_engine.sitemap import _unescape, seeds_from_sitemaps

FEED_MAX_ENTRIES = 5_000  # per-feed cap (sitemaps get 50k; feeds are "recent")

PARSED_SCHEMA = "feed_url string, loc string, updated string, kind string"

# -------------------------------------------------- autodiscovery (HTML)

# <link ...> tags in the head region; attribute patterns are name-anchored
# ((?:^|\s)) exactly like extract.py's — 'data-href=' must not match.
_LINK_TAG_RE = re.compile(r"(?is)<link(\s[^>]*)>")
_HREF_RE = re.compile(r"(?is)(?:^|\s)href\s*=\s*[\"']([^\"']+)[\"']")
_REL_RE = re.compile(r"(?is)(?:^|\s)rel\s*=\s*[\"']([^\"']*)[\"']")
_TYPE_RE = re.compile(r"(?is)(?:^|\s)type\s*=\s*[\"']([^\"']*)[\"']")

_FEED_TYPES = ("application/rss+xml", "application/atom+xml")

DISCOVERED_SCHEMA = "url string, feed_url string, feed_type string"


def discover_feeds_py(page_url: str, html: str) -> list[tuple[str, str]]:
    """``[(feed_url, feed_type)]`` from one page's HTML — the pure
    function shared by the Spark UDF and any oracle, extract.py-style.
    ``feed_type`` is 'rss' or 'atom'."""
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for m in _LINK_TAG_RE.finditer(html):
        attrs = m.group(1)
        relm = _REL_RE.search(attrs)
        if not relm or "alternate" not in relm.group(1).lower().split():
            continue
        typem = _TYPE_RE.search(attrs)
        if not typem:
            continue
        mime = typem.group(1).strip().lower()
        if mime not in _FEED_TYPES:
            continue
        hrefm = _HREF_RE.search(attrs)
        if not hrefm:
            continue
        absu = urljoin(page_url, _unescape(hrefm.group(1).strip()))
        if not absu.startswith(("http://", "https://")) or absu in seen:
            continue
        seen.add(absu)
        out.append((absu, "rss" if mime == _FEED_TYPES[0] else "atom"))
    return out


def feeds_from_html(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(page url, html) → ``(url, feed_url, feed_type)`` rows via
    Arrow-batched mapInPandas — one row per feed a page advertises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "feed_url": [], "feed_type": []}
            for url, html in zip(pdf[url_col], pdf[html_col]):
                if html is None:
                    continue
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                for feed_url, feed_type in discover_feeds_py(url, html):
                    rows["url"].append(url)
                    rows["feed_url"].append(feed_url)
                    rows["feed_type"].append(feed_type)
            if rows["url"]:
                yield pd.DataFrame(rows)

    return df.select(url_col, html_col).mapInPandas(run, schema=DISCOVERED_SCHEMA)


# -------------------------------------------------- feed body parsing

_ITEM_BLOCK = re.compile(rb"<(item|entry)\b[^>]*>(.*?)</\1>", re.DOTALL | re.IGNORECASE)
_RSS_LINK = re.compile(rb"<link\s*>\s*(.*?)\s*</link\s*>", re.DOTALL | re.IGNORECASE)
_ATOM_LINK = re.compile(
    rb"(?is)<link\b([^>]*)/?>",
)
_ATOM_HREF = re.compile(rb"(?is)(?:^|\s)href\s*=\s*[\"']([^\"']+)[\"']")
_ATOM_REL = re.compile(rb"(?is)(?:^|\s)rel\s*=\s*[\"']([^\"']*)[\"']")
_PUBDATE = re.compile(rb"<pubDate\s*>\s*(.*?)\s*</pubDate\s*>", re.DOTALL | re.IGNORECASE)
_UPDATED = re.compile(
    rb"<(updated|published)\s*>\s*(.*?)\s*</\1\s*>", re.DOTALL | re.IGNORECASE
)
_RFC3339 = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})(?:\.\d+)?"
    r"(Zz?|[+-]\d{2}:?\d{2})?"
)


def _norm_rfc822(raw: str) -> str | None:
    """RFC 822/1123 date → 'YYYY-MM-DD HH:MM:SS' UTC, or None."""
    try:
        dt = parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def _norm_rfc3339(raw: str) -> str | None:
    """RFC 3339 (Atom) date → 'YYYY-MM-DD HH:MM:SS' UTC, or None.
    Hand-rolled offset math (no fromisoformat: pre-3.11 rejects 'Z')."""
    m = _RFC3339.match(raw.strip())
    if not m:
        return None
    y, mo, d, h, mi, s = (int(m.group(i)) for i in range(1, 7))
    off = m.group(7) or "Z"
    try:
        from datetime import datetime, timedelta

        dt = datetime(y, mo, d, h, mi, s, tzinfo=timezone.utc)
        if off not in ("Z", "z", ""):
            sign = 1 if off[0] == "+" else -1
            oh, om = int(off[1:3]), int(off[-2:])
            dt -= sign * timedelta(hours=oh, minutes=om)
    except ValueError:
        return None
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def parse_feed_body(payload: bytes) -> list[tuple[str, str | None, str]]:
    """One feed document → ``[(loc, updated, kind)]`` with ``kind`` in
    {'rss', 'atom'} and ``updated`` already normalized to UTC
    'YYYY-MM-DD HH:MM:SS' (or None). Gzip payloads inflate first. Raises
    ``ValueError`` on undecodable/structurally hopeless input
    (dead-letter upstream); enforces :data:`FEED_MAX_ENTRIES`."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty feed body")
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError) as e:
            raise ValueError(f"feed gzip inflate failed: {e}") from e
    head = payload[:4096].lower()
    if b"<rss" not in head and b"<feed" not in head and b"<rdf:rdf" not in head:
        raise ValueError("not a feed (no rss/feed root)")
    out: list[tuple[str, str | None, str]] = []
    for m in _ITEM_BLOCK.finditer(payload):
        kind = "rss" if m.group(1).lower() == b"item" else "atom"
        block = m.group(2)
        loc = None
        if kind == "rss":
            lm = _RSS_LINK.search(block)
            if lm:
                try:
                    loc = _unescape(lm.group(1).decode("utf-8").strip())
                except UnicodeDecodeError:
                    loc = None
        else:
            # Atom: prefer rel="alternate" (or rel-less) link href;
            # whitespace-token match like the HTML side — 'alternate-media'
            # must not pass as 'alternate'
            for lm in _ATOM_LINK.finditer(block):
                attrs = lm.group(1)
                relm = _ATOM_REL.search(attrs)
                if relm and b"alternate" not in relm.group(1).lower().split():
                    continue
                hm = _ATOM_HREF.search(attrs)
                if hm:
                    try:
                        loc = _unescape(hm.group(1).decode("utf-8").strip())
                    except UnicodeDecodeError:
                        loc = None
                    break
        if not loc:
            continue
        updated = None
        if kind == "rss":
            dm = _PUBDATE.search(block)
            if dm:
                try:
                    updated = _norm_rfc822(dm.group(1).decode("ascii").strip())
                except UnicodeDecodeError:
                    updated = None
        else:
            dm = _UPDATED.search(block)
            if dm:
                try:
                    updated = _norm_rfc3339(dm.group(2).decode("ascii").strip())
                except UnicodeDecodeError:
                    updated = None
        out.append((loc, updated, kind))
        if len(out) >= FEED_MAX_ENTRIES:
            break
    return out


def parse_feeds(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(feed url, body binary) → ``(feed_url, loc, updated, kind)``.
    Arrow-batched mapInPandas; malformed bodies drop per-row (the
    dead-letter contract for untrusted crawl input)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"feed_url": [], "loc": [], "updated": [], "kind": []}
            for url, body in zip(pdf[url_col], pdf[body_col]):
                if body is None:
                    continue
                try:
                    entries = parse_feed_body(bytes(body))
                except ValueError:
                    continue
                for loc, updated, kind in entries:
                    rows["feed_url"].append(url)
                    rows["loc"].append(loc)
                    rows["updated"].append(updated)
                    rows["kind"].append(kind)
            if rows["loc"]:
                yield pd.DataFrame(rows)

    return df.select(url_col, body_col).mapInPandas(run, schema=PARSED_SCHEMA)


def seeds_from_feeds(
    parsed: DataFrame,
    priority: float = 0.5,
    as_of: str | None = None,
    half_life_days: float = 7.0,
) -> DataFrame:
    """Feed entries → frontier-ready ``(url, priority)`` seeds.

    Delegates to :func:`sitemap.seeds_from_sitemaps` (one seed policy
    across discovery channels) by presenting entries in its shape; the
    default ``half_life_days`` is shorter than the sitemap default
    because feed recency decays faster — a week-old feed entry is stale,
    a week-old sitemap entry is normal."""
    shaped = parsed.select(
        F.col("loc"),
        F.col("updated").alias("lastmod"),
        F.lit("url").alias("kind"),
    )
    return seeds_from_sitemaps(
        shaped, priority=priority, as_of=as_of, half_life_days=half_life_days
    )
