"""Sitemap ingestion: robots.txt ``Sitemap:`` discovery + sitemap XML
parsing into frontier seeds.

The sitemaps protocol (sitemaps.org, referenced by RFC 9309) is how hosts
advertise their canonical URL inventory — the highest-quality seed source
a crawler has.  Two stages, both distributed:

1. :func:`sitemaps_from_robots` — ``Sitemap:`` lines from raw robots.txt
   bodies (a GLOBAL directive per the protocol: independent of user-agent
   groups, so it is extracted separately from the group parser in
   :mod:`frontier_engine.robots`).
2. :func:`parse_sitemaps` — fetched sitemap bodies (``.xml`` or
   ``.xml.gz``) → ``(sitemap_url, loc, lastmod, kind)`` rows, where
   ``kind`` distinguishes page URLs (``urlset``) from nested sitemaps
   (``sitemapindex``) — the caller fetches nested ones and feeds them
   back through, which keeps recursion at the crawl-loop level where the
   politeness machinery lives.

Untrusted-input posture: sitemap bodies are attacker-controlled XML, so
they are scanned with anchored tag matching rather than an XML parser —
immune to entity-expansion bombs (billion laughs) by construction, at the
cost of ignoring exotic-but-legal XML (CDATA loc values).  The spec's
per-sitemap cap (50,000 URLs) is enforced; malformed bodies dead-letter
the row.  Page URLs round through :mod:`frontier_engine.canon` before
becoming seeds, so scheme-less or garbage locs drop exactly like any
other discovered link.
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frontier_engine import canon

SITEMAP_MAX_URLS = 50_000  # sitemaps.org hard cap per file

PARSED_SCHEMA = "sitemap_url string, loc string, lastmod string, kind string"

_LOC_BLOCK = re.compile(
    rb"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.DOTALL | re.IGNORECASE
)
_LOC = re.compile(rb"<loc\s*>\s*(.*?)\s*</loc\s*>", re.DOTALL | re.IGNORECASE)
_LASTMOD = re.compile(rb"<lastmod\s*>\s*(.*?)\s*</lastmod\s*>", re.DOTALL | re.IGNORECASE)

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}
_ENTITY_RE = re.compile(r"&(?:amp|lt|gt|quot|apos);")


def _unescape(s: str) -> str:
    # single-pass: sequential str.replace double-decodes nested escapes
    # ('&amp;lt;' must yield the literal '&lt;', not '<')
    return _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)


def extract_sitemap_urls(body: str) -> list[str]:
    """``Sitemap:`` lines from a robots.txt body (global directive —
    case-insensitive, comment-stripped, order-preserving, deduped)."""
    if not body:
        return []
    out: list[str] = []
    seen = set()
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in seen:
                seen.add(val)
                out.append(val)
    return out


def parse_sitemap_body(payload: bytes) -> list[tuple[str, str | None, str]]:
    """One sitemap document → ``[(loc, lastmod, kind)]``.

    ``kind``: 'url' for page entries (urlset), 'sitemap' for nested index
    entries (sitemapindex).  Gzip payloads are inflated first.  Raises
    ``ValueError`` on undecodable/structurally hopeless input (dead-letter
    upstream); enforces the 50k-entries-per-file cap.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty sitemap body")
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError) as e:
            raise ValueError(f"sitemap gzip inflate failed: {e}") from e
    head = payload[:4096].lower()
    if b"<urlset" not in head and b"<sitemapindex" not in head:
        raise ValueError("not a sitemap (no urlset/sitemapindex root)")
    out: list[tuple[str, str | None, str]] = []
    for m in _LOC_BLOCK.finditer(payload):
        tag = m.group(1).lower()
        block = m.group(2)
        locm = _LOC.search(block)
        if not locm:
            continue
        try:
            loc = _unescape(locm.group(1).decode("utf-8").strip())
        except UnicodeDecodeError:
            continue
        lastm = _LASTMOD.search(block)
        lastmod = None
        if lastm:
            try:
                lastmod = lastm.group(1).decode("ascii").strip()
            except UnicodeDecodeError:
                lastmod = None
        kind = "url" if tag == b"url" else "sitemap"
        out.append((loc, lastmod, kind))
        if len(out) >= SITEMAP_MAX_URLS:
            break
    return out


def sitemaps_from_robots(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, robots body) → (host, sitemap_url) rows, expression-only
    where possible: split lines JVM-side, match the directive, explode."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), r"\r?\n")).alias("line"),
    )
    cleaned = lines.select(
        "host",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    )
    return (
        cleaned.filter(F.lower("line").rlike(r"^sitemap\s*:"))
        .select(
            "host",
            F.trim(F.regexp_replace("line", r"(?i)^sitemap\s*:\s*", "")).alias("sitemap_url"),
        )
        .filter(F.length("sitemap_url") > 0)
        .dropDuplicates(["host", "sitemap_url"])
    )


def parse_sitemaps(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(sitemap url, body binary) → (sitemap_url, loc, lastmod, kind).

    Arrow-batched mapInPandas; malformed bodies are dropped per-row
    (dead-letter contract for untrusted crawl input)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"sitemap_url": [], "loc": [], "lastmod": [], "kind": []}
            for url, body in zip(pdf[url_col], pdf[body_col]):
                if body is None:
                    continue
                try:
                    entries = parse_sitemap_body(bytes(body))
                except ValueError:
                    continue
                for loc, lastmod, kind in entries:
                    rows["sitemap_url"].append(url)
                    rows["loc"].append(loc)
                    rows["lastmod"].append(lastmod)
                    rows["kind"].append(kind)
            if rows["loc"]:
                yield pd.DataFrame(rows)

    return df.select(url_col, body_col).mapInPandas(run, schema=PARSED_SCHEMA)


def seeds_from_sitemaps(
    parsed: DataFrame,
    priority: float = 0.5,
    as_of: str | None = None,
    half_life_days: float = 30.0,
) -> DataFrame:
    """Page entries → frontier-ready ``(url, priority)`` seeds:
    canonicalized, garbage dropped, deduped — identical treatment to any
    other discovered link (:func:`frontier.frontier_from_seeds` consumes
    this directly).

    ``as_of`` (a logical-clock timestamp string — never wall clock, the
    determinism contract) turns ``lastmod`` into freshness-weighted
    priority: ``priority × 0.5^(age_days / half_life_days)``, so a page
    modified yesterday outranks one modified a year ago in the drain order
    (the reference's re-run cadence intent,
    /root/reference/crawler/json_fetch.py:29, generalized).  Entries with
    no/unparseable lastmod (``try_to_timestamp``) keep the base priority;
    future lastmods clamp to age 0.  A URL listed in several sitemaps keeps
    its BEST priority (max — deterministic, unlike a dropDuplicates pick).
    """
    locs = parsed.filter(F.col("kind") == "url").select(
        canon.canonicalize_col(F.col("loc")).alias("url"), "lastmod"
    ).filter(F.col("url").rlike("^https?://"))  # garbage locs drop
    if as_of is None:
        pri = F.lit(float(priority))
    else:
        lm = F.try_to_timestamp(F.col("lastmod"))
        age_days = F.greatest(
            F.lit(0.0),
            (F.unix_timestamp(F.lit(as_of).cast("timestamp")) - F.unix_timestamp(lm))
            / F.lit(86400.0),
        )
        pri = F.when(
            lm.isNotNull(),
            F.lit(float(priority)) * F.pow(F.lit(0.5), age_days / F.lit(half_life_days)),
        ).otherwise(F.lit(float(priority)))
    return locs.withColumn("priority", pri).groupBy("url").agg(
        F.max("priority").alias("priority")
    )
