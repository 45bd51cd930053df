"""Byte-exact HTML→text and out-link extraction.

The north-rule invariant is *byte-identical extracted text per URL* between
the engine and the reference-semantics oracle. The only safe way to get that
with no HTML-parser dependency available offline is ONE pure function used by
both sides:

- the oracle calls ``extract_text_py`` / ``extract_links_py`` directly;
- the engine wraps the same functions in Arrow-batched pandas UDFs
  (``text_udf`` / ``links_udf``) — Series in/Series out, no row-at-a-time
  ``F.udf``.

Reference parse analogue: BeautifulSoup selector scrape at
/root/reference/crawler/stores/cooponline.py:242-259 and :491-511 (link
extraction) and ``page.content()`` text at :493 — generalized here to a
trafilatura-style tag-stripping extractor.
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style|noscript)[^>]*>.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(r"(?is)<a\s[^>]*?href\s*=\s*[\"']([^\"'#][^\"']*)[\"']")


def extract_text_py(html_bytes: bytes | None) -> str:
    """Deterministic tag-stripping text extraction (shared engine+oracle)."""
    if html_bytes is None:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s).strip()
    return s


def extract_links_py(html_bytes: bytes | None, base_url: str) -> list[str]:
    """Ordered, de-duplicated list of absolute out-links.

    Order is first-occurrence document order (the reference crawls menu links
    in DOM order — /root/reference/crawler/stores/cooponline.py:497-511); the
    engine relies on this being deterministic, not on the order itself.
    """
    if html_bytes is None:
        return []
    s = html_bytes.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", s)
    out: list[str] = []
    seen: set[str] = set()
    for href in _HREF_RE.findall(s):
        href = _html.unescape(href.strip())
        if href.startswith(("javascript:", "mailto:", "data:")):
            continue
        absu = urljoin(base_url, href)
        if not absu.startswith(("http://", "https://")):
            continue
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


# ---------------------------------------------------------------- Spark side


@F.pandas_udf(T.StringType())
def text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def links_udf_factory():
    """pandas UDF (html, base_url) → array<string> of absolute out-links."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links_py(h, b) for h, b in zip(html, base_url)],
            index=html.index,
            dtype=object,
        )

    return links_udf


links_udf = links_udf_factory()
