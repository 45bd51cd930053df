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

import codecs as _codecs
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
_A_TAG_RE = re.compile(r"(?is)<a(\s[^>]*)>")
# (?:^|\s) anchors the attribute NAME: without it 'data-src=' / 'data-href='
# lazy-loading attributes would satisfy the bare 'src\s*=' pattern and harvest
# the wrong URL on real pages. The *_TAG_RE groups capture '(\s[^>]*)', so the
# first attribute in every attrs string is always preceded by whitespace.
_HREF_IN_RE = re.compile(r"(?is)(?:^|\s)href\s*=\s*[\"']([^\"'#][^\"']*)[\"']")
_REL_IN_RE = re.compile(r"(?is)(?:^|\s)rel\s*=\s*[\"']([^\"']*)[\"']")
_META_ROBOTS_RE = re.compile(
    r"(?is)<meta\s[^>]*name\s*=\s*[\"']?robots[\"']?[^>]*>"
)
_META_CONTENT_RE = re.compile(r"(?is)content\s*=\s*[\"']([^\"']*)[\"']")
_DIRECTIVE_SPLIT_RE = re.compile(r"[\s,]+")
_ASCII_LOWER = bytes.maketrans(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZ", b"abcdefghijklmnopqrstuvwxyz"
)
# meta robots is only valid inside <head>; bound the scan there (or to a
# cap when no <body> marker exists) so the per-page cost is a memchr +
# a small translate, not a full-page regex
_HEAD_CAP = 16384


def _head_region(hb: bytes) -> bytes:
    end = hb.find(b"<body")
    if end < 0:
        end = hb.find(b"<BODY")
    if end < 0:
        end = min(len(hb), _HEAD_CAP)
    return hb[:end]


_CHARSET_RE = re.compile(
    r"(?is)charset\s*=\s*[\"']?\s*([A-Za-z0-9._\-]+)"
)
# charset labels seen in the wild → Python codec names (WHATWG encoding
# labels; the long tail maps per spec — e.g. HTML5 says latin-1 content
# is PROCESSED as windows-1252)
_CHARSET_ALIASES = {
    "iso-8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "windows-1252": "cp1252",
    "iso-8859-15": "iso-8859-15",
    "utf8": "utf-8",
}


def sniff_charset_py(html_bytes: bytes | None) -> str:
    """Charset of an HTML payload: BOM first (authoritative per WHATWG),
    then a ``charset=`` declaration in the head region (``<meta
    charset=…>`` or the http-equiv Content-Type form), else UTF-8.

    ~20% of real web pages are not UTF-8 (Common Crawl's own stats);
    decoding them as UTF-8-with-replacement destroys every non-ASCII
    character. Bytes-level fast path: no ``charset`` substring in the
    head region → default, no decode, no regex.
    """
    if not html_bytes:
        return "utf-8"
    if html_bytes.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if html_bytes.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if html_bytes.startswith(b"\xfe\xff"):
        return "utf-16-be"
    region = _head_region(html_bytes)
    if b"charset" not in region.translate(_ASCII_LOWER):
        return "utf-8"
    m = _CHARSET_RE.search(region.decode("latin-1"))
    if not m:
        return "utf-8"
    label = m.group(1).strip().lower()
    codec = _CHARSET_ALIASES.get(label, label)
    try:
        # codecs.lookup, not b"".decode(...): CPython short-circuits
        # empty-bytes decode without validating the codec name
        _codecs.lookup(codec)
    except (LookupError, ValueError):
        return "utf-8"
    return codec


def decode_html_py(html_bytes: bytes | None) -> str:
    """Decode an HTML payload by its sniffed charset (errors → U+FFFD).
    Shared by the engine UDFs and the oracle — charset handling is part
    of the byte-identical text contract, not an engine-side detail."""
    if html_bytes is None:
        return ""
    return html_bytes.decode(sniff_charset_py(html_bytes), errors="replace")


def meta_robots_py(html_bytes: bytes | None) -> frozenset[str]:
    """Directives of every ``<meta name=robots>`` tag, lowercased
    (``noindex``, ``nofollow``, ``none``, …) — the Robots Exclusion
    Protocol's page-level channel (Google/Bing robots-meta semantics;
    robots.txt covers fetch permission, this covers what a compliant
    crawler may do WITH a fetched page)."""
    if not html_bytes:
        return frozenset()
    # bytes-level fast path over the head region only: no case-folded
    # 'robots' substring → no robots meta tag ('robots' case folds are
    # pure ASCII, so the translate+find scan is exhaustive there). The
    # overwhelming majority of pages return here without ever decoding.
    region = _head_region(html_bytes)
    if b"robots" not in region.translate(_ASCII_LOWER):
        return frozenset()
    s = region.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", s)
    out: set[str] = set()
    for tag in _META_ROBOTS_RE.findall(s):
        m = _META_CONTENT_RE.search(tag)
        if m:
            for d in _DIRECTIVE_SPLIT_RE.split(m.group(1).strip().lower()):
                if d:
                    out.add(d)
    # 'none' is the spec'd shorthand for 'noindex, nofollow'
    if "none" in out:
        out.update(("noindex", "nofollow"))
    return frozenset(out)


def noindex_py(html_bytes: bytes | None) -> bool:
    """True when the page forbids indexing (meta robots ``noindex``):
    a compliant crawler may follow its links but must not keep the page
    in the served/indexed corpus."""
    return "noindex" in meta_robots_py(html_bytes)


_LINK_TAG_RE = re.compile(r"(?is)<link(\s[^>]*)>")


def canonical_py(html_bytes: bytes | None, base_url: str) -> str | None:
    """The page's ``<link rel=canonical>`` target as an absolute URL, or
    None when absent/invalid. Head-region scan with a bytes fast path
    (no case-folded ``canonical`` substring → no decode, no regex). The
    FIRST canonical wins when a page declares several (the search-engine
    convention for conflicting hints); relative hrefs resolve against
    ``base_url``; only http(s) targets count. This is the page-level
    dedup/alias signal Common Crawl surfaces in WAT metadata — mirror
    clustering and index canonicalization consume it without content
    comparison."""
    if not html_bytes:
        return None
    region = _head_region(html_bytes)
    if b"canonical" not in region.translate(_ASCII_LOWER):
        return None
    s = region.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", s)
    for attrs in _LINK_TAG_RE.findall(s):
        rm = _REL_IN_RE.search(attrs)
        if rm is None or "canonical" not in _DIRECTIVE_SPLIT_RE.split(
            rm.group(1).strip().lower()
        ):
            continue
        hm = _HREF_IN_RE.search(attrs)
        if hm is None:
            continue
        absu = urljoin(base_url, _html.unescape(hm.group(1).strip()))
        if absu.startswith(("http://", "https://")):
            return absu
    return None


def extract_text_py(html_bytes: bytes | None) -> str:
    """Deterministic tag-stripping text extraction (shared engine+oracle);
    decodes by sniffed charset (BOM / meta declaration, UTF-8 default)."""
    if html_bytes is None:
        return ""
    s = decode_html_py(html_bytes)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    # whitespace collapse: " ".join(s.split()) is char-for-char equivalent
    # to _WS_RE.sub(" ", s).strip() (re \s and str.isspace agree on every
    # codepoint — exhaustively checked) and one C pass instead of a regex
    # scan; this line was 74% of the extractor's per-page cost
    return " ".join(s.split())


def extract_links_py(html_bytes: bytes | None, base_url: str) -> list[str]:
    """Ordered, de-duplicated list of absolute out-links, REP-compliant.

    Order is first-occurrence document order (the reference crawls menu links
    in DOM order — /root/reference/crawler/stores/cooponline.py:497-511); the
    engine relies on this being deterministic, not on the order itself.

    Robots-meta semantics: a page-level ``<meta name=robots
    content=nofollow>`` yields no links at all; a per-link
    ``rel="nofollow"`` (any token position, also ``ugc``/``sponsored``
    carriers with nofollow present) drops that link. Shared verbatim by
    the engine UDF and the Python oracle, so compliance is part of the
    byte-identical crawl-equivalence contract, not a divergence risk.
    """
    if html_bytes is None:
        return []
    s = decode_html_py(html_bytes)
    s = _COMMENT_RE.sub(" ", s)
    if "nofollow" in meta_robots_py(html_bytes):
        return []
    out: list[str] = []
    seen: set[str] = set()
    for attrs in _A_TAG_RE.findall(s):
        hm = _HREF_IN_RE.search(attrs)
        if hm is None:
            continue
        rm = _REL_IN_RE.search(attrs)
        if rm is not None and "nofollow" in _DIRECTIVE_SPLIT_RE.split(
            rm.group(1).strip().lower()
        ):
            continue
        href = _html.unescape(hm.group(1).strip())
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


_TEXT_META_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("noindex", T.BooleanType()),
    ]
)


@F.pandas_udf(_TEXT_META_TYPE)
def text_meta_udf(html: pd.Series) -> pd.DataFrame:
    """Text + the noindex verdict in ONE Arrow pass over html (the crawl
    loop needs both per fetched page; two separate UDFs would decode the
    corpus twice)."""
    return pd.DataFrame(
        {
            "text": html.map(extract_text_py),
            "noindex": html.map(noindex_py),
        },
        index=html.index,
    )


@F.pandas_udf(T.StringType())
def canonical_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """pandas UDF (html, base_url) → the rel=canonical target (nullable)."""
    return pd.Series(
        [canonical_py(h, b) for h, b in zip(html, base_url)],
        index=html.index,
        dtype=object,
    )


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


# --------------------------------------------------- image-text pair mining

_IMG_TAG_RE = re.compile(r"(?is)<img(\s[^>]*)>")
# Name-anchored like _HREF_IN_RE: '<img data-src=...>' (lazy loading) must
# not match as src, and 'data-alt=' must not match as alt.
_SRC_IN_RE = re.compile(r"(?is)(?:^|\s)src\s*=\s*[\"']([^\"'#][^\"']*)[\"']")
_ALT_IN_RE = re.compile(r"(?is)(?:^|\s)alt\s*=\s*[\"']([^\"']*)[\"']")


def image_alt_pairs_py(
    html_bytes: bytes | None,
    base_url: str,
    min_alt_chars: int = 5,
    max_alt_chars: int = 512,
) -> list[tuple[str, str]]:
    """LAION-style (image URL, alt text) pair extraction from one page —
    the harvesting step that built LAION-400M/5B (Schuhmann et al.
    2021/2022) out of Common Crawl: every ``<img>`` whose ``alt``
    attribute carries a plausible caption becomes one (image, text)
    candidate for contrastive vision-language training.

    Rules (fixed, shared engine+oracle like :func:`extract_links_py`):
    ``src`` and ``alt`` must both be present and quoted; ``alt`` is
    entity-unescaped and whitespace-normalized, then length-gated to
    [min_alt_chars, max_alt_chars] (LAION's "alt too short/too long is
    not a caption" filter); ``data:``/``javascript:`` sources are
    skipped; ``src`` resolves against the page URL and must come out
    http(s). Order is first occurrence, de-duplicated on the resolved
    (src, alt) pair. Downloading the bytes is out of scope here — the
    emitted image URLs feed the frontier like any other fetch
    candidates, and the fetched payloads flow through
    ``multimodal.decode_features``.
    """
    if html_bytes is None:
        return []
    s = decode_html_py(html_bytes)
    s = _COMMENT_RE.sub(" ", s)
    out: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    for attrs in _IMG_TAG_RE.findall(s):
        sm = _SRC_IN_RE.search(attrs)
        am = _ALT_IN_RE.search(attrs)
        if sm is None or am is None:
            continue
        src = _html.unescape(sm.group(1).strip())
        if src.startswith(("data:", "javascript:")):
            continue
        alt = _WS_RE.sub(" ", _html.unescape(am.group(1))).strip()
        if not (min_alt_chars <= len(alt) <= max_alt_chars):
            continue
        absu = urljoin(base_url, src)
        if not absu.startswith(("http://", "https://")):
            continue
        if (absu, alt) in seen:
            continue
        seen.add((absu, alt))
        out.append((absu, alt))
    return out


_IMG_ALT_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("img_url", T.StringType()),
            T.StructField("alt", T.StringType()),
        ]
    )
)


@F.pandas_udf(_IMG_ALT_TYPE)
def image_alt_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """pandas UDF (html, base_url) → array<struct<img_url, alt>>."""
    return pd.Series(
        [image_alt_pairs_py(h, b) for h, b in zip(html, base_url)],
        index=html.index,
        dtype=object,
    )


def image_text_pairs(
    df, html_col: str = "html", url_col: str = "url"
):
    """One (page_url, img_url, alt) row per harvested pair: the page
    table → LAION-candidate table operator. Arrow-batched extraction +
    a generator-style explode; no shuffle at all — pair harvesting is
    embarrassingly parallel over page partitions, so at 100 TB this is
    a single map stage whose output lands partitioned exactly like the
    input corpus."""
    return df.select(
        F.col(url_col).alias("page_url"),
        F.explode(image_alt_udf(F.col(html_col), F.col(url_col))).alias("_p"),
    ).select("page_url", F.col("_p.img_url").alias("img_url"), F.col("_p.alt").alias("alt"))
