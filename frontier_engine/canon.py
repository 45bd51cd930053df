"""URL canonicalization + hashing.

The reference's dedup identity is the composite key ``(store_id, sku)``
(/root/reference/db/__init__.py:40 and the SQLite PKs); the generalized
engine's identity is the canonicalized URL hashed with xxhash64.

Two implementations that MUST agree byte-for-byte (property-tested in
tests/test_canon.py):

- ``canonicalize_py``   pure Python — used by the oracle crawler and tests
- ``canonicalize_col``  Spark column expression — JVM-side, whole-stage
                        codegen, used in the hot path (no Python per row)

Canonical form:
  * strip surrounding whitespace — an EXPLICIT charset (space, \t, \n, \r,
    \f, \v, NBSP) applied identically on both paths; Python's bare
    ``str.strip()`` and Spark's ``F.trim`` disagree on tabs/newlines/NBSP,
    which would split the dedup identity between engine and oracle
  * drop the fragment (``#...``)
  * lowercase scheme and netloc
  * strip default ports (``:80`` for http, ``:443`` for https)
  * empty path → ``/``
Anything that does not look like an http(s) URL is passed through with only
whitespace/fragment stripping (it then fails the host filter downstream and
is dropped — mirrors the reference's skip-invalid guards,
/root/reference/crawler/stores/cooponline.py:214-216).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Inline (?i) so the Python and Java regex engines agree on case handling.
_URL_PATTERN = "(?i)^(https?)://([^/?#]+)([^#]*)$"
_URL_RE = re.compile(_URL_PATTERN)

# the one whitespace set both engines strip: Java \s (space \t \n \x0B \f \r)
# plus NBSP. Java regex: [\s ]; Python str.strip charset below.
_STRIP_CHARS = " \t\n\x0b\f\r\u00a0"
_STRIP_RE = "^[\\s\\u00A0]+|[\\s\\u00A0]+$"


def canonicalize_py(url: str) -> str:
    u = url.strip(_STRIP_CHARS)
    h = u.find("#")
    if h >= 0:
        u = u[:h]
    m = _URL_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    netloc = m.group(2).lower()
    rest = m.group(3)
    # strip the scheme's default port only when the host part (after the
    # last @) carries exactly one colon — otherwise stripping would expose
    # another ':NN' suffix and canonicalization would not be idempotent
    hostpart = netloc[netloc.rfind("@") + 1 :]
    default = ":80" if scheme == "http" else ":443"
    if hostpart.endswith(default) and ":" not in hostpart[: -len(default)]:
        netloc = netloc[: -len(default)]
    if rest == "":
        rest = "/"
    return f"{scheme}://{netloc}{rest}"


def host_of_py(canonical_url: str) -> str:
    m = _URL_RE.match(canonical_url)
    if not m:
        return ""
    netloc = m.group(2)
    at = netloc.rfind("@")
    if at >= 0:
        netloc = netloc[at + 1 :]
    colon = netloc.rfind(":")
    if colon >= 0 and netloc[colon + 1 :].isdigit():
        netloc = netloc[:colon]
    return netloc


def path_of_py(canonical_url: str) -> str:
    m = _URL_RE.match(canonical_url)
    if not m:
        return ""
    rest = m.group(3)
    q = rest.find("?")
    return rest[:q] if q >= 0 else rest


def canonicalize_col(url: Column) -> Column:
    """Column-expression twin of :func:`canonicalize_py` (whole-stage codegen).

    Built COMPACT on purpose: the stripped+defragged intermediate is
    referenced ~6× (Catalyst expressions are trees — every reference
    inlines the subtree), and the default-port strip runs as two
    post-assembly regexp_replaces instead of a netloc CASE that would
    quadruple the references. This keeps the whole expression small enough
    to stay under the JVM 64 KB codegen limit even when the optimizer
    substitutes it into a pushed-down filter predicate.
    """
    # strip + defrag in one chain; (?s) so '#.*' consumes internal newlines
    u = F.regexp_replace(F.regexp_replace(url, _STRIP_RE, ""), "(?s)#.*", "")
    scheme = F.lower(F.regexp_extract(u, _URL_PATTERN, 1))
    netloc = F.lower(F.regexp_extract(u, _URL_PATTERN, 2))
    rest = F.regexp_extract(u, _URL_PATTERN, 3)
    assembled = F.concat(
        scheme, F.lit("://"), netloc, F.when(rest == "", F.lit("/")).otherwise(rest)
    )
    canonical = F.when(scheme == "", u).otherwise(assembled)
    # default-port strip AFTER assembly (scheme+netloc already lowercase):
    # ':80'/':443' at the end of the authority, for the matching scheme,
    # only when the host part has no other colon (idempotence — see
    # canonicalize_py)
    canonical = F.regexp_replace(
        canonical, "^(http://(?:[^/?#]*@)?[^/?#:]*):80(?=[/?#]|$)", "$1"
    )
    canonical = F.regexp_replace(
        canonical, "^(https://(?:[^/?#]*@)?[^/?#:]*):443(?=[/?#]|$)", "$1"
    )
    return canonical


# host of a canonical URL in ONE regex: authority minus userinfo (greedy
# [^/?#]*@ swallows up to the LAST @) minus a trailing all-digit port
# (backtracking makes the lazy host group give up ':digits' only when the
# whole port matches to the boundary — same as host_of_py's rfind+isdigit)
_HOST_PATTERN = "(?i)^https?://(?:[^/?#]*@)?([^/?#]*?)(?::[0-9]+)?(?=[/?#]|$)"


def host_col(canonical_url: Column) -> Column:
    """Host of an already-canonical URL (netloc minus userinfo/port).

    Single ``regexp_extract`` so that expressions referencing it (and
    filters the optimizer pushes down with it inlined) stay small — the old
    CASE form inlined the netloc extraction 8×.
    """
    return F.regexp_extract(canonical_url, _HOST_PATTERN, 1)


def path_col(canonical_url: Column) -> Column:
    rest = F.regexp_extract(canonical_url, _URL_PATTERN, 3)
    return F.when(rest.contains("?"), F.substring_index(rest, "?", 1)).otherwise(rest)


def pathq_of_py(canonical_url: str) -> str:
    """Path INCLUDING the query string — the robots match target per
    RFC 9309 §2.2.2 (rules like ``Disallow: /*?sessionid=`` must see it)."""
    m = _URL_RE.match(canonical_url)
    return m.group(3) if m else ""


def pathq_col(canonical_url: Column) -> Column:
    """Column twin of :func:`pathq_of_py`."""
    return F.regexp_extract(canonical_url, _URL_PATTERN, 3)


def url_hash_col(canonical_url: Column) -> Column:
    """64-bit identity of a canonical URL — Spark built-in xxhash64 (seed 42).

    Stays JVM-side; the Bloom/bitmap layer derives its k probe positions from
    this value with a splitmix64 finalizer (see seen.py), so no Python-side
    hash of the URL string is ever needed.
    """
    return F.xxhash64(canonical_url)


def canonical_first(df, raw_col: Column, url_name: str = "url"):
    """Materialize the canonical URL in its own projection so downstream
    columns (hashes, host) and filters reference an attribute instead of
    re-inlining the canonical expression per use. (Catalyst expressions are
    trees; CollapseProject will not re-merge a non-cheap, multiply-
    referenced alias.)"""
    return df.withColumn(url_name, canonicalize_col(raw_col))


def identity_first(df, raw_col: Column, url_name: str = "url"):
    """Canonical url + url_hash + url_hash2 + host in staged projections —
    each derived column references the canonical attribute once.

    NOTE the optimizer may still push a downstream filter (e.g.
    ``host != ''``) below these projections with the aliases substituted —
    that is fine and even desirable (rows drop at the scan) BECAUSE
    canonicalize_col/host_col are deliberately compact; see their
    docstrings for the 64 KB codegen-budget reasoning.
    """
    d = canonical_first(df, raw_col, url_name)
    return (
        d.withColumn("host", host_col(F.col(url_name)))
        .withColumn("url_hash", url_hash_col(F.col(url_name)))
        .withColumn("url_hash2", url_hash2_col(F.col(url_name)))
    )


def url_hash2_col(canonical_url: Column) -> Column:
    """Independent second 64-bit hash (a salt column ahead of the URL gives
    a different xxhash64 stream). Together with :func:`url_hash_col` this is
    a 128-bit identity: at 10^10 URLs the expected number of (h1, h2)
    collisions is n²/2^129 ≈ 10^-19, vs ~2-3 silent merges for 64 bits —
    the exact-tier key is (h1, h2), matching the reference's exact PK
    semantics (/root/reference/db/__init__.py:40) without storing strings.
    """
    return F.xxhash64(F.lit("fe-h2"), canonical_url)


def surt_py(canonical_url: str) -> str:
    """SURT key (Sort-friendly URI Reordering Transform) of a canonical
    URL — the sort key of the Common Crawl / OpenWayback CDX URL index
    (format: ``com,example)/path?a=1&b=2``).

    Reversing the host components makes one domain's pages — and one
    *organization's* subdomains — lexicographically contiguous, so a
    range-sharded index answers "every page under example.com" with a
    range scan instead of a full scan. Transform (matching the CDX
    convention): drop scheme and userinfo; strip one leading
    ``www``/``www<digits>`` label (unless that empties the host);
    reverse the remaining labels joined with commas; keep a non-default
    port (``com,example:8080)``); append ``)`` + path; sort query
    parameters (dropping empty ``&&`` tokens, ``?`` dropped when none
    survive); lowercase the whole key. Non-http(s) input → ``""``.

    Python twin of :func:`surt_col` — the pair must agree byte-for-byte
    (property-tested in tests/test_canon.py) because the oracle index
    and the engine index must sort identically.
    """
    m = _URL_RE.match(canonical_url)
    if not m:
        return ""
    netloc = m.group(2)
    at = netloc.rfind("@")
    if at >= 0:
        netloc = netloc[at + 1 :]
    pm = re.search(r":([0-9]+)$", netloc)
    host, port = (netloc[: pm.start()], pm.group(1)) if pm else (netloc, "")
    stripped = re.sub(r"^www[0-9]*\.", "", host)
    if stripped:
        host = stripped
    key = ",".join(reversed(host.split(".")))
    if port:
        key += ":" + port
    rest = m.group(3)
    q = rest.find("?")
    if q >= 0:
        path, query = rest[:q], rest[q + 1 :]
        params = sorted(p for p in query.split("&") if p)
        rest = path + ("?" + "&".join(params) if params else "")
    return (key + ")" + rest).lower()


def surt_col(canonical_url: Column) -> Column:
    """Column-expression twin of :func:`surt_py` (whole-stage codegen —
    no Python per row when keying 10^10 index entries)."""
    netloc = F.regexp_extract(canonical_url, _URL_PATTERN, 2)
    hostport = F.regexp_replace(netloc, "^.*@", "")
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    host = F.regexp_replace(hostport, ":[0-9]+$", "")
    stripped = F.regexp_replace(host, "^www[0-9]*\\.", "")
    host2 = F.when(F.length(stripped) > 0, stripped).otherwise(host)
    revhost = F.array_join(F.reverse(F.split(host2, "\\.")), ",")
    rest = F.regexp_extract(canonical_url, _URL_PATTERN, 3)
    path = F.when(
        rest.contains("?"), F.substring_index(rest, "?", 1)
    ).otherwise(rest)
    # (?s): a canonical URL can carry internal newlines in its query
    query = F.regexp_extract(rest, "(?s)\\?(.*)", 1)
    params = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: F.length(p) > 0)
    )
    restq = F.when(
        F.size(params) > 0,
        F.concat(path, F.lit("?"), F.array_join(params, "&")),
    ).otherwise(path)
    key = F.lower(
        F.concat(
            revhost,
            F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
            F.lit(")"),
            restq,
        )
    )
    scheme = F.regexp_extract(canonical_url, _URL_PATTERN, 1)
    return F.when(scheme == "", F.lit("")).otherwise(key)


def url_features_col(url: Column) -> dict[str, Column]:
    """URL-level quality signals for crawl/corpus filtering (the
    RefinedWeb-style URL filter, Penedo et al. 2023 §3.1: score URLs
    before fetching or keeping their pages — deep paths, parameter soup
    and digit-heavy slugs correlate with spam/calendar/session pages).
    Expression-only (whole-stage codegen) and built from operations with
    exact ANSI-SQL twins (`split_part`, `regexp_replace`, one float
    division), so every signal is independently reproducible.

    Returns named columns: host, path_depth (count of '/' in the path),
    n_params (query parameters), digit_ratio (digits / url length),
    url_len.
    """
    pathq = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    path = F.split_part(pathq, F.lit("?"), F.lit(1))
    query = F.split_part(pathq, F.lit("?"), F.lit(2))
    return {
        "host": host_col(url),
        "path_depth": (
            F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
        ).cast("long"),
        "n_params": F.when(F.length(query) == 0, F.lit(0)).otherwise(
            F.length(query)
            - F.length(F.replace(query, F.lit("&"), F.lit("")))
            + 1
        ).cast("long"),
        "digit_ratio": (
            F.length(F.regexp_replace(url, r"[^0-9]", "")).cast("double")
            / F.greatest(F.length(url), F.lit(1)).cast("double")
        ),
        "url_len": F.length(url).cast("long"),
    }


def url_template_col(url: Column) -> Column:
    """Generalize a URL's path into its TEMPLATE: long hex runs (ids,
    uuids, content hashes; >= 8 hex chars) become ``{h}``, then any digit
    run becomes ``{n}`` — so ``/product/4711/rev/2`` and
    ``/product/9/rev/31`` collapse to ``/product/{n}/rev/{n}``.  The
    query string is reduced to its sorted parameter NAMES (values
    stripped), since names identify the handler and values identify the
    instance.  Template mining is the URL-space structure census behind
    de-dup rule learning (Koppula et al. WSDM'11 learn near-dup rules
    over exactly such URL pattern clusters) and crawl-trap triage: a
    host whose URL count is large but template count is tiny is a
    parameterized space, budgetable per TEMPLATE rather than per URL.

    Expression-only (two regexp_replace + split/sort, whole-stage
    codegen) with exact DuckDB twins.
    """
    pathq = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    path = F.split_part(pathq, F.lit("?"), F.lit(1))
    query = F.split_part(pathq, F.lit("?"), F.lit(2))
    tpath = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{h}"), r"[0-9]+", "{n}"
    )
    names = F.array_join(
        F.array_sort(
            F.filter(
                F.transform(
                    F.split(query, "&"),
                    lambda kv: F.split_part(kv, F.lit("="), F.lit(1)),
                ),
                lambda s: F.length(s) > 0,
            )
        ),
        ",",
    )
    return F.when(F.length(names) == 0, tpath).otherwise(
        F.concat(tpath, F.lit("?"), names)
    )


# PSL-lite: the common multi-part public suffixes. The full Public Suffix
# List is a runtime data file; a crawler that can't ship it still must not
# treat 'co.uk' as a registrable domain (IRLbot computes its STAR budgets
# per pay-level domain for exactly this reason — Lee et al., WWW 2009 §6).
# Curated from the PSL's highest-traffic entries; unknown suffixes fall
# back to the last two labels, which is the PSL's own default rule.
_MULTIPART_SUFFIXES = sorted(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
        "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
        "com.mx", "com.ar", "com.tr", "com.tw", "com.hk", "com.sg",
        "com.my", "com.ph", "com.pk", "com.eg", "com.sa", "com.ua",
        "co.kr", "or.kr", "co.za", "co.nz", "org.nz", "net.nz",
        "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
        "co.id", "or.id", "ac.id", "co.th", "or.th", "ac.th",
    }
)
_IPV4_RE_STR = r"^\d{1,3}(\.\d{1,3}){3}$"
_IPV4_RE = re.compile(_IPV4_RE_STR)


def registrable_domain_py(host: str) -> str:
    """Pay-level / registrable domain of a host: the unit crawl budgets,
    politeness escalation and spam control aggregate over (every
    subdomain of one registrant is one actor). Last two labels, or three
    when the last two are a known multi-part public suffix; IPv4
    literals and one-label hosts pass through. Python twin of
    :func:`registrable_domain_col` (byte-parity-tested)."""
    if not host or _IPV4_RE.match(host):
        return host
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _MULTIPART_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def registrable_domain_col(host: Column) -> Column:
    """Column-expression twin of :func:`registrable_domain_py`
    (whole-stage codegen; the suffix set folds into an array literal)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    multi = F.array(*[F.lit(s) for s in _MULTIPART_SUFFIXES])
    return (
        F.when(host.isNull() | (host == "") | host.rlike(_IPV4_RE_STR), host)
        .when(n <= 2, host)
        .when(F.array_contains(multi, last2), last3)
        .otherwise(last2)
    )
