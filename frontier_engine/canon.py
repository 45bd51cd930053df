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
  * strip surrounding whitespace
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


def canonicalize_py(url: str) -> str:
    u = url.strip()
    h = u.find("#")
    if h >= 0:
        u = u[:h]
    m = _URL_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    netloc = m.group(2).lower()
    rest = m.group(3)
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
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
    """Column-expression twin of :func:`canonicalize_py` (whole-stage codegen)."""
    u = F.trim(url)
    u = F.when(u.contains("#"), F.substring_index(u, "#", 1)).otherwise(u)
    scheme = F.lower(F.regexp_extract(u, _URL_PATTERN, 1))
    netloc = F.lower(F.regexp_extract(u, _URL_PATTERN, 2))
    rest = F.regexp_extract(u, _URL_PATTERN, 3)
    netloc = (
        F.when(
            (scheme == "http") & netloc.endswith(":80"),
            F.substring(netloc, 1, F.length(netloc) - 3),
        )
        .when(
            (scheme == "https") & netloc.endswith(":443"),
            F.substring(netloc, 1, F.length(netloc) - 4),
        )
        .otherwise(netloc)
    )
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    canonical = F.concat(scheme, F.lit("://"), netloc, rest)
    return F.when(scheme == "", u).otherwise(canonical)


def host_col(canonical_url: Column) -> Column:
    """Host of an already-canonical URL (netloc minus userinfo/port)."""
    netloc = F.regexp_extract(canonical_url, _URL_PATTERN, 2)
    netloc = F.substring_index(netloc, "@", -1)
    after = F.substring_index(netloc, ":", -1)
    has_port = netloc.contains(":") & after.rlike("^[0-9]+$")
    stripped = F.substring(netloc, 1, F.length(netloc) - F.length(after) - 1)
    return F.when(has_port, stripped).otherwise(netloc)


def path_col(canonical_url: Column) -> Column:
    rest = F.regexp_extract(canonical_url, _URL_PATTERN, 3)
    return F.when(rest.contains("?"), F.substring_index(rest, "?", 1)).otherwise(rest)


def url_hash_col(canonical_url: Column) -> Column:
    """64-bit identity of a canonical URL — Spark built-in xxhash64 (seed 42).

    Stays JVM-side; the Bloom/bitmap layer derives its k probe positions from
    this value with a splitmix64 finalizer (see seen.py), so no Python-side
    hash of the URL string is ever needed.
    """
    return F.xxhash64(canonical_url)
