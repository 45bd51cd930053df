"""WARC source + sink: Common-Crawl-compatible ``.warc.gz`` shards.

The web-data ecosystem's interchange format is WARC (ISO 28500): Common
Crawl publishes it, every major text-pipeline ingests it.  This module
makes the engine a first-class citizen of that ecosystem with stdlib
``gzip`` + Spark plumbing only:

- :func:`write_warc` — a distributed sink: each partition writes one
  ``.warc.gz`` shard (executor-side, the same file-per-task layout a
  Hadoop committer produces), every record in its OWN gzip member per the
  WARC-recommended layout (readers can seek to member offsets), preceded
  by a ``warcinfo`` record.  Deterministic output: record IDs are UUIDv5
  of (url, payload sha1), gzip headers pin ``mtime=0``, WARC-Date comes
  from the row's ``warc_ts`` column — byte-identical shards for identical
  partitions.  A driver-side ``manifest.json`` (path, records, bytes,
  sha256 per shard) is the commit marker, written only after the job
  completes — half-written shards from failed tasks are simply absent
  from it.
- :func:`read_warc` — a distributed source: parallelizes shard paths
  (the file is the split unit, as in Common Crawl processing) and parses
  records by exact ``Content-Length`` framing — payload bytes are never
  scanned for delimiters, so binary bodies round-trip byte-identically.
  Response records get their HTTP envelope stripped (status + mime
  surfaced as columns); malformed framing dead-letters the REMAINDER of
  that shard (resync inside a corrupt stream is guesswork) without
  failing the task.

Reference parity note: the reference scraper keeps pages only as JSON
rows in MySQL (``/root/reference/db/init.sql``); WARC interop is additive
capability for the 100 TB webtext use-case.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import json
import os
import uuid
from collections.abc import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

WARC_VERSION = b"WARC/1.0"
_SOFTWARE = "frontier-engine/0.3"

READ_SCHEMA = (
    "url string, warc_ts timestamp, html binary, record_id string, "
    "warc_type string, http_status int, mime string, lang string, shard string, "
    "payload_digest string, refers_to_uri string, concurrent_to string"
)

# the WARC 1.1 / IIPC revisit profile Common Crawl uses for recrawl dedup:
# a re-fetch whose entity body hashes identically to an earlier capture is
# archived as a tiny `revisit` record pointing at that capture
REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"

# Common Crawl's extension header for per-page language metadata (CC-MAIN
# WARCs carry it since 2018); the sink writes it when a lang column is given
# so the corpus' lang survives a WARC round trip
LANG_HEADER = "WARC-Identified-Content-Language"

MANIFEST_SCHEMA = "shard string, n_records long, n_bytes long, sha256 string"


def _record_id(url: str, payload: bytes) -> str:
    digest = hashlib.sha1(payload).hexdigest()
    return f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, f'{url}|{digest}')}>"


def payload_digest_b32(body: bytes) -> str:
    """``WARC-Payload-Digest`` value: sha1 of the entity BODY (not the
    HTTP envelope), base32 per the convention every Common Crawl record
    uses (``sha1:3I42H3S6...``)."""
    return "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode("ascii")


def _warc_date(ts) -> str:
    # WARC-Date is UTC ISO-8601 with trailing Z; warc_ts is tz-naive UTC in
    # this engine (session pins spark.sql.session.timeZone=UTC)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _sanitize_header_value(v: str) -> str:
    """Percent-encode CR/LF and other control characters in a header value.

    WARC header values are CRLF-framed; a crawled href can carry embedded
    ``\\r\\n`` all the way through html-unescape + canonicalization, and
    writing it verbatim into ``WARC-Target-URI`` would let an attacker page
    inject arbitrary header lines (or an early CRLFCRLF terminator) into its
    own record — forging archive metadata and desyncing readers, which
    dead-letters the remainder of the shard.  Percent-encoding keeps the
    value a valid URI (control octets are never legal in one anyway).
    """
    if not any(ord(c) < 0x20 or ord(c) == 0x7F for c in v):
        return v
    return "".join(
        f"%{ord(c):02X}" if (ord(c) < 0x20 or ord(c) == 0x7F) else c for c in v
    )


def build_record(
    record_type: str,
    payload: bytes,
    headers: dict[str, str],
) -> bytes:
    """One uncompressed WARC record: version line, named headers,
    Content-Length framing, payload, blank-line terminator.  Header values
    are control-character-sanitized (see :func:`_sanitize_header_value`)."""
    lines = [WARC_VERSION]
    lines.append(f"WARC-Type: {record_type}".encode())
    for k, v in headers.items():
        lines.append(f"{k}: {_sanitize_header_value(str(v))}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    head = b"\r\n".join(lines) + b"\r\n\r\n"
    return head + payload + b"\r\n\r\n"


def _http_request_head(url: str, user_agent: str) -> bytes:
    """The HTTP/1.1 request head a fetch of ``url`` would have sent —
    the payload of a ``request`` record (``msgtype=request``).  Built
    deterministically from the URL alone (the engine's fetch-join model
    has no live socket): GET, origin-form target, Host from the URL."""
    parts = urlsplit(url)
    target = parts.path or "/"
    if parts.query:
        target += "?" + parts.query
    # Host is hostname[:port], never the raw netloc: a URL with userinfo
    # ('https://user:secret@h/') must not leak credentials into the
    # archive (and 'user:secret@h' is not a valid HTTP/1.1 Host anyway).
    host = parts.hostname or ""
    if ":" in host:  # IPv6 literal — urlsplit strips the brackets
        host = f"[{host}]"
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None:
        host = f"{host}:{port}"
    return (
        f"GET {target} HTTP/1.1\r\n"
        f"Host: {host}\r\n"
        f"User-Agent: {user_agent}\r\n"
        f"Accept: */*\r\n\r\n"
    ).encode()


def _http_envelope(body: bytes, status: int, mime: str) -> bytes:
    head = (
        f"HTTP/1.1 {status} {'OK' if status == 200 else 'X'}\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def _gzip_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    # mtime pinned for determinism: identical records → identical bytes
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


def write_warc(
    df: DataFrame,
    out_dir: str,
    prefix: str = "crawl",
    status_col: str | None = None,
    mime: str = "text/html",
    lang_col: str | None = None,
    revisit_col: str | None = None,
    refers_url_col: str = "refers_url",
    refers_ts_col: str = "refers_ts",
    emit_requests: bool = False,
    user_agent: str = _SOFTWARE,
    capture_index: bool = False,
) -> list[dict]:
    """Distributed WARC sink (eager — runs the job, like ``.write.save``).

    ``df`` needs columns ``url`` (string), ``warc_ts`` (timestamp),
    ``html`` (binary).  One ``.warc.gz`` shard per partition, each record
    a standalone gzip member; a ``warcinfo`` record opens every shard.
    ``lang_col`` emits ``WARC-Identified-Content-Language`` per record (the
    Common Crawl convention), so :func:`read_warc` recovers a ``lang``
    column and a corpus survives the archive round trip losslessly.
    Every response record carries ``WARC-Payload-Digest`` (sha1-base32 of
    the entity body), as Common Crawl's do.

    ``revisit_col`` (boolean, e.g. from :func:`mark_revisits`) switches a
    row to the IIPC **identical-payload-digest revisit** record — the
    archive-side dedup every at-scale recrawl uses: the record stores only
    the HTTP response HEAD plus ``WARC-Refers-To-Target-URI`` /
    ``WARC-Refers-To-Date`` (from ``refers_url_col`` / ``refers_ts_col``)
    and the payload digest; the duplicate body bytes are never written
    twice.  :func:`resolve_revisits` re-hydrates them on read.

    ``emit_requests`` pairs every capture with a ``request`` record
    (written immediately before it, Common Crawl's request/response
    layout): the HTTP request head the fetch would have sent, linked to
    its capture by ``WARC-Concurrent-To`` — the linkage replay/analysis
    tools use to reunite the pair.  :func:`read_warc` surfaces the link
    as the ``concurrent_to`` column.

    Returns the shard manifest (also persisted as ``manifest.json`` — the
    commit marker: written after the job succeeds, so readers that trust
    the manifest never see partial output).
    """
    def row_to_record(row) -> list[bytes]:
        body = bytes(row.html) if row.html is not None else b""
        status = int(getattr(row, status_col)) if status_col else 200
        digest = payload_digest_b32(body)
        is_revisit = bool(revisit_col and getattr(row, revisit_col))
        envelope = _http_envelope(body, status, mime)
        payload = envelope if not is_revisit else envelope[: len(envelope) - len(body)]
        date = _warc_date(row.warc_ts)
        headers = {
            # date folded into the id: a recrawl capturing the identical
            # body at a later time is a distinct record (else the revisit
            # and its referent would collide on one id)
            "WARC-Record-ID": _record_id(f"{row.url}|{date}", envelope),
            "WARC-Date": date,
            "WARC-Target-URI": row.url,
            "WARC-Payload-Digest": digest,
            "Content-Type": "application/http;msgtype=response",
        }
        if is_revisit:
            headers["WARC-Profile"] = REVISIT_PROFILE
            refers_url = getattr(row, refers_url_col, None)
            refers_ts = getattr(row, refers_ts_col, None)
            if refers_url is not None and not pd.isna(refers_url):
                headers["WARC-Refers-To-Target-URI"] = str(refers_url)
            if refers_ts is not None and not pd.isna(refers_ts):
                headers["WARC-Refers-To-Date"] = _warc_date(refers_ts)
        lang = getattr(row, lang_col, None) if lang_col else None
        if lang is not None and not pd.isna(lang):
            headers[LANG_HEADER] = str(lang)
        capture = build_record(
            "revisit" if is_revisit else "response", payload, headers
        )
        if not emit_requests:
            return [capture]
        req_payload = _http_request_head(str(row.url), user_agent)
        request = build_record(
            "request",
            req_payload,
            {
                "WARC-Record-ID": _record_id(
                    f"{row.url}|{date}|request", req_payload
                ),
                "WARC-Date": date,
                "WARC-Target-URI": row.url,
                # links the request to ITS capture (a revisit of the same
                # body at another time has a different response id)
                "WARC-Concurrent-To": headers["WARC-Record-ID"],
                "Content-Type": "application/http;msgtype=request",
            },
        )
        return [request, capture]

    cols = ["url", "warc_ts", "html"]
    cols += [status_col] if status_col else []
    cols += [lang_col] if lang_col else []
    cols += [revisit_col, refers_url_col, refers_ts_col] if revisit_col else []
    return _write_shards(
        df.select(*cols), out_dir, prefix, row_to_record,
        capture_index=capture_index,
    )


def mark_revisits(df: DataFrame, prior: DataFrame | None = None) -> DataFrame:
    """Digest-keyed archive dedup plan for the WARC sink.

    Adds three columns to ``df`` (which needs ``url``, ``warc_ts``,
    ``html``): ``revisit`` (boolean), ``refers_url``, ``refers_ts``.  A
    row is a revisit when its entity body's sha1 was already captured —
    either in ``prior`` (an earlier archive: any frame with ``url``,
    ``warc_ts`` and EITHER a ``payload_digest`` column, e.g.
    :func:`read_warc` output, or an ``html`` column to digest) or earlier
    within this batch (first capture by ``(warc_ts, url)`` wins; later
    identical bodies refer back to it).  This is exactly Common Crawl's
    recrawl posture: at 10^10 URLs most re-fetches are unchanged, and the
    archive grows by a ~200-byte revisit record instead of the body.

    Scale shape: ONE shuffle on the digest (the window that picks the
    first capture — unavoidable: that IS the dedup), plus a digest-keyed
    join against ``prior`` reduced to its earliest capture per digest
    (aggregated before the join, so the join side is one row per distinct
    digest).  Rows with NULL bodies never dedup (digest is null).
    """
    d = df.withColumn("_digest", F.sha1(F.col("html")))
    w = Window.partitionBy("_digest").orderBy(
        F.col("warc_ts").asc(), F.col("url").asc()
    )
    d = (
        d.withColumn("_rn", F.row_number().over(w))
        .withColumn("_first", F.first(F.struct("warc_ts", "url")).over(w))
    )
    if prior is not None:
        if "payload_digest" in prior.columns:
            # read_warc surfaces base32; recompute hex? No — accept either
            # form: hex when digesting html, the archive's own value as-is
            p = prior.select(
                F.col("payload_digest").alias("_pd"), "url", "warc_ts"
            ).where(F.col("_pd").isNotNull())
            # normalize OUR probe to the same base32 form via html when
            # prior came from read_warc (sha1:B32...); join key must match
            probe = _sha1_b32_col(F.col("html"))
        else:
            p = prior.select(
                F.sha1(F.col("html")).alias("_pd"), "url", "warc_ts"
            ).where(F.col("_pd").isNotNull())
            probe = F.sha1(F.col("html"))
        pfirst = p.groupBy("_pd").agg(
            F.min(F.struct("warc_ts", "url")).alias("_pf")
        )
        d = d.withColumn("_probe", probe)
        d = d.join(pfirst, d["_probe"] == pfirst["_pd"], "left")
        in_prior = F.col("_pd").isNotNull()
        refers = F.when(in_prior, F.col("_pf")).otherwise(
            F.when(F.col("_rn") > 1, F.col("_first"))
        )
        revisit = F.col("_digest").isNotNull() & (in_prior | (F.col("_rn") > 1))
    else:
        refers = F.when(F.col("_rn") > 1, F.col("_first"))
        revisit = F.col("_digest").isNotNull() & (F.col("_rn") > 1)
    out = (
        d.withColumn("revisit", revisit)
        .withColumn("refers_url", refers["url"])
        .withColumn("refers_ts", refers["warc_ts"])
    )
    return out.drop("_digest", "_rn", "_first", "_probe", "_pd", "_pf")


def resolve_revisits(df: DataFrame, prior: DataFrame | None = None) -> DataFrame:
    """Re-hydrate identical-payload-digest ``revisit`` records.

    ``df`` is :func:`read_warc` output.  Revisit rows carry no body — only
    ``payload_digest`` plus the refers-to pointer; this joins each back to
    a ``response`` record holding the identical body: in ``df`` itself
    (same-archive revisits) or in ``prior`` (an earlier archive read, for
    cross-crawl revisits).  Digest equality IS the profile's contract
    (``identical-payload-digest``), so the join key is the digest rather
    than the (uri, date) pointer — exact, and independent of URI
    canonicalization drift between crawls.

    Scale shape: the body pool is reduced to ONE row per distinct digest
    BEFORE the join (bodies with equal sha1 are identical by construction;
    ``min_by (warc_ts, url)`` picks a deterministic representative), so
    the shuffle carries each distinct body once, never per-revisit.
    Revisits whose referent is out of scope keep a null body — surfaced,
    not failed, matching the module's dead-letter posture.
    """
    pool = df.select("url", "warc_ts", "html", "warc_type", "payload_digest")
    if prior is not None:
        pool = pool.unionByName(
            prior.select("url", "warc_ts", "html", "warc_type", "payload_digest")
        )
    pool = (
        pool.where(
            (F.col("warc_type") == "response")
            & F.col("html").isNotNull()
            & F.col("payload_digest").isNotNull()
        )
        .groupBy("payload_digest")
        .agg(F.min_by("html", F.struct("warc_ts", "url")).alias("_body"))
    )
    hydrated = F.when(
        (F.col("warc_type") == "revisit") & F.col("html").isNull(), F.col("_body")
    ).otherwise(F.col("html"))
    return (
        df.join(pool, "payload_digest", "left")
        .withColumn("html", hydrated)
        .select(*df.columns)
    )


def _sha1_b32_col(col):
    """``WARC-Payload-Digest``-shaped sha1 (``sha1:`` + base32) of a binary
    column — used only when the dedup probe must match an existing
    archive's base32 digests; hashlib's C sha1 per value inside the Arrow
    batch.  Built lazily so importing this module needs no SparkSession."""

    @F.pandas_udf("string")
    def u(body: pd.Series) -> pd.Series:
        return body.map(
            lambda b: None if b is None else payload_digest_b32(bytes(b))
        )

    return u(col)


def write_wet(
    df: DataFrame,
    out_dir: str,
    prefix: str = "wet",
    text_col: str = "text",
    lang_col: str | None = None,
    capture_index: bool = False,
) -> list[dict]:
    """Distributed WET sink (eager): the extracted-text twin of
    :func:`write_warc`, matching Common Crawl's WET convention —
    ``conversion`` records with a ``text/plain`` UTF-8 payload and no HTTP
    envelope, one ``.warc.gz`` shard per partition, each record its own
    gzip member behind a ``warcinfo`` record.

    ``df`` needs ``url`` (string), ``warc_ts`` (timestamp) and
    ``text_col`` (string). When the frame carries a ``record_id`` column
    (e.g. it came through :func:`read_warc`), each conversion record gets
    a ``WARC-Refers-To`` pointing back at its source response record —
    the WAT/WET linkage downstream tools expect. :func:`read_warc` reads
    WET shards back as rows with ``warc_type='conversion'`` and the text
    in ``html`` (raw payload bytes; decode as UTF-8).
    """
    has_ref = "record_id" in df.columns

    def row_to_record(row) -> bytes:
        text = row.wet_text if isinstance(row.wet_text, str) else ""
        payload = text.encode("utf-8")
        headers = {
            "WARC-Record-ID": _record_id(row.url, payload),
            "WARC-Date": _warc_date(row.warc_ts),
            "WARC-Target-URI": row.url,
            "Content-Type": "text/plain",
        }
        ref = getattr(row, "record_id", None) if has_ref else None
        if ref is not None and not pd.isna(ref):
            headers["WARC-Refers-To"] = str(ref)
        lang = getattr(row, lang_col, None) if lang_col else None
        if lang is not None and not pd.isna(lang):
            headers[LANG_HEADER] = str(lang)
        return build_record("conversion", payload, headers)

    cols = ["url", "warc_ts", F.col(text_col).alias("wet_text")]
    cols += ["record_id"] if has_ref else []
    cols += [lang_col] if lang_col else []
    return _write_shards(
        df.select(*cols), out_dir, prefix, row_to_record,
        capture_index=capture_index,
    )


def write_wat(
    df: DataFrame,
    out_dir: str,
    prefix: str = "wat",
    links_col: str = "links",
    canonical_col: str | None = None,
) -> list[dict]:
    """Distributed WAT sink (eager): page-metadata twin of
    :func:`write_warc` / :func:`write_wet`, completing the WARC/WAT/WET
    triple Common Crawl publishes per crawl. One ``metadata`` record per
    page with an ``application/json`` payload carrying the link graph and
    head metadata — the subset downstream graph/dedup tools read
    (``Envelope.Payload-Metadata.…HTML-Metadata.Links`` and
    ``Head.Link`` for rel=canonical), with deterministic key order and
    separators so identical rows yield identical bytes.

    ``df`` needs ``url`` (string), ``warc_ts`` (timestamp) and
    ``links_col`` (``array<string>`` of absolute out-links); optional
    ``canonical_col`` (nullable string, e.g. from
    :func:`frontier_engine.extract.canonical_udf`) and ``record_id``
    (adds ``WARC-Refers-To``)."""
    has_ref = "record_id" in df.columns

    def row_to_record(row) -> bytes:
        links = [] if row.wat_links is None else list(row.wat_links)
        html_meta: dict = {"Links": [{"url": str(l)} for l in links]}
        canon_v = getattr(row, "wat_canonical", None)
        if canon_v is not None and not pd.isna(canon_v):
            html_meta["Head"] = {
                "Link": [{"rel": "canonical", "url": str(canon_v)}]
            }
        doc = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": str(row.url),
                    "WARC-Date": _warc_date(row.warc_ts),
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {"HTML-Metadata": html_meta}
                },
            }
        }
        payload = json.dumps(doc, separators=(",", ":"), sort_keys=True).encode()
        headers = {
            "WARC-Record-ID": _record_id(row.url, payload),
            "WARC-Date": _warc_date(row.warc_ts),
            "WARC-Target-URI": row.url,
            "Content-Type": "application/json",
        }
        ref = getattr(row, "record_id", None) if has_ref else None
        if ref is not None and not pd.isna(ref):
            headers["WARC-Refers-To"] = str(ref)
        return build_record("metadata", payload, headers)

    cols = ["url", "warc_ts", F.col(links_col).alias("wat_links")]
    cols += [F.col(canonical_col).alias("wat_canonical")] if canonical_col else []
    cols += ["record_id"] if has_ref else []
    return _write_shards(df.select(*cols), out_dir, prefix, row_to_record)


# record types a CDX(J) index points at: replayable captures.  request /
# warcinfo records are written but not indexed, matching wayback practice
_INDEXED_TYPES = ("response", "revisit", "conversion", "metadata")


def _capture_entry(rec: bytes, shard: str, offset: int) -> dict | None:
    """Parse ONE just-built record's head into a capture-index row (the
    writer knows the compressed member offset/length — exactly what a
    CDX index needs and what is unrecoverable without re-scanning)."""
    head_end = rec.find(b"\r\n\r\n")
    headers: dict[str, str] = {}
    for line in rec[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    rtype = headers.get("warc-type", "")
    if rtype not in _INDEXED_TYPES:
        return None
    payload = rec[head_end + 4 :]
    status = None
    mime_val = None
    if payload[:5] == b"HTTP/":
        env_end = payload.find(b"\r\n\r\n")
        if env_end >= 0:
            env_lines = payload[:env_end].split(b"\r\n")
            try:
                status = int(env_lines[0].split(b" ")[1])
            except (IndexError, ValueError):
                status = None
            for line in env_lines[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-type":
                    mime_val = v.strip().decode("latin-1")
    elif rtype == "conversion":
        mime_val = headers.get("content-type")
    return {
        "url": headers.get("warc-target-uri"),
        "ts": headers.get("warc-date"),
        "record_id": headers.get("warc-record-id"),
        "warc_type": rtype,
        "payload_digest": headers.get("warc-payload-digest"),
        "http_status": status,
        "mime": mime_val,
        "filename": os.path.basename(shard),
        "offset": offset,
    }


CAPTURES_SCHEMA = (
    "url string, ts string, record_id string, warc_type string, "
    "payload_digest string, http_status int, mime string, "
    "filename string, offset long, length long"
)


def _write_shards(
    src: DataFrame,
    out_dir: str,
    prefix: str,
    row_to_record,
    capture_index: bool = False,
) -> list[dict]:
    """Shared executor-side shard writer behind :func:`write_warc` /
    :func:`write_wet`: one ``.warc.gz`` per partition opened by a
    ``warcinfo`` record, deterministic bytes, driver-side
    ``manifest.json`` as the commit marker.  ``row_to_record`` may return
    one record or a list (request/response pairs).

    ``capture_index`` additionally writes ``<out_dir>/_captures/`` — one
    parquet file per shard holding (url, ts, record id, type, digest,
    status, mime, filename, compressed member offset+length) for every
    replayable record.  Offsets are knowable only at write time (each
    record is its own gzip member); this sidecar is what
    :func:`frontier_engine.cdx.write_cdxj` turns into a pywb-indexable
    CDXJ without ever re-reading the archive."""
    os.makedirs(out_dir, exist_ok=True)
    if capture_index:
        os.makedirs(os.path.join(out_dir, "_captures"), exist_ok=True)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard = os.path.join(out_dir, f"{prefix}-{pid:05d}.warc.gz")
        n = 0
        off = 0
        entries: list[dict] = []
        sha = hashlib.sha256()
        with open(shard, "wb") as f:
            info_payload = (
                f"software: {_SOFTWARE}\r\nformat: WARC File Format 1.0\r\n"
            ).encode()
            info = build_record(
                "warcinfo",
                info_payload,
                {
                    "WARC-Record-ID": _record_id(f"warcinfo:{prefix}-{pid}", info_payload),
                    "WARC-Date": "1970-01-01T00:00:00Z",
                    "WARC-Filename": os.path.basename(shard),
                    "Content-Type": "application/warc-fields",
                },
            )
            member = _gzip_member(info)
            f.write(member)
            sha.update(member)
            off += len(member)
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    recs = row_to_record(row)
                    if isinstance(recs, bytes):
                        recs = [recs]
                    for rec in recs:
                        member = _gzip_member(rec)
                        f.write(member)
                        sha.update(member)
                        if capture_index:
                            e = _capture_entry(rec, shard, off)
                            if e is not None:
                                e["length"] = len(member)
                                entries.append(e)
                        off += len(member)
                        n += 1
        if capture_index:
            import pyarrow as pa
            import pyarrow.parquet as pq

            cap_path = os.path.join(
                out_dir, "_captures", f"{prefix}-{pid:05d}.parquet"
            )
            cols = [
                "url", "ts", "record_id", "warc_type", "payload_digest",
                "http_status", "mime", "filename", "offset", "length",
            ]
            table = pa.table(
                {c: [e[c] for e in entries] for c in cols},
                schema=pa.schema(
                    [
                        pa.field("url", pa.string()),
                        pa.field("ts", pa.string()),
                        pa.field("record_id", pa.string()),
                        pa.field("warc_type", pa.string()),
                        pa.field("payload_digest", pa.string()),
                        pa.field("http_status", pa.int32()),
                        pa.field("mime", pa.string()),
                        pa.field("filename", pa.string()),
                        pa.field("offset", pa.int64()),
                        pa.field("length", pa.int64()),
                    ]
                ),
            )
            pq.write_table(table, cap_path)
        yield pd.DataFrame(
            {
                "shard": [shard],
                "n_records": [n],
                "n_bytes": [os.path.getsize(shard)],
                "sha256": [sha.hexdigest()],
            }
        )

    manifest = [r.asDict() for r in src.mapInPandas(write_partition, MANIFEST_SCHEMA).collect()]
    manifest.sort(key=lambda m: m["shard"])
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"format": "warc.gz", "shards": manifest}, f, indent=1)
    return manifest


def _parse_warc_stream(raw: bytes, shard: str):
    """Yield dict rows from one uncompressed WARC stream.  Exact
    Content-Length framing; a framing violation stops THIS shard's parse
    (remainder dead-lettered) instead of failing the task."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate trailing blank lines between records
        while pos < n and raw[pos : pos + 2] in (b"\r\n",):
            pos += 2
        if pos >= n:
            return
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0 or not raw.startswith(b"WARC/", pos):
            return  # framing lost — dead-letter the remainder
        headers: dict[str, str] = {}
        for line in raw[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated record
        payload = raw[body_start : body_start + length]
        pos = body_start + length
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        status = None
        mime_val = None
        html = payload
        if rtype == "response" and payload[:5] == b"HTTP/":
            env_end = payload.find(b"\r\n\r\n")
            if env_end >= 0:
                env_lines = payload[:env_end].split(b"\r\n")
                try:
                    status = int(env_lines[0].split(b" ")[1])
                except (IndexError, ValueError):
                    status = None
                for line in env_lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        mime_val = v.strip().decode("latin-1")
                html = payload[env_end + 4 :]
        # tolerate malformed dates in foreign (e.g. Common Crawl) shards:
        # a bad WARC-Date nulls the column instead of failing the task
        warc_ts = None
        if ts:
            try:
                warc_ts = pd.Timestamp(ts.rstrip("Z"))
            except (ValueError, TypeError):
                warc_ts = None
        if rtype == "revisit":
            # the block is the HTTP head only — there IS no body here; the
            # referred capture (resolve_revisits) holds the bytes
            if html[:5] == b"HTTP/":
                env_end = html.find(b"\r\n\r\n")
                if env_end >= 0:
                    env_lines = html[:env_end].split(b"\r\n")
                    try:
                        status = int(env_lines[0].split(b" ")[1])
                    except (IndexError, ValueError):
                        status = None
                    for line in env_lines[1:]:
                        k, _, v = line.partition(b":")
                        if k.strip().lower() == b"content-type":
                            mime_val = v.strip().decode("latin-1")
            html = None
        yield {
            "url": url,
            "warc_ts": warc_ts,
            "html": html,
            "record_id": headers.get("warc-record-id"),
            "warc_type": rtype,
            "http_status": status,
            "mime": mime_val,
            "lang": headers.get(LANG_HEADER.lower()),
            "shard": shard,
            "payload_digest": headers.get("warc-payload-digest"),
            "refers_to_uri": headers.get("warc-refers-to-target-uri"),
            "concurrent_to": headers.get("warc-concurrent-to"),
        }


def read_warc(
    spark: SparkSession,
    path: str,
    include_warcinfo: bool = False,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed WARC source: ``path`` is a directory (all ``*.warc.gz``
    inside, manifest-ordered when ``manifest.json`` exists) or one file.
    The shard is the split unit — standard for Common Crawl processing.
    """
    if os.path.isdir(path):
        mf = os.path.join(path, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                shards = [s["shard"] for s in json.load(f)["shards"]]
        else:
            shards = sorted(
                os.path.join(path, p) for p in os.listdir(path) if p.endswith(".warc.gz")
            )
    else:
        shards = [path]
    if not shards:
        raise ValueError(f"no .warc.gz shards under {path}")
    paths_df = spark.createDataFrame([(s,) for s in shards], "shard string")
    if n_partitions:
        paths_df = paths_df.repartition(n_partitions)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard in pdf["shard"]:
                try:
                    with gzip.open(shard, "rb") as gz:  # reads all members
                        raw = gz.read()
                except (OSError, EOFError):
                    continue  # unreadable shard → dead-lettered whole
                rows.extend(_parse_warc_stream(raw, shard))
            if rows:
                out = pd.DataFrame(rows)
                if not include_warcinfo:
                    out = out[out["warc_type"] != "warcinfo"]
                if len(out):
                    yield out

    return paths_df.mapInPandas(parse, READ_SCHEMA)
