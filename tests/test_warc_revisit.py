"""WARC revisit records — the IIPC identical-payload-digest profile
Common Crawl uses for recrawl dedup (WARC 1.1 §6.7.2): a re-fetch whose
body sha1 was already captured is archived as a tiny ``revisit`` record
pointing at the earlier capture, and the duplicate bytes are never
written twice.  Covers: the ``mark_revisits`` dedup plan (in-batch and
against a prior archive), the sink's revisit record shape, and
``resolve_revisits`` re-hydration — round-trip byte-identical.

Generalizes the reference's upsert-on-refetch posture
(/root/reference/db/__init__.py:63 ``update_one(upsert=True)``) to the
archival layer.
"""

from __future__ import annotations

import gzip
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from frontier_engine import warc

BODY_A = b"<html>alpha page body</html>"
BODY_B = b"<html>beta \x00\xff binary \r\n\r\n body</html>"
BODY_C = b"<html>gamma</html>"


@pytest.fixture()
def batch(spark):
    # u1/u3 share BODY_A (u1 earlier -> first capture); u2 unique; u4 null
    rows = [
        ("https://a.example/u1", datetime(2026, 1, 1, 0, 0, 1), BODY_A),
        ("https://a.example/u2", datetime(2026, 1, 1, 0, 0, 2), BODY_B),
        ("https://b.example/u3", datetime(2026, 1, 1, 0, 0, 3), BODY_A),
        ("https://b.example/u4", datetime(2026, 1, 1, 0, 0, 4), None),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")


def test_mark_revisits_in_batch(batch):
    got = {r["url"]: r for r in warc.mark_revisits(batch).collect()}
    assert got["https://a.example/u1"]["revisit"] is False
    assert got["https://a.example/u2"]["revisit"] is False
    r3 = got["https://b.example/u3"]
    assert r3["revisit"] is True
    assert r3["refers_url"] == "https://a.example/u1"
    assert r3["refers_ts"] == datetime(2026, 1, 1, 0, 0, 1)
    # null bodies never dedup
    assert got["https://b.example/u4"]["revisit"] is False


def test_mark_revisits_against_prior_archive(spark, batch, tmp_path):
    # prior crawl captured BODY_B; write it as a real archive and probe
    # against read_warc output (base32 digest path)
    prior_src = spark.createDataFrame(
        [("https://old.example/p", datetime(2025, 12, 1), BODY_B)],
        "url string, warc_ts timestamp, html binary",
    )
    pdir = str(tmp_path / "prior")
    warc.write_warc(prior_src.coalesce(1), pdir)
    prior = warc.read_warc(spark, pdir)

    got = {r["url"]: r for r in warc.mark_revisits(batch, prior=prior).collect()}
    r2 = got["https://a.example/u2"]
    assert r2["revisit"] is True  # body already in the prior archive
    assert r2["refers_url"] == "https://old.example/p"
    assert r2["refers_ts"] == datetime(2025, 12, 1)
    # in-batch dedup still applies alongside the prior probe
    assert got["https://b.example/u3"]["revisit"] is True
    assert got["https://b.example/u3"]["refers_url"] == "https://a.example/u1"
    assert got["https://a.example/u1"]["revisit"] is False


def test_revisit_round_trip_byte_identical(spark, batch, tmp_path):
    out = str(tmp_path / "arc")
    marked = warc.mark_revisits(batch)
    warc.write_warc(marked.coalesce(1), out, revisit_col="revisit")

    back = warc.read_warc(spark, out)
    rows = {r["url"]: r for r in back.collect()}
    r3 = rows["https://b.example/u3"]
    assert r3["warc_type"] == "revisit"
    assert r3["html"] is None  # body bytes not duplicated in the archive
    assert r3["payload_digest"] == warc.payload_digest_b32(BODY_A)
    assert r3["refers_to_uri"] == "https://a.example/u1"
    assert rows["https://a.example/u1"]["warc_type"] == "response"
    # revisit and referent are distinct records
    assert r3["record_id"] != rows["https://a.example/u1"]["record_id"]

    hydrated = {r["url"]: r for r in warc.resolve_revisits(back).collect()}
    assert bytes(hydrated["https://b.example/u3"]["html"]) == BODY_A
    assert bytes(hydrated["https://a.example/u1"]["html"]) == BODY_A
    assert bytes(hydrated["https://a.example/u2"]["html"]) == BODY_B
    # provenance survives hydration
    assert hydrated["https://b.example/u3"]["warc_type"] == "revisit"


def test_cross_archive_resolve_via_prior(spark, tmp_path):
    prior_src = spark.createDataFrame(
        [("https://old.example/p", datetime(2025, 12, 1), BODY_C)],
        "url string, warc_ts timestamp, html binary",
    )
    pdir = str(tmp_path / "prior")
    warc.write_warc(prior_src.coalesce(1), pdir)
    prior = warc.read_warc(spark, pdir)

    recrawl = spark.createDataFrame(
        [("https://new.example/n", datetime(2026, 2, 2), BODY_C)],
        "url string, warc_ts timestamp, html binary",
    )
    ndir = str(tmp_path / "new")
    marked = warc.mark_revisits(recrawl, prior=prior)
    warc.write_warc(marked.coalesce(1), ndir, revisit_col="revisit")

    back = warc.read_warc(spark, ndir)
    # without the prior in scope the referent is missing -> null, surfaced
    alone = warc.resolve_revisits(back).collect()[0]
    assert alone["warc_type"] == "revisit" and alone["html"] is None
    # with the prior supplied the body re-hydrates byte-identically
    joined = warc.resolve_revisits(back, prior=prior).collect()[0]
    assert bytes(joined["html"]) == BODY_C


def test_revisit_archive_is_smaller(spark, tmp_path):
    import hashlib

    # incompressible body, so the saving is the dedup, not the gzip
    big = b"".join(hashlib.sha256(str(i).encode()).digest() for i in range(1600))
    rows = [
        (f"https://h.example/{i}", datetime(2026, 1, 1, 0, 0, i), big)
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    full_dir, dedup_dir = str(tmp_path / "full"), str(tmp_path / "dedup")
    m_full = warc.write_warc(df.coalesce(1), full_dir)
    m_dedup = warc.write_warc(
        warc.mark_revisits(df).coalesce(1), dedup_dir, revisit_col="revisit"
    )
    assert sum(m["n_records"] for m in m_dedup) == sum(m["n_records"] for m in m_full)
    # 7 of 8 bodies replaced by ~200-byte revisit records
    assert m_dedup[0]["n_bytes"] < m_full[0]["n_bytes"] / 4


def test_response_records_carry_payload_digest(spark, batch, tmp_path):
    out = str(tmp_path / "plain")
    warc.write_warc(batch.coalesce(1), out)
    for r in warc.read_warc(spark, out).collect():
        body = bytes(r["html"]) if r["html"] is not None else b""
        assert r["payload_digest"] == warc.payload_digest_b32(body)
