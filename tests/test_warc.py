"""WARC sink/source round trips: Common-Crawl-compatible .warc.gz shards
written per-partition, one gzip member per record, read back by exact
Content-Length framing — byte-identical bodies, deterministic output.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from frontier_engine import warc


@pytest.fixture()
def pages(spark):
    from datetime import datetime

    rows = [
        ("https://a.example/x", datetime(2026, 1, 2, 3, 4, 5), b"<html>alpha</html>"),
        ("https://a.example/y", datetime(2026, 1, 2, 3, 4, 6), b"\x00\xff binary body \r\n\r\n tricky"),
        ("https://b.example/z", datetime(2026, 1, 3), b""),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")


def test_round_trip_byte_identical(spark, pages, tmp_path):
    out = str(tmp_path / "warc")
    manifest = warc.write_warc(pages.repartition(2), out)
    assert sum(m["n_records"] for m in manifest) == 3
    assert os.path.exists(os.path.join(out, "manifest.json"))

    back = warc.read_warc(spark, out).collect()
    got = {r["url"]: r for r in back}
    src = {r["url"]: r for r in pages.collect()}
    assert set(got) == set(src)
    for url, r in got.items():
        # bodies byte-identical even when they contain \r\n\r\n (framing is
        # Content-Length, never delimiter scanning)
        assert bytes(r["html"]) == bytes(src[url]["html"])
        assert r["warc_ts"] == src[url]["warc_ts"]
        assert r["http_status"] == 200
        assert r["mime"] == "text/html"
        assert r["warc_type"] == "response"
        assert r["record_id"].startswith("<urn:uuid:")


def test_each_record_own_gzip_member(pages, tmp_path):
    out = str(tmp_path / "warc")
    manifest = warc.write_warc(pages.coalesce(1), out)
    shard = manifest[0]["shard"]
    raw = open(shard, "rb").read()
    # gzip magic at byte 0 and one magic per member: warcinfo + 3 records
    assert raw[:2] == b"\x1f\x8b"
    assert raw.count(b"\x1f\x8b\x08") == 4
    # stdlib reads concatenated members transparently
    stream = gzip.decompress(raw)
    assert stream.count(b"WARC/1.0\r\n") == 4


def test_deterministic_output(spark, pages, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sha_a = {os.path.basename(m["shard"]): m["sha256"] for m in warc.write_warc(pages.coalesce(1), a)}
    sha_b = {os.path.basename(m["shard"]): m["sha256"] for m in warc.write_warc(pages.coalesce(1), b)}
    assert sha_a == sha_b  # identical partitions → byte-identical shards


def test_warcinfo_excluded_by_default(spark, pages, tmp_path):
    out = str(tmp_path / "warc")
    warc.write_warc(pages.coalesce(1), out)
    assert warc.read_warc(spark, out).count() == 3
    with_info = warc.read_warc(spark, out, include_warcinfo=True)
    assert with_info.count() == 4
    assert with_info.filter(F.col("warc_type") == "warcinfo").count() == 1


def test_truncated_shard_dead_letters_remainder(spark, pages, tmp_path):
    out = str(tmp_path / "warc")
    manifest = warc.write_warc(pages.coalesce(1), out)
    shard = manifest[0]["shard"]
    # re-gzip a truncated stream: first two records survive, the rest is cut
    stream = gzip.decompress(open(shard, "rb").read())
    third = stream.find(b"WARC/1.0", stream.find(b"WARC/1.0", 10) + 10)
    cut = stream[: third + 40]  # into the 3rd record's headers
    open(shard, "wb").write(gzip.compress(cut, mtime=0))
    back = warc.read_warc(spark, out).collect()
    assert len(back) == 1  # warcinfo skipped + first response survives
    # a wholly unreadable shard is dead-lettered, not a task failure
    open(shard, "wb").write(b"not gzip at all")
    assert warc.read_warc(spark, out).count() == 0


def test_fixture_corpus_round_trip(spark, tmp_path):
    """The engine's own crawl corpus (pages table) through the sink and
    back: counts + per-url body hashes match."""
    from frontier_engine import fixtures

    paths = fixtures.corpus("mini")
    pages = spark.read.parquet(paths["pages"]).select("url", "warc_ts", "html").limit(500)
    out = str(tmp_path / "warc")
    manifest = warc.write_warc(pages.repartition(4), out)
    assert sum(m["n_records"] for m in manifest) == 500
    back = warc.read_warc(spark, out, n_partitions=4)
    src_hash = pages.select("url", F.sha2(F.col("html"), 256).alias("h"))
    back_hash = back.select("url", F.sha2(F.col("html"), 256).alias("h"))
    assert src_hash.subtract(back_hash).count() == 0
    assert back_hash.subtract(src_hash).count() == 0


def test_manifest_is_commit_marker(spark, pages, tmp_path):
    out = str(tmp_path / "warc")
    warc.write_warc(pages.repartition(2), out)
    with open(os.path.join(out, "manifest.json")) as f:
        mf = json.load(f)
    assert mf["format"] == "warc.gz"
    # a stray uncommitted shard is ignored when the manifest exists
    stray = os.path.join(out, "stray-99999.warc.gz")
    open(stray, "wb").write(gzip.compress(b"garbage", mtime=0))
    assert warc.read_warc(spark, out).count() == 3


def test_header_injection_crlf_url_is_neutralized(spark, tmp_path):
    """A crawled URL with embedded CRLF (survives html-unescape + canon)
    must not inject header lines or an early record terminator: the value
    is percent-encoded at write time and the shard parses fully."""
    from datetime import datetime

    evil = "https://a.example/x\r\nWARC-Evil: injected\r\n\r\nHTTP/1.1 200 OK"
    rows = [
        (evil, datetime(2026, 1, 2), b"<html>evil</html>"),
        ("https://a.example/clean", datetime(2026, 1, 2), b"<html>ok</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "warc")
    warc.write_warc(df.coalesce(1), out)

    back = warc.read_warc(spark, out).collect()
    # BOTH records survive (no desync dead-lettering the shard remainder)
    assert len(back) == 2
    by_url = {r["url"]: r for r in back}
    assert "https://a.example/clean" in by_url
    enc = "https://a.example/x%0D%0AWARC-Evil: injected%0D%0A%0D%0AHTTP/1.1 200 OK"
    assert enc in by_url
    # the injected header name never appears as a parsed header
    assert all(r["warc_type"] == "response" for r in back)


def test_malformed_warc_date_nulls_timestamp_not_task(spark, tmp_path):
    """A foreign shard with a garbage WARC-Date parses with warc_ts=None and
    the following records still come through."""
    rec_bad = warc.build_record(
        "response",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: 2\r\n\r\nhi",
        {
            "WARC-Record-ID": "<urn:uuid:x>",
            "WARC-Date": "not-a-date-at-all",
            "WARC-Target-URI": "https://bad.example/",
            "Content-Type": "application/http;msgtype=response",
        },
    )
    rec_good = warc.build_record(
        "response",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: 2\r\n\r\nok",
        {
            "WARC-Record-ID": "<urn:uuid:y>",
            "WARC-Date": "2026-01-02T03:04:05Z",
            "WARC-Target-URI": "https://good.example/",
            "Content-Type": "application/http;msgtype=response",
        },
    )
    shard_dir = tmp_path / "foreign"
    shard_dir.mkdir()
    with open(shard_dir / "cc-00000.warc.gz", "wb") as f:
        f.write(gzip.compress(rec_bad + rec_good, mtime=0))
    back = {r["url"]: r for r in warc.read_warc(spark, str(shard_dir)).collect()}
    assert set(back) == {"https://bad.example/", "https://good.example/"}
    assert back["https://bad.example/"]["warc_ts"] is None
    assert back["https://good.example/"]["warc_ts"] is not None


def test_wet_round_trip(spark, pages, tmp_path):
    from pyspark.sql import functions as F

    # WARC -> read -> extract text -> WET -> read: the Common Crawl
    # WARC/WET pipeline shape, with WARC-Refers-To linkage preserved
    warc_dir = str(tmp_path / "warc")
    warc.write_warc(pages.repartition(2), warc_dir, lang_col=None)
    back = warc.read_warc(spark, warc_dir)
    texts = back.withColumn(
        "text", F.concat(F.lit("text of "), F.col("url"))
    ).withColumn("lang", F.lit("en"))

    wet_dir = str(tmp_path / "wet")
    manifest = warc.write_wet(texts, wet_dir, lang_col="lang")
    assert sum(m["n_records"] for m in manifest) == 3

    got = {r["url"]: r for r in warc.read_warc(spark, wet_dir).collect()}
    src_ids = {r["url"]: r["record_id"] for r in back.collect()}
    assert set(got) == set(src_ids)
    shard_bytes = b"".join(
        gzip.decompress(open(m["shard"], "rb").read()) for m in manifest
    )
    for url, r in got.items():
        assert r["warc_type"] == "conversion"
        assert r["mime"] is None  # no HTTP envelope on conversion records
        assert bytes(r["html"]).decode("utf-8") == f"text of {url}"
        assert r["lang"] == "en"
        # WARC-Refers-To points at the source response record
        assert f"WARC-Refers-To: {src_ids[url]}".encode() in shard_bytes


def test_wet_without_record_id(spark, pages, tmp_path):
    from pyspark.sql import functions as F

    texts = pages.withColumn("text", F.lit("plain"))
    wet_dir = str(tmp_path / "wet2")
    manifest = warc.write_wet(texts, wet_dir)
    assert sum(m["n_records"] for m in manifest) == 3
    raw = b"".join(gzip.decompress(open(m["shard"], "rb").read()) for m in manifest)
    assert b"WARC-Refers-To" not in raw
    rows = warc.read_warc(spark, wet_dir).collect()
    assert all(bytes(r["html"]) == b"plain" for r in rows)


def test_wat_round_trip(spark, pages, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    meta = pages.withColumn(
        "links",
        F.array(F.concat(F.col("url"), F.lit("/child1")),
                F.concat(F.col("url"), F.lit("/child2"))),
    ).withColumn("canonical", F.concat(F.lit("http://canon/"), F.col("url")))
    wat_dir = str(tmp_path / "wat")
    manifest = warc.write_wat(meta, wat_dir, canonical_col="canonical")
    assert sum(m["n_records"] for m in manifest) == 3

    got = {r["url"]: r for r in warc.read_warc(spark, wat_dir).collect()}
    assert set(got) == {r["url"] for r in pages.collect()}
    for url, r in got.items():
        assert r["warc_type"] == "metadata"
        doc = _json.loads(bytes(r["html"]))
        env = doc["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == url
        hm = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
        assert [l["url"] for l in hm["Links"]] == [url + "/child1", url + "/child2"]
        assert hm["Head"]["Link"][0] == {"rel": "canonical", "url": "http://canon/" + url}
    # determinism: rewriting the same rows yields identical shard hashes
    wat2 = str(tmp_path / "wat2")
    m2 = warc.write_wat(meta, wat2, canonical_col="canonical")
    assert [m["sha256"] for m in m2] == [m["sha256"] for m in manifest]


def test_wat_null_links_and_canonical(spark, pages, tmp_path):
    from pyspark.sql import functions as F

    meta = pages.withColumn("links", F.lit(None).cast("array<string>")) \
                .withColumn("canonical", F.lit(None).cast("string"))
    wat_dir = str(tmp_path / "wat3")
    warc.write_wat(meta, wat_dir, canonical_col="canonical")
    import json as _json
    for r in warc.read_warc(spark, wat_dir).collect():
        doc = _json.loads(bytes(r["html"]))
        hm = doc["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
        assert hm["Links"] == [] and "Head" not in hm
