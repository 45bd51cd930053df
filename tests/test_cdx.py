"""CDX index: build → manifest → pruned prefix lookup round-trips."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from frontier_engine import cdx
from frontier_engine.canon import surt_py


@pytest.fixture(scope="module")
def spark():
    from frontier_engine.session import get_spark

    s = get_spark("test-cdx", cores=4)
    yield s


def _pages(spark, n_hosts=20, per_host=30):
    rows = []
    for h in range(n_hosts):
        for p in range(per_host):
            rows.append(
                (
                    f"https://www.h{h:02d}.example/p{p}?b={p % 3}&a={h}",
                    f"2024-01-{(p % 28) + 1:02d}T00:00:00",
                )
            )
    df = spark.createDataFrame(rows, "url string, ts string")
    return df.select("url", F.col("ts").cast("timestamp").alias("warc_ts"))


def test_build_and_prefix_lookup(spark, tmp_path):
    out = str(tmp_path / "cdx")
    pages = _pages(spark)
    manifest = cdx.build_cdx(pages, out, n_shards=8)
    assert sum(m["n"] for m in manifest) == 600
    # manifest ranges are contiguous and ordered
    hosts = [(m["lo"], m["hi"]) for m in manifest]
    assert hosts == sorted(hosts)
    for (_, hi), (lo, _) in zip(hosts, hosts[1:]):
        assert hi <= lo

    # domain prefix lookup == brute force, and prunes shards
    prefix = surt_py("https://h07.example/")[: len("example,h07)")]
    assert prefix == "example,h07)"
    got = cdx.lookup_cdx(spark, out, prefix)
    assert got.count() == 30
    assert set(r["url"][8:19] for r in got.collect()) == {"www.h07.exa"}
    # pruning: the manifest admits fewer shards than exist
    shards = cdx._shards_for_prefix(manifest, prefix)
    assert 1 <= len(shards) < 8
    # the partition filter reaches the scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # path-prefix lookup inside a host
    p2 = "example,h03)/p1"
    want = {
        r["surt"]
        for r in cdx.cdx_entries(pages).filter(
            F.col("surt").startswith(p2)
        ).collect()
    }
    got2 = {r["surt"] for r in cdx.lookup_cdx(spark, out, p2).collect()}
    assert got2 == want and len(got2) > 0

    # empty result without touching data
    assert cdx.lookup_cdx(spark, out, "zz,nope)").count() == 0

    # full scan
    assert cdx.lookup_cdx(spark, out, "").count() == 600


def test_shard_files_internally_sorted(spark, tmp_path):
    out = str(tmp_path / "cdx2")
    cdx.build_cdx(_pages(spark, n_hosts=6, per_host=10), out, n_shards=4)
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    assert files
    for fp in files:
        col = pq.read_table(fp, columns=["surt", "ts"]).to_pandas()
        keys = list(zip(col["surt"], col["ts"]))
        assert keys == sorted(keys), fp


def test_manifest_deterministic_across_parallelism(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    pages = _pages(spark, n_hosts=9, per_host=7)
    ma = cdx.build_cdx(pages, a, n_shards=4)
    mb = cdx.build_cdx(pages.repartition(13), b, n_shards=4)
    assert ma == mb


def test_entries_drop_garbage(spark):
    df = spark.createDataFrame(
        [("https://ok.example/x", "2024-01-01"), ("not a url", "2024-01-01")],
        "url string, ts string",
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"))
    got = cdx.cdx_entries(df).collect()
    assert len(got) == 1 and got[0]["surt_host"] == "example,ok"


def test_crawl_cli_builds_cdx(spark, tmp_path):
    """--cdx-out on the crawl CLI indexes exactly the captured records."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wh = str(tmp_path / "wh")
    out = str(tmp_path / "cdxidx")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "crawl.py"),
         "--tier", "mini", "--warehouse", wh, "--max-epochs", "2",
         "--cores", "4", "--cdx-out", out, "--cdx-shards", "4"],
        capture_output=True, text=True, timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["cdx_entries"] == summary["total_records"] > 0
    assert os.path.exists(os.path.join(out, "_cluster.json"))
    # index rows == records rows, and a domain lookup returns a subset
    total = cdx.lookup_cdx(spark, out, "").count()
    assert total == summary["cdx_entries"]


def test_latest_captures(spark, tmp_path):
    out = str(tmp_path / "cdx_lat")
    rows = []
    for d in (3, 1, 7, 5):  # four captures of the same URL, shuffled order
        rows.append((f"https://re.example/page", f"2024-02-{d:02d}T00:00:00"))
    rows.append(("https://re.example/other", "2024-01-01T00:00:00"))
    pages = spark.createDataFrame(rows, "url string, ts string").select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts")
    )
    cdx.build_cdx(pages, out, n_shards=2)
    got = {
        r["surt"]: r["ts"]
        for r in cdx.latest_captures(spark, out, "example,re)").collect()
    }
    assert len(got) == 2
    assert got["example,re)/page"].day == 7  # newest of the four wins


def test_warc_roundtrip_feeds_cdx(spark, tmp_path):
    """Common-Crawl interop end-to-end: archive pages as .warc.gz shards,
    re-ingest them, and the index built from the re-ingested shards is
    identical to the index built from the original table."""
    from frontier_engine.warc import read_warc, write_warc

    pages = _pages(spark, n_hosts=5, per_host=8)
    wdir = str(tmp_path / "warc")
    write_warc(pages.select("url", "warc_ts", "html")
               if "html" in pages.columns else
               pages.withColumn("html", F.encode(F.col("url"), "utf-8"))
               .select("url", "warc_ts", "html"),
               wdir)
    back = read_warc(spark, wdir).select("url", "warc_ts")
    a, b = str(tmp_path / "ia"), str(tmp_path / "ib")
    ma = cdx.build_cdx(pages.select("url", "warc_ts"), a, n_shards=3)
    mb = cdx.build_cdx(back, b, n_shards=3)
    assert ma == mb
    ka = sorted(tuple(r) for r in cdx.lookup_cdx(spark, a, "").select("surt", "ts", "url").collect())
    kb = sorted(tuple(r) for r in cdx.lookup_cdx(spark, b, "").select("surt", "ts", "url").collect())
    assert ka == kb and len(ka) == 40
