"""WARC ingestion into the crawl: .warc.gz shards are a first-class pages
source — `run_crawl(pages_format="warc")` and
`prepare_corpus(source_format="warc")` produce byte-identical results to the
parquet-corpus path for the same corpus.

This closes the loop the reference's fetch→parse cycle implies
(/root/reference/crawler/stores/bhx.py:599-649): at 100 TB "what was
fetched" arrives as Common-Crawl WARC shards, and a user holding them can
point the crawler straight at them.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from frontier_engine import fixtures, warc
from frontier_engine.crawl import CrawlConfig, run_crawl
from frontier_engine.frontier import DrainConfig
from frontier_engine.seen import SeenConfig
from frontier_engine.snapshot import SnapshotStore


def _cfg():
    return CrawlConfig(
        max_depth=6,
        drain=DrainConfig(epoch_seconds=8.0, skew_threshold=50, max_salts=4),
        seen=SeenConfig(n_buckets=16, bits_per_bucket=1 << 14),
    )


@pytest.fixture(scope="module")
def corpus():
    return fixtures.corpus("mini")


@pytest.fixture(scope="module")
def warc_shards(spark, corpus):
    """The fixture pages table archived as .warc.gz shards (with lang)."""
    d = tempfile.mkdtemp(prefix="fe-warcin-")
    pages = spark.read.parquet(corpus["pages"]).select("url", "warc_ts", "html", "lang")
    warc.write_warc(pages.repartition(4), d, lang_col="lang")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _crawl_outputs(spark, store: SnapshotStore):
    sched = sorted(
        (r["epoch"], r["host"], r["slot"], r["url"])
        for r in store.read(spark, "schedule").collect()
    )
    recs = sorted(
        (r["url"], r["text"], r["lang"], r["epoch"])
        for r in store.read(spark, "records").collect()
    )
    dead = sorted(r["url"] for r in store.read(spark, "dead_letter").collect())
    return sched, recs, dead


def test_lang_header_round_trips(spark, tmp_path):
    from datetime import datetime

    rows = [
        ("https://a.example/x", datetime(2026, 1, 2), b"<html>a</html>", "vi"),
        ("https://a.example/y", datetime(2026, 1, 2), b"<html>b</html>", None),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, lang string")
    out = str(tmp_path / "warc")
    warc.write_warc(df.coalesce(1), out, lang_col="lang")
    back = {r["url"]: r["lang"] for r in warc.read_warc(spark, out).collect()}
    assert back == {"https://a.example/x": "vi", "https://a.example/y": None}


def test_crawl_from_warc_matches_parquet_crawl(spark, corpus, warc_shards):
    """The headline equivalence: same corpus, two source formats, identical
    schedule + byte-identical records + identical dead letters."""
    wh_parquet = tempfile.mkdtemp(prefix="fe-wh-pq-")
    wh_warc = tempfile.mkdtemp(prefix="fe-wh-wc-")
    try:
        run_crawl(
            spark, corpus["pages"], corpus["seeds"], corpus["robots"],
            wh_parquet, _cfg(),
        )
        run_crawl(
            spark, warc_shards, corpus["seeds"], corpus["robots"],
            wh_warc, _cfg(), pages_format="warc",
        )
        a = _crawl_outputs(spark, SnapshotStore(wh_parquet))
        b = _crawl_outputs(spark, SnapshotStore(wh_warc))
        assert a[0] == b[0], "schedule diverged"
        assert a[1] == b[1], "records diverged"
        assert a[2] == b[2], "dead letters diverged"
        assert len(a[1]) > 0
    finally:
        shutil.rmtree(wh_parquet, ignore_errors=True)
        shutil.rmtree(wh_warc, ignore_errors=True)


def test_prepare_corpus_from_warc(spark, corpus, warc_shards, tmp_path):
    """WARC-in, bucketed-table-out: the prepared corpus built from shards
    equals the one built from parquet (same canonical rows), and the crawl
    over it matches the direct parquet crawl."""
    from frontier_engine.corpus import corpus_df, prepare_corpus

    loc = str(tmp_path / "corpus-warc")
    prepare_corpus(spark, warc_shards, loc, n_buckets=4, source_format="warc")
    got = corpus_df(spark, loc)

    want = spark.read.parquet(corpus["pages"]).select("url", "warc_ts", "html", "lang")
    # fixture URLs are already canonical, so row sets must match exactly
    assert got.count() == want.count()
    a = {r["url"]: (bytes(r["html"]), r["lang"]) for r in got.collect()}
    b = {r["url"]: (bytes(r["html"]), r["lang"]) for r in want.collect()}
    assert a == b

    wh = tempfile.mkdtemp(prefix="fe-wh-bc-")
    wh_ref = tempfile.mkdtemp(prefix="fe-wh-ref-")
    try:
        run_crawl(
            spark, warc_shards, corpus["seeds"], corpus["robots"], wh, _cfg(),
            corpus_location=loc, pages_format="warc",
        )
        run_crawl(
            spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh_ref, _cfg(),
        )
        assert _crawl_outputs(spark, SnapshotStore(wh)) == _crawl_outputs(
            spark, SnapshotStore(wh_ref)
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(wh_ref, ignore_errors=True)


def test_non_canonical_url_survives_warc_out(spark, tmp_path):
    """--warc-out must archive pages whose RAW url differs from the
    canonical form (uppercase host, fragment): the corpus side of the
    archive join is canonicalized first."""
    import os
    import subprocess
    import sys
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_dir = str(tmp_path / "pages")
    seeds_dir = str(tmp_path / "seeds")
    robots_dir = str(tmp_path / "robots")
    # raw URL canonicalizes to https://weird.example/x (host lowered,
    # default port stripped, fragment dropped)
    raw_url = "HTTPS://Weird.Example:443/x#frag"
    canonical = "https://weird.example/x"
    pq.write_table(
        pa.table({
            "url": [raw_url],
            "warc_ts": [datetime(2026, 1, 2)],
            "html": [b"<html><p>hello weird</p></html>"],
            "lang": ["en"],
        }),
        pages_dir + ".parquet",
    )
    pq.write_table(pa.table({"url": [canonical], "priority": [1.0]}), seeds_dir + ".parquet")
    pq.write_table(
        pa.table({
            "host": ["weird.example"],
            "crawl_delay": [1.0],
            "disallow_prefixes": [[]],
        }),
        robots_dir + ".parquet",
    )
    wh = str(tmp_path / "wh")
    warc_out = str(tmp_path / "archive")
    # subprocess: jobs/crawl.py builds and STOPS its own SparkSession —
    # calling main() in-process would stop the shared test session
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "crawl.py"),
         "--pages", pages_dir + ".parquet", "--seeds", seeds_dir + ".parquet",
         "--robots", robots_dir + ".parquet", "--warehouse", wh,
         "--warc-out", warc_out, "--max-epochs", "2"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    back = warc.read_warc(spark, warc_out).collect()
    assert [r["url"] for r in back] == [canonical]
    assert bytes(back[0]["html"]) == b"<html><p>hello weird</p></html>"
    assert back[0]["lang"] == "en"


def test_warc_dedup_writes_revisits(spark, tmp_path):
    """--warc-dedup archives pages sharing an identical body as revisit
    records (bytes stored once) and resolve_revisits round-trips them."""
    import os
    import subprocess
    import sys
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    body = b"<html><p>same body twice</p></html>"
    pq.write_table(
        pa.table({
            "url": ["https://dup.example/a", "https://dup.example/b"],
            "warc_ts": [datetime(2026, 1, 2), datetime(2026, 1, 3)],
            "html": [body, body],
            "lang": ["en", "en"],
        }),
        str(tmp_path / "pages.parquet"),
    )
    pq.write_table(
        pa.table({
            "url": ["https://dup.example/a", "https://dup.example/b"],
            "priority": [1.0, 0.5],
        }),
        str(tmp_path / "seeds.parquet"),
    )
    pq.write_table(
        pa.table({
            "host": ["dup.example"],
            "crawl_delay": [1.0],
            "disallow_prefixes": [[]],
        }),
        str(tmp_path / "robots.parquet"),
    )
    wh = str(tmp_path / "wh")
    warc_out = str(tmp_path / "archive")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "crawl.py"),
         "--pages", str(tmp_path / "pages.parquet"),
         "--seeds", str(tmp_path / "seeds.parquet"),
         "--robots", str(tmp_path / "robots.parquet"), "--warehouse", wh,
         "--warc-out", warc_out, "--warc-dedup", "--max-epochs", "3"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import json as _json

    summary = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["warc_revisits"] == 1
    back = warc.read_warc(spark, warc_out)
    types = {r["url"]: r["warc_type"] for r in back.collect()}
    assert sorted(types.values()) == ["response", "revisit"]
    hydrated = {
        r["url"]: bytes(r["html"]) for r in warc.resolve_revisits(back).collect()
    }
    assert hydrated["https://dup.example/a"] == body
    assert hydrated["https://dup.example/b"] == body
