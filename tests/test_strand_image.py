"""STRAND bitext candidate mining and LAION-style image-alt harvesting.

The oracle parity of both queries() entries is checked end-to-end by
tools/check_contract.py; these tests pin the operator-level semantics on
hand-built cases (URL shapes, bucket caps, ratio gate; img-tag parsing
edge cases the closed-form fixture can't exercise).
"""

from __future__ import annotations

import pytest

from frontier_engine import textops as TX
from frontier_engine.extract import image_alt_pairs_py


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    out = TX.strand_pairs(df, **kw).collect()
    return {(r.id_a, r.id_b): (r.lang_a, r.lang_b, r.len_ratio_pm) for r in out}


def test_strand_path_segment_pairs(spark):
    got = _pairs(
        spark,
        [
            (1, "https://a.example/en/about", 100),
            (2, "https://a.example/fr/about", 110),
            (3, "https://a.example/de/about", 400),  # ratio-gated out
            (4, "https://a.example/en/other", 100),  # different residual
            (5, "https://b.example/en/about", 100),  # different host
        ],
    )
    assert got == {(1, 2): ("en", "fr", 90)}


def test_strand_trailing_segment_and_query_forms(spark):
    got = _pairs(
        spark,
        [
            (1, "https://a.example/docs/en", 100),
            (2, "https://a.example/docs/fr", 100),
            (3, "https://a.example/p?lang=en", 50),
            (4, "https://a.example/p?lang=de", 52),
            (5, "https://a.example/p", 50),  # no lang token: excluded
        ],
    )
    assert got == {(1, 2): ("en", "fr", 0), (4, 3): ("de", "en", 38)}


def test_strand_query_token_boundaries(spark):
    # '?slang=en' / '?hreflang=en' / '?lang=english' must NOT read as a
    # language token; adjacent path segments '/en/fr/x' normalize BOTH
    # segments so the two orders share one key (ADVICE round-4 findings)
    got = _pairs(
        spark,
        [
            (1, "https://a.example/doc-1?slang=en", 100),
            (2, "https://a.example/doc-1?hreflang=fr", 100),
            (3, "https://a.example/doc-2?lang=english", 100),
            (4, "https://a.example/en/fr/x", 100),
            (5, "https://a.example/fr/en/x", 100),
        ],
    )
    # 1-3 carry no language token at all; 4/5 pair on the doubly-normalized
    # key with lang from the FIRST path segment
    assert got == {(4, 5): ("en", "fr", 0)}


def test_strand_same_lang_never_pairs(spark):
    got = _pairs(
        spark,
        [
            (1, "https://a.example/en/x", 100),
            (2, "https://a.example/en/x", 100),
        ],
    )
    assert got == {}


def test_strand_bucket_cap_drops_template_keys(spark):
    rows = [
        (i, f"https://a.example/{lang}/hub", 100)
        for i, lang in enumerate(["en", "fr", "de", "es"])
    ]
    assert len(_pairs(spark, rows, max_bucket=3)) == 0
    assert len(_pairs(spark, rows, max_bucket=4)) == 6


def test_strand_non_lang_segments_unscathed(spark):
    # 'it' inside a longer segment must not match; only whole segments do
    got = _pairs(
        spark,
        [
            (1, "https://a.example/item/en/x", 90),
            (2, "https://a.example/item/fr/x", 100),
        ],
    )
    assert got == {(1, 2): ("en", "fr", 100)}


def test_strand_rejects_bad_params(spark):
    df = spark.createDataFrame([], "doc_id long, url string, n_chars long")
    with pytest.raises(ValueError):
        TX.strand_pairs(df, max_bucket=1)
    with pytest.raises(ValueError):
        TX.strand_pairs(df, max_ratio_pm=-1)


BASE = "https://h.example/p/1"


def test_image_alt_basic_and_relative_resolution():
    html = b'<html><body><img src="/img/a.jpg" alt="a red bicycle"></body></html>'
    assert image_alt_pairs_py(html, BASE) == [
        ("https://h.example/img/a.jpg", "a red bicycle")
    ]


def test_image_alt_decoys_dropped():
    html = (
        b'<img src="data:image/png;base64,xx" alt="long enough caption">'
        b'<img src="/a.png" alt="ok">'  # below min_alt_chars
        b'<img src="/b.png">'  # no alt at all
        b'<img alt="no source here at all">'
        b'<img src="javascript:x()" alt="script source caption">'
        b'<img src="ftp://h/x.png" alt="non-http scheme caption">'
    )
    assert image_alt_pairs_py(html, BASE) == []


def test_image_alt_entities_whitespace_and_quotes():
    html = (
        b"<img src='/q.png' alt='fish &amp; chips   at  the\tseaside'>"
        b'<IMG SRC="/q2.png" ALT="Upper Case Tag Caption">'
    )
    assert image_alt_pairs_py(html, BASE) == [
        ("https://h.example/q.png", "fish & chips at the seaside"),
        ("https://h.example/q2.png", "Upper Case Tag Caption"),
    ]


def test_image_alt_dedup_and_order():
    html = (
        b'<img src="/1.png" alt="first caption here">'
        b'<img src="/2.png" alt="second caption here">'
        b'<img src="/1.png" alt="first caption here">'
    )
    assert [u for u, _ in image_alt_pairs_py(html, BASE)] == [
        "https://h.example/1.png",
        "https://h.example/2.png",
    ]


def test_image_alt_length_caps():
    long_alt = b"x" * 600
    html = b'<img src="/l.png" alt="' + long_alt + b'">'
    assert image_alt_pairs_py(html, BASE) == []
    assert image_alt_pairs_py(html, BASE, max_alt_chars=1000) == [
        ("https://h.example/l.png", "x" * 600)
    ]


def test_image_alt_none_and_comments():
    assert image_alt_pairs_py(None, BASE) == []
    html = b'<!-- <img src="/c.png" alt="commented out caption"> -->'
    assert image_alt_pairs_py(html, BASE) == []


def test_image_text_pairs_dataframe(spark):
    from frontier_engine.extract import image_text_pairs

    rows = [
        ("https://h.example/p/1",
         b'<img src="/a.jpg" alt="a tall green tree">'),
        ("https://h.example/p/2", b"<p>no images at all</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [tuple(r) for r in image_text_pairs(df).collect()]
    assert got == [
        ("https://h.example/p/1", "https://h.example/a.jpg", "a tall green tree")
    ]


def test_crawl_cli_image_pairs_out(spark, tmp_path):
    """--image-pairs-out harvests (page_url, img_url, alt) parquet from
    the crawled pages' html (canonicalized-corpus join discipline)."""
    import os
    import subprocess
    import sys
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    url = "https://pix.example/p/1"
    html = (b'<html><body><img src="/img/cat.jpg" alt="a cat on a mat">'
            b'<img src="/x.png"></body></html>')
    pq.write_table(
        pa.table({
            "url": [url],
            "warc_ts": [datetime(2026, 1, 2)],
            "html": [html],
            "lang": ["en"],
        }),
        str(tmp_path / "pages.parquet"),
    )
    pq.write_table(
        pa.table({"url": [url], "priority": [1.0]}),
        str(tmp_path / "seeds.parquet"),
    )
    pq.write_table(
        pa.table({
            "host": ["pix.example"],
            "crawl_delay": [1.0],
            "disallow_prefixes": [[]],
        }),
        str(tmp_path / "robots.parquet"),
    )
    out = str(tmp_path / "pairs")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "crawl.py"),
         "--pages", str(tmp_path / "pages.parquet"),
         "--seeds", str(tmp_path / "seeds.parquet"),
         "--robots", str(tmp_path / "robots.parquet"),
         "--warehouse", str(tmp_path / "wh"),
         "--image-pairs-out", out, "--max-epochs", "2"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import json as _json

    summary = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["image_pairs"] == 1
    got = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert got == [(url, "https://pix.example/img/cat.jpg", "a cat on a mat")]
