"""Deterministic synthetic crawl corpus (seed=42) per FIXTURES.md.

Generates the ``pages`` table (url, warc_ts, html, text, lang) — the
authoritative input shape from BASELINE.json ``input_hint`` — plus ``seeds``
and ``robots``. One shared generator so the engine and the pure-Python
oracle see identical bytes; ``text`` is produced by the SAME extractor the
engine's pandas UDF uses (extract.extract_text_py), which is what makes the
byte-identical invariant testable.

Shape mirrors the reference corpus:
- one mega-host holding ~40% of pages (skew test — the reference's BHX chain
  dominates its corpus the same way),
- per-host page trees with pagination-style chains (paginated scan S6,
  /root/reference/crawler/stores/bhx.py:583-647),
- embedded Vietnamese product strings exercising the §2.7 normalize family,
- link noise: fragments, uppercase hosts, default ports, duplicate and
  cross-host links (canonicalization + dedup targets).
"""

from __future__ import annotations

import hashlib
import json
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_text_py

SEED = 42
BASE_TS = datetime(2025, 6, 14, 0, 0, 0, tzinfo=timezone.utc)

_PRODUCT_NAMES = [
    "Sữa tươi tiệt trùng hộp 4 quả 180ml",
    "Nước mắm cá cơm chai 500ml",
    "Gạo thơm ST25 túi 5kg",
    "Trứng gà hộp 10 quả",
    "Dầu ăn thực vật chai 1 lít",
    "Thùng 24 lon nước ngọt 330 ml",
    "Bánh quy bơ gói 300g",
    "Cà phê sữa lốc 6 hộp 180 ml",
    "Rau muống bó 300g",
    "Túi cam sành 1kg",
    "Fresh milk carton 1 l",
    "Instant noodles pack 75g",
]


def _host(h: int) -> str:
    return f"host{h}.example"


def _page_counts(n_hosts: int, n_pages: int, rng: random.Random) -> list[int]:
    """Mega-host 0 gets ~40%; the rest follow a Zipf(1.3)-ish decay."""
    mega = int(n_pages * 0.4)
    rest = n_pages - mega
    weights = [1.0 / ((i + 1) ** 1.3) for i in range(n_hosts - 1)]
    tot = sum(weights)
    counts = [max(2, int(rest * w / tot)) for w in weights]
    return [mega] + counts


def _page_html(
    h: int, i: int, links: list[str], rng: random.Random, lang: str
) -> bytes:
    name = rng.choice(_PRODUCT_NAMES)
    price = rng.randrange(5, 500) * 1000
    parts = [
        "<html><head>",
        f"<title>Host {h} page {i} — {name}</title>",
        '<script type="text/javascript">var x = 1 < 2; window.track("',
        f"p{i}",
        '");</script>',
        "<style>.a { color: red; }</style>",
        "</head><body>",
        f"<h1>Trang {i} của host {h}</h1>" if lang == "vi" else f"<h1>Page {i} of host {h}</h1>",
        f"<p>Sản phẩm: {name} — giá {price:,}đ &amp; khuyến mãi.</p>",
        f"<p>SKU {h}-{i} | store {h} | item detail text {'x' * (rng.randrange(5, 40))}</p>",
        "<!-- comment noise <a href=\"https://ignored.example/\"> -->",
    ]
    for link in links:
        parts.append(f'<a href="{link}">link {link[:24]}</a>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def generate_corpus(
    out_dir: str,
    n_hosts: int = 50,
    n_pages: int = 5000,
    n_seeds: int = 10,
    seed: int = SEED,
) -> dict[str, str]:
    """Write pages/seeds/robots parquet into ``out_dir``; cached by params."""
    os.makedirs(out_dir, exist_ok=True)
    params = {"n_hosts": n_hosts, "n_pages": n_pages, "n_seeds": n_seeds, "seed": seed, "v": 4}
    stamp = hashlib.sha256(json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]
    marker = os.path.join(out_dir, f".done-{stamp}")
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
        "robots": os.path.join(out_dir, "robots.parquet"),
    }
    if os.path.exists(marker):
        return paths

    rng = random.Random(seed)
    counts = _page_counts(n_hosts, n_pages, rng)

    urls: list[str] = []
    ts: list[datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    row = 0
    for h in range(n_hosts):
        n = counts[h]
        lang = "vi" if h % 3 != 0 else "en"
        host = _host(h)
        branching = 6
        for i in range(n):
            url = f"https://{host}/" if i == 0 else f"https://{host}/p{i}"
            # tree children + pagination-style "next page" chain
            links: list[str] = []
            for c in range(i * branching + 1, min(i * branching + 1 + branching, n)):
                links.append(f"https://{host}/p{c}")
            if i + 1 < n and rng.random() < 0.3:
                links.append(f"https://{host}/p{i + 1}")  # duplicate-ish next link
            # canonicalization noise
            if links and rng.random() < 0.2:
                links.append(links[0] + "#frag")  # dup modulo fragment
            if rng.random() < 0.1:
                links.append(f"https://{host.upper()}:443/p{rng.randrange(n)}")
            if rng.random() < 0.08:
                links.append(f"https://{_host(rng.randrange(n_hosts))}/")
            if rng.random() < 0.04:
                links.append(f"https://{host}/missing{i}")  # dead link → retry path
            if h % 5 == 0 and rng.random() < 0.1:
                links.append(f"https://{host}/private/s{i}")  # robots-disallowed
            html_b = _page_html(h, i, links, rng, lang)
            urls.append(url)
            ts.append(BASE_TS + timedelta(seconds=row))
            htmls.append(html_b)
            texts.append(extract_text_py(html_b))
            langs.append(lang)
            row += 1
        # a few disallowed pages that exist in the corpus
        if h % 5 == 0:
            for i in range(0, n, max(1, n // 10)):
                url = f"https://{host}/private/s{i}"
                html_b = _page_html(h, 10_000 + i, [], rng, lang)
                urls.append(url)
                ts.append(BASE_TS + timedelta(seconds=row))
                htmls.append(html_b)
                texts.append(extract_text_py(html_b))
                langs.append(lang)
                row += 1

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    pq.write_table(pages, paths["pages"])

    seeds = pa.table(
        {
            "url": pa.array([f"https://{_host(h)}/" for h in range(min(n_seeds, n_hosts))]),
            "priority": pa.array([1.0] * min(n_seeds, n_hosts), pa.float64()),
        }
    )
    pq.write_table(seeds, paths["seeds"])

    delays = [0.5, 1.0, 2.0]
    robots = pa.table(
        {
            "host": pa.array([_host(h) for h in range(n_hosts)]),
            "crawl_delay": pa.array([delays[h % 3] for h in range(n_hosts)], pa.float64()),
            "disallow_prefixes": pa.array(
                [["/private"] if h % 5 == 0 else [] for h in range(n_hosts)],
                pa.list_(pa.string()),
            ),
        }
    )
    pq.write_table(robots, paths["robots"])

    with open(marker, "w") as f:
        f.write(stamp)
    return paths


def default_fixture_dir(tier: str = "test") -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", f"corpus_{tier}")


def corpus(tier: str = "test") -> dict[str, str]:
    """Tiered corpora: test (~5k pages) and bench (~120k pages)."""
    if tier == "test":
        return generate_corpus(default_fixture_dir("test"), n_hosts=50, n_pages=5000)
    if tier == "mini":
        return generate_corpus(default_fixture_dir("mini"), n_hosts=12, n_pages=600, n_seeds=6)
    if tier == "bench":
        return generate_corpus(default_fixture_dir("bench"), n_hosts=200, n_pages=120_000, n_seeds=40)
    raise ValueError(f"unknown tier {tier!r}")
