"""Engine column-expression canonicalization must equal the Python oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from frontier_engine.canon import (
    canonicalize_col,
    canonicalize_py,
    host_col,
    host_of_py,
    path_col,
    path_of_py,
)

CASES = [
    "https://HOST3.Example/p12",
    "https://host3.example:443/p12",
    "http://host3.example:80/",
    "http://host3.example:8080/x",
    "https://host1.example/p5#frag",
    "  https://host1.example  ",
    "\thttps://a.example/x\n",
    "\r\nhttps://b.example/y\t ",
    " https://c.example/z ",  # NBSP padding
    "\x0b\fhttps://d.example/w",
    "https://host1.example",
    "https://host1.example/?q=1#f",
    "https://user@host1.example/a",
    "not a url",
    "ftp://host/x",
    "https://host9.example/p1?page=2&size=10",
    "HTTPS://HOST0.EXAMPLE/A/B/C",
    "https://host0.example/p1#",
    # port/userinfo/fragment edge cases for the compact regex forms
    "http://x:80:80/x",
    "http://x:8080",
    "https://h:80/x",      # https + :80 → NOT stripped
    "http://h:443/x",      # http + :443 → NOT stripped
    "http://a@b:80/x",
    "http://a@b@c/p",
    "http://@h/",
    "http://a@/",
    "http://:80/x",
    "http:///x",
    "http://",
    "https://h#frag\nwith newline",
    "https://h/p#a#b#c",
    "http://a:1:2/",
    "http://h:80x/",
]


def _random_urls(n=300, seed=7):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        scheme = rng.choice(["http", "https", "HTTP", "Https"])
        host = rng.choice(["a.example", "B.Example", "host12.example:443", "h.example:80", "x.example:8081"])
        path = rng.choice(["", "/", "/p1", "/p1/p2?x=1", "/P9#frag", "/a b"])
        out.append(f"{scheme}://{host}{path}")
    return out


def test_canonicalize_matches_oracle(spark):
    urls = CASES + _random_urls()
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [
        r["c"]
        for r in df.select(canonicalize_col(F.col("url")).alias("c")).collect()
    ]
    want = [canonicalize_py(u) for u in urls]
    assert got == want


def test_canonical_first_matches_oracle(spark):
    from frontier_engine.canon import canonical_first

    urls = CASES + _random_urls(seed=11)
    df = spark.createDataFrame([(u,) for u in urls], ["raw"])
    out = canonical_first(df, F.col("raw"), "url")
    got = [r["url"] for r in out.select("url").collect()]
    assert got == [canonicalize_py(u) for u in urls]
    # compact canonical expression: one copy inlines the 2-op strip/defrag
    # subtree ~6x + 2 port strips (= 14). The old CASE form was ~50 and
    # multiplied to 250+ once a host filter was pushed through — the bound
    # catches that class of regression
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_replace") <= 20


def test_host_and_path_match_oracle(spark):
    urls = [canonicalize_py(u) for u in CASES + _random_urls(seed=9)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        host_col(F.col("url")).alias("h"), path_col(F.col("url")).alias("p")
    ).collect()
    for u, r in zip(urls, rows):
        assert r["h"] == host_of_py(u), u
        assert r["p"] == path_of_py(u), u


def test_canonical_is_idempotent():
    for u in CASES:
        c = canonicalize_py(u)
        assert canonicalize_py(c) == c


def test_url_features_col_signals(spark):
    from frontier_engine.canon import url_features_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("https://a.example/x/y/z?id=1&ref=2&s=3",),
            ("https://b.example/p",),
            ("https://c.example/1234567890",),
        ],
        ["url"],
    )
    feats = url_features_col(F.col("url"))
    out = {r["url"]: r for r in df.select("url", *[c.alias(k) for k, c in feats.items()]).collect()}
    r1 = out["https://a.example/x/y/z?id=1&ref=2&s=3"]
    assert (r1["host"], r1["path_depth"], r1["n_params"]) == ("a.example", 3, 3)
    r2 = out["https://b.example/p"]
    assert (r2["host"], r2["path_depth"], r2["n_params"]) == ("b.example", 1, 0)
    r3 = out["https://c.example/1234567890"]
    assert r3["digit_ratio"] == 10 / len("https://c.example/1234567890")


SURT_CASES = [
    "https://www.example.com/path/Page?b=2&a=1",
    "https://example.com/",
    "http://www2.example.co.uk/x",
    "https://sub.www.example.com/y",     # www not leading: kept
    "http://example.com:8080/p?z=1",
    "https://user@www.example.com/a",
    "https://www.com/",                  # strip would empty-ish: 'com' left
    "http://www./",                      # strip WOULD empty: kept
    "https://example.com/p?",            # empty query: '?' dropped
    "https://example.com/p?&&a=1&&",     # empty params dropped
    "https://example.com/UPPER/Case?B=x&A=y",
    "http://h/p",                        # single-label host
    "not a url",
    "ftp://host/x",
    "https://example.com/p?one",         # valueless param
]


def test_surt_matches_oracle(spark):
    from frontier_engine.canon import canonicalize_py, surt_col, surt_py

    urls = [canonicalize_py(u) for u in SURT_CASES + CASES + _random_urls(seed=13)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r["s"] for r in df.select(surt_col(F.col("url")).alias("s")).collect()]
    for u, g in zip(urls, got):
        assert g == surt_py(u), u


def test_surt_values(spark):
    from frontier_engine.canon import surt_py

    assert surt_py("https://www.example.com/path/Page?b=2&a=1") == (
        "com,example)/path/page?a=1&b=2"
    )
    assert surt_py("http://example.com:8080/p?z=1") == "com,example:8080)/p?z=1"
    assert surt_py("https://example.com/p?") == "com,example)/p"
    assert surt_py("https://sub.www.example.com/y") == "com,example,www,sub)/y"
    assert surt_py("not a url") == ""
    # an organization's pages sort contiguously: every example.com
    # subdomain key begins with the reversed apex
    for u in ("https://a.example.com/", "https://b.example.com/x"):
        assert surt_py(u).startswith("com,example,")


from hypothesis import given, settings
from hypothesis import strategies as st

_surt_url = st.builds(
    lambda www, host, port, path, q: f"https://{www}{host}{port}{path}{q}",
    st.sampled_from(["", "www.", "www2.", "WWW.", "www10."]),
    st.from_regex(r"[a-z0-9]([a-z0-9.\-]{0,15}[a-z0-9])?", fullmatch=True),
    st.sampled_from(["", ":8080", ":1", ":443"]),
    st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,3}", fullmatch=True),
    st.from_regex(r"(\?[a-z0-9=&]{0,14})?", fullmatch=True),
)


@settings(max_examples=25, deadline=None)
@given(urls=st.lists(_surt_url, min_size=1, max_size=8))
def test_surt_spark_python_parity_property(spark, urls):
    """surt_col and surt_py agree on arbitrary www/port/path/query shapes
    — one key semantic, two implementations (the CDX index sorts by it,
    so a single divergent byte would mis-shard a capture)."""
    from frontier_engine.canon import canonicalize_py, surt_col, surt_py

    canon_urls = sorted({canonicalize_py(u) for u in urls})
    df = spark.createDataFrame([(u,) for u in canon_urls], ["url"])
    got = [
        r["s"] for r in df.select(surt_col(F.col("url")).alias("s")).collect()
    ]
    assert got == [surt_py(u) for u in canon_urls]


def test_registrable_domain_parity_and_values(spark):
    from frontier_engine.canon import (
        registrable_domain_col,
        registrable_domain_py,
    )

    cases = [
        "www.example.com", "example.com", "a.b.c.example.co.uk",
        "shop.example.co.uk", "example.co.uk", "co.uk", "uk",
        "deep.sub.example.com.vn", "example.ac.jp", "only-label",
        "192.168.10.1", "x.co.za", "www.gov.uk", "", "a.b.io",
    ]
    want = {
        "www.example.com": "example.com",
        "example.com": "example.com",
        "a.b.c.example.co.uk": "example.co.uk",
        "shop.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "co.uk": "co.uk",            # the bare suffix: nothing to register
        "uk": "uk",
        "deep.sub.example.com.vn": "example.com.vn",
        "example.ac.jp": "example.ac.jp",
        "only-label": "only-label",
        "192.168.10.1": "192.168.10.1",
        "x.co.za": "x.co.za",
        "www.gov.uk": "www.gov.uk",  # 3 labels ending in a multipart suffix
        "": "",
        "a.b.io": "b.io",
    }
    for h in cases:
        assert registrable_domain_py(h) == want[h], h
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    got = [
        r["d"]
        for r in df.select(registrable_domain_col(F.col("h")).alias("d")).collect()
    ]
    assert got == [registrable_domain_py(h) for h in cases]


def test_url_template_col(spark):
    from frontier_engine.canon import url_template_col
    from pyspark.sql import functions as F

    cases = [
        ("https://a.example/product/4711/rev/2", "/product/{n}/rev/{n}"),
        ("https://a.example/obj/deadbeef1234/view", "/obj/{h}/view"),
        # short hex run (<8) is NOT an id; its digits still generalize
        ("https://a.example/cafe12/x", "/cafe{n}/x"),
        ("https://a.example/list?page=3&sort=asc", "/list?page,sort"),
        # param names sort; values and empties drop
        ("https://a.example/p?z=1&a=2", "/p?a,z"),
        ("https://a.example/about/team", "/about/team"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.t for r in df.select(url_template_col(F.col("url")).alias("t")).collect()]
    assert got == [t for _, t in cases]
