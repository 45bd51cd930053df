"""robots.txt parsing → the structured robots table apply_robots consumes."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from frontier_engine.robots import parse_robots, parse_robots_txt, robots_table

BODY = """
# frontpage robots
User-agent: googlebot
Disallow: /private/
Crawl-delay: 2

User-agent: badbot
Disallow: /

User-agent: *
Disallow: /tmp/
Disallow: /cgi-bin/
Allow: /tmp/public/
Crawl-delay: 5.5
Sitemap: https://x.example/sitemap.xml
"""


def test_parse_pure_python():
    # wildcard group
    delay, allow, dis = parse_robots_txt(BODY, "*")
    assert delay == 5.5 and dis == ["/tmp/", "/cgi-bin/"] and allow == ["/tmp/public/"]
    # exact agent beats wildcard
    delay, allow, dis = parse_robots_txt(BODY, "GoogleBot")
    assert delay == 2.0 and dis == ["/private/"] and allow == []
    # unknown named agent falls back to wildcard
    delay, allow, dis = parse_robots_txt(BODY, "frontierbot")
    assert delay == 5.5 and dis == ["/tmp/", "/cgi-bin/"]
    # blockall group
    assert parse_robots_txt(BODY, "badbot") == (None, [], ["/"])
    # multiple user-agents sharing one group
    multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(multi, "b") == (None, [], ["/x"])
    # empty Disallow = allow all; comments stripped
    assert parse_robots_txt("User-agent: *\nDisallow:  # nothing\n", "*") == (None, [], [])
    assert parse_robots_txt(None, "*") == (None, [], [])


def test_allow_only_group_does_not_merge_into_next():
    """A group whose only rule is Allow (or Sitemap) still terminates at the
    next User-agent line — the very common 'good bot exemption' shape. A
    parser that merges them blocks the explicitly-allowed bot site-wide."""
    body = "User-agent: bot\nAllow: /\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots_txt(body, "bot") == (None, ["/"], [])
    assert parse_robots_txt(body, "*") == (None, [], ["/"])
    # unknown-directive-only group (Sitemap) likewise starts a new group
    body2 = "User-agent: bot\nSitemap: https://x/s.xml\nUser-agent: *\nDisallow: /\n"
    assert parse_robots_txt(body2, "bot") == (None, [], [])
    assert parse_robots_txt(body2, "*") == (None, [], ["/"])


def test_parse_robots_dataframe_and_apply(spark):
    rows = [
        ("a.example", BODY),
        ("b.example", "User-agent: *\nDisallow: /blocked/\n"),
        ("c.example", "not robots at all"),
    ]
    df = spark.createDataFrame(rows, ["host", "body"])
    table = parse_robots(df, agent="frontierbot", default_crawl_delay=1.0)
    got = {r["host"]: r for r in table.collect()}
    assert got["a.example"]["crawl_delay"] == 5.5
    assert got["a.example"]["disallow_prefixes"] == ["/tmp/", "/cgi-bin/"]
    assert got["a.example"]["allow_prefixes"] == ["/tmp/public/"]
    assert got["b.example"]["crawl_delay"] == 1.0  # no delay → default
    assert got["c.example"]["disallow_prefixes"] == []

    # the parsed table drops straight into the frontier's robots gate
    from frontier_engine.frontier import DrainConfig, apply_robots

    frontier = spark.createDataFrame(
        [("https://b.example/blocked/p", "b.example"),
         ("https://b.example/ok", "b.example")],
        ["url", "host"],
    )
    allowed, blocked = apply_robots(frontier, table, DrainConfig())
    assert [r["url"] for r in blocked.collect()] == ["https://b.example/blocked/p"]
    assert [r["url"] for r in allowed.collect()] == ["https://b.example/ok"]


def test_apply_robots_allow_precedence(spark):
    """RFC 9309 longest-match: Allow inside a Disallowed subtree wins where
    it is more specific; equal-length tie allows; robots tables WITHOUT an
    allow_prefixes column keep the old prefix-disallow behavior."""
    from frontier_engine.frontier import DrainConfig, apply_robots

    table = spark.createDataFrame(
        [("h.example", 1.0, ["/search/about"], ["/search"])],
        "host string, crawl_delay double, allow_prefixes array<string>, "
        "disallow_prefixes array<string>",
    )
    frontier = spark.createDataFrame(
        [("https://h.example/search/q", "h.example"),       # blocked
         ("https://h.example/search/about/x", "h.example"),  # allowed (longer Allow)
         ("https://h.example/other", "h.example")],          # allowed (no rule)
        ["url", "host"],
    )
    allowed, blocked = apply_robots(frontier, table, DrainConfig())
    assert sorted(r["url"] for r in blocked.collect()) == ["https://h.example/search/q"]
    assert sorted(r["url"] for r in allowed.collect()) == [
        "https://h.example/other", "https://h.example/search/about/x",
    ]

    # equal-length tie → allow
    tie = spark.createDataFrame(
        [("h.example", 1.0, ["/p"], ["/p"])],
        "host string, crawl_delay double, allow_prefixes array<string>, "
        "disallow_prefixes array<string>",
    )
    allowed, blocked = apply_robots(
        spark.createDataFrame([("https://h.example/p1", "h.example")], ["url", "host"]),
        tie, DrainConfig(),
    )
    assert blocked.count() == 0 and allowed.count() == 1

    # legacy table shape (no allow column) still works
    legacy = spark.createDataFrame(
        [("h.example", 1.0, ["/p"])],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    )
    allowed, blocked = apply_robots(
        spark.createDataFrame([("https://h.example/p1", "h.example")], ["url", "host"]),
        legacy, DrainConfig(),
    )
    assert blocked.count() == 1 and allowed.count() == 0


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["allow", "disallow"]),
            st.text(alphabet="/abc", min_size=1, max_size=6).map(lambda s: "/" + s.lstrip("/")),
        ),
        min_size=0,
        max_size=8,
    ),
    st.text(alphabet="/abc", min_size=1, max_size=8).map(lambda s: "/" + s.lstrip("/")),
)
@settings(max_examples=200, deadline=None)
def test_allow_disallow_longest_match_property(rules, path):
    """Interleaved Allow/Disallow rules in one group: the parsed lists feed a
    longest-match decision that agrees with a direct RFC 9309 evaluation."""
    body = "User-agent: *\n" + "\n".join(
        f"{'Allow' if kind == 'allow' else 'Disallow'}: {p}" for kind, p in rules
    )
    _, allow, dis = parse_robots_txt(body, "*")
    assert allow == [p for k, p in rules if k == "allow"]
    assert dis == [p for k, p in rules if k == "disallow"]
    d = max((len(p) for p in dis if path.startswith(p)), default=0)
    a = max((len(p) for p in allow if path.startswith(p)), default=0)
    blocked = d > a
    # direct evaluation: most specific rule wins, tie → allow
    best = None  # (len, is_allow)
    for kind, p in rules:
        if path.startswith(p):
            cand = (len(p), kind == "allow")
            if best is None or cand[0] > best[0] or (cand[0] == best[0] and cand[1]):
                best = cand
    assert blocked == (best is not None and not best[1])


def test_robots_table_dedups_per_host(spark):
    rows = [("h.example", "User-agent: *\nCrawl-delay: 3\n"),
            ("h.example", "User-agent: *\nCrawl-delay: 9\n")]
    df = spark.createDataFrame(rows, ["host", "body"])
    out = robots_table(df).collect()
    assert len(out) == 1 and out[0]["crawl_delay"] == 3.0  # min body, stable


def test_rule_matches_py_wildcards():
    from frontier_engine.robots import rule_matches_py as m

    # * matches any run; trailing $ anchors; plain rules stay prefixes
    assert m("/*.pdf$", "/docs/report.pdf")
    assert not m("/*.pdf$", "/docs/report.pdf?download=1")  # $ means END
    assert m("/*.pdf", "/docs/report.pdf?download=1")       # unanchored ok
    assert m("/private*", "/private-files/x")
    assert m("/a/*/c", "/a/b/c")
    assert not m("/a/*/c$", "/a/b/c/d")
    assert m("/fish*.php", "/fishheads/catfish.php?parameters")
    # $ elsewhere is literal; regex metachars in rules are literal
    assert m("/a$b", "/a$b/c")
    assert not m("/a.b", "/aXb")  # '.' is NOT a regex dot
    assert m("/*?sessionid=", "/cart?sessionid=abc")
    # * alone matches everything
    assert m("*", "/anything")


def test_apply_robots_wildcards(spark):
    """§2.2.3 wildcards through the Spark expression, matched against the
    path INCLUDING the query string (§2.2.2)."""
    from frontier_engine.frontier import DrainConfig, apply_robots

    table = spark.createDataFrame(
        [("h.example", 1.0, ["/shop/*.html$"], ["/*.pdf$", "/*?sessionid="])],
        "host string, crawl_delay double, allow_prefixes array<string>, "
        "disallow_prefixes array<string>",
    )
    frontier = spark.createDataFrame(
        [
            ("https://h.example/docs/x.pdf", "h.example"),          # blocked: /*.pdf$
            ("https://h.example/docs/x.pdf?v=2", "h.example"),      # allowed: $ anchors
            ("https://h.example/cart?sessionid=99", "h.example"),   # blocked: query matched
            ("https://h.example/shop/item.html", "h.example"),      # allowed: longer Allow
            ("https://h.example/plain", "h.example"),               # allowed: no rule
        ],
        ["url", "host"],
    )
    allowed, blocked = apply_robots(frontier, table, DrainConfig())
    assert sorted(r["url"] for r in blocked.collect()) == [
        "https://h.example/cart?sessionid=99",
        "https://h.example/docs/x.pdf",
    ]
    assert sorted(r["url"] for r in allowed.collect()) == [
        "https://h.example/docs/x.pdf?v=2",
        "https://h.example/plain",
        "https://h.example/shop/item.html",
    ]


@settings(max_examples=20, deadline=None)
@given(
    rules=st.lists(
        st.text(alphabet="/abc*$.?x", min_size=1, max_size=8), min_size=1, max_size=4
    ),
    paths=st.lists(
        st.text(alphabet="/abc$.?x", min_size=1, max_size=10), min_size=1, max_size=4
    ),
)
def test_wildcard_spark_python_parity(spark, rules, paths):
    """The Spark regexp expression and rule_matches_py agree on arbitrary
    wildcard rules — one shared semantic, two implementations."""
    from frontier_engine.frontier import DrainConfig, apply_robots
    from frontier_engine.robots import rule_matches_py

    urls = sorted(
        {f"https://w.example{p if p.startswith('/') else '/' + p}" for p in paths}
    )
    table = spark.createDataFrame(
        [("w.example", 1.0, [], rules)],
        "host string, crawl_delay double, allow_prefixes array<string>, "
        "disallow_prefixes array<string>",
    )
    frontier = spark.createDataFrame([(u, "w.example") for u in urls], ["url", "host"])
    _, blocked = apply_robots(frontier, table, DrainConfig())
    got = sorted(r["url"] for r in blocked.collect())
    from frontier_engine.canon import pathq_of_py

    expect = sorted(
        u for u in set(urls) if any(rule_matches_py(r, pathq_of_py(u)) for r in rules)
    )
    assert got == expect


def test_robots_table_latest_wins_with_timestamp(spark):
    """A host whose robots.txt flips disallow→allow between fetches must be
    governed by the NEWER body when fetch timestamps are available."""
    from datetime import datetime

    old = "User-agent: *\nDisallow: /\n"
    new = "User-agent: *\nDisallow:\n"  # empty Disallow = allow all
    rows = [("h.example", old, datetime(2026, 1, 1)),
            ("h.example", new, datetime(2026, 2, 1))]
    df = spark.createDataFrame(rows, ["host", "body", "fetched_ts"])
    out = robots_table(df).collect()  # fetched_ts auto-detected
    assert len(out) == 1
    assert out[0]["disallow_prefixes"] == []  # newer body won

    # reversed timestamps: the disallow-everything body is the newer one
    rows_rev = [("h.example", old, datetime(2026, 3, 1)),
                ("h.example", new, datetime(2026, 2, 1))]
    out_rev = robots_table(spark.createDataFrame(rows_rev, ["host", "body", "fetched_ts"])).collect()
    assert out_rev[0]["disallow_prefixes"] == ["/"]

    # tie on timestamp → smallest body (deterministic across orderings)
    rows_tie = [("h.example", old, datetime(2026, 1, 1)),
                ("h.example", new, datetime(2026, 1, 1))]
    a = robots_table(spark.createDataFrame(rows_tie, ["host", "body", "fetched_ts"])).collect()
    b = robots_table(spark.createDataFrame(list(reversed(rows_tie)), ["host", "body", "fetched_ts"])).collect()
    assert a[0]["disallow_prefixes"] == b[0]["disallow_prefixes"]
