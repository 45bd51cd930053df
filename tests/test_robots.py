"""robots.txt parsing → the structured robots table apply_robots consumes."""

from __future__ import annotations

from pyspark.sql import functions as F

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
Crawl-delay: 5.5
Sitemap: https://x.example/sitemap.xml
"""


def test_parse_pure_python():
    # wildcard group
    delay, dis = parse_robots_txt(BODY, "*")
    assert delay == 5.5 and dis == ["/tmp/", "/cgi-bin/"]
    # exact agent beats wildcard
    delay, dis = parse_robots_txt(BODY, "GoogleBot")
    assert delay == 2.0 and dis == ["/private/"]
    # unknown named agent falls back to wildcard
    delay, dis = parse_robots_txt(BODY, "frontierbot")
    assert delay == 5.5 and dis == ["/tmp/", "/cgi-bin/"]
    # blockall group
    assert parse_robots_txt(BODY, "badbot") == (None, ["/"])
    # multiple user-agents sharing one group
    multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(multi, "b") == (None, ["/x"])
    # empty Disallow = allow all; comments stripped
    assert parse_robots_txt("User-agent: *\nDisallow:  # nothing\n", "*") == (None, [])
    assert parse_robots_txt(None, "*") == (None, [])


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


def test_robots_table_dedups_per_host(spark):
    rows = [("h.example", "User-agent: *\nCrawl-delay: 3\n"),
            ("h.example", "User-agent: *\nCrawl-delay: 9\n")]
    df = spark.createDataFrame(rows, ["host", "body"])
    out = robots_table(df).collect()
    assert len(out) == 1 and out[0]["crawl_delay"] == 3.0  # min body, stable
