from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontier_engine import hostctl


def _census(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, url string, content string")
    out = hostctl.trap_census(df, **kw)
    return {r["host"]: r.asDict() for r in out.collect()}


def test_trap_census_flags_duplicate_content_server(spark):
    rows = [
        # trap host: 6 session-id URLs, 2 distinct contents
        *[
            (f"trap.example", f"https://trap.example/p?sid={i}", f"c{i % 2}")
            for i in range(6)
        ],
        # healthy host: 6 URLs, 6 contents
        *[
            (f"ok.example", f"https://ok.example/a/{i}", f"body{i}")
            for i in range(6)
        ],
    ]
    got = _census(spark, rows, min_urls=5, ratio_threshold=3.0)
    t = got["trap.example"]
    assert (t["n_pages"], t["n_urls"], t["n_contents"]) == (6, 6, 2)
    assert t["urls_per_content"] == 3.0
    assert t["trap"] is True
    h = got["ok.example"]
    assert h["urls_per_content"] == 1.0
    assert h["trap"] is False


def test_trap_census_path_signals(spark):
    deep = "https://d.example" + "/x" * 20
    repeat = "https://r.example/a/b/a/b/a"
    rows = [("d.example", deep, "c"), ("r.example", repeat, "c")]
    got = _census(spark, rows, min_urls=1, ratio_threshold=99.0)
    assert got["d.example"]["max_depth"] == 20
    assert got["d.example"]["trap"] is True  # depth_limit=16
    assert got["r.example"]["max_seg_repeat"] == 3
    assert got["r.example"]["trap"] is False  # seg_repeat_limit=3 not exceeded
    got2 = _census(spark, rows, min_urls=1, ratio_threshold=99.0, seg_repeat_limit=2)
    assert got2["r.example"]["trap"] is True


def test_trap_census_pathless_and_null_urls(spark):
    rows = [("h", "https://h", "c"), ("h", None, "c2"), ("h", "not a url", "c3")]
    got = _census(spark, rows, min_urls=1)
    h = got["h"]
    assert h["max_depth"] == 0 and h["max_seg_repeat"] == 0
    assert h["n_pages"] == 3


def test_trap_census_insufficient_evidence_never_flags(spark):
    # worst possible ratio but only 3 URLs: below min_urls, no flag
    rows = [("h", f"https://h/p?s={i}", "same") for i in range(3)]
    got = _census(spark, rows, min_urls=20, ratio_threshold=2.0)
    assert got["h"]["trap"] is False


def _pages(spark, triples):
    return spark.createDataFrame(triples, "host string, content string")


def test_mirror_hosts_exact_and_partial(spark):
    rows = []
    # full mirror pair: m1/m2 share contents s0..s3
    for h in ("m1", "m2"):
        rows += [(h, f"s{i}") for i in range(4)]
    # partial pair: p1 has s0..s5, p2 has s0..s7 of a different namespace
    rows += [("p1", f"t{i}") for i in range(6)]
    rows += [("p2", f"t{i}") for i in range(8)]
    # unrelated host
    rows += [("solo", f"u{i}") for i in range(5)]
    cached: list = []
    out = hostctl.mirror_hosts(
        _pages(spark, rows), min_overlap=2, min_jaccard=0.5, cached=cached
    )
    got = {(r["host_a"], r["host_b"]): r.asDict() for r in out.collect()}
    for df in cached:
        df.unpersist()
    assert set(got) == {("m1", "m2"), ("p1", "p2")}
    m = got[("m1", "m2")]
    assert (m["n_a"], m["n_b"], m["overlap"], m["jaccard"]) == (4, 4, 4, 1.0)
    p = got[("p1", "p2")]
    assert (p["n_a"], p["n_b"], p["overlap"]) == (6, 8, 6)
    assert p["jaccard"] == 6 / 8


def test_mirror_hosts_duplicate_fetches_do_not_inflate_overlap(spark):
    # same (host, content) observed many times counts once
    rows = [("a", "x")] * 10 + [("b", "x")] * 3 + [("a", "y"), ("b", "y")]
    out = hostctl.mirror_hosts(_pages(spark, rows), min_overlap=2, min_jaccard=0.5)
    got = out.collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert (r["n_a"], r["n_b"], r["overlap"], r["jaccard"]) == (2, 2, 2, 1.0)


def test_mirror_hosts_boilerplate_cap(spark):
    # "boiler" is served by every host; with max_fp_hosts below the host
    # count it contributes no candidate pairs, so only the real mirror
    # pair (sharing s0/s1) survives.
    hosts = [f"h{i}" for i in range(8)]
    rows = [(h, "boiler") for h in hosts]
    rows += [("h0", "s0"), ("h0", "s1"), ("h1", "s0"), ("h1", "s1")]
    out = hostctl.mirror_hosts(
        _pages(spark, rows), min_overlap=2, min_jaccard=0.5, max_fp_hosts=4
    )
    got = {(r["host_a"], r["host_b"]) for r in out.collect()}
    assert got == {("h0", "h1")}
    # without the cap the boilerplate fingerprint links every pair, but
    # jaccard still gates: h2..h7 pairs share 1 of 1 -> jaccard 1.0 with
    # overlap 1 < min_overlap, so min_overlap is what keeps them out.
    out2 = hostctl.mirror_hosts(
        _pages(spark, rows), min_overlap=2, min_jaccard=0.5, max_fp_hosts=1000
    )
    got2 = {(r["host_a"], r["host_b"]) for r in out2.collect()}
    assert got2 == {("h0", "h1")}


def test_url_path_features_expression_only(spark):
    df = spark.range(1).select(
        F.lit("https://h.example/a/b/a/c?q=1#f").alias("url")
    )
    feats = hostctl.url_path_features(F.col("url"))
    row = df.select(
        feats["depth"].alias("d"), feats["seg_repeat"].alias("r")
    ).collect()[0]
    assert row["d"] == 4  # /a/b/a/c
    assert row["r"] == 2  # "a" twice; query/fragment excluded


def test_politeness_audit_gaps_and_gate(spark):
    log = spark.createDataFrame(
        [
            # host a, delay 1000: gaps 1000, 999 -> one violation
            ("a", 0), ("a", 1000), ("a", 1999),
            # host b, delay 500: gaps 600, 700 -> compliant
            ("b", 10), ("b", 610), ("b", 1310),
            # host c: single fetch, no delay row -> default delay, null gap
            ("c", 42),
        ],
        "host string, ts_ms long",
    )
    delays = spark.createDataFrame(
        [("a", 1000), ("b", 500)], "host string, delay_ms long"
    )
    got = {
        r["host"]: r.asDict()
        for r in hostctl.politeness_audit(log, delays).collect()
    }
    a = got["a"]
    assert (a["n_fetches"], a["min_gap_ms"], a["violations"], a["compliant"]) == (
        3, 999, 1, False,
    )
    b = got["b"]
    assert (b["min_gap_ms"], b["violations"], b["compliant"]) == (600, 0, True)
    c = got["c"]
    assert (c["n_fetches"], c["min_gap_ms"], c["delay_ms"], c["violations"]) == (
        1, None, 1000, 0,
    )
    assert c["compliant"] is True


def test_politeness_audit_tied_timestamps_deterministic(spark):
    # two fetches at the same instant: gap 0 regardless of tie order
    log = spark.createDataFrame(
        [("h", 5), ("h", 5), ("h", 800)], "host string, ts_ms long"
    )
    delays = spark.createDataFrame([("h", 100)], "host string, delay_ms long")
    r = hostctl.politeness_audit(log, delays).collect()[0].asDict()
    assert (r["min_gap_ms"], r["violations"], r["compliant"]) == (0, 1, False)


def test_dust_params_learns_strip_rule(spark):
    rows = [
        # sess is content-irrelevant on h1 (fp fixed per page value)
        ("http://h1/p?page=1&sess=a", 11),
        ("http://h1/p?sess=b&page=1", 11),  # order swapped: same residual
        ("http://h1/p?page=2&sess=c", 12),
        ("http://h1/p?page=2&sess=d", 12),
        # repeated key x: one multiset observation per URL, order collapses
        ("http://h1/r?x=1&x=2&page=9", 30),
        ("http://h1/r?x=2&x=1&page=9", 30),
        ("http://h1/r?x=3&page=9", 31),
        # no-param URLs contribute nothing
        ("http://h1/q?", 99),
        ("http://h1/q", 99),
    ]
    df = spark.createDataFrame(rows, "url string, fprint long")
    got = {
        (r["host"], r["param"]): r.asDict()
        for r in hostctl.dust_params(df, min_evidence=1).collect()
    }
    sess = got[("h1", "sess")]
    assert (sess["multi_groups"], sess["irrelevant_groups"]) == (2, 2)
    assert sess["excess_urls"] == 2 and sess["strip"] is True
    # page never varies within a controlled group here: no evidence
    page = got[("h1", "page")]
    assert page["multi_groups"] == 0 and page["strip"] is False
    # x varies AND changes the fingerprint: evidence AGAINST stripping
    x = got[("h1", "x")]
    assert (x["multi_groups"], x["irrelevant_groups"]) == (1, 0)
    assert x["strip"] is False
    assert ("h1", "") not in got  # empty params never become a key


def test_dust_params_min_evidence_gate(spark):
    rows = [
        ("http://h/p?s=1", 5),
        ("http://h/p?s=2", 5),  # one irrelevant multi-group only
    ]
    df = spark.createDataFrame(rows, "url string, fprint long")
    one = hostctl.dust_params(df, min_evidence=1).collect()[0]
    two = hostctl.dust_params(df, min_evidence=2).collect()[0]
    assert one["strip"] is True and two["strip"] is False


def test_crawl_budget_policy(spark):
    census = spark.createDataFrame(
        [
            # clean host, yield 1: full base budget
            ("clean", 100, 100, False),
            # dup-content server, 50 urls per content: base/50
            ("dupey", 5000, 100, False),
            # flagged trap: demoted to min regardless of yield
            ("trap", 100, 100, True),
            # tiny yield clamps up to min
            ("thin", 100000, 1, False),
        ],
        "host string, n_urls long, n_contents long, trap boolean",
    )
    got = {
        r["host"]: r["budget"]
        for r in hostctl.crawl_budget(
            census, base_budget=1000, min_budget=10, max_budget=100000
        ).collect()
    }
    assert got == {"clean": 1000, "dupey": 20, "trap": 10, "thin": 10}


def test_crawl_budget_rejects_bad_bounds(spark):
    census = spark.createDataFrame(
        [("h", 1, 1, False)],
        "host string, n_urls long, n_contents long, trap boolean",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hostctl.crawl_budget(census, min_budget=0)


def test_apply_dust_rewrites(spark):
    rules = spark.createDataFrame(
        [("h1", "sess", True), ("h1", "page", False), ("h2", "x", False)],
        "host string, param string, strip boolean",
    )
    df = spark.createDataFrame(
        [
            # strip param present (either position)
            ("https://h1/p?page=2&sess=9", "a"),
            ("https://h1/p?sess=9&page=2", "b"),
            # query becomes empty -> '?' dropped
            ("https://h1/q?sess=1", "c"),
            # no query at all -> untouched
            ("https://h1/r", "d"),
            # host with rules but none strip=true -> untouched
            ("https://h2/p?x=1&y=2", "e"),
            # host absent from rules -> byte-identical
            ("https://h3/p?sess=5&z=", "f"),
        ],
        "url string, tag string",
    )
    got = {r["tag"]: r["url"] for r in hostctl.apply_dust(df, rules).collect()}
    assert got == {
        "a": "https://h1/p?page=2",
        "b": "https://h1/p?page=2",
        "c": "https://h1/q",
        "d": "https://h1/r",
        "e": "https://h2/p?x=1&y=2",
        "f": "https://h3/p?sess=5&z=",
    }
    # extra columns and row count preserved
    out = hostctl.apply_dust(df, rules)
    assert out.columns == ["url", "tag"] and out.count() == 6


def test_apply_dust_sort_params(spark):
    rules = spark.createDataFrame(
        [("h1", "sess", True)], "host string, param string, strip boolean"
    )
    df = spark.createDataFrame(
        [("https://h1/p?c=3&a=1&sess=0&b=2",)], "url string"
    )
    plain = hostctl.apply_dust(df, rules).collect()[0]["url"]
    srt = hostctl.apply_dust(df, rules, sort_params=True).collect()[0]["url"]
    assert plain == "https://h1/p?c=3&a=1&b=2"
    assert srt == "https://h1/p?a=1&b=2&c=3"


def test_apply_dust_end_to_end_mined(spark):
    # mine rules from evidence, then apply: the session subspace collapses
    rows = []
    for path in ("x", "y"):
        for page in (1, 2):
            for sess in range(4):
                rows.append(
                    (f"https://h/{path}?page={page}&sess={sess}",
                     f"{path}{page}")
                )
    df = spark.createDataFrame(rows, "url string, fprint string")
    rules = hostctl.dust_params(df, min_evidence=2)
    rw = hostctl.apply_dust(df, rules)
    assert rw.select("url").distinct().count() == 4  # 2 paths x 2 pages
    assert df.select("url").distinct().count() == 16


def test_host_caps_from_pld(spark):
    # census keyed by PLD -> budgets; every subdomain inherits its PLD's cap
    pld_budgets = spark.createDataFrame(
        [("spam.com", 10), ("good.co.uk", 500)], "host string, budget long"
    )
    hosts = spark.createDataFrame(
        [("a.spam.com",), ("b.spam.com",), ("spam.com",),
         ("www.good.co.uk",), ("other.io",)],
        "host string",
    )
    got = {
        r["host"]: r["budget"]
        for r in hostctl.host_caps_from_pld(pld_budgets, hosts).collect()
    }
    assert got == {
        "a.spam.com": 10,
        "b.spam.com": 10,
        "spam.com": 10,
        "www.good.co.uk": 500,
    }  # other.io absent -> politeness budget downstream


def test_pld_budget_drains_shared_allocation(spark):
    # end-to-end: a PLD cap feeds drain_epoch and throttles every subdomain
    from frontier_engine.frontier import DrainConfig, drain_epoch, frontier_from_seeds

    seeds = spark.createDataFrame(
        [(f"https://{s}.spam.com/p{i}", 1.0) for s in "ab" for i in range(20)],
        "url string, priority double",
    )
    fr = frontier_from_seeds(seeds)
    robots = spark.createDataFrame(
        [("a.spam.com", 1.0, []), ("b.spam.com", 1.0, [])],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    )
    caps = hostctl.host_caps_from_pld(
        spark.createDataFrame([("spam.com", 3)], "host string, budget long"),
        fr.select("host"),
    )
    res = drain_epoch(fr, robots, DrainConfig(epoch_seconds=10.0), host_budgets=caps)
    import pyspark.sql.functions as F

    per = {
        r["host"]: r["n"]
        for r in res.drained.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"a.spam.com": 3, "b.spam.com": 3}


def test_mirror_families_canonical_pick(spark):
    pairs = spark.createDataFrame(
        # family 1: chain b—a, b—c (transitive); family 2: y—z
        [("b.example", "a.example"), ("b.example", "c.example"),
         ("z.example", "y.example")],
        "host_a string, host_b string",
    )
    fam = {
        r["host"]: r["canonical"]
        for r in hostctl.mirror_families(pairs).collect()
    }
    assert fam == {
        "a.example": "a.example",
        "b.example": "a.example",
        "c.example": "a.example",
        "y.example": "y.example",
        "z.example": "y.example",
    }
    # the drop set feeds the frontier blocklist: everything non-canonical
    drop = {h for h, c in fam.items() if h != c}
    assert drop == {"b.example", "c.example", "z.example"}


def test_soft404_detect_flags_template_pages(spark):
    """Pure error-template pages flag at jacc=1; pages merely sharing a
    few tokens stay below threshold; hosts are scored against their OWN
    signature only."""
    from pyspark.sql import functions as F

    from frontier_engine.hostctl import soft404_detect

    tpl = spark.createDataFrame(
        [("a.com", "error 404 page not found"),
         ("b.com", "oops missing resource sorry")],
        ["host", "template"],
    )
    docs = spark.createDataFrame(
        [
            (1, "a.com", "error 404 page not found"),        # exact -> flag
            (2, "a.com", "great article about page layout"),  # 1 shared token
            (3, "b.com", "error 404 page not found"),         # a's tpl on b -> no flag
            (4, "b.com", "oops missing resource sorry"),      # b's tpl -> flag
        ],
        ["doc_id", "host", "text"],
    )
    out = {r["doc_id"]: r for r in soft404_detect(docs, tpl).collect()}
    assert out[1]["is_soft404"] and out[1]["jacc"] == 1.0
    assert not out[2]["is_soft404"]
    assert not out[3]["is_soft404"]  # cross-host template is content there
    assert out[4]["is_soft404"]
    # broadcast hint survives into the plan (no page-side shuffle)
    plan = soft404_detect(docs, tpl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_adaptive_delay_aimd_rules(spark):
    """Slow host doubles (clamped at max), healthy host halves (clamped
    at min) — driven by the exact p95, not the mean."""
    from frontier_engine.hostctl import adaptive_delay

    log_rows = (
        # slow: p95 well above target
        [("slow", 900)] * 20
        # healthy: p95 under target even with one outlier (mean would lie)
        + [("fast", 100)] * 19
        + [("fast", 10_000)]
        # at max already: stays clamped
        + [("maxed", 900)] * 5
        # at min already: stays clamped
        + [("floor", 100)] * 5
    )
    log = spark.createDataFrame(log_rows, ["host", "latency_ms"])
    delays = spark.createDataFrame(
        [("slow", 4), ("fast", 4), ("maxed", 64), ("floor", 1)],
        ["host", "delay_s"],
    )
    out = {r["host"]: r for r in adaptive_delay(log, delays, target_ms=500).collect()}
    assert out["slow"]["next_delay_s"] == 8
    assert out["fast"]["p95_ms"] == 100  # p95 ignores the single outlier
    assert out["fast"]["next_delay_s"] == 2
    assert out["maxed"]["next_delay_s"] == 64
    assert out["floor"]["next_delay_s"] == 1


class TestFairnessGini:
    def test_equal_allocation_is_zero(self, spark):
        from frontier_engine.hostctl import fairness_gini

        rows = [("p", f"h{i}") for i in range(4) for _ in range(5)]
        df = spark.createDataFrame(rows, "pld string, host string")
        (r,) = fairness_gini(df).collect()
        assert (r["n_hosts"], r["n_fetches"]) == (4, 20)
        assert r["gini"] == 0.0

    def test_monopoly_approaches_one(self, spark):
        from frontier_engine.hostctl import fairness_gini

        # one host takes 97 of 100 fetches across 4 hosts
        rows = [("p", "hog")] * 97 + [("p", "a"), ("p", "b"), ("p", "c")]
        df = spark.createDataFrame(rows, "pld string, host string")
        (r,) = fairness_gini(df).collect()
        # exact: n=[1,1,1,97] -> G = (2*(1+2+3+4*97) - 5*100)/(4*100) = 0.72
        assert r["gini"] == pytest.approx(0.72, abs=1e-12)

    def test_groups_independent(self, spark):
        from frontier_engine.hostctl import fairness_gini

        rows = [("p1", "a"), ("p1", "a"), ("p1", "b"), ("p2", "x")]
        df = spark.createDataFrame(rows, "pld string, host string")
        got = {r["pld"]: r["gini"] for r in fairness_gini(df).collect()}
        # p1: n=[1,2] -> (2*(1*1+2*2) - 3*3)/(2*3) = 1/6
        assert got["p1"] == pytest.approx(1 / 6, abs=1e-12)
        assert got["p2"] == 0.0


def test_burst_detect_exact_flags(spark):
    import datetime as dt
    import math

    from frontier_engine.hostctl import burst_detect

    base = dt.datetime(2024, 1, 1)
    rows = []
    # host A: 9 quiet hours of 2 fetches, one hour of 40 -> burst
    for h in range(9):
        rows += [("A", base + dt.timedelta(hours=h, minutes=m)) for m in (1, 2)]
    rows += [("A", base + dt.timedelta(hours=9, minutes=m)) for m in range(40)]
    # host B: flat -> zero variance, no burst, NULL z
    for h in range(5):
        rows += [("B", base + dt.timedelta(hours=h))]
    df = spark.createDataFrame(rows, "host string, ts timestamp")
    got = {
        (r["host"], r["bucket_ts"].hour): (r["c"], r["zscore"], r["is_burst"])
        for r in burst_detect(df).collect()
    }
    cs = [2] * 9 + [40]
    n, s, t = len(cs), sum(cs), sum(c * c for c in cs)
    for h, c in enumerate(cs):
        z = (n * c - s) / math.sqrt(n * t - s * s)
        burst = (n * c - s) > 0 and (n * c - s) ** 2 > 4 * (n * t - s * s)
        assert got[("A", h)] == (c, z, burst), h
    assert got[("A", 9)][2] is True
    assert sum(1 for k, v in got.items() if k[0] == "A" and v[2]) == 1
    assert got[("B", 0)] == (1, None, False)
