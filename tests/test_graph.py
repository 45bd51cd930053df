"""Link-graph PageRank: parity against an independent dense-matrix
reference (numpy), plus the frontier-priority blend."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from frontier_engine.graph import frontier_priority_from_ranks, pagerank

EDGES = [
    # a small web: 0 is a hub, 3 is dangling (no out-links), 4 is an
    # orphan source (no in-links), 2<->1 is a cycle.
    (0, 1), (0, 2), (0, 3),
    (1, 2),
    (2, 1), (2, 3),
    (4, 0),
]


def _numpy_pagerank(edges, iterations, damping):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    ranks = np.ones(n)
    for _ in range(iterations):
        new = np.full(n, 1.0 - damping)
        for u, v in edges:
            new[idx[v]] += damping * ranks[idx[u]] / outdeg[idx[u]]
        ranks = new
    return {nodes[i]: ranks[i] for i in range(n)}


def test_pagerank_matches_dense_reference(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=8, damping=0.85).collect()
    }
    want = _numpy_pagerank(EDGES, iterations=8, damping=0.85)
    assert set(got) == set(want)
    for node, rank in want.items():
        assert abs(got[node] - rank) < 1e-9, (node, got[node], rank)


def test_pagerank_structure(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=8, damping=0.85).collect()
    }
    # orphan source: exactly the base (1 - d)
    assert abs(got[4] - 0.15) < 1e-12
    # the hub's in-rank all comes from node 4's single out-link
    assert abs(got[0] - (0.15 + 0.85 * got[4])) < 1e-9
    # duplicate edges collapse: doubling an edge row changes nothing
    dup = edges.unionByName(edges.limit(3))
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank(dup, iterations=8, damping=0.85).collect()
    }
    assert got == got2


def test_frontier_priority_blend(spark):
    frontier = spark.createDataFrame(
        [("a.com", "http://a.com/x", 1.0), ("zz.org", "http://zz.org/y", 1.0)],
        ["host", "url", "priority"],
    )
    ranks = spark.createDataFrame([("a.com", 2.5)], ["node", "rank"])
    out = {
        r["host"]: r["priority"]
        for r in frontier_priority_from_ranks(frontier, ranks, weight=0.1).collect()
    }
    assert abs(out["a.com"] - 1.25) < 1e-12
    assert out["zz.org"] == 1.0  # unknown host keeps base priority
    cols = frontier_priority_from_ranks(frontier, ranks).columns
    assert cols == ["host", "url", "priority"]


def test_pagerank_rejects_zero_iterations(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    try:
        pagerank(edges, iterations=0)
    except ValueError:
        return
    raise AssertionError("expected ValueError for iterations=0")


def test_rank_blend_wired_into_crawl(spark, tmp_path):
    """rank_every wiring: after one ranked epoch the committed frontier's
    child rows all carry a strictly higher priority than the unranked
    run's (every discovered child is a dst in the link graph, so its
    PageRank is at least 1-d = 0.15), the link_edges table is persisted,
    and a rerun is byte-identical."""
    from dataclasses import replace

    from frontier_engine import fixtures
    from frontier_engine.crawl import CrawlConfig, run_crawl
    from frontier_engine.frontier import DrainConfig
    from frontier_engine.seen import SeenConfig
    from frontier_engine.snapshot import SnapshotStore

    corpus = fixtures.corpus("mini")
    base = CrawlConfig(
        max_depth=2,
        max_epochs=1,
        drain=DrainConfig(epoch_seconds=3.0),
        seen=SeenConfig(n_buckets=8, bits_per_bucket=1 << 14),
    )
    ranked = replace(base, rank_every=1, rank_iterations=3, rank_weight=1.0)

    whs = {}
    for name, cfg in [("plain", base), ("r1", ranked), ("r2", ranked)]:
        wh = str(tmp_path / name)
        run_crawl(spark, corpus["pages"], corpus["seeds"], corpus["robots"], wh, cfg)
        whs[name] = SnapshotStore(wh)

    edges = whs["r1"].read(spark, "link_edges")
    assert edges is not None and edges.count() > 0
    assert set(edges.columns) == {"src", "dst", "epoch"}

    def frontier_rows(store):
        return {
            r["url"]: (r["priority"], r["depth"])
            for r in store.read(spark, "frontier").collect()
        }

    plain, r1, r2 = (frontier_rows(whs[n]) for n in ("plain", "r1", "r2"))
    assert r1 == r2  # same-parallelism rerun is byte-identical
    assert set(plain) == set(r1)  # one epoch: same drain, same membership
    boosted = 0
    for url, (p0, depth) in plain.items():
        p1 = r1[url][0]
        assert p1 >= p0 - 1e-12, (url, p0, p1)
        if depth > 0:
            # every child is a link target => rank >= 0.15 => boost
            assert p1 > p0 + 0.14, (url, p0, p1)
            boosted += 1
    assert boosted > 0


def _numpy_hits(edges, iterations):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iterations):
        auth = np.zeros(n)
        for u, v in edges:
            auth[idx[v]] += hub[idx[u]]
        s = auth.sum()
        auth = auth / s if s else auth
        hub = np.zeros(n)
        for u, v in edges:
            hub[idx[u]] += auth[idx[v]]
        s = hub.sum()
        hub = hub / s if s else hub
    return {nodes[i]: (hub[i], auth[i]) for i in range(n)}


def test_hits_matches_dense_reference(spark):
    from frontier_engine.graph import hits

    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(edges, iterations=4).collect()
    }
    want = _numpy_hits(EDGES, 4)
    assert set(got) == set(want)
    for node, (h, a) in want.items():
        assert abs(got[node][0] - h) < 1e-9, node
        assert abs(got[node][1] - a) < 1e-9, node
    # structure: 0 links to many good pages -> top hub; dangling 3 has
    # hub 0; orphan-source 4 has auth 0.
    assert got[3][0] == 0.0
    assert got[4][1] == 0.0
    assert got[0][0] == max(h for h, _ in got.values())


def test_hits_duplicate_edges_collapse(spark):
    from frontier_engine.graph import hits

    once = spark.createDataFrame(EDGES, ["src", "dst"])
    dup = spark.createDataFrame(EDGES + EDGES[:3], ["src", "dst"])
    a = sorted(map(tuple, hits(once, 2).collect()))
    b = sorted(map(tuple, hits(dup, 2).collect()))
    assert a == b


def test_link_census_intra_cross_null(spark):
    from frontier_engine.graph import link_census

    edges = spark.createDataFrame(
        [
            ("a", "a"), ("a", "a"), ("a", "b"), ("a", None),
            ("b", "c"),
        ],
        "src_host string, dst_host string",
    )
    got = {r["host"]: r.asDict() for r in link_census(edges).collect()}
    a = got["a"]
    assert (a["n_links"], a["n_intra"], a["n_cross"]) == (4, 2, 2)
    assert a["n_dst_hosts"] == 2  # null dst excluded
    assert abs(a["intra_ratio"] - 0.5) < 1e-15
    b = got["b"]
    assert (b["n_links"], b["n_intra"], b["n_cross"], b["n_dst_hosts"]) == (
        1, 0, 1, 1,
    )


def test_anchor_stats_topk_ties_and_drops(spark):
    from frontier_engine.graph import anchor_stats

    edges = spark.createDataFrame(
        [
            # target t: "beta" x2, "alpha" x2 (tie -> alpha first), "z" x1
            ("s", "t", "beta"), ("s2", "t", "beta"),
            ("s", "t", "alpha"), ("s3", "t", "alpha"),
            ("s", "t", "z"),
            # empty/null anchors dropped entirely
            ("s", "u", ""), ("s", "u", None),
            ("s", "u", "only"),
        ],
        "src string, dst string, anchor string",
    )
    rows = anchor_stats(edges, k=2).collect()
    by_dst = {}
    for r in rows:
        by_dst.setdefault(r["dst"], []).append((r["rank"], r["anchor"], r["n"]))
    assert sorted(by_dst["t"]) == [(1, "alpha", 2), (2, "beta", 2)]
    assert sorted(by_dst["u"]) == [(1, "only", 1)]


def test_resolve_redirects_chains_and_cycles(spark):
    from frontier_engine.graph import resolve_redirects

    edges = [(f"u{i}", f"u{i+1}") for i in range(6)]  # u0→…→u6 (terminal)
    edges += [("c0", "c1"), ("c1", "c0")]             # 2-cycle
    edges += [("s", "s")]                             # self-loop
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["src"]: (r["final"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=32).collect()
    }
    for i in range(6):
        assert got[f"u{i}"] == ("u6", 6 - i, True)
    assert got["c0"] == (None, None, False)
    assert got["c1"] == (None, None, False)
    assert got["s"] == (None, None, False)


def test_resolve_redirects_max_hops_exact(spark):
    from frontier_engine.graph import resolve_redirects

    # chain of length 5: resolved at max_hops=5, unresolved at 4
    edges = [(f"v{i}", f"v{i+1}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    at5 = {r["src"]: r["resolved"] for r in resolve_redirects(df, max_hops=5).collect()}
    at4 = {r["src"]: r["resolved"] for r in resolve_redirects(df, max_hops=4).collect()}
    assert at5["v0"] is True and at4["v0"] is False
    assert at4["v1"] is True  # length-4 tail still resolves
    # max_hops=1 resolves only direct-to-terminal redirects
    at1 = {r["src"]: r["resolved"] for r in resolve_redirects(df, max_hops=1).collect()}
    assert at1 == {"v0": False, "v1": False, "v2": False, "v3": False, "v4": True}


def test_resolve_redirects_rejects_bad_hops(spark):
    import pytest as _pytest

    from frontier_engine.graph import resolve_redirects

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError):
        resolve_redirects(df, max_hops=0)


def test_opic_invariants_and_values(spark):
    from frontier_engine.graph import opic

    # a→b, b→a, a→c; c dangling (pays the virtual root)
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    got = {
        r["node"]: (r["cash"], r["history"])
        for r in opic(df, iterations=4).collect()
    }

    # pure-python twin of the synchronous-batch semantics
    nodes = ["a", "b", "c"]
    out = {"a": ["b", "c"], "b": ["a"]}
    cash = {v: 1 / 3 for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for _ in range(4):
        pot = sum(c for v, c in cash.items() if v not in out)
        new = {v: pot / 3 for v in nodes}
        for u, dsts in out.items():
            for d in dsts:
                new[d] += cash[u] / len(dsts)
        for v in nodes:
            hist[v] += cash[v]
        cash = new
    for v in nodes:
        assert got[v][0] == pytest.approx(cash[v], abs=1e-12)
        assert got[v][1] == pytest.approx(hist[v], abs=1e-12)
    # OPIC invariants: total cash stays 1; banked history grows 1/round
    assert sum(c for c, _ in got.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(h for _, h in got.values()) == pytest.approx(4.0, abs=1e-12)


def test_opic_rejects_bad_iterations(spark):
    import pytest as _pytest

    from frontier_engine.graph import opic

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError):
        opic(df, iterations=0)


def test_reciprocity_counts_and_rate(spark):
    from frontier_engine.graph import reciprocity

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),      # mutual pair
            ("a", "c"),                   # one-way
            ("c", "d"), ("d", "c"),      # mutual pair
            ("a", "a"),                   # self-loop: excluded
            ("a", "b"),                   # duplicate edge: collapsed
            ("e", None),                  # null dst: excluded
        ],
        "src string, dst string",
    )
    got = {
        r["node"]: (r["n_out"], r["n_recip"], r["recip_rate"])
        for r in reciprocity(edges).collect()
    }
    assert got["a"] == (2, 1, 0.5)
    assert got["b"] == (1, 1, 1.0)
    assert got["c"] == (1, 1, 1.0)
    assert got["d"] == (1, 1, 1.0)
    assert "e" not in got  # its only edge had a null dst


def test_reciprocity_pure_sink_absent(spark):
    """A node that only RECEIVES links has no out-edges and no row."""
    from frontier_engine.graph import reciprocity

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["node"] for r in reciprocity(edges).collect()}
    assert got == {"a"}


def test_outlink_entropy_values(spark):
    import math

    from frontier_engine.graph import outlink_entropy

    edges = spark.createDataFrame(
        # farm: 6 edges into 1 dst -> H = 0; organic: 1 edge each to 4 dsts -> H = 2
        [("farm", "x")] * 6 + [("org", d) for d in "abcd"] + [("org", None)],
        "src string, dst string",
    )
    got = {
        r["node"]: (r["n_edges"], r["n_dst"], r["entropy_bits"])
        for r in outlink_entropy(edges).collect()
    }
    assert got["farm"] == (6, 1, pytest.approx(0.0, abs=1e-12))
    assert got["org"][:2] == (4, 4)
    assert got["org"][2] == pytest.approx(2.0, abs=1e-12)
    # skewed: counts [3, 1] -> H = log2(4) - (3*log2(3))/4
    edges2 = spark.createDataFrame(
        [("s", "a")] * 3 + [("s", "b")], "src string, dst string"
    )
    (r2,) = outlink_entropy(edges2).collect()
    assert r2["entropy_bits"] == pytest.approx(2 - 3 * math.log2(3) / 4, abs=1e-12)


# ------------------------------------------------- BFS / harmonic / HyperBall


def _py_bfs(edges, seeds, max_depth):
    """Independent python BFS: {node: depth} within max_depth."""
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for k in range(1, max_depth + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = k
                    nxt.add(v)
        if not nxt:
            break
        frontier = nxt
    return dist


def test_bfs_depth_matches_python(spark):
    from frontier_engine.graph import bfs_depth

    # deterministic pseudo-random graph with a cycle and a far tail
    edges = [((i * 7) % 23, (i * 13 + 5) % 23) for i in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (1,)], ["node"])
    got = {r["node"]: r["depth"] for r in bfs_depth(e, seeds, max_depth=8).collect()}
    want = _py_bfs(edges, [0, 1], 8)
    assert got == want


def test_bfs_depth_unreachable_and_seed_zero(spark):
    from frontier_engine.graph import bfs_depth

    e = spark.createDataFrame([(1, 2), (2, 3), (9, 9), (5, 6)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["depth"] for r in bfs_depth(e, seeds, max_depth=8).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # 5,6,9 unreachable -> absent


def test_bfs_depth_cap_exact(spark):
    from frontier_engine.graph import bfs_depth

    chain = [(i, i + 1) for i in range(6)]
    e = spark.createDataFrame(chain, ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["depth"] for r in bfs_depth(e, seeds, max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_harmonic_matches_python(spark):
    from frontier_engine.graph import harmonic_centrality

    edges = [((i * 7) % 17, (i * 11 + 3) % 17) for i in range(40)]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: (r["n_reach"], r["harmonic"])
        for r in harmonic_centrality(e, max_depth=8).collect()
    }
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    want = {}
    for v in nodes:
        n_reach, h = 0, 0.0
        for u in nodes:
            d = _py_bfs(edges, [u], 8).get(v)
            if u != v and d is not None:
                n_reach += 1
                h += 1.0 / d
        if n_reach:
            want[v] = (n_reach, h)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0]
        assert got[v][1] == pytest.approx(want[v][1], rel=1e-9)


def test_hyperball_monotone_deterministic_and_accurate(spark):
    from frontier_engine.graph import hyperball

    edges = [((i * 7) % 29, (i * 13 + 5) % 29) for i in range(80)]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, ["src", "dst"])
    balls = hyperball(e, p=6, max_depth=5).collect()
    # monotone: register-wise max only grows, so est never shrinks
    by_node: dict = {}
    for r in balls:
        by_node.setdefault(r["node"], []).append((r["radius"], r["est"]))
    for seq in by_node.values():
        seq.sort()
        ests = [x for _, x in seq]
        assert ests == sorted(ests)
    # deterministic across partitioning: md5-exact registers
    again = hyperball(e.repartition(7), p=6, max_depth=5).collect()
    key = lambda r: (r["node"], r["radius"])  # noqa: E731
    assert sorted(((r["node"], r["radius"], r["v_zero"], r["s_scaled"]) for r in balls)) == sorted(
        ((r["node"], r["radius"], r["v_zero"], r["s_scaled"]) for r in again)
    )
    # accuracy: final ball estimate within HLL tolerance of the exact
    # in-ball size (p=6 -> sigma ~13%; allow 40% on a 29-node graph)
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    for v in nodes:
        exact = 1 + sum(
            1
            for u in nodes
            if u != v and _py_bfs(edges, [u], 5).get(v) is not None
        )
        est = max(x for _, x in by_node[v])
        assert abs(est - exact) / exact < 0.40, (v, est, exact)


def test_hyperball_harmonic_tracks_exact(spark):
    from frontier_engine.graph import (
        harmonic_centrality,
        hyperball,
        hyperball_harmonic,
    )

    edges = [((i * 5) % 19, (i * 11 + 2) % 19) for i in range(50)]
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, ["src", "dst"])
    exact = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(e, max_depth=6).collect()
    }
    est = {
        r["node"]: r["harmonic_est"]
        for r in hyperball_harmonic(hyperball(e, p=8, max_depth=6)).collect()
    }
    # every exactly-central node gets an estimate in the right ballpark;
    # tolerance is relative-or-absolute: on tiny balls a single reg+rank
    # collision legitimately offsets the estimate by ~1 element
    for v, h in exact.items():
        assert v in est
        assert abs(est[v] - h) < max(0.40 * h, 1.2), (v, est[v], h)


def test_hyperball_rejects_bad_p(spark):
    from frontier_engine.graph import hyperball

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        hyperball(e, p=3)


def test_label_propagation_two_cliques(spark):
    # Two 4-cliques joined by a single bridge: LPA must give each clique
    # one label and keep the two cliques in different communities.
    def clique(names):
        import itertools
        return list(itertools.combinations(names, 2))

    edges = clique("abcd") + clique("wxyz") + [("d", "w")]
    df = spark.createDataFrame(edges, "src string, dst string")
    from frontier_engine.graph import label_propagation

    got = {r["node"]: r["label"] for r in label_propagation(df, rounds=3).collect()}
    left = {got[n] for n in "abcd"}
    right = {got[n] for n in "wxyz"}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_label_propagation_zero_rounds_identity(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    from frontier_engine.graph import label_propagation

    got = {r["node"]: r["label"] for r in label_propagation(df, rounds=0).collect()}
    assert got == {"a": "a", "b": "b", "c": "c"}


def test_label_propagation_deterministic_across_parallelism(spark):
    import itertools
    edges = [
        (f"h{i}", f"h{j}")
        for i, j in itertools.combinations(range(12), 2)
        if (i * 7 + j) % 3 == 0
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    from frontier_engine.graph import label_propagation

    a = sorted(map(tuple, label_propagation(df.repartition(1), rounds=3).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(16), rounds=3).collect()))
    assert a == b


def _peel_coreness(edges):
    """Python reference: textbook min-degree peeling."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    core = {}
    live = {n: set(v) for n, v in adj.items()}
    k = 0
    while live:
        k_min = min(len(v) for v in live.values())
        k = max(k, k_min)
        peel = [n for n, v in live.items() if len(v) <= k]
        for n in peel:
            core[n] = k
            for m in live[n]:
                live[m].discard(n)
            del live[n]
    return core


def test_coreness_clique_with_tail(spark):
    import itertools
    edges = list(itertools.combinations("abcde", 2)) + [("e", "t1"), ("t1", "t2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    from frontier_engine.graph import coreness

    got = {r["node"]: r["core"] for r in coreness(df, rounds=8).collect()}
    assert got == _peel_coreness(edges)
    assert got["a"] == 4 and got["t2"] == 1


def test_coreness_converges_and_matches_peeling(spark):
    import random
    rng = random.Random(3)
    edges = list({(f"h{rng.randrange(18)}", f"h{rng.randrange(18)}") for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    from frontier_engine.graph import coreness

    a = sorted(map(tuple, coreness(df, rounds=6).collect()))
    b = sorted(map(tuple, coreness(df, rounds=12).collect()))
    assert a == b  # fixpoint reached well before 6 sweeps
    assert dict(a) == _peel_coreness(edges)  # and it IS the coreness


def _brute_triangles(edges):
    import itertools
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    count = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            count[x] += 1
            count[y] += 1
            count[z] += 1
    return {n: (len(adj[n]), count[n]) for n in adj}


def test_triangle_counts_vs_brute_force(spark):
    import random
    rng = random.Random(9)
    edges = list({(f"h{rng.randrange(15)}", f"h{rng.randrange(15)}") for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    from frontier_engine.graph import triangle_counts

    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in triangle_counts(df).collect()
    }
    want = _brute_triangles(edges)
    assert set(got) == set(want)
    for n, (d, t) in want.items():
        cc = (2 * t) / (d * (d - 1)) if d >= 2 else None
        assert got[n] == (d, t, cc), (n, got[n], (d, t, cc))


def test_triangle_counts_hub_skew_orientation(spark):
    # A star (hub degree 20, zero triangles) + one triangle hanging off:
    # the orientation must keep the hub's out-degree tiny and counts exact.
    edges = [("hub", f"s{i}") for i in range(20)] + [("s0", "s1"), ("hub", "s0"), ("hub", "s1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    from frontier_engine.graph import triangle_counts

    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got["hub"] == 1 and got["s0"] == 1 and got["s1"] == 1
    assert got["s5"] == 0


def _tarjan_scc(edges):
    from collections import defaultdict

    adj = defaultdict(list)
    nodes = set()
    for a, b in edges:
        if a != b:
            adj[a].append(b)
            nodes.update((a, b))
    index, low, onstk, stk, out = {}, {}, set(), [], []
    counter = [0]

    def strong(v):
        # iterative Tarjan to dodge recursion limits
        work = [(v, 0)]
        while work:
            n, i = work.pop()
            if i == 0:
                index[n] = low[n] = counter[0]
                counter[0] += 1
                stk.append(n)
                onstk.add(n)
            recurse = False
            for j in range(i, len(adj[n])):
                w = adj[n][j]
                if w not in index:
                    work.append((n, j + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in onstk:
                    low[n] = min(low[n], index[w])
            if recurse:
                continue
            if low[n] == index[n]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == n:
                        break
                out.append(comp)
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[n])
        return out

    for v in sorted(nodes):
        if v not in index:
            strong(v)
    return {n: min(comp) for comp in out for n in comp}


def test_scc_vs_tarjan_random(spark):
    import random

    from frontier_engine.graph import scc

    rng = random.Random(17)
    edges = sorted({(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["scc_id"] for r in scc(df).collect()}
    assert got == _tarjan_scc(edges)


def test_scc_ascending_chain_of_cycles(spark):
    # condensation is an ascending-id chain — the adversarial case for
    # coloring (each phase settles only the lowest remaining SCC)
    from frontier_engine.graph import scc

    edges = []
    for k in range(4):
        a, b = f"c{2 * k}", f"c{2 * k + 1}"
        edges += [(a, b), (b, a)]
        if k:
            edges.append((f"c{2 * k - 1}", a))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["scc_id"] for r in scc(df).collect()}
    assert got == _tarjan_scc(edges)


def test_bowtie_regions(spark):
    from frontier_engine.graph import bowtie

    # CORE = {a,b,c} cycle; IN = i1->i2->a; OUT = c->o1->o2;
    # TUBE = i2->t->o1 (bypasses core); TENDRIL = i1->td (off IN),
    # tu->o2 (into OUT); DISC = {x,y} its own 2-cycle island.
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("i1", "i2"), ("i2", "a"),
        ("c", "o1"), ("o1", "o2"),
        ("i2", "t"), ("t", "o1"),
        ("i1", "td"),
        ("tu", "o2"),
        ("x", "y"), ("y", "x"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["region"] for r in bowtie(df).collect()}
    want = {
        "a": "CORE", "b": "CORE", "c": "CORE",
        "i1": "IN", "i2": "IN",
        "o1": "OUT", "o2": "OUT",
        "t": "TUBE", "td": "TENDRIL", "tu": "TENDRIL",
        "x": "DISC", "y": "DISC",
    }
    assert got == want


def test_cocitation_vs_brute(spark):
    import itertools
    import random
    from collections import defaultdict

    from frontier_engine.graph import cocitation

    rng = random.Random(23)
    edges = sorted({(f"u{rng.randrange(12)}", f"d{rng.randrange(9)}") for _ in range(50)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in cocitation(df, min_common=1).collect()
    }
    cites = defaultdict(set)
    for u, d in edges:
        cites[d].add(u)
    want = {}
    for a, b in itertools.combinations(sorted(cites), 2):
        c = len(cites[a] & cites[b])
        if c >= 1:
            want[(a, b)] = (c, c / len(cites[a] | cites[b]))
    assert got == want


def test_cocitation_max_fanout_drops_hub(spark):
    from frontier_engine.graph import cocitation

    edges = [("hub", f"d{i}") for i in range(10)] + [("u1", "d0"), ("u1", "d1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = cocitation(df, min_common=1, max_fanout=5).collect()
    # the hub's 45 pairs are gone; only u1's wedge survives, and the
    # neighbor sets (degrees) are computed on the capped graph
    assert [(r["a"], r["b"], r["n_common"], r["jaccard"]) for r in rows] == [
        ("d0", "d1", 1, 1.0)
    ]


def test_cocitation_coupling_mode(spark):
    from frontier_engine.graph import cocitation

    edges = [("a", "t1"), ("a", "t2"), ("b", "t1"), ("b", "t2"), ("c", "t2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = cocitation(df, by="cited", min_common=2).collect()
    assert [(r["a"], r["b"], r["n_common"]) for r in rows] == [("a", "b", 2)]


def test_salsa_vs_reference_impl(spark):
    import random
    from collections import defaultdict

    from frontier_engine.graph import salsa

    rng = random.Random(31)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src int, dst int")

    out_n = defaultdict(list)
    in_n = defaultdict(list)
    nodes = set()
    for a, b in edges:
        out_n[a].append(b)
        in_n[b].append(a)
        nodes.update((a, b))
    hub = {n: 1.0 for n in nodes}
    for _ in range(5):
        a_raw = {
            n: sum(hub[u] / len(out_n[u]) for u in in_n[n]) for n in nodes
        }
        s = sum(a_raw.values())
        auth = {n: (v / s if s else 0.0) for n, v in a_raw.items()}
        h_raw = {
            n: sum(auth[v] / len(in_n[v]) for v in out_n[n]) for n in nodes
        }
        s = sum(h_raw.values())
        hub = {n: (v / s if s else 0.0) for n, v in h_raw.items()}
    got = {r["node"]: (r["hub"], r["auth"]) for r in salsa(df, 5).collect()}
    assert set(got) == nodes
    for n in nodes:
        assert abs(got[n][0] - hub[n]) < 1e-9, n
        assert abs(got[n][1] - auth[n]) < 1e-9, n


def test_salsa_demotes_tightly_knit_farm(spark):
    from frontier_engine.graph import salsa, hits

    # a 4-page complete link farm vs an organic authority cited by many
    # independent hubs: SALSA's degree division keeps the organic page
    # on top of the authority ranking.
    farm = [(f"f{i}", f"f{j}") for i in range(4) for j in range(4) if i != j]
    organic = [(f"u{i}", "star") for i in range(6)]
    df = spark.createDataFrame(farm + organic, "src string, dst string")
    a = {r["node"]: r["auth"] for r in salsa(df, 8).collect()}
    assert a["star"] > max(a[f"f{i}"] for i in range(4))


def test_gap_bits_census_hand_computed(spark):
    from frontier_engine.graph import gap_bits_census

    # node a -> {0, 1, 5, 13}: gaps 1,1,4,8 -> γ lens 1,1,5,7 = 14 bits
    # node b -> {7}: gap 8 -> γ len 7
    edges = [("a", 5), ("a", 0), ("a", 13), ("a", 1), ("a", 5), ("b", 7)]
    df = spark.createDataFrame(edges, "src string, dst long")
    got = {r["src"]: tuple(r)[1:] for r in gap_bits_census(df).collect()}
    assert got["a"] == (4, 14, 256, 14 / 256)
    assert got["b"] == (1, 7, 64, 7 / 64)


def test_gap_bits_census_locality_compresses(spark):
    from frontier_engine.graph import gap_bits_census

    local = [("loc", i) for i in range(100, 164)]          # dense run: gaps of 1
    spread = [("spr", i * 1_000_003) for i in range(1, 65)]  # far-flung ids
    df = spark.createDataFrame(local + spread, "src string, dst long")
    got = {r["src"]: r["gamma_bits"] for r in gap_bits_census(df).collect()}
    assert got["loc"] < got["spr"] / 5


def test_assortativity_exact_moments(spark):
    import math
    from collections import Counter
    import random

    from frontier_engine.graph import assortativity

    rng = random.Random(3)
    edges = sorted({(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}") for _ in range(40)})
    df = spark.createDataFrame(edges, "src string, dst string")
    od = Counter(a for a, _ in edges)
    idg = Counter(b for _, b in edges)
    xs = [od[a] for a, b in edges]
    ys = [idg[b] for a, b in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    r = (n * sxy - sx * sy) / math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    row = assortativity(df).collect()[0]
    assert tuple(row) == (n, sx, sy, sxy, sxx, syy, r)


def test_assortativity_star_is_disassortative(spark):
    from frontier_engine.graph import assortativity

    # star hub -> leaves plus one leaf->leaf edge: hub (high out-deg)
    # feeds in-degree-1 leaves -> strongly negative r... but x is
    # constant on hub edges; the mixed edge makes variance nonzero.
    edges = [("hub", f"l{i}") for i in range(8)] + [("l0", "l1"), ("l1", "l0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = assortativity(df).collect()[0]["r"]
    assert r is not None and r < 0


def test_spam_mass_farm_boostee_has_full_untrusted_mass(spark):
    """A node reachable ONLY from outside the trusted seed's reach gets
    rel_mass == 1 (no trust arrives); the seed's own neighborhood gets
    rel_mass well below 1."""
    from frontier_engine.graph import spam_mass

    # trusted chain 0 -> 1; farm 2,4,5 -> 3 with no path from 0
    edges = spark.createDataFrame(
        [(0, 1), (2, 3), (4, 3), (5, 3)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(0,)], "node int")
    out = {r["node"]: r for r in spam_mass(edges, seeds).collect()}
    assert out[3]["trust"] == 0.0
    assert out[3]["rel_mass"] == 1.0
    # the seed itself holds teleport trust 1/|S| scaled by N=6 nodes:
    # its rank is fully vouched for (rel_mass <= 0)
    assert out[0]["rel_mass"] <= 0.0
    # trust flows 0 -> 1, so 1 is partially vouched
    assert out[1]["rel_mass"] < 1.0
    # absolute mass is the rounded difference of the rounded factors
    for r in out.values():
        assert r["spam_mass"] == pytest.approx(
            r["rank"] - r["trust"] * 6.0, abs=1e-6
        )


def test_spam_mass_matches_factor_queries(spark):
    """spam_mass's rank/trust columns equal standalone pagerank/trustrank
    (both rounded to 6) on the same graph — the composition adds no
    arithmetic drift."""
    from frontier_engine.graph import spam_mass, trustrank

    edges = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 7) for i in range(30) if i % 7 != (i * 3 + 1) % 7],
        "src int, dst int",
    )
    seeds = spark.createDataFrame([(0,), (3,)], "node int")
    sm = {r["node"]: r for r in spam_mass(edges, seeds).collect()}
    pr = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    tr = {r["node"]: r["trust"] for r in trustrank(edges, seeds).collect()}
    assert set(sm) == set(pr) == set(tr)
    for n, r in sm.items():
        assert r["rank"] == round(pr[n], 6)
        assert r["trust"] == round(tr[n], 6)
