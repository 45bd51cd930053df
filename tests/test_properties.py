"""Hypothesis property tests (SURVEY.md §5.2.5): canonicalization,
seen-set exact-set semantics, politeness invariants."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from frontier_engine.canon import canonicalize_py, host_of_py, path_of_py

url_like = st.one_of(
    st.builds(
        lambda pad_l, scheme, host, port, path, frag, pad_r: f"{pad_l}{scheme}://{host}{port}{path}{frag}{pad_r}",
        st.sampled_from(["", " ", "\t", "\n", "\r\n", "\x0b\f", " ", "  \t"]),
        st.sampled_from(["http", "https", "HTTP", "Https", "HTTPS"]),
        st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.\-]{0,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,10}){0,4}(\?[a-z0-9=&]{0,12})?", fullmatch=True),
        st.sampled_from(["", "#frag", "#", "#a#b"]),
        st.sampled_from(["", " ", "\t", "\n", " ", "\t  "]),
    ),
    st.text(max_size=40),
)


@given(url_like)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize_py(u)
    assert canonicalize_py(c) == c


@given(url_like)
@settings(max_examples=300, deadline=None)
def test_canonical_has_no_fragment_and_lower_host(u):
    c = canonicalize_py(u)
    assert "#" not in c
    h = host_of_py(c)
    if h:
        assert h == h.lower()
        assert not h.endswith((":80", ":443")) or ":" not in h
        # path extraction never includes the query string
        assert "?" not in path_of_py(c)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_probe_math_no_false_negatives(hashes):
    """Pure-numpy tier-1 math: everything inserted must test positive."""
    import numpy as np

    from frontier_engine.seen import SeenConfig, _bitmap_set, _bitmap_test, _probe_positions

    cfg = SeenConfig(n_buckets=1, bits_per_bucket=1 << 12, k=4)
    if not hashes:
        return
    arr = np.array(hashes, dtype=np.int64).view(np.uint64)
    bitmap = np.zeros(cfg.bits_per_bucket // 8, dtype=np.uint8)
    pos = _probe_positions(arr, cfg)
    _bitmap_set(bitmap, pos)
    assert _bitmap_test(bitmap, pos).all()


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=10, allow_nan=False),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=100, deadline=None)
def test_python_drain_selection_matches_sort(rows, budget):
    """The drain's numpy top-k (with URL tie-resolution) must equal a plain
    sort-then-head — same algorithm the oracle uses."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "priority": [r[0] for r in rows],
            "enqueue_seq": [r[1] for r in rows],
            "url": [f"https://h.example/p{r[2]}" for r in rows],
        }
    )
    pdf["url_hash"] = pdf["url"].map(hash)
    pdf["budget"] = budget
    pdf = pdf.drop_duplicates(subset=["url"]).reset_index(drop=True)

    # reference selection: full sort then head
    want = (
        pdf.sort_values(["priority", "enqueue_seq", "url"], ascending=[False, True, True])
        .head(budget)["url_hash"]
        .tolist()
    )

    # engine selection (mirror of frontier.drain.take_topk)
    b, n = budget, len(pdf)
    if n <= b:
        got = pdf["url_hash"].tolist()
    else:
        p = pdf["priority"].to_numpy()
        s = pdf["enqueue_seq"].to_numpy()
        order = np.lexsort((s, -p))
        pb, sb = p[order[b - 1]], s[order[b - 1]]
        strictly = (p > pb) | ((p == pb) & (s < sb))
        need = b - int(strictly.sum())
        tie = np.flatnonzero((p == pb) & (s == sb))
        if len(tie) > need:
            urls = pdf["url"].to_numpy()[tie]
            tie = tie[np.argsort(urls, kind="stable")[:need]]
        got = pdf.iloc[np.concatenate([np.flatnonzero(strictly), tie])]["url_hash"].tolist()

    assert sorted(got) == sorted(want)


@given(st.text(max_size=400), st.sampled_from(["*", "frontierbot", "GoogleBot", ""]))
@settings(max_examples=300, deadline=None)
def test_robots_parser_total(body, agent):
    """parse_robots_txt is a total function: any text parses to
    (None|float, list[str], list[str]) without raising."""
    from frontier_engine.robots import parse_robots_txt

    delay, allow, dis = parse_robots_txt(body, agent)
    assert delay is None or isinstance(delay, float)
    assert isinstance(dis, list) and all(isinstance(d, str) for d in dis)
    assert isinstance(allow, list) and all(isinstance(a, str) for a in allow)


@given(
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    """BMP encode→decode is lossless for any dims (incl. odd row padding)."""
    import numpy as np

    from frontier_engine import multimodal as MM

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    kind, ww, hh, body = MM._decode(MM.encode_bmp(px))
    assert (kind, ww, hh) == ("image", w, h)
    assert np.array_equal(body.reshape(h, w, 3), px)


@given(
    st.integers(min_value=1, max_value=64),
    st.sampled_from([1, 2]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, channels, seed):
    import numpy as np

    from frontier_engine import multimodal as MM

    rng = np.random.RandomState(seed)
    samples = rng.randint(-(2**15), 2**15, size=n * channels, dtype=np.int16)
    kind, ch, bits, body = MM._decode(MM.encode_wav(samples, 8000, channels))
    assert (kind, ch, bits) == ("audio", channels, 16)
    assert np.array_equal(np.frombuffer(body.tobytes(), dtype="<i2"), samples)
