"""Round-4 retrieval/observability operators: BM25 ranked retrieval,
magic-byte MIME sniffing, char-entropy gibberish scoring, degree
histograms, vocabulary-coverage/OOV census — each against an independent
Python brute-force reference."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from frontier_engine import codecs
from frontier_engine.graph import degree_hist
from frontier_engine.index import bm25, tf_postings
from frontier_engine.multimodal import sniff_mime_col, sniff_mime_py
from frontier_engine.textops import char_entropy, vocab_coverage, vocab_topk

DOCS = [
    (0, "hash join hash join filter"),
    (1, "filter scan scan scan scan scan"),
    (2, "sort merge sort merge window"),
    (3, "query query hash"),
    (4, "the quick brown fox"),
]


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    tf = {i: Counter(t.lower().split()) for i, t in docs}
    dls = {i: sum(c.values()) for i, c in tf.items()}
    n = float(len(docs))
    avgdl = sum(dls.values()) / n
    out = {}
    for term in terms:
        df = float(sum(1 for c in tf.values() if term in c))
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, c in tf.items():
            if term not in c:
                continue
            t = c[term]
            contrib = idf * (t * (k1 + 1.0)) / (
                t + k1 * (1.0 - b + b * dls[i] / avgdl)
            )
            nt, sc = out.get(i, (0, 0.0))
            out[i] = (nt + 1, sc + contrib)
    return out


class TestBM25:
    def test_matches_brute_force(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_terms"], round(r["score"], 9))
            for r in bm25(tf_postings(df, n=1), ["hash", "scan"]).collect()
        }
        want = {
            i: (nt, round(sc, 9))
            for i, (nt, sc) in _bm25_ref(DOCS, ["hash", "scan"]).items()
        }
        assert got == want
        # doc 0 mentions 'hash' twice and is short; doc 3 once — tf ordering
        assert got[0][1] > got[3][1]

    def test_no_match_docs_absent(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        rows = bm25(tf_postings(df, n=1), ["zzz"]).collect()
        assert rows == []


class TestMimeSniff:
    def test_real_codec_bytes(self, spark):
        # real encoder output from the codec modules, not synthetic prefixes
        import numpy as np

        from frontier_engine import multimodal as MM

        rgb = np.zeros((2, 2, 3), dtype=np.uint8)
        png = codecs.encode_png(rgb)
        bmp = MM.encode_bmp(rgb)
        wav = MM.encode_wav(np.zeros(8, dtype=np.int16))
        gif = codecs.encode_gif(rgb)
        jpg = codecs.encode_jpeg(rgb)
        cases = [
            (0, png, "image/png"),
            (1, bmp, "image/bmp"),
            (2, wav, "audio/x-wav"),
            (3, gif, "image/gif"),
            (4, jpg, "image/jpeg"),
            (5, b"%PDF-1.4 junk", "application/pdf"),
            (6, b"\x1f\x8b\x08rest", "application/gzip"),
            (7, b"PK\x03\x04zipdata", "application/zip"),
            (8, b"<!DOCTYPE html><p>x</p>", "text/html"),
            (9, b"<html><body>y</body>", "text/html"),
            (10, b"\x00\x00\x00\x18ftypisomrest", "video/mp4"),
            (11, b"RIFF\x04\x00\x00\x00AVI LIST", "video/x-msvideo"),
            (12, b"plain words only", "application/octet-stream"),
            (13, b"RIFFxxxxJUNK", "application/octet-stream"),
            (14, b"", "application/octet-stream"),
            (15, None, "application/octet-stream"),
        ]
        df = spark.createDataFrame(
            [(i, p) for i, p, _ in cases], "i long, payload binary"
        )
        got = {
            r["i"]: r["mime"]
            for r in df.select(
                "i", sniff_mime_col(F.col("payload")).alias("mime")
            ).collect()
        }
        for i, p, want in cases:
            assert got[i] == want, (i, got[i], want)
            # python twin parity
            assert sniff_mime_py(p) == want, (i, p)


class TestCharEntropy:
    @pytest.mark.parametrize(
        "text",
        ["aaaa", "abab", "abcd", "hello wörld — ünïcode ✓", "", "x"],
    )
    def test_matches_counter(self, spark, text):
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        row = char_entropy(df).collect()[0]
        cnt = Counter(text)
        n = sum(cnt.values())
        want_h = 0.0
        if n:
            want_h = math.log2(n) - sum(
                c * math.log2(c) for _, c in sorted(cnt.items())
            ) / n
        assert row["n_chars"] == n
        assert row["n_distinct_chars"] == len(cnt)
        assert row["entropy_bits"] == pytest.approx(want_h, abs=1e-12)

    def test_uniform_is_log2(self, spark):
        df = spark.createDataFrame(
            [(0, "abcdefgh")], "doc_id long, text string"
        )
        row = char_entropy(df).collect()[0]
        assert row["entropy_bits"] == pytest.approx(3.0, abs=1e-12)


class TestDegreeHist:
    def test_small_graph(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", None)],
            "src string, dst string",
        )
        got = {
            (r["direction"], r["bucket"]): r["n_nodes"]
            for r in degree_hist(edges).collect()
        }
        # out: a=3 (bucket 1), b=1 (0), c=1 (0); in: b=1, c=2, d=1
        assert got == {
            ("out", 1): 1,
            ("out", 0): 2,
            ("in", 1): 1,
            ("in", 0): 2,
        }


class TestVocabCoverage:
    def test_topk_and_oov(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        vocab = {r["token"] for r in vocab_topk(df, 3).collect()}
        # counts: scan=5, hash=3, then a 2-way tie band (filter/join/merge/
        # query/sort all =2) broken by token ASC -> filter wins the 3rd slot
        assert vocab == {"scan", "hash", "filter"}
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
            for r in vocab_coverage(df, vocab_size=3).collect()
        }
        assert got[0] == (5, 2, pytest.approx(2 / 5))  # join x2 OOV
        assert got[4] == (4, 4, 1.0)  # fully out-of-vocabulary
        for i, text in DOCS:
            toks = text.lower().split()
            oov = sum(1 for t in toks if t not in vocab)
            assert got[i] == (len(toks), oov, pytest.approx(oov / len(toks)))


class TestBpeApply:
    MERGES = [("a", "b"), ("ab", "c"), ("x", "x")]

    def test_reference_semantics(self):
        from frontier_engine.textops import bpe_encode_word

        assert bpe_encode_word("abc", self.MERGES) == ["abc"]
        # cascade requires rank order: a+b first, then ab+c
        assert bpe_encode_word("abcabc", self.MERGES) == ["abc", "abc"]
        # non-overlapping left-to-right: xxx -> [xx, x], xxxx -> [xx, xx]
        assert bpe_encode_word("xxx", self.MERGES) == ["xx", "x"]
        assert bpe_encode_word("xxxx", self.MERGES) == ["xx", "xx"]
        # merge never fires across a prior merge's output boundary
        assert bpe_encode_word("acb", self.MERGES) == ["a", "c", "b"]
        assert bpe_encode_word("", self.MERGES) == []

    def test_token_counts(self, spark):
        from frontier_engine.textops import bpe_encode_word, bpe_token_counts

        docs = [(0, "abc xxx abc"), (1, "zzz"), (2, "ab AB xXxX")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_token_counts(df, self.MERGES).collect()
        }
        for i, text in docs:
            words = text.lower().split()
            want = sum(len(bpe_encode_word(w, self.MERGES)) for w in words)
            assert got[i] == (len(words), want), (i, got[i])
        assert got[0] == (3, 4)  # abc=1, xxx=2, abc=1
        assert got[2] == (3, 4)  # lowercased: ab=1, ab=1, xxxx->[xx,xx]=2


class TestBpeTrain:
    @staticmethod
    def _ref_train(texts, n_merges, min_count):
        """Pure-Python Sennrich et al. (2016) trainer: overlap-counted
        pair statistics, greedy left-to-right non-overlapping merge
        application, (count DESC, lhs, rhs) tie-break."""
        import collections

        vocab = collections.Counter(
            w for t in texts for w in t.lower().split() if len(w) >= 2
        )
        segs = {w: list(w) for w in vocab}
        merges = []
        for rank in range(1, n_merges + 1):
            counts = collections.Counter()
            for w, f in vocab.items():
                s = segs[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] += f
            counts = {p: c for p, c in counts.items() if c >= min_count}
            if not counts:
                break
            (l, r), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, l, r, c))
            for w, s in segs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                segs[w] = out
        return merges

    def test_matches_sennrich_reference(self, spark):
        from frontier_engine.textops import bpe_train

        # pathological fixture: self-overlapping runs (aaaaaa), period-2
        # repeats (ababab), chained merges (ba+na -> bana+na), shared
        # prefixes (low/lower/lowest) and a merge whose lhs==rhs (a,a)
        texts = [
            "aaaaaa ababab banana bandana",
            "banana banana low lower lowest",
            "aaaaaa newest widest low low",
            "ababab ababab banana",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [tuple(r) for r in bpe_train(df, n_merges=8, min_count=2).collect()]
        assert got == self._ref_train(texts, 8, 2)
        # chained merges actually happened (multi-char lhs)
        assert any(len(l) > 1 for _, l, _, _ in got)

    def test_early_stop_and_checkpoint(self, spark):
        from frontier_engine.textops import bpe_train

        texts = ["ab ab cd", "ab xy"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        # only (a,b) reaches min_count=3; loop must stop after 1 merge
        got = [tuple(r) for r in bpe_train(df, 10, min_count=3).collect()]
        assert got == [(1, "a", "b", 3)]
        # checkpoint_every=1 exercises the lineage cut without changing output
        got2 = [
            tuple(r)
            for r in bpe_train(df, 3, min_count=2, checkpoint_every=1).collect()
        ]
        assert got2 == self._ref_train(texts, 3, 2)

    def test_random_corpora_match_reference(self, spark):
        """Property check over a 3-letter alphabet (maximizes merge
        collisions/overlaps per corpus): engine == pure-Python Sennrich
        on randomized small corpora, including the learned-merge ORDER."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from frontier_engine.textops import bpe_train

        word = st.text(alphabet="abc", min_size=2, max_size=6)
        corpus = st.lists(
            st.lists(word, min_size=1, max_size=6).map(" ".join),
            min_size=1,
            max_size=5,
        )

        @given(corpus)
        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        def check(texts):
            df = spark.createDataFrame([(t,) for t in texts], "text string")
            got = [
                tuple(r) for r in bpe_train(df, 4, min_count=2).collect()
            ]
            assert got == self._ref_train(texts, 4, 2)

        check()


class TestGopherGate:
    def _run(self, spark, text):
        from frontier_engine.textops import gopher_gate

        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return gopher_gate(df).collect()[0]

    def test_good_doc_keeps(self, spark):
        text = "the quick brown fox jumps over that lazy dog with vigor and grace to be seen " * 5
        r = self._run(spark, text)
        assert r["n_words"] == 80 and r["keep"] is True
        assert 3.0 <= r["mean_word_len"] <= 10.0
        assert r["n_stopwords"] == 30  # (the, that, with, and, to, be) x5

    def test_short_doc_drops(self, spark):
        r = self._run(spark, "the cat sat with that dog")
        assert r["keep"] is False and r["n_words"] == 6

    def test_symbol_ratio(self, spark):
        base = "the word and that word with more words to be " * 6  # 60 words
        r = self._run(spark, base + "# # # # # #")  # 66 words, 6 hashes
        assert r["symbol_ratio"] == pytest.approx(6 / 66)
        assert r["keep"] is True  # 6/66 < 0.1
        r2 = self._run(spark, base + "# " * 8)  # 68 words, 8 hashes
        assert r2["keep"] is False  # 8/68 > 0.1

    def test_bullet_and_ellipsis_lines(self, spark):
        word_line = "the fox and that dog with more to be said here now"
        bullets = "\n".join(["- item"] * 19 + [word_line])
        r = self._run(spark, bullets)
        assert r["bullet_frac"] == pytest.approx(19 / 20)
        assert r["keep"] is False
        ell = "\n".join([word_line + " ..."] * 2 + [word_line] * 3)
        r2 = self._run(spark, ell)
        assert r2["ellipsis_line_frac"] == pytest.approx(2 / 5)
        assert r2["keep"] is False

    def test_alpha_fraction(self, spark):
        words = "the fox and that dog with stuff to be said " * 5  # 50 words
        nums = "1 2 3 4 5 6 7 8 9 10 11 12 13"  # 13 pure-number words
        r = self._run(spark, words + nums)
        assert r["alpha_word_frac"] == pytest.approx(50 / 63)
        assert r["keep"] is False  # 50/63 < 0.8


class TestSelectSurvivors:
    def test_argmax_and_ties(self, spark):
        from frontier_engine.textops import connected_components, select_survivors

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        quality = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.7), (10, 0.4), (11, 0.4)],
            "doc_id long, quality double",
        )
        comp = connected_components(pairs)
        got = {
            r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in select_survivors(comp, quality).collect()
        }
        # cluster {1,2,3}: doc 2 wins on quality; cluster {10,11}: quality
        # tie -> min doc_id (10) wins
        assert got[2] == (1, True) and got[1][1] is False and got[3][1] is False
        assert got[10] == (10, True) and got[11] == (10, False)
        assert sum(1 for _, k in got.values() if k) == 2


class TestContainment:
    def test_quote_detected_asymmetric(self, spark):
        from frontier_engine.textops import containment_pairs

        quote = "the exact phrase that gets quoted verbatim in a wrapper page"
        wrapper = (
            "completely different framing text around a citation block "
            + quote
            + " followed by yet more unrelated wrapper prose and comments "
            + "stretching the host document far beyond the quoted span size"
        )
        other = "an unrelated document about something else entirely here"
        df = spark.createDataFrame(
            [(1, quote), (2, wrapper), (3, other)], "doc_id long, text string"
        )
        rows = containment_pairs(df, min_overlap=1, min_containment=0.5).collect()
        got = {(r["id_a"], r["id_b"]): r for r in rows}
        assert (1, 2) in got and len(got) == 1
        r = got[(1, 2)]
        # the quote is (nearly) fully contained in the wrapper, but the
        # wrapper is NOT contained in the quote — the asymmetry Jaccard
        # would miss
        assert r["containment_a"] >= 0.8
        assert r["containment_b"] < 0.5
        assert r["overlap"] >= 1

    def test_stop_fingerprint_cap(self, spark):
        from frontier_engine.textops import containment_pairs

        # identical boilerplate on every doc; cap 2 < 4 docs drops all
        # shared fingerprints before the self-join -> no pairs
        docs = [(i, "identical shared boilerplate chrome on every page") for i in range(4)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        assert containment_pairs(df, max_fp_docs=2).collect() == []


class TestDhash:
    def test_identical_pixels_same_hash_container_free(self, spark):
        import numpy as np

        from frontier_engine import codecs
        from frontier_engine import multimodal as MM

        # same rendering through two DIFFERENT containers (BMP vs PNG)
        # must hash equal — the whole point of a perceptual key
        rng = (np.arange(32)[:, None] * 11 + np.arange(36)[None, :] * 3) % 256
        px = np.broadcast_to(rng[:, :, None], (32, 36, 3)).astype(np.uint8)
        bmp = MM.encode_bmp(px)
        png = codecs.encode_png(np.ascontiguousarray(px))
        df = spark.createDataFrame(
            [(1, bmp), (2, png), (3, MM.encode_bmp(255 - px))],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r["dhash"] for r in MM.dhash_features(df).collect()}
        assert rows[1] == rows[2]
        assert rows[1] != rows[3]  # inverted gradient flips the bits
        assert len(rows[1]) == 16 and int(rows[1], 16) >= 0

    def test_bad_rows_dropped(self, spark):
        from frontier_engine import multimodal as MM

        df = spark.createDataFrame(
            [(1, b"not an image"), (2, None)], "media_id long, payload binary"
        )
        assert MM.dhash_features(df).collect() == []


class TestTrustRank:
    def test_matches_dense_reference_and_demotes_spam(self, spark):
        import numpy as np

        from frontier_engine.graph import trustrank

        # trusted hub 0 -> {1,2}; 1<->2; spam island 8<->9 unreachable
        # from any seed
        edges = [(0, 1), (0, 2), (1, 2), (2, 1), (8, 9), (9, 8)]
        seeds = [0]
        nodes = sorted({u for e in edges for u in e})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n))
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        for u, v in edges:
            A[idx[v], idx[u]] = 1.0 / deg[u]
        r0 = np.zeros(n)
        for s in seeds:
            r0[idx[s]] = 1.0 / len(seeds)
        t = r0.copy()
        for _ in range(5):
            t = 0.15 * r0 + 0.85 * (A @ t)

        e_df = spark.createDataFrame(edges, "src long, dst long")
        s_df = spark.createDataFrame([(s,) for s in seeds], "node long")
        got = {
            r["node"]: r["trust"]
            for r in trustrank(e_df, s_df, iterations=5).collect()
        }
        for node in nodes:
            assert got[node] == pytest.approx(t[idx[node]], abs=1e-12), node
        # spam island gets exactly zero trust; linked-from-seed nodes don't
        assert got[8] == 0.0 and got[9] == 0.0
        assert got[1] > 0 and got[2] > 0 and got[0] > 0

    def test_seed_outside_graph_ignored(self, spark):
        from frontier_engine.graph import trustrank

        e_df = spark.createDataFrame([(0, 1)], "src long, dst long")
        s_df = spark.createDataFrame([(0,), (42,)], "node long")
        got = {r["node"]: r["trust"] for r in trustrank(e_df, s_df, iterations=2).collect()}
        # only node 0 is a graph node -> |S| = 1, all teleport mass on it
        # t0 = [1, 0]; iter1: t = [0.15, 0.85]; iter2: t = [0.15, 0.1275]
        assert got[0] == pytest.approx(0.15, abs=1e-12)
        assert got[1] == pytest.approx(0.85 * 0.15, abs=1e-12)


class TestRrfFuse:
    def test_two_channel_scores(self, spark):
        from frontier_engine.index import rrf_fuse

        ch1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
        ch2 = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank int")
        got = {
            r["doc_id"]: (r["n_channels"], r["rrf"])
            for r in rrf_fuse({"bm25": ch1, "dense": ch2}).collect()
        }
        assert got[1] == (2, pytest.approx(1 / 61 + 1 / 62, abs=1e-15))
        assert got[2] == (1, pytest.approx(1 / 62, abs=1e-15))
        assert got[3] == (2, pytest.approx(1 / 63 + 1 / 61, abs=1e-15))
        # fused order: doc 1 (ranked high in both) beats doc 3 beats doc 2
        order = sorted(got, key=lambda d: -got[d][1])
        assert order == [1, 3, 2]

    def test_k0_shifts_discount(self, spark):
        from frontier_engine.index import rrf_fuse

        ch = spark.createDataFrame([(7, 1)], "doc_id long, rank int")
        (row,) = rrf_fuse({"only": ch}, k0=0).collect()
        assert row["rrf"] == pytest.approx(1.0, abs=1e-15)

    def test_empty_channels_rejected(self, spark):
        from frontier_engine.index import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse({})
