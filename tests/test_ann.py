"""Similarity search: brute-force vs duckdb oracle; LSH recall; near-dups."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from frontier_engine import ann

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def queries(spark, corpus):
    rows = corpus.orderBy("vec_id").limit(3).collect()
    return spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in rows],
        "query_id long, query_vec array<float>",
    ), [r["vec_id"] for r in rows]


def test_brute_force_topk_vs_duckdb(spark, corpus, queries):
    qdf, qids = queries
    got = ann.brute_force_topk(corpus, qdf, k=5)
    got_rows = sorted(
        (r["query_id"], r["rank"], r["vec_id"]) for r in got.collect()
    )
    want = []
    for qid in qids:
        rows = duckdb.sql(
            f"""
            with q as (select embedding qv from '{EMB}' where vec_id = {qid})
            select vec_id,
                   list_cosine_similarity(embedding, (select qv from q)) c
            from '{EMB}'
            order by c desc, vec_id asc limit 5
            """
        ).fetchall()
        for rank, (vid, _) in enumerate(rows, start=1):
            want.append((qid, rank, vid))
    assert got_rows == sorted(want)
    # each query's own vector ranks #1 with cosine ≈ 1
    self_hits = {r["query_id"]: r["vec_id"] for r in got.collect() if r["rank"] == 1}
    assert self_hits == {q: q for q in qids}


def test_lsh_topk_recall(spark, corpus, queries):
    qdf, qids = queries
    dim = len(corpus.first()["embedding"])
    exact = ann.brute_force_topk(corpus, qdf, k=5)
    # synthetic embeddings are near-uniform random (neighbor cosine ≈ 0.33)
    # — LSH's worst case — so use coarse buckets + many tables; real
    # embedding corpora cluster and allow much finer bucketing
    approx = ann.lsh_topk(corpus, qdf, dim=dim, k=5, n_bits=4, n_tables=16)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall
    # the self-vector always lands in its own bucket → guaranteed hit
    assert all((q, q) in a for q in qids)


def test_embedding_near_dup_pairs(spark, corpus):
    dim = len(corpus.first()["embedding"])
    # plant two exact duplicate vectors with fresh ids
    base = corpus.limit(2).collect()
    dup = spark.createDataFrame(
        [(10_000 + r["vec_id"], r["embedding"]) for r in base],
        "vec_id long, embedding array<float>",
    )
    planted = corpus.select("vec_id", "embedding").unionByName(dup)
    pairs = ann.embedding_near_dup_pairs(planted, dim=dim, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for r in base:
        assert (r["vec_id"], 10_000 + r["vec_id"]) in got


def test_ivf_topk_recall(spark, corpus, queries):
    qdf, qids = queries
    cents = ann.train_ivf_centroids(corpus, dim=64, n_centroids=8)
    assert cents.shape == (8, 64)
    # deterministic: retraining gives identical centroids
    again = ann.train_ivf_centroids(corpus, dim=64, n_centroids=8)
    import numpy as np

    assert np.array_equal(cents, again)
    exact = ann.brute_force_topk(corpus, qdf, k=5)
    approx = ann.ivf_topk(corpus, qdf, cents, k=5, n_probe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # random vectors; n_probe=4 of 8 lists
    assert all((q, q) in a for q in qids)  # self vector always found


def test_default_nbits_bounds_buckets_at_10x(spark, corpus):
    """With the DEFAULT n_bits=None, growing the corpus 10x narrows the
    buckets (auto_bits) so realized max bucket occupancy stays bounded —
    the fixed-width default was the 100TB scale hazard (VERDICT r2 #1)."""
    dim = len(corpus.first()["embedding"])
    n0 = corpus.count()
    reps = spark.range(10).select(F.col("id").alias("r"))
    # centered pseudo-random replicas: the fixture embeddings live in the
    # positive orthant (all near-parallel — sign-LSH puts parallel vectors
    # in shared buckets BY DESIGN), so occupancy there measures data
    # geometry, not bucket width. Hash-fract per (id, element) gives
    # uniform centered directions, isolating the width-scaling contract.
    ids = F.col("vec_id") * 10 + F.col("r")
    big = corpus.crossJoin(reps).select(
        ids.alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * 0.0
            + (lambda s: s - F.floor(s) - 0.5)(
                F.sin((ids.cast("double") * 64.0 + i.cast("double")) * 12.9898) * 43758.5453
            ),
        ).alias("embedding"),
    ).persist()
    n1 = big.count()
    assert n1 == 10 * n0

    target = 8
    bits_small, bits_big = ann.auto_bits(n0, target), ann.auto_bits(n1, target)
    assert bits_big > bits_small  # width adapts with corpus size

    # realized occupancy at the auto width stays within a small multiple of
    # the target (hashing is not perfectly uniform on a tiny corpus)
    b = ann.hyperplane_buckets_udf(dim, bits_big, n_tables=4, seed=7)
    occ = (
        big.select(F.posexplode(b(F.col("embedding"))).alias("table", "bucket"))
        .groupBy("table", "bucket")
        .count()
    )
    max_occ = occ.agg(F.max("count")).first()[0]
    assert max_occ <= target * 16, max_occ

    # the public near-dup API at pure defaults still finds planted dups
    base = big.limit(2).collect()
    dup = spark.createDataFrame(
        [(1_000_000 + r["vec_id"], r["embedding"]) for r in base],
        "vec_id long, embedding array<double>",
    )
    planted = big.unionByName(dup)
    pairs = ann.embedding_near_dup_pairs(planted, dim=dim, threshold=0.999, target_bucket=target)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for r in base:
        assert (r["vec_id"], 1_000_000 + r["vec_id"]) in got
    big.unpersist()


def test_auto_bits_bounds_bucket_occupancy():
    from frontier_engine.ann import auto_bits

    # bucket count grows with corpus size: expected occupancy stays near the
    # target across 10x steps instead of going quadratic
    for n in [1_000, 10_000, 100_000, 1_000_000, 10_000_000, 1_000_000_000]:
        bits = auto_bits(n, target_bucket=1024)
        if n <= 1024:
            assert bits == 4
        else:
            expected = n / (1 << bits)
            assert expected <= 1024 * 1.01  # ceil keeps occupancy <= target
            assert bits <= 24
    assert auto_bits(10_000) < auto_bits(100_000) < auto_bits(10_000_000)


class TestSq8:
    def test_quantize_roundtrip_bounds(self, spark):
        from frontier_engine.ann import quantize_sq8_cols

        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        codes, scale, norm = quantize_sq8_cols(F.col("embedding"))
        got = {
            r["vec_id"]: (r["c"], r["s"], r["n"])
            for r in df.select(
                "vec_id", codes.alias("c"), scale.alias("s"), norm.alias("n")
            ).collect()
        }
        c, s, n = got[1]
        assert c == [127, -64, 32, 0] and s == pytest.approx(1 / 127)
        assert n == pytest.approx((1 + 0.25 + 0.0625) ** 0.5)
        # zero vector: all-zero codes, zero scale, zero norm
        assert got[2] == ([0, 0, 0, 0], 0.0, 0.0)

    def test_matches_brute_force_exactly(self, spark):
        import numpy as np

        from frontier_engine.ann import brute_force_topk, sq8_topk

        rng = np.random.RandomState(7)
        vecs = rng.randn(300, 16)
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(300)],
            "vec_id long, embedding array<double>",
        )
        q = df.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        exact = sorted(
            (r["query_id"], r["rank"], r["vec_id"])
            for r in brute_force_topk(df, q, k=5).collect()
        )
        sq8 = sorted(
            (r["query_id"], r["rank"], r["vec_id"])
            for r in sq8_topk(df, q, k=5, shortlist_factor=4).collect()
        )
        assert sq8 == exact

    def test_int_dot_exact(self, spark):
        from frontier_engine.ann import int_dot_col

        df = spark.createDataFrame(
            [(1, [127, -127, 100], [127, 127, -100])], "i long, a array<int>, b array<int>"
        )
        (r,) = df.select(int_dot_col(F.col("a"), F.col("b")).alias("d")).collect()
        assert r["d"] == 127 * 127 - 127 * 127 - 100 * 100


def test_semantic_dedup_keep_first_and_chains(spark):
    import numpy as np

    # 3 well-separated directions; duplicates planted along each
    base = np.eye(4)
    rows = [
        (0, base[0].tolist()),          # kept (lowest id of its pair)
        (1, base[1].tolist()),          # kept
        (2, base[0].tolist()),          # exact dup of 0 -> dropped
        (3, (base[1] * 2.0).tolist()),  # scaled dup of 1 (cos=1) -> dropped
        (4, base[2].tolist()),          # kept, alone in its cluster
    ]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = ann.train_ivf_centroids(corpus, dim=4, n_centroids=3, sample_rows=16)
    out = {
        r["id"]: (r["keep"], r["cluster"])
        for r in ann.semantic_dedup(corpus, cents, threshold=0.99).collect()
    }
    assert {i: k for i, (k, _) in out.items()} == {
        0: True, 1: True, 2: False, 3: False, 4: True,
    }
    # duplicates share their keeper's cluster (identical argmax)
    assert out[0][1] == out[2][1]
    assert out[1][1] == out[3][1]


def test_semantic_dedup_deterministic_across_partitioning(spark, corpus):
    emb = corpus.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    cents = ann.train_ivf_centroids(emb, dim=64, n_centroids=8)
    a = sorted(
        (r["id"], r["cluster"], r["keep"])
        for r in ann.semantic_dedup(emb, cents, threshold=0.95).collect()
    )
    b = sorted(
        (r["id"], r["cluster"], r["keep"])
        for r in ann.semantic_dedup(emb.repartition(13), cents, threshold=0.95).collect()
    )
    assert a == b
    assert len(a) == emb.count()  # verdict for every row


def test_margin_mine_planted_pair(spark):
    # x0 == y1 exactly (cosine 1.0); y3/y5 near-orthogonal noise. The
    # planted pair must be rank-1 and mined; margin_ppm must equal the
    # hand-computed integral division over floor(cos*1e6) sums.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # x pool (even)
        (2, [0.0, 1.0, 0.0, 0.0]),   # x pool
        (1, [1.0, 0.0, 0.0, 0.0]),   # y pool: exact match of x0
        (3, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.5, 0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    xs = df.filter(F.col("vec_id") % 2 == 0)
    ys = df.filter(F.col("vec_id") % 2 == 1)
    out = {
        r["query_id"]: r
        for r in ann.margin_mine(xs, ys, k=2, margin_threshold_ppm=1_020_000).collect()
    }
    assert set(out) == {0, 2}
    best = out[0]
    assert best["vec_id"] == 1 and best["cosine"] == 1.0
    # c6: cos(x0,y1)=1.0 -> 1_000_000; cos(x0,y5)=0.5 -> 500_000
    # ax_sum=1_500_000 (cx=2); y1's top-2 over X: cos 1 and 0 -> ay_sum=1_000_000 (cy=2)
    want = (2_000_000 * 1_000_000 * 2 * 2) // (1_500_000 * 2 + 1_000_000 * 2)
    assert best["margin_ppm"] == want and best["mined"] is True


def test_margin_mine_hub_not_mined(spark):
    # A "hub" x near EVERY y has margin ~1 -> not mined, even though its
    # raw best cosine is high: the normalization is the whole point.
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(size=4)
    ys = [
        (2 * i + 1, [float(v) for v in base + rng.normal(scale=0.01, size=4)])
        for i in range(6)
    ]
    xs = [(0, [float(v) for v in base])]
    df = spark.createDataFrame(xs + ys, "vec_id long, embedding array<double>")
    out = ann.margin_mine(
        df.filter(F.col("vec_id") % 2 == 0),
        df.filter(F.col("vec_id") % 2 == 1),
        k=4,
    ).collect()
    assert len(out) == 1
    assert out[0]["mined"] is False
    assert out[0]["margin_ppm"] < 1_020_000


def test_hard_negatives_excludes_positives_never_underfills(spark):
    """The anti-join happens on scored pairs: even when a query's
    positives fill the entire top of the ranking, k negatives still come
    back (a top-window post-filter would under-fill here)."""
    import numpy as np

    from frontier_engine.ann import brute_force_topk, hard_negatives

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    # judge the brute-force top-10 (incl. self) all as positives
    top10 = brute_force_topk(emb, q, k=10)
    pos = top10.selectExpr("query_id", "vec_id")
    out = hard_negatives(emb, q, pos, k=5).collect()
    assert len(out) == 5
    banned = {r["vec_id"] for r in pos.collect()}
    assert not banned & {r["vec_id"] for r in out}
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    # the mined negatives are exactly ranks 11..15 of the unfiltered scan
    top15 = {r["vec_id"] for r in brute_force_topk(emb, q, k=15).collect()}
    assert {r["vec_id"] for r in out} == top15 - banned


class TestPQ:
    def test_codebook_shape_determinism_validation(self, spark, corpus):
        import numpy as np

        books = ann.train_pq_codebooks(corpus, dim=64, m=8, n_codes=16)
        assert books.shape == (8, 16, 8)
        again = ann.train_pq_codebooks(corpus, dim=64, m=8, n_codes=16)
        assert np.array_equal(books, again)
        with pytest.raises(ValueError):
            ann.train_pq_codebooks(corpus, dim=64, m=7)

    def test_adc_matches_numpy_reconstruction(self, spark, corpus, queries):
        """ADC score through the JVM element_at fold == numpy LUT sum of
        the quantized reconstruction's dot with the normalized query."""
        import numpy as np

        qdf, _ = queries
        books = ann.train_pq_codebooks(corpus, dim=64, m=8, n_codes=16)
        sub = corpus.filter(F.col("vec_id") < 50)
        encode = ann.pq_encode_udf(books)
        lut = ann.pq_lut_udf(books)
        got = (
            sub.select("vec_id", encode(F.col("embedding")).alias("codes"))
            .crossJoin(qdf.select("query_id", lut(F.col("query_vec")).alias("lut")))
            .withColumn("adc", ann.pq_adc_col(F.col("codes"), F.col("lut"), 8, 16))
            .collect()
        )
        corpus_vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
                       for r in sub.collect()}
        qvecs = {r["query_id"]: np.array(r["query_vec"], dtype=np.float64)
                 for r in qdf.collect()}
        for r in got:
            v = corpus_vecs[r["vec_id"]]
            v = v / np.linalg.norm(v)
            q = qvecs[r["query_id"]]
            q = q / np.linalg.norm(q)
            want = sum(
                q[s * 8 : (s + 1) * 8] @ books[s, code]
                for s, code in enumerate(r["codes"])
            )
            assert abs(r["adc"] - want) < 1e-9
            # sanity: scores live in the cosine range (random 64-dim data
            # quantizes coarsely at 16 codes/subspace — recall, not score
            # accuracy, is PQ's contract; the rerank restores exact scores)
            assert -1.001 <= r["adc"] <= 1.001, (r["adc"], float(v @ q))

    def test_recall_on_natural_embeddings(self, spark, corpus, queries):
        qdf, qids = queries
        books = ann.train_pq_codebooks(corpus, dim=64, m=8, n_codes=16)
        exact = ann.brute_force_topk(corpus, qdf, k=5)
        approx = ann.pq_topk(corpus, qdf, books, k=5, shortlist_factor=8)
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        # 64 dims -> 8 bytes is a 32x compression; random vectors are the
        # hardest case for PQ, the 8k-shortlist rerank keeps recall usable
        assert recall >= 0.5, recall
        assert all((q, q) in a for q in qids)  # self vector always found

    def test_ivfadc_recall_on_natural_embeddings(self, spark, corpus, queries):
        """IVFADC = IVF routing × PQ/ADC shortlist × exact rerank. On the
        worst-case random corpus, probing half the lists with a wide
        shortlist keeps recall usable; the self-vector is always found
        (it shares its own list and its ADC score is the list maximum)."""
        import numpy as np

        qdf, qids = queries
        cents = ann.train_ivf_centroids(corpus, dim=64, n_centroids=8)
        books = ann.train_pq_codebooks(corpus, dim=64, m=8, n_codes=16)
        exact = ann.brute_force_topk(corpus, qdf, k=5)
        approx = ann.ivfadc_topk(
            corpus, qdf, cents, books, k=5, n_probe=4, shortlist_factor=8
        )
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        assert len(e & a) / len(e) >= 0.4, len(e & a) / len(e)
        assert all((q, q) in a for q in qids)
        # determinism: the composed path rebuilds identically
        again = ann.ivfadc_topk(
            corpus, qdf, cents, books, k=5, n_probe=4, shortlist_factor=8
        )
        assert sorted(map(tuple, approx.collect())) == sorted(map(tuple, again.collect()))

    def test_lossless_corpus_equals_brute_force(self, spark):
        """On a corpus whose normalized subvectors all lie ON codebook
        entries, PQ output == brute force exactly (the q_pq_ann oracle
        argument, verified end-to-end here)."""
        import numpy as np

        books = np.array([[[0.5, 0.0], [0.0, 0.5]]] * 4)
        rows = []
        for vid in range(64):
            g = 1 + vid % 7
            vec = []
            for s in range(4):
                b = (vid // (s + 1)) % 2
                vec += [g * (1.0 if w == b else 0.0) for w in (0, 1)]
            rows.append((vid, vec))
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        qdf = spark.createDataFrame(
            [(i, rows[i][1]) for i in range(3)],
            "query_id long, query_vec array<double>",
        )
        exact = ann.brute_force_topk(corpus, qdf, k=5)
        approx = ann.pq_topk(corpus, qdf, books, k=5, shortlist_factor=4)
        e = [(r["query_id"], r["rank"], r["vec_id"], round(r["cosine"], 9))
             for r in exact.collect()]
        a = [(r["query_id"], r["rank"], r["vec_id"], round(r["cosine"], 9))
             for r in approx.collect()]
        assert sorted(e) == sorted(a)


class TestCentroidClassify:
    def _planted(self, spark):
        # 3 labels × 4 vecs, one-hot clusters with a small same-cluster
        # jitter on a non-identifying coordinate: perfectly separable,
        # classification must be the exact diagonal
        rows = []
        for label in range(3):
            for j in range(4):
                v = [0.0] * 6
                v[label] = 1.0
                v[5] = 0.01 * j  # jitter shared across clusters
                rows.append((label * 10 + j, label, v))
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )

    def test_separable_clusters_give_diagonal_confusion(self, spark):
        out = ann.centroid_classify(self._planted(spark)).collect()
        got = {(r["gold"], r["pred"]): r["n_vecs"] for r in out}
        assert got == {(0, 0): 4, (1, 1): 4, (2, 2): 4}

    def test_counts_cover_every_vector_once(self, spark, corpus):
        out = ann.centroid_classify(corpus)
        assert out.agg(F.sum("n_vecs")).first()[0] == corpus.count()

    def test_exact_cosine_tie_breaks_to_smallest_label(self, spark):
        # two identical centroids (labels 1 and 2 hold the same single
        # vector) — every tie must resolve to the smaller label
        rows = [
            (0, 1, [1.0, 0.0]),
            (1, 2, [1.0, 0.0]),
            (2, 0, [0.0, 1.0]),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )
        out = {
            (r["gold"], r["pred"]): r["n_vecs"]
            for r in ann.centroid_classify(df).collect()
        }
        assert out == {(1, 1): 1, (2, 1): 1, (0, 0): 1}

    def test_label_centroids_are_means(self, spark):
        df = spark.createDataFrame(
            [(0, 0, [1.0, 3.0]), (1, 0, [3.0, 5.0]), (2, 1, [2.0, 2.0])],
            "vec_id long, label int, embedding array<float>",
        )
        cents = {
            r["clabel"]: r["centroid"]
            for r in ann.label_centroids(df).collect()
        }
        assert cents[0] == [2.0, 4.0]
        assert cents[1] == [2.0, 2.0]
