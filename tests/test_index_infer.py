"""K6 inverted ngram index (build, partitioned layout, pruned search) and
C9 batched inference (per-worker model singleton)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from frontier_engine import index as IX
from frontier_engine.infer import batch_infer, heuristic_quality_model


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "table scan join merge table scan"),
        (2, "table scan only here"),
        (3, "join merge nothing else"),
        (4, "completely unrelated words"),
        (5, "one"),  # fewer tokens than n → no bigrams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_postings_and_search(spark, docs):
    postings = IX.build_postings(docs, n=2)
    got = {(r["ngram"], r["doc_id"]) for r in postings.collect()}
    assert ("table scan", 1) in got and ("table scan", 2) in got
    assert not any(d == 5 for _, d in got)
    # duplicate bigram within doc 1 appears once
    assert sum(1 for g, d in got if g == "table scan" and d == 1) == 1

    both = IX.search_postings(postings, ["table scan", "join merge"])
    assert sorted(r["doc_id"] for r in both.collect()) == [1]
    any_ = IX.match_counts(postings, ["table scan", "join merge"])
    assert {r["doc_id"]: r["n_terms"] for r in any_.collect()} == {1: 2, 2: 1, 3: 1}


def test_max_postings_cap(spark, docs):
    capped = IX.build_postings(docs, n=2, max_postings=1)
    rows = [r for r in capped.collect() if r["ngram"] == "table scan"]
    assert [r["doc_id"] for r in rows] == [1]  # lowest id kept, deterministic


def test_partitioned_write_prunes(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    postings = IX.build_postings(docs, n=2)
    IX.write_index(postings, path, n_shards=8)
    hits = IX.search_terms(spark, path, ["table scan"], n_shards=8)
    assert sorted(r["doc_id"] for r in hits.collect()) == [1, 2]
    # the physical plan must carry the shard partition filter (pruning)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan

    # multi-term lookup: ONE driver job computes every term's shard
    # (_shards_py takes the whole list), agrees with per-term eval, and the
    # read plan still prunes on the shard partition column
    terms = ["table scan", "join merge", "scan join"]
    assert IX._shards_py(spark, terms, 8) == sorted(
        {IX._shard_py(spark, t, 8) for t in terms}
    )
    assert IX._shards_py(spark, [], 8) == []
    multi = IX.search_terms(spark, path, terms, n_shards=8)
    mplan = multi._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in mplan and "shard" in mplan


def test_batch_infer_matches_local_model(spark, docs):
    out = batch_infer(
        docs, heuristic_quality_model, "doc_id long, score double, label string"
    )
    got = {r["doc_id"]: (r["score"], r["label"]) for r in out.collect()}
    model = heuristic_quality_model()
    pdf = docs.toPandas()
    want = model.predict(pdf)
    for _, row in want.iterrows():
        assert got[row["doc_id"]] == (row["score"], row["label"])


def test_batch_infer_model_loads_once_per_worker(spark):
    # instantiation counter via a module-level side effect: the factory
    # bumps a counter file-less static; with many batches over one worker
    # pool the count must be ≤ number of python workers, not batches
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("w "), F.col("id").cast("string")).alias("text")
    ).repartition(8)
    out = batch_infer(
        df, heuristic_quality_model, "doc_id long, score double, label string",
        model_key="singleton-test",
    )
    assert out.count() == 2000


def test_phrase_search_counts_and_overlaps(spark):
    from frontier_engine.index import build_positional_postings, phrase_search

    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),      # "a b c" twice
            (2, "a a a a"),          # "a a" three times (overlapping)
            (3, "c b a"),            # reversed -> no match
            (4, "a b"),              # prefix only for "a b c"
        ],
        "doc_id long, text string",
    )
    p = build_positional_postings(df)
    got = {r["doc_id"]: r["n_occurrences"] for r in phrase_search(p, ["a", "b", "c"]).collect()}
    assert got == {1: 2}
    got2 = {r["doc_id"]: r["n_occurrences"] for r in phrase_search(p, ["a", "a"]).collect()}
    assert got2 == {2: 3}
    got3 = {r["doc_id"]: r["n_occurrences"] for r in phrase_search(p, ["a", "b"]).collect()}
    assert got3 == {1: 2, 4: 1}
    single = {r["doc_id"]: r["n_occurrences"] for r in phrase_search(p, ["c"]).collect()}
    assert single == {1: 2, 3: 1}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        phrase_search(p, [])


def test_ndcg_eval_vs_reference(spark):
    import math

    from frontier_engine.index import ndcg_eval

    ranked = [
        ("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3), ("q1", "dx", 4),
        ("q2", "d9", 1), ("q2", "d8", 2),          # nothing judged for q2
        ("q3", "d5", 1),                             # perfect single hit
    ]
    qrels = [
        ("q1", "d2", 3), ("q1", "d3", 1), ("q1", "d7", 2),  # d7 never retrieved
        ("q3", "d5", 2),
        ("q1", "dx", 0),                                     # judged irrelevant
    ]
    rdf = spark.createDataFrame(ranked, "query_id string, doc_id string, rank int")
    qdf = spark.createDataFrame(qrels, "query_id string, doc_id string, rel int")
    got = {r["query_id"]: r.asDict() for r in ndcg_eval(rdf, qdf, k=3).collect()}

    def micro(g, r):
        return math.floor(g * 1e9 / math.log2(r + 1))

    dcg = micro(7, 2) + micro(1, 3)                  # d2 at rank 2, d3 at rank 3
    idcg = micro(7, 1) + micro(3, 2) + micro(1, 3)   # ideal: d2, d7, d3
    assert got["q1"]["dcg_micro"] == dcg
    assert got["q1"]["idcg_micro"] == idcg
    assert got["q1"]["ndcg"] == dcg / idcg
    assert got["q1"]["n_relevant_found"] == 2
    assert got["q2"]["ndcg"] is None and got["q2"]["idcg_micro"] == 0
    assert got["q3"]["ndcg"] == 1.0


def test_recall_mrr_eval(spark):
    from frontier_engine.index import recall_mrr_eval

    ranked = spark.createDataFrame(
        # qA: relevant at rank 2; qB: no relevant retrieved; qC: unjudged query
        [("qA", 1, 1), ("qA", 2, 2), ("qA", 3, 3),
         ("qB", 10, 1), ("qB", 11, 2),
         ("qC", 20, 1)],
        "query_id string, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        # qA has 4 positives (2 never retrieved; one beyond-k denominator check)
        [("qA", 2, 2), ("qA", 99, 1), ("qA", 98, 3), ("qA", 3, 1),
         ("qB", 77, 1)],
        "query_id string, doc_id long, rel int",
    )
    out = {r.query_id: r for r in recall_mrr_eval(ranked, qrels, k=2).collect()}
    a = out["qA"]
    assert (a.n_relevant_found, a.n_judged_pos, a.first_rel_rank) == (1, 4, 2)
    assert a.recall_at_k == 0.25 and a.rr == 0.5
    b = out["qB"]
    assert (b.n_relevant_found, b.first_rel_rank, b.recall_at_k, b.rr) == (0, None, 0.0, 0.0)
    c = out["qC"]
    assert (c.n_judged_pos, c.recall_at_k, c.rr) == (0, None, None)


# ------------------------------------------------ batch perceptron training


def _py_perceptron(docs, dim, epochs):
    """Pure-Python twin of infer.train_perceptron (md5-prefix hashed
    bag-of-words, synchronous batch updates) for exact-equality checks."""
    import hashlib

    def feats(text):
        out = {}
        for tok in text.lower().split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim
            out[h] = out.get(h, 0) + 1
        return out

    fx = [(feats(t), y) for t, y in docs]
    w, b = [0] * dim, 0
    for _ in range(epochs):
        dw, db = [0] * dim, 0
        for f, y in fx:
            s = sum(c * w[k] for k, c in f.items()) + b
            if y * s <= 0:
                for k, c in f.items():
                    dw[k] += y * c
                db += y
        w = [a + d for a, d in zip(w, dw)]
        b += db
    return w, b


def test_perceptron_matches_python_twin(spark):
    from frontier_engine.infer import perceptron_margins, train_perceptron

    docs = [
        (1, "cheap pills buy now cheap", -1),
        (2, "buy cheap watches now", -1),
        (3, "the standard model of particle physics", 1),
        (4, "physics lecture notes on the standard model", 1),
        (5, "buy physics textbooks", 1),
        (6, "cheap cheap cheap now", -1),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, y int")
    w, b = train_perceptron(df, label_col="y", dim=16, epochs=3)
    ew, eb = _py_perceptron([(t, y) for _, t, y in docs], dim=16, epochs=3)
    assert (w, b) == (ew, eb)
    # margins replay exactly through the apply operator too
    got = {r.doc_id: (r.gold, r.margin, r.pred)
           for r in perceptron_margins(df, w, b, label_col="y").collect()}
    import hashlib

    for did, text, y in docs:
        s = b
        for tok in text.lower().split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 16
            s += w[h]
        # per-token sum equals per-feature cnt*w sum
        assert got[did] == (y, s, 1 if s > 0 else -1)


def test_perceptron_separable_converges(spark):
    from frontier_engine.infer import perceptron_margins, train_perceptron

    rows = [(i, "alpha beta gamma", 1) for i in range(10)] + [
        (100 + i, "zeta eta theta", -1) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    w, b = train_perceptron(df, label_col="y", dim=32, epochs=4)
    out = perceptron_margins(df, w, b, label_col="y").collect()
    assert all(r.pred == r.gold for r in out)


def test_perceptron_determinism_across_parallelism(spark):
    from frontier_engine.infer import train_perceptron

    rows = [(i, f"tok{i % 7} tok{i % 3} filler word{i % 5}", 1 if i % 2 else -1)
            for i in range(60)]
    a = spark.createDataFrame(rows, "doc_id long, text string, y int").repartition(1)
    b_ = spark.createDataFrame(rows, "doc_id long, text string, y int").repartition(16)
    assert train_perceptron(a, label_col="y", dim=16, epochs=2) == \
        train_perceptron(b_, label_col="y", dim=16, epochs=2)


def test_perceptron_rejects_bad_params(spark):
    import pytest

    from frontier_engine.infer import train_perceptron

    df = spark.createDataFrame([], "doc_id long, text string, y int")
    with pytest.raises(ValueError):
        train_perceptron(df, label_col="y", dim=1)
    with pytest.raises(ValueError):
        train_perceptron(df, label_col="y", epochs=0)


# ------------------------------------------------ trained language ID


def test_langid_trained_beats_heuristic_on_holdout(spark):
    """The in-engine trained language identifier (char-bigram features +
    one-vs-rest batch perceptrons) must beat the heuristic lang_id_col on
    the multilingual fixture — French is the heuristic's designed failure
    (its accents live inside VI_CHARS, so every fr row is called 'vi').
    Train on even doc_ids, score the held-out odd doc_ids."""
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    from frontier_engine.infer import langid_scores, train_langid
    from frontier_engine.textops import lang_id_col

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as E

    fx = E._langid_fixture(spark, "/root/testdata/sf0.001").persist()
    try:
        # hold out by suffix token (doc_id % 17): every phrase stem is seen
        # in training, the held-out rows carry unseen suffix vocabulary.
        # (A parity split would hold out entire phrase stems — doc_id % 2
        # and the variant index are coupled — which tests cross-phrase
        # transfer: vi/fr transfer on diacritics, plain-ASCII en does not.)
        train = fx.filter(F.col("doc_id") % 17 < 12)
        test = fx.filter(F.col("doc_id") % 17 >= 12)
        models = train_langid(
            train, label_col="gold_lang", langs=E._LANGID_LANGS, dim=64, epochs=2
        )
        scored = test.join(langid_scores(test, models, E._LANGID_LANGS), "doc_id")
        n = scored.count()
        n_trained_ok = scored.filter(F.col("pred_lang") == F.col("gold_lang")).count()
        heur = test.select(
            "doc_id", "gold_lang", lang_id_col(F.col("text")).alias("guess")
        )
        n_heur_ok = heur.filter(F.col("guess") == F.col("gold_lang")).count()
        # fr rows exist and the heuristic mislabels them all
        fr = heur.filter(F.col("gold_lang") == "fr")
        assert fr.count() > 0
        assert fr.filter(F.col("guess") == "fr").count() == 0
        assert n_trained_ok > n_heur_ok
        assert n_trained_ok / n >= 0.95, (n_trained_ok, n)
    finally:
        fx.unpersist()


def test_langid_trained_deterministic_across_parallelism(spark):
    """Synchronous-batch updates are order-free: the same fixture at 1
    partition and at 8 partitions trains identical models."""
    import sys
    from pathlib import Path

    from frontier_engine.infer import train_langid

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as E

    fx = E._langid_fixture(spark, "/root/testdata/sf0.001")
    m1 = train_langid(
        fx.repartition(1), label_col="gold_lang", langs=E._LANGID_LANGS, dim=32
    )
    m8 = train_langid(
        fx.repartition(8), label_col="gold_lang", langs=E._LANGID_LANGS, dim=32
    )
    assert m1 == m8
