"""Retrieval-index build over a (curated) documents table — the third
job in the pipeline story: crawl (jobs/crawl.py) → curate
(jobs/curate.py) → **index** (this).

Chains the library's individually oracle-checked operators into the
standard dense+sparse indexing recipe (DPR / hybrid-retrieval lineage):

    passage chunking (overlapping word windows) →
    BM25-ready tf postings, term-shard-partitioned for pruned lookups →
    [optional] SQ8-quantized embedding codes + IVF centroid assignments

Artifacts land under --out:
    passages/    (pid, doc_id, chunk_id, n_words, passage)
    postings/    (doc_id=pid, ngram, tf) partitioned by shard=hash(ngram)
    sq8/         (vec_id, codes, scale, norm)          [--embeddings]
    ivf/         (vec_id, list_id)                     [--embeddings]
    centroids/   (list_id, centroid)                   [--embeddings]

Prints ONE JSON line: artifact row counts + locations (+ an optional
--probe-terms BM25 smoke search over the freshly built postings, proof
the index answers queries). Deterministic at any parallelism: window
layout is closed-form per doc, shard layout is xxhash64, IVF training
is the fixed hash-ordered sample (ann.train_ivf_centroids) — rebuilds
are byte-identical.

Usage:
    python jobs/index.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/idx [--size 64] [--stride 48] [--n-shards 16] \
        [--embeddings EMB.parquet] [--n-centroids 16] \
        [--probe-terms "fast,table"]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from frontier_engine import ann  # noqa: E402
from frontier_engine import index as IX  # noqa: E402
from frontier_engine import textops as TX  # noqa: E402
from frontier_engine.session import get_spark  # noqa: E402

# passage ids pack (doc_id, chunk_id) into one int64: doc_id * 2^20 +
# chunk_id. 2^20 windows/doc = a billion-word document at stride 1000 —
# validated at build time, never silently wrapped.
CHUNK_CAP = 1 << 20


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--out", required=True, help="index output dir")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--size", type=int, default=64, help="passage window words")
    ap.add_argument("--stride", type=int, default=48, help="window stride words")
    ap.add_argument("--n-shards", type=int, default=16, help="postings term shards")
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet (vec_id, embedding) for the dense side")
    ap.add_argument("--n-centroids", type=int, default=16, help="IVF lists")
    ap.add_argument("--probe-terms", default=None,
                    help="comma-separated terms: BM25 smoke-search the built postings")
    args = ap.parse_args(argv)

    spark = get_spark("index", cores=args.cores)
    out: dict[str, object] = {}
    docs = spark.read.parquet(args.docs)
    out["input_docs"] = docs.count()

    # 1. passage chunking
    passages = TX.chunk_passages(
        docs, "text", "doc_id", size=args.size, stride=args.stride
    ).withColumn(
        "pid", F.col("doc_id") * F.lit(CHUNK_CAP) + F.col("chunk_id")
    )
    overflow = passages.filter(F.col("chunk_id") >= CHUNK_CAP).count()
    if overflow:
        raise ValueError(f"{overflow} passages exceed CHUNK_CAP windows/doc")
    pas_path = os.path.join(args.out, "passages")
    passages.select("pid", "doc_id", "chunk_id", "n_words", "passage").write.mode(
        "overwrite"
    ).parquet(pas_path)
    passages = spark.read.parquet(pas_path)
    out["passages"] = passages.count()
    out["passages_out"] = pas_path

    # 2. sparse side: tf postings over PASSAGES, term-shard-partitioned
    postings = IX.tf_postings(passages, n=1, text_col="passage", id_col="pid")
    post_path = os.path.join(args.out, "postings")
    IX.write_index(postings, post_path, n_shards=args.n_shards)
    built = spark.read.parquet(post_path)
    out["postings"] = built.count()
    out["vocab"] = built.select("ngram").distinct().count()
    out["postings_out"] = post_path

    # 3. dense side (optional): SQ8 codes + IVF lists
    if args.embeddings:
        emb = spark.read.parquet(args.embeddings).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        dim = len(emb.select("embedding").first()["embedding"])
        codes, scale, norm = ann.quantize_sq8_cols(F.col("embedding"))
        sq8_path = os.path.join(args.out, "sq8")
        emb.select(
            "vec_id",
            codes.alias("codes"),
            scale.alias("scale"),
            norm.alias("norm"),
        ).write.mode("overwrite").parquet(sq8_path)
        out["sq8_rows"] = spark.read.parquet(sq8_path).count()
        out["sq8_out"] = sq8_path

        cents = ann.train_ivf_centroids(
            emb, dim=dim, n_centroids=args.n_centroids
        )
        ivf_path = os.path.join(args.out, "ivf")
        emb.select(
            "vec_id",
            ann.ivf_assign_udf(cents, n_probe=1)("embedding")[0].alias("list_id"),
        ).write.mode("overwrite").parquet(ivf_path)
        out["ivf_rows"] = spark.read.parquet(ivf_path).count()
        out["ivf_out"] = ivf_path

        cent_path = os.path.join(args.out, "centroids")
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "list_id int, centroid array<double>",
        ).write.mode("overwrite").parquet(cent_path)
        out["centroids"] = int(cents.shape[0])
        out["centroids_out"] = cent_path

    # 4. smoke probe: BM25 over the index just built (reads the
    # partitioned postings back, so shard pruning is on the probe path)
    if args.probe_terms:
        terms = [t.strip().lower() for t in args.probe_terms.split(",") if t.strip()]
        top = (
            IX.bm25(built.select("doc_id", "ngram", "tf"), terms)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(5)
            .collect()
        )
        out["probe_terms"] = terms
        out["probe_top"] = [
            {"pid": r["doc_id"], "score": round(r["score"], 6)} for r in top
        ]

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
