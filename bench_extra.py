"""Per-stage decomposition benchmarks (guide §1.4: noop-sink isolation).

NOT the driver-timed bench (bench.py is frozen); this file exists to
attribute each hot headline query's seconds to its pipeline stages so
optimization targets the right operator. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [group ...]

Groups: minhash simhash embedding ngram micro (default: all).
Prints one JSON line per timed stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, reps=2):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"stage": name, "sec": round(best, 3)}), flush=True)
    return best


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from frontier_engine import ann
    from frontier_engine import textops as TX
    from frontier_engine.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    groups = set(sys.argv[1:]) or {"minhash", "simhash", "embedding", "ngram"}
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=max(8, cpus))
    qs = entrymod.queries()
    _t = entrymod._t

    # warm JVM + python workers
    spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
    noop(qs["token_stats"](spark, sf))

    if "minhash" in groups:
        d = _t(spark, sf, "documents")
        sigs = d.select(
            F.col("doc_id").alias("id"),
            TX.minhash_signature_udf(128)(TX.shingle_hashes(F.col("text"), 3)).alias("sig"),
        )
        timed(spark, "minhash/1_shingle_hashes_only", lambda: noop(
            d.select(TX.shingle_hashes(F.col("text"), 3).alias("h"))))
        timed(spark, "minhash/2_sigs", lambda: noop(sigs))
        cand = TX.minhash_candidate_pairs(d, num_perm=128, bands=32, attach_estimate=False)
        timed(spark, "minhash/3_cand_pairs", lambda: noop(cand))
        timed(spark, "minhash/4_full_query", lambda: noop(qs["minhash_near_dup"](spark, sf)))
        # how big is the candidate set?
        print(json.dumps({"stage": "minhash/cand_count", "n": cand.count()}), flush=True)

    if "simhash" in groups:
        d = _t(spark, sf, "documents")
        toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) >= 1)
        tok_hashes = F.transform(toks, lambda t: TX.md5_hash60_col(t))
        sims = d.select(F.col("doc_id").alias("id"), TX.simhash_udf()(tok_hashes).alias("simhash"))
        timed(spark, "simhash/1_tok_hashes_only", lambda: noop(
            d.select(tok_hashes.alias("h"))))
        timed(spark, "simhash/2_sims", lambda: noop(sims))
        timed(spark, "simhash/3_full_query", lambda: noop(qs["simhash_near_dup"](spark, sf)))

    if "embedding" in groups:
        emb = _t(spark, sf, "embeddings").select(
            "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
        )
        dup = emb.filter(F.col("vec_id") < 20).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        planted = emb.unionByName(dup)
        b = ann.hyperplane_buckets_udf(64, 8, 8, 7)
        withb = planted.select(
            F.col("vec_id").alias("id"),
            F.posexplode(b(F.col("embedding"))).alias("table", "bucket"),
        )
        timed(spark, "embedding/1_buckets", lambda: noop(withb))
        l = withb.select(F.col("id").alias("id_a"), "table", "bucket")
        r = withb.select(F.col("id").alias("id_b"), "table", "bucket")
        pairs = (
            l.join(r, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .drop("table", "bucket")
            .dropDuplicates(["id_a", "id_b"])
        )
        timed(spark, "embedding/2_pairs_dedup", lambda: noop(pairs))
        print(json.dumps({"stage": "embedding/pair_count", "n": pairs.count()}), flush=True)
        timed(spark, "embedding/3_full_query", lambda: noop(qs["embedding_near_dup"](spark, sf)))

    if "ngram" in groups:
        from frontier_engine import index as IX

        d = _t(spark, sf, "documents")
        postings = IX.build_postings(d, n=2)
        timed(spark, "ngram/1_postings", lambda: noop(postings))
        timed(spark, "ngram/2_full_query", lambda: noop(qs["ngram_search"](spark, sf)))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
