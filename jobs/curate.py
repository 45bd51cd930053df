"""End-to-end LLM-training-data curation over a documents table.

The batch pipeline every public web-text recipe runs (C4 / Gopher /
CCNet / RefinedWeb / Dolma lineage), chained from the library's
individually oracle-checked operators into ONE job:

    mojibake repair → C4 line cleaning (+ page policy) → Gopher gate →
    exact dedup → MinHash near-dup clusters → quality-aware survivor
    selection → per-language quality calibration (percentile floor) →
    [optional] benchmark decontamination → PII scrub →
    [optional] token-budget cut → curated parquet
    [+ optional] BPE tokenizer trained on the curated corpus
    [+ optional] packed-sequence plan

Prints ONE JSON line: the stage-by-stage funnel (row counts after every
stage) plus output locations — the audit artifact a curation run ships
with.  Every stage is deterministic at any parallelism (hash/id
tie-breaks throughout), so reruns reproduce the same corpus byte-for-
byte.

Usage:
    python jobs/curate.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/curated [--eval-docs EVAL.parquet] [--min-pct 0.1] \
        [--budget-tokens N] [--pack-len 2048] [--keep-c4-flagged]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from frontier_engine import textops as TX  # noqa: E402
from frontier_engine.session import get_spark  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text, lang, ...)")
    ap.add_argument("--out", required=True, help="curated corpus output dir")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--eval-docs", default=None,
                    help="eval-set parquet; contaminated docs are dropped (13-gram overlap)")
    ap.add_argument("--decontam-k", type=int, default=13)
    ap.add_argument("--min-pct", type=float, default=0.10,
                    help="per-language quality percentile floor (0 disables)")
    ap.add_argument("--budget-tokens", type=int, default=None,
                    help="greedy quality-ranked token budget (omit to keep all)")
    ap.add_argument("--pack-len", type=int, default=None,
                    help="also write a packed-sequence plan at this sequence length")
    ap.add_argument("--keep-c4-flagged", action="store_true",
                    help="keep pages C4 page policy would drop (lorem ipsum / curly brace)")
    ap.add_argument("--no-c4", action="store_true",
                    help="skip C4 line cleaning (e.g. corpora without sentence punctuation)")
    ap.add_argument("--no-gopher", action="store_true",
                    help="skip the Gopher rule gate (e.g. short-document corpora)")
    ap.add_argument("--train-bpe", type=int, default=None, metavar="N_MERGES",
                    help="train an N-merge BPE tokenizer on the CURATED corpus "
                         "and write the merge table next to --out")
    args = ap.parse_args(argv)

    spark = get_spark("curate", cores=args.cores)
    docs = spark.read.parquet(args.docs)
    funnel: dict[str, object] = {"input": docs.count()}

    # 1. mojibake repair (map-only)
    fixed = TX.fix_mojibake(docs, "text", "doc_id")
    base = docs.drop("text").join(
        fixed.select("doc_id", F.col("fixed").alias("text")), "doc_id"
    )
    funnel["mojibake_repaired"] = fixed.filter("was_mojibake").count()

    # 2. C4 line cleaning + page policy
    if not args.no_c4:
        c4 = TX.c4_clean(base, "text", "doc_id")
        base = base.drop("text").join(
            c4.select(
                "doc_id", F.col("cleaned").alias("text"), "has_lorem", "has_brace"
            ),
            "doc_id",
        )
        if not args.keep_c4_flagged:
            base = base.filter(~F.col("has_lorem") & ~F.col("has_brace"))
        base = base.drop("has_lorem", "has_brace").filter(F.length("text") > 0)
        funnel["after_c4"] = base.count()

    # 3. Gopher quality gate
    if not args.no_gopher:
        gate = TX.gopher_gate(base, "text", "doc_id").select("doc_id", "keep")
        base = base.join(gate, "doc_id").filter("keep").drop("keep")
        funnel["after_gopher"] = base.count()

    # 4. exact dedup (content hash, min-id survivor)
    base = TX.exact_dedup(base, "text", "doc_id")
    funnel["after_exact_dedup"] = base.count()

    # 5. near-dup clusters -> quality-aware survivor per cluster
    quality = base.select(
        "doc_id", TX.quality_score_col(F.col("text")).alias("quality")
    )
    pairs = TX.minhash_candidate_pairs(
        base, "text", "doc_id", attach_estimate=False
    )
    comp = TX.connected_components(pairs, "id_a", "id_b")
    surv = TX.select_survivors(comp, quality, "doc_id", "quality")
    base = base.join(
        surv.filter(~F.col("keep")).select("doc_id"), "doc_id", "left_anti"
    )
    funnel["after_near_dedup"] = base.count()

    # 6. per-language percentile calibration
    if args.min_pct > 0:
        qdf = base.select("doc_id", "lang").join(quality, "doc_id")
        cal = TX.quality_calibrate(qdf, "quality", "lang", "doc_id")
        base = base.join(
            cal.filter(F.col("pct_rank") >= args.min_pct).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        funnel["after_calibration"] = base.count()

    # 7. benchmark decontamination (optional)
    if args.eval_docs:
        eval_set = spark.read.parquet(args.eval_docs)
        hits = TX.decontaminate(base, eval_set, k=args.decontam_k)
        base = base.join(hits.select("doc_id"), "doc_id", "left_anti")
        funnel["after_decontamination"] = base.count()

    # 8. PII scrub (map-only)
    scrub = TX.pii_scrub(base, "text", "doc_id")
    base = base.drop("text").join(
        scrub.select("doc_id", F.col("scrubbed").alias("text")), "doc_id"
    )
    funnel["pii_docs_touched"] = scrub.filter(
        "n_emails + n_ipv4 + n_phones > 0"
    ).count()

    # 9. token-budget cut (optional)
    if args.budget_tokens is not None:
        toks = base.select(
            "doc_id", TX.token_count_col(F.col("text")).alias("n_tokens")
        ).join(quality, "doc_id")
        kept = TX.budget_cut(
            toks, args.budget_tokens, "quality", "n_tokens", "doc_id"
        )
        base = base.join(kept.select("doc_id"), "doc_id", "left_semi")
        funnel["after_budget_cut"] = base.count()

    base.write.mode("overwrite").parquet(args.out)
    funnel["output"] = spark.read.parquet(args.out).count()
    funnel["out"] = args.out

    # 10. tokenizer training on the curated output (optional): the merge
    # table is the artifact a pretraining run consumes, so it is trained
    # AFTER cleaning/dedup/selection — on the corpus the model will see
    if args.train_bpe is not None:
        # train on the parquet just written, not the lazy `base` lineage —
        # re-deriving the whole funnel for the vocabulary aggregate would
        # recompute every stage above
        merges = TX.bpe_train(spark.read.parquet(args.out), n_merges=args.train_bpe)
        bpe_out = args.out.rstrip("/") + "_bpe"
        merges.coalesce(1).write.mode("overwrite").parquet(bpe_out)
        funnel["bpe_merges"] = spark.read.parquet(bpe_out).count()
        funnel["bpe_out"] = bpe_out

    # 11. packed-sequence plan (optional)
    if args.pack_len is not None:
        packed = TX.pack_sequences(base, "text", "doc_id", seq_len=args.pack_len)
        packed_out = args.out.rstrip("/") + "_packed"
        packed.write.mode("overwrite").parquet(packed_out)
        p = spark.read.parquet(packed_out)
        funnel["packed_docs"] = p.count()
        funnel["packed_sequences"] = p.select(
            "shard", "seq_id"
        ).distinct().count()
        funnel["packed_out"] = packed_out

    print(json.dumps(funnel))
    spark.stop()


if __name__ == "__main__":
    main()
