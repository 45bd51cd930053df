"""jobs/curate.py end-to-end: the curation funnel runs, is monotone, and
reproduces byte-identically on rerun (every stage id/hash tie-broken)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(out_dir, extra=()):
    # subprocess: jobs/curate.py builds and STOPS its own SparkSession
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--docs", DOCS, "--out", out_dir,
         "--no-c4", "--no-gopher",  # synthetic docs: single-line, <50 words
         "--budget-tokens", "20000", "--pack-len", "512",
         "--cores", "4", *extra],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_curation_funnel_monotone_and_deterministic(spark, tmp_path):
    out1 = str(tmp_path / "cur1")
    f1 = _run(out1)
    # funnel is monotone non-increasing through the filtering stages
    stages = ["input", "after_exact_dedup", "after_near_dedup",
              "after_calibration", "after_budget_cut", "output"]
    vals = [f1[s] for s in stages]
    assert vals == sorted(vals, reverse=True)
    assert f1["output"] > 0
    assert f1["packed_docs"] == f1["output"]
    assert f1["packed_sequences"] > 0

    # rerun -> identical funnel and identical curated ids
    out2 = str(tmp_path / "cur2")
    f2 = _run(out2)
    assert {k: v for k, v in f1.items() if not k.endswith("out")} == {
        k: v for k, v in f2.items() if not k.endswith("out")
    }
    ids1 = sorted(r.doc_id for r in spark.read.parquet(out1).collect())
    ids2 = sorted(r.doc_id for r in spark.read.parquet(out2).collect())
    assert ids1 == ids2

    # near-dup stage actually removed something on this corpus, and the
    # budget stage actually cut
    assert f1["after_near_dedup"] < f1["input"]
    assert f1["after_budget_cut"] < f1["after_calibration"]

    # packed plan is consistent: every kept doc appears exactly once
    packed = spark.read.parquet(out1 + "_packed")
    assert packed.select("doc_id").distinct().count() == f1["output"]


def test_curation_decontamination_drops_eval_overlap(spark, tmp_path):
    # eval set = verbatim copies of 5 curated docs -> those ids must drop
    base = spark.read.parquet(DOCS)
    eval_docs = base.limit(5).select("doc_id", "text")
    eval_path = str(tmp_path / "eval")
    eval_docs.write.parquet(eval_path)
    out = str(tmp_path / "cur-decon")
    f = _run(out, extra=("--eval-docs", eval_path, "--decontam-k", "3"))
    assert "after_decontamination" in f
    assert f["after_decontamination"] < f["after_calibration"]


def test_curation_trains_bpe_on_curated_corpus(spark, tmp_path):
    out = str(tmp_path / "cur_bpe")
    f = _run(out, extra=("--train-bpe", "5"))
    assert f["bpe_merges"] == 5
    merges = spark.read.parquet(f["bpe_out"]).orderBy("merge_rank").collect()
    assert [r.merge_rank for r in merges] == [1, 2, 3, 4, 5]
    # trained on the CURATED corpus: re-training in-process on the curated
    # output reproduces the job's merge table exactly
    from frontier_engine.textops import bpe_train

    again = bpe_train(spark.read.parquet(out), n_merges=5).collect()
    assert [tuple(r) for r in merges] == [tuple(r) for r in again]
