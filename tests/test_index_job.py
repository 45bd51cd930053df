"""jobs/index.py end-to-end: passages + sharded postings (+ SQ8/IVF dense
artifacts) build, answer a BM25 probe, and reproduce identically on rerun."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _run(out_dir, extra=()):
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "index.py"),
         "--docs", DOCS, "--out", out_dir,
         "--embeddings", EMB, "--probe-terms", "fast,table",
         "--cores", "4", *extra],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_index_build_probe_and_determinism(spark, tmp_path):
    out1 = str(tmp_path / "idx1")
    s1 = _run(out1)
    assert s1["passages"] >= s1["input_docs"] > 0
    assert s1["postings"] > 0 and s1["vocab"] > 0
    assert s1["sq8_rows"] == s1["ivf_rows"] > 0
    assert s1["centroids"] == 16
    # the probe answered from the just-built index
    assert len(s1["probe_top"]) == 5
    assert all(p["score"] > 0 for p in s1["probe_top"])

    # artifacts are internally consistent
    passages = spark.read.parquet(os.path.join(out1, "passages"))
    postings = spark.read.parquet(os.path.join(out1, "postings"))
    assert passages.count() == s1["passages"]
    # every posting's pid exists in passages; shard layout is on disk
    n_orphans = (
        postings.join(passages.select("pid"),
                      postings.doc_id == passages.pid, "left_anti").count()
    )
    assert n_orphans == 0
    shard_dirs = [d for d in os.listdir(os.path.join(out1, "postings"))
                  if d.startswith("shard=")]
    assert len(shard_dirs) > 1
    # ivf list ids land within the trained centroid range
    ivf = spark.read.parquet(os.path.join(out1, "ivf"))
    lids = [r.list_id for r in ivf.select("list_id").distinct().collect()]
    assert all(0 <= l < 16 for l in lids)

    # rerun is deterministic: same summary, same probe, same passage set
    out2 = str(tmp_path / "idx2")
    s2 = _run(out2)
    assert {k: v for k, v in s1.items() if not k.endswith("_out")} == {
        k: v for k, v in s2.items() if not k.endswith("_out")
    }
    p1 = sorted(r.pid for r in passages.select("pid").collect())
    p2 = sorted(
        r.pid
        for r in spark.read.parquet(os.path.join(out2, "passages"))
        .select("pid")
        .collect()
    )
    assert p1 == p2
