"""Oracle parity for the approximate/sketch queries (MinHash, SimHash,
fingerprint, LSH/IVF ANN, embedding near-dup, multimodal, ngram index,
batched inference): each must be value-identical to its exact DuckDB
oracle on the fixed corpora — the same comparison the driver's
correctness gate runs at sf0.01, exercised here at sf0.001.

These are the ops whose equality rests on a determinism argument
(candidate-recall guarantees / closed-form fakes — see the notes in
__spark_entry__.py); this test is the executable form of that argument.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_contract import compare  # noqa: E402

SKETCH_QUERIES = [
    "minhash_near_dup",
    "dedup_clusters",
    "simhash_near_dup",
    "fingerprint",
    "lsh_ann",
    "ivf_ann",
    "ivf_ann_pruned",
    "ivfadc_ann",
    "embedding_near_dup",
    "multimodal_decode",
    "ngram_search",
    "batch_infer",
]


def test_sketch_queries_match_exact_oracles_sf0001(spark):
    failures = compare("/root/testdata/sf0.001", only=SKETCH_QUERIES, spark=spark)
    assert failures == 0
