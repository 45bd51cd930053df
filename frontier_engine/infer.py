"""Batched model inference (C9): the reference's defining per-row cost is a
seq2seq translation model called inside the crawl loop, thread-capped to
protect the GPU (/root/reference/crawler/stores/bhx.py:39-48,
cooponline.py:169-178 with the semaphore at :28-29). The Spark-native form
is ``mapInPandas`` with a per-worker model singleton: the model loads ONCE
per Python worker process (not per row, not per batch), and every Arrow
batch is one vectorized ``predict`` call.

Contract: ``model_factory`` is a zero-arg callable returning an object with
``predict(pdf: pd.DataFrame) -> pd.DataFrame`` matching ``output_schema``.
The factory must be importable/picklable (top-level function or class).
Concurrency per executor is Spark's Python-worker count — the analogue of
the reference's thread semaphore — so a GPU-bound model gets
``spark.executor.cores`` controlled parallelism, not unbounded threads.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# process-level singleton cache: one model per (worker process, key)
_MODEL_CACHE: dict[str, object] = {}


def batch_infer(
    df: DataFrame,
    model_factory: Callable[[], object],
    output_schema: str,
    input_cols: list[str] | None = None,
    model_key: str | None = None,
) -> DataFrame:
    """Run batched inference over ``df`` with a per-worker model singleton.

    Batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (set it to the model's optimal batch). Rows the model drops are dropped;
    rows it adds are added — the operator imposes no 1:1 constraint.
    """
    key = model_key or f"{model_factory.__module__}.{getattr(model_factory, '__qualname__', repr(model_factory))}"
    cols = input_cols

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _MODEL_CACHE.get(key)
        if model is None:
            model = model_factory()
            _MODEL_CACHE[key] = model
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = model.predict(pdf if cols is None else pdf[cols])
            if out is not None and len(out):
                yield out

    src = df if cols is None else df.select(*cols)
    return src.mapInPandas(run, schema=output_schema)


class HeuristicQualityModel:
    """Deterministic fake 'model' used by tests and the oracle-checked
    query: a closed-form classifier over (doc_id, text) that an independent
    SQL oracle can recompute — the stand-in for a real embedder/classifier
    (swap the factory for one loading actual weights; nothing else changes).
    """

    def predict(self, pdf: pd.DataFrame) -> pd.DataFrame:
        texts = pdf["text"].fillna("")
        n_tokens = texts.map(lambda t: len(t.split()))
        n_chars = texts.map(len)
        score = ((n_tokens * 7 + n_chars) % 100) / 100.0
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "score": score.astype("float64"),
                "label": (score > 0.5).map({True: "keep", False: "drop"}),
            }
        )


def heuristic_quality_model() -> HeuristicQualityModel:
    return HeuristicQualityModel()
