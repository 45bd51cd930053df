"""Structured Streaming surface: continuous page ingest.

The batch engine drives the frontier loop (it feeds back into itself, which
Structured Streaming cannot express — SURVEY.md §1.2), but the INGEST side
of a crawl is naturally a stream: fetched pages arrive continuously and
must be deduplicated, extracted, and rolled up with late-data tolerance.
This module gives the engine that surface:

- ``stream_pages``        file-source stream over a pages directory with
                          the fixed input schema (no inference)
- ``dedup_stream``        watermarked ``dropDuplicates`` on url_hash — the
                          streaming twin of the seen-set (T4/T5; the
                          reference's upsert-idempotence generalized)
- ``host_window_counts``  per-host tumbling-window fetch counts with
                          watermark — the politeness/lineage metrics stream
- ``run_ingest``          foreachBatch loop: extract text (pandas UDF) and
                          append into a SnapshotStore table per micro-batch
                          (atomic commit per batch = epoch semantics)

Tested with trigger(availableNow=True) over the synthetic corpus split into
multiple files (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import canon
from .extract import text_udf
from .snapshot import SnapshotStore

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream of Common-Crawl-style pages (one file = one
    arriving WARC chunk). Explicit schema; one file per trigger by default
    is left to the caller's trigger/option choices."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )


def with_identity(pages: DataFrame) -> DataFrame:
    return canon.identity_first(
        pages.select(F.col("url").alias("raw"), "warc_ts", "html", "lang"),
        F.col("raw"),
        "c_url",
    ).select(
        F.col("c_url").alias("url"),
        "url_hash",
        "host",
        "warc_ts",
        "html",
        "lang",
    )


def dedup_stream(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on the canonical identity within the watermark
    horizon: late duplicates beyond the watermark age out of state instead
    of growing it forever (the unbounded-state version is the batch
    seen-set's job)."""
    return with_identity(pages).withWatermark("warc_ts", watermark).dropDuplicates(
        ["url_hash"]
    )


def host_window_counts(
    pages: DataFrame, window: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-host tumbling-window fetch counts — the streaming form of the
    lineage metrics (urls fetched per host per interval)."""
    return (
        with_identity(pages)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_pages",
        )
    )


def run_ingest(
    spark: SparkSession,
    pages_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
) -> dict:
    """Micro-batch ingest: stream → dedup → extract → snapshot append.

    Each micro-batch commits one snapshot (epoch = batch id), so the stream
    inherits the batch engine's resume-from-manifest semantics on top of
    Structured Streaming's own checkpoint.

    foreachBatch is AT-LEAST-ONCE: if the job dies after the snapshot
    commit but before the streaming checkpoint records the batch, the
    restarted query REPLAYS the batch. The sink is therefore idempotent per
    batch_id — replayed ids (already present in the manifest history's
    stream stats) are skipped, upgrading the pipeline to effectively-once.
    """
    store = SnapshotStore(warehouse)
    deduped = dedup_stream(stream_pages(spark, pages_dir), watermark)
    committed_ids = {
        m["stats"]["batch_id"]
        for m in store.history()
        if m["stats"].get("source") == "stream" and "batch_id" in m["stats"]
    }

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in committed_ids:
            # replay of a batch whose snapshot already committed: skip the
            # commit but still drain every partition — Spark's state-store
            # commit tracker requires foreachBatch to process the whole
            # DataFrame (the dedup state behind it must advance)
            batch_df.write.format("noop").mode("overwrite").save()
            return
        extracted = batch_df.select(
            "url",
            "url_hash",
            "host",
            "warc_ts",
            "lang",
            text_udf(F.col("html")).alias("text"),
            F.lit(batch_id).alias("epoch"),
        )
        store.commit(
            int(batch_id),
            replace={},
            append={"stream_records": extracted},
            stats={"source": "stream", "batch_id": int(batch_id)},
        )
        committed_ids.add(int(batch_id))

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    return {"batches": progress["batchId"] + 1 if progress else 0}
