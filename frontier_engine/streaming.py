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
- ``politeness_gate``     custom stateful operator (applyInPandasWithState):
                          per-host token budget per trigger with a bounded
                          deferred queue carried in state — the streaming
                          twin of the batch drain (T1) for a continuously
                          arriving frontier
- ``exact_dedup_gate``    stateful exact-dedup gate keyed by content hash —
                          the streaming twin of textops.incremental_dedup
                          (unbounded ledger, optional static history
                          anti-join), emitting first arrivals only
- ``neardup_band_gate``   stateful MinHash-LSH near-dup gate keyed by
                          (band, band_hash) — per-band collision verdicts
                          against all history; ``neardup_survivors``
                          reduces a trigger's verdicts to surviving docs
                          (foreachBatch side)

Tested with trigger(availableNow=True) over the synthetic corpus split into
multiple files (tests/test_streaming.py).
"""

from __future__ import annotations

import pandas as pd
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


GATE_OUTPUT_SCHEMA = (
    "host string, url string, url_hash long, warc_ts timestamp, batch_seq int"
)
# pending entries are packed "url\thash\tts_ns" strings: state schemas are
# flat structs, and one array<string> keeps the encoder trivial
GATE_STATE_SCHEMA = "pending array<string>, admitted long, dropped long"


def politeness_gate(
    pages: DataFrame,
    budget_per_trigger: int = 2,
    max_pending: int = 10_000,
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Custom stateful operator: per-host politeness on a streaming frontier.

    ``applyInPandasWithState`` keyed by host. Each trigger a host may emit at
    most ``budget_per_trigger`` URLs; the overflow is carried in group state
    as a bounded deferred queue (oldest-first, ``(warc_ts, url)`` order —
    deterministic) and drains in later triggers. Queue overflow beyond
    ``max_pending`` is dropped oldest-last and counted in state (the
    streaming form of the batch drain's budget cut at frontier.py). A host
    with a backlog arms a processing-time timeout, so the queue keeps
    draining one budget tranche per ``idle_timeout_ms`` even when the host
    sends no further traffic (requires a processing-time trigger — under
    ``availableNow`` only backlog reachable by arriving data drains). State
    exists ONLY while a backlog does: a fully drained host carries zero
    state, so state size is O(hosts-with-backlog × max_pending), bounded
    and watermark-free.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ident = with_identity(pages).select("host", "url", "url_hash", "warc_ts")
    budget = int(budget_per_trigger)

    def _pack(r) -> str:
        return f"{r[0]}\t{r[1]}\t{r[2]}"

    def _unpack(s: str):
        # rsplit: only the two trailing numeric fields are split off, so a
        # crawled URL containing a raw tab round-trips instead of crashing
        # the stateful operator on the next trigger
        url, hsh, ns = s.rsplit("\t", 2)
        return (url, int(hsh), int(ns))

    def gate(key, pdfs, state):
        host = key[0]
        if state.exists:
            pending_raw, admitted_total, dropped_total = state.get
            backlog = [_unpack(s) for s in pending_raw]
        else:
            backlog, admitted_total, dropped_total = [], 0, 0
        arrived = []
        for pdf in pdfs:  # empty iterator on a timeout invocation
            for u, hsh, ts in zip(pdf["url"], pdf["url_hash"], pdf["warc_ts"]):
                arrived.append((u, int(hsh), int(pd.Timestamp(ts).value)))
        rows = sorted(backlog + arrived, key=lambda r: (r[2], r[0]))
        admit, defer = rows[:budget], rows[budget:]
        if len(defer) > max_pending:
            dropped_total += len(defer) - max_pending
            defer = defer[:max_pending]
        admitted_total += len(admit)
        if defer:
            # backlog remains: keep state and arm a timeout so it drains on
            # processing time even if this host never sends data again
            state.update(([_pack(r) for r in defer], admitted_total, dropped_total))
            state.setTimeoutDuration(idle_timeout_ms)
        elif state.exists:
            # drained: drop state immediately — re-arming here would spin
            # empty timeout batches forever under trigger(availableNow)
            state.remove()
        if admit:
            yield pd.DataFrame(
                {
                    "host": [host] * len(admit),
                    "url": [r[0] for r in admit],
                    "url_hash": [r[1] for r in admit],
                    "warc_ts": [pd.Timestamp(r[2]) for r in admit],
                    "batch_seq": list(range(len(admit))),
                }
            )

    return ident.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=GATE_OUTPUT_SCHEMA,
        stateStructType=GATE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


EXACT_GATE_OUTPUT_SCHEMA = "url string, warc_ts timestamp, text string, h long"
EXACT_GATE_STATE_SCHEMA = "first_ts_ns long"


def exact_dedup_gate(
    pages: DataFrame,
    history_hashes: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of :func:`frontier_engine.textops.incremental_dedup`:
    an exact-dedup GATE over a continuously arriving page stream.  A page
    passes iff its body hash has never been seen — not in the optional
    static ``history_hashes`` ledger (one ``h: long`` column, e.g. the
    accumulated ledger of every previous dump) and not earlier in the
    stream.

    Same two-stage plan as the batch twin, re-expressed for streaming:
    the history probe is a stream-static **left-anti join** on the 8-byte
    hash (Catalyst handles it; the static side is broadcast while small),
    and the within-stream first-wins is ``applyInPandasWithState`` keyed
    by the content hash itself — the state key IS the hash bucket, so
    per-key state is one tiny struct (first-seen timestamp) and total
    state is exactly the distinct-hash ledger any exact dedup must hold
    (RocksDB state store territory at 10^10 URLs, the same scale posture
    as Common Crawl's cross-dump dedup).  No watermark: unlike
    :func:`dedup_stream`, duplicates are dropped FOREVER — which is why
    state never times out (``NoTimeout``).

    Determinism contract (matched value-for-value against the batch twin
    in tests/test_streaming.py): within a trigger a group emits its
    ``(warc_ts, url)``-minimal row; across triggers the earlier trigger
    wins.  When arrival order respects event time, the survivor set is
    exactly "first occurrence per distinct body".
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    d = pages.select(
        "url",
        "warc_ts",
        F.col(text_col).alias("text"),
        F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("h"),
    )
    if history_hashes is not None:
        hist = history_hashes.select(F.col("h").cast("long").alias("h")).distinct()
        d = d.join(hist, "h", "left_anti")

    def gate(key, pdfs, state):
        rows = []
        for pdf in pdfs:
            for u, ts, tx in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                rows.append((int(pd.Timestamp(ts).value), u, tx))
        if not rows:
            return
        if not state.exists:
            rows.sort(key=lambda r: (r[0], r[1]))
            ts_ns, u, tx = rows[0]
            state.update((ts_ns,))
            yield pd.DataFrame(
                {
                    "url": [u],
                    "warc_ts": [pd.Timestamp(ts_ns)],
                    "text": [tx],
                    "h": [int(key[0])],
                }
            )
        # state.exists: every row in this trigger is a later duplicate —
        # nothing emitted, nothing to update (first_ts is already minimal
        # because triggers process arrivals in order)

    return d.groupBy("h").applyInPandasWithState(
        gate,
        outputStructType=EXACT_GATE_OUTPUT_SCHEMA,
        stateStructType=EXACT_GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


NEARDUP_VERDICT_SCHEMA = (
    "url string, warc_ts timestamp, band int, collided boolean"
)
NEARDUP_STATE_SCHEMA = "first_ts_ns long"


def neardup_band_gate(
    pages: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup gate, stage 1: per-band collision
    verdicts.  The streaming twin of
    :func:`frontier_engine.textops.minhash_candidate_pairs`'s banding,
    turned into a gate: a document is a near-dup of history iff ANY of
    its LSH bands collides with a band seen before.

    Banding is byte-identical with the batch path (same
    ``shingle_hashes`` → ``minhash_signature_udf`` →
    ``minhash_bands`` expressions), then each document explodes into
    ``bands`` rows and the stateful operator keys on **(band,
    band_hash)** — the state key IS the LSH bucket, so per-key state is
    one struct and the state store holds exactly the distinct band
    hashes ever seen (8·N entries for N docs; RocksDB territory at
    crawl scale, and the same memory any LSH dedup index must pay).
    Every arriving band CLAIMS its bucket whether or not its document
    survives — the transitive-absorption semantics of MinHash dedup
    clustering (a doc near-dup of a dropped doc is itself a dup), which
    keeps the verdict per band local to one state key: no cross-group
    coordination, no second stateful operator.

    Verdict rule per group and trigger, deterministic at any
    parallelism: rows order by ``(warc_ts, url)``; the first row
    collides iff the bucket was already claimed in an earlier trigger,
    every later row collides.  Stage 2 (:func:`neardup_survivors`) is a
    plain per-trigger aggregation — run it on the micro-batch inside
    ``foreachBatch`` (all of a document's band verdicts are emitted in
    the trigger that processed it, so the reduction never crosses
    batches).

    Caveat shared with every MinHash op in the engine: empty/shingle-free
    documents all carry the sentinel signature and therefore gate each
    other — filter them upstream (C4/Gopher gates do) or route them
    through :func:`exact_dedup_gate`.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .textops import minhash_bands, minhash_signature_udf, shingle_hashes

    if num_perm % bands != 0:
        raise ValueError("neardup_band_gate: bands must divide num_perm")
    rows_per_band = num_perm // bands
    sig = minhash_signature_udf(num_perm)
    banded = (
        pages.select(
            "url",
            "warc_ts",
            sig(shingle_hashes(F.col(text_col), shingle_k)).alias("sig"),
        )
        .select(
            "url",
            "warc_ts",
            F.explode(
                minhash_bands(F.col("sig"), bands, rows_per_band)
            ).alias("bb"),
        )
        .select(
            "url",
            "warc_ts",
            F.col("bb.band").cast("int").alias("band"),
            F.col("bb.band_hash").alias("band_hash"),
        )
    )

    def gate(key, pdfs, state):
        rows = []
        for pdf in pdfs:
            for u, ts in zip(pdf["url"], pdf["warc_ts"]):
                rows.append((int(pd.Timestamp(ts).value), u))
        if not rows:
            return
        rows.sort()
        claimed = state.exists
        if not claimed:
            state.update((rows[0][0],))
        out_url = [r[1] for r in rows]
        out_ts = [pd.Timestamp(r[0]) for r in rows]
        collided = [claimed or i > 0 for i in range(len(rows))]
        yield pd.DataFrame(
            {
                "url": out_url,
                "warc_ts": out_ts,
                "band": [int(key[0])] * len(rows),
                "collided": collided,
            }
        )

    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        gate,
        outputStructType=NEARDUP_VERDICT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def neardup_survivors(verdicts: DataFrame) -> DataFrame:
    """Stage 2 of the streaming near-dup gate: reduce one trigger's
    per-band verdicts (``foreachBatch`` micro-batch of
    :func:`neardup_band_gate` output) to surviving documents — keep a
    document iff NO band collided.  One map-side-combinable aggregate
    keyed by the document; ``n_bands`` is surfaced so a consumer can
    assert completeness."""
    return (
        verdicts.groupBy("url", "warc_ts")
        .agg(
            F.max(F.col("collided").cast("int")).alias("_any"),
            F.count(F.lit(1)).cast("long").alias("n_bands"),
        )
        .where(F.col("_any") == 0)
        .drop("_any")
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


def session_rollup(
    pages: DataFrame,
    key_col: str = "host",
    ts_col: str = "warc_ts",
    gap: str = "6 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-key session windows over the ingest stream — the streaming
    twin of :func:`frontier_engine.ops.sessionize` via the built-in
    ``F.session_window`` (gap-merged state windows with watermark
    eviction): contiguous bursts of contact with one host roll up into
    one row as they close, which is how a continuously-running crawl
    emits its politeness-epoch ledger without a batch job over the full
    log.

    Both twins use Spark's boundary semantics (touching windows MERGE:
    an event at exactly ``last + gap`` still extends the session; only a
    strictly longer gap splits), so batch and streaming ledgers agree
    value-for-value — asserted boundary-for-boundary in
    tests/test_streaming.py.

    Returns (key_col, session_start, session_end_gap, n_events) where
    ``session_end_gap`` is the window end (last event + gap), the
    built-in's native bound.  Works on a static frame too (same code
    path, no watermark needed there).

    Scale shape: session state lives in the state store partitioned by
    key — per-host state is a handful of open windows; the watermark
    bounds it. No batch-side global window, no sort.
    """
    out = (
        (
            pages.withWatermark(ts_col, watermark)
            if pages.isStreaming
            else pages
        )
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return out.select(
        key_col,
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end_gap"),
        "n_events",
    )


ASOF_OUTPUT_SCHEMA = (
    "key long, event_id long, ts timestamp, value double,"
    " state_value double, state_ts timestamp"
)
ASOF_STATE_SCHEMA = "st_ts_ns long, st_value double"


def asof_enrich(tagged: DataFrame) -> DataFrame:
    """Streaming twin of :func:`frontier_engine.ops.asof_join` (backward):
    ONE tagged stream carries both state updates and probes —
    ``(key long, ts timestamp, is_state boolean, event_id long,
    value double)`` — and every probe is enriched with the latest state
    at-or-before it.  ``applyInPandasWithState`` keyed by ``key`` holds
    exactly ONE (ts, value) pair per key (the newest state seen), so
    state is O(keys) and watermark-free; within a trigger rows apply in
    (ts, state-before-probe) order — the same ``>=`` tie rule as the
    batch op, which it matches value-for-value when files arrive in
    event-time order (asserted in tests/test_streaming.py).

    Streaming caveat by construction: enrichment is at-trigger-time — a
    state update arriving in a LATER trigger than a probe it precedes in
    event time cannot retro-correct the already-emitted row (the same
    contract as any stream enrichment; the batch op is the healer on
    replay).  In the crawl this is "stamp each fetch with the robots/
    sitemap snapshot the crawler knew at fetch time".
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def enrich(key, pdfs, state):
        if state.exists:
            st_ts, st_val = state.get
        else:
            st_ts, st_val = None, None
        rows = []
        for pdf in pdfs:
            for ts, is_st, eid, val in zip(
                pdf["ts"], pdf["is_state"], pdf["event_id"], pdf["value"]
            ):
                rows.append(
                    (int(pd.Timestamp(ts).value), not bool(is_st), int(eid), float(val))
                )
        # (ts, probe-after-state) order: state at equal ts is visible (>=)
        rows.sort(key=lambda r: (r[0], r[1], r[2]))
        out = []
        for ts_ns, is_probe, eid, val in rows:
            if not is_probe:
                st_ts, st_val = ts_ns, val
            else:
                out.append((key[0], eid, pd.Timestamp(ts_ns), val,
                            st_val,
                            pd.Timestamp(st_ts) if st_ts is not None else None))
        if st_ts is not None:
            state.update((int(st_ts), float(st_val)))
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "event_id", "ts", "value", "state_value", "state_ts"],
            )

    return tagged.groupBy("key").applyInPandasWithState(
        enrich,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
