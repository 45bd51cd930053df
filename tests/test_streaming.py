"""Structured Streaming ingest: dedup, windows, foreachBatch snapshots."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from frontier_engine import fixtures, streaming
from frontier_engine.extract import extract_text_py
from frontier_engine.snapshot import SnapshotStore


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    """Split the mini corpus into 3 parquet files = 3 arriving chunks,
    with one duplicated URL across chunks to exercise streaming dedup."""
    paths = fixtures.corpus("mini")
    t = pq.read_table(paths["pages"])
    d = tmp_path_factory.mktemp("stream-pages")
    n = t.num_rows
    third = n // 3
    pq.write_table(t.slice(0, third), os.path.join(d, "chunk0.parquet"))
    pq.write_table(t.slice(third, third), os.path.join(d, "chunk1.parquet"))
    # last chunk re-includes the first 10 rows → cross-batch duplicates
    import pyarrow as pa

    last = pa.concat_tables([t.slice(0, 10), t.slice(2 * third)])
    pq.write_table(last, os.path.join(d, "chunk2.parquet"))
    return str(d), n


def test_streaming_ingest_dedups_and_snapshots(spark, pages_dir, tmp_path):
    d, n_unique = pages_dir
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    res = streaming.run_ingest(spark, d, wh, ckpt)
    assert res["batches"] >= 1

    store = SnapshotStore(wh)
    recs = store.read(spark, "stream_records")
    rows = recs.collect()
    # exact dedup across micro-batches (duplicates arrived within watermark)
    assert len(rows) == n_unique
    assert len({r["url_hash"] for r in rows}) == n_unique
    # byte-identical extraction invariant holds on the streaming path too
    t = pq.read_table(os.path.join(fixtures.default_fixture_dir("mini"), "pages.parquet"))
    expected = {u: x for u, x in zip(t.column("url").to_pylist(), t.column("text").to_pylist())}
    for r in rows[:50]:
        assert r["text"] == expected[r["url"]]
    # one snapshot per micro-batch, appends accumulate
    hist = store.history()
    assert len(hist) >= 3  # 3 files, maxFilesPerTrigger=1


def test_replayed_batch_commits_once(spark, pages_dir, tmp_path):
    """foreachBatch is at-least-once: a batch whose snapshot already
    committed (job died before the streaming checkpoint advanced) is
    REPLAYED on restart and must not duplicate rows. Simulated by running
    the same input with a FRESH checkpoint (all batches replay) against a
    warehouse that already holds batch 0's snapshot."""
    d, n_unique = pages_dir
    wh = str(tmp_path / "wh-replay")
    streaming.run_ingest(spark, d, wh, str(tmp_path / "ckpt1"))
    store = SnapshotStore(wh)
    rows_first = store.read(spark, "stream_records").count()
    n_snapshots = len(store.history())

    # fresh checkpoint → Spark reprocesses every file as batches 0..n again
    streaming.run_ingest(spark, d, wh, str(tmp_path / "ckpt2"))
    assert store.read(spark, "stream_records").count() == rows_first
    assert len(store.history()) == n_snapshots  # no duplicate snapshots


def test_host_window_counts_batch_semantics(spark):
    """Windowed agg logic validated on a static frame (same code path)."""
    paths = fixtures.corpus("mini")
    pages = spark.read.parquet(paths["pages"])
    # run the same transformations on a batch frame
    from pyspark.sql import functions as F

    agg = (
        streaming.with_identity(pages)
        .groupBy(F.window("warc_ts", "1 minute").alias("win"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    total = agg.agg(F.sum("n_pages")).collect()[0][0]
    assert total == pages.count()


def test_politeness_gate_stateful(spark, tmp_path):
    """applyInPandasWithState token budget: per-host admissions per trigger
    are capped at the budget, the overflow carries in group state across
    micro-batches and drains via processing-time timeouts, in deterministic
    (warc_ts, url) order."""
    import datetime as dt
    import time

    import pyarrow as pa

    d = tmp_path / "gate-pages"
    d.mkdir()
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [(f"https://a.example/p{i}", base + dt.timedelta(seconds=i)) for i in range(6)]
    rows.append(("https://b.example/only", base))
    # adversarial: URLs with raw interior tabs (canonicalization keeps them)
    # must survive the state pack/unpack round-trip when deferred — a naive
    # "url\thash\tts" split() crashes the stateful operator on the next
    # trigger (ADVICE r2)
    rows += [
        (f"https://c.example/a\tb{i}", base + dt.timedelta(seconds=i)) for i in range(3)
    ]
    t = pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": [b"<html><body>x</body></html>"] * len(rows),
            "text": ["x"] * len(rows),
            "lang": ["en"] * len(rows),
        }
    )
    pq.write_table(t, str(d / "c0.parquet"))

    gated = streaming.politeness_gate(
        streaming.stream_pages(spark, str(d)), budget_per_trigger=2, idle_timeout_ms=500
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("gate_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "gate-ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # a.example backlog (4 URLs past the first tranche) drains 2 per
        # timeout-armed trigger; poll until all 7 admissions landed
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) n from gate_out").first()["n"] >= 10:
                break
            time.sleep(0.5)
        out = spark.sql("select * from gate_out").collect()
    finally:
        q.stop()

    a_urls = [r["url"] for r in out if r["host"] == "a.example"]
    # all 6 admitted across >=3 triggers, in deterministic warc_ts order
    assert a_urls == [f"https://a.example/p{i}" for i in range(6)]
    # never more than budget per trigger: batch_seq < budget everywhere
    assert all(r["batch_seq"] < 2 for r in out)
    assert [r["url"] for r in out if r["host"] == "b.example"] == ["https://b.example/only"]
    # tab-bearing URLs: one was deferred into state and round-tripped intact
    c_urls = [r["url"] for r in out if r["host"] == "c.example"]
    assert c_urls == [f"https://c.example/a\tb{i}" for i in range(3)]


def test_session_rollup_matches_batch_sessionize(spark):
    """Streaming/batch twins agree value-for-value, including the exact
    boundary: Spark merges TOUCHING windows, so an event at exactly
    last+gap extends the session; only a strictly longer gap splits."""
    import datetime as dt

    from frontier_engine.ops import sessionize
    from frontier_engine.streaming import session_rollup

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a.example", base),
        ("a.example", base + dt.timedelta(seconds=60)),   # exactly gap -> merges
        ("a.example", base + dt.timedelta(seconds=121)),  # 61s after -> new
        ("b.example", base),
        ("b.example", base + dt.timedelta(seconds=59)),   # just under -> same
    ]
    df = spark.createDataFrame(rows, ["host", "warc_ts"])
    sw = {
        (r["host"], r["session_start"]): r["n_events"]
        for r in session_rollup(df, gap="60 seconds").collect()
    }
    bt = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sessionize(
            df.withColumnRenamed("host", "user_id"), ts_col="warc_ts", gap_s=60
        ).collect()
    }
    assert sw == bt
    assert sw[("a.example", base)] == 2
    assert sw[("a.example", base + dt.timedelta(seconds=121))] == 1
    assert sw[("b.example", base)] == 2


def test_session_rollup_runs_as_stream(spark, tmp_path):
    """The same rollup executes as a real stream (complete mode — Spark
    supports append/complete, not update, for session-window aggs) and
    emits every session."""
    import datetime as dt

    from frontier_engine.streaming import session_rollup

    d = tmp_path / "sess-pages"
    d.mkdir()
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        ("https://a.example/1", base, b"", "x", "en"),
        ("https://a.example/2", base + dt.timedelta(seconds=10), b"", "x", "en"),
        ("https://a.example/3", base + dt.timedelta(hours=7), b"", "x", "en"),
    ]
    df = spark.createDataFrame(rows, streaming.PAGES_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(d))
    stream = streaming.stream_pages(spark, str(d))
    rolled = session_rollup(
        streaming.with_identity(stream), gap="6 hours"
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt-sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["host"], r["n_events"])
        for r in spark.sql("select * from sess_out").collect()
    }
    assert ("a.example", 2) in got and ("a.example", 1) in got


def test_asof_enrich_matches_batch_asof_join(spark, tmp_path):
    """Streaming as-of enrichment == ops.asof_join (backward) when files
    arrive in event-time order — including the state-at-equal-ts (>=)
    boundary and the no-prior-state null."""
    import datetime as dt

    from frontier_engine import streaming
    from frontier_engine.ops import asof_join

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    # (key, ts, is_state, event_id, value); probes 100+, states 1+
    early = [
        (7, ts(0), True, 1, 10.0),
        (7, ts(2), False, 100, 0.5),   # sees state@0
        (8, ts(1), False, 200, 0.7),   # no prior state -> null
        (7, ts(5), True, 2, 20.0),
        (7, ts(5), False, 101, 0.6),   # equal ts -> sees state@5 (>=)
    ]
    late = [
        (7, ts(9), False, 102, 0.8),   # state carried ACROSS triggers
        (8, ts(10), True, 3, 30.0),
        (8, ts(11), False, 201, 0.9),  # sees state@10
    ]
    schema = "key long, ts timestamp, is_state boolean, event_id long, value double"
    d = tmp_path / "asof-stream"
    d.mkdir()

    import pyarrow as pa

    def _write(rows, name):
        t = pa.table(
            {
                "key": [r[0] for r in rows],
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "is_state": [r[2] for r in rows],
                "event_id": [r[3] for r in rows],
                "value": [r[4] for r in rows],
            }
        )
        pq.write_table(t, str(d / name))

    _write(early, "f0.parquet")
    _write(late, "f1.parquet")

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out_dir, ckpt = str(tmp_path / "asof-out"), str(tmp_path / "asof-ckpt")
    (
        streaming.asof_enrich(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        r.event_id: (r.state_value, r.state_ts)
        for r in spark.read.parquet(out_dir).collect()
    }

    all_rows = early + late
    probes = spark.createDataFrame(
        [(k, t, e, v) for k, t, s, e, v in all_rows if not s],
        "key long, ts timestamp, event_id long, value double",
    )
    states = spark.createDataFrame(
        [(k, t, v) for k, t, s, e, v in all_rows if s],
        "key long, ts timestamp, sv double",
    )
    want = {
        r.event_id: (r.sv, r.sv_ts)
        for r in asof_join(probes, states, "key", "ts", ["sv"], "sv_ts").collect()
    }
    assert got == want
    assert got[200] == (None, None)
    assert got[101][0] == 20.0
    assert got[102][0] == 20.0


def _write_page_chunk(dirpath, name, rows):
    """rows: list of (url, ts_datetime, text)."""
    import pyarrow as pa

    t = pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": [b"<html>x</html>"] * len(rows),
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
        }
    )
    pq.write_table(t, os.path.join(dirpath, name))


def test_exact_dedup_gate_matches_incremental_dedup(spark, tmp_path):
    """Streaming exact-dedup gate == batch incremental_dedup value-for-value:
    same survivors (url, text, h), history hashes blocked by the
    stream-static anti-join, cross-trigger dups blocked by state, within-
    trigger dups reduced to the (warc_ts, url)-minimal row."""
    import datetime as dt

    from pyspark.sql import functions as F

    from frontier_engine.textops import incremental_dedup

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    d = tmp_path / "exact-pages"
    d.mkdir()
    # chunk0: alpha twice within one trigger (a1 first by ts AND min url)
    _write_page_chunk(str(d), "c0.parquet", [
        ("https://s.example/a1", ts(0), "alpha body"),
        ("https://s.example/a2", ts(1), "alpha body"),
        ("https://s.example/b", ts(2), "beta body"),
    ])
    # chunk1: cross-trigger dup of alpha + fresh gamma
    _write_page_chunk(str(d), "c1.parquet", [
        ("https://s.example/a3", ts(10), "alpha body"),
        ("https://s.example/g", ts(11), "gamma body"),
    ])
    # chunk2: dup of gamma, fresh delta, and a history-blocked body
    _write_page_chunk(str(d), "c2.parquet", [
        ("https://s.example/g2", ts(20), "gamma body"),
        ("https://s.example/dd", ts(21), "delta body"),
        ("https://s.example/h", ts(22), "history body"),
    ])

    history = spark.createDataFrame(
        [("history body",)], "text string"
    ).select(F.xxhash64("text").alias("h"))

    gated = streaming.exact_dedup_gate(
        streaming.stream_pages(spark, str(d)), history_hashes=history
    )
    (
        gated.writeStream.format("memory")
        .queryName("exact_gate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "exact-ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        (r.url, r.text, r.h)
        for r in spark.table("exact_gate_out").collect()
    }
    assert {u for (u, _, _) in got} == {
        "https://s.example/a1",
        "https://s.example/b",
        "https://s.example/g",
        "https://s.example/dd",
    }

    # batch twin over the union of every chunk (duplicate groups are
    # crafted so first-arrival == min url, where both rules agree)
    allpages = spark.read.parquet(str(d))
    want = {
        (r.url, r.text, r.h)
        for r in incremental_dedup(
            allpages.select(F.col("url"), F.col("text")),
            history,
            id_col="url",
        ).select("url", "text", "h").collect()
    }
    assert got == want


def test_neardup_band_gate_matches_batch_banding(spark, tmp_path):
    """Streaming MinHash band gate == batch first-per-band twin: a doc
    survives iff every one of its LSH bands is first-claimed by it in
    (trigger, warc_ts, url) order; near-dup templates collide, distinct
    texts pass, and every verdict carries all `bands` bands."""
    import datetime as dt

    from pyspark.sql import functions as F

    from frontier_engine.textops import (
        minhash_bands,
        minhash_signature_udf,
        shingle_hashes,
    )

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    words = [f"tok{i}" for i in range(60)]
    template = " ".join(words)
    near = " ".join(words[:-1] + ["CHANGED"])  # 59/60 shingles shared
    other1 = " ".join(f"alt{i}" for i in range(60))
    other2 = " ".join(f"misc{i}" for i in range(60))

    d = tmp_path / "nd-pages"
    d.mkdir()
    _write_page_chunk(str(d), "c0.parquet", [
        ("https://n.example/t1", ts(0), template),
    ])
    _write_page_chunk(str(d), "c1.parquet", [
        ("https://n.example/t2", ts(10), near),      # near-dup of t1
        ("https://n.example/o1", ts(11), other1),    # fresh
    ])
    _write_page_chunk(str(d), "c2.parquet", [
        ("https://n.example/t3", ts(20), template),  # exact dup of t1
        ("https://n.example/o2", ts(21), other2),    # fresh
    ])

    NUM_PERM, BANDS = 32, 8
    verdicts = streaming.neardup_band_gate(
        streaming.stream_pages(spark, str(d)), num_perm=NUM_PERM, bands=BANDS
    )
    survivors = []
    per_batch_bands = []

    def sink(bdf, bid):
        rows = streaming.neardup_survivors(bdf).collect()
        survivors.extend(rows)
        per_batch_bands.extend(r.n_bands for r in rows)

    (
        verdicts.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nd-ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(180)
    )
    got = {r.url for r in survivors}
    assert all(n == BANDS for n in per_batch_bands)

    # batch twin: same banding expressions over the full corpus; a doc
    # collides iff any of its bands was first claimed by an earlier
    # (warc_ts, url) row — transitive absorption included
    allpages = spark.read.parquet(str(d))
    sig = minhash_signature_udf(NUM_PERM)
    banded = (
        allpages.select(
            "url", "warc_ts", sig(shingle_hashes(F.col("text"), 3)).alias("sig")
        )
        .select(
            "url",
            "warc_ts",
            F.explode(minhash_bands(F.col("sig"), BANDS, NUM_PERM // BANDS)).alias("bb"),
        )
        .select("url", "warc_ts", "bb.band", "bb.band_hash")
    )
    firsts = banded.groupBy("band", "band_hash").agg(
        F.min(F.struct("warc_ts", "url")).alias("first")
    )
    want = {
        r.url
        for r in banded.join(firsts, ["band", "band_hash"])
        .groupBy("url")
        .agg(
            F.max(
                (F.col("first.url") != F.col("url")).cast("int")
            ).alias("any_lost")
        )
        .where(F.col("any_lost") == 0)
        .collect()
    }
    assert got == want
    # the fixture's intent: template survives once, near/exact dups gated
    assert "https://n.example/t1" in got
    assert "https://n.example/t2" not in got and "https://n.example/t3" not in got
    assert {"https://n.example/o1", "https://n.example/o2"} <= got
