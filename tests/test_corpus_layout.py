"""Persistent bucketed corpus layout (SURVEY §4.2): the corpus side of the
fetch join must carry NO Exchange — in this run or any later one — and the
bucketed-mode crawl must be byte-equivalent to the default mode. Also the
records snapshot partition layout (partitionBy lang → partition pruning)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from frontier_engine import corpus as CL
from frontier_engine import fixtures
from frontier_engine.crawl import CrawlConfig, run_crawl
from frontier_engine.frontier import DrainConfig
from frontier_engine.snapshot import SnapshotStore


@pytest.fixture(scope="module")
def prepared(spark, tmp_path_factory):
    paths = fixtures.corpus("mini")
    loc = str(tmp_path_factory.mktemp("corpus") / "bucketed")
    name = CL.prepare_corpus(spark, paths["pages"], loc, n_buckets=8)
    return paths, loc, name


def test_fetch_join_has_no_corpus_side_exchange(spark, prepared):
    paths, loc, name = prepared
    pages = spark.table(name)
    drained = pages.select("url").limit(40)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = pages.join(drained, "url", "inner")
        plan = j._jdf.queryExecution().executedPlan().toString()
        n = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert n == 40
    # the corpus scan reads its bucket layout...
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    # ...and the ONLY shuffle in the join is the drained side
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_reopen_in_fresh_catalog_reuses_files(spark, prepared):
    paths, loc, name = prepared
    files_before = sorted(os.listdir(loc))
    n = spark.table(name).count()
    # simulate a new session: metadata gone, files remain
    spark.sql(f"DROP TABLE {name}")
    assert not spark.catalog.tableExists(name)
    name2 = CL.open_corpus(spark, loc)
    assert name2 == name and spark.catalog.tableExists(name)
    assert spark.table(name).count() == n
    assert sorted(os.listdir(loc)) == files_before  # metadata-only re-open
    # prepare_corpus on an already-prepared location is also metadata-only
    assert CL.prepare_corpus(spark, paths["pages"], loc, n_buckets=8) == name
    assert sorted(os.listdir(loc)) == files_before


def test_bucketed_crawl_equivalent_to_default(spark, prepared, tmp_path):
    paths, loc, _ = prepared
    cfg = CrawlConfig(max_epochs=3, drain=DrainConfig(epoch_seconds=30.0))
    a = run_crawl(spark, paths["pages"], paths["seeds"], paths["robots"],
                  str(tmp_path / "whA"), cfg)
    b = run_crawl(spark, paths["pages"], paths["seeds"], paths["robots"],
                  str(tmp_path / "whB"), cfg, corpus_location=loc)
    assert a["total_drained"] == b["total_drained"] > 0
    assert a["total_records"] == b["total_records"] > 0

    sa = SnapshotStore(str(tmp_path / "whA"))
    sb = SnapshotStore(str(tmp_path / "whB"))
    key = ["epoch", "host", "slot", "url"]
    ra = [tuple(r) for r in sa.read(spark, "schedule").select(*key).orderBy(*key).collect()]
    rb = [tuple(r) for r in sb.read(spark, "schedule").select(*key).orderBy(*key).collect()]
    assert ra == rb  # identical schedule, order included
    ta = {(r["url"], r["text"]) for r in sa.read(spark, "records").select("url", "text").collect()}
    tb = {(r["url"], r["text"]) for r in sb.read(spark, "records").select("url", "text").collect()}
    assert ta == tb  # byte-identical extracted text either way

    # records written partitionBy(lang): directories carry lang=..., and a
    # lang filter reaches the scan as a PartitionFilter (pruning before IO)
    rec_dirs = sb.current_manifest()["tables"]["records"]
    assert any(
        d.startswith("lang=") for p in rec_dirs for d in os.listdir(p)
        if os.path.isdir(os.path.join(p, d))
    )
    rec = sb.read(spark, "records").filter(F.col("lang") == "vi")
    plan = rec._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]
    assert rec.count() > 0


class TestBloomFilter:
    def test_bloom_bytes_are_written_and_lookup_correct(self, spark, tmp_path):
        paths = fixtures.corpus("mini")

        def total_bytes(loc):
            return sum(
                os.path.getsize(os.path.join(loc, f))
                for f in os.listdir(loc)
                if f.endswith(".parquet")
            )

        with_loc = str(tmp_path / "with_bloom")
        without_loc = str(tmp_path / "without_bloom")
        CL.prepare_corpus(
            spark, paths["pages"], with_loc, n_buckets=4, bloom_ndv=4096
        )
        CL.prepare_corpus(
            spark, paths["pages"], without_loc, n_buckets=4, bloom_filter=False
        )
        # same rows, same layout — the only delta is the bloom bitsets in
        # the footers, which must actually be present on disk
        grew = total_bytes(with_loc) - total_bytes(without_loc)
        assert grew > 1024, f"bloom filters not written (delta {grew}B)"

        # point lookup stays correct through the bloom'd files
        df = CL.corpus_df(spark, with_loc)
        probe = df.select("url").orderBy("url").limit(1).first()["url"]
        hit = df.filter(F.col("url") == probe)
        assert hit.count() == 1
        assert df.filter(F.col("url") == "https://never.example/x").count() == 0

    def test_marker_records_bloom_choice(self, spark, tmp_path):
        paths = fixtures.corpus("mini")
        loc = str(tmp_path / "marked")
        CL.prepare_corpus(spark, paths["pages"], loc, n_buckets=4)
        import json

        with open(os.path.join(loc, "_FE_CORPUS.json")) as f:
            assert json.load(f)["bloom_filter"] is True
