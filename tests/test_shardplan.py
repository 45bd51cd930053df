from __future__ import annotations

from frontier_engine.shardplan import host_shard_plan


def _plan(spark, rows, n_shards, **kw):
    df = spark.createDataFrame(rows, "host string, weight long")
    return {
        r["host"]: (r["weight"], r["cum_before"], r["shard"])
        for r in host_shard_plan(df, n_shards, **kw).collect()
    }


def test_prefix_sums_exact_and_shards_contiguous(spark):
    rows = [(f"h{i:02d}", (i * 7) % 5 + 1) for i in range(40)]
    got = _plan(spark, rows, 4)
    assert len(got) == 40
    acc = 0
    last_shard = 0
    for h, wgt in sorted(rows):
        w, cum, shard = got[h]
        assert (w, cum) == (wgt, acc)
        assert shard >= last_shard  # contiguous, monotone in host order
        last_shard = shard
        acc += wgt
    assert last_shard == 3


def test_partitioning_invariance(spark):
    rows = [(f"x{i:03d}", i % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "host string, weight long")
    a = sorted(map(tuple, host_shard_plan(df.repartition(1), 8).collect()))
    b = sorted(
        map(
            tuple,
            host_shard_plan(
                df.repartition(13), 8, num_partitions=16
            ).collect(),
        )
    )
    c = sorted(
        map(tuple, host_shard_plan(df, 8, num_partitions=2).collect())
    )
    assert a == b == c


def test_balance_within_max_weight(spark):
    rows = [(f"h{i:03d}", 10 + (i % 17)) for i in range(300)]
    got = _plan(spark, rows, 8)
    total = sum(w for _, w in rows)
    loads = {}
    for w, _, shard in got.values():
        loads[shard] = loads.get(shard, 0) + w
    ideal = total / 8
    max_w = max(w for _, w in rows)
    assert set(loads) == set(range(8))
    for s, load in loads.items():
        assert abs(load - ideal) < max_w + ideal / 8 + 1, (s, load, ideal)


def test_mega_host_isolated_not_sunk(spark):
    # one host carries 90% of the mass: it must not drag neighbors into
    # its shard beyond the contiguity minimum
    rows = [("a", 5), ("b", 5), ("mega", 900), ("z", 5)]
    got = _plan(spark, rows, 4)
    assert got["mega"][2] != got["z"][2]


def test_zero_total_and_empty(spark):
    got = _plan(spark, [("a", 0), ("b", 0)], 4)
    assert got == {"a": (0, 0, 0), "b": (0, 0, 0)}
    empty = spark.createDataFrame([], "host string, weight long")
    assert host_shard_plan(empty, 4).count() == 0


def test_zorder_key_bit_interleave(spark):
    from pyspark.sql import functions as F

    from frontier_engine.shardplan import zorder_key

    df = spark.createDataFrame([(3, 1), (0, 0), (255, 255)], ["x", "y"])
    out = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    # x=3 (bits 0,1 set -> even positions 0,2), y=1 (bit 0 -> position 1)
    assert out[0]["z"] == 0b111
    assert out[1]["z"] == 0
    assert out[2]["z"] == (1 << 16) - 1  # full interleave of 8+8 set bits


def test_zorder_key_rejects_overflow(spark):
    from pyspark.sql import functions as F

    from frontier_engine.shardplan import zorder_key

    try:
        zorder_key([F.col("a")] * 8, bits=8)
    except ValueError as e:
        assert "int64" in str(e)
    else:
        raise AssertionError("8x8 bits must raise")


def test_zorder_write_prunes_non_leading_dim(spark, tmp_path):
    """The point of Z-order: per-file min/max footer stats stay tight on
    the NON-leading dimension too.  Quantified vs a lexicographic sort
    on the same data: mean per-file d2 span must shrink decisively."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from frontier_engine.shardplan import zorder_write

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("d1"),
        (F.pmod(F.col("id") * 2654435761, F.lit(4294967296)) % 64).alias("d2"),
    )

    def mean_span(path, col):
        import glob as g

        spans = []
        for f in g.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                spans.append(hi - lo)
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lex")
    zorder_write(df, zpath, ["d1", "d2"], bits=8, n_files=8)
    (
        df.repartitionByRange(8, "d1", "d2")
        .sortWithinPartitions("d1", "d2")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    # leading dim: both layouts keep it tight
    assert mean_span(zpath, "d1") <= 63
    # non-leading dim: lex sort spans ~the full 0..63 range per file,
    # z-order must cut the span decisively
    lex_span = mean_span(lpath, "d2")
    z_span = mean_span(zpath, "d2")
    assert lex_span > 40  # sanity: lex layout really is blind on d2
    assert z_span < 0.6 * lex_span


def test_compaction_plan_bins(spark):
    from frontier_engine.shardplan import compaction_plan
    files = spark.createDataFrame(
        [("p", "f1", 60), ("p", "f2", 60), ("p", "f3", 60), ("p", "f4", 10),
         ("q", "f1", 250)],
        "part string, file_id string, bytes long",
    )
    got = {
        (r.part, r.file_id): (r.bin_idx, r.bin_offset)
        for r in compaction_plan(files, ["part"], "file_id", "bytes", 100).collect()
    }
    # offsets 0,60,120,180 -> bins 0,0,1,1; q single file bin 0
    assert got == {
        ("p", "f1"): (0, 0), ("p", "f2"): (0, 60),
        ("p", "f3"): (1, 20), ("p", "f4"): (1, 80),
        ("q", "f1"): (0, 0),
    }
    # every bin except a partition's last reaches >= target once its
    # straddling file lands: bin 0 holds f1+f2+part of f3's mass
