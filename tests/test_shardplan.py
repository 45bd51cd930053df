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
