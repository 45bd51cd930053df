"""Unit tests for ops.asof_join / ops.range_join / ops.weighted_sample —
boundary semantics the sf-scale oracle queries exercise only statistically."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from frontier_engine import ops

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


class TestAsofJoin:
    def _run(self, spark, probe_rows, state_rows):
        probe = spark.createDataFrame(probe_rows, "id long, key long, ts timestamp, v double")
        state = spark.createDataFrame(state_rows, "key long, ts timestamp, sv double")
        out = ops.asof_join(probe, state, "key", "ts", ["sv"], "sv_ts")
        return {r.id: (r.sv, r.sv_ts) for r in out.collect()}

    def test_latest_at_or_before_wins(self, spark):
        got = self._run(
            spark,
            [(1, 7, _ts(10), 0.0)],
            [(7, _ts(1), 1.0), (7, _ts(9), 2.0), (7, _ts(11), 3.0)],
        )
        assert got == {1: (2.0, _ts(9))}

    def test_equal_ts_state_is_visible(self, spark):
        got = self._run(spark, [(1, 7, _ts(5), 0.0)], [(7, _ts(5), 9.0)])
        assert got == {1: (9.0, _ts(5))}

    def test_no_prior_state_yields_null(self, spark):
        got = self._run(spark, [(1, 7, _ts(5), 0.0)], [(7, _ts(6), 9.0)])
        assert got == {1: (None, None)}

    def test_keys_do_not_leak(self, spark):
        got = self._run(
            spark,
            [(1, 7, _ts(10), 0.0), (2, 8, _ts(10), 0.0)],
            [(7, _ts(1), 1.0)],
        )
        assert got == {1: (1.0, _ts(1)), 2: (None, None)}

    def test_multiple_probes_share_one_state(self, spark):
        got = self._run(
            spark,
            [(1, 7, _ts(2), 0.0), (2, 7, _ts(3), 0.0)],
            [(7, _ts(1), 5.0)],
        )
        assert got == {1: (5.0, _ts(1)), 2: (5.0, _ts(1))}


class TestRangeJoin:
    def _run(self, spark, fact_minutes, intervals, bucket_s=60):
        facts = spark.createDataFrame(
            [(i, _ts(m)) for i, m in enumerate(fact_minutes)], "fid long, ts timestamp"
        )
        iv = spark.createDataFrame(
            [(j, _ts(a), _ts(b)) for j, (a, b) in enumerate(intervals)],
            "iid long, w_start timestamp, w_end timestamp",
        )
        out = ops.range_join(facts, iv, "ts", "w_start", "w_end", bucket_s=bucket_s)
        return sorted((r.iid, r.fid) for r in out.collect())

    def test_half_open_boundaries(self, spark):
        # fact at start is IN, fact at end is OUT
        assert self._run(spark, [10.0, 20.0], [(10, 20)]) == [(0, 0)]

    def test_interval_spanning_many_buckets(self, spark):
        # 1-minute buckets, 30-minute interval: every in-window fact found once
        got = self._run(spark, [0.0, 5.0, 29.9, 30.0, 31.0], [(0, 30)], bucket_s=60)
        assert got == [(0, 0), (0, 1), (0, 2)]

    def test_overlapping_intervals_both_match(self, spark):
        got = self._run(spark, [15.0], [(10, 20), (14, 16)])
        assert got == [(0, 0), (1, 0)]

    def test_no_duplicate_pairs(self, spark):
        # fact bucket inside a long interval: exactly one output row
        got = self._run(spark, [500.0], [(0, 1000)], bucket_s=60)
        assert got == [(0, 0)]


class TestWeightedSample:
    @staticmethod
    def _key(doc_id: int, w: float) -> float:
        h = ((doc_id % 2147483648) * 2654435761) % 4294967296
        return math.log((h + 0.5) / 4294967296.0) / w

    def test_matches_reference_formula(self, spark):
        rows = [(i, "en", float(1 + i % 13)) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
        got = sorted(
            r.doc_id for r in ops.weighted_sample(df, ["lang"], 10, "doc_id", "w").collect()
        )
        want = sorted(
            i for i, _, w in sorted(rows, key=lambda r: (-self._key(r[0], r[2]), r[0]))[:10]
        )
        assert got == want

    def test_nonpositive_weights_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, "en", 0.0), (2, "en", -5.0), (3, "en", 1.0)],
            "doc_id long, lang string, w double",
        )
        got = [r.doc_id for r in ops.weighted_sample(df, ["lang"], 10, "doc_id", "w").collect()]
        assert got == [3]

    def test_k_larger_than_stratum(self, spark):
        df = spark.createDataFrame(
            [(1, "en", 1.0), (2, "vi", 2.0)], "doc_id long, lang string, w double"
        )
        out = ops.weighted_sample(df, ["lang"], 5, "doc_id", "w")
        assert out.count() == 2

    def test_heavy_weight_dominates(self, spark):
        # one row with overwhelming weight is (near-)certain to be drawn:
        # its key = ln(u)/1e9 ~ 0, above any unit-weight key for these ids
        rows = [(i, "en", 1.0) for i in range(50)] + [(999, "en", 1e9)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
        got = {r.doc_id for r in ops.weighted_sample(df, ["lang"], 1, "doc_id", "w").collect()}
        assert got == {999}


class TestAsofDirectionTolerance:
    def _run(self, spark, probe_rows, state_rows, **kw):
        probe = spark.createDataFrame(probe_rows, "id long, key long, ts timestamp, v double")
        state = spark.createDataFrame(state_rows, "key long, ts timestamp, sv double")
        out = ops.asof_join(probe, state, "key", "ts", ["sv"], "sv_ts", **kw)
        return {r.id: (r.sv, r.sv_ts) for r in out.collect()}

    def test_forward_picks_earliest_at_or_after(self, spark):
        got = self._run(
            spark,
            [(1, 7, _ts(10), 0.0)],
            [(7, _ts(9), 1.0), (7, _ts(11), 2.0), (7, _ts(12), 3.0)],
            direction="forward",
        )
        assert got == {1: (2.0, _ts(11))}

    def test_forward_equal_ts_visible(self, spark):
        got = self._run(spark, [(1, 7, _ts(5), 0.0)], [(7, _ts(5), 9.0)], direction="forward")
        assert got == {1: (9.0, _ts(5))}

    def test_tolerance_nulls_stale_match(self, spark):
        got = self._run(
            spark,
            [(1, 7, _ts(10), 0.0), (2, 7, _ts(70), 0.0)],
            [(7, _ts(9), 1.0)],
            tolerance_s=300,
        )
        assert got == {1: (1.0, _ts(9)), 2: (None, None)}

    def test_bad_direction_raises(self, spark):
        import pytest as _pt
        with _pt.raises(ValueError):
            self._run(spark, [(1, 7, _ts(1), 0.0)], [(7, _ts(1), 1.0)], direction="sideways")


class TestFunnel:
    def test_sequential_semantics(self, spark):
        rows = [
            # u1 completes all three in order
            (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
            # u2: click BEFORE first view must not count; no click after
            (2, _ts(5), "click"), (2, _ts(6), "view"),
            # u3: purchase before click -> stops at click
            (3, _ts(0), "view"), (3, _ts(1), "purchase"), (3, _ts(2), "click"),
            # u4: never views -> absent
            (4, _ts(0), "click"),
        ]
        e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        got = {r.user_id: (r.t_1, r.t_2, r.t_3)
               for r in ops.funnel(e, ["view", "click", "purchase"]).collect()}
        assert set(got) == {1, 2, 3}
        assert got[1] == (_ts(0), _ts(1), _ts(2))
        assert got[2] == (_ts(6), None, None)
        assert got[3] == (_ts(0), _ts(2), None)

    def test_equal_ts_counts(self, spark):
        e = spark.createDataFrame(
            [(1, _ts(0), "view"), (1, _ts(0), "click")],
            "user_id long, ts timestamp, event_type string",
        )
        got = ops.funnel(e, ["view", "click"]).collect()[0]
        assert (got.t_1, got.t_2) == (_ts(0), _ts(0))


class TestTrimmedMean:
    def test_exact_trim(self, spark):
        # 10 values 1..10, 10% trim -> drop 1 low + 1 high -> mean(2..9)=5.5
        df = spark.createDataFrame(
            [(i, "g", i) for i in range(1, 11)], "doc_id long, g string, v long"
        )
        r = ops.trimmed_mean(df, ["g"], "v", "doc_id", 1, 10).collect()[0]
        assert (r.n_kept, r.n_total, r.sum_kept, r.trimmed_mean) == (8, 10, 44, 5.5)

    def test_outlier_resistance(self, spark):
        df = spark.createDataFrame(
            [(i, "g", 100) for i in range(20)] + [(99, "g", 10**9)],
            "doc_id long, g string, v long",
        )
        r = ops.trimmed_mean(df, ["g"], "v", "doc_id", 1, 10).collect()[0]
        assert r.trimmed_mean == 100.0  # the blob is trimmed away

    def test_bad_fraction_raises(self, spark):
        import pytest as _pt
        df = spark.createDataFrame([(1, "g", 1)], "doc_id long, g string, v long")
        with _pt.raises(ValueError):
            ops.trimmed_mean(df, ["g"], "v", "doc_id", 1, 2)


class TestHoldoutSplit:
    def _docs(self, spark, n_domains=20, per=5):
        rows = [
            (d * 100 + i, f"dom{d}.example")
            for d in range(n_domains)
            for i in range(per)
        ]
        return spark.createDataFrame(rows, "doc_id long, domain string")

    def test_domains_never_straddle_splits(self, spark):
        out = ops.holdout_split(self._docs(spark), "domain", 25, 20)
        per_domain = (
            out.groupBy("domain")
            .agg(F.countDistinct("split").alias("k"))
            .agg(F.max("k"))
            .first()[0]
        )
        assert per_domain == 1

    def test_assignment_stable_under_corpus_growth(self, spark):
        small = ops.holdout_split(self._docs(spark, n_domains=10), "domain", 25, 20)
        big = ops.holdout_split(self._docs(spark, n_domains=40), "domain", 25, 20)
        s = {r["domain"]: r["split"] for r in small.select("domain", "split").distinct().collect()}
        b = {r["domain"]: r["split"] for r in big.select("domain", "split").distinct().collect()}
        assert all(b[d] == v for d, v in s.items())

    def test_split_fractions_roughly_match_percents(self, spark):
        out = ops.holdout_split(self._docs(spark, n_domains=400, per=1), "domain", 25, 20)
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        # 400 domains, md5-uniform: test ≈ 80, val ≈ 100, train ≈ 220
        assert abs(counts["test"] - 80) < 40
        assert abs(counts["val"] - 100) < 45
        assert counts["train"] > counts["val"] > 0


class TestEnsureMinPartitions:
    def test_in_memory_single_partition_is_spread(self, spark):
        from frontier_engine.ops import ensure_min_partitions

        df = spark.range(100).coalesce(1)
        out = ensure_min_partitions(df, min_parts=8)
        # .rdd is banned in the package, not in tests — this IS the check
        assert out.rdd.getNumPartitions() == 8
        assert out.count() == 100

    def test_parallel_enough_file_scan_untouched(self, spark, tmp_path):
        from frontier_engine.ops import ensure_min_partitions

        p = str(tmp_path / "t")
        spark.range(1000).repartition(4).write.parquet(p)
        df = spark.read.parquet(p)
        # 4 files >= min_parts=2: the helper must return the df unchanged
        # (same object — no shuffle inserted on the already-parallel path)
        assert ensure_min_partitions(df, min_parts=2) is df
