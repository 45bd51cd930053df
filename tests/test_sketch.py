"""HyperLogLog sketch (frontier_engine.sketch): merge semantics, both
estimator branches, and the engine-exactness contract (integer sketch
state; estimate within the published error bound)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from frontier_engine import sketch as SK


def _urls(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("https://example.com/p"), F.col("id").cast("string")).alias(
            "u"
        ),
    )


def test_merge_equals_union(spark):
    """Register-wise max over two epochs == sketch of the union — the
    lineage roll-up property the whole module exists for."""
    a = _urls(spark, 800, 0)
    b = _urls(spark, 800, 400)  # overlaps a on [400, 800)
    ra = SK.hll_registers(a, ["g"], "u", p=8)
    rb = SK.hll_registers(b, ["g"], "u", p=8)
    merged = SK.hll_estimate(SK.hll_merge(ra, rb, ["g"]), ["g"], p=8)
    union = SK.hll_distinct(a.unionByName(b), ["g"], "u", p=8)
    mrow = merged.collect()[0].asDict()
    urow = union.collect()[0].asDict()
    assert mrow == urow  # exact integer state, not approximately equal


def test_raw_branch_accuracy(spark):
    """Large cardinality (v_zero == 0): raw harmonic estimator, within
    5 standard errors of 1.04/sqrt(m)."""
    n = 5000
    out = SK.hll_distinct(_urls(spark, n), ["g"], "u", p=8).collect()[0]
    assert out["v_zero"] == 0
    se = 1.04 / math.sqrt(256)
    assert abs(out["est"] - n) / n < 5 * se


def test_linear_branch_accuracy(spark):
    """Small cardinality: linear-counting branch, much tighter."""
    n = 120
    out = SK.hll_distinct(_urls(spark, n), ["g"], "u", p=8).collect()[0]
    assert out["v_zero"] > 0
    assert abs(out["est"] - n) / n < 0.15


def test_state_is_integer_and_bounded(spark):
    """s_scaled stays an exact BIGINT <= m * 2^(W+1) — the cross-engine
    fingerprint can never lose precision."""
    out = SK.hll_distinct(_urls(spark, 1000), ["g"], "u", p=8).collect()[0]
    assert isinstance(out["s_scaled"], int)
    assert 0 < out["s_scaled"] <= 256 * (1 << 53)


def test_p_out_of_range_raises(spark):
    try:
        SK.hll_registers(_urls(spark, 1), ["g"], "u", p=2)
    except ValueError as e:
        assert "out of range" in str(e)
    else:
        raise AssertionError("p=2 should raise")


def test_cms_never_undercounts_and_merges(spark):
    """CMS one-sided error: est >= exact for every key; merging two
    epochs' cells == sketching the concatenation."""
    from pyspark.sql import functions as F

    a = spark.range(0, 3000).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("k"), (F.col("id") % 37).cast("string")).alias("u"),
    )
    b = spark.range(0, 2000).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("k"), (F.col("id") % 11).cast("string")).alias("u"),
    )
    both = a.unionByName(b)
    cells = SK.cms_merge(
        SK.cms_cells(a, ["g"], "u"), SK.cms_cells(b, ["g"], "u"), ["g"]
    )
    direct = SK.cms_cells(both, ["g"], "u")
    assert sorted(map(tuple, cells.collect())) == sorted(
        map(tuple, direct.collect())
    )
    probes = both.select("g", F.col("u").alias("key")).distinct()
    est = {r["key"]: r["est"] for r in SK.cms_lookup(cells, probes, ["g"]).collect()}
    exact = {r["u"]: r["c"] for r in both.groupBy("u").agg(F.count("*").alias("c")).collect()}
    assert all(est[k] >= exact[k] for k in exact)
    # with 37 keys in 4x256 cells, most estimates should be exact
    assert sum(est[k] == exact[k] for k in exact) >= len(exact) * 0.9


def test_cms_absent_key_estimates_zero_or_small(spark):
    from pyspark.sql import functions as F

    data = spark.range(0, 500).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("u"),
    )
    cells = SK.cms_cells(data, ["g"], "u")
    probes = spark.createDataFrame([("g", "never-seen-key")], ["g", "key"])
    est = SK.cms_lookup(cells, probes, ["g"]).collect()[0]["est"]
    assert 0 <= est <= 500  # one-sided; usually 0 with sparse cells


# ------------------------------------------------- KMV


def test_kmv_exact_below_k(spark):
    # fewer than k distinct values: the sketch IS the set, estimate exact
    df = _urls(spark, 40)
    sk = SK.kmv_sketch(df, ["g"], "u", k=64)
    row = sk.collect()[0]
    assert row.n_sk == 40 and len(row.sketch) == 40
    assert row.sketch == sorted(row.sketch)
    est = sk.select(SK.kmv_estimate_col(F.col("sketch"), F.col("n_sk"), 64).alias("e"))
    assert est.collect()[0].e == 40.0


def test_kmv_estimator_branch_accuracy(spark):
    # 2000 distinct values, k=128: estimate within 30% (3-sigma ~ 26%)
    df = _urls(spark, 2000)
    sk = SK.kmv_sketch(df, ["g"], "u", k=128)
    est = sk.select(
        SK.kmv_estimate_col(F.col("sketch"), F.col("n_sk"), 128).alias("e")
    ).collect()[0].e
    assert 1400 < est < 2600, est


def test_kmv_overlap_identical_and_disjoint(spark):
    ident = spark.createDataFrame(
        [("a", f"v{i}") for i in range(30)] + [("b", f"v{i}") for i in range(30)],
        "g string, v string",
    )
    row = SK.kmv_pair_overlap(SK.kmv_sketch(ident, ["g"], "v", k=64), "g", k=64).collect()[0]
    assert (row.jacc_est, row.union_est, row.inter_est) == (1.0, 30.0, 30.0)
    disj = spark.createDataFrame(
        [("a", f"x{i}") for i in range(30)] + [("b", f"y{i}") for i in range(30)],
        "g string, v string",
    )
    row = SK.kmv_pair_overlap(SK.kmv_sketch(disj, ["g"], "v", k=64), "g", k=64).collect()[0]
    assert (row.jacc_est, row.union_est, row.inter_est) == (0.0, 60.0, 0.0)


def test_kmv_sketch_merge_is_union_prefix(spark):
    # the merged sketch equals the sketch of the unioned raw sets
    a = [("a", f"v{i}") for i in range(200)]
    b = [("b", f"v{i}") for i in range(100, 300)]
    df = spark.createDataFrame(a + b, "g string, v string")
    k = 32
    ov = SK.kmv_pair_overlap(SK.kmv_sketch(df, ["g"], "v", k=k), "g", k=k).collect()[0]
    direct = SK.kmv_sketch(
        df.withColumn("g", F.lit("u")), ["g"], "v", k=k
    ).collect()[0]
    kth = direct.sketch[k - 1]
    expect = (k - 1) * float(1 << 60) / kth
    assert abs(ov.union_est - expect) < 1e-6


def test_kmv_merge_is_lossless(spark):
    # sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the rollup property
    a = spark.createDataFrame([("g", f"v{i}") for i in range(150)], "g string, v string")
    b = spark.createDataFrame([("g", f"v{i}") for i in range(100, 250)], "g string, v string")
    k = 24
    sa, sb = SK.kmv_sketch(a, ["g"], "v", k=k), SK.kmv_sketch(b, ["g"], "v", k=k)
    merged = SK.kmv_merge(sa.unionByName(sb), ["g"], k=k).collect()[0]
    direct = SK.kmv_sketch(a.unionByName(b), ["g"], "v", k=k).collect()[0]
    assert merged.sketch == direct.sketch and merged.n_sk == direct.n_sk
