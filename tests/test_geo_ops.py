"""Geo + relational operator tests (duckdb cross-checked where useful)."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import functions as F

from frontier_engine import geo, ops


def _py_haversine(lat1, lon1, lat2, lon2):
    r = 6371.0088
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(math.radians(lat1)) * math.cos(
        math.radians(lat2)
    ) * math.sin(dlon / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def test_haversine(spark):
    pts = [
        (10.7769, 106.7009, 10.0452, 105.7469),  # HCMC → Can Tho
        (0.0, 0.0, 0.0, 0.0),
        (21.0278, 105.8342, 10.7769, 106.7009),  # Hanoi → HCMC
    ]
    df = spark.createDataFrame(pts, "lat1 double, lon1 double, lat2 double, lon2 double")
    rows = df.select(
        geo.haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for r, p in zip(rows, pts):
        assert abs(r["d"] - _py_haversine(*p)) < 1e-6


def test_geojson_point(spark):
    df = spark.createDataFrame([(106.7, 10.77)], "lng double, lat double")
    r = df.select(geo.geojson_point(F.col("lng"), F.col("lat")).alias("loc")).collect()[0]
    assert r["loc"]["type"] == "Point"
    assert r["loc"]["coordinates"] == [106.7, 10.77]


def test_geo_hierarchy_flatten(spark):
    cities = spark.createDataFrame([(1, "HCM"), (2, "HN")], "city_id int, city string")
    districts = spark.createDataFrame(
        [(10, 1, "Q1"), (11, 1, "Q3"), (20, 2, "BD")], "district_id int, city_id int, district string"
    )
    wards = spark.createDataFrame(
        [(100, 10, "P.Bến Nghé"), (101, 10, "P.Bến Thành")],
        "ward_id int, district_id int, ward string",
    )
    flat = geo.flatten_geo_hierarchy(cities, districts, wards)
    rows = flat.collect()
    assert len(rows) == 4  # Q1×2 wards + Q3 (null ward) + BD (null ward)
    q3 = [r for r in rows if r["district"] == "Q3"][0]
    assert q3["ward"] is None  # left-outer: missing districts → empty wards


def test_nearest_stores(spark):
    points = spark.createDataFrame(
        [("p1", 10.0, 106.0), ("p2", 21.0, 105.8)], "point_id string, lat double, lon double"
    )
    stores = spark.createDataFrame(
        [("s1", 10.1, 106.1), ("s2", 20.9, 105.9), ("s3", 15.0, 108.0)],
        "store_id string, lat double, lon double",
    )
    nn = geo.nearest_stores(points, stores, k=1)
    got = {r["point_id"]: r["store_id"] for r in nn.collect()}
    assert got == {"p1": "s1", "p2": "s2"}


def test_last_wins_and_upsert(spark):
    df = spark.createDataFrame(
        [("a", 1, 1, "old"), ("a", 1, 2, "new"), ("b", 2, 1, "only")],
        "store_id string, chain int, crawl_seq int, val string",
    )
    deduped = ops.last_wins(df, ["store_id", "chain"], [F.col("crawl_seq").desc()])
    got = {(r["store_id"], r["chain"]): r["val"] for r in deduped.collect()}
    assert got == {("a", 1): "new", ("b", 2): "only"}

    existing = spark.createDataFrame(
        [("a", "v1"), ("b", "v1")], "k string, v string"
    )
    updates = spark.createDataFrame([("b", "v2"), ("c", "v2")], "k string, v string")
    merged = ops.merge_upsert(existing, updates, ["k"])
    got = {r["k"]: r["v"] for r in merged.collect()}
    assert got == {"a": "v1", "b": "v2", "c": "v2"}
    # idempotence: re-applying the same batch is a no-op
    again = ops.merge_upsert(merged, updates, ["k"])
    assert {(r["k"], r["v"]) for r in again.collect()} == {(r["k"], r["v"]) for r in merged.collect()}


def test_allow_block_mapped(spark):
    df = spark.createDataFrame(
        [("Rau củ", 1), ("Bia", 2), ("Sữa", 3)], "title string, n int"
    )
    allow = spark.createDataFrame([("Rau củ",), ("Sữa",)], "title string")
    assert sorted(r["n"] for r in ops.semi_allowlist(df, allow, "title").collect()) == [1, 3]
    block = spark.createDataFrame([("Bia",)], "title string")
    assert sorted(r["n"] for r in ops.anti_blocklist(df, block, "title").collect()) == [1, 3]
    mapping = spark.createDataFrame([("Rau củ", "Vegetables")], "title string, title_en string")
    got = {
        r["title"]: r["out"]
        for r in ops.mapped_with_fallback(df, mapping, "title", "title_en", "out").collect()
    }
    assert got == {"Rau củ": "Vegetables", "Bia": "Bia", "Sữa": "Sữa"}


def test_top_k_per_group_vs_duckdb(spark):
    lineitem = "/root/testdata/sf0.001/lineitem.parquet"
    df = spark.read.parquet(lineitem)
    top = ops.top_k_per_group(
        df.select("l_orderkey", "l_partkey", "l_extendedprice"),
        ["l_orderkey"],
        [F.col("l_extendedprice").desc(), F.col("l_partkey").asc()],
        2,
    )
    got = sorted(
        (r["l_orderkey"], r["l_partkey"], r["l_extendedprice"]) for r in top.collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            select l_orderkey, l_partkey, l_extendedprice from (
              select *, row_number() over (
                partition by l_orderkey
                order by l_extendedprice desc, l_partkey asc) rn
              from '{lineitem}') where rn <= 2
            """
        ).fetchall()
    )
    assert got == want


def test_export_csv_quotes_embedded_commas(spark, tmp_path):
    df = spark.createDataFrame(
        [("Sữa, hộp 4", 1), ('He said "hi"', 2)], "name string, n int"
    )
    out = str(tmp_path / "csv")
    ops.export_csv(df, out)
    back = spark.read.option("header", "true").option("escape", '"').csv(out)
    got = {(r["name"], int(r["n"])) for r in back.collect()}
    assert got == {("Sữa, hộp 4", 1), ('He said "hi"', 2)}


def test_decode_cookie_json(spark):
    import urllib.parse

    raw = urllib.parse.quote('{"did": "abc-123", "v": 2}')
    df = spark.createDataFrame([(raw,)], "cookie string")
    r = df.select(ops.decode_cookie_json(F.col("cookie"), "$.did").alias("did")).collect()[0]
    assert r["did"] == "abc-123"


def test_geo_hierarchy_nest_roundtrip(spark):
    cities = spark.createDataFrame([(1, "HCM"), (2, "HN")], "city_id int, city string")
    districts = spark.createDataFrame(
        [(10, 1, "Q1"), (11, 1, "Q3"), (20, 2, "BD")],
        "district_id int, city_id int, district string",
    )
    wards = spark.createDataFrame(
        [(100, 10, "P.Bến Nghé"), (101, 10, "P.Bến Thành")],
        "ward_id int, district_id int, ward string",
    )
    flat = geo.flatten_geo_hierarchy(cities, districts, wards)
    nested = geo.nest_geo_hierarchy(flat.select("city_id", "district", "ward"))
    rows = {r["city_id"]: r["districts"] for r in nested.collect()}
    assert rows[1] == {"Q1": ["P.Bến Nghé", "P.Bến Thành"], "Q3": []}
    assert rows[2] == {"BD": []}

    back = geo.unnest_geo_hierarchy(nested)
    got = sorted((r["city_id"], r["district"], r["ward"]) for r in back.collect())
    want = sorted(
        (r["city_id"], r["district"], r["ward"])
        for r in flat.select("city_id", "district", "ward").collect()
    )
    assert got == want
