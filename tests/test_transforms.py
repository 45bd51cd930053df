"""Per-function parity: Spark expressions vs reference-semantics oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from frontier_engine import transforms as X
from tests import reference_oracle as O

# names chosen to hit every branch of both normalize chains (FIXTURES.md §6)
NAMES = [
    ("Sữa tươi 180ml", "hộp"),
    ("Gạo thơm ST25 5kg", "túi"),
    ("Gạo 5 kg thượng hạng", "g"),
    ("Đường 2.5 kg", "g"),
    ("Muối biển kg", "ml"),
    ("Trứng gà hộp 10 quả", "hộp"),
    ("Trứng vịt vỉ 6 quả", "vỉ"),
    ("Trứng gà 12 trứng", "vĩ"),
    ("Trứng 4 trứng tươi", "g"),
    ("Cam sành túi trái ngon", "túi"),
    ("Cam 1kg", "túi 1kg"),
    ("Chuối nải", "trái"),
    ("Bịch kẹo 200g", "bịch"),
    ("Thùng 24 lon 330 ml", "thùng"),
    ("Lốc 6 hộp 180 ml", "lốc"),
    ("Bánh quy 300g", "gói"),
    ("Dầu ăn 1 lít", "chai"),
    ("Dầu ăn chai 2 l", "chai"),
    ("Nước ngọt", "lon"),
    ("Táo cái to", "cái"),
    ("Phô mai vĩ 2kg", "vĩ"),
    ("Hộp 4 quả + hộp 6 quả", "hộp"),
    ("Kem 0 g lạ", "hũ"),
    ("Sữa kg đặc biệt", "khay"),
]


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(
        [(n, u, float(i % 3)) for i, (n, u) in enumerate(NAMES)],
        ["name", "unit", "net_value"],
    )


def test_extract_net_value(spark, names_df):
    rows = names_df.select(
        "name", "unit", X.extract_net_value_col(F.col("name"), F.lower(F.col("unit"))).alias("r")
    ).collect()
    for r in rows:
        ev, eu = O.o_extract_net(r["name"], r["unit"].lower())
        assert (r["r"]["value"], r["r"]["unit"]) == (ev, eu), r["name"]


def test_normalize_coop_parity(spark, names_df):
    rows = names_df.select(
        "name", "unit", "net_value",
        X.normalize_net_value_coop(F.col("unit"), F.col("net_value"), F.col("name")).alias("r"),
    ).collect()
    for r in rows:
        ev, eu = O.o_norm_coop(r["unit"], r["net_value"], r["name"])
        got = (r["r"]["value"], r["r"]["unit"])
        assert got == (float(ev), eu), (r["name"], r["unit"], got, (ev, eu))


def test_normalize_bhx_parity(spark, names_df):
    rows = names_df.select(
        "name", "unit", "net_value",
        X.normalize_net_value_bhx(F.col("unit"), F.col("net_value"), F.col("name")).alias("r"),
    ).collect()
    for r in rows:
        ev, eu = O.o_norm_bhx(r["unit"], r["net_value"], r["name"])
        got = (r["r"]["value"], r["r"]["unit"])
        assert got == (float(ev), eu), (r["name"], r["unit"], got, (ev, eu))


BHX_PRODUCTS = [
    {  # campaign precedence
        "name": "Sữa hộp 4 quả", "unit": "Hộp",
        "productPrices": [{"price": 100.0, "sysPrice": 120.0, "discountPercent": 10.0,
                           "netUnitValue": 2.0, "startTime": "2025-01-01", "dueTime": "2025-02-01",
                           "poDate": None}],
        "lstCampaingInfo": [{"productPrice": {"price": 90.0, "sysPrice": 120.0,
                             "discountPercent": 25.0, "netUnitValue": 3.0,
                             "startTime": None, "dueTime": None, "poDate": "2025-03-01"}}],
    },
    {  # base only
        "name": "Gạo 5kg", "unit": "Túi",
        "productPrices": [{"price": 200.0, "sysPrice": 220.0, "discountPercent": 0.0,
                           "netUnitValue": 0.0, "startTime": "", "dueTime": "2025-04-01",
                           "poDate": "2025-03-15"}],
        "lstCampaingInfo": [],
    },
    {"name": "Không có giá", "unit": "Lon", "productPrices": [], "lstCampaingInfo": []},
    {"name": "Nước 2 lít", "unit": "lít", "productPrices": None, "lstCampaingInfo": None},
]


def test_best_price_bhx_parity(spark):
    import json

    schema = (
        "name string, unit string, productPrices array<struct<price:double, sysPrice:double,"
        " discountPercent:double, netUnitValue:double, startTime:string, dueTime:string,"
        " poDate:string>>, lstCampaingInfo array<struct<productPrice:struct<price:double,"
        " sysPrice:double, discountPercent:double, netUnitValue:double, startTime:string,"
        " dueTime:string, poDate:string>>>"
    )
    df = spark.createDataFrame([tuple(p.get(k) for k in
        ("name", "unit", "productPrices", "lstCampaingInfo")) for p in [
        {**p,
         "productPrices": [tuple(i.get(k) for k in ("price","sysPrice","discountPercent","netUnitValue","startTime","dueTime","poDate")) for i in (p.get("productPrices") or [])] or (None if p.get("productPrices") is None else []),
         "lstCampaingInfo": [ (tuple(c["productPrice"].get(k) for k in ("price","sysPrice","discountPercent","netUnitValue","startTime","dueTime","poDate")),) for c in (p.get("lstCampaingInfo") or [])] or (None if p.get("lstCampaingInfo") is None else []),
        } for p in BHX_PRODUCTS]], schema)
    rows = df.select(
        X.extract_best_price_bhx(
            F.col("name"), F.col("unit"), F.col("productPrices"), F.col("lstCampaingInfo")
        ).alias("r")
    ).collect()
    for row, prod in zip(rows, BHX_PRODUCTS):
        want = O.o_best_price_bhx(prod)
        got = row["r"].asDict()
        for k in ("unit", "netUnitValue", "price", "sysPrice", "discountPercent", "date_begin", "date_end"):
            assert got[k] == want[k], (prod["name"], k, got[k], want[k])


COOP_PRODUCTS = [
    {"name": "Sữa chai 1 lít", "unit": "Chai", "price": 30.0, "discount": 25.0,
     "date_begin": "2025-01-01", "date_end": "2025-02-01"},
    {"name": "Gạo 5kg ngon", "unit": "g", "price": 150.0, "discount": None,
     "date_begin": None, "date_end": None},
    {"name": "Kẹo gói 300g", "unit": "Gói", "price": 12.0, "discount": 0.0,
     "date_begin": None, "date_end": None},
]


def test_best_price_coop_parity(spark):
    df = spark.createDataFrame(
        [tuple(p[k] for k in ("name", "unit", "price", "discount", "date_begin", "date_end"))
         for p in COOP_PRODUCTS],
        "name string, unit string, price double, discount double, date_begin string, date_end string",
    )
    rows = df.select(
        X.extract_best_price_coop(
            F.col("name"), F.col("unit"), F.col("price"), F.col("discount"),
            F.col("date_begin"), F.col("date_end"),
        ).alias("r")
    ).collect()
    for row, prod in zip(rows, COOP_PRODUCTS):
        want = O.o_best_price_coop(prod)
        got = row["r"].asDict()
        for k in ("unit", "netUnitValue", "price", "sysPrice", "discount", "date_begin", "date_end"):
            assert got[k] == pytest.approx(want[k]) if isinstance(want[k], float) else got[k] == want[k], (
                prod["name"], k, got[k], want[k])


TEXTS = [
    "Sữa Tươi Vinamilk 180ml",
    "a bc ĐẶC BIỆT  x yz",
    "",
    "ớt",
    None,
]


def test_tokenize_and_ngrams(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    rows = df.select(
        "text",
        X.tokenize_col(F.col("text")).alias("toks"),
        X.token_ngrams_col(F.col("text"), 2).alias("ngrams"),
    ).collect()
    for r in rows:
        if r["text"] is None:
            assert r["toks"] is None  # Spark null-propagates; engine guards at call sites
            continue
        assert r["toks"] == O.o_tokenize(r["text"]), r["text"]
        assert r["ngrams"] == O.o_token_ngrams(r["text"], 2), r["text"]


def test_normalize_name_udf(spark):
    vals = ["Bách Hóa Xanh!", "Cà-phê SỮA đá?", "  ab c  "]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(X.normalize_name_udf(F.col("s")).alias("n")).collect()
    for r, v in zip(rows, vals):
        assert r["n"] == X.normalize_name_py(v)
    assert X.normalize_name_py("Bách Hóa Xanh!") == "bach hoa xanh"


def test_parse_price(spark):
    vals = ["25.000đ", "1,500,000 VND", "free", "", "99"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(X.parse_price_col(F.col("s")).alias("p")).collect()
    for r, v in zip(rows, vals):
        assert r["p"] == O.o_parse_price(v), v


def test_cdc_join_and_lag(spark):
    new = spark.createDataFrame(
        [("s1", "a", 100.0), ("s1", "b", 100.9), ("s1", "c", 101.0), ("s2", "x", 5.0)],
        "store string, sku string, price double",
    )
    prev = spark.createDataFrame(
        [("s1", "a", 100.0), ("s1", "b", 100.0), ("s1", "c", 100.0)],
        "store string, sku string, price double",
    )
    rows = {
        (r["store"], r["sku"]): r["price_changed"]
        for r in X.cdc_changed(new, prev).collect()
    }
    assert rows == {
        ("s1", "a"): False,   # 0% change
        ("s1", "b"): False,   # 0.9% < 1%
        ("s1", "c"): True,    # exactly 1%
        ("s2", "x"): True,    # no prior row
    }
    hist = spark.createDataFrame(
        [("s1", "a", 1, 100.0), ("s1", "a", 2, 100.5), ("s1", "a", 3, 102.0)],
        "store string, sku string, ts int, price double",
    )
    lag_rows = {r["ts"]: r["price_changed"] for r in X.lag_cdc(hist, ("store", "sku"), "ts", "price").collect()}
    assert lag_rows == {1: True, 2: False, 3: True}


def test_price_index_matched_unit_value(spark):
    from frontier_engine.transforms import price_index

    rows = [
        # category A, base month 2024-01: items x (10 cents/unit), y (20)
        ("A", "2024-01", "x", 1000, 100), ("A", "2024-01", "y", 4000, 200),
        # 2024-02: x doubles, y absent, z new (z must NOT count)
        ("A", "2024-02", "x", 400, 20), ("A", "2024-02", "z", 999, 1),
        # 2024-03: both matched, prices unchanged -> exactly 100
        ("A", "2024-03", "x", 100, 10), ("A", "2024-03", "y", 400, 20),
        # category B: single month -> index 100 (base vs itself)
        ("B", "2024-02", "k", 500, 5),
    ]
    df = spark.createDataFrame(
        rows, "category string, period string, item string, spend_cents long, qty long"
    )
    got = {
        (r["category"], r["period"]): (r["n_matched"], r["index"])
        for r in price_index(df).collect()
    }
    # A/2024-02: matched={x}: V_t=400,Q_t=20 (20 c/u) vs V0=1000,Q0=100 (10 c/u) -> 200
    assert got[("A", "2024-02")] == (1, 200.0)
    # A/2024-03: matched={x,y}: unit value (500/30)/(5000/300)=100
    assert got[("A", "2024-03")] == (2, 100.0)
    assert got[("A", "2024-01")] == (2, 100.0)
    assert got[("B", "2024-02")] == (1, 100.0)
