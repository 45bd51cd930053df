"""Reference scalar-function library (SURVEY.md §2.7) as Spark expressions.

Every function here re-expresses the SEMANTICS of a per-row Python function
in the reference as a JVM-side column expression (whole-stage codegen) or,
where Spark has no builtin (Unicode NFKD), a vectorized pandas UDF. Each is
parity-tested against a pure-Python oracle transcription in
tests/reference_oracle.py.

Citations (reference file:line):
- C1 extract_net_value_and_unit : cooponline.py:39-45, bhx.py:51-57
- C2 normalize_net_value        : cooponline.py:47-100 (Coop variant),
                                  bhx.py:59-97 (BHX variant — the two
                                  cascades differ deliberately)
- C3 extract_best_price         : cooponline.py:102-129, bhx.py:99-144
- C4 tokenize_by_whitespace     : cooponline.py:132-135
- C5/C6 ngrams                  : cooponline.py:137-147
- C7 _normalize_name (NFKD)     : cooponline.py:349-354
- C8 _parse_price               : cooponline.py:356-359
- C10 parse_date_safe           : db/__init__.py:6-12
- J5/T4 CDC gate                : common/cdc.py:4-11
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# C1 — the shared net-value/unit regex (identical in both chains)
NET_PATTERN = r"(\d+(?:\.\d+)?)\s*(g|ml|lít|kg|gói|l)\b"


def _last_match(name_lower: Column) -> Column:
    # try_element_at: NULL (not ANSI error) on the empty-match case
    return F.try_element_at(F.regexp_extract_all(name_lower, F.lit(NET_PATTERN), 0), F.lit(-1))


def extract_net_value_col(name: Column, fallback_unit: Column) -> Column:
    """C1 → struct(value double, unit string): LAST regex match wins, else
    (1, fallback_unit)."""
    nl = F.lower(name)
    last = _last_match(nl)
    value = F.when(
        last.isNotNull(), F.regexp_extract(last, NET_PATTERN, 1).cast("double")
    ).otherwise(F.lit(1.0))
    unit = F.when(last.isNotNull(), F.regexp_extract(last, NET_PATTERN, 2)).otherwise(
        fallback_unit
    )
    return F.struct(value.alias("value"), unit.alias("unit"))


def _sum_int_matches(name_lower: Column, pattern: str) -> Column:
    """A1 pack-size sum: fold of int casts over all regex group-1 matches."""
    return F.aggregate(
        F.transform(
            F.regexp_extract_all(name_lower, F.lit(pattern), 1),
            lambda x: x.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_PACK_PATTERN = r"(thùng|lốc)\s*(\d+).*?(\d+(\.\d+)?)\s*(g|ml)"


def _pack_value(name_lower: Column) -> Column:
    """A2 pack multiply: count × per-item from 'thùng/lốc N … M ml'."""
    return (
        F.regexp_extract(name_lower, _PACK_PATTERN, 2).cast("double")
        * F.regexp_extract(name_lower, _PACK_PATTERN, 3).cast("double")
    )


def normalize_net_value_coop(unit: Column, net_value: Column, name: Column) -> Column:
    """C2, Coop chain (cooponline.py:47-100) → struct(value, unit).

    NB the Coop chain REPLACES the incoming net_value with the name
    extraction before the cascade (cooponline.py:52), so ``net_value`` only
    matters for the final fallback.
    """
    nl = F.lower(name)
    ext = extract_net_value_col(name, F.lower(unit))
    nv, u = ext["value"], ext["unit"]

    kg_opt = r"(\d+(\.\d+)?)?\s*kg"
    kg_group = F.regexp_extract(nl, kg_opt, 1)
    trung_group = F.regexp_extract(nl, r"(\d+)\s*trứng", 1)
    hop_sum = _sum_int_matches(nl, r"hộp\s*(\d+)")

    def s(v: Column, un: Column) -> Column:
        return F.struct(v.cast("double").alias("value"), un.alias("unit"))

    pack_cond = nl.rlike(_PACK_PATTERN)
    result = (
        F.when(u == "kg", s(nv * 1000, F.lit("g")))
        .when(u == "l", s(nv * 1000, F.lit("ml")))
        .when(
            u.isin("g", "ml") & nl.rlike(kg_opt),
            F.when(kg_group.rlike("^[0-9]+$"), s(kg_group.cast("double") * 1000, u))
            .otherwise(s(F.lit(1000.0), u)),
        )
        .when(u == "cái", s(nv * 1000, F.lit("g")))
        .when(
            u.isin("g", "hộp", "vĩ") & nl.contains("trứng") & (trung_group != ""),
            s(trung_group.cast("double"), F.lit("hộp")),
        )
        .when((u == "vĩ") & nl.contains("kg"), s(nv * 1000, F.lit("g")))
        .when(u.isin("trái", "túi", "bịch"), s(nv * 1000, u))
        .when((u == "hộp") & nl.contains("quả") & nl.rlike(r"hộp\s*(\d+)"), s(hop_sum, u))
        .when(pack_cond, s(_pack_value(nl), u))
        .when(nv > 0, s(nv, u))
        .otherwise(s(F.when(nv != 0, nv).otherwise(F.lit(1000.0)), u))
    )
    return result


def normalize_net_value_bhx(unit: Column, net_value: Column, name: Column) -> Column:
    """C2, BHX chain (bhx.py:59-97) → struct(value, unit)."""
    nl = F.lower(name)
    u0 = F.lower(unit)
    nv0 = net_value.cast("double")
    ext = extract_net_value_col(name, u0)
    extracted = ext["value"]

    kg_req = r"(\d+(\.\d+)?)\s*kg"
    kg_group = F.regexp_extract(nl, kg_req, 1)

    def s(v: Column, un: Column) -> Column:
        return F.struct(v.cast("double").alias("value"), un.alias("unit"))

    hop_sum = _sum_int_matches(nl, r"hộp\s*(\d+)")
    vi_sum = _sum_int_matches(nl, r"vỉ\s*(\d+)")

    result = (
        F.when(u0 == "kg", s(nv0 * 1000, F.lit("g")))
        .when(u0 == "lít", s(nv0 * 1000, F.lit("ml")))
        .when(
            ~u0.isin("kg", "g", "ml", "lít") & (kg_group != ""),
            s(kg_group.cast("double") * 1000, u0),
        )
        .when(u0 == "túi 1kg", s(nv0 * 1000, F.lit("túi")))
        .when((u0 == "túi") & nl.contains("trái"), s(F.lit(700.0), u0))
        .when(
            (u0 == "hộp") & nl.contains("quả") & nl.rlike(r"hộp\s*(\d+)"), s(hop_sum, u0)
        )
        .when(
            (u0 == "vỉ") & nl.contains("quả") & nl.rlike(r"vỉ\s*(\d+)"), s(vi_sum, u0)
        )
        .when(nl.rlike(_PACK_PATTERN), s(_pack_value(nl), u0))
        .when(extracted > 0, s(extracted, u0))
        .otherwise(s(F.when(nv0 != 0, nv0).otherwise(F.lit(1.0)), u0))
    )
    return result


# ---------------------------------------------------------------- C3 price

BHX_PRICE_INFO = T.StructType(
    [
        T.StructField("price", T.DoubleType()),
        T.StructField("sysPrice", T.DoubleType()),
        T.StructField("discountPercent", T.DoubleType()),
        T.StructField("netUnitValue", T.DoubleType()),
        T.StructField("startTime", T.StringType()),
        T.StructField("dueTime", T.StringType()),
        T.StructField("poDate", T.StringType()),
    ]
)


def extract_best_price_bhx(
    name: Column, unit: Column, product_prices: Column, campaign_info: Column
) -> Column:
    """C3 BHX (bhx.py:99-144): campaign[0].productPrice > productPrices[0] >
    null-stub; dates coalesce start/due with poDate. → struct."""
    camp = F.try_element_at(campaign_info, F.lit(1))["productPrice"]
    base = F.try_element_at(product_prices, F.lit(1))
    has_camp = F.size(F.coalesce(campaign_info, F.array())) > 0
    has_base = F.size(F.coalesce(product_prices, F.array())) > 0
    info = F.when(has_camp, camp).otherwise(base)

    norm = normalize_net_value_bhx(unit, F.coalesce(info["netUnitValue"], F.lit(0.0)), name)

    filled = F.struct(
        name.alias("name"),
        norm["unit"].alias("unit"),
        norm["value"].alias("netUnitValue"),
        info["price"].alias("price"),
        info["sysPrice"].alias("sysPrice"),
        info["discountPercent"].alias("discountPercent"),
        # reference uses Python `or`, so empty string also falls through
        F.coalesce(F.nullif(info["startTime"], F.lit("")), info["poDate"]).alias("date_begin"),
        F.coalesce(F.nullif(info["dueTime"], F.lit("")), info["poDate"]).alias("date_end"),
    )
    stub = F.struct(
        name.alias("name"),
        F.lower(unit).alias("unit"),
        F.lit(1.0).alias("netUnitValue"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("double").alias("sysPrice"),
        F.lit(None).cast("double").alias("discountPercent"),
        F.lit(None).cast("string").alias("date_begin"),
        F.lit(None).cast("string").alias("date_end"),
    )
    return F.when(has_camp | has_base, filled).otherwise(stub)


def extract_best_price_coop(
    name: Column, unit: Column, price: Column, discount: Column,
    date_begin: Column, date_end: Column,
) -> Column:
    """C3 Coop (cooponline.py:102-129): discount>0 → price=discount and
    discountPercent = round(1 − discount/price, 2); else base price. → struct."""
    has_discount = discount.isNotNull() & (discount > 0)
    out_price = F.when(has_discount, discount.cast("double")).otherwise(
        F.coalesce(price.cast("double"), F.lit(0.0))
    )
    pct = F.when(has_discount, F.round(F.lit(1.0) - discount / price, 2)).otherwise(
        F.lit(0.0)
    )
    norm = normalize_net_value_coop(unit, F.lit(0.0), name)
    return F.struct(
        name.alias("name"),
        norm["unit"].alias("unit"),
        norm["value"].alias("netUnitValue"),
        out_price.alias("price"),
        price.cast("double").alias("sysPrice"),
        pct.alias("discount"),
        date_begin.alias("date_begin"),
        date_end.alias("date_end"),
    )


# ----------------------------------------------------- C4/C5/C6 tokenizing


def tokenize_col(text: Column) -> Column:
    """C4: lowercase whitespace split, tokens of length ≥ 2."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: F.length(t) >= 2
    )


def char_ngrams_col(token: Column, n: int = 2) -> Column:
    """C5: character n-grams of one token; [] when len(token) < n."""
    return F.when(
        F.length(token) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(token) - n + 1),
            lambda i: F.substring(token, i, n),
        )
    )


def token_ngrams_col(text: Column, n: int = 2) -> Column:
    """C6: flatMap of C5 over C4 (cooponline.py:142-147)."""
    return F.flatten(
        F.transform(tokenize_col(text), lambda t: char_ngrams_col(t, n))
    )


# --------------------------------------------------------------- C7 / C8


def normalize_name_py(name: str) -> str:
    """C7 oracle twin (cooponline.py:349-354)."""
    nfkd = unicodedata.normalize("NFKD", name)
    ascii_str = "".join(c for c in nfkd if not unicodedata.combining(c))
    return re.sub(r"[^\w\s-]", "", ascii_str).lower().strip()


@F.pandas_udf(T.StringType())
def normalize_name_udf(name: pd.Series) -> pd.Series:
    # no Spark builtin for NFKD fold — vectorized pandas UDF (SURVEY §2.9)
    return name.map(normalize_name_py)


def parse_price_col(price_str: Column) -> Column:
    """C8: keep digits, /1000, 0.0 when no digits (cooponline.py:356-359)."""
    digits = F.regexp_replace(price_str, "[^0-9]", "")
    return F.when(digits == "", F.lit(0.0)).otherwise(digits.cast("double") / 1000)


def parse_date_safe_col(ts_str: Column) -> Column:
    """C10: fromisoformat-else-None (db/__init__.py:6-12)."""
    return F.try_to_timestamp(ts_str)


# ------------------------------------------------------------- J5/T4 CDC


def cdc_changed(
    new_df: DataFrame,
    prev_df: DataFrame,
    keys: tuple[str, ...] = ("store", "sku"),
    price_col: str = "price",
    pct: float = 0.01,
) -> DataFrame:
    """CDC gate (common/cdc.py:4-11): no prior row → changed; else
    abs(old−new)/old ≥ pct. Point lookup becomes a key join (broadcast or
    sort-merge per AQE)."""
    prev = prev_df.select(*keys, F.col(price_col).alias("_prev_price"))
    j = new_df.join(prev, list(keys), "left")
    changed = _cdc_pred(F.col("_prev_price"), F.col(price_col), pct)
    return j.withColumn("price_changed", changed).drop("_prev_price")


def _cdc_pred(prev: Column, new: Column, pct: float) -> Column:
    """No prior → changed; zero prior → changed iff value differs (the
    reference divides blindly and would crash on 0 — cdc.py:10); else the
    relative-delta threshold."""
    return (
        F.when(prev.isNull(), F.lit(True))
        .when(prev == 0, new != 0)
        .otherwise(F.abs(prev - new) / F.abs(prev) >= pct)
    )


def lag_cdc(df: DataFrame, keys: tuple[str, ...], ts_col: str, price_col: str, pct: float = 0.01) -> DataFrame:
    """Window form of the CDC gate over a price-history stream (§2.6)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(price_col).over(w)
    return df.withColumn("price_changed", _cdc_pred(prev, F.col(price_col), pct))


def recrawl_schedule(
    history: DataFrame,
    url_col: str = "url",
    visit_col: str = "visit_ts",
    fp_col: str = "fingerprint",
    base_interval: int = 86400,
    min_interval: int = 3600,
    max_interval: int = 2592000,
) -> DataFrame:
    """Adaptive recrawl scheduling from observed change history — the
    classic freshness estimator (Cho & Garcia-Molina 2003, "Estimating
    frequency of change"): per URL, compare each visit's content
    fingerprint to the previous visit's, estimate the change rate as
    changes/intervals, and set the next recrawl interval inversely to it
    — pages that never change back off toward ``max_interval``, churny
    pages tighten toward ``min_interval``. Generalizes the reference's
    fixed recrawl cadence (/root/reference/crawler/json_fetch.py:29) the
    way a 10^10-URL crawler must: per-URL, from evidence.

    All arithmetic is integer or a single integer division, engine-exact:
    ``next_interval = clamp(base * intervals / changes)`` computed with
    BIGINT floor division (changes=0 → max_interval).

    Returns one row per URL: (url, n_visits, n_changes, change_rate,
    next_interval_s).

    Plan shape at 100 TB: one window partitioned by URL (billions of
    small groups — hash-partitioned, no skew beyond per-URL history
    length) + one map-side-combined aggregate. The fingerprint should be
    an 8-byte hash upstream so the history table never carries bodies.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(visit_col)
    prev = F.lag(fp_col).over(w)
    marked = history.select(
        F.col(url_col).alias("url"),
        F.when(prev.isNull(), F.lit(None).cast("int"))
        .otherwise((~prev.eqNullSafe(F.col(fp_col))).cast("int"))
        .alias("chg"),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").cast("long").alias("n_visits"),
        F.count("chg").cast("long").alias("n_intervals"),
        F.coalesce(F.sum("chg"), F.lit(0)).cast("long").alias("n_changes"),
    )
    raw = (F.lit(int(base_interval)) * F.col("n_intervals")) / F.col(
        "n_changes"
    )
    clamped = F.when(
        (F.col("n_changes") == 0) | (F.col("n_intervals") == 0),
        F.lit(int(max_interval)),
    ).otherwise(
        F.least(
            F.lit(int(max_interval)),
            F.greatest(F.lit(int(min_interval)), F.floor(raw).cast("long")),
        )
    )
    return agg.select(
        "url",
        "n_visits",
        "n_changes",
        F.when(F.col("n_intervals") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("n_changes") / F.col("n_intervals"))
        .alias("change_rate"),
        clamped.cast("long").alias("next_interval_s"),
    )


def price_index(
    df: DataFrame,
    cat_col: str = "category",
    period_col: str = "period",
    item_col: str = "item",
    spend_col: str = "spend_cents",
    qty_col: str = "qty",
) -> DataFrame:
    """Matched-item unit-value price index per category — the analytics
    the reference's food-price crawl exists to feed (its pipeline ends
    at per-product normalized prices, `/root/reference/crawler/*/main.py`
    upserts `net_unit_value`; a price *index* over time is the canonical
    downstream product, cf. the "billion prices project" methodology for
    scraped-price CPI).

    For each (category, period): restrict to the items traded in BOTH
    the category's base period (its earliest) and this period — the
    matched-model rule that keeps assortment churn out of the index —
    then

        index = 100 * (V_t / Q_t) / (V_0 / Q_0)
              = 100 * (V_t * Q_0) / (Q_t * V_0)

    where V = Σ spend (integer cents), Q = Σ quantity (integer), and
    V_0/Q_0 are the base-period sums over the *same matched item set*.
    Every aggregate is exact int64 (order-free), the two cross products
    are computed in IEEE double after a single cast each, and the index
    is one division — hash-identical on any engine, any partitioning.
    ``n_matched`` counts the matched items; periods with no overlap (or
    a zero denominator) report NULL.

    Plan shape at 100 TB: one partial agg to (category, item, period)
    cells — map-side combined, billions of rows in, cells out — then a
    self-join of cells against the base-period cells on (category,
    item) (both sides shuffle-partitioned on the same key), and a final
    agg per (category, period). No window over raw rows, no broadcast
    needed; skewed categories split fine because the join key includes
    the item.
    """
    cells = df.groupBy(
        F.col(cat_col).alias("category"),
        F.col(item_col).alias("item"),
        F.col(period_col).alias("period"),
    ).agg(
        F.sum(F.col(spend_col).cast("long")).alias("v"),
        F.sum(F.col(qty_col).cast("long")).alias("q"),
    )
    base_period = cells.groupBy("category").agg(F.min("period").alias("period"))
    base = (
        cells.join(base_period, ["category", "period"])
        .select("category", "item", F.col("v").alias("v0"), F.col("q").alias("q0"))
    )
    matched = cells.join(base, ["category", "item"])
    agg = matched.groupBy("category", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("v").alias("vt"),
        F.sum("q").alias("qt"),
        F.sum("v0").alias("v0"),
        F.sum("q0").alias("q0"),
    )
    return agg.select(
        "category",
        "period",
        "n_matched",
        F.when(
            (F.col("qt") > 0) & (F.col("v0") > 0),
            F.lit(100.0)
            * (F.col("vt").cast("double") * F.col("q0").cast("double"))
            / (F.col("qt").cast("double") * F.col("v0").cast("double")),
        ).alias("index"),
    )
