"""Pure-Python oracle transcriptions of the reference's scalar semantics.

Independently written from the semantics documented in SURVEY.md §2.7 (cited
reference lines there); used ONLY by tests to check the engine's Spark
expressions. Deliberately structured differently from the reference code.
"""

from __future__ import annotations

import re

NET_RE = re.compile(r"(\d+(?:\.\d+)?)\s*(g|ml|lít|kg|gói|l)\b")
PACK_RE = re.compile(r"(thùng|lốc)\s*(\d+).*?(\d+(\.\d+)?)\s*(g|ml)")
KG_OPT_RE = re.compile(r"(\d+(\.\d+)?)?\s*kg")
KG_REQ_RE = re.compile(r"(\d+(\.\d+)?)\s*kg")


def o_extract_net(name: str, fallback_unit: str):
    found = NET_RE.findall(name.lower())
    if found:
        v, u = found[-1]
        return float(v), u
    return 1.0, fallback_unit


def o_norm_coop(unit: str, net_value: float, name: str):
    nl = name.lower()
    nv, u = o_extract_net(name, unit.lower())
    if u == "kg":
        return nv * 1000, "g"
    if u == "l":
        return nv * 1000, "ml"
    if u in ("g", "ml"):
        m = KG_OPT_RE.search(nl)
        if m:
            g = m.group(1)
            if str(g).isdigit():
                return float(g) * 1000, u
            return 1000.0, u
    if u == "cái":
        return nv * 1000, "g"
    if u in ("g", "hộp", "vĩ") and "trứng" in nl:
        m = re.search(r"(\d+)\s*trứng", nl)
        if m:
            return float(int(m.group(1))), "hộp"
    if u == "vĩ" and "kg" in nl:
        return nv * 1000, "g"
    if u in ("trái", "túi", "bịch"):
        return nv * 1000, u
    if u == "hộp" and "quả" in nl:
        hits = re.findall(r"hộp\s*(\d+)", nl)
        if hits:
            return float(sum(int(h) for h in hits)), u
    m = PACK_RE.search(nl)
    if m:
        return int(m.group(2)) * float(m.group(3)), u
    ev, _ = o_extract_net(name, u)
    if ev > 0:
        return ev, u
    return (float(nv) if nv != 0 else 1000.0), u


def o_norm_bhx(unit: str, net_value: float, name: str):
    nl = name.lower()
    u = unit.lower()
    nv = float(net_value)
    if u == "kg":
        return nv * 1000, "g"
    if u == "lít":
        return nv * 1000, "ml"
    if u not in ("kg", "g", "ml", "lít"):
        m = KG_REQ_RE.search(nl)
        if m:
            return float(m.group(1)) * 1000, u
    if u == "túi 1kg":
        return nv * 1000, "túi"
    if u == "túi" and "trái" in nl:
        return 700.0, u
    if u in ("hộp", "vỉ") and "quả" in nl:
        hits = re.findall(rf"{u}\s*(\d+)", nl)
        if hits:
            return float(sum(int(h) for h in hits)), u
    m = PACK_RE.search(nl)
    if m:
        return int(m.group(2)) * float(m.group(3)), u
    ev, _ = o_extract_net(name, u)
    if ev > 0:
        return ev, u
    return (nv if nv != 0 else 1.0), u


def o_best_price_bhx(product: dict) -> dict:
    name = product.get("name", "")
    unit0 = product.get("unit", "").lower()
    camp = product.get("lstCampaingInfo") or []
    base = product.get("productPrices") or []

    def result(info, cu, nv):
        return {
            "name": name,
            "unit": cu,
            "netUnitValue": nv,
            "price": info.get("price"),
            "sysPrice": info.get("sysPrice"),
            "discountPercent": info.get("discountPercent"),
            "date_begin": info.get("startTime") or info.get("poDate"),
            "date_end": info.get("dueTime") or info.get("poDate"),
        }

    if camp:
        info = camp[0].get("productPrice", {}) or {}
    elif base:
        info = base[0]
    else:
        return {
            "name": name, "unit": unit0, "netUnitValue": 1.0,
            "price": None, "sysPrice": None, "discountPercent": None,
            "date_begin": None, "date_end": None,
        }
    nv, cu = o_norm_bhx(unit0, info.get("netUnitValue") or 0, name)
    return result(info, cu, nv)


def o_best_price_coop(product: dict) -> dict:
    name = product.get("name", "")
    unit0 = product.get("unit", "").lower()
    disc = product.get("discount")
    pct = 0.0
    if disc is not None and float(disc) > 0:
        price = float(disc)
        pct = 1 - price / float(product.get("price"))
    else:
        price = float(product.get("price", 0) or 0)
    nv, cu = o_norm_coop(unit0, 0, name)
    return {
        "name": name, "unit": cu, "netUnitValue": nv,
        "price": price,
        "sysPrice": float(product.get("price")) if product.get("price") is not None else None,
        "discount": round(pct, 2),
        "date_begin": product.get("date_begin"),
        "date_end": product.get("date_end"),
    }


def o_tokenize(text: str | None):
    if text is None:
        return []
    return [t for t in text.lower().split() if len(t) >= 2]


def o_char_ngrams(token: str, n: int):
    if token is None or len(token) < n:
        return []
    return [token[i : i + n] for i in range(len(token) - n + 1)]


def o_token_ngrams(text: str, n: int = 2):
    out = []
    for t in o_tokenize(text):
        out.extend(o_char_ngrams(t, n))
    return out


def o_parse_price(price_str: str) -> float:
    digits = "".join(ch for ch in price_str if ch.isdigit())
    return float(digits) / 1000 if digits else 0.0


def o_cdc_changed(prev_price: float | None, new_price: float, pct: float = 0.01) -> bool:
    if prev_price is None:
        return True
    if prev_price == 0:
        return new_price != 0
    return abs(prev_price - new_price) / abs(prev_price) >= pct
