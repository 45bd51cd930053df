"""Local simulation of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir and
compare row count + column names + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(sf_dir: str, only: list[str] | None = None, spark=None) -> int:
    import __spark_entry__ as entrymod

    own_session = spark is None
    if own_session:
        from frontier_engine.session import get_spark

        spark = get_spark("contract-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, cols={scols})")
            if len(srows) == 0 and name not in ("exact_dedup",):
                print(f"WARN {name}: zero rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dcols = sorted(ddf.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures += 1
            continue
        # None-safe sort: SQL NULLs surface as Python None, which has no
        # ordering vs str/int — key each value as (is_null, value) so NULL
        # rows sort last within equal prefixes instead of raising
        def _key(t):
            return tuple((v is None, v) for v in t)

        s_set = sorted(
            (tuple(_norm(row[c]) for c in scols) for row in srows), key=_key
        )
        d_pylist = ddf.to_pylist()
        d_set = sorted(
            (tuple(_norm(r[c]) for c in dcols) for r in d_pylist), key=_key
        )
        if len(s_set) != len(d_set):
            print(f"FAIL {name}: rowcount {len(s_set)} vs {len(d_set)}")
            failures += 1
            continue
        if s_set != d_set:
            bad = [i for i, (a, b) in enumerate(zip(s_set, d_set)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted idx {bad}")
            for i in bad:
                print(f"   spark:  {s_set[i]}")
                print(f"   duckdb: {d_set[i]}")
            failures += 1
            continue
        print(f"ok   {name}: {len(s_set)} rows match")
    if own_session:
        spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if compare(sf, only) else 0)
