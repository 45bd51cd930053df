"""Export a frontier_engine warehouse table as an Apache Iceberg v2 table.

    python tools/export_iceberg.py --warehouse WH --table records --dest DIR
    python tools/export_iceberg.py --warehouse WH --all --dest DIR   # every table

Emits <dest>[/<table>]/metadata/{vN.metadata.json, snap-*.avro, *-m0.avro,
version-hint.text} referencing the warehouse's parquet data files in place
(no copy) — see frontier_engine/iceberg_export.py for the spec mapping.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", default=None)
    ap.add_argument("--all", action="store_true", help="export every committed table")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--verify", action="store_true",
                    help="read each export back through the Iceberg metadata "
                         "alone and check row count + schema vs the native read")
    args = ap.parse_args(argv)
    if not args.all and args.table is None:
        ap.error("one of --table or --all is required")

    from frontier_engine.iceberg_export import export_iceberg, read_iceberg
    from frontier_engine.session import get_spark
    from frontier_engine.snapshot import SnapshotStore

    spark = get_spark("export-iceberg", cores=args.cores)
    store = SnapshotStore(args.warehouse)
    current = store.current_manifest()
    if current is None:
        print("warehouse has no committed snapshot", file=sys.stderr)
        return 2
    tables = sorted(current["tables"]) if args.all else [args.table]
    for t in tables:
        dest = os.path.join(args.dest, t) if args.all else args.dest
        meta = export_iceberg(spark, store, t, dest)
        print(
            f"{t}: {len(meta['snapshots'])} snapshots -> "
            f"{os.path.join(dest, 'metadata', 'v%d.metadata.json' % meta['last-sequence-number'])}"
        )
        if args.verify:
            imported = read_iceberg(spark, dest)
            native = store.read(spark, t)
            n_imp, n_nat = imported.count(), native.count()
            if n_imp != n_nat or imported.schema != native.schema:
                print(
                    f"{t}: VERIFY FAILED (imported {n_imp} rows vs native "
                    f"{n_nat}; schemas {'match' if imported.schema == native.schema else 'differ'})",
                    file=sys.stderr,
                )
                return 3
            print(f"{t}: verified — {n_imp} rows, schema identical via metadata-only read")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
