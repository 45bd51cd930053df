"""Iceberg v2 export (SURVEY §7.3 swap path): the exported metadata —
table metadata JSON + REAL Avro manifest lists and manifest files — must
be self-describing (readable back through the generic Avro reader with no
knowledge of the engine) and equivalent to SnapshotStore's native
manifest: same file set, same schema, same snapshot lineage."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from frontier_engine.iceberg_export import (
    export_iceberg,
    iceberg_schema,
    read_exported_files,
    read_iceberg,
)
from frontier_engine.snapshot import SnapshotStore


def _native_files(manifest, table):
    files = []
    for root in manifest["tables"][table]:
        for dirpath, _, fs in os.walk(root):
            files += [os.path.join(dirpath, f) for f in fs if f.endswith(".parquet")]
    return sorted(files)


def test_export_roundtrip_matches_native_manifest(spark, tmp_path):
    wh = str(tmp_path / "wh")
    store = SnapshotStore(wh)
    df0 = spark.range(100).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
        F.lit(0).alias("epoch"),
    )
    df1 = spark.range(100, 130).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
        F.lit(1).alias("epoch"),
    )
    fr0 = spark.range(10).select(F.col("id").alias("url_hash"))
    fr1 = spark.range(5).select(F.col("id").alias("url_hash"))
    store.commit(0, replace={"frontier": fr0}, append={"records": df0})
    store.commit(1, replace={"frontier": fr1}, append={"records": df1})

    dest = str(tmp_path / "ice_records")
    meta = export_iceberg(spark, store, "records", dest)

    # --- lineage: same snapshot ids, same parent chain as the native store
    native = store.history()
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        m["snapshot_id"] for m in native
    ]
    assert meta["current-snapshot-id"] == store.current_manifest()["snapshot_id"]
    assert "parent-snapshot-id" not in meta["snapshots"][0]
    assert meta["snapshots"][1]["parent-snapshot-id"] == native[0]["snapshot_id"]
    assert meta["snapshots"][1]["summary"]["operation"] == "append"
    assert [e["snapshot-id"] for e in meta["snapshot-log"]] == [0, 1]

    # --- file-list equivalence at the current snapshot, via the external-
    # reader path (version-hint → json → Avro manifest list → Avro manifests)
    rt = read_exported_files(spark, dest)
    assert rt["files"] == _native_files(store.current_manifest(), "records")
    assert rt["record_count"] == 130 == store.read(spark, "records").count()

    # --- import half: a DataFrame loaded from the Iceberg metadata alone
    # (schema from metadata.json, files from the Avro manifests — no
    # SnapshotStore) is value- and schema-identical to the native read
    imported = read_iceberg(spark, dest)
    native_df = store.read(spark, "records")
    assert imported.schema == native_df.schema
    assert sorted(imported.collect()) == sorted(native_df.collect())
    # time travel through the metadata: snapshot 0 is the first commit only
    at0 = read_iceberg(spark, dest, snapshot_id=0)
    assert at0.count() == 100
    assert sorted(r.url_hash for r in at0.collect()) == list(range(100))
    with pytest.raises(ValueError, match="snapshot 99"):
        read_iceberg(spark, dest, snapshot_id=99)

    # --- and at the PARENT snapshot (time travel through the export)
    snap0 = next(s for s in meta["snapshots"] if s["snapshot-id"] == 0)
    from frontier_engine.iceberg_export import _AvroWriter

    avro = _AvroWriter(spark)
    files0 = sorted(
        e["data_file"]["file_path"]
        for mf in avro.read(snap0["manifest-list"])
        for e in avro.read(mf["manifest_path"])
    )
    assert files0 == _native_files(store.manifest(0), "records")

    # --- schema equivalence: names, order, spark-type mapping, field-ids
    sch = meta["schemas"][0]
    assert [f["name"] for f in sch["fields"]] == ["url_hash", "url", "epoch"]
    assert [f["type"] for f in sch["fields"]] == ["long", "string", "int"]
    assert [f["id"] for f in sch["fields"]] == [1, 2, 3]
    # the manifest files are self-describing: they embed the same schema
    mf0 = avro.read(snap0["manifest-list"])[0]
    embedded = json.loads(avro.file_meta(mf0["manifest_path"], "schema"))
    assert embedded["fields"] == sch["fields"]

    # --- v2 spec surface present in the table metadata
    for key in (
        "format-version", "table-uuid", "last-sequence-number", "schemas",
        "partition-specs", "sort-orders", "refs", "snapshot-log",
    ):
        assert key in meta
    assert meta["format-version"] == 2

    # --- replace table: the overwrite drops the superseded directory
    dest_fr = str(tmp_path / "ice_frontier")
    meta_fr = export_iceberg(spark, store, "frontier", dest_fr)
    assert meta_fr["snapshots"][1]["summary"]["operation"] == "overwrite"
    rt_fr = read_exported_files(spark, dest_fr)
    assert rt_fr["files"] == _native_files(store.current_manifest(), "frontier")
    assert rt_fr["record_count"] == 5

    # --- determinism: re-export is metadata-identical
    dest2 = str(tmp_path / "ice_records_2")
    meta2 = export_iceberg(spark, store, "records", dest2)
    norm = lambda m: json.dumps(
        {k: v for k, v in m.items() if k != "location"}, sort_keys=True
    ).replace("ice_records_2", "ice_records")
    assert norm(meta2) == norm(meta)


def test_iceberg_schema_nested_types(spark):
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.FloatType(), False), False),
            T.StructField(
                "s",
                T.StructType([T.StructField("x", T.TimestampType(), True)]),
                True,
            ),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType()), True),
            T.StructField("d", T.DecimalType(12, 2), True),
            T.StructField("b", T.BinaryType(), True),
        ]
    )
    ice, last = iceberg_schema(sch)
    a, s, m, d, b = ice["fields"]
    assert a["required"] and a["type"]["type"] == "list" and a["type"]["element"] == "float"
    assert a["type"]["element-required"] is True
    assert s["type"]["fields"][0]["type"] == "timestamptz"
    assert m["type"]["type"] == "map" and m["type"]["value"] == "double"
    assert d["type"] == "decimal(12, 2)" and b["type"] == "binary"
    ids = [a["id"], a["type"]["element-id"], s["id"], s["type"]["fields"][0]["id"]]
    assert len(set(ids)) == len(ids)  # unique field-ids
    assert last >= 9

    # the import-side mapping inverts the export-side mapping exactly,
    # nested nullability included
    from frontier_engine.iceberg_export import _spark_type

    assert _spark_type(ice) == sch
