"""Iceberg v2 export: rewrite a SnapshotStore warehouse as an Apache
Iceberg table an external reader can consume — the swap path SURVEY.md
§7.3 promises.

The native warehouse already has Iceberg-shaped semantics (immutable data
files + manifest + atomic CURRENT swap — snapshot.py); this module emits
the actual Iceberg v2 metadata for it, per the public table spec
(https://iceberg.apache.org/spec/):

    <dest>/metadata/v<N>.metadata.json       table metadata (schemas,
                                             specs, snapshots, snapshot-log)
    <dest>/metadata/snap-<id>-1-<uuid>.avro  manifest list, REAL Avro
    <dest>/metadata/<uuid>-m<k>.avro         manifest files, REAL Avro
    <dest>/metadata/version-hint.text        last metadata version

Data files are referenced in place by absolute path (Iceberg file_paths
are absolute URIs, so no copy). The Avro container files are written with
the Java Avro library that ships inside pyspark's jars (avro-1.12.1.jar,
driven through py4j) with the spec's field-ids attached to every Avro
field — no Python Avro package exists in this environment, and the
Iceberg runtime jar itself is unavailable offline (SURVEY.md §7.3), which
is why export is the proof of the swap rather than a live catalog swap.

Mapping from the native manifest chain (one Iceberg table per engine
table):

- every engine snapshot in which the table exists becomes an Iceberg
  snapshot (same id, same parent lineage, sequence number = position in
  the chain);
- each data DIRECTORY (one per (table, commit)) becomes one Iceberg
  manifest file listing its parquet files with status=ADDED and
  added_snapshot_id = the snapshot that introduced the directory —
  manifests are immutable and REUSED across snapshot manifest lists,
  exactly Iceberg's append pattern, so an append commit costs one new
  manifest regardless of history length;
- append tables (records, schedule, …) yield snapshots whose manifest
  list carries the parent's manifests plus the increment ("append"
  operation); replace tables (frontier) yield manifest lists that point
  only at the live directory ("overwrite" — superseded files simply drop
  out of scope, which is sufficient for full-scan readers; position/
  equality delete files are never needed because the engine never mutates
  rows in place).

Record counts come from the parquet footers (pyarrow), so the exported
metadata carries true per-file statistics.
"""

from __future__ import annotations

import json
import os
import uuid as _uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .snapshot import SnapshotStore

# deterministic logical clock for metadata timestamps (same posture as
# crawl._epoch_ts: exports are bit-reproducible, no wall clock)
_BASE_MS = 1_750_000_000_000

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


# --------------------------------------------------- Spark → Iceberg types


class _IdGen:
    def __init__(self):
        self.last = 0

    def next(self) -> int:
        self.last += 1
        return self.last


def _iceberg_type(dt: T.DataType, ids: _IdGen):
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [_iceberg_field(f, ids) for f in dt.fields],
        }
    if isinstance(dt, T.ArrayType):
        eid = ids.next()
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(dt.elementType, ids),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = ids.next(), ids.next()
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(dt.keyType, ids),
            "value-id": vid,
            "value": _iceberg_type(dt.valueType, ids),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    prim = {
        T.BooleanType: "boolean",
        T.IntegerType: "int",
        T.ShortType: "int",
        T.ByteType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.StringType: "string",
        T.BinaryType: "binary",
        T.DateType: "date",
        T.TimestampType: "timestamptz",
        T.TimestampNTZType: "timestamp",
    }.get(type(dt))
    if prim is None:
        raise ValueError(f"no Iceberg mapping for Spark type {dt.simpleString()}")
    return prim


def _iceberg_field(f: T.StructField, ids: _IdGen) -> dict:
    fid = ids.next()
    return {
        "id": fid,
        "name": f.name,
        "required": not f.nullable,
        "type": _iceberg_type(f.dataType, ids),
    }


def iceberg_schema(spark_schema: T.StructType) -> tuple[dict, int]:
    """The Iceberg schema JSON for a Spark schema, with field-ids assigned
    depth-first in field order (Iceberg's own assignment rule for a fresh
    table). Returns (schema_dict, last_column_id)."""
    ids = _IdGen()
    fields = [_iceberg_field(f, ids) for f in spark_schema.fields]
    return {"type": "struct", "schema-id": 0, "fields": fields}, ids.last


# ------------------------------------------------------------ Avro writing


class _AvroWriter:
    """Thin py4j bridge to the Java Avro library bundled in pyspark/jars."""

    def __init__(self, spark: SparkSession):
        self.jvm = spark.sparkContext._jvm

    def _parse(self, schema: dict):
        return self.jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))

    @staticmethod
    def _avro_json(schema: dict, values: dict) -> dict:
        """Avro-JSON encoding of one record: union values wrapped as
        {"type": value} per the Avro spec (py4j can't hand boxed Longs to
        GenericData.Record — it auto-unboxes them back to Python ints — so
        records travel as Avro-JSON and are decoded JVM-side)."""
        out = {}
        for f in schema["fields"]:
            name, ftype = f["name"], f["type"]
            v = values.get(name)
            if isinstance(ftype, list):  # ["null", X] union
                out[name] = None if v is None else {ftype[1]: v}
            elif isinstance(ftype, dict) and ftype.get("type") == "record":
                out[name] = _AvroWriter._avro_json(ftype, v or {})
            else:
                out[name] = v
        return out

    def write(self, path: str, schema: dict, records: list[dict], meta: dict[str, str]):
        jschema = self._parse(schema)
        writer = self.jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
        reader = self.jvm.org.apache.avro.generic.GenericDatumReader(jschema)
        factory = self.jvm.org.apache.avro.io.DecoderFactory.get()
        dfw = self.jvm.org.apache.avro.file.DataFileWriter(writer)
        for k, v in meta.items():
            dfw.setMeta(k, v)
        dfw.create(jschema, self.jvm.java.io.File(path))
        try:
            for rec in records:
                decoder = factory.jsonDecoder(
                    jschema, json.dumps(self._avro_json(schema, rec))
                )
                dfw.append(reader.read(None, decoder))
        finally:
            dfw.close()

    def read(self, path: str) -> list[dict]:
        """Round-trip reader (tests): every record as a plain dict via the
        generic datum reader's JSON rendering."""
        reader = self.jvm.org.apache.avro.file.DataFileReader(
            self.jvm.java.io.File(path),
            self.jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        out = []
        try:
            while reader.hasNext():
                out.append(json.loads(str(reader.next())))
        finally:
            reader.close()
        return out

    def file_meta(self, path: str, key: str) -> str | None:
        reader = self.jvm.org.apache.avro.file.DataFileReader(
            self.jvm.java.io.File(path),
            self.jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        try:
            raw = reader.getMetaString(key)
            return None if raw is None else str(raw)
        finally:
            reader.close()


# ----------------------------------------------------------------- export


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _file_stats(path: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows, os.path.getsize(path)


def export_iceberg(
    spark: SparkSession,
    store: SnapshotStore,
    table: str,
    dest: str,
) -> dict:
    """Export one engine table's full snapshot lineage as an Iceberg v2
    table at ``dest``. Returns the final table metadata dict.

    Deterministic: ids, sequence numbers and timestamps derive from the
    engine snapshot chain, and the manifest/list file names from a UUID5
    of (table, directory), so re-export over the same warehouse is
    byte-stable.
    """
    chain = [m for m in store.history() if m["tables"].get(table)]
    if not chain:
        raise ValueError(f"table {table!r} appears in no committed snapshot")

    meta_dir = os.path.join(dest, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    avro = _AvroWriter(spark)

    # schema from the newest snapshot's data (appends may have widened it)
    schema_json, last_col = iceberg_schema(
        store.read(spark, table).schema  # type: ignore[union-attr]
    )
    schema_str = json.dumps(schema_json)
    spec_str = json.dumps([])  # unpartitioned spec-0 fields
    table_uuid = str(_uuid.uuid5(_uuid.NAMESPACE_URL, f"frontier-engine:{table}"))

    # one manifest file per data directory, written once and reused by
    # every later snapshot that still references the directory
    manifest_for_dir: dict[str, dict] = {}
    snapshots: list[dict] = []
    snapshot_log: list[dict] = []
    prev_dirs_of: dict[int, list[str]] = {}

    for seq, m in enumerate(chain, start=1):
        sid = m["snapshot_id"]
        dirs = [os.path.normpath(p) for p in m["tables"][table]]
        parent = None
        for pm in reversed(chain):
            if pm["snapshot_id"] < sid:
                parent = pm["snapshot_id"]
                break
        parent_dirs = set(prev_dirs_of.get(parent, []) if parent is not None else [])
        prev_dirs_of[sid] = dirs

        entries = []
        for d in dirs:
            if d not in manifest_for_dir:
                files = _parquet_files(d)
                mf_name = (
                    str(_uuid.uuid5(_uuid.NAMESPACE_URL, f"{table}:{d}")) + "-m0.avro"
                )
                mf_path = os.path.join(meta_dir, mf_name)
                recs = []
                total_rows = 0
                for fp in files:
                    rows, size = _file_stats(fp)
                    total_rows += rows
                    recs.append(
                        {
                            "status": 1,  # ADDED
                            "snapshot_id": sid,
                            "sequence_number": None,  # inherit from manifest list
                            "file_sequence_number": None,
                            "data_file": {
                                "content": 0,  # DATA
                                "file_path": fp,
                                "file_format": "PARQUET",
                                "partition": {},
                                "record_count": rows,
                                "file_size_in_bytes": size,
                            },
                        }
                    )
                avro.write(
                    mf_path,
                    _MANIFEST_ENTRY_SCHEMA,
                    recs,
                    {
                        "schema": schema_str,
                        "schema-id": "0",
                        "partition-spec": spec_str,
                        "partition-spec-id": "0",
                        "format-version": "2",
                        "content": "data",
                    },
                )
                manifest_for_dir[d] = {
                    "path": mf_path,
                    "length": os.path.getsize(mf_path),
                    "added_snapshot_id": sid,
                    "sequence_number": seq,
                    "n_files": len(files),
                    "n_rows": total_rows,
                }

        list_entries = []
        for d in dirs:
            mf = manifest_for_dir[d]
            list_entries.append(
                {
                    "manifest_path": mf["path"],
                    "manifest_length": mf["length"],
                    "partition_spec_id": 0,
                    "content": 0,  # data
                    "sequence_number": mf["sequence_number"],
                    "min_sequence_number": mf["sequence_number"],
                    "added_snapshot_id": mf["added_snapshot_id"],
                    "added_files_count": mf["n_files"],
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": mf["n_rows"],
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
            )
        ml_name = "snap-{}-1-{}.avro".format(
            sid, _uuid.uuid5(_uuid.NAMESPACE_URL, f"{table}:list:{sid}")
        )
        ml_path = os.path.join(meta_dir, ml_name)
        avro.write(
            ml_path,
            _MANIFEST_LIST_SCHEMA,
            list_entries,
            {"format-version": "2"},
        )

        is_append = set(dirs) >= parent_dirs and parent is not None
        op = "append" if is_append else ("overwrite" if parent is not None else "append")
        ts = _BASE_MS + seq
        snapshots.append(
            {
                "snapshot-id": sid,
                **({"parent-snapshot-id": parent} if parent is not None else {}),
                "sequence-number": seq,
                "timestamp-ms": ts,
                "manifest-list": ml_path,
                "summary": {
                    "operation": op,
                    "engine-epoch": str(m.get("epoch", "")),
                },
                "schema-id": 0,
            }
        )
        snapshot_log.append({"timestamp-ms": ts, "snapshot-id": sid})

    metadata = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": dest,
        "last-sequence-number": len(chain),
        "last-updated-ms": _BASE_MS + len(chain),
        "last-column-id": last_col,
        "current-schema-id": 0,
        "schemas": [schema_json],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": chain[-1]["snapshot_id"],
        "refs": {
            "main": {
                "snapshot-id": chain[-1]["snapshot_id"],
                "type": "branch",
            }
        },
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": [],
    }
    version = len(chain)
    mpath = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(metadata, f, indent=1)
    os.replace(mpath + ".tmp", mpath)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))
    return metadata


def _spark_type(it) -> T.DataType:
    """Inverse of :func:`_iceberg_type`: an Iceberg schema-JSON type back to
    the Spark type an external engine would bind for it. Field-ids are
    dropped (Spark binds parquet columns by name here, which is sound
    because the exporter assigned ids in name order from the same schema)."""
    if isinstance(it, dict):
        if it["type"] == "struct":
            return T.StructType(
                [
                    T.StructField(f["name"], _spark_type(f["type"]), not f["required"])
                    for f in it["fields"]
                ]
            )
        if it["type"] == "list":
            return T.ArrayType(_spark_type(it["element"]), not it["element-required"])
        if it["type"] == "map":
            return T.MapType(
                _spark_type(it["key"]),
                _spark_type(it["value"]),
                not it["value-required"],
            )
        raise ValueError(f"unknown Iceberg complex type {it['type']!r}")
    if it.startswith("decimal("):
        p, s = it[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s))
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "binary": T.BinaryType(),
        "date": T.DateType(),
        "timestamptz": T.TimestampType(),
        "timestamp": T.TimestampNTZType(),
    }.get(it)
    if prim is None:
        raise ValueError(f"no Spark mapping for Iceberg type {it!r}")
    return prim


def read_iceberg(spark: SparkSession, dest: str, snapshot_id: int | None = None):
    """Load the exported table as a DataFrame FROM THE ICEBERG METADATA
    ALONE — the import half of the swap path. The schema comes from the
    metadata.json current schema (not parquet inference, so required/
    optional and type bindings are the spec's), the file set from the
    chosen snapshot's manifest list; the native SnapshotStore is never
    consulted. ``snapshot_id`` selects an older snapshot for time travel
    (default: the current one)."""
    rt = read_exported_files(spark, dest, snapshot_id=snapshot_id)
    meta = rt["metadata"]
    schema_json = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    schema = _spark_type(schema_json)
    if not rt["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*rt["files"])


def read_exported_files(
    spark: SparkSession, dest: str, snapshot_id: int | None = None
) -> dict:
    """Consume an exported table the way an external Iceberg reader would:
    version-hint → metadata.json → snapshot (``snapshot_id`` or current) →
    manifest list (Avro) → manifests (Avro) → data file set. Returns
    {"files": [...], "record_count": N, "metadata": {...}} — the
    round-trip proof that the export is self-describing."""
    meta_dir = os.path.join(dest, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        version = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
        metadata = json.load(f)
    wanted = metadata["current-snapshot-id"] if snapshot_id is None else snapshot_id
    try:
        snap = next(
            s for s in metadata["snapshots"] if s["snapshot-id"] == wanted
        )
    except StopIteration:
        known = [s["snapshot-id"] for s in metadata["snapshots"]]
        raise ValueError(f"snapshot {wanted} not in table metadata ({known})")
    avro = _AvroWriter(spark)
    files: list[str] = []
    rows = 0
    for mf in avro.read(snap["manifest-list"]):
        fv = avro.file_meta(mf["manifest_path"], "format-version")
        if fv != "2":
            raise ValueError(
                f"manifest {mf['manifest_path']} declares format-version"
                f" {fv!r}, expected '2'"
            )
        for entry in avro.read(mf["manifest_path"]):
            df = entry["data_file"]
            files.append(df["file_path"])
            rows += df["record_count"]
    return {"files": sorted(files), "record_count": rows, "metadata": metadata}
