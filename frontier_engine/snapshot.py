"""Iceberg-style snapshot layer: immutable Parquet + manifest JSON + atomic
commit, with time travel and append-table lineage.

The real Iceberg runtime jar is unavailable offline (verified — SURVEY.md
§7.3), so snapshot semantics are implemented natively with an
Iceberg-compatible shape: every commit writes immutable data files and one
manifest listing exactly which files make up each table at that snapshot;
``CURRENT`` is swapped with an atomic rename. Nothing is ever mutated in
place, so readers of snapshot k are never affected by the commit of k+1 and
a killed job resumes from the last committed manifest with zero re-fetches
(north_rule checkpoint/resume requirement).

Replaces the reference's "Mongo collections ARE the state, crash = restart
from scratch" model (/root/reference/db/__init__.py:14-24; SURVEY.md §2.8 T5).

Layout:
    warehouse/
      data/<table>/s<id>/part-*.parquet     one directory per (table, commit)
      manifests/manifest-<id>.json          {snapshot_id, parent_id, epoch,
                                             tables: {name: [paths...]},
                                             stats: {...}}
      CURRENT                               name of the live manifest

Tables come in two modes:
- replace tables (frontier): manifest points at only the new directory;
- append tables (records, seen_state, schedule, lineage, dead_letter):
  manifest carries the parent's path list plus the new increment, so an
  append is O(increment), never a rewrite.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    APPEND_TABLES = {
        "records", "seen_state", "schedule", "lineage", "dead_letter",
        "blocked", "stream_records",
    }

    def __init__(
        self,
        warehouse: str,
        partition_spec: dict[str, list[str]] | None = None,
        bucket_spec: dict[str, tuple[str, int]] | None = None,
    ):
        """``partition_spec``: optional ``{table: [partition columns]}`` —
        those tables' data directories get a declarative Hive-style
        ``partitionBy`` layout (e.g. ``records/s3/lang=vi/``), so reads
        filtering on a partition column prune directories before any IO.
        Mixed layouts across snapshots read fine (parquet merges by name).

        ``bucket_spec``: optional ``{table: (bucket_col, n_buckets)}`` —
        those (replace-mode) tables are written as Spark bucketed tables, so
        a reader consumes the files' resident ``HashPartitioning(bucket_col)``
        with ZERO Exchange: any groupBy/window whose keys include
        ``bucket_col`` plans without a shuffle (the Iceberg analogue is a
        ``bucket(N, col)`` partition transform in the table spec). The crawl
        writes ``frontier`` bucketed on ``host``, which is what makes the
        next epoch's entire drain — routing histogram, survivor windows,
        rank complements — a single no-shuffle scan stage. Reading a
        bucketed snapshot (re-)declares an external table over the snapshot
        directory (metadata only, same mechanism as corpus.open_corpus);
        snapshots written before a bucket_spec existed fall back to a plain
        parquet read, so the spec is safe to add to an existing warehouse.
        """
        self.warehouse = warehouse
        self.partition_spec = dict(partition_spec or {})
        self.bucket_spec = dict(bucket_spec or {})
        self.data_dir = os.path.join(warehouse, "data")
        self.manifest_dir = os.path.join(warehouse, "manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ------------------------------------------------------------- reading

    def current_manifest(self) -> dict | None:
        cur = os.path.join(self.warehouse, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def manifest(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.manifest_dir, f"manifest-{snapshot_id}.json")) as f:
            return json.load(f)

    def read(
        self, spark: SparkSession, table: str, snapshot_id: int | None = None
    ) -> DataFrame | None:
        """Read a table at the current (or a time-travel) snapshot."""
        m = self.current_manifest() if snapshot_id is None else self.manifest(snapshot_id)
        if m is None:
            return None
        paths = m["tables"].get(table)
        if not paths:
            return None
        if len(paths) == 1:
            return self._read_single(spark, paths[0])
        # multiple append increments: read each root separately and union —
        # one multi-root read trips Spark's partition discovery when roots
        # carry Hive-style partition dirs (partition_spec tables), and the
        # per-root union keeps pruning/pushdown per scan either way. Roots
        # holding no data files (an epoch's empty increment) are skipped.
        def has_files(p: str) -> bool:
            return any(
                f.endswith(".parquet")
                for _, _, files in os.walk(p)
                for f in files
            )

        live = [p for p in paths if has_files(p)]
        if not live:
            return spark.read.parquet(*paths)  # preserve old error behavior
        dfs = [spark.read.parquet(p) for p in live]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def history(self) -> list[dict]:
        """Manifest chain oldest→newest; stops at the expiry horizon (a
        parent manifest removed by :meth:`expire_snapshots`)."""
        out = []
        m = self.current_manifest()
        while m is not None:
            out.append(m)
            pid = m["parent_id"]
            if pid is None:
                break
            try:
                m = self.manifest(pid)
            except FileNotFoundError:
                break
        return list(reversed(out))

    @staticmethod
    def _bucket_table_name(path: str) -> str:
        return "fe_snap_" + hashlib.md5(os.path.normpath(path).encode()).hexdigest()[:12]

    def _read_single(self, spark: SparkSession, path: str) -> DataFrame:
        """Read one snapshot directory. A directory written bucketed (its
        write left a ``_FE_BUCKETS.json`` sidecar) is (re-)declared as an
        external bucketed table and read through the catalog — the only way
        Spark's scan reports the files' resident HashPartitioning
        (spark.read.parquet ignores bucket metadata). Metadata-only; data
        files untouched. The layout comes from the SIDECAR, never from this
        session's bucket_spec, so every reader — resume in a fresh session,
        a store opened without the spec, a different shuffle-partition
        setting — sees the files' true bucket count. Dirs without a sidecar
        are plain parquet reads."""
        sidecar = os.path.join(path, "_FE_BUCKETS.json")
        if not os.path.exists(sidecar):
            return spark.read.parquet(path)
        with open(sidecar) as f:
            meta = json.load(f)
        col, n = meta["col"], meta["n"]
        name = self._bucket_table_name(path)
        if not spark.catalog.tableExists(name):
            schema = spark.read.parquet(path).schema
            ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
            spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                f"CLUSTERED BY (`{col}`) INTO {n} BUCKETS LOCATION '{path}'"
            )
        return spark.table(name)

    # ------------------------------------------------------------ writing

    def _write_table(self, df: DataFrame, table: str, sid: int) -> str:
        final = os.path.join(self.data_dir, table, f"s{sid}")
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        bucket = self.bucket_spec.get(table)
        if bucket is not None:
            col, n = bucket
            spark = df.sparkSession
            # no repartition here: the bucket writer assigns rows by the
            # same murmur3-pmod as HashPartitioning, so input already
            # clustered that way (run_crawl's merge) writes one file per
            # bucket with no extra Exchange; unclustered input still writes
            # correctly, just more files per bucket. saveAsTable with an
            # explicit path makes the table EXTERNAL, so dropping the
            # throwaway write name keeps the files.
            wname = f"fe_snap_w_{uuid.uuid4().hex[:12]}"
            (
                df.write.mode("overwrite")
                .format("parquet")
                .bucketBy(n, col)
                .option("path", tmp)
                .saveAsTable(wname)
            )
            spark.sql(f"DROP TABLE IF EXISTS `{wname}`")
            # a re-commit of the same sid replaces the directory: invalidate
            # any reader declaration pointing at the old files
            spark.sql(f"DROP TABLE IF EXISTS `{self._bucket_table_name(final)}`")
            if any(f.endswith(".parquet") for f in os.listdir(tmp)):
                with open(os.path.join(tmp, "_FE_BUCKETS.json"), "w") as f:
                    json.dump({"col": col, "n": n}, f)
            else:
                # an EMPTY bucketed write leaves no data files (unlike a
                # plain parquet write's single schema-bearing empty file);
                # rewrite plainly — no sidecar, so the read falls back too
                df.write.mode("overwrite").parquet(tmp)
        else:
            writer = df.write.mode("overwrite")
            part_cols = self.partition_spec.get(table)
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.parquet(tmp)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return final

    def commit(
        self,
        epoch: int,
        replace: dict[str, DataFrame],
        append: dict[str, DataFrame],
        stats: dict | None = None,
        stats_fn=None,
    ) -> int:
        """Write all data files, then publish one manifest atomically.

        ``stats_fn``, if given, is called AFTER the data writes and its dict
        merged into ``stats`` — the hook for ``df.observe()`` metrics, which
        only materialize once the writes run.
        """
        parent = self.current_manifest()
        parent_id = parent["snapshot_id"] if parent else None
        sid = (parent_id + 1) if parent_id is not None else 0

        tables: dict[str, list[str]] = dict(parent["tables"]) if parent else {}
        for name, df in replace.items():
            tables[name] = [self._write_table(df, name, sid)]
        for name, df in append.items():
            inc = self._write_table(df, name, sid)
            tables[name] = list(tables.get(name, [])) + [inc]

        all_stats = dict(stats or {})
        if stats_fn is not None:
            all_stats.update(stats_fn())

        manifest = {
            "snapshot_id": sid,
            "parent_id": parent_id,
            "epoch": epoch,
            "tables": tables,
            "stats": all_stats,
        }
        mpath = os.path.join(self.manifest_dir, f"manifest-{sid}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)

        cur_tmp = os.path.join(self.warehouse, "CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(f"manifest-{sid}.json")
        os.replace(cur_tmp, os.path.join(self.warehouse, "CURRENT"))
        return sid

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """GC: keep the newest ``keep_last`` manifests, delete older
        manifest files and every data directory no kept manifest references.

        Append tables keep their full path lists in every manifest, so
        their history survives expiry; what goes away is time travel to
        expired snapshot ids and the superseded versions of replace tables
        (old frontier snapshots — the bulk of the garbage in a long crawl).
        """
        kept: list[dict] = []
        m = self.current_manifest()
        while m is not None and len(kept) < keep_last:
            kept.append(m)
            pid = m["parent_id"]
            if pid is None:
                break
            try:
                m = self.manifest(pid)
            except FileNotFoundError:
                break
        referenced = {
            os.path.normpath(p)
            for man in kept
            for paths in man["tables"].values()
            for p in paths
        }
        removed_dirs = 0
        for table in os.listdir(self.data_dir):
            tdir = os.path.join(self.data_dir, table)
            if not os.path.isdir(tdir):
                continue
            for d in os.listdir(tdir):
                full = os.path.normpath(os.path.join(tdir, d))
                if full not in referenced:
                    shutil.rmtree(full, ignore_errors=True)
                    removed_dirs += 1
        keep_ids = {man["snapshot_id"] for man in kept}
        removed_manifests = 0
        for f in os.listdir(self.manifest_dir):
            if not f.startswith("manifest-"):
                continue
            sid = int(f.removeprefix("manifest-").removesuffix(".json"))
            if sid not in keep_ids:
                os.remove(os.path.join(self.manifest_dir, f))
                removed_manifests += 1
        return {"removed_dirs": removed_dirs, "removed_manifests": removed_manifests}


def latest_records(
    records: DataFrame,
    key_cols: tuple[str, ...] = ("url_hash", "url"),
    order_col: str = "epoch",
) -> DataFrame:
    """Upsert view over the append-only ``records`` table: one row per key,
    the newest ``order_col`` wins.

    ``records`` is append-only by design (each recrawl epoch appends a fresh
    row per re-fetched URL — O(increment) commits, full history retained for
    time travel / CDC). The reference instead mutates in place with
    ``update_one(upsert=True)`` (/root/reference/db/__init__.py:63), so a
    reference user reading ``products`` sees only the latest row per key.
    This view reproduces that read contract WITHOUT giving up the append-only
    write path: a single ``max_by`` aggregate — map-side partial (each
    partition keeps one candidate row per key before the shuffle), one
    Exchange on the key, no window sort. At 100 TB the shuffle moves at most
    one row per (key, input partition), not the full history.

    Within one crawl a URL appears at most once per epoch (the drain dedups
    per epoch and recrawl re-enqueues for a later epoch), so ``order_col``
    is unique per key and the result is deterministic.
    """
    from pyspark.sql import functions as F

    keys = list(key_cols)
    vals = [c for c in records.columns if c not in keys]
    return records.groupBy(*keys).agg(
        *[F.max_by(c, F.col(order_col)).alias(c) for c in vals]
    )


def diff_table(
    spark: SparkSession,
    store: SnapshotStore,
    table: str,
    key_cols: list[str],
    value_cols: list[str],
    from_id: int,
    to_id: int | None = None,
):
    """T4/E7 change detection between snapshots via time travel: rows in
    ``to`` that are new or whose value columns changed vs ``from``.

    The reference's CDC is a per-row point lookup against the previous
    price (common/cdc.py:4-11); here it is one key join between two
    immutable snapshots — no state service, no per-row round trips.
    Output: to-rows + ``change_type`` ('added' | 'changed').
    """
    from pyspark.sql import functions as F

    old = store.read(spark, table, snapshot_id=from_id)
    new = store.read(spark, table, snapshot_id=to_id)
    if new is None:
        raise ValueError(f"table {table!r} missing at snapshot {to_id}")
    if old is None:
        return new.withColumn("change_type", F.lit("added"))
    old_vals = old.select(
        *key_cols, *[F.col(c).alias(f"_old_{c}") for c in value_cols]
    )
    j = new.join(old_vals, key_cols, "left")
    is_added = F.col(f"_old_{value_cols[0]}").isNull()
    is_changed = F.lit(False)
    for c in value_cols:
        is_changed = is_changed | (F.col(c) != F.col(f"_old_{c}"))
    return (
        j.filter(is_added | is_changed)
        .withColumn("change_type", F.when(is_added, "added").otherwise("changed"))
        .drop(*[f"_old_{c}" for c in value_cols])
    )
