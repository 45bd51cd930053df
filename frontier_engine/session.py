"""SparkSession factory with pinned, deterministic configs.

Single place where every test / job / bench builds its session so that
shuffle partitioning, Arrow, and timezone behavior are identical everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "frontier_engine",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores``: local[N] parallelism; defaults to $SPARK_GRAFT_CPUS or '*'.
    ``shuffle_partitions``: defaults to cores (local mode — 200 would just
    add scheduling overhead; on a real cluster this is set per-job).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        cores_n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        cores_n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores_n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores_n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces by shuffle BYTES; our pandas-UDF stages are CPU-heavy
        # per row at tiny byte volumes (hashes + URLs), and the default 1 MB
        # floor collapses them to a handful of tasks — keep partitions fine
        # enough that CPU parallelism survives coalescing
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # ... and the same applies to the coalescing TARGET: the default
        # advisory size (64 MB) folds any CPU-dense stage whose shuffle is
        # a few MB of hashes/sketch keys onto 1-2 cores (measured: the
        # simhash chunk join at sf1.0 ships ~4 MB and ran 4.1s coalesced
        # vs 0.8s at full width; minhash_near_dup 3.1s -> 1.5s). With
        # shuffle.partitions already == cores, coalescing below core count
        # is never right for CPU-bound stages, so the local default keeps
        # partition-per-core granularity. On a byte-bound cluster raise it
        # per job (guide: 100 MB - 1 GB partitions) via this env var.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64k"),
        )
        # scan split size: the shipped single-file tables have 1-6 row
        # groups, so the default 128 MB split turns every first stage into
        # a 1-2 thread scan; 8 MB splits let each row group get its own
        # task (a split only materializes the row groups whose midpoint it
        # covers — excess splits are free). On a many-file warehouse the
        # 128 MB-1 GB guidance (guide §6) applies instead — override via
        # env for cluster profiles.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # throughput collector: the default G1 loses 2-3x wall time under
        # 32-task-thread allocation rates on many-core boxes (measured on
        # identical plans); ParallelGC is stable for batch workloads
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    # Shuffle/spill media: prefer RAM-backed /dev/shm over the box's single
    # shared /tmp disk. On a real cluster every executor brings its own
    # local disks, so per-node shuffle bandwidth scales with N; on this one
    # box the disk is a CONSTANT shared term that corrupts N-vs-4N scaling
    # measurements (BENCH/BASELINE.md) and adds 10-20% run-to-run jitter.
    # Override with SPARK_LOCAL_DIRS (standard Spark env var) if RAM is
    # tight.
    if "SPARK_LOCAL_DIRS" not in os.environ and os.access("/dev/shm", os.W_OK):
        builder = builder.config("spark.local.dir", "/dev/shm/fe-spark-local")
    # ad-hoc conf overrides for experiments (JSON dict), e.g.
    # FE_SPARK_EXTRA_CONF='{"spark.sql.adaptive.advisoryPartitionSizeInBytes":"16m"}'
    env_conf = os.environ.get("FE_SPARK_EXTRA_CONF")
    if env_conf:
        import json

        for k, v in json.loads(env_conf).items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
