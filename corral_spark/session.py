"""SparkSession construction tuned for the engine.

The reference's tuning surface is split sizes and task fan-out
(reference config.go:23-31, split.go:33-93); on Spark those map to
``spark.sql.files.maxPartitionBytes`` and AQE. We enable AQE so the
reference's static reducer-count formula (reference job.go:221-224) is
superseded by runtime partition coalescing and skew-join splitting,
and Arrow so any Pandas-UDF path is batch-transferred.

Scale posture: these defaults are written for a real multi-executor
cluster; on ``local[N]`` they behave sensibly too. Nothing here pins
local mode except the test/bench entry points.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for 100 TB-scale behavior; every one is overridable.
ENGINE_CONF: dict[str, str] = {
    # AQE replaces the reference's static `bins = size/reduceBinSize*1.25`
    # heuristic (job.go:221-224) with runtime coalescing + skew handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every Python<->JVM batch boundary (pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Reference splits input at 100 MB (config.go:28); 128 MB is the
    # Spark-idiomatic equivalent and keeps scan partitions executor-sized.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Broadcast joins for dimension tables (region/nation/customer dims).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Session timezone pinned so timestamp semantics match the DuckDB
    # oracle regardless of host zone.
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: permissive casts mirror the reference's skip-bad-rows
    # policy (amplab2.go:38-40) — failed parses become NULL, not errors.
    "spark.sql.ansi.enabled": "false",
    # events.ts is TIMESTAMP(NANOS) parquet, which the vectorized reader
    # rejects; read as long and convert (sources.tables.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def build_session(
    app_name: str = "corral_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    ``master=None`` leaves cluster selection to spark-submit / env —
    the production path. Tests pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_session(app_name: str = "corral_spark-local") -> SparkSession:
    """Session for local tests/bench: local[$SPARK_GRAFT_CPUS]."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_shuffle = 32 if cpus == "*" else max(int(cpus), 1)
    return build_session(
        app_name,
        master=f"local[{cpus}]",
        shuffle_partitions=n_shuffle,
        extra_conf={"spark.driver.memory": "8g", "spark.ui.enabled": "false"},
    )
