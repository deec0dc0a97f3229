"""Parquet table catalog for the driver-generated testdata.

Tables (TESTDATA.md): TPC-H-ish star schema + events/documents/
embeddings. One parquet file per table under ``{sf_dir}/{name}.parquet``.

Columnar parquet scans give predicate pushdown + column pruning for
free — the reference's row-at-a-time string model (reference
mapreduce.go:36-40, job.go:77-96) has neither; its "pushdown" is the
user writing the filter inside Map (reference amplab1.go:24-26).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Fixed-cardinality dimension tables (5 and 25 rows at every SF):
#: the only tables it is scale-safe to unconditionally broadcast.
#: customer/supplier/part grow linearly with SF — broadcasting those
#: is a runtime size decision (autoBroadcastJoinThreshold + AQE), not
#: a static declaration.
DIM_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # The caller's session may be a vanilla one (the correctness
        # driver builds its own); set the runtime conf here so the
        # nanos timestamp scan works regardless of session origin.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS); with nanosAsLong=true it scans
        # as nanos-since-epoch. Truncate to micros (what DuckDB and any
        # micro-resolution engine sees) and restore the timestamp type.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # Integer DIV: double division would lose precision above
            # 2^53 ns (~1970+104 days); epoch-nanos are ~1.7e18.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        else:
            from pyspark.sql.types import TimestampNTZType

            if isinstance(df.schema["ts"].dataType, TimestampNTZType):
                # Parquet written by micro-resolution engines (e.g. the
                # sf scale-up tool via DuckDB) scans as TIMESTAMP_NTZ;
                # time functions (unix_micros, windows) want TIMESTAMP.
                # Session tz is pinned UTC, so the cast is value-stable.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql(...) access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
