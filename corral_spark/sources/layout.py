"""Write-layout helpers: file sizing and partitioned output.

At 100 TB the writer's file layout decides the next job's scan cost:
thousands of KB-sized files destroy listing/open throughput (the
small-files problem), while single-GB monoliths kill parallelism.
These helpers pin both knobs declaratively.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def write_compacted(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    max_records_per_file: int = 1_000_000,
    target_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write with bounded file sizes.

    ``maxRecordsPerFile`` caps the large end; ``target_files``
    coalesces the small end (pass the expected row count / records-
    per-file). Both together give the classic compaction pass.
    """
    out = df
    if target_files is not None:
        out = out.coalesce(max(int(target_files), 1))
    writer = (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .format(fmt)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def plan_target_files(n_rows: int, rows_per_file: int) -> int:
    return max(1, math.ceil(n_rows / rows_per_file))


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    fmt: str = "parquet",
) -> None:
    """Range-partition by ``cluster_cols`` and sort within partitions
    before writing — each output file then covers a disjoint key
    range, so parquet min/max stats let later scans skip whole files
    for selective predicates (the single-dimension form of data
    clustering / Z-ordering). One range-exchange shuffle."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
