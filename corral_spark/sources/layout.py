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


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int,
    fmt: str = "parquet",
    bits: int = 16,
) -> None:
    """Two-dimensional clustering: interleave the bits of both columns
    (Morton / Z-order key), range-partition and sort by that key, then
    write. Each output file covers a LOCALIZED box in (x, y) space, so
    parquet min/max stats let scans skip files for predicates on
    EITHER column — single-column range clustering localizes one
    dimension and leaves the other spanning the full domain per file.

    Columns are min/max-normalized to ``bits``-bit integers in one agg
    pass (rank-normalization would handle heavy skew better at the
    cost of two global sorts; min/max is the standard first cut). The
    z-key is a pure 2*bits-term bit expression — codegen'd, no UDF —
    and is dropped before writing.
    """
    from pyspark.sql import functions as F

    b = df.agg(
        F.min(col_x).alias("xmin"),
        F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"),
        F.max(col_y).alias("ymax"),
    ).first()
    if b["xmin"] is None or b["ymin"] is None:
        # Empty (or all-NULL-key) input: nothing to cluster — write
        # the empty dataset instead of crashing on None arithmetic.
        df.write.mode("overwrite").format(fmt).save(path)
        return
    scale = (1 << bits) - 1

    def _norm(c, lo, hi):
        span = (hi - lo) or 1
        return F.least(
            F.lit(scale),
            ((F.col(c) - lo) / span * scale).cast("bigint"),
        )

    nx = _norm(col_x, b["xmin"], b["xmax"])
    ny = _norm(col_y, b["ymin"], b["ymax"])
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(nx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ny, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    (
        df.withColumn("__z", z)
        .repartitionByRange(max(n_files, 1), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
