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


def _morton_interleave(nx, ny, bits: int):
    """Z-order key: interleave ``bits`` bits of two bigint columns
    (x at odd positions, y at even) — delegates to the canonical
    column-level Morton key (`operators.layout.zorder_key`, whose SQL
    twin the zorder_parts_locality oracle replays) so the key
    construction cannot drift between the writers and the analytic
    surface. zorder_key puts its FIRST argument at even positions, so
    the historical (x-odd, y-even) convention here maps to
    zorder_key(y, x)."""
    from corral_spark.operators.layout import zorder_key

    return zorder_key(ny, nx, bits)


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
    z = _morton_interleave(nx, ny, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(max(n_files, 1), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def write_zorder_rank_clustered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int,
    fmt: str = "parquet",
    bits: int = 8,
    relative_error: float = 0.001,
) -> None:
    """Skew-robust two-dimensional clustering: like
    ``write_zorder_clustered`` but with EQUI-DEPTH (rank) normalization
    instead of min/max.  Under a skewed distribution (Zipf keys, heavy
    hitters, long-tailed values) min/max normalization collapses most
    rows into a handful of z-cells — the files end up unbalanced and
    their min/max boxes overlap, destroying the skipping property
    exactly where it matters.  Quantile bucketing gives each bucket
    ~equal row count regardless of shape, so files stay balanced and
    boxes stay disjoint.

    Cost shape is identical to the min/max variant: ONE stats pass
    (``approxQuantile`` over both columns together — a streaming
    Greenwald-Khanna style sketch, not a sort) plus the one range
    exchange; the bucket lookup runs JVM-side (ml.feature.Bucketizer),
    no Python in the row path.  ``bits`` defaults to 8 (256 buckets
    per dimension = 65k z-cells — plenty for file-level skipping; more
    just inflates the quantile request).
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    qx, qy = df.stat.approxQuantile(
        [col_x, col_y], probs, relative_error
    )
    if not qx or not qy:
        df.write.mode("overwrite").format(fmt).save(path)
        return

    def _splits_and_positions(
        qs: list[float],
    ) -> tuple[list[float], list[int]]:
        """Distinct Bucketizer splits plus each bucket's MASS-
        proportional position in the bit domain.

        Duplicated quantile points mean a single value carries many
        probability steps (a heavy hitter).  If dedup just collapsed
        them to consecutive bucket indices, a value holding 10% of the
        mass would sit one index from its neighbor and all the skew
        dimension's information would land in the LOW interleave bits
        — the z-order then degenerates to ordering by the other
        column.  Instead, each bucket keeps the midpoint of its
        quantile-step range as its position, so heavy values are
        spaced apart proportionally to their mass and the interleave's
        HIGH bits split mass evenly — which is what makes the top-k
        range boundaries informative for both dimensions.
        """
        uniq: list[float] = []
        below: list[int] = []  # # quantile points strictly below value
        at: list[int] = []  # # quantile points <= value
        for j, v in enumerate(qs):
            if not uniq or v > uniq[-1]:
                uniq.append(v)
                below.append(j)
                at.append(j + 1)
            else:
                at[-1] = j + 1
        m = len(qs)
        # Bucket 0 = (-inf, uniq[0]); bucket b>=1 = [uniq[b-1], uniq[b]).
        positions = [0]
        for b in range(len(uniq)):
            mid = (below[b] + at[b]) / 2
            positions.append(round(mid / m * (n_buckets - 1)))
        # Final bucket [uniq[-1], inf) already appended above via its
        # own midpoint; add the handleInvalid=keep NULL bucket, pinned
        # to the top cell so NULLs cluster together.
        positions.append(n_buckets - 1)
        return [float("-inf")] + uniq + [float("inf")], positions

    from pyspark.ml.feature import Bucketizer

    splits_x, pos_x = _splits_and_positions(qx)
    splits_y, pos_y = _splits_and_positions(qy)
    tmp_x, tmp_y, bx, by = "__qx", "__qy", "__bx", "__by"
    bucketed = Bucketizer(
        splitsArray=[splits_x, splits_y],
        inputCols=[tmp_x, tmp_y],
        outputCols=[bx, by],
        handleInvalid="keep",  # NULLs go to the last bucket, not an error
    ).transform(
        df.withColumn(tmp_x, F.col(col_x).cast("double")).withColumn(
            tmp_y, F.col(col_y).cast("double")
        )
    )
    # Literal lookup arrays (bucket index -> bit-domain position):
    # one O(1) element_at per row, all JVM-side.
    lut_x = F.array([F.lit(p) for p in pos_x])
    lut_y = F.array([F.lit(p) for p in pos_y])
    nx = F.element_at(lut_x, F.col(bx).cast("int") + 1).cast("bigint")
    ny = F.element_at(lut_y, F.col(by).cast("int") + 1).cast("bigint")
    z = _morton_interleave(nx, ny, bits)
    (
        bucketed.withColumn("__z", z)
        .drop(tmp_x, tmp_y, bx, by)
        .repartitionByRange(max(n_files, 1), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def zonemap_report(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max statistics for ``cols`` read straight from
    the parquet FOOTERS (pyarrow; no data pages touched) — the same
    zonemaps a scan uses for file/row-group skipping, so this is the
    ground truth for whether a layout actually prunes: after
    write_zorder_clustered both columns' per-file spans are narrow
    boxes; after a single-column sort only that column's are.

    Driver-side by design: one footer read per file, n_files rows out
    — an ops REPORT (layout audits, skipping-ratio estimates), not a
    data path. For a 100k-file table, parallelize the footer reads or
    sample; the per-file record shape stays the same.

    Returns one dict per data file: {file, n_rows, <col>_min,
    <col>_max, ...} with None for columns lacking stats.
    """
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith("_"):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        rec: dict = {"file": name, "n_rows": f.metadata.num_rows}
        idx = {
            f.metadata.schema.column(i).name: i
            for i in range(f.metadata.num_columns)
        }
        for c in cols:
            lo = hi = None
            if c in idx:
                for rg in range(f.metadata.num_row_groups):
                    st = f.metadata.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            rec[f"{c}_min"] = lo
            rec[f"{c}_max"] = hi
        out.append(rec)
    return out


def skipping_ratio(
    report: list[dict], col: str, lo, hi
) -> float:
    """Fraction of files a range predicate ``lo <= col <= hi`` can
    SKIP given a zonemap_report — the number the layout writers exist
    to maximize. Files without stats count as unskippable (a scan
    must read them)."""
    if not report:
        return 0.0
    skipped = sum(
        1
        for r in report
        if r[f"{col}_min"] is not None
        and (r[f"{col}_max"] < lo or r[f"{col}_min"] > hi)
    )
    return skipped / len(report)
