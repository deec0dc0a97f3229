"""Row provenance: which file and which physical row each record came
from — the lineage columns a training-data pipeline records so any
example in a shipped corpus can be traced back to its source shard
(audits, takedown requests, contamination forensics).

Spark-first: the file source exposes a hidden ``_metadata`` struct
(file_path, file_name, file_size, file_block_start, row_index, ...)
resolved at the scan, so provenance costs NOTHING — no ids generated,
no shuffle, no UDF; ``row_index`` is the record's physical position in
its parquet file, stable across re-reads regardless of parallelism
(unlike ``monotonically_increasing_id``, which depends on partition
layout). The reference has no analog (its record identity is the
byte-offset split, SURVEY F4); this is §2.4 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_provenance(
    df: DataFrame,
    file_col: str = "source_file",
    row_col: str = "source_row",
    basename_only: bool = False,
) -> DataFrame:
    """``df`` plus (file_col, row_col) from the scan's ``_metadata``
    struct. Must be called on a DataFrame whose lineage bottoms out at
    a file source (the hidden column resolves through projections and
    filters, but not past joins/aggregations — attach provenance
    FIRST, then transform). ``basename_only`` strips the directory
    (stable across hosts/mounts for oracle or golden comparisons)."""
    path = F.col("_metadata.file_path")
    if basename_only:
        path = F.regexp_extract(path, "([^/]+)$", 1)
    return df.select(
        "*",
        path.alias(file_col),
        F.col("_metadata.row_index").alias(row_col),
    )
