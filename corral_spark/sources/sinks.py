"""Output sinks in the reference's interop formats.

* Reduce output: tab-separated ``KEY\\tVALUE\\n`` lines, files named
  ``output-part-<P>`` (reference emitter.go:43, job.go:113).
* Intermediate shuffle format: JSON lines ``{"key":...,"value":...}``
  (reference emitter.go:106-119) — Spark's internal shuffle replaces it
  at runtime; this writer exists only for byte-level interop.

Spark writes ``part-*`` file names; ``rename_output_parts`` optionally
renames them to the reference's ``output-part-<P>`` convention
(a commit-time layout concern, not an engine feature — SURVEY §4.3).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_kv(df: DataFrame) -> DataFrame:
    cols = df.columns
    if cols[:2] != ["key", "value"] and set(cols) != {"key", "value"}:
        raise ValueError(f"kv sink expects (key, value) columns, got {cols}")
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )


def write_tsv_kv(df: DataFrame, path: str, rename: bool = False) -> None:
    """Write ``key\\tvalue`` TSV matching the reference reduce output
    (reference emitter.go:39-46). No quoting/escaping: the reference
    writes raw strings."""
    (
        _as_kv(df)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("quote", "")
        .option("escape", "")
        .option("emptyValue", "")
        .csv(path)
    )
    if rename:
        rename_output_parts(path)


def write_json_kv(df: DataFrame, path: str) -> None:
    """Write the reference's intermediate JSON-lines format
    (reference emitter.go:106-119)."""
    _as_kv(df).write.mode("overwrite").json(path)


def rename_output_parts(path: str) -> None:
    """Rename Spark ``part-00000-*`` files to ``output-part-<P>``
    (reference job.go:113 naming)."""
    idx = 0
    for fname in sorted(os.listdir(path)):
        if re.match(r"part-\d+", fname) and not fname.endswith(".crc"):
            os.rename(
                os.path.join(path, fname),
                os.path.join(path, f"output-part-{idx}"),
            )
            idx += 1
