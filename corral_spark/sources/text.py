"""Line-oriented text and TSV key/value readers.

Reproduces the reference's input model (reference job.go:52-96):

* Input files are plain text read line-by-line. Byte-range split
  rectification (skip partial first line, read one past the end —
  reference job.go:66-101) is built into Spark's text datasource, so
  only the record-parse semantics need code here.
* ``splitInputRecord`` (reference job.go:52-63): a line containing
  exactly one ``\\t`` (i.e. splitting into exactly 2 fields) becomes
  ``(key, value)``; any other line is ``(key="", value=line)``.
  Edge cases pinned by reference job_test.go:9-27, e.g.
  ``"foo\\tbar\\tbaz"`` -> key ``""``, value ``"foo\\tbar\\tbaz"``.

All parsing stays JVM-side (split/when/size built-ins) — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read text file(s)/glob(s) into a single ``value: string`` column."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(paths)


def parse_kv(line: Column) -> Column:
    """Line -> struct(key, value) with the reference's exactly-one-tab rule
    (reference job.go:52-63). ``split(line, '\\t')`` yields 2 parts iff the
    line has exactly one tab; otherwise the whole line is the value.
    """
    parts = F.split(line, "\t", -1)
    is_kv = F.size(parts) == 2
    return F.struct(
        F.when(is_kv, parts.getItem(0)).otherwise(F.lit("")).alias("key"),
        F.when(is_kv, parts.getItem(1)).otherwise(line).alias("value"),
    )


def read_kv_lines(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read text file(s) as (key, value) records per the reference rule."""
    df = read_lines(spark, paths)
    kv = parse_kv(F.col("value"))
    return df.select(kv.getField("key").alias("key"), kv.getField("value").alias("value"))
