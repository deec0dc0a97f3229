"""Range / interval joins.

A pure range join (point BETWEEN lo AND hi, no equi key) defaults to a
broadcast-nested-loop or cartesian plan in Spark — O(points x
intervals) comparisons. The scalable formulation decomposes intervals
into fixed-width buckets: every interval is exploded to the buckets it
overlaps, points map to exactly one bucket, and the join becomes an
EQUI-join on bucket id followed by an exact range refine. Cost is
O(points + intervals x avg_span/width + candidate pairs) — the same
inverted-index trick the dedup operators use, applied to the time axis.

The reference has no range-join analog (its joins are single-key
MapReduce groupings, e.g. examples amplab3.go:41-58); this is gap
coverage the way SURVEY §2.3 mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (point/lo/hi numeric — epoch seconds, prices,
    …) via bucket decomposition.

    ``bucket_width`` trades explode fan-out (short buckets -> more
    interval replicas) against candidate precision (long buckets ->
    more refine-filtered pairs); set it near the median interval
    length. Intervals spanning many buckets replicate per bucket —
    bounded by span/width, never by the point count.

    Only inner semantics are supported: the post-join range refine
    would silently drop any outer join's unmatched rows (NULL lo/hi
    fail the filter), degrading it back to inner — better to refuse
    than to lie. Columns of both inputs are preserved; callers
    project afterwards.
    """
    if how != "inner":
        raise ValueError(
            "interval_bucket_join supports how='inner' only: the range "
            f"refine drops unmatched outer rows, got how={how!r}"
        )
    # Floor division keeps bucketization monotone for negative values
    # (cast-truncation would fold (-width, 0) into bucket 0).
    b_point = F.floor(F.col(point_col) / bucket_width).cast("bigint")
    lo_b = F.floor(F.col(lo_col) / bucket_width).cast("bigint")
    hi_b = F.floor(F.col(hi_col) / bucket_width).cast("bigint")
    iv = intervals.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
    pt = points.withColumn("__bucket", b_point)
    joined = pt.join(iv, on="__bucket", how=how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")
