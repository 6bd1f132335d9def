"""Bucketed point-in-interval range join.

Spark has no native range-join strategy: a raw
``points.join(intervals, point BETWEEN lo AND hi)`` plans as a
BroadcastNestedLoopJoin (O(|P|·|I|) comparisons — the registry-wide plan
lint rejects exactly that shape).  The scale-safe plan quantizes the
range dimension: each interval explodes to the fixed-width buckets it
covers, each point maps to its single bucket, and the join becomes an
equi-join on bucket id followed by the exact residual range filter.

Cost: |I| · (len/width + 1) exploded interval rows and a hash shuffle on
bucket id — linear, skew-bounded by how many intervals overlap one
bucket.  Pick ``bucket_width`` ≈ the typical interval length (Databricks'
range-join hint takes the same ``bin`` parameter for the same reason).
Each (point, interval) match is emitted exactly once: a point lives in
exactly one bucket and an interval appears at most once per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``lo <= point <= hi`` (inclusive bounds), via bucket equi-join.
    Columns from both inputs survive; the helper bucket column does not.
    """
    binned_intervals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    binned_points = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width)
    )
    return (
        binned_points.join(binned_intervals, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
