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


def bucketed_interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Interval×interval OVERLAP join (``a_lo <= b_hi AND a_hi >= b_lo``,
    closed bounds) via bucket tiling — the two-sided generalization of
    :func:`bucketed_range_join` (PostgreSQL ``&&``, Databricks range-join
    type 2).

    Both sides explode to the buckets they cover and equi-join on bucket
    id.  Overlapping intervals share EVERY bucket of their intersection,
    so naive tiling emits duplicates; instead of a dropDuplicates
    shuffle, each candidate is kept only in the FIRST shared bucket —
    ``bucket == greatest(floor(a_lo/W), floor(b_lo/W))`` — which every
    overlapping pair hits exactly once (the standard dedup-free
    refinement from grid spatial joins, e.g. the PBSM/partition-based
    join trick).  Exact residual overlap filter keeps the output
    identical to the theta-join; the dedup condition itself is exact
    integer arithmetic."""
    a_binned = a.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(a_lo) / bucket_width),
                F.floor(F.col(a_hi) / bucket_width),
            )
        ),
    )
    b_binned = b.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(b_lo) / bucket_width),
                F.floor(F.col(b_hi) / bucket_width),
            )
        ),
    )
    return (
        a_binned.join(b_binned, "__bucket")
        .filter(
            (F.col(a_lo) <= F.col(b_hi))
            & (F.col(a_hi) >= F.col(b_lo))
            & (
                F.col("__bucket")
                == F.greatest(
                    F.floor(F.col(a_lo) / bucket_width),
                    F.floor(F.col(b_lo) / bucket_width),
                )
            )
        )
        .drop("__bucket")
    )
