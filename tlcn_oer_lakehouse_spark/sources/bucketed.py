"""Bucketed managed tables — shuffle-free co-located joins.

At 100 TB the dominant cost of fact-to-fact joins (orders ⋈ lineitem,
chunks ⋈ embeddings) is the shuffle.  Writing both sides bucketed by the
join key with the same bucket count lets Spark's scan report the hash
partitioning, so SortMergeJoin runs with ZERO Exchange on either side —
the join happens bucket-to-bucket.  This is the static complement of
AQE: a layout decision made at write time, amortized over every future
join on that key.

The reference never buckets (its Iceberg specs partition by
source/day only); this module adds the capability and
tests/test_bucketing.py proves the Exchange-free plan.

Bucketed writes require a managed table (``saveAsTable``) — the bucket
metadata lives in the catalog, not the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    ``path`` makes it external (data at the given location); without it
    the session's warehouse dir is used."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_pair: tuple[str, str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.  With equal
    bucket counts the physical plan contains no shuffle Exchange."""
    lk, rk = key_pair
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[lk] == right[rk])
