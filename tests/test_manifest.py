"""Manifest-based data skipping: footer-stats bounds, range clustering,
file pruning, partition-dir point bounds — and the invariant that a
pruned scan returns exactly what a full scan + filter returns."""

from __future__ import annotations

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.sinks.manifest import read_manifest, write_manifest
from tlcn_oer_lakehouse_spark.sinks.merge import ParquetMergeTable


def _clustered_table(spark, tmp_path, n=10_000, files=8):
    t = ParquetMergeTable(
        spark, str(tmp_path / "t"), key="id",
        cluster_by=("id",), cluster_files=files,
    )
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 7 % 1000).alias("val"),
        F.md5(F.col("id").cast("string")).alias("record_fingerprint"),
    )
    t.create(df)
    return t


def test_manifest_written_with_bounds(spark, tmp_path):
    t = _clustered_table(spark, tmp_path)
    import os

    manifest = read_manifest(os.path.realpath(t.path))
    assert manifest is not None
    assert len(manifest["files"]) == 8
    for entry in manifest["files"]:
        assert "id" in entry["bounds"]
        mn, mx = entry["bounds"]["id"]
        assert mn <= mx
    # range clustering -> disjoint id ranges across files
    ranges = sorted(tuple(e["bounds"]["id"]) for e in manifest["files"])
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo


def test_range_predicate_prunes_files(spark, tmp_path):
    t = _clustered_table(spark, tmp_path)
    preds = [("id", ">=", 9000)]
    files = t.pruned_files(preds)
    assert files is not None and 0 < len(files) < 8
    got = sorted(r.id for r in t.scan(preds).collect())
    want = sorted(r.id for r in t.read().filter(F.col("id") >= 9000).collect())
    assert got == want


def test_equality_predicate_prunes_to_one_file(spark, tmp_path):
    t = _clustered_table(spark, tmp_path)
    files = t.pruned_files([("id", "=", 4242)])
    assert files is not None and len(files) == 1
    rows = t.scan([("id", "=", 4242)]).collect()
    assert len(rows) == 1 and rows[0].val == 4242 * 7 % 1000


def test_empty_selection_returns_empty_with_schema(spark, tmp_path):
    t = _clustered_table(spark, tmp_path)
    df = t.scan([("id", ">", 10_000_000)])
    assert df.count() == 0
    assert set(df.columns) == {"id", "val", "record_fingerprint"}


def test_partition_dirs_become_point_bounds(spark, tmp_path):
    t = ParquetMergeTable(
        spark, str(tmp_path / "p"), key="id", partition_by=("bucket",)
    )
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).alias("bucket"),
        F.md5(F.col("id").cast("string")).alias("record_fingerprint"),
    )
    t.create(df)
    files = t.pruned_files([("bucket", "=", 2)])
    assert files is not None
    assert all("bucket=2" in f for f in files)
    got = sorted(r.id for r in t.scan([("bucket", "=", 2)]).collect())
    assert got == sorted(range(2, 1000, 4))


def test_merge_refreshes_manifest(spark, tmp_path):
    t = _clustered_table(spark, tmp_path, n=100, files=2)
    t.merge_upsert(
        spark.createDataFrame([(1_000_000, 7, "x")],
                              ["id", "val", "record_fingerprint"])
    )
    files = t.pruned_files([("id", ">=", 1_000_000)])
    assert files is not None and len(files) >= 1
    assert [r.id for r in t.scan([("id", ">=", 1_000_000)]).collect()] == [1_000_000]


def test_unclustered_table_keeps_all_files(spark, tmp_path):
    # without stats on the predicate column, pruning must keep the file
    t = ParquetMergeTable(spark, str(tmp_path / "u"), key="id")
    t.create(spark.createDataFrame([(1, "a", "f1"), (2, "b", "f2")],
                                   ["id", "val", "record_fingerprint"]))
    import os

    snap = os.path.realpath(t.path)
    write_manifest(snap)
    files = t.pruned_files([("nonexistent_col", ">=", 5)])
    assert files is not None and len(files) > 0


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering: single-dimension predicates prune files for
    EVERY participating column — the property plain range clustering on
    (a, b) lacks (b-only predicates scan all files there)."""
    n, files = 4096, 16
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.md5(F.col("id").cast("string")).alias("record_fingerprint"),
    )
    zt = ParquetMergeTable(
        spark, str(tmp_path / "z"), key="id",
        cluster_by=("a", "b"), cluster_files=files, zorder=True,
    )
    zt.create(df)

    pruned_a = zt.pruned_files([("a", "=", 3)])
    pruned_b = zt.pruned_files([("b", "=", 3)])
    assert len(pruned_a) < files and len(pruned_b) < files
    # conjunctive predicate prunes at least as hard as either alone
    pruned_ab = zt.pruned_files([("a", "=", 3), ("b", "=", 3)])
    assert len(pruned_ab) <= min(len(pruned_a), len(pruned_b))

    # correctness: pruned scan == full filter, on all three predicates
    for preds in ([("a", "=", 3)], [("b", "=", 3)], [("a", "=", 3), ("b", "=", 3)]):
        got = sorted(r.id for r in zt.scan(preds).collect())
        full = zt.read()
        for col, _, val in preds:
            full = full.filter(F.col(col) == val)
        assert got == sorted(r.id for r in full.collect())

    # contrast: lexicographic range clustering on (a, b) cannot prune
    # b-only predicates (a is the leading sort key; b spans all files)
    rt = ParquetMergeTable(
        spark, str(tmp_path / "r"), key="id",
        cluster_by=("a", "b"), cluster_files=files,
    )
    rt.create(df)
    assert len(rt.pruned_files([("b", "=", 3)])) == files


def test_hidden_day_partitioning_prunes_on_source_column(spark, tmp_path):
    """Iceberg-style hidden partitioning: the table partitions by
    day(ts); predicates on ts itself prune partitions, and the derived
    column never appears in the schema."""
    import datetime as dt

    t = ParquetMergeTable(
        spark, str(tmp_path / "h"), key="id",
        partition_transforms={"ts_day": ("day", "ts")},
    )
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 3, 12, 0, 0), f"f{i}")
        for i in range(300)
    ]
    t.create(spark.createDataFrame(
        rows, "id bigint, ts timestamp, record_fingerprint string"
    ))

    assert "ts_day" not in t.read().columns
    all_files = t.pruned_files([])
    pruned = t.pruned_files([("ts", ">=", dt.datetime(2024, 1, 3))])
    assert 0 < len(pruned) < len(all_files)
    assert all("ts_day=2024-01-03" in f for f in pruned)

    got = sorted(r.id for r in t.scan([("ts", ">=", dt.datetime(2024, 1, 3))]).collect())
    want = sorted(
        r.id for r in t.read().filter(F.col("ts") >= "2024-01-03").collect()
    )
    assert got == want and "ts_day" not in t.scan([("ts", ">=", dt.datetime(2024, 1, 3))]).columns


def test_hidden_bucket_partitioning_equality_prune(spark, tmp_path):
    t = ParquetMergeTable(
        spark, str(tmp_path / "hb"), key="id",
        partition_transforms={"id_b": ("bucket", "id", 8)},
    )
    t.create(spark.range(400).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("record_fingerprint")
    ))
    all_files = t.pruned_files([])
    pruned = t.pruned_files([("id", "=", 123)])
    assert 0 < len(pruned) < len(all_files)
    rows = t.scan([("id", "=", 123)]).collect()
    assert [r.id for r in rows] == [123]
    # range predicates must NOT be mapped through the hash bucket
    assert len(t.pruned_files([("id", ">=", 0)])) == len(all_files)
