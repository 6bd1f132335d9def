"""Merge-on-read deletes: tombstone semantics, data-file reuse,
snapshot isolation, and copy-on-write materialization."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.sinks.merge import ParquetMergeTable


def _table(spark, tmp_path, n=1000):
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id")
    t.create(
        spark.range(n).select(
            F.col("id"),
            (F.col("id") % 7).alias("val"),
            F.md5(F.col("id").cast("string")).alias("record_fingerprint"),
        )
    )
    return t


def _data_files(snap):
    out = []
    for root, dirs, files in os.walk(snap):
        # sidecar metadata (_tombstones, _changes) is not data
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        out += [os.path.join(os.path.relpath(root, snap), f)
                for f in files if f.endswith(".parquet")]
    return sorted(out)


def test_mor_delete_hides_rows_without_rewriting_data(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = _data_files(os.path.realpath(t.path))

    assert t.delete_where_mor([("id", "<", 100)]) == 100
    snap = os.path.realpath(t.path)
    assert t.read().count() == 900
    assert t.read().filter("id < 100").count() == 0
    # same data files, just hardlinked into the new snapshot
    assert _data_files(snap) == before
    assert os.path.isdir(os.path.join(snap, "_tombstones"))


def test_mor_deletes_accumulate_and_dedupe(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_mor([("id", "<", 100)])
    # overlapping second delete: only 50 new keys
    assert t.delete_where_mor([("id", "<", 150)]) == 50
    assert t.read().count() == 850
    # deleting already-deleted rows is a no-op (and writes no snapshot)
    versions_before = t.versions()
    assert t.delete_where_mor([("id", "<", 150)]) == 0
    assert t.versions() == versions_before


def test_mor_time_travel_sees_pre_delete_state(spark, tmp_path):
    t = _table(spark, tmp_path)
    v0 = t.history()[-1]["version"]
    t.delete_where_mor([("id", ">=", 500)])
    assert t.read().count() == 500
    assert t.read_version(v0).count() == 1000


def test_upsert_after_mor_delete_resurrects_key(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_mor([("id", "=", 7)])
    assert t.read().filter("id = 7").count() == 0
    t.merge_upsert(
        spark.createDataFrame([(7, 99, "fresh")],
                              ["id", "val", "record_fingerprint"])
    )
    rows = t.read().filter("id = 7").collect()
    assert len(rows) == 1 and rows[0].val == 99
    # the copy-on-write upsert dropped the tombstones entirely
    assert not os.path.isdir(
        os.path.join(os.path.realpath(t.path), "_tombstones")
    )
    assert t.read().count() == 1000


def test_compact_materializes_mor_deletes(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_mor([("id", "<", 100)])
    t.compact()
    snap = os.path.realpath(t.path)
    assert not os.path.isdir(os.path.join(snap, "_tombstones"))
    assert t.read().count() == 900


def test_mor_scan_applies_tombstones(spark, tmp_path):
    t = ParquetMergeTable(
        spark, str(tmp_path / "c"), key="id", cluster_by=("id",),
        cluster_files=4,
    )
    t.create(
        spark.range(1000).select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("record_fingerprint"),
        )
    )
    t.delete_where_mor([("id", "=", 950)])
    got = sorted(r.id for r in t.scan([("id", ">=", 900)]).collect())
    assert 950 not in got and len(got) == 99


def test_vacuum_keeps_hardlinked_data_alive(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_mor([("id", "<", 10)])
    t.delete_where_mor([("id", "<", 20)])
    removed = t.vacuum(keep_last=0)
    assert removed >= 1
    # old version dirs gone; the head's hardlinked data still reads fine
    assert t.read().count() == 980
