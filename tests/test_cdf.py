"""Change data feed on ParquetMergeTable — the Delta CDF / Iceberg
changelog analog.  Every mutator captures its row-level changes at write
time (O(changed rows), never a snapshot diff), the log publishes
atomically inside the snapshot dir, and ``read_changes`` folds a version
range for downstream incremental consumers — the engine-native
replacement for the reference's full-scan index diff
(elasticsearch_sync.py:343-395, Q7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.sinks.merge import ParquetMergeTable


def _fp(df):
    return df.withColumn("record_fingerprint", F.md5(F.col("val")))


def _table(spark, tmp_path, **kw):
    return ParquetMergeTable(spark, str(tmp_path / "t"), key="id", **kw)


def _feed(t, since, end=None):
    return sorted(
        (r._commit_version, r._change_type, r.id, r.val)
        for r in t.read_changes(since, end).collect()
    )


def test_create_logs_inserts(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])))
    head = t._head_version()
    assert _feed(t, head - 1) == [
        (head, "insert", 1, "a"),
        (head, "insert", 2, "b"),
    ]


def test_upsert_splits_insert_update_and_skips_noops(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])))
    v0 = t._head_version()
    # id=1 unchanged (no-op must NOT appear), id=2 modified, id=3 new
    t.merge_upsert(
        _fp(spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], ["id", "val"]))
    )
    v1 = t._head_version()
    assert _feed(t, v0) == [
        (v1, "insert", 3, "c"),
        (v1, "update_postimage", 2, "B"),
        (v1, "update_preimage", 2, "b"),
    ]


def test_merge_delete_logs_full_rows(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "val"])))
    v0 = t._head_version()
    t.merge_delete(spark.createDataFrame([(1,), (3,)], ["id"]))
    v1 = t._head_version()
    # id=2 is stale (absent from current keys) -> deleted, with payload
    assert _feed(t, v0) == [(v1, "delete", 2, "b")]


def test_mor_delete_logs_and_does_not_inherit_old_log(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])))
    v0 = t._head_version()
    t.delete_where_mor([("id", "=", 2)])
    v1 = t._head_version()
    assert _feed(t, v0) == [(v1, "delete", 2, "b")]
    # the hardlinked snapshot must not replay v0's insert log as v1's
    types = {r._change_type for r in t.read_changes(v0).collect()}
    assert types == {"delete"}


def test_compact_is_physical_only(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])))
    v0 = t._head_version()
    t.compact()
    feed = t.read_changes(v0)
    assert feed.count() == 0
    assert "_change_type" in feed.columns  # schema survives the empty range


def test_multi_version_range_and_commit_versions(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a")], ["id", "val"])))
    v0 = t._head_version()
    t.merge_upsert(_fp(spark.createDataFrame([(2, "b")], ["id", "val"])))
    t.merge_upsert(_fp(spark.createDataFrame([(1, "A")], ["id", "val"])))
    v2 = t._head_version()
    feed = _feed(t, v0)
    assert (v0 + 1, "insert", 2, "b") in feed
    assert (v2, "update_postimage", 1, "A") in feed
    assert (v2, "update_preimage", 1, "a") in feed
    # bounded range: only the first commit
    assert _feed(t, v0, v0 + 1) == [(v0 + 1, "insert", 2, "b")]


def test_vacuumed_range_raises(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a")], ["id", "val"])))
    v0 = t._head_version()
    for i in range(3):
        t.merge_upsert(_fp(spark.createDataFrame([(10 + i, "x")], ["id", "val"])))
    t.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="not retained"):
        t.read_changes(v0)


def test_incremental_view_maintenance_equals_recompute(spark, tmp_path):
    """The point of a CDF: a downstream SUM-per-group view folds only
    the delta — inserts add, deletes subtract, updates add (post − pre)
    — and lands exactly on the full recompute."""
    t = ParquetMergeTable(spark, str(tmp_path / "t"), key="id")
    rows0 = [(i, "g%d" % (i % 3), float(i)) for i in range(30)]
    df0 = spark.createDataFrame(rows0, ["id", "grp", "amount"]).withColumn(
        "record_fingerprint", F.md5(F.col("amount").cast("string"))
    )
    t.create(df0)
    v0 = t._head_version()
    view = {
        r.grp: r.s
        for r in t.read().groupBy("grp").agg(F.sum("amount").alias("s")).collect()
    }

    # a mixed commit batch: 5 updates, 5 inserts; then a delete commit
    upd = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i) + 100.0) for i in range(5)]
        + [(100 + i, "g%d" % (i % 3), 7.0) for i in range(5)],
        ["id", "grp", "amount"],
    ).withColumn("record_fingerprint", F.md5(F.col("amount").cast("string")))
    t.merge_upsert(upd)
    keep = spark.createDataFrame(
        [(r.id,) for r in t.read().collect() if r.id % 7 != 0], ["id"]
    )
    t.merge_delete(keep)

    feed = t.read_changes(v0)
    signed = feed.withColumn(
        "delta",
        F.when(F.col("_change_type").isin("insert", "update_postimage"),
               F.col("amount")).otherwise(-F.col("amount")),
    )
    deltas = {
        r.grp: r.d
        for r in signed.groupBy("grp").agg(F.sum("delta").alias("d")).collect()
    }
    maintained = {
        g: view.get(g, 0.0) + deltas.get(g, 0.0)
        for g in set(view) | set(deltas)
    }
    recomputed = {
        r.grp: r.s
        for r in t.read().groupBy("grp").agg(F.sum("amount").alias("s")).collect()
    }
    for g in set(maintained) | set(recomputed):
        assert abs(maintained.get(g, 0.0) - recomputed.get(g, 0.0)) < 1e-9


def test_rollback_feed_folds_to_restored_state(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])))
    v0 = t._head_version()
    t.merge_upsert(_fp(spark.createDataFrame([(2, "B"), (3, "c")], ["id", "val"])))
    v1 = t._head_version()
    t.rollback(v0)
    v2 = t._head_version()
    feed = _feed(t, v1, v2)
    # restoring v0 undoes the upsert: 3 disappears, 2 reverts
    assert feed == [
        (v2, "delete", 3, "c"),
        (v2, "update_postimage", 2, "b"),
        (v2, "update_preimage", 2, "B"),
    ]
    assert sorted((r.id, r.val) for r in t.read().collect()) == [(1, "a"), (2, "b")]


def test_changes_stream_tails_the_feed(spark, tmp_path):
    """Streaming CDF source: a file stream over the per-commit change
    logs delivers exactly the rows the batch feed reports, with
    _commit_version recovered from the path — and a second availableNow
    run against the same checkpoint picks up ONLY commits made since."""
    from tlcn_oer_lakehouse_spark.streaming.ingest import changes_stream

    t = _table(spark, tmp_path)
    t.create(_fp(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])))
    t.merge_upsert(_fp(spark.createDataFrame([(2, "B"), (3, "c")], ["id", "val"])))

    seen: list[tuple] = []

    def _collect(batch_df, batch_id):
        seen.extend(
            (r._commit_version, r._change_type, r.id, r.val)
            for r in batch_df.collect()
        )

    ckpt = str(tmp_path / "ckpt")
    q = (
        changes_stream(t)
        .writeStream.foreachBatch(_collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    head = t._head_version()
    batch_feed = sorted(
        (r._commit_version, r._change_type, r.id, r.val)
        for r in t.read_changes(head - 2, head).collect()
    )
    assert sorted(seen) == batch_feed

    # new commit -> restarted stream delivers only the delta
    t.merge_delete(spark.createDataFrame([(1,), (2,)], ["id"]))
    seen.clear()
    q = (
        changes_stream(t)
        .writeStream.foreachBatch(_collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    v_del = t._head_version()
    assert sorted(seen) == [(v_del, "delete", 3, "c")]
