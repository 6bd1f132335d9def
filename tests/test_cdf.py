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


def test_gold_fact_maintained_from_silver_cdf_scans_only_delta(spark, tmp_path):
    """medallion_incremental's real-table twin: fact_source_coverage is
    delta-maintained from the SILVER TABLES' change feeds and lands
    exactly on a full recompute — and the maintenance plan provably
    never rescans the silver snapshots: its inputFiles are the stored
    gold fact plus the commits' _changes logs ONLY.  This is the
    O(delta) gold-refresh plan pin VERDICT r7 #3 asks for."""
    from tlcn_oer_lakehouse_spark.pipelines.medallion import (
        SilverWarehouse,
        run_silver,
    )

    def bronze(rows):
        return spark.createDataFrame(
            rows,
            "id string, title string, url string, scraped_at string, "
            "source string, pdf_paths array<string>",
        )

    dec = "decimal(18,9)"

    def fact_frame(res, docs):
        """The stored-fact shape: FOLDABLE measures (counts + exact
        decimal quality sum), ratios derived downstream."""
        r = res.groupBy("source_system").agg(
            F.count(F.lit(1)).alias("total_resources"),
            F.sum(F.when(F.col("has_assets"), 1).otherwise(0)).alias(
                "resources_with_assets"
            ),
            F.sum(F.col("data_quality_score").cast(dec)).alias("sum_quality"),
        )
        d = docs.groupBy("source_system").agg(
            F.count(F.lit(1)).alias("total_documents")
        )
        return r.join(d, "source_system", "full_outer")

    root = str(tmp_path / "wh")
    b1 = bronze([
        ("A", "Alpha", "https://ocw.mit.edu/courses/a",
         "2024-01-01 00:00:00", "MIT OCW", ["files/a_0.pdf", "files/a_1.pdf"]),
        ("B", "Beta", "https://openstax.org/books/b",
         "2024-01-01 00:00:00", None, ["files/b_0.pdf"]),
        ("C", "Gamma", "https://example.edu/resources/c",
         "2024-01-01 00:00:00", None, []),
    ])
    run_silver(spark, b1, root)
    wh = SilverWarehouse(spark, root)
    v_res, v_doc = wh.resources._head_version(), wh.documents._head_version()

    fact_path = str(tmp_path / "gold_fact")
    fact_frame(wh.resources.read(), wh.documents.read()).write.parquet(fact_path)

    # one incremental batch: A updated (loses asset a_1), B re-sent
    # verbatim — identical fingerprint AND identical scraped_at (the
    # resources table's ts_col treats a NEWER timestamp as a change, per
    # the reference's predicate) -> must contribute NOTHING, D inserted
    # with two assets
    b2 = bronze([
        ("A", "Alpha v2", "https://ocw.mit.edu/courses/a",
         "2024-02-01 00:00:00", "MIT OCW", ["files/a_0.pdf"]),
        ("B", "Beta", "https://openstax.org/books/b",
         "2024-01-01 00:00:00", None, ["files/b_0.pdf"]),
        ("D", "Delta", "https://open.umn.edu/opentextbooks/d",
         "2024-02-01 00:00:00", None, ["files/d_0.pdf", "files/d_1.pdf"]),
    ])
    stats = run_silver(spark, b2, root)
    assert stats == {
        "resources_upserted": 2,  # A update + D insert; B is a no-op
        "documents_upserted": 2,  # D's two assets
        "documents_deleted": 1,   # A's stale a_1
    }

    def sign():
        return F.when(
            F.col("_change_type").isin("insert", "update_postimage"), 1
        ).otherwise(-1)

    stored = spark.read.parquet(fact_path)
    d_res = wh.resources.read_changes(v_res).groupBy("source_system").agg(
        F.sum(sign()).alias("d_resources"),
        F.sum(F.when(F.col("has_assets"), sign()).otherwise(0)).alias(
            "d_with_assets"
        ),
        F.sum(F.col("data_quality_score").cast(dec) * sign()).alias("d_quality"),
    )
    d_docs = wh.documents.read_changes(v_doc).groupBy("source_system").agg(
        F.sum(sign()).alias("d_documents")
    )

    def out(df, total, wa, sq, nd):
        return df.select(
            "source_system",
            total.alias("total_resources"),
            wa.alias("resources_with_assets"),
            nd.alias("total_documents"),
            sq.cast("string").cast("double").alias("sum_quality"),
        )

    z, zdec = F.lit(0), F.lit(0).cast(dec)
    maintained = out(
        stored.join(d_res, "source_system", "full_outer")
        .join(d_docs, "source_system", "full_outer"),
        F.coalesce(F.col("total_resources"), z) + F.coalesce(F.col("d_resources"), z),
        F.coalesce(F.col("resources_with_assets"), z)
        + F.coalesce(F.col("d_with_assets"), z),
        F.coalesce(F.col("sum_quality"), zdec) + F.coalesce(F.col("d_quality"), zdec),
        F.coalesce(F.col("total_documents"), z) + F.coalesce(F.col("d_documents"), z),
    )

    # THE PIN: the maintenance plan reads the stored fact and the
    # change logs — never a silver snapshot data file
    files = maintained.inputFiles()
    assert files, "maintenance plan reports no input files"
    bad = [
        f for f in files
        if "/_changes/" not in f and "/gold_fact/" not in f
    ]
    assert not bad, f"maintenance plan rescans non-delta files: {bad}"

    recomputed = out(
        fact_frame(wh.resources.read(), wh.documents.read()),
        F.col("total_resources"),
        F.col("resources_with_assets"),
        F.col("sum_quality"),
        F.coalesce(F.col("total_documents"), F.lit(0)),
    )
    m = sorted(tuple(r) for r in maintained.collect())
    r = sorted(tuple(r) for r in recomputed.collect())
    assert m == r
