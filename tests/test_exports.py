"""Export sinks: JSONL round-trip, SAF Dublin-Core structure, REST bulk
sink batching via the spool transport."""

from __future__ import annotations

import glob
import json
import os
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.sinks.export import (
    export_saf,
    rest_bulk_sink,
    spool_transport_factory,
    write_jsonl,
)


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    out = str(tmp_path / "out")
    write_jsonl(df, out, partitions=2)
    back = spark.read.json(out)
    assert sorted((r.id, r.val) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_saf_export_structure(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "Linear Algebra", ["Strang"], "textbook"),
         (2, "Calculus", ["Spivak", "Apostol"], None)],
        ["rid", "title", "authors", "body"],
    ).orderBy("rid")
    out = str(tmp_path / "saf")
    n = export_saf(
        df, out,
        field_map={"title": "title", "creator": "authors", "description": "body"},
        content_col="body",
    )
    assert n == 2
    x = ET.parse(os.path.join(out, "item_000000", "dublin_core.xml")).getroot()
    vals = {(e.get("element"), e.text) for e in x.findall("dcvalue")}
    assert ("title", "Linear Algebra") in vals and ("creator", "Strang") in vals
    # multi-valued creator on item 2; None description skipped
    x2 = ET.parse(os.path.join(out, "item_000001", "dublin_core.xml")).getroot()
    creators = [e.text for e in x2.findall("dcvalue") if e.get("element") == "creator"]
    assert creators == ["Spivak", "Apostol"]
    assert not [e for e in x2.findall("dcvalue") if e.get("element") == "description"]
    assert os.path.exists(os.path.join(out, "item_000000", "contents"))


def test_rest_bulk_sink_spool(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    ).repartition(4)
    spool = str(tmp_path / "spool")
    rest_bulk_sink(df, spool_transport_factory(spool), batch_size=100)
    files = glob.glob(f"{spool}/*.jsonl")
    assert len(files) >= 4  # at least one batch per partition
    recs = []
    for fp in files:
        with open(fp) as f:
            recs.extend(json.loads(line) for line in f)
    assert len(recs) == 1000
    assert {r["id"] for r in recs} == set(range(1000))
    assert all(r["doubled"] == r["id"] * 2 for r in recs)


def test_saf_export_distributed_matches_driver_side(spark, tmp_path):
    """K9 scalable form: foreachPartition SAF writer produces the same
    per-item XML payloads as the driver-side exporter (items keyed by id
    instead of arrival order)."""
    from tlcn_oer_lakehouse_spark.sinks.export import export_saf_distributed

    df = spark.createDataFrame(
        [(1, "Linear Algebra", ["Strang"], "textbook"),
         (2, "Calculus", ["Spivak", "Apostol"], None),
         (3, "Topology", ["Munkres"], "notes")],
        ["rid", "title", "authors", "body"],
    ).repartition(3)
    out = str(tmp_path / "saf_dist")
    export_saf_distributed(
        df, out,
        field_map={"title": "title", "creator": "authors", "description": "body"},
        id_col="rid", content_col="body",
    )
    assert sorted(os.listdir(out)) == ["item_1", "item_2", "item_3"]
    x2 = ET.parse(os.path.join(out, "item_2", "dublin_core.xml")).getroot()
    creators = [e.text for e in x2.findall("dcvalue") if e.get("element") == "creator"]
    assert creators == ["Spivak", "Apostol"]
    with open(os.path.join(out, "item_3", "contents")) as f:
        assert f.read() == "notes"
    # None payload -> empty contents file, mirroring export_saf
    with open(os.path.join(out, "item_2", "contents")) as f:
        assert f.read() == ""
