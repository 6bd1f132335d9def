"""Bronze JSON source: multiline array parse, corrupt-record quarantine,
lineage columns (S1 production form)."""

from __future__ import annotations

import json

from pyspark.sql.types import LongType, StringType, StructField, StructType

from tlcn_oer_lakehouse_spark.sources.bronze_json import (
    read_bronze_json,
    split_corrupt,
)

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("title", StringType())]
)


def test_multiline_array_parse_with_lineage(spark, tmp_path):
    records = [{"id": 1, "title": "Calculus"}, {"id": 2, "title": "Algebra"}]
    f = tmp_path / "mit_ocw.json"
    f.write_text(json.dumps(records))
    df = read_bronze_json(spark, str(tmp_path), schema=SCHEMA, multiline=True)
    rows = df.collect()
    assert sorted((r.id, r.title) for r in rows) == [(1, "Calculus"), (2, "Algebra")]
    assert all(r.bronze_source_path.endswith("mit_ocw.json") for r in rows)
    assert all(r.ingested_at is not None for r in rows)


def test_corrupt_records_quarantined_not_fatal(spark, tmp_path):
    f = tmp_path / "scrape.jsonl"
    f.write_text(
        '{"id": 1, "title": "ok"}\n'
        "{this is not json at all\n"
        '{"id": 3, "title": "also ok"}\n'
    )
    df = read_bronze_json(spark, str(tmp_path), schema=SCHEMA)
    good, quarantine = split_corrupt(df)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    q = quarantine.collect()
    assert len(q) == 1
    assert "not json" in q[0]._corrupt_record
    assert q[0].bronze_source_path.endswith("scrape.jsonl")


def test_inferred_schema_clean_input(spark, tmp_path):
    (tmp_path / "a.jsonl").write_text('{"id": 7, "title": "t"}\n')
    df = read_bronze_json(spark, str(tmp_path))
    good, quarantine = split_corrupt(df)
    assert [r.id for r in good.collect()] == [7]
    assert quarantine.isEmpty()
