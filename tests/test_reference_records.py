"""Dynamic schema inference for reference records (VERDICT r03 missing
#4): union-of-keys columns, integer coercion, nested JSON-stringify,
first-non-null-sample typing — transformer.py:1365-1408 semantics."""

from __future__ import annotations

from pyspark.sql import types as T

from tlcn_oer_lakehouse_spark.sources.reference_records import (
    normalize_cell,
    records_to_dataframe,
)


def test_union_of_keys_and_sampled_types(spark):
    records = [
        {"a": 1, "b": "x", "nested": {"k": 1}},
        {"a": 2, "c": 2.5},
        {"b": "y", "flag": True},
    ]
    df = records_to_dataframe(spark, records)
    assert df.columns == ["a", "b", "c", "flag", "nested"]
    types = dict(df.dtypes)
    assert types == {
        "a": "int", "b": "string", "c": "double",
        "flag": "boolean", "nested": "string",
    }
    rows = sorted(df.collect(), key=lambda r: (r.a is None, r.a))
    assert rows[0].a == 1 and rows[0].nested == '{"k": 1}'
    assert rows[1].a == 2 and rows[1].c == 2.5
    assert rows[2].flag is True and rows[2].a is None


def test_integer_cols_coerce_and_null_unparseable(spark):
    records = [
        {"subject_id": "7", "name": "math"},
        {"subject_id": "x9", "name": "phys"},
        {"subject_id": 12.0, "name": "chem"},
    ]
    df = records_to_dataframe(spark, records, integer_cols=["subject_id"])
    assert dict(df.dtypes)["subject_id"] == "int"
    got = {r.name: r.subject_id for r in df.collect()}
    assert got == {"math": 7, "phys": None, "chem": 12}


def test_empty_records_returns_none(spark):
    assert records_to_dataframe(spark, []) is None


def test_normalize_cell_ladder():
    assert normalize_cell(None) is None
    assert normalize_cell({"b": 1, "a": 2}) == '{"b": 1, "a": 2}'  # insertion order
    assert normalize_cell([1, "x"]) == '[1, "x"]'
    assert normalize_cell((1, 2)) == "[1, 2]"
    assert normalize_cell({"z", "a"}) == '["a", "z"]'  # sets sorted for determinism
    assert normalize_cell(True) is True
    assert normalize_cell(3) == 3
    assert normalize_cell(2.5) == 2.5
    assert normalize_cell(object.__class__) == str(object.__class__)
    assert normalize_cell("x9", as_integer=True) is None
    assert normalize_cell("42", as_integer=True) == 42


def test_bool_first_sample_is_boolean_not_int(spark):
    # bool is an int subclass — the sampler must check bool FIRST
    df = records_to_dataframe(spark, [{"f": True}, {"f": False}])
    assert isinstance(df.schema["f"].dataType, T.BooleanType)
