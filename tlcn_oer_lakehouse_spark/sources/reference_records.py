"""Dynamic schema inference for reference/lookup tables — the analog of
the reference loader's ``create_df`` (transformer.py:1365-1408,
giaotrinh_reference_loader.py): API-scraped record dicts with ragged key
sets become a typed DataFrame without a hand-written schema.

Semantics (matching the reference):

- column set = sorted union of keys across ALL records (a key present in
  any record becomes a column; missing values are null);
- declared ``integer_cols`` coerce to INT (unparseable → null);
- nested values (dict/list/tuple/set) are JSON-stringified;
- each remaining column's type comes from its first non-null sample:
  bool → BOOLEAN, int → INTEGER, float → DOUBLE, else STRING (sampled
  AFTER normalization, so a column whose first value is a dict types as
  STRING, like the reference).

Scale note: this is deliberately a driver-side source — the inputs are
API responses for small dimension tables (subjects, programs; hundreds
of rows, broadcast-join sized), exactly the reference's use.  For BIG
ragged-JSON corpora the right tool is ``spark.read.json`` inference in
:mod:`sources.bronze_json`, whose union-of-keys + type-widening pass is
distributed; this module documents that boundary rather than pretending
a record list scales.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def normalize_cell(value: Any, as_integer: bool = False) -> Any:
    """One cell through the reference's normalization ladder."""
    if value is None:
        return None
    if as_integer:
        try:
            return int(value)
        except (TypeError, ValueError):
            return None
    if isinstance(value, (dict, list, tuple, set)):
        if isinstance(value, set):  # sets are unordered; sort for determinism
            value = sorted(value, key=str)
        elif isinstance(value, tuple):
            value = list(value)
        return json.dumps(value, ensure_ascii=False)
    if isinstance(value, (bool, int, float)):
        return value
    return str(value)


def infer_record_schema(
    normalized: list[dict[str, Any]],
    columns: list[str],
    integer_cols: set[str],
) -> T.StructType:
    """First-non-null-sample typing over already-normalized rows."""
    fields = []
    for col in columns:
        if col in integer_cols:
            dtype: T.DataType = T.IntegerType()
        else:
            sample = next(
                (r.get(col) for r in normalized if r.get(col) is not None), None
            )
            if isinstance(sample, bool):  # bool before int: bool is an int subclass
                dtype = T.BooleanType()
            elif isinstance(sample, int):
                dtype = T.IntegerType()
            elif isinstance(sample, float):
                dtype = T.DoubleType()
            else:
                dtype = T.StringType()
        fields.append(T.StructField(col, dtype, True))
    return T.StructType(fields)


def records_to_dataframe(
    spark: SparkSession,
    records: list[dict[str, Any]],
    integer_cols: list[str] | None = None,
) -> DataFrame | None:
    """Ragged record dicts → typed DataFrame (union-of-keys columns,
    sampled types).  Returns None for an empty record list, like the
    reference."""
    if not records:
        return None
    int_set = set(integer_cols or [])
    columns = sorted({k for row in records for k in row})
    normalized = [
        {c: normalize_cell(row.get(c), as_integer=c in int_set) for c in columns}
        for row in records
    ]
    schema = infer_record_schema(normalized, columns, int_set)
    # int-typed columns may have seen floats/bools after normalization;
    # coerce to the inferred type so createDataFrame does not reject rows
    data = [tuple(r.get(c) for c in columns) for r in normalized]
    return spark.createDataFrame(data, schema=schema)
