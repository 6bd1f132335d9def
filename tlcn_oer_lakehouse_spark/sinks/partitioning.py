"""Hidden partition transforms — the Iceberg partition-spec analog.

The reference's Iceberg tables partition by derived values (day of a
timestamp, hash bucket of a key) WITHOUT the query author naming the
derived column: predicates on the *source* column prune partitions
automatically.  This module supplies that mapping for
:class:`~tlcn_oer_lakehouse_spark.sinks.merge.ParquetMergeTable`:

- ``transform_column`` derives the partition value at write time
  (pure column expressions);
- ``transform_value`` applies the same transform to a predicate literal
  driver-side;
- ``mapped_predicates`` rewrites source-column predicates into derived-
  column predicates for the manifest pruner, with sound op weakening:
  monotone transforms (day/month/year/truncate) preserve ``=``/ranges
  but ``>`` weakens to ``>=`` (values inside the boundary partition may
  still match); hash buckets map ``=`` only.

Transforms are "hidden": the derived columns exist only as hive
partition dirs — ``read()`` never exposes them, and pruning happens in
the manifest layer before Spark lists a single file.

Spec format: ``{"ts_day": ("day", "ts"), "uid_b": ("bucket", "uid", 16),
"pfx": ("truncate", "name", 4)}``.
"""

from __future__ import annotations

import datetime as _dt
import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# date-part transforms emit lexicographically-chronological strings, so
# the manifest's string comparison is also a time comparison
_DATE_FORMATS = {"day": ("yyyy-MM-dd", 10), "month": ("yyyy-MM", 7), "year": ("yyyy", 4)}

TransformSpec = tuple  # (kind, source_col, *args)


def transform_column(spec: TransformSpec) -> Column:
    kind, src, *args = spec
    if kind in _DATE_FORMATS:
        return F.date_format(F.col(src), _DATE_FORMATS[kind][0])
    if kind == "bucket":
        (n,) = args
        return (
            F.conv(F.substring(F.md5(F.col(src).cast("string")), 1, 8), 16, 10)
            .cast("long") % n
        )
    if kind == "truncate":
        (w,) = args
        return F.substring(F.col(src).cast("string"), 1, w)
    raise ValueError(f"unknown partition transform: {kind!r}")


def transform_value(spec: TransformSpec, value):
    """Driver-side twin of :func:`transform_column` for predicate
    literals (must agree exactly with the column expression)."""
    kind, _src, *args = spec
    if kind in _DATE_FORMATS:
        _, width = _DATE_FORMATS[kind]
        if isinstance(value, (_dt.datetime, _dt.date)):
            return value.strftime("%Y-%m-%d")[:width]
        return str(value)[:width]
    if kind == "bucket":
        (n,) = args
        return int(hashlib.md5(str(value).encode()).hexdigest()[:8], 16) % n
    if kind == "truncate":
        (w,) = args
        return str(value)[:w]
    raise ValueError(f"unknown partition transform: {kind!r}")


def mapped_predicates(
    predicates: list[tuple], transforms: dict[str, TransformSpec]
) -> list[tuple]:
    """Derived-column predicates implied by source-column predicates —
    appended to the pruner's conjunction (sound: only ever keeps at
    least the files the source predicate could match)."""
    out = []
    for col, op, val in predicates:
        for name, spec in transforms.items():
            kind, src, *_ = spec
            if src != col:
                continue
            if kind == "bucket":
                if op == "=":
                    out.append((name, "=", transform_value(spec, val)))
            else:
                weakened = {">": ">=", "<": "<="}.get(op, op)
                out.append((name, weakened, transform_value(spec, val)))
    return out
