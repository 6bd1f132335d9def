"""Query registry plumbing.

Every operator from SURVEY.md §2 (plus the scale-path training-data
operators) is registered as a :class:`QuerySpec`: a Spark DataFrame builder,
an equivalent ANSI-SQL oracle string DuckDB can run on the same parquet
tables, and a citation back to the reference implementation.  The driver's
correctness gate compares the two at sf=0.01.

Determinism contract (so value-hashes match bit-for-bit across engines):

- Additive aggregates over doubles go through an exact DECIMAL cast
  (``SUM(CAST(x AS DECIMAL(p,s)))``) — decimal addition is exact and
  order-independent, unlike float summation whose result depends on
  partition order.
- Per-row scalar double math (``a * (1-b)``) is IEEE-754 deterministic and
  identical across engines; derived ratios divide a decimal-exact sum cast
  to double by an exact count.
- ``events.ts`` is nanosecond-precision parquet; Spark truncates to µs
  while DuckDB keeps ns — every use must ``date_trunc`` to second or
  coarser on BOTH sides.
- Output columns are aliased identically in builder and oracle (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One verifiable operator/query.

    name     — registry key; prefixed with the SURVEY §2 operator id.
    builder  — (spark, sf_dir) -> DataFrame, idiomatic DataFrame/SQL API.
    oracle   — DuckDB-runnable ANSI SQL over the same tables, or None for
               genuinely non-SQL-expressible operators (rows-only check).
    ref      — reference citation (file:line) for judge parity checks.
    doc      — one-line description.
    """

    name: str
    builder: Builder
    oracle: str | None
    ref: str = ""
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with nanosecond-timestamp handling.

    Spark 4 rejects parquet TIMESTAMP(NANOS) outright
    (PARQUET_TYPE_ILLEGAL); ``spark.sql.legacy.parquet.nanosAsLong``
    reads it as epoch-nanosecond BIGINT.  We set the conf at runtime so
    the driver's own session works too, then derive:

    - ``ts_ns``  — raw epoch nanoseconds (BIGINT)
    - ``ts_sec`` — epoch seconds via integer division (``div`` keeps the
      math in BIGINT; double division would lose precision at 1.7e18)
    - ``ts``     — second-truncated TIMESTAMP

    DuckDB oracle equivalents: ``epoch_ns(ts)``, ``epoch_ns(ts)//1000000000``,
    ``make_timestamp((epoch_ns(ts)//1000000000) * 1000000)``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
        .withColumn("ts", F.timestamp_seconds(F.col("ts_sec")))
    )
