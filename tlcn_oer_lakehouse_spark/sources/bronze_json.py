"""Bronze JSON landing reader — S1 (`transformer.py:1440-1444`) in
production form.

The reference reads scraped multiline JSON arrays with inference and no
bad-record handling; a malformed scrape aborts the whole silver run.
Here ingestion is resilient and lineage-carrying:

- PERMISSIVE parse with a ``_corrupt_record`` capture column — malformed
  records become quarantine rows instead of job failures;
- ``split_corrupt`` routes good rows onward and quarantine rows to a
  dead-letter table (the medallion pattern for poison inputs);
- every row carries ``bronze_source_path`` (`F.input_file_name`) and
  ``ingested_at``, the lineage columns silver's incremental diff keys on.

Scale notes: schema should be supplied explicitly in production (the
reference's inference double-scans bronze on every run — at 100 TB the
inference pass alone reads the corpus twice).  Multiline JSON arrays
parse one-file-per-task (a multiline file is not splittable), so landing
files should stay in the 10-500 MB range; the streaming twin
(`streaming/ingest.py:landing_stream`) shares this reader's layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_bronze_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Read a bronze landing prefix with corrupt-record capture and
    lineage columns.  With an explicit ``schema`` the corrupt column is
    appended automatically (Spark requires it to be part of the schema
    for PERMISSIVE capture)."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
    )
    if schema is not None:
        if CORRUPT_COL not in [f.name for f in schema.fields]:
            schema = StructType(
                list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
            )
        reader = reader.schema(schema)
    df = reader.json(path)
    if CORRUPT_COL not in df.columns:  # clean inference run
        df = df.withColumn(CORRUPT_COL, F.lit(None).cast("string"))
    return df.withColumn("bronze_source_path", F.input_file_name()).withColumn(
        "ingested_at", F.current_timestamp()
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): quarantine keeps the raw corrupt payload and
    lineage for replay after upstream fixes; good rows drop the capture
    column.

    The parsed batch is cached first: Spark disallows scans that
    reference only the internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    branches read the same parse anyway — one pass over the landing
    files instead of two."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        CORRUPT_COL, "bronze_source_path", "ingested_at"
    )
    return good, quarantine
