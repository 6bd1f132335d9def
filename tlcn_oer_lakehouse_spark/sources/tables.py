"""Parquet table loader for the synthetic lakehouse (TESTDATA.md tables).

Mirrors the reference's catalog-table scan surface (SURVEY §2.1 S2/S3 —
``transformer.py:1339``, ``saf_exporter.py:192-211``) over plain parquet:
one ``load_table`` per named table, plus a bulk loader that registers temp
views so SQL-form queries and the DataFrame API share one catalog.

Scans stay fully declarative (``spark.read.parquet``) so Catalyst applies
filter pushdown + column pruning; nothing here collects or infers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Declarative: pushdown/pruning preserved."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load several tables; optionally register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
