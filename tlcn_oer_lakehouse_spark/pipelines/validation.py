"""Pipeline runtime validation — the reference's DAG-level assertion
layer (elasticsearch_sync_dag.py:149-205 required-table checks,
gold_layer_processing_dag.py:59-124,246-343 per-table metadata/data-file
presence, elasticsearch_sync_dag.py:237-349 post-sync index
verification) as engine-native checks that return DataFrames/dicts
instead of failing Airflow tasks.

Each check is cheap by construction: existence and file counts are
metadata-only; row counts use count() (Spark optimizes parquet counts
to footer statistics); the index probe reads a handful of posting rows.
A deployment wires these into its orchestrator's gate tasks; tests
assert them directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def validate_tables(
    spark: SparkSession, tables: dict[str, str], min_rows: int = 1
) -> DataFrame:
    """Required-table gate (elasticsearch_sync_dag.py:149-205): for each
    (name → path), does it exist, how many data files, how many rows,
    and does it clear ``min_rows``.  Returns one row per table with an
    overall ``ok`` flag — callers raise on ``ok = false`` rows."""
    rows = []
    for name, path in sorted(tables.items()):
        exists = os.path.isdir(path) or os.path.isfile(path)
        n_files = 0
        n_rows = 0
        if exists:
            n_files = sum(
                1
                for _, _, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            ) or (1 if os.path.isfile(path) else 0)
            try:
                n_rows = spark.read.parquet(path).count()
            except Exception:  # noqa: BLE001 — unreadable == invalid
                exists = False
        rows.append((name, exists, n_files, n_rows, exists and n_rows >= min_rows))
    return spark.createDataFrame(
        rows, "table string, exists boolean, n_files int, n_rows long, ok boolean"
    )


def verify_index(docs: DataFrame, index: DataFrame, probe_terms: list[str]) -> dict:
    """Post-sync index verification (elasticsearch_sync_dag.py:237-349):
    doc-count parity between the corpus and the index's posting lists,
    plus probe searches that must return hits.  Returns a plain dict —
    the orchestrator's gate task asserts on it."""
    n_docs = docs.select("doc_id").distinct().count()
    indexed_docs = (
        index.select(F.explode(F.split(F.col("postings_csv"), ",")).alias("d"))
        .filter(F.col("d") != "")
        .select(F.col("d").cast("long"))
        .distinct()
        .count()
    )
    probe_hits = {
        t: index.filter(F.col("term") == t).count() for t in probe_terms
    }
    return {
        "n_docs": n_docs,
        "indexed_docs": indexed_docs,
        "coverage_ok": indexed_docs == n_docs,
        "probe_hits": probe_hits,
        "probes_ok": all(v > 0 for v in probe_hits.values()),
    }


def zero_output_guard(df: DataFrame, stage: str) -> DataFrame:
    """The reference's zero-chunk RuntimeError guard
    (transformer.py:1948-1975, 2621-2627): raise if a pipeline stage
    produced no rows at all — an empty silver write is a bug upstream,
    not a valid state.  Returns ``df`` so it composes inline."""
    if df.isEmpty():
        raise RuntimeError(f"stage '{stage}' produced zero rows")
    return df
