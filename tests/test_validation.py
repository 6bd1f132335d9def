"""Pipeline runtime-validation layer (reference DAG gate tasks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.pipelines.validation import (
    validate_tables,
    verify_index,
    zero_output_guard,
)


def test_validate_tables(spark, sf_dir, tmp_path):
    out = validate_tables(
        spark,
        {
            "documents": f"{sf_dir}/documents.parquet",
            "missing": str(tmp_path / "nope"),
        },
    )
    rows = {r.table: r for r in out.collect()}
    assert rows["documents"].ok and rows["documents"].n_rows == 500
    assert rows["documents"].n_files >= 1
    assert not rows["missing"].exists and not rows["missing"].ok


def test_verify_index_coverage_and_probes(spark, sf_dir):
    from tlcn_oer_lakehouse_spark.queries import REGISTRY

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = REGISTRY["q1_inverted_index"].builder(spark, sf_dir)
    report = verify_index(docs, index, probe_terms=["table", "spark"])
    assert report["coverage_ok"], report
    assert report["probes_ok"], report


def test_zero_output_guard(spark):
    df = spark.range(3)
    assert zero_output_guard(df, "ok-stage") is df
    with pytest.raises(RuntimeError, match="empty-stage"):
        zero_output_guard(df.filter(F.col("id") < 0), "empty-stage")
