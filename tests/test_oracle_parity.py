"""Every registered QuerySpec must match its DuckDB oracle at sf0.01 —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tlcn_oer_lakehouse_spark.queries import REGISTRY
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, sf_correct, name):
    ok, msg = compare(spark, sf_correct, REGISTRY[name])
    assert ok, f"{name}: {msg}"
