"""Physical-plan auditing — the ".explain and iterate" loop as code.

SURVEY §4 established that every optimization the reference needs is
free from Catalyst *provided the plan is expressed declaratively*; these
helpers make that claim testable.  Instead of eyeballing
``df.explain("formatted")`` output, plan properties (pushdown reached the
scan, the dim side broadcast, no Exchange appeared in a bucketed join,
codegen fused the hot path) are asserted in `tests/test_plans.py`, so a
regression that silently de-optimizes a query — a filter that stops
pushing, a join that falls back to sort-merge-shuffle — fails CI rather
than surfacing as a 10× slowdown at 100 TB.

All helpers parse the *executed-plan-to-be* string form.  AQE rewrites
plans at runtime, so assertions target the initial physical plan:
broadcast decisions taken statically (hints, thresholds) and scan-level
pushdown are visible there; AQE only improves on them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list in the plan, flattened; empty entries
    dropped.  A filter name appearing here means the predicate reached
    the parquet reader instead of evaluating post-scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scans actually read (ReadSchema) — the
    column-pruning audit: a 2-column projection must not read 16."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) chosen statically."""
    plan = simple_plan(df)
    return len(re.findall(r"Broadcast(HashJoin|NestedLoopJoin)", plan))


def exchange_count(df: DataFrame) -> int:
    """Number of wide shuffle Exchanges in the initial plan — the shuffle
    budget of a query.  Broadcast exchanges and 1-row SinglePartition
    scalar-agg exchanges are excluded: they move dimension/scalar bytes,
    not data."""
    plan = simple_plan(df)
    return len(
        re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan)
    )


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the FINAL (AQE)
    plan — >0 means the hot path runs as fused generated JVM loops, not
    interpreted row-at-a-time operators.  Executes the plan: under AQE
    the final physical plan (where codegen stage ids appear as ``*(n)``
    markers) only exists after an action."""
    df.collect()
    plan = simple_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
