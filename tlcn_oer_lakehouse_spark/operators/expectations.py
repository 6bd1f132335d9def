"""Declarative data-quality expectations with per-rule policies — the
Delta Live Tables `EXPECT ... ON VIOLATION` analog for this engine.

The reference gates pipelines with imperative post-hoc checks (row-count
guards and index verification in its DAG tasks — see
`pipelines/validation.py` for those ports); production lakehouses instead
declare per-rule policies evaluated inline with the write:

- ``warn``        — keep the row, count the violation;
- ``drop``        — exclude the row from the clean output;
- ``quarantine``  — route the row to a quarantine frame for repair.

``expect`` evaluates every rule in ONE map-only pass (each predicate is a
codegen'd column expression; no UDFs, no extra scan per rule) and returns
the clean frame, the quarantine frame, and a per-rule metrics frame.  The
metrics aggregation is the only shuffle, and it reduces to a handful of
counter rows.  At 100 TB nothing here adds data movement beyond the
write the caller was already doing — the same property DLT trades on.

All three outputs are lazy views over the same flagged intermediate, so
callers that persist it (as `dq_expectations` does via the registered
query) pay the rule evaluation once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POLICIES = ("warn", "drop", "quarantine")


@dataclass(frozen=True)
class Rule:
    """One expectation: rows where ``predicate`` is FALSE or NULL violate.

    Matching DLT semantics, a NULL predicate result counts as a
    violation — `expect o_orderdate IS NOT NULL` must flag null dates
    even though the comparison itself is null.
    """

    name: str
    predicate: Column
    policy: str = "warn"

    def __post_init__(self) -> None:
        if self.policy not in POLICIES:
            raise ValueError(f"unknown policy {self.policy!r}; use {POLICIES}")


@dataclass(frozen=True)
class ExpectationResult:
    clean: DataFrame
    quarantined: DataFrame
    metrics: DataFrame


def _violation_flag(rule: Rule) -> Column:
    # violation := NOT coalesce(predicate, false)  — null-safe, DLT-style
    return (~F.coalesce(rule.predicate, F.lit(False))).cast("int")


def expect(df: DataFrame, rules: list[Rule]) -> ExpectationResult:
    """Evaluate all rules in one pass; split clean vs quarantined rows.

    - ``clean``: rows violating no drop- or quarantine-policy rule
      (warn violations stay, as DLT's `expect` does).
    - ``quarantined``: rows violating ≥1 quarantine-policy rule (kept
      with one ``_violated_rules`` array column naming the rules).
    - ``metrics``: one row per rule (rule, policy, n_violations) plus
      ``_rows_in`` / ``_rows_clean`` / ``_rows_quarantined`` summary rows
      (policy='summary').
    """
    if not rules:
        raise ValueError("expect() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    flagged = df.select(
        "*", *[_violation_flag(r).alias(f"_viol_{r.name}") for r in rules]
    )

    def any_of(policy: str) -> Column:
        flags = [F.col(f"_viol_{r.name}") == 1 for r in rules if r.policy == policy]
        if not flags:
            return F.lit(False)
        out = flags[0]
        for c in flags[1:]:
            out = out | c
        return out

    helper_cols = [f"_viol_{r.name}" for r in rules]
    clean = (
        flagged.filter(~any_of("drop") & ~any_of("quarantine")).drop(*helper_cols)
    )
    quarantined = (
        flagged.filter(any_of("quarantine"))
        .withColumn(
            "_violated_rules",
            F.array_compact(
                F.array(
                    *[
                        F.when(F.col(f"_viol_{r.name}") == 1, F.lit(r.name))
                        for r in rules
                        if r.policy == "quarantine"
                    ]
                )
            ),
        )
        .drop(*helper_cols)
    )
    per_rule = flagged.agg(
        F.count(F.lit(1)).alias("_rows_in"),
        *[F.sum(f"_viol_{r.name}").alias(r.name) for r in rules],
        # a row violating both a drop and a quarantine rule is excluded
        # once (and routed to quarantine), so clean-count math uses the
        # union flag, not the per-policy sums
        F.sum((any_of("drop") | any_of("quarantine")).cast("int")).alias("_excluded"),
        F.sum(any_of("quarantine").cast("int")).alias("_quarantined"),
    )
    metric_rows = [
        F.struct(F.lit(r.name).alias("rule"), F.lit(r.policy).alias("policy"),
                 F.col(r.name).cast("long").alias("n"))
        for r in rules
    ] + [
        F.struct(F.lit("_rows_in").alias("rule"), F.lit("summary").alias("policy"),
                 F.col("_rows_in").cast("long").alias("n")),
        F.struct(F.lit("_rows_clean").alias("rule"), F.lit("summary").alias("policy"),
                 (F.col("_rows_in") - F.col("_excluded")).cast("long").alias("n")),
        F.struct(F.lit("_rows_quarantined").alias("rule"),
                 F.lit("summary").alias("policy"),
                 F.col("_quarantined").cast("long").alias("n")),
    ]
    metrics = (
        per_rule.select(F.explode(F.array(*metric_rows)).alias("m"))
        .select("m.rule", "m.policy", "m.n")
    )
    return ExpectationResult(clean=clean, quarantined=quarantined, metrics=metrics)
