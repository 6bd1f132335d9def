"""Fleet-wide physical-plan census over the FULL registry (r11).

For every registry query, plan (never execute) the DataFrame at sf0.01
and record the structural scale signals the optimization guide names:
Exchange count, SortMergeJoin count, parquet-scan count, Python-eval
nodes (BatchEvalPython / ArrowEvalPython / MapInArrow / UDTF), cartesian
products, and WindowExec nodes with an empty partition spec (the
"Moving all data to a single partition" class).  One JSONL row per
query, so outliers can be ranked and diffed round over round.

Run: python tools/plan_census.py [sf_dir] [out.jsonl]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlcn_oer_lakehouse_spark.plans import audit  # noqa: E402
from tlcn_oer_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tlcn_oer_lakehouse_spark.session import get_spark  # noqa: E402


def census_row(name: str, df) -> dict:
    simple = audit.simple_plan(df)
    return {
        "name": name,
        "exchanges": audit.exchange_count(df),
        "smj": len(re.findall(r"SortMergeJoin", simple)),
        "bhj": len(re.findall(r"BroadcastHashJoin", simple)),
        "scans": len(re.findall(r"FileScan parquet|Scan parquet", simple)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|PythonUDTF", simple)
        ),
        "cartesian": len(re.findall(r"CartesianProduct", simple)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", simple)),
        # WindowExec over an un-partitioned spec serializes to 1 task
        # ADVICE r11: the second term used to scan the empty string (a
        # dead always-0 term); the single plan-shape pattern suffices
        "global_window": len(
            re.findall(r"Window \[[^\]]*\], \[\]", simple)
        ),
        "in_memory_scans": len(re.findall(r"InMemoryTableScan", simple)),
        "plan_lines": simple.count("\n"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_census.jsonl"
    spark = get_spark(app_name="plan_census", shuffle_partitions=8)
    rows = []
    with open(out_path, "w") as f:
        for name, spec in sorted(REGISTRY.items()):
            try:
                df = spec.builder(spark, sf_dir)
                row = census_row(name, df)
            except Exception as exc:  # noqa: BLE001 — census, not a gate
                row = {"name": name, "err": f"{type(exc).__name__}: {exc}"[:300]}
            rows.append(row)
            f.write(json.dumps(row) + "\n")
            f.flush()
    ok = [r for r in rows if "err" not in r]
    print(f"censused {len(ok)}/{len(rows)} queries -> {out_path}")
    for key in ("exchanges", "smj", "scans", "py_eval", "cartesian", "plan_lines"):
        top = sorted(ok, key=lambda r: -r[key])[:8]
        print(f"top {key}: " + ", ".join(f"{r['name']}={r[key]}" for r in top))
    spark.stop()


if __name__ == "__main__":
    main()
