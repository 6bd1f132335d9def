"""Render the decade-sweep ledger (sf10_sweep.jsonl) into the compact
per-query table ARCHITECTURE.md carries: one row per registry query with
strict status, rows, and (where probed solo) timings.

Usage:  python tools/sf10_table.py [ledger.jsonl] [--summary]
"""

from __future__ import annotations

import json
import sys


def load(ledger: str) -> dict[str, dict]:
    rows: dict[str, dict] = {}
    for line in open(ledger):
        try:
            r = json.loads(line)
        except ValueError:
            continue
        rows.setdefault(r["name"], r)  # first occurrence wins (resume order)
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ledger = args[0] if args else "sf10_sweep.jsonl"
    rows = load(ledger)

    from tlcn_oer_lakehouse_spark.queries import REGISTRY

    counts: dict[str, int] = {}
    if "--summary" in sys.argv:
        for name in REGISTRY:
            st = rows.get(name, {}).get("status", "MISSING")
            counts[st] = counts.get(st, 0) + 1
        print(json.dumps({"total": len(REGISTRY), **counts}))
        for name in REGISTRY:
            st = rows.get(name, {}).get("status", "MISSING")
            if st not in ("OK", "SPARK_ONLY", "no_oracle"):
                print(f"  {name}: {st} {rows.get(name, {}).get('err', '')[:200]}")
        return

    print("| query | status | rows | spark s | oracle s |")
    print("|---|---|---|---|---|")
    for name in REGISTRY:
        r = rows.get(name, {})
        st = r.get("status", "—")
        mark = {"OK": "strict ✔", "SPARK_ONLY": "spark-only",
                "no_oracle": "rows-only"}.get(st, st)
        print(
            f"| {name} | {mark} | {r.get('spark_rows', '—')} "
            f"| {r.get('spark_sec', '—')} | {r.get('oracle_sec', '—')} |"
        )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
