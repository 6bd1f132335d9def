"""Resumable full-registry decade sweep (VERDICT r10 #1): one
``tools/decade_probe.py`` subprocess per registry query at
``$SPARK_GRAFT_SF_DIR`` (default /tmp/sfdata/sf10), strict parity plus
one timed rep, results appended to a JSONL ledger.

Usage:  python tools/sf10_sweep.py [ledger.jsonl]

- Resumable: names already in the ledger are skipped, so an interrupted
  sweep continues where it stopped.
- One query per process, sequential — the decade-probe RSS/solo-host
  discipline (pandas canonicalization of big frames accumulates arena
  RSS; concurrent JVMs OOM the 56g sweeps).
- Per-query timeout (default 1500 s; the known oracle-heavy names get
  3000 s) records a TIMEOUT row instead of wedging the sweep.
- The iterative-graph family's single-process recursive oracle replays
  are documented-infeasible at this scale: those run Spark-only
  (strict parity carried by their sf1.0 rows), exactly as the round-8
  decade table records.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlcn_oer_lakehouse_spark.queries import REGISTRY  # noqa: E402

# Single-process recursive/iterative oracle replays documented
# infeasible at the decade scale — Spark-only rows; strict parity for
# these is carried by their sf1.0 rungs (ARCHITECTURE.md decade table).
SPARK_ONLY = {
    "dedup_clusters",
    "dedup_clusters_star",
    "g_pagerank",
    "g_label_propagation",
    "g_lpa_converged",
    "g_pointer_doubling_depth",
    "g_scc",
    "g_kcore",
    "g_modularity",
    "g_triangle_count",
    "g_jaccard_neighbors",
}

# oracle-heavy but feasible: give them headroom instead of a false TIMEOUT
SLOW_ORACLE_TIMEOUT = {
    "w14_association_rules": 3000,
    "dedup_minhash_lsh": 3000,
    "dedup_minhash_incremental": 3000,
    "dedup_ngram_jaccard": 3000,
    "td_exact_substring_dedup": 3000,
    "td_exact_substring_keepone": 3000,
    "medallion_e2e": 3000,
    "dedup_prefix_filter": 3000,
    "dedup_prefix_incremental": 3000,
    "er_sorted_neighborhood": 3000,
}


def main() -> None:
    ledger = sys.argv[1] if len(sys.argv) > 1 else "sf10_sweep.jsonl"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfdata/sf10")
    default_timeout = int(os.environ.get("SPARK_GRAFT_SWEEP_TIMEOUT", "1500"))

    done: set[str] = set()
    if os.path.exists(ledger):
        for line in open(ledger):
            try:
                done.add(json.loads(line)["name"])
            except (ValueError, KeyError):
                pass

    names = [n for n in REGISTRY if n not in done]
    print(f"sweep: {len(names)} to run, {len(done)} already in {ledger}",
          flush=True)
    for i, name in enumerate(names):
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=sf,
            SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "56g"),
            SPARK_GRAFT_PROBE_REPS=os.environ.get("SPARK_GRAFT_PROBE_REPS", "1"),
        )
        if name in SPARK_ONLY:
            env["SPARK_GRAFT_PROBE_SPARK_ONLY"] = "1"
        timeout = SLOW_ORACLE_TIMEOUT.get(name, default_timeout)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "tools/decade_probe.py", name],
                capture_output=True, text=True, timeout=timeout, env=env,
            )
            out = p.stdout.strip().splitlines()
            line = out[-1] if out else ""
            if line.startswith("{"):
                rec = json.loads(line)
            else:
                rec = {"name": name, "status": "ERR",
                       "err": (p.stderr or p.stdout)[-500:]}
        except subprocess.TimeoutExpired:
            rec = {"name": name, "status": "TIMEOUT", "timeout_sec": timeout}
        except Exception as exc:  # noqa: BLE001 — ledger row, not the sweep
            rec = {"name": name, "status": "ERR", "err": str(exc)[:500]}
        rec["wall_sec"] = round(time.time() - t0, 1)
        with open(ledger, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{i + 1}/{len(names)}] {name}: {rec.get('status')} "
              f"rows={rec.get('spark_rows')} spark={rec.get('spark_sec')}s "
              f"wall={rec['wall_sec']}s", flush=True)


if __name__ == "__main__":
    main()
