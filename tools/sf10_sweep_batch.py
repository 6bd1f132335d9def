"""Chunked batch half of the full-registry decade sweep (VERDICT r10
#1): the light/medium majority of the registry runs through
``tools/driver_sim.py`` in small chunks — one fresh process per chunk
(bounding the pandas-canonicalization RSS creep that forbids long
same-process big-scale sweeps), a few chunks in flight at once — while
the heavy family (big per-doc outputs, Σdf²-class oracles, the
iterative graph set) stays on the one-probe-per-process solo runner
``tools/sf10_sweep.py``.

Usage:  python tools/sf10_sweep_batch.py [ledger.jsonl]

Shares the ledger with the solo runner: names already present are
skipped, chunk rows append as they finish, and any chunk that dies or
times out leaves its unfinished names OFF the ledger so the solo
runner retries them one-per-process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlcn_oer_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tools.sf10_sweep import SPARK_ONLY  # noqa: E402

# Heavy at the decade scale — big per-doc/pair outputs (pandas canon RSS),
# Σdf²-class or recursive oracles, or composed multi-minute pipelines.
# These run on the SOLO one-probe-per-process runner, never in a chunk.
SOLO = SPARK_ONLY | {
    "dedup_minhash_lsh", "dedup_minhash_incremental", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_exact", "dedup_embedding_cosine",
    "dedup_semdedup", "dedup_soft_sample", "dedup_recall_eval",
    "dedup_prefix_filter", "dedup_prefix_incremental",
    "er_sorted_neighborhood",
    "td_exact_substring_dedup", "td_exact_substring_keepone",
    "td_contamination_check", "td_contamination_scalable",
    "td_pipeline_e2e", "td_bloom_contamination",
    "medallion_e2e", "medallion_incremental",
    "chunk_token_windows", "chunk_hierarchical", "chunk_udtf",
    "chunk_char_budget",
    "embed_documents", "q1_inverted_index",
    "w14_association_rules", "ml_ranking_metrics",
}

CHUNK = int(os.environ.get("SPARK_GRAFT_BATCH_CHUNK", "6"))
WORKERS = int(os.environ.get("SPARK_GRAFT_BATCH_WORKERS", "3"))
CHUNK_TIMEOUT = int(os.environ.get("SPARK_GRAFT_BATCH_TIMEOUT", "2700"))

_ledger_lock = threading.Lock()


def _append(ledger: str, rec: dict) -> None:
    with _ledger_lock:
        with open(ledger, "a") as f:
            f.write(json.dumps(rec) + "\n")


def _run_chunk(ledger: str, sf: str, names: list[str]) -> None:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf,
        SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_BATCH_CPUS", "10"),
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_BATCH_MEM", "20g"),
    )
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "tools/driver_sim.py", "--exact", *names],
            capture_output=True, text=True, timeout=CHUNK_TIMEOUT, env=env,
        )
        out_lines = [
            ln for ln in p.stdout.splitlines() if ln.startswith('{"name"')
        ]
        wall = round((time.time() - t0) / max(len(out_lines), 1), 1)
        seen = set()
        for ln in out_lines:
            rec = json.loads(ln)
            # driver_sim emits verbose dtype maps — keep the ledger lean
            for k in ("spark_dtypes", "oracle_dtypes"):
                rec.pop(k, None)
            rec["wall_sec"] = wall
            rec["mode"] = "batch"
            seen.add(rec["name"])
            _append(ledger, rec)
        missing = [n for n in names if n not in seen]
        if missing:
            print(f"chunk {names[0]}..: {len(missing)} unfinished "
                  f"(rc={p.returncode}) -> left for solo retry: {missing}",
                  flush=True)
    except subprocess.TimeoutExpired:
        print(f"chunk {names[0]}..: TIMEOUT {CHUNK_TIMEOUT}s -> solo retry",
              flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"chunk {names[0]}..: {exc}", flush=True)


def main() -> None:
    ledger = sys.argv[1] if len(sys.argv) > 1 else "sf10_sweep.jsonl"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfdata/sf10")
    done: set[str] = set()
    if os.path.exists(ledger):
        for line in open(ledger):
            try:
                done.add(json.loads(line)["name"])
            except (ValueError, KeyError):
                pass
    names = [n for n in REGISTRY if n not in done and n not in SOLO]
    chunks = [names[i:i + CHUNK] for i in range(0, len(names), CHUNK)]
    print(f"batch sweep: {len(names)} queries in {len(chunks)} chunks, "
          f"{WORKERS} workers", flush=True)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(WORKERS) as pool:
        futures = [pool.submit(_run_chunk, ledger, sf, c) for c in chunks]
        for i, f in enumerate(futures):
            f.result()
            n_done = sum(1 for _ in open(ledger))
            print(f"chunk {i + 1}/{len(chunks)} drained; ledger rows {n_done}",
                  flush=True)


if __name__ == "__main__":
    main()
