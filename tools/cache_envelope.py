"""Peak cached-bytes envelope per persisting query (VERDICT r9 #7).

The full-registry sf1.0 sweep ran in one 56g-driver process; this tool
records the sizing basis for the next scale-up (an sf10 full sweep):
for each named query it builds the plan, forces full execution via a
noop write, then snapshots the JVM block-manager storage registry
(``sc.getRDDStorageInfo`` — the Spark UI storage tab's source) BEFORE
clearing the cache, reporting the total and per-RDD cached bytes the
query left behind.  Because every corpus-sized persist flows through
``persist_replacing`` (queries/base.py), the per-query snapshot IS the
query's steady-state envelope: a long-lived session holds at most one
live copy of each keyed frame.

Usage:  SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf1.0 SPARK_GRAFT_DRIVER_MEM=56g \
            python tools/cache_envelope.py [query ...]

With no arguments, sweeps the known persisting families (dedup, graph,
semdedup, contamination, medallion, serve).  One JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlcn_oer_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tlcn_oer_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfdata/sf1.0")

# the families whose builders persist corpus-sized frames
DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_prefix_filter",
    "dedup_prefix_incremental",
    "dedup_minhash_incremental",
    "dedup_semdedup",
    "dedup_clusters",
    "g_pagerank",
    "g_scc",
    "td_contamination_scalable",
    "td_ssl_prototypes",
    "medallion_e2e",
    "rag_serve_e2e",
]


def storage_snapshot(spark) -> list[dict]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return [
        {
            "name": i.name(),
            "mem_bytes": i.memSize(),
            "disk_bytes": i.diskSize(),
            "partitions_cached": i.numCachedPartitions(),
        }
        for i in infos
    ]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="cache_envelope")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(json.dumps({"name": name, "err": "unknown query"}))
            continue
        spark.catalog.clearCache()
        try:
            spec.builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            snap = storage_snapshot(spark)
            print(
                json.dumps(
                    {
                        "name": name,
                        "sf_dir": SF_DIR,
                        "total_cached_mb": round(
                            sum(s["mem_bytes"] + s["disk_bytes"] for s in snap)
                            / 1e6,
                            1,
                        ),
                        "n_cached_rdds": len(snap),
                        "rdds": sorted(
                            snap, key=lambda s: -s["mem_bytes"]
                        )[:6],
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — one row, not the sweep
            print(
                json.dumps(
                    {"name": name, "err": f"{type(exc).__name__}: {exc}"[:300]}
                ),
                flush=True,
            )
        finally:
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
