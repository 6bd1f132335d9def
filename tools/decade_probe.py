"""One-query-per-process decade probe: strict driver-canonicalization
parity + timed noop-write medians at a big local scale factor.

Usage:  SPARK_GRAFT_SF_DIR=testdata_local/sf10 SPARK_GRAFT_DRIVER_MEM=56g \
            python tools/decade_probe.py <query_name>

Prints one JSON line: the strict parity record (tools/driver_sim.py
semantics — the dtype-aware hash the round driver uses) plus
``spark_sec`` (median of 3 full noop-write executions, cache cleared
between reps) and ``oracle_sec`` (one DuckDB execution).

Run ONE query per process and run the sweep solo (verify-skill RSS
recipe): pandas canonicalization of large frames accumulates arena
RSS, and a concurrent JVM can OOM the big-scale sweeps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import duckdb_con  # noqa: E402
from tlcn_oer_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tlcn_oer_lakehouse_spark.session import get_spark  # noqa: E402
from tools.driver_sim import SF_DIR, check  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    spec = REGISTRY[name]
    spark = get_spark(app_name=f"decade_probe_{name}")

    spark_only = os.environ.get("SPARK_GRAFT_PROBE_SPARK_ONLY") == "1"
    t0 = time.perf_counter()
    if spark_only:
        # for probes whose DuckDB oracle cannot replay at this scale on
        # one node (the graph/dedup family's single-process recursive
        # replay): count Spark rows only; strict parity is carried by
        # the sf1.0 run instead
        r = {"name": name, "spark_rows": spec.builder(spark, SF_DIR).count(),
             "status": "SPARK_ONLY"}
    else:
        con = duckdb_con(SF_DIR)
        r = check(spark, con, name, spec)
    r["parity_sec"] = round(time.perf_counter() - t0, 2)
    r["sf_dir"] = SF_DIR

    # SPARK_GRAFT_PROBE_REPS=1 for full-registry sweeps, where strict
    # parity is the point and a single timed rep bounds the wall clock;
    # default 3 keeps the median protocol for per-query decade rows.
    n_reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))
    reps = []
    for _ in range(n_reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        reps.append(time.perf_counter() - t0)
    reps.sort()
    r["spark_sec"] = round(reps[len(reps) // 2], 2)
    r["spark_sec_min"] = round(reps[0], 2)

    if spec.oracle and not spark_only:
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        r["oracle_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
