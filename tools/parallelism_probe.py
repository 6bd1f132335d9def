"""Determinism-across-parallelism probe.

The determinism contract (ARCHITECTURE.md: DECIMAL-exact aggregate
sums, fixed-order float folds, round-before-compare) claims every
registry query's result is independent of partitioning — the property
that makes sf0.01/local answers transfer to a 1000-executor cluster.
This probe proves it empirically: run it twice at different
parallelism (cores AND shuffle partitions follow $SPARK_GRAFT_CPUS),
then diff the canonical row hashes.

    python tools/parallelism_probe.py 4  /tmp/hash4.json
    python tools/parallelism_probe.py 32 /tmp/hash32.json
    python - <<'PY'
    import json
    a, b = (json.load(open(p)) for p in ("/tmp/hash4.json", "/tmp/hash32.json"))
    print({k: (a[k], b[k]) for k in a if a[k] != b.get(k)} or "identical")
    PY

Round-5 result: 190/190 queries byte-identical between local[4] and
local[32] at sf0.01, zero errors.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_CPUS"] = sys.argv[1]

from tlcn_oer_lakehouse_spark.queries import REGISTRY  # noqa: E402
from tlcn_oer_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name=f"par{sys.argv[1]}")
    out: dict[str, str] = {}
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else list(REGISTRY)
    for name in names:
        try:
            pdf = REGISTRY[name].builder(spark, SF_DIR).toPandas()
            pdf = pdf[sorted(pdf.columns)]
            if len(pdf):
                pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
            h = hashlib.md5()
            for row in pdf.itertuples(index=False):
                h.update(repr(tuple(str(v) for v in row)).encode())
            out[name] = h.hexdigest()
        except Exception as exc:  # noqa: BLE001 — one row, not the probe
            out[name] = f"ERR:{type(exc).__name__}"
        finally:
            spark.catalog.clearCache()
    json.dump(out, open(sys.argv[2], "w"))
    print(f"hashed {len(out)} queries at local[{sys.argv[1]}] -> {sys.argv[2]}")


if __name__ == "__main__":
    main()
