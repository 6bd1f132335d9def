"""Local replica of the driver's correctness gate.

Runs a QuerySpec's Spark builder and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by their full stringified tuple).  Stricter than needed — exact equality
on the stringified values — so that passing here strongly implies passing
the driver's hash check.
"""

from __future__ import annotations

import atexit
import datetime as _dt
import math
import os
import shutil

import duckdb

_SPILL_DIRS: list[str] = []


@atexit.register
def _cleanup_spill_dirs() -> None:
    for d in _SPILL_DIRS:
        shutil.rmtree(d, ignore_errors=True)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Cap the oracle's footprint so the big-scale sweeps (sf1.0 corpus,
    # run beside a ~30 GB Spark JVM on one 128 GB host) spill to disk
    # instead of racing the JVM for RAM: an unlimited in-memory DuckDB
    # defaults to 80% of physical memory and has no temp directory to
    # spill to.  Harmless at driver scale (sf0.01 fits in MBs).
    # The cap itself is host-relative: a flat 40GB OVER-commits on a
    # small box (above DuckDB's own 80%-of-RAM heuristic), so take the
    # min.  The spill dir is per-connection (mkdtemp), not a shared
    # fixed path — concurrent harness processes must not collide.
    import tempfile

    try:
        phys = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        phys = 0
    cap_gb = min(40, max(1, int(phys * 0.5 / 2**30))) if phys else 40
    con.execute(f"SET memory_limit='{cap_gb}GB'")
    # per-connection spill dir (concurrent harness processes must not
    # collide), removed at process exit — DuckDB cleans the files inside
    # but not the directory, and one dir leaks per connection otherwise
    spill = tempfile.mkdtemp(prefix="duckdb_oracle_spill_")
    _SPILL_DIRS.append(spill)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of a double is bit-faithful; both engines must agree bitwise
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "asDict"):  # pyspark Row (struct)
        d = v.asDict()
        return "{" + ",".join(f"{k}:{_norm_cell(d[k])}" for k in sorted(d)) + "}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, sf_dir: str, spec) -> tuple[bool, str]:
    sdf = spec.builder(spark, sf_dir)
    s_cols = sdf.columns
    try:
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        # builders that persist multiply-referenced frames (medallion,
        # dedup, contamination) must not accumulate cache across a
        # multi-query sweep (ADVICE r7)
        spark.catalog.clearCache()

    if spec.oracle is None:
        return (True, f"rows-only: {len(s_rows)} rows")

    con = duckdb_con(sf_dir)
    res = con.execute(spec.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        return (False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        return (False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    sn = _normalize(s_rows, s_cols)
    on = _normalize(o_rows, o_cols)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return (False, f"value mismatch ({sum(1 for a, b in zip(sn, on) if a != b)} rows), first: {diffs}")
    return (True, f"match: {len(s_rows)} rows")
