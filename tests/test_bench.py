"""bench.py fault isolation: a broken query (or a wholly missing
testdata dir) must cost individual ``{"err": ...}`` rows, never the JSON
line itself — round 3 lost its entire perf signal to one bad loader."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_json_even_when_every_query_fails(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=str(tmp_path / "no_such_sf"))
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["metric"] == "headline_queries_total"
    assert result["unit"] == "sec"
    assert result["errors"] >= 1
    # every query row is an err object, and the total only sums successes
    assert all(isinstance(v, dict) and "err" in v for v in result["queries"].values())
    assert result["value"] == 0.0
    # normalization degrades gracefully when the calibration itself errs
    assert result["queries_norm"] == {}
    assert result["value_norm"] is None
