"""Deterministic identity & fingerprint expressions.

Re-expresses the reference's content-addressed ID conventions as pure
column expressions (JVM-side, codegen'd) instead of Python-side hashlib
calls inside RDD mapPartitions:

- ``resource_uid`` = sha256(resource_id)           (transformer.py:305-307)
- ``asset_uid``    = sha256(resource_uid||path)    (transformer.py:1608)
- ``record_fingerprint`` = sha256(canonical payload) (transformer.py:310-337)
- surrogate keys from hash prefixes                 (gold_analytics.py:258-263;
  the reference uses abs(xxhash64) — we expose that too, plus a portable
  md5-prefix variant whose value is reproducible outside the JVM)

All are deterministic, so re-runs of any pipeline stage are idempotent by
construction — the property the reference's MERGE-based incremental layer
depends on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_uid(*cols: Column | str) -> Column:
    """Content-addressed UID: sha256 over '||'-joined parts."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.sha2(F.concat_ws("||", *parts), 256)


def md5_fingerprint(*cols: Column | str) -> Column:
    """Change-detection fingerprint over a canonical column tuple."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat_ws("||", *parts))


def surrogate_key(*cols: Column | str) -> Column:
    """64-bit surrogate key from the first 8 hex chars of md5 — portable
    (identical value computable in any engine), unlike xxhash64."""
    return F.conv(F.substring(md5_fingerprint(*cols), 1, 8), 16, 10).cast("long")


def xxhash_surrogate_key(*cols: Column | str) -> Column:
    """The reference's own surrogate scheme: abs(xxhash64(...))
    (gold_analytics.py:258-263). JVM-only value; fastest at scale."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.abs(F.xxhash64(*parts))
