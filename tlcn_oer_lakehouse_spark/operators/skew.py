"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains necessary when one side must be
replicated (e.g. a hot-key dimension too large to broadcast whole but
joined by a power-law key).  ``salted_join`` replicates the right side
``salt`` ways and scatters the left side uniformly across the replicas,
so a key carrying 30% of the fact table spreads over ``salt`` reducers
instead of one.

Correctness: salting is a pure partitioning trick — results equal the
plain equi-join (property-tested in test_operators_extra.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with ``salt``-way hot-key spreading.

    left rows get a uniform salt in [0, salt); right rows are exploded
    into all ``salt`` replicas; the join key becomes (key, salt).  The
    left salt uses a deterministic hash of the full row position-free
    content (xxhash64 over all columns + key), not rand(), so re-runs
    and retried tasks produce identical assignments."""
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__salt", l_salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
