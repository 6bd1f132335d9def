"""Vector expressions over ``array<float>`` embedding columns.

The reference serves vectors from Elasticsearch (`dense_vector` cosine,
elasticsearch_sync.py:327-332) and computes query-side cosine in ES script
score (chatbot_api.py:227-242).  Here the same math is a JVM-side fold over
array columns — no UDF, no serde — usable in any DataFrame plan.

Determinism: ``F.aggregate`` is a sequential left fold in list order with a
DOUBLE accumulator, which matches DuckDB's ``list_sum(list_transform(...))``
bit-for-bit (verified empirically), so vector queries are oracle-checkable.

Scale: per-row folds are embarrassingly parallel; brute-force top-k is a
single pass + TakeOrdered (no shuffle of the big side). The ANN path
(sign-bucket LSH in operators/similarity.py) prunes candidates before the
fold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(a: Column, nbits: int) -> Column:
    """Deterministic coarse bucket from the sign bits of the first
    ``nbits`` components — the cheapest LSH family for unit vectors.
    (A production IVF variant would use trained centroids; sign-bucketing
    needs no training and is exactly reproducible in the oracle.)"""
    bits = [
        F.when(F.element_at(a, i + 1) >= 0, F.lit(1) * (2 ** i)).otherwise(F.lit(0))
        for i in range(nbits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")
