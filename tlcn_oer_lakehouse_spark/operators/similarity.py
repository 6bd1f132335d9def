"""Similarity search over embedding columns — brute-force and LSH-bucketed.

Reproduces the reference's kNN serving path (chatbot_api.py:227-242
ES script_score cosine; elasticsearch_sync.py dense_vector index) as
Spark-native operators, per SURVEY §2.10 Q2's rebuild mapping.

- ``cosine_topk``: exact brute force — one scan, per-row fold, TakeOrdered.
  No shuffle of the corpus; the driver receives only k rows.
- ``bucketed_ann_topk``: sign-bit LSH — prune the corpus to the query's
  bucket before scoring. At 100 TB the bucket column is a partition key,
  so the scan prunes to ~1/2^nbits of the data before any compute.
  Recall < 1 by construction (documented); the exact operator is the
  correctness baseline.

Ranking determinism: cosine is rounded to 9 dp before ordering and ties
break on id, so top-k membership is stable across engines and partition
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.functions.vectors import cosine, sign_bucket


def _query_lit(query_vec: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    q = _query_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 9).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def bucketed_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    nbits: int = 4,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's sign bucket."""
    q = _query_lit(query_vec)
    q_bucket = sum((1 << i) for i, x in enumerate(query_vec[:nbits]) if x >= 0)
    candidates = df.filter(sign_bucket(F.col(vec_col), nbits) == q_bucket)
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 9).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)
