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


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """IVF cluster assignment: each vector joins the (small, broadcast)
    centroid set, scores all centroids, and keeps the argmax-cosine one
    (round-9 + id tie-break keeps assignment engine-stable).  The classic
    inverted-file partitioning step — at scale the assigned cluster id
    becomes the table's partition/cluster key so probes prune scans."""
    from pyspark.sql import Window

    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(centroid_id_col),
        F.round(cosine(F.col(vec_col), F.col(centroid_vec_col)), 9).alias("c_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_sim").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col(centroid_id_col).alias("cluster_id"))
    )


def _probe_frame(
    centroids: DataFrame, query: DataFrame, n_probe: int
) -> DataFrame:
    """The query's ``n_probe`` nearest clusters as a (cluster_id) frame
    — the ONE copy of probe selection (round-9 cosine, id tie-break)
    shared by the in-plan join (:func:`ivf_topk`) and the request-time
    collect (:func:`ivf_probe_clusters`); a determinism fix lands in
    both or neither."""
    return (
        query.crossJoin(F.broadcast(centroids))
        .select(
            F.col("centroid_id").alias("cluster_id"),
            F.round(cosine(F.col("q_emb"), F.col("centroid_vec")), 9).alias("c_sim"),
        )
        .orderBy(F.col("c_sim").desc(), F.col("cluster_id").asc())
        .limit(n_probe)
        .select("cluster_id")
    )


def _exact_cos_topk(
    cands: DataFrame, id_col: str, vec_col: str, query: DataFrame, k: int
) -> DataFrame:
    """Shared exact-scoring tail over a candidate set: round-9 cosine to
    the broadcast query, id tie-break, top-k."""
    scored = cands.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        F.col("cluster_id"),
        F.round(cosine(F.col(vec_col), F.col("q_emb")), 9).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF search: assign corpus and query to centroid clusters, probe
    the query's ``n_probe`` nearest clusters, exact-score only candidates
    inside them.  ``query`` is a 1-row (q_emb) DataFrame — no literal
    vectors, no driver collect anywhere in the plan."""
    assigned = ivf_assign(df, id_col, vec_col, centroids)
    cands = assigned.join(
        F.broadcast(_probe_frame(centroids, query, n_probe)), "cluster_id"
    )
    return _exact_cos_topk(cands, id_col, vec_col, query, k)


def ivf_probe_clusters(
    centroids: DataFrame, query: DataFrame, n_probe: int = 2
) -> list:
    """The query's ``n_probe`` nearest cluster ids, as driver-side
    values.  This is an O(#centroids) collect (the centroid table is
    tiny by construction — it IS the coarse quantizer), mirroring how a
    serving node picks probe lists at request-build time; the resulting
    ids parameterize a STATIC partition filter over the cluster-
    partitioned store (see :func:`ivf_topk_from_assigned`)."""
    return [
        r.cluster_id for r in _probe_frame(centroids, query, n_probe).collect()
    ]


def ivf_topk_from_assigned(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    probe_clusters: list,
    k: int = 10,
) -> DataFrame:
    """IVF probe over an ALREADY-ASSIGNED (and, in production, written
    ``partitionBy(cluster_id)``) store: the probe-cluster filter is a
    static ``isin`` on the partition column, so over a partitioned
    layout the scan opens only ``n_probe`` of the cluster directories —
    the inverted-file pruning claim made plan-checkable
    (tests/test_plans.py pins the PartitionFilters)."""
    cands = assigned.filter(F.col("cluster_id").isin(*probe_clusters))
    return _exact_cos_topk(cands, id_col, vec_col, query, k)


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
