"""k-core and modularity: hand-verifiable fixtures + structural
invariants the oracle parity cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.components import k_core


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "u long, v long")


def test_kcore_clique_with_pendant_chain(spark):
    # 4-clique {1,2,3,4} + chain 4-5-6: the 3-core is exactly the clique
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    out = {r.node: r.core_degree for r in k_core(_pairs(spark, clique + chain), 3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascade(spark):
    # path graph: 2-core is empty, but only after the peel CASCADES from
    # both endpoints inward (one round per layer)
    path = [(i, i + 1) for i in range(1, 8)]
    assert k_core(_pairs(spark, path), 2).count() == 0
    # a cycle survives k=2 intact (every node keeps degree exactly 2)
    cycle = path + [(8, 1)]
    out = {r.node: r.core_degree for r in k_core(_pairs(spark, cycle), 2).collect()}
    assert out == {i: 2 for i in range(1, 9)}


def test_kcore_converges_within_oracle_unroll(spark):
    """The registered oracle unrolls _KCORE_ROUNDS peels; the operator
    must reach its fixpoint within that budget on the real graph (the
    fixpoint-uniqueness argument needs convergence ≤ unroll)."""
    from tlcn_oer_lakehouse_spark.queries.textops import _KCORE_K, _KCORE_ROUNDS

    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "ok").where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v")).distinct()
    )
    tight = k_core(pairs, _KCORE_K, max_rounds=_KCORE_ROUNDS)
    loose = k_core(pairs, _KCORE_K, max_rounds=50)
    assert sorted(map(tuple, tight.collect())) == sorted(map(tuple, loose.collect()))


def test_modularity_invariants(spark):
    from tlcn_oer_lakehouse_spark.queries.textops import g_modularity

    rows = g_modularity(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 25  # one row per brand
    total_deg = sum(r.degree_sum for r in rows)
    total_intra = sum(r.intra_edges for r in rows)
    m = total_deg // 2
    assert total_intra <= m
    q = sum(r.q_contrib for r in rows)
    assert -0.5 <= q <= 1.0  # Newman bounds
    # random-ish brand assignment over a dense graph → near-zero Q
    assert abs(q) < 0.1
