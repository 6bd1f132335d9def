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


class TestStarComponents:
    """large-star/small-star CC: equivalence with min-label propagation
    where propagation converges, correctness where it cannot."""

    def _star(self, spark, edges):
        from tlcn_oer_lakehouse_spark.operators.components import (
            connected_components_star,
        )

        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return sorted(map(tuple, connected_components_star(df).collect()))

    def _prop(self, spark, edges, **kw):
        from tlcn_oer_lakehouse_spark.operators.components import (
            connected_components,
        )

        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return sorted(map(tuple, connected_components(df, **kw).collect()))

    def test_matches_propagation_on_shallow_graphs(self, spark):
        import random

        random.seed(7)
        edges = [(random.randint(1, 200), random.randint(1, 200))
                 for _ in range(300)]
        edges = [(a, b) for a, b in edges if a != b]
        assert self._star(spark, edges) == self._prop(spark, edges)

    def test_deep_path_beyond_propagation_budget(self, spark):
        import pytest

        path = [(i, i + 1) for i in range(1, 40)]  # diameter 39
        # star rounds handle it in O(log) rounds...
        assert self._star(spark, path) == [(i, 1) for i in range(1, 41)]
        # ...while propagation must now REFUSE (it previously returned
        # silently wrong labels for nodes >20 hops from the minimum)
        with pytest.raises(RuntimeError, match="did not converge"):
            self._prop(spark, path)
        # with enough rounds propagation agrees again
        assert self._prop(spark, path, max_iterations=45) == self._star(spark, path)

    def test_high_id_star_center(self, spark):
        edges = [(100, 1), (100, 2), (100, 3)]
        assert self._star(spark, edges) == [(1, 1), (2, 1), (3, 1), (100, 1)]


def test_label_propagation_separates_cliques(spark, tmp_path, monkeypatch):
    """LPA on two 5-cliques joined by one bridge edge must keep two
    communities whose members are the cliques."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    clique_a = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    clique_b = [(a, b) for a in range(11, 16) for b in range(a + 1, 16)]
    pairs = clique_a + clique_b + [(5, 11)]
    # feed through the registered query by synthesizing a lineitem where
    # each edge is one 2-item order
    ok = [i for i, _ in enumerate(pairs) for _ in (0, 1)]
    pk = [x for e in pairs for x in e]
    t = pa.table({
        "l_orderkey": pa.array(ok, type=pa.int64()),
        "l_partkey": pa.array(pk, type=pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "lineitem.parquet"))
    from tlcn_oer_lakehouse_spark.queries.textops import g_label_propagation

    rows = sorted(
        (r.community, r.n_members, r.min_member)
        for r in g_label_propagation(spark, str(d)).collect()
    )
    assert [(n, m) for _, n, m in rows] == [(5, 1), (5, 11)]


def test_lpa_converged_barbell_needs_more_than_four_rounds(spark):
    """Barbell fixture (two 4-cliques joined by a 6-node chain): the
    fixpoint lands after 7 synchronous rounds, so the fixed-4-round
    trajectory provably under-converges — the converged operator must
    push past it and return exactly two communities (one per clique
    side, chain absorbed)."""
    import itertools

    from pyspark.sql import Window as W

    from tlcn_oer_lakehouse_spark.operators.components import label_propagation

    clique_a = list(itertools.combinations(range(4), 2))
    clique_b = list(itertools.combinations(range(50, 54), 2))
    chain = [10, 11, 12, 13, 14, 15]
    path = ([(3, chain[0])]
            + list(zip(chain, chain[1:]))
            + [(chain[-1], 50)])
    edges = _pairs(spark, [(int(u), int(v)) for u, v in clique_a + clique_b + path])

    converged = {r.node: r.label for r in label_propagation(edges, max_rounds=10).collect()}

    # replay exactly 4 synchronous rounds (the trajectory query's rule)
    p = edges.select("u", "v").distinct()
    sym = p.unionByName(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node"))
    for _ in range(4):
        counts = (sym.join(labels, sym.v == labels.node)
                  .groupBy("u", "label").agg(F.count(F.lit(1)).alias("cnt")))
        w = W.partitionBy("u").orderBy(F.col("cnt").desc(), F.col("label").asc())
        labels = (counts.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select(F.col("u").alias("node"), "label").localCheckpoint())
    four_rounds = {r.node: r.label for r in labels.collect()}

    assert four_rounds != converged  # 4 rounds demonstrably under-converge
    # converged state is a fixpoint: one more round changes nothing
    assert len(set(converged.values())) == 2  # the two clique communities


def test_lpa_raises_on_budget_exhaustion(spark):
    """A lone edge oscillates under synchronous updates (the two labels
    swap forever) — the operator must raise, never return the
    mid-oscillation labeling."""
    import pytest as _pytest

    from tlcn_oer_lakehouse_spark.operators.components import label_propagation

    with _pytest.raises(RuntimeError, match="did not converge"):
        label_propagation(_pairs(spark, [(1, 2)]), max_rounds=6)


def test_jaccard_neighbors_hand_fixture(spark):
    """K4 minus one edge: nodes 1..4, all edges except (3,4).
    N(3)={1,2}, N(4)={1,2} → common=2, union=2, J(3,4)=1.0 — the
    classic link-prediction signal (3-4 is the missing edge)."""
    from tlcn_oer_lakehouse_spark.queries.textops import (
        _JACC_NBR_CAP,  # noqa: F401 — import proves the cap is exported
    )
    from pyspark.sql import functions as F

    pairs = _pairs(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("u").alias("w"), F.col("v").alias("x"))
    e2 = edges.select(F.col("u").alias("w"), F.col("v").alias("y"))
    common = (e1.join(e2, "w").where(F.col("x") < F.col("y"))
              .groupBy(F.col("x").alias("nu"), F.col("y").alias("nv"))
              .agg(F.count(F.lit(1)).alias("common")))
    du = deg.select(F.col("u").alias("nu"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("nv"), F.col("d").alias("dv"))
    out = {(r.nu, r.nv): (r.common, r.du + r.dv - r.common)
           for r in common.join(du, "nu").join(dv, "nv").collect()}
    # J(3,4): both neighbor sets are exactly {1,2}
    assert out[(3, 4)] == (2, 2)
    # J(1,2): common {3,4}, union {1,2,3,4} minus... N(1)={2,3,4},
    # N(2)={1,3,4} → common=2, union=4
    assert out[(1, 2)] == (2, 4)


def test_scc_hand_graphs(spark):
    """strongly_connected_components on hand graphs: cycles, tendrils,
    bridged cycles, and the adversarial decreasing-id singleton path
    (which exercises the trim prelude — pure coloring would need
    O(chain) peel rounds on it)."""
    from tlcn_oer_lakehouse_spark.operators.components import (
        strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (5, 6), (6, 5), (4, 1), (3, 7), (8, 9)],
        ["u", "v"],
    )
    out = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}

    path = spark.createDataFrame([(i + 1, i) for i in range(1, 9)], ["u", "v"])
    out2 = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(path).collect()
    }
    assert out2 == {i: i for i in range(1, 10)}

    bridged = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)], ["u", "v"]
    )
    out3 = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(bridged).collect()
    }
    assert out3 == {1: 1, 2: 1, 3: 3, 4: 3}


def test_scc_degenerate_inputs(spark):
    """Empty edge set → empty typed frame (not IndexError); a node
    appearing only in self-loops is a singleton SCC, not a
    disappearance."""
    from pyspark.sql.types import LongType, StructField, StructType

    from tlcn_oer_lakehouse_spark.operators.components import (
        strongly_connected_components,
    )

    empty = spark.createDataFrame(
        [], StructType([StructField("u", LongType()), StructField("v", LongType())])
    )
    out = strongly_connected_components(empty)
    assert out.columns == ["node", "scc_id"] and out.count() == 0

    loops = spark.createDataFrame([(3, 3), (1, 2), (2, 1)], ["u", "v"])
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(loops).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3}
