"""Round-10 regression pins for the ADVICE-r9 fixes: negative-domain
spatial cells, the shuffle (non-broadcast) grid-join fallback, and the
exact-rational prefix-filter bounds at thresholds whose float products
round above exact integers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.dedup import prefix_filter_jaccard_pairs
from tlcn_oer_lakehouse_spark.operators.spatial import grid_radius_join


def _radius(spark, sites, pts, r, **kw):
    s = spark.createDataFrame(sites, "a_id long, x long, y long")
    p = spark.createDataFrame(pts, "b_id long, x long, y long")
    return grid_radius_join(s, p, r, keys=("a_id", "b_id"), **kw)


def test_spatial_negative_coordinates_across_origin(spark):
    """ADVICE r9: cast-truncation collapsed cells −1 and 0, so a pair
    straddling the origin could land 2 cells apart and be missed.  With
    floor cells the straddling pair is found; counts match the
    theta-join over a grid spanning all four quadrants."""
    # site just left of the origin, point just right — within radius
    got = _radius(spark, [(1, -10, -10)], [(2, 10, 10)], r=100).collect()
    assert len(got) == 1 and got[0].dist_sq == 800

    sites = [(i, (i * 7919) % 4000 - 2000, (i * 104729) % 4000 - 2000)
             for i in range(25)]
    pts = [(j, (j * 6151) % 4000 - 2000, (j * 3571) % 4000 - 2000)
           for j in range(300)]
    r = 700
    got = _radius(spark, sites, pts, r)
    s = spark.createDataFrame(sites, "a_id long, sx long, sy long")
    p = spark.createDataFrame(pts, "b_id long, px long, py long")
    dx, dy = F.col("sx") - F.col("px"), F.col("sy") - F.col("py")
    want = s.crossJoin(p).filter(dx * dx + dy * dy <= r * r).select("a_id", "b_id")
    assert got.count() == want.count() > 0
    assert got.select("a_id", "b_id").exceptAll(want).count() == 0


def test_spatial_shuffle_fallback_matches_broadcast(spark):
    """broadcast=False (fact-sized small side) must produce the identical
    pair set and drop the broadcast HINT — at test scale the optimizer
    may still pick broadcast from size stats (correct: a genuinely
    fact-sized side would exceed autoBroadcastJoinThreshold and plan a
    shuffle join), so the pin is on the logical plan's hint, not the
    physical strategy."""
    sites = [(i, (i * 7919) % 3000, (i * 104729) % 3000) for i in range(20)]
    pts = [(j, (j * 6151) % 3000, (j * 3571) % 3000) for j in range(200)]
    bcast = _radius(spark, sites, pts, 500, broadcast=True)
    shuf = _radius(spark, sites, pts, 500, broadcast=False)
    assert sorted(map(str, bcast.collect())) == sorted(map(str, shuf.collect()))
    analyzed = shuf._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed and "ResolvedHint" not in analyzed
    assert "ResolvedHint" in bcast._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("tau", [0.55, 0.6, 0.7, 0.9])
def test_prefix_filter_non_binary_thresholds_stay_exact(spark, tau):
    """ADVICE r9: float ⌈τ·n⌉ can overshoot for τ with no exact binary
    form (0.55·20 = 11.000000000000002 → ceil 12, prefix one short).
    The exact-rational bounds must keep the output equal to the
    unfiltered all-pairs Jaccard at every τ."""
    from tlcn_oer_lakehouse_spark.operators.dedup import (
        jaccard_verify_from,
        shingle_rows,
    )

    # 40 docs with heavily-overlapping token runs → many pairs near
    # every boundary, including sizes where p·n/q is an exact integer
    base = list("abcdefghijklmnopqrstuvwxyz")
    rows = []
    for i in range(40):
        toks = base[(i % 7):(i % 7) + 12 + (i % 9)]
        if i % 3 == 0:
            toks = toks + ["z%d" % i]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = prefix_filter_jaccard_pairs(docs, "doc_id", "text", threshold=tau)
    sh = shingle_rows(docs, "doc_id", "text").select("doc", "shingle")
    all_pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates()
    )
    want = jaccard_verify_from(sh, all_pairs).filter(F.col("jaccard") >= tau)
    got_rows = sorted((r.doc_a, r.doc_b) for r in got.collect())
    want_rows = sorted((r.doc_a, r.doc_b) for r in want.collect())
    assert got_rows == want_rows and got_rows  # non-vacuous


def test_prefix_filter_integer_bounds_match_rational_ground_truth(spark):
    """The concrete overshoot class (ADVICE r9): ⌈0.55·100⌉ = 56 in
    float (0.55·100 = 55.000000000000007) but 55 exactly — one prefix
    token silently lost.  Pin that (a) the float trap is real and (b)
    the operator's Spark-side integer ceil-division reproduces the
    exact Fraction ceil for every (τ, n) in a sweep covering all 75
    overshoot cases under n=3000 at τ=0.55."""
    import math
    from fractions import Fraction

    assert math.ceil(0.55 * 100) == 56  # the float trap is real
    p, q = Fraction("0.55").numerator, Fraction("0.55").denominator
    assert -(-p * 100 // q) == 55  # exact ceil

    # evaluate the operator's expression shape in Spark itself
    ns = spark.range(1, 3000).select(F.col("id").alias("n"))
    got = ns.select(
        "n", F.expr(f"({p} * n + {q - 1}) div {q}").alias("ceil_tau_n")
    ).collect()
    for r in got:
        assert r.ceil_tau_n == -(-p * int(r.n) // q), r


def test_incremental_prefix_equals_full_restricted(spark, sf_dir):
    """O(delta) exact dedup: pairs from (existing, batch) under the
    FROZEN standing-index order must equal the full-corpus prefix
    filter's pairs restricted to batch-touching pairs — exactness is
    order-independent, so the frozen order loses nothing."""
    from tlcn_oer_lakehouse_spark.operators.dedup import (
        prefix_filter_incremental_pairs,
        prefix_filter_jaccard_pairs,
    )
    from tlcn_oer_lakehouse_spark.queries.textops import (
        COPY_OFFSET,
        augmented_corpus,
    )

    corpus = augmented_corpus(spark, sf_dir).persist()
    batch = corpus.filter(F.col("doc_id") >= COPY_OFFSET)
    existing = corpus.filter(F.col("doc_id") < COPY_OFFSET)
    full = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_jaccard_pairs(corpus, "doc_id", "text").collect()
    }
    expected = {
        p for p in full if p[0] >= COPY_OFFSET or p[1] >= COPY_OFFSET
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_incremental_pairs(
            existing, batch, "doc_id", "text"
        ).collect()
    }
    corpus.unpersist()
    assert expected, "fixture must contain batch-touching exact pairs"
    assert got == expected


def test_prefix_filter_rejects_unrepresentable_threshold(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="decimal"):
        prefix_filter_jaccard_pairs(docs, "doc_id", "text", threshold=1 / 3)
