"""Edge-case pins for the round-9c operators — boundary semantics the
driver parity sweep exercises only statistically: exact-threshold
inclusion, touching intervals, ring-boundary points, dedup-free
emission counts, both-dims skyline ties."""

from __future__ import annotations

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
)
from tlcn_oer_lakehouse_spark.operators.rangejoin import (
    bucketed_interval_overlap_join,
)
from tlcn_oer_lakehouse_spark.operators.spatial import grid_radius_join


# --- interval overlap ----------------------------------------------------


def _overlap(spark, a_rows, b_rows, width):
    a = spark.createDataFrame(a_rows, "a_id long, a_lo long, a_hi long")
    b = spark.createDataFrame(b_rows, "b_id long, b_lo long, b_hi long")
    return bucketed_interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=width
    ).select("a_id", "b_id")


def test_overlap_touching_endpoints_match_closed_bounds(spark):
    # a_hi == b_lo → closed-bound overlap of exactly one point
    got = _overlap(spark, [(1, 0, 100)], [(2, 100, 200)], width=64).collect()
    assert [(r.a_id, r.b_id) for r in got] == [(1, 2)]


def test_overlap_disjoint_by_one_excluded(spark):
    got = _overlap(spark, [(1, 0, 99)], [(2, 100, 200)], width=64).collect()
    assert got == []


def test_overlap_nested_and_many_buckets_emit_exactly_once(spark):
    # b nested deep inside a; a spans 40 buckets, the pair shares 3 —
    # the first-shared-bucket condition must emit exactly ONE row
    got = _overlap(spark, [(1, 0, 4000)], [(2, 1000, 1300)], width=100).collect()
    assert len(got) == 1
    # identical intervals: still exactly once
    got = _overlap(spark, [(1, 500, 900)], [(2, 500, 900)], width=100).collect()
    assert len(got) == 1


def test_overlap_counts_equal_theta_join(spark):
    # 50 a-intervals × 40 b-intervals with irregular spans: bucketed
    # output must equal the naive theta-join pair-for-pair
    a_rows = [(i, i * 37 % 500, i * 37 % 500 + 10 + (i * 13) % 90) for i in range(50)]
    b_rows = [(j, j * 53 % 480, j * 53 % 480 + 5 + (j * 29) % 120) for j in range(40)]
    got = _overlap(spark, a_rows, b_rows, width=32)
    a = spark.createDataFrame(a_rows, "a_id long, a_lo long, a_hi long")
    b = spark.createDataFrame(b_rows, "b_id long, b_lo long, b_hi long")
    want = (
        a.crossJoin(b)
        .filter((F.col("a_lo") <= F.col("b_hi")) & (F.col("a_hi") >= F.col("b_lo")))
        .select("a_id", "b_id")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


# --- spatial grid radius join --------------------------------------------


def _radius(spark, sites, pts, r):
    s = spark.createDataFrame(sites, "a_id long, x long, y long")
    p = spark.createDataFrame(pts, "b_id long, x long, y long")
    return grid_radius_join(s, p, r, keys=("a_id", "b_id"))


def test_spatial_point_exactly_on_ring_included(spark):
    got = _radius(spark, [(1, 1000, 1000)], [(2, 1000 + 300, 1000 + 400)], r=500).collect()
    assert len(got) == 1 and got[0].dist_sq == 500 * 500


def test_spatial_point_just_outside_excluded(spark):
    got = _radius(spark, [(1, 1000, 1000)], [(2, 1000 + 300, 1000 + 401)], r=500).collect()
    assert got == []


def test_spatial_diagonal_neighbor_cell_found(spark):
    # point in the diagonal (+1,+1) neighbor cell, inside the radius
    got = _radius(spark, [(1, 990, 990)], [(2, 1010, 1010)], r=1000).collect()
    assert len(got) == 1


def test_spatial_counts_equal_theta_join(spark):
    sites = [(i, (i * 7919) % 5000, (i * 104729) % 5000) for i in range(30)]
    pts = [(j, (j * 6151) % 5000, (j * 3571) % 5000) for j in range(400)]
    r = 900
    got = _radius(spark, sites, pts, r)
    s = spark.createDataFrame(sites, "a_id long, sx long, sy long")
    p = spark.createDataFrame(pts, "b_id long, px long, py long")
    dx = F.col("sx") - F.col("px")
    dy = F.col("sy") - F.col("py")
    want = (
        s.crossJoin(p)
        .filter(dx * dx + dy * dy <= r * r)
        .select("a_id", "b_id")
    )
    assert got.count() == want.count()
    assert got.select("a_id", "b_id").exceptAll(want).count() == 0


# --- prefix-filter exact set-similarity ----------------------------------


def test_prefix_filter_exact_threshold_boundary(spark):
    # doc 1: tokens a b c d e → shingles {abc, bcd, cde} (3)
    # doc 2: tokens a b c d x → shingles {abc, bcd, cdx} (3)
    # J = 2/4 = 0.5 exactly → INCLUDED at τ=0.5
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")], "doc_id long, text string"
    )
    got = prefix_filter_jaccard_pairs(docs, "doc_id", "text").collect()
    assert len(got) == 1 and abs(got[0].jaccard - 0.5) < 1e-15


def test_prefix_filter_below_threshold_excluded(spark):
    # J = 1/5 < 0.5 → excluded
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y")], "doc_id long, text string"
    )
    assert prefix_filter_jaccard_pairs(docs, "doc_id", "text").collect() == []


def test_prefix_filter_equals_all_pairs_on_random_corpus(spark, sf_dir):
    # exactness on real data: prefix-filtered output must equal the
    # UNFILTERED all-shared-shingle Jaccard (feasible at smoke scale)
    from tlcn_oer_lakehouse_spark.operators.dedup import (
        jaccard_verify_from,
        shingle_rows,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = prefix_filter_jaccard_pairs(docs, "doc_id", "text")
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
    want = jaccard_verify_from(sh, all_pairs).filter(F.col("jaccard") >= 0.5)
    assert got.count() == want.count()
    assert got.select("doc_a", "doc_b").exceptAll(
        want.select("doc_a", "doc_b")
    ).count() == 0
