"""Constructed-input pins for the round-10 query cores — boundary
semantics the driver parity sweep exercises only statistically: the KS
statistic and its argmax tie-break, SNM window/partition-boundary
behavior, the AQP estimator identity, and Benford digit-extraction
edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.blocking import (
    global_sort_ranks,
    sorted_neighborhood_pairs,
)
from tlcn_oer_lakehouse_spark.queries.lakehouse import benford_table
from tlcn_oer_lakehouse_spark.queries.relational import aqp_group_estimates
from tlcn_oer_lakehouse_spark.queries.windows import ks_over_events


# --- exact KS ---------------------------------------------------------------


def test_ks_hand_computed_statistic(spark):
    """Half A = {1, 2}, half B = {3, 4}: the CDFs separate completely at
    v=2 (F_A=1, F_B=0) → D = 1 exactly, scaled statistic n_a·n_b = 4,
    located at value 2."""
    ev = spark.createDataFrame(
        [("t", 0, 1.0), ("t", 0, 2.0), ("t", 1, 3.0), ("t", 1, 4.0)],
        "event_type string, day_idx long, value double",
    )
    rows = ks_over_events(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_a, r.n_b, r.ks_scaled, r.ks_d, r.ks_at_value) == (2, 2, 4, 1.0, 2.0)


def test_ks_identical_halves_zero(spark):
    """Same values in both halves → D = 0 (and the argmax tie-break
    must pick the SMALLEST value among the all-equal diffs)."""
    ev = spark.createDataFrame(
        [("t", 0, v) for v in (1.0, 2.0, 3.0)]
        + [("t", 9, v) for v in (1.0, 2.0, 3.0)],
        "event_type string, day_idx long, value double",
    )
    r = ks_over_events(ev).collect()[0]
    assert r.ks_scaled == 0 and r.ks_d == 0.0
    assert r.ks_at_value == 1.0  # min-value tie-break over diff==0 rows


def test_ks_interleaved_known_value(spark):
    """A = {1,3,5}, B = {2,4,6}: F_A−F_B peaks at 1/3 after each odd
    value; scaled = |3·cum_a − 3·cum_b| peaks at 3, first at v=1."""
    ev = spark.createDataFrame(
        [("t", 0, v) for v in (1.0, 3.0, 5.0)]
        + [("t", 9, v) for v in (2.0, 4.0, 6.0)],
        "event_type string, day_idx long, value double",
    )
    r = ks_over_events(ev).collect()[0]
    assert (r.ks_scaled, r.ks_at_value) == (3, 1.0)
    assert abs(r.ks_d - 1 / 3) < 1e-15


# --- sorted-neighborhood ----------------------------------------------------


def test_global_sort_ranks_are_dense_and_ordered(spark):
    """Ranks must be exactly 0..n−1 following the sort order, with rows
    scattered across many range partitions (n_partitions larger than
    distinct keys stresses empty/thin partitions)."""
    rows = [(i, f"name{i:03d}") for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, name string")
    got = {
        r.rid: r.rank
        for r in global_sort_ranks(df, ["name", "rid"], 16).collect()
    }
    assert got == {i: i for i in range(40)}  # name order == id order here


def test_snm_window_pairs_cross_partition_boundaries(spark):
    """Every rank-adjacent pair within w must surface even when the
    sorted order is split across many range partitions; ranks beyond w
    must not."""
    rows = [(i, f"tok{i:03d} shared common words here") for i in range(30)]
    df = spark.createDataFrame(rows, "rid long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "rid", "name", window=3, threshold=0.5, n_partitions=8
        ).collect()
    }
    # names share 4 of 6 distinct tokens pairwise -> J = 4/8 = 0.5:
    # every pair within rank distance <= 3 must be present
    want = {(a, b) for a in range(30) for b in range(a + 1, min(a + 4, 30))}
    assert got == want


def test_snm_threshold_excludes_dissimilar_neighbors(spark):
    """Adjacent ranks whose token sets share nothing must be filtered by
    the verify even though they are window candidates."""
    df = spark.createDataFrame(
        [(1, "aaa bbb ccc"), (2, "aaa bbb ddd"), (3, "xxx yyy zzz")],
        "rid long, name string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "rid", "name", window=2, threshold=0.5, n_partitions=4
        ).collect()
    }
    assert got == {(1, 2)}  # J(1,2)=2/4=0.5 in; 3 shares nothing


# --- AQP estimator ----------------------------------------------------------


def test_aqp_mod_one_is_exact(spark):
    """mod=1 samples every row: the estimate must EQUAL the exact values
    and every relative error must be exactly 0.0 — the estimator
    identity that certifies the scale-up arithmetic."""
    rows = [(f"g{i % 3}", i, float(i) + 0.25) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, k long, v double")
    for r in aqp_group_estimates(df, "grp", "k", "v", mod=1).collect():
        assert r.n_est == r.n_exact
        assert r.rev_est == r.rev_exact
        assert r.n_rel_err == 0.0 and r.rev_rel_err == 0.0


def test_aqp_hand_checkable_scale_up(spark):
    """mod=2 on a constructed frame: the estimate must be exactly
    mod × the (deterministic) sampled aggregate."""
    rows = [("g", i, 10.0) for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, k long, v double")
    r = aqp_group_estimates(df, "grp", "k", "v", mod=2).collect()[0]
    assert r.n_exact == 40
    assert r.n_est % 2 == 0 and r.n_est > 0
    # every row is worth 10.0, so the revenue estimate must equal
    # 10 x the count estimate exactly
    assert abs(r.rev_est - 10.0 * r.n_est) < 1e-9


# --- Benford ----------------------------------------------------------------


def test_benford_digit_extraction_edges(spark):
    """Sub-dollar amounts take their digit from CENTS (0.07 → 7¢ →
    digit 7); zero and negative amounts are excluded; chi2 terms are
    finite and the observed shares sum to 1."""
    df = spark.createDataFrame(
        [(0.07,), (0.0,), (-5.0,), (123.45,), (950.0,), (1.0,)],
        "amount double",
    )
    rows = benford_table(df).collect()
    by_digit = {r.digit: r for r in rows}
    assert set(by_digit) == {7, 1, 9}          # 7¢, 12345¢+100¢, 95000¢
    assert by_digit[1].n_obs == 2              # 123.45 and 1.00
    assert abs(sum(r.p_observed for r in rows) - 1.0) < 1e-9
    assert all(r.chi2_term >= 0 for r in rows)


def test_benford_uniform_magnitudes_conform(spark):
    """Amounts spanning several magnitudes log-uniformly should conform
    closely: each observed share within a few points of its Benford
    share (smoke pin on the statistic's direction, not a fit test)."""
    import math

    amounts = [(math.exp(i / 97.0),) for i in range(1, 800)]
    df = spark.createDataFrame(amounts, "amount double")
    rows = benford_table(df).collect()
    assert len(rows) == 9
    for r in rows:
        assert abs(r.p_observed - r.p_benford) < 0.05, r
