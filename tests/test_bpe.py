"""Pin BPE merge-learning semantics on a hand-computed example:
overlapping pair counting, greedy left-to-right merge application, and
the (cnt DESC, l ASC, r ASC) tie-break."""

from __future__ import annotations

from tlcn_oer_lakehouse_spark.queries.bpe import learn_bpe_merges


def test_bpe_hand_example(spark):
    # vocab: "aaab" x2, "ab" x3
    # step 1: (a,a) = 2 occurrences x freq 2 = 4 ; (a,b) = 1x2 + 1x3 = 5
    #   -> merge (a,b): aaab -> [a,a,ab], ab -> [ab]
    # step 2: (a,a) = 2, (a,ab) = 2 — tie broken by r: 'a' < 'ab'
    #   -> merge (a,a): [aa, ab], [ab]
    # step 3: (aa, ab) = 2 -> merge
    words = spark.createDataFrame(
        [("aaab", 2), ("ab", 3)], "word string, freq long"
    )
    got = [
        (r.step, r.merge_left, r.merge_right, r.pair_count)
        for r in learn_bpe_merges(spark, words, n_merges=3).orderBy("step").collect()
    ]
    assert got == [(1, "a", "b", 5), (2, "a", "a", 2), (3, "aa", "ab", 2)]


def test_bpe_run_merge_is_greedy(spark):
    # "aaaaa": adjacent (a,a) counted 4x (overlapping); greedy merge
    # leaves [aa, aa, a] so step 2 sees (aa,aa)=1 and (aa,a)=1
    words = spark.createDataFrame([("aaaaa", 1)], "word string, freq long")
    got = [
        (r.step, r.merge_left, r.merge_right, r.pair_count)
        for r in learn_bpe_merges(spark, words, n_merges=2).orderBy("step").collect()
    ]
    assert got[0] == (1, "a", "a", 4)
    # tie at cnt=1: (aa,a) < (aa,aa) lexicographically on r
    assert got[1] == (2, "aa", "a", 1)


def test_bpe_stops_when_no_pairs_left(spark):
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    rows = learn_bpe_merges(spark, words, n_merges=5).collect()
    # one merge fuses the only pair; afterwards no adjacent pairs remain
    assert [(r.step, r.merge_left, r.merge_right) for r in rows] == [(1, "a", "b")]
