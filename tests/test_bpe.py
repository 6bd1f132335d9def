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


def _reference_bpe(words: dict[str, int], n_merges: int):
    """Independent sequential BPE (Sennrich 2016 reference shape):
    dict-of-tuples vocab, overlapping pair counts, greedy left-to-right
    merge — no shared code with the Spark implementation."""
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, l, r, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_on_random_vocabs(spark):
    from hypothesis import given, settings, strategies as st

    word_st = st.text(alphabet="abc", min_size=1, max_size=6)

    @settings(max_examples=8, deadline=None)
    @given(
        st.dictionaries(word_st, st.integers(min_value=1, max_value=9),
                        min_size=1, max_size=8)
    )
    def run(words):
        expected = _reference_bpe(words, n_merges=4)
        df = spark.createDataFrame(
            list(words.items()), "word string, freq long"
        )
        got = [
            (r.step, r.merge_left, r.merge_right, int(r.pair_count))
            for r in learn_bpe_merges(spark, df, n_merges=4).orderBy("step").collect()
        ]
        assert got == expected

    run()


def test_wordpiece_prefers_surprising_pair(spark):
    from tlcn_oer_lakehouse_spark.queries.bpe import learn_wordpiece_merges

    # vocab: "ab" x4, "cb" x1, "c" x3 -> symbol counts a:4, b:5, c:4
    # step 1: score(a,b) = 4/(4*5) = 0.2 ; score(c,b) = 1/(4*5) = 0.05
    #   -> (a,b) wins.  After merge: ab:4 (fused), [c,b]:1, [c]:3
    #   symbol counts ab:4, c:4, b:1
    # step 2: only pair (c,b): score = 1/(4*1) = 0.25
    words = spark.createDataFrame(
        [("ab", 4), ("cb", 1), ("c", 3)], "word string, freq long"
    )
    got = [
        (r.step, r.merge_left, r.merge_right, r.pair_count, r.score)
        for r in learn_wordpiece_merges(spark, words, n_merges=2)
        .orderBy("step")
        .collect()
    ]
    assert got == [(1, "a", "b", 4, 0.2), (2, "c", "b", 1, 0.25)]


def test_wordpiece_diverges_from_bpe_on_frequent_parts(spark):
    from tlcn_oer_lakehouse_spark.queries.bpe import learn_wordpiece_merges

    # BPE's raw count would pick (x,y) (count 10); WordPiece's
    # likelihood picks the rarer-but-exclusive (p,q):
    #   score(x,y) = 10/(20*20) = 0.025 < score(p,q) = 2/(2*2) = 0.5
    words = spark.createDataFrame(
        [("xy", 10), ("x", 10), ("y", 10), ("pq", 2)],
        "word string, freq long",
    )
    bpe_first = learn_bpe_merges(spark, words, n_merges=1).collect()[0]
    wp_first = learn_wordpiece_merges(spark, words, n_merges=1).collect()[0]
    assert (bpe_first.merge_left, bpe_first.merge_right) == ("x", "y")
    assert (wp_first.merge_left, wp_first.merge_right) == ("p", "q")


def test_bpe_no_mid_token_suffix_merge(spark):
    """Regression (found by hypothesis): with a suffix-only delimiter
    encoding, merging (b,b) in tokens [cb, b] wrongly fired INSIDE the
    'cb' token ('cb␟b␟' contains 'b␟b␟').  The STX-prefixed encoding
    anchors matches to token starts; this vocab must follow the
    sequential reference exactly."""
    words = {"b": 1, "a": 1, "bbb": 2, "cb": 5, "cbb": 1}
    expected = _reference_bpe(words, n_merges=4)
    df = spark.createDataFrame(list(words.items()), "word string, freq long")
    got = [
        (r.step, r.merge_left, r.merge_right, int(r.pair_count))
        for r in learn_bpe_merges(spark, df, n_merges=4).orderBy("step").collect()
    ]
    assert got == expected


def test_unigram_viterbi_matches_sequential_reference(spark, sf_dir):
    """Independent check: rebuild the unigram piece model in plain Python
    and run textbook Viterbi; the distributed DP must agree on every
    output word."""
    import re
    from collections import Counter

    import pandas as pd

    from tlcn_oer_lakehouse_spark.queries import bpe

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    freqs = Counter()
    for text in docs["text"]:
        for w in re.sub(r"\s+", " ", text.lower()).strip().split(" "):
            if len(w) <= bpe._UNI_MAXLEN:
                freqs[w] += 1
    piece_counts = Counter()
    for w, f in freqs.items():
        for i in range(len(w)):
            for l in range(1, bpe._UNI_PIECE_L + 1):
                if i + l <= len(w):
                    piece_counts[w[i:i + l]] += f
    singles = {p: c for p, c in piece_counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in piece_counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: bpe._UNI_TOPK]
    vocab = dict(multi) | singles
    total = sum(vocab.values())
    bits = {p: (total // c).bit_length() - 1 for p, c in vocab.items()}

    def viterbi(w):
        best = [0] + [None] * len(w)
        for i in range(1, len(w) + 1):
            opts = [
                best[i - l] + bits[w[i - l:i]]
                for l in range(1, min(bpe._UNI_PIECE_L, i) + 1)
                if best[i - l] is not None and w[i - l:i] in bits
            ]
            best[i] = min(opts) if opts else None
        return best[len(w)]

    rows = bpe.unigram_viterbi_segment(spark, sf_dir).collect()
    assert rows, "no output words"
    for r in rows:
        assert r["freq"] == freqs[r["word"]]
        assert r["min_bits"] == viterbi(r["word"]), r["word"]


def test_delta_trainer_identical_to_full_reaggregate(spark):
    """The delta-maintained trainer must produce the EXACT merge list
    and final vocab of the full re-aggregate trainer, at a merge depth
    (10) past the registered query's 6 — equivalence is the whole claim
    behind swapping it in at 32k merges."""
    from tlcn_oer_lakehouse_spark.queries import bpe

    words = {
        "lower": 5, "lowest": 3, "newer": 6, "newest": 2, "wider": 4,
        "low": 7, "new": 9, "widest": 1, "renew": 2, "slower": 3,
    }
    df = spark.createDataFrame(list(words.items()), "word string, freq long")
    full_merges, full_vocab = bpe._train(spark, df, 10)
    delta_merges, delta_vocab = bpe._train_delta(spark, df, 10)
    assert delta_merges == full_merges
    fv = {r.word: r.enc for r in full_vocab.collect()}
    dv = {r.word: r.enc for r in delta_vocab.collect()}
    assert dv == fv  # byte-identical final encodings


def test_delta_trainer_maintained_counts_match_reaggregate(spark):
    """After every merge the maintained count table equals a fresh
    full re-aggregate over the current vocab — the invariant that makes
    the incremental argmax sound."""
    from pyspark.sql import functions as F

    from tlcn_oer_lakehouse_spark.queries import bpe

    words = {"abab": 3, "aba": 2, "bab": 4, "aabb": 1}
    df = spark.createDataFrame(list(words.items()), "word string, freq long")
    vocab = df.select("word", "freq", bpe._enc0_expr().alias("enc"))
    counts = bpe._adjacent_pair_counts(vocab)
    for step in range(3):
        best = (counts.filter(F.col("cnt") > 0)
                .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
                .limit(1).collect())[0]
        pat, rep = bpe._merge_pattern(best.l, best.r)
        affected = vocab.filter(F.col("enc").contains(pat))
        re_enc = affected.withColumn(
            "enc", F.replace(F.col("enc"), F.lit(pat), F.lit(rep)))
        delta = (bpe._adjacent_pair_counts(affected)
                 .select("l", "r", (-F.col("cnt")).alias("cnt"))
                 .unionByName(bpe._adjacent_pair_counts(re_enc)))
        counts = (counts.unionByName(delta).groupBy("l", "r")
                  .agg(F.sum("cnt").alias("cnt"))
                  .filter(F.col("cnt") != 0).localCheckpoint())
        vocab = (vocab.filter(~F.col("enc").contains(pat))
                 .unionByName(re_enc).localCheckpoint())
        fresh = {(r.l, r.r): r.cnt
                 for r in bpe._adjacent_pair_counts(vocab).collect()}
        maintained = {(r.l, r.r): r.cnt for r in counts.collect()}
        assert maintained == fresh, f"divergence after merge {step + 1}"
