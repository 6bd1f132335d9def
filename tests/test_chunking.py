"""Hierarchical-chunking invariants — the tests the reference designed
but never wrote (HIERARCHICAL_CHUNKING_DESIGN.md:906-1003 via SURVEY §5):
exactly one tier-1 chunk per doc, tier-3 count ≥ tier-2 count, every
parent_chunk_id resolves, chunk ids are content-addressed and stable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.chunking import (
    char_budget_chunks,
    hierarchical_chunks,
    token_window_chunks,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def hier(docs):
    return hierarchical_chunks(docs, "doc_id", "text").persist()


def test_exactly_one_tier1_per_doc(docs, hier):
    n_docs = docs.count()
    t1 = hier.filter(F.col("chunk_tier") == 1)
    assert t1.count() == n_docs
    assert t1.select("doc_id").distinct().count() == n_docs


def test_tier3_at_least_tier2(hier):
    t2 = hier.filter(F.col("chunk_tier") == 2).count()
    t3 = hier.filter(F.col("chunk_tier") == 3).count()
    assert t3 >= t2 > 0


def test_parent_links_resolve(hier):
    children = hier.filter(F.col("chunk_tier").isin(2, 3)).select(
        "parent_chunk_id"
    )
    parents = hier.select(F.col("chunk_id").alias("parent_chunk_id"))
    orphans = children.join(parents, "parent_chunk_id", "left_anti")
    assert orphans.count() == 0


def test_tier1_has_no_parent(hier):
    assert (
        hier.filter((F.col("chunk_tier") == 1) & F.col("parent_chunk_id").isNotNull()).count()
        == 0
    )


def test_chunk_ids_unique_and_stable(docs, hier):
    total = hier.count()
    assert hier.select("chunk_id").distinct().count() == total
    # content-addressed: a second run yields the identical id set
    again = hierarchical_chunks(docs, "doc_id", "text")
    assert again.select("chunk_id").subtract(hier.select("chunk_id")).count() == 0


def test_token_windows_cover_all_tokens(docs):
    """Window/stride 50/40: the union of windows must cover EVERY token —
    the last window's end (start + chunk_tokens - 1, start = order*40+1)
    reaches exactly the final token of each doc."""
    from tlcn_oer_lakehouse_spark.functions.text import tokens

    chunks = token_window_chunks(docs, "doc_id", "text", window=50, stride=40)
    ends = chunks.groupBy("doc_id").agg(
        F.max(F.col("chunk_order") * 40 + F.col("chunk_tokens")).alias("covered")
    )
    lens = docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))
    bad = ends.join(lens, "doc_id").filter(F.col("covered") != F.col("n_tok"))
    assert bad.count() == 0


def test_token_windows_trailing_partial(spark):
    """n=100, w=50, s=40 (the ADVICE r01 case): tokens 91-100 must be
    chunked — three windows [1-50] [41-90] [81-100], the last partial."""
    text = " ".join(f"t{i}" for i in range(1, 101))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        token_window_chunks(df, "doc_id", "text", window=50, stride=40).collect(),
        key=lambda r: r.chunk_order,
    )
    assert [r.chunk_tokens for r in rows] == [50, 50, 20]
    assert rows[-1].chunk_text.split(" ")[-1] == "t100"
    assert rows[-1].chunk_text.split(" ")[0] == "t81"

    # no redundant trailing window when the tail is already covered
    df90 = spark.createDataFrame(
        [(2, " ".join(f"t{i}" for i in range(1, 91)))], "doc_id long, text string"
    )
    rows90 = token_window_chunks(df90, "doc_id", "text", window=50, stride=40).collect()
    assert sorted(r.chunk_tokens for r in rows90) == [50, 50]


def test_char_budget_reassembles_text(docs):
    """Concatenating chunks in order reproduces the normalized text."""
    from tlcn_oer_lakehouse_spark.functions.text import normalize_text

    chunks = char_budget_chunks(docs, "doc_id", "text", max_chars=240)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_no", "chunk_text"))),
                    lambda s: s.getField("chunk_text"),
                ),
            ).alias("rebuilt")
        )
    )
    orig = docs.select("doc_id", normalize_text(F.col("text")).alias("norm"))
    mismatch = rebuilt.join(orig, "doc_id").filter(F.col("rebuilt") != F.col("norm"))
    assert mismatch.count() == 0


def test_udtf_matches_vectorized_operator(spark):
    """The SQL-surface UDTF (functions/udtfs.py) and the vectorized
    operator share one contract — including the trailing partial
    window (n - window not divisible by stride)."""
    from tlcn_oer_lakehouse_spark.functions.udtfs import register_udtfs
    from tlcn_oer_lakehouse_spark.operators.chunking import token_window_chunks

    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),   # 100 tokens: tail 91-100
        (2, "one two three"),                          # shorter than window
        (3, "  Mixed   CASE\t\twhitespace  "),         # normalization
        (4, " ".join(f"w{i}" for i in range(50))),     # exactly one window
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    register_udtfs(spark)
    df.createOrReplaceTempView("_udtf_parity_docs")
    got_udtf = sorted(
        (r.doc_id, r.chunk_order, r.chunk_text, r.chunk_tokens)
        for r in spark.sql(
            "SELECT d.doc_id, c.* FROM _udtf_parity_docs d, "
            "LATERAL chunk_text(d.text, 50, 40) c"
        ).collect()
    )
    got_op = sorted(
        (r.doc_id, r.chunk_order, r.chunk_text, r.chunk_tokens)
        for r in token_window_chunks(df, "doc_id", "text", 50, 40)
        .drop("chunk_id")
        .collect()
    )
    assert got_udtf == got_op
    # the 100-token doc must keep its tail: 3 chunks, last covering 81-100
    doc1 = [g for g in got_udtf if g[0] == 1]
    assert len(doc1) == 3 and doc1[-1][3] == 20
