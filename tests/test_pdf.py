"""PDF codec + TOC cascade tests (U5/U8).

Covers: writer→parser round trip on real PDF bytes (both stream
encodings), normalization semantics (transformer.py:689-696), each of
the four cascade methods (toc_extractor.py:49-97), validation rejection
(:335-348), printed-TOC page-offset estimation (:302-328), per-asset
decode error isolation, and the hierarchical chunker fed end-to-end from
extracted PDF pages.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.functions.pdfio import (
    normalize_pdf_text,
    read_pdf,
    write_pdf,
)
from tlcn_oer_lakehouse_spark.operators.toc import extract_toc, validate_toc

PAGES = [
    ["Chapter 1 Introduction", "hello world (with) \\ parens", "line three"],
    ["page two text", "1.1 Section here"],
    ["Chapter 2 Methods", "more text"],
]


@pytest.mark.parametrize("compress", [False, True])
def test_pdf_round_trip(compress):
    data = write_pdf(PAGES, compress=compress)
    assert data.startswith(b"%PDF") and data.rstrip().endswith(b"%%EOF")
    texts, outline = read_pdf(data)
    assert texts == ["\n".join(p) for p in PAGES]
    assert outline == []


def test_pdf_outline_round_trip():
    ol = [(0, "Chapter 1 Introduction", 1), (0, "Chapter 2 Methods", 3)]
    texts, outline = read_pdf(write_pdf(PAGES, outline=ol, compress=True))
    assert outline == [("Chapter 1 Introduction", 1), ("Chapter 2 Methods", 3)]
    assert len(texts) == 3


def test_normalize_pdf_text():
    # de-hyphenation across line breaks, CR normalization, space collapse,
    # blank-line squeeze — transformer.py:689-696 semantics
    assert normalize_pdf_text("experi-\nment  runs\r\n\n\n\nnow") == "experiment runs\n\nnow"
    assert normalize_pdf_text("  a\tb  ") == "a b"
    assert normalize_pdf_text("") == ""


def test_read_pdf_rejects_non_pdf():
    with pytest.raises(ValueError):
        read_pdf(b"not a pdf at all")


# ---------------------------------------------------------------------------
# cascade methods
# ---------------------------------------------------------------------------


def test_toc_method_outline():
    pages = {1: "body", 2: "body", 3: "body", 4: "body"}
    outline = [("Chapter 1 Intro", 1), ("1.1 Background", 2), ("Chapter 2 Core", 3)]
    r = extract_toc(pages, outline, 4)
    assert r["method"] == "pdf_outline" and r["confidence"] == 0.95
    chs = r["toc"]
    assert [c["chapter_title"] for c in chs] == ["Chapter 1 Intro", "Chapter 2 Core"]
    assert chs[0]["sections"][0]["section_title"] == "1.1 Background"
    assert chs[0]["page_end"] == 2 and chs[1]["page_end"] == 4


def test_toc_method_toc_page_with_offset():
    # printed TOC says chapters start at logical 2 and 4; body headings
    # physically sit on pages 3 and 5 -> offset +1 via title-token match
    # (4-token titles need >=3 matching tokens, so only the true heading
    # pages anchor; the TOC page itself is excluded from the scan)
    pages = {
        1: "Table of Contents\nChapter 1 Alphago Zero Intro .... 2\n"
           "Chapter 2 Betamax Tape Deck .... 4",
        2: "front matter",
        3: "Chapter 1 Alphago Zero Intro\nbody",
        4: "body",
        5: "Chapter 2 Betamax Tape Deck\nbody",
    }
    r = extract_toc(pages, None, 5)
    assert r["method"] == "toc_page" and r["confidence"] == 0.85
    assert [c["page_start"] for c in r["toc"]] == [3, 5]


def test_toc_method_regex():
    pages = {1: "intro text", 2: "Chapter 1 Start\nbody", 3: "body", 4: "Chapter 2 End\nbody"}
    r = extract_toc(pages, None, 4)
    assert r["method"] == "regex" and r["confidence"] == 0.70
    assert [(c["page_start"], c["page_end"]) for c in r["toc"]] == [(2, 3), (4, 4)]


def test_toc_method_flat_fallback():
    pages = {i: "plain body" for i in range(1, 121)}
    r = extract_toc(pages, None, 120, fallback_chapter_size=50)
    assert r["method"] == "flat" and r["confidence"] == 0.50
    assert [(c["page_start"], c["page_end"]) for c in r["toc"]] == [
        (1, 50), (51, 100), (101, 120)
    ]


def test_validation_rejects_non_monotone_outline():
    # outline pages out of order -> invalid -> cascade falls through to
    # regex (which finds nothing) -> flat
    pages = {1: "body", 2: "body", 3: "body"}
    outline = [("Chapter 2 Later", 3), ("Chapter 1 Earlier", 1)]
    r = extract_toc(pages, outline, 3)
    assert r["method"] == "flat"
    assert not validate_toc(
        [{"page_start": 3}, {"page_start": 1}], 3
    )
    assert not validate_toc([], 3)
    assert not validate_toc([{"page_start": 99}], 3)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_pdf_decode_error_isolation(spark):
    """A corrupt payload yields an error row, not a task failure."""
    from tlcn_oer_lakehouse_spark.operators.multimodal import pdf_page_texts

    good = write_pdf([["hello page"]])
    rows = (
        pdf_page_texts(
            spark.createDataFrame(
                [(1, good), (2, b"garbage bytes")], "doc_id long, payload binary"
            )
        )
        .orderBy("doc_id", "page_no")
        .collect()
    )
    assert [(r.doc_id, r.page_no) for r in rows] == [(1, 1), (2, -1)]
    assert rows[0].page_text == "hello page" and rows[0].decode_status == "ok"
    assert rows[1].decode_status.startswith("ValueError")


def test_hierarchical_chunks_from_pdf(spark):
    """U5→U7 end-to-end: real PDF bytes → page extraction → document
    reassembly → hierarchical chunker, invariants intact."""
    from tlcn_oer_lakehouse_spark.operators.chunking import hierarchical_chunks
    from tlcn_oer_lakehouse_spark.operators.multimodal import pdf_page_texts

    texts = {
        7: " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(80)),
        8: " ".join(f"delta{i} word{i}" for i in range(60)),
    }
    # write_pdf expects pages as list-of-lines; one line per 30-token page
    payloads = [
        (doc_id, write_pdf([[" ".join(chunk)] for chunk in
                            [t.split(" ")[i : i + 30] for i in range(0, len(t.split(" ")), 30)]],
                           compress=True))
        for doc_id, t in texts.items()
    ]
    pdfs = spark.createDataFrame(payloads, "doc_id long, payload binary")
    pages = pdf_page_texts(pdfs)
    reassembled = (
        pages.filter(F.col("decode_status") == "ok")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("page_no", "page_text"))
                    ),
                    lambda s: s.getField("page_text"),
                ),
            ).alias("text")
        )
    )
    # extraction is lossless: reassembled text == source text
    got = {r.doc_id: r.text for r in reassembled.collect()}
    assert got == texts

    chunks = hierarchical_chunks(reassembled, "doc_id", "text")
    tiers = {r.chunk_tier for r in chunks.select("chunk_tier").distinct().collect()}
    assert tiers == {1, 2, 3}
    # every doc got exactly one tier-1 chunk
    t1 = chunks.filter(F.col("chunk_tier") == 1).groupBy("doc_id").count().collect()
    assert all(r["count"] == 1 for r in t1) and len(t1) == 2


def test_toc_page_parses_sections():
    """Printed-TOC section lines (1.1 / 1.2 ...) nest under their
    chapter with end pages filled from the next section's start."""
    pages = {
        1: "Contents\n"
           "Chapter 1 Foundations Overview Material .... 2\n"
           "1.1 Basic Definitions Here .... 2\n"
           "1.2 Advanced Topics Next .... 4\n"
           "Chapter 2 Applications Galore Today .... 5",
        2: "Chapter 1 Foundations Overview Material\n1.1 Basic Definitions Here",
        3: "body",
        4: "1.2 Advanced Topics Next",
        5: "Chapter 2 Applications Galore Today",
    }
    r = extract_toc(pages, None, 5)
    assert r["method"] == "toc_page"
    ch1, ch2 = r["toc"]
    secs = ch1["sections"]
    assert [s["section_number"] for s in secs] == ["1.1", "1.2"]
    assert [s["page_start"] for s in secs] == [2, 4]
    assert secs[0]["page_end"] == 3          # next section starts p4
    assert secs[1]["page_end"] == ch1["page_end"] == 4
    assert ch2["page_start"] == 5 and ch2["sections"] == []
