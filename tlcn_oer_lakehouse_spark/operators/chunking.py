"""Chunking operators — the UDTF-like 1-row→N-rows layer (SURVEY §2.8
U5-U9), re-expressed as pure column expressions + ``posexplode`` instead
of the reference's per-row Python loops inside RDD ``mapPartitions``
(transformer.py:711-794 smart chunker, :895-1119 hierarchical chunker,
summarizer.py:25-157 extractive summarizer).

Design: every operator here is an array-expression pipeline — tokenize →
build an array of chunk structs → ``posexplode`` — so chunk production
runs inside whole-stage codegen at scan speed with ZERO shuffle.  The
only shuffles in this module are (a) the pack-chunker's re-assembly
groupBy (keyed by (doc, chunk_no) — co-partitioned with the doc key) and
(b) the summarizer's corpus-IDF broadcast agg.  At 100 TB both scale
linearly; there is no driver involvement and no Python worker boundary.

Chunk ids are content-addressed (md5 over doc id, tier, order and a text
prefix), mirroring the reference's sha256 content addressing
(transformer.py:861, :1069) so re-runs are idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.functions.text import tokens


def _chunk_id(*parts: Column) -> Column:
    return F.md5(F.concat_ws("||", *parts))


def token_window_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
    stride: int = 40,
) -> DataFrame:
    """U6 sliding-window chunker: windows of ``window`` tokens every
    ``stride`` tokens (trailing partial window included).  One output row
    per chunk with a content-addressed chunk_id.

    Starts run to ``n`` (not ``n - window + 1``) and are then pruned to
    those adding new tokens: bounding at ``n - window + 1`` silently
    drops the trailing ``(n - window) % stride`` tokens (e.g. n=100,
    w=50, s=40 loses tokens 91-100).  The keep-condition — the previous
    window did not already reach the end — only ever removes a suffix of
    the start list, so chunk_order stays dense from 0.

    The tokenize (regex normalize + split) is STAGED into its own
    projection: inlined, the generator expression references it three
    times (length bound, start filter, window slice) and GenerateExec
    does not common-subexpression-eliminate across them — the r11 probe
    measured the staged form 1.7× faster at sf0.1 (min-of-5,
    1.18 s → 0.69 s)."""
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    starts_all = F.sequence(F.lit(1), F.greatest(F.lit(1), n), F.lit(stride))
    starts = F.filter(
        starts_all,
        lambda s: (s == 1) | (s - stride + window - 1 < n),
    )
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s, window)))
    out = staged.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_order", "chunk_text")
    )
    return out.select(
        id_col,
        "chunk_order",
        "chunk_text",
        F.size(F.split(F.col("chunk_text"), " ")).alias("chunk_tokens"),
        _chunk_id(
            F.col(id_col).cast("string"),
            F.col("chunk_order").cast("string"),
            F.substring(F.col("chunk_text"), 1, 16),
        ).alias("chunk_id"),
    )


def char_budget_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_chars: int = 240,
) -> DataFrame:
    """U6 paragraph-packing analog: tokens are packed into chunks by
    cumulative character budget — token t goes to chunk
    ``floor(chars_before_t / max_chars)``.  Deterministic, order
    preserving, and engine-portable (a window cumulative sum on both
    sides), unlike greedy packing whose output depends on sequential
    iteration.

    Re-assembly sorts each chunk's (pos, token) structs — collect_list
    order is nondeterministic under parallel merge, the struct sort makes
    it exact."""
    pos_tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.length("tok") + 1).over(w) - (F.length("tok") + 1)
    assigned = pos_tok.withColumn("chunk_no", F.floor(cum / max_chars))
    packed = assigned.groupBy(id_col, "chunk_no").agg(
        F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("ordered")
    )
    chunk_text = F.concat_ws(
        " ", F.transform(F.col("ordered"), lambda s: s.getField("tok"))
    )
    return packed.select(
        id_col,
        "chunk_no",
        chunk_text.alias("chunk_text"),
        F.size("ordered").alias("chunk_tokens"),
        F.length(chunk_text).alias("chunk_chars"),
    )


def hierarchical_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chapter_tokens: int = 100,
    section_tokens: int = 50,
    summary_tokens: int = 30,
    chapter_summary_tokens: int = 10,
) -> DataFrame:
    """U7 hierarchical 3-tier chunker (transformer.py:895-1119,
    HIERARCHICAL_CHUNKING_DESIGN.md:82-127), with fixed-size "chapters"
    standing in for TOC-derived ones (the synthetic corpus has no TOC;
    the tier/parent/link semantics are identical):

    - tier 1 ``doc_summary``     — 1 row/doc, first ``summary_tokens``.
    - tier 2 ``chapter_summary`` — 1 row/chapter (consecutive
      ``chapter_tokens``-token groups), first ``chapter_summary_tokens``
      of the chapter, parent → tier 1.
    - tier 3 ``section_detail``  — ``section_tokens``-token windows
      inside each chapter, parent → the enclosing tier-2 chunk.

    Emitted as ONE array-of-structs expression per doc → posexplode: the
    multi-output tagged-RDD design of the reference becomes a single
    typed column, split downstream by ``chunk_tier`` filters.

    The tokenize is STAGED into its own projection (same rationale as
    :func:`token_window_chunks`): the three-tier generator expression
    references the token array once per tier-2/tier-3 slice and
    GenerateExec does not CSE across them."""
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    doc_id_s = F.col(id_col).cast("string")

    t1_text = F.concat_ws(" ", F.slice(toks, 1, summary_tokens))
    t1_id = _chunk_id(doc_id_s, F.lit("1"), F.lit("0"), F.substring(t1_text, 1, 16))

    def chapter_start(c: Column) -> Column:
        return (c - 1) * chapter_tokens + 1

    n_chapters = F.greatest(F.lit(1), F.ceil(n / F.lit(chapter_tokens)))
    chapters = F.sequence(F.lit(1), n_chapters)

    def t2_struct(c: Column) -> Column:
        text = F.concat_ws(
            " ", F.slice(toks, chapter_start(c), chapter_summary_tokens)
        )
        return F.struct(
            F.lit(2).alias("chunk_tier"),
            F.lit("chapter_summary").alias("chunk_type"),
            c.cast("int").alias("chapter_number"),
            F.lit(0).alias("chunk_order"),
            text.alias("chunk_text"),
            _chunk_id(
                doc_id_s, F.lit("2"), c.cast("string"), F.substring(text, 1, 16)
            ).alias("chunk_id"),
            t1_id.alias("parent_chunk_id"),
        )

    def t3_structs(c: Column) -> Column:
        c_start = chapter_start(c)
        c_len = F.least(n - c_start + 1, F.lit(chapter_tokens))
        n_sections = F.greatest(F.lit(1), F.ceil(c_len / F.lit(section_tokens)))
        secs = F.sequence(F.lit(1), n_sections)
        t2_id = _chunk_id(
            doc_id_s,
            F.lit("2"),
            c.cast("string"),
            F.substring(
                F.concat_ws(
                    " ", F.slice(toks, c_start, chapter_summary_tokens)
                ),
                1,
                16,
            ),
        )

        def sec_struct(s: Column) -> Column:
            text = F.concat_ws(
                " ",
                F.slice(
                    toks,
                    c_start + (s - 1) * section_tokens,
                    section_tokens,
                ),
            )
            return F.struct(
                F.lit(3).alias("chunk_tier"),
                F.lit("section_detail").alias("chunk_type"),
                c.cast("int").alias("chapter_number"),
                s.cast("int").alias("chunk_order"),
                text.alias("chunk_text"),
                _chunk_id(
                    doc_id_s,
                    F.lit("3"),
                    c.cast("string"),
                    s.cast("string"),
                    F.substring(text, 1, 16),
                ).alias("chunk_id"),
                t2_id.alias("parent_chunk_id"),
            )

        return F.transform(secs, sec_struct)

    t1 = F.array(
        F.struct(
            F.lit(1).alias("chunk_tier"),
            F.lit("doc_summary").alias("chunk_type"),
            F.lit(0).alias("chapter_number"),
            F.lit(0).alias("chunk_order"),
            t1_text.alias("chunk_text"),
            t1_id.alias("chunk_id"),
            F.lit(None).cast("string").alias("parent_chunk_id"),
        )
    )
    t2 = F.transform(chapters, t2_struct)
    t3 = F.flatten(F.transform(chapters, t3_structs))
    all_chunks = F.concat(t1, t2, t3)

    exploded = staged.select(F.col(id_col), F.explode(all_chunks).alias("c"))
    return exploded.select(
        id_col,
        F.col("c.chunk_tier").alias("chunk_tier"),
        F.col("c.chunk_type").alias("chunk_type"),
        F.col("c.chapter_number").alias("chapter_number"),
        F.col("c.chunk_order").alias("chunk_order"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.parent_chunk_id").alias("parent_chunk_id"),
    )


def extractive_summary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    segment_tokens: int = 20,
    top_k: int = 3,
) -> DataFrame:
    """U9 extractive summarizer (summarizer.py:25-157): split into
    segments (pseudo-sentences of ``segment_tokens`` tokens — the
    synthetic corpus has no sentence punctuation), score each segment by
    mean corpus IDF of its tokens (the TF-IDF sentence-scoring analog),
    keep the top ``top_k`` segments re-joined in original order.

    IDF comes from a corpus-level doc-frequency aggregate joined back by
    token — the small side (vocabulary) broadcasts.

    The tokenize is STAGED per branch (segment explode, DF aggregate) —
    same GenerateExec-CSE rationale as :func:`token_window_chunks`."""
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), n), F.lit(segment_tokens))
    segs = staged.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts, lambda s: F.concat_ws(" ", F.slice(toks, s, segment_tokens))
            )
        ).alias("seg_no", "seg_text"),
    ).filter(F.col("seg_text") != "")

    n_docs_df = df.select(F.count(F.lit(1)).alias("n_docs"))
    doc_freq = (
        staged.select(F.col(id_col), F.explode(F.array_distinct(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "tok",
            # EXACT-INTEGER scoring (r11 — the sf10 sweep caught a 1-ulp
            # round(double, 9) half-boundary divergence): ln() is pinned
            # ONCE at pico (1e-12) resolution into a BIGINT, and every
            # downstream mean/round/sum/rank runs in integer arithmetic;
            # ln ≤ ~13.2 ⇒ idf_pico ≤ 1.4e13, a 20-token segment sum
            # ≤ 2.7e14 — far under 2⁶³.  (The old path rounded a double
            # quotient at 9 dp; DuckDB rounds doubles via ×10⁹ float
            # arithmetic, so an exact-half quotient could flip.)
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("df").cast("double") + 1.0))
                * F.lit(1e12)
            ).cast("long").alias("idf_pico"),
        )
    )

    seg_toks = segs.select(
        id_col, "seg_no", "seg_text", F.explode(F.split("seg_text", " ")).alias("tok")
    )
    # mean IDF at 9 dp as integer half-up ceil-division: score_e9 =
    # ⌊(2·Σpico + 1000·c) / (2000·c)⌋ — exact, partition-order free
    scored = (
        seg_toks.join(F.broadcast(doc_freq), "tok", "left")
        .groupBy(id_col, "seg_no", "seg_text")
        .agg(
            F.sum(F.coalesce(F.col("idf_pico"), F.lit(0))).alias("sum_pico"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            id_col, "seg_no", "seg_text",
            F.expr("(2 * sum_pico + 1000 * c) div (2000 * c)").alias("score_e9"),
        )
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.col("score_e9").desc(), F.col("seg_no").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= top_k
    )
    return top.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_no", "seg_text"))),
                lambda s: s.getField("seg_text"),
            ),
        ).alias("summary"),
        # ONE final double division of an exact BIGINT — identical IEEE
        # result on every engine
        (F.sum("score_e9").cast("double") / F.lit(1e9)).alias("score_sum"),
        F.count(F.lit(1)).alias("n_segments"),
    )
