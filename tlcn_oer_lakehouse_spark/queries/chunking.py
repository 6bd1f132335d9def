"""Chunking + summarization queries (SURVEY §2.8 U5-U9) over the
``documents`` table, each hash-verified against a DuckDB oracle that
replicates the same array/window algebra.

The reference implemented these as per-row Python inside RDD
mapPartitions; here they are whole-stage-codegen array expressions (see
operators/chunking.py for the scale rationale)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tlcn_oer_lakehouse_spark.operators.chunking import (
    char_budget_chunks,
    extractive_summary,
    hierarchical_chunks,
    token_window_chunks,
)
from tlcn_oer_lakehouse_spark.queries.base import QuerySpec, load

NORM_TK = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"


def chunk_token_windows(spark: SparkSession, sf: str) -> DataFrame:
    return token_window_chunks(
        load(spark, sf, "documents"), "doc_id", "text", window=50, stride=40
    )


TOKEN_WINDOWS_SQL = f"""
WITH toks AS (SELECT doc_id, {NORM_TK} AS tk FROM documents),
wins AS (
  SELECT doc_id, s,
         CAST((s - 1) / 40 AS INT) AS chunk_order,
         array_to_string(tk[s:s+49], ' ') AS chunk_text
  FROM (SELECT doc_id, tk, unnest(generate_series(1, greatest(1, len(tk)), 40)) AS s
        FROM toks)
  WHERE s = 1 OR s - 40 + 50 - 1 < len(tk)
)
SELECT doc_id, chunk_order, chunk_text,
       len(string_split(chunk_text, ' ')) AS chunk_tokens,
       md5(concat_ws('||', CAST(doc_id AS VARCHAR), CAST(chunk_order AS VARCHAR),
                     substring(chunk_text, 1, 16))) AS chunk_id
FROM wins
"""


def chunk_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL-surface chunker: the same 50/40 sliding-window semantics
    as ``chunk_token_windows``, invoked as a table function in a
    ``LATERAL`` join (``chunk_text(text, 50, 40)``) — the custom
    extension SURVEY §4 names as the one worth building.  Arrow-batched
    Python UDTF (functions/udtfs.py); the vectorized column-expression
    operator remains the production path — this query proves the SQL
    API surface against the same oracle."""
    from tlcn_oer_lakehouse_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load(spark, sf, "documents").createOrReplaceTempView("_chunk_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_order, c.chunk_text, c.chunk_tokens
        FROM _chunk_udtf_docs d, LATERAL chunk_text(d.text, 50, 40) c
        """
    )


CHUNK_UDTF_SQL = f"""
WITH toks AS (SELECT doc_id, {NORM_TK} AS tk FROM documents),
wins AS (
  SELECT doc_id,
         CAST((s - 1) / 40 AS INT) AS chunk_order,
         array_to_string(tk[s:s+49], ' ') AS chunk_text
  FROM (SELECT doc_id, tk, unnest(generate_series(1, greatest(1, len(tk)), 40)) AS s
        FROM toks)
  WHERE s = 1 OR s - 40 + 50 - 1 < len(tk)
)
SELECT doc_id, chunk_order, chunk_text,
       len(string_split(chunk_text, ' ')) AS chunk_tokens
FROM wins
"""


def chunk_char_budget(spark: SparkSession, sf: str) -> DataFrame:
    return char_budget_chunks(
        load(spark, sf, "documents"), "doc_id", "text", max_chars=240
    )


CHAR_BUDGET_SQL = f"""
WITH toks AS (SELECT doc_id, {NORM_TK} AS tk FROM documents),
pos_tok AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS tok
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM toks)
),
assigned AS (
  SELECT doc_id, pos, tok,
         CAST(floor((SUM(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - (length(tok) + 1)) / 240) AS BIGINT) AS chunk_no
  FROM pos_tok
)
SELECT doc_id, chunk_no,
       array_to_string(array_agg(tok ORDER BY pos), ' ') AS chunk_text,
       COUNT(*) AS chunk_tokens,
       length(array_to_string(array_agg(tok ORDER BY pos), ' ')) AS chunk_chars
FROM assigned
GROUP BY doc_id, chunk_no
"""


def chunk_hierarchical(spark: SparkSession, sf: str) -> DataFrame:
    return hierarchical_chunks(load(spark, sf, "documents"), "doc_id", "text")


# Shared DuckDB core for the 3-tier chunk set: the CTE chain ends in a
# `chunks` relation with the exact columns hierarchical_chunks emits.
# Reused by queries/serve.py (tiered search drills into the same set).
HIER_CHUNKS_SQL_CORE = f"""
toks AS (SELECT doc_id, {NORM_TK} AS tk, len({NORM_TK}) AS n FROM documents),
t1 AS (
  SELECT doc_id,
         array_to_string(tk[1:30], ' ') AS t1_text,
         md5(concat_ws('||', CAST(doc_id AS VARCHAR), '1', '0',
                       substring(array_to_string(tk[1:30], ' '), 1, 16))) AS t1_id
  FROM toks
),
chapters AS (
  SELECT t.doc_id, t.tk, t.n, unnest(generate_series(1, greatest(1, CAST(ceil(t.n / 100.0) AS BIGINT)))) AS c
  FROM toks t
),
t2 AS (
  SELECT doc_id, c,
         array_to_string(tk[(c-1)*100+1:(c-1)*100+10], ' ') AS t2_text,
         md5(concat_ws('||', CAST(doc_id AS VARCHAR), '2', CAST(c AS VARCHAR),
                       substring(array_to_string(tk[(c-1)*100+1:(c-1)*100+10], ' '), 1, 16))) AS t2_id
  FROM chapters
),
sections AS (
  SELECT ch.doc_id, ch.tk, ch.n, ch.c,
         unnest(generate_series(1, greatest(1, CAST(ceil(least(ch.n - ((ch.c-1)*100+1) + 1, 100) / 50.0) AS BIGINT)))) AS s
  FROM chapters ch
),
t3 AS (
  SELECT doc_id, c, s,
         array_to_string(tk[(c-1)*100 + (s-1)*50 + 1:(c-1)*100 + (s-1)*50 + 50], ' ') AS t3_text
  FROM sections
),
chunks AS (
SELECT doc_id, 1 AS chunk_tier, 'doc_summary' AS chunk_type,
       0 AS chapter_number, 0 AS chunk_order, t1_text AS chunk_text,
       t1_id AS chunk_id, CAST(NULL AS VARCHAR) AS parent_chunk_id
FROM t1
UNION ALL
SELECT t2.doc_id, 2, 'chapter_summary', CAST(t2.c AS INT), 0, t2.t2_text, t2.t2_id, t1.t1_id
FROM t2 JOIN t1 ON t2.doc_id = t1.doc_id
UNION ALL
SELECT t3.doc_id, 3, 'section_detail', CAST(t3.c AS INT), CAST(t3.s AS INT), t3.t3_text,
       md5(concat_ws('||', CAST(t3.doc_id AS VARCHAR), '3', CAST(t3.c AS VARCHAR),
                     CAST(t3.s AS VARCHAR), substring(t3.t3_text, 1, 16))),
       t2.t2_id
FROM t3 JOIN t2 ON t3.doc_id = t2.doc_id AND t3.c = t2.c
)"""

HIERARCHICAL_SQL = f"""
WITH {HIER_CHUNKS_SQL_CORE.strip()}
SELECT doc_id, chunk_tier, chunk_type, chapter_number, chunk_order,
       chunk_text, chunk_id, parent_chunk_id
FROM chunks
"""


def summarize_extractive(spark: SparkSession, sf: str) -> DataFrame:
    return extractive_summary(
        load(spark, sf, "documents"), "doc_id", "text", segment_tokens=20, top_k=3
    )


SUMMARY_SQL = f"""
WITH toks AS (SELECT doc_id, {NORM_TK} AS tk FROM documents),
n_docs AS (SELECT COUNT(*) AS n_docs FROM documents),
doc_freq AS (
  -- EXACT-INTEGER scoring (r11): ln() pinned once at pico resolution
  -- into a BIGINT; everything downstream is integer arithmetic, so no
  -- engine's float round() can flip a 9-dp half boundary (the old
  -- round(double, 9) path diverged by 1 ulp at sf10)
  SELECT tok, CAST(round(ln((n_docs + 1.0) / (COUNT(*) + 1.0)) * 1e12) AS BIGINT) AS idf_pico
  FROM (SELECT DISTINCT doc_id, unnest(list_distinct(tk)) AS tok FROM toks), n_docs
  GROUP BY tok, n_docs
),
segs AS (
  SELECT doc_id,
         CAST((s - 1) / 20 AS INT) AS seg_no,
         array_to_string(tk[s:s+19], ' ') AS seg_text
  FROM (SELECT doc_id, tk, unnest(generate_series(1, greatest(1, len(tk)), 20)) AS s
        FROM toks)
  WHERE array_to_string(tk[s:s+19], ' ') != ''
),
seg_toks AS (
  SELECT doc_id, seg_no, seg_text, unnest(string_split(seg_text, ' ')) AS tok
  FROM segs
),
scored AS (
  -- mean IDF at 9 dp as integer half-up ceil-division, exact on both engines
  SELECT st.doc_id, st.seg_no, st.seg_text,
         (2 * CAST(SUM(coalesce(df.idf_pico, 0)) AS BIGINT) + 1000 * COUNT(*))
           // (2000 * COUNT(*)) AS score_e9
  FROM seg_toks st LEFT JOIN doc_freq df ON st.tok = df.tok
  GROUP BY st.doc_id, st.seg_no, st.seg_text
),
ranked AS (
  SELECT doc_id, seg_no, seg_text, score_e9,
         row_number() OVER (PARTITION BY doc_id ORDER BY score_e9 DESC, seg_no ASC) AS rank
  FROM scored
)
SELECT doc_id,
       array_to_string(array_agg(seg_text ORDER BY seg_no), ' ') AS summary,
       CAST(SUM(score_e9) AS DOUBLE) / 1e9 AS score_sum,
       COUNT(*) AS n_segments
FROM ranked
WHERE rank <= 3
GROUP BY doc_id
"""


SPECS = [
    QuerySpec("chunk_token_windows", chunk_token_windows, TOKEN_WINDOWS_SQL,
              ref="transformer.py:711-794 (U6 sliding-window chunker)",
              doc="50-token windows, stride 40, content-addressed ids",
              tags=("chunking", "bench")),
    QuerySpec("chunk_udtf", chunk_udtf, CHUNK_UDTF_SQL,
              ref="SURVEY §4: table-valued chunk_text() UDTF (SQL surface); "
                  "Arrow-batched, semantics shared with token_window_chunks",
              doc="LATERAL chunk_text(text, 50, 40) via Python UDTF",
              tags=("chunking", "udtf")),
    QuerySpec("chunk_char_budget", chunk_char_budget, CHAR_BUDGET_SQL,
              ref="transformer.py:711-794 (U6 paragraph packing → char-budget variant)",
              doc="cumulative char-budget packing (240 chars)", tags=("chunking",)),
    QuerySpec("chunk_hierarchical", chunk_hierarchical, HIERARCHICAL_SQL,
              ref="transformer.py:895-1119 (U7 3-tier chunker), HIERARCHICAL_CHUNKING_DESIGN.md:82-127",
              doc="tier-1/2/3 chunks with parent links", tags=("chunking",)),
    QuerySpec("summarize_extractive", summarize_extractive, SUMMARY_SQL,
              ref="summarizer.py:25-157 (U9 TF-IDF extractive summarizer)",
              doc="IDF-scored top-3 segments per doc, original order", tags=("chunking",)),
]
