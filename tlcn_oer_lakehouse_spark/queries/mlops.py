"""ML-pipeline queries: lexical subject matching (U2) and distributed
embedding generation (U10) — the two model-flavored operators of the
reference's silver/serving path, oracle-verified via their deterministic
cores."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.embedding import embed_documents
from tlcn_oer_lakehouse_spark.operators.matching import (
    lexical_subject_match,
    top_ngram_subjects,
)
from tlcn_oer_lakehouse_spark.queries.base import QuerySpec, load

NORM_TK = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"


def match_subjects(spark: SparkSession, sf: str) -> DataFrame:
    """U2 pipeline: derive the subject dim (top-10 corpus 2-grams), then
    match every document to its top-3 subjects by 2-gram frequency."""
    docs = load(spark, sf, "documents")
    subjects = top_ngram_subjects(docs, "text", shingle_n=2, k=10)
    return lexical_subject_match(
        docs, subjects, shingle_n=2, threshold=0.0, top_k=3
    ).select("doc_id", "subject_id", "similarity", "match_rank")


MATCH_SQL = f"""
WITH toks AS (SELECT doc_id, {NORM_TK} AS tk FROM documents),
sh_all AS (
  SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS shingle
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)
),
subjects AS (
  SELECT row_number() OVER (ORDER BY COUNT(DISTINCT doc_id) DESC, shingle ASC) AS subject_id,
         shingle AS subject_name
  FROM sh_all
  GROUP BY shingle
  QUALIFY subject_id <= 10
),
doc_sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh_all GROUP BY doc_id),
hits AS (
  SELECT s.doc_id, sub.subject_id, COUNT(*) AS n_hits
  FROM sh_all s JOIN subjects sub ON s.shingle = sub.subject_name
  GROUP BY s.doc_id, sub.subject_id
),
scored AS (
  SELECT h.doc_id, h.subject_id,
         round(h.n_hits * 1.0 / d.n_shingles, 9) AS similarity
  FROM hits h JOIN doc_sizes d ON h.doc_id = d.doc_id
  WHERE h.n_hits * 1.0 / d.n_shingles > 0.0
)
SELECT doc_id, subject_id, similarity,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY similarity DESC, subject_id ASC) AS INT) AS match_rank
FROM scored
QUALIFY match_rank <= 3
"""


def embed_docs(spark: SparkSession, sf: str) -> DataFrame:
    """U10: executor-side embedding via iterator pandas UDF (16-d
    deterministic hash embedder standing in for E5).

    The registered output serializes the vector as a CSV of
    nano-scaled integers (round(x*1e9) as bigint): raw float arrays
    crash the driver canonicalizer, and float→string formatting differs
    between engines while scaled ints are exactly portable."""
    emb = _embed_raw(spark, sf)
    nano = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e9).cast("long"),
    )
    return emb.select("doc_id", F.concat_ws(",", nano).alias("embedding_nano_csv"))


def _embed_raw(spark: SparkSession, sf: str) -> DataFrame:
    """doc_id + raw array<double> embedding — internal input for chained
    vector queries (the registered embed_documents serializes it)."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    return embed_documents(docs, "text", dim=16).select("doc_id", "embedding")


EMBED_SQL = """
WITH raw AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
            i -> CAST(('0x' || substring(md5(text || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
                 / 4294967296.0 - 0.5) AS r
  FROM documents
),
emb AS (
  SELECT doc_id,
         list_transform(r, x -> x / sqrt(list_sum(list_transform(r, y -> y * y)))) AS e
  FROM raw
)
SELECT doc_id,
       array_to_string(list_transform(e, x -> CAST(round(x * 1000000000) AS BIGINT)), ',')
         AS embedding_nano_csv
FROM emb
"""


def embed_and_rank(spark: SparkSession, sf: str) -> DataFrame:
    """U10 ∘ Q2 chain: embed the corpus in-executor, then exact cosine
    top-10 against doc 0's generated vector — the full
    embed→index→retrieve path with zero driver involvement."""
    from tlcn_oer_lakehouse_spark.functions.vectors import cosine

    emb = _embed_raw(spark, sf)
    q = emb.filter(F.col("doc_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        emb.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            F.round(cosine(F.col("embedding"), F.col("q_emb")), 9).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
        .limit(10)
    )


EMBED_RANK_SQL = """
WITH raw AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
            i -> CAST(('0x' || substring(md5(text || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
                 / 4294967296.0 - 0.5) AS r
  FROM documents
),
emb AS (
  SELECT doc_id,
         list_transform(r, x -> x / sqrt(list_sum(list_transform(r, y -> y * y)))) AS e
  FROM raw
),
q AS (SELECT e AS q_emb FROM emb WHERE doc_id = 0)
SELECT doc_id,
       round(list_sum(list_transform(generate_series(1, 16), i -> e[i] * q_emb[i]))
             / (sqrt(list_sum(list_transform(e, x -> x * x)))
                * sqrt(list_sum(list_transform(q_emb, x -> x * x)))), 9) AS cos_sim
FROM emb, q
WHERE doc_id != 0
ORDER BY cos_sim DESC, doc_id ASC
LIMIT 10
"""


SPECS = [
    QuerySpec("match_subjects", match_subjects, MATCH_SQL,
              ref="transformer.py:371-476 (U2 lexical subject matcher)",
              doc="broadcast-dim n-gram matching, threshold + top-3", tags=("ml",)),
    QuerySpec("embed_documents", embed_docs, EMBED_SQL,
              ref="elasticsearch_sync.py:357-405 (U10) — executor-side, no driver funnel",
              doc="iterator pandas-UDF hash embedder, 16-d normalized", tags=("ml",)),
    QuerySpec("embed_and_rank", embed_and_rank, EMBED_RANK_SQL,
              ref="U10 ∘ Q2 chain (SURVEY §3.3 serve path, distributed)",
              doc="embed corpus then cosine top-10 vs doc 0", tags=("ml",)),
]
