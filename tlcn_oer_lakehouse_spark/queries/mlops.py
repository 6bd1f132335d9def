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


# U3 semantic matcher as a registered, oracle-checked query: the
# reference's 8 labeled harness cases (semantic_matcher.py:219-287) and
# 6 subjects as a local-collection source, matched by the
# concept-lexicon embedder; the oracle replays the identical
# gram/score/normalize/cosine arithmetic in SQL (generated from the
# same DEFAULT_LEXICON so the two stay in sync by construction).
_SEM_DOCS = [
    (1, "Deep Learning for Computer Vision"),
    (2, "Introduction to Neural Networks Course about training neural networks"),
    (3, "E-Learning Management System Building online learning platforms"),
    (4, "Sorting and Searching Algorithms Covers quicksort, mergesort, binary search"),
    (5, "SQL and Relational Databases"),
    (6, "TCP/IP and Network Protocols"),
    (7, "Mining Customer Behavior Patterns Extract insights from transaction data"),
    (8, "Introduction to AI and Expert Systems"),
]
_SEM_SUBJECTS = [
    (1, "Machine Learning"),
    (2, "Data Structures and Algorithms"),
    (3, "Data Mining"),
    (4, "Computer Networks"),
    (5, "Database Management Systems"),
    (6, "Artificial Intelligence"),
]


def semantic_match(spark: SparkSession, sf: str) -> DataFrame:
    """U3: semantic subject match over the labeled harness corpus."""
    from tlcn_oer_lakehouse_spark.operators.semantic import semantic_subject_match

    docs = spark.createDataFrame(_SEM_DOCS, "doc_id long, text string")
    subjects = spark.createDataFrame(_SEM_SUBJECTS, "subject_id long, subject_name string")
    return semantic_subject_match(docs, subjects, threshold=0.38, top_k=3).orderBy(
        "doc_id", "match_rank"
    )


def _semantic_oracle() -> str:
    from tlcn_oer_lakehouse_spark.operators.semantic import DEFAULT_LEXICON

    concepts = sorted(DEFAULT_LEXICON)

    def raw(i: int, c: str) -> str:
        terms = " + ".join(
            f"(CASE WHEN list_contains(grams, '{t}') THEN CAST({w} AS DOUBLE) ELSE 0.0 END)"
            for t, w in sorted(DEFAULT_LEXICON[c].items())
        )
        return f"({terms}) AS s_{i}"

    n = len(concepts)
    doc_vals = ", ".join(f"({i}, '{t.replace(chr(39), chr(39)*2)}')" for i, t in _SEM_DOCS)
    sub_vals = ", ".join(f"({i}, '{t}')" for i, t in _SEM_SUBJECTS)
    norm = " + ".join(f"s_{i} * s_{i}" for i in range(n))
    dot = " + ".join(f"d.n_{i} * s.n_{i}" for i in range(n))
    nrm_cols = ", ".join(
        f"CASE WHEN sqrt({norm}) > 0 THEN s_{i} / sqrt({norm}) ELSE 0.0 END AS n_{i}"
        for i in range(n)
    )
    raws = ", ".join(raw(i, c) for i, c in enumerate(concepts))
    return f"""
WITH docs(doc_id, text) AS (VALUES {doc_vals}),
subs(subject_id, subject_name) AS (VALUES {sub_vals}),
enc_d AS (
  SELECT doc_id, {raws} FROM (
    SELECT doc_id,
           list_distinct(tk || list_transform(generate_series(1, greatest(len(tk)-1, 0)),
                                              i -> tk[i] || ' ' || tk[i+1])) AS grams
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM docs))
),
enc_s AS (
  SELECT subject_id, {raws} FROM (
    SELECT subject_id,
           list_distinct(tk || list_transform(generate_series(1, greatest(len(tk)-1, 0)),
                                              i -> tk[i] || ' ' || tk[i+1])) AS grams
    FROM (SELECT subject_id, regexp_extract_all(lower(subject_name), '[a-z0-9]+') AS tk FROM subs))
),
nd AS (SELECT doc_id, {nrm_cols} FROM enc_d),
ns AS (SELECT subject_id, {nrm_cols} FROM enc_s),
scored AS (
  SELECT d.doc_id, s.subject_id, round({dot}, 9) AS similarity
  FROM nd d CROSS JOIN ns s
)
SELECT doc_id, subject_id, similarity,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY similarity DESC, subject_id ASC) AS INT) AS match_rank
FROM scored
WHERE similarity >= 0.38
QUALIFY match_rank <= 3
ORDER BY doc_id, match_rank
"""


SPECS = [
    QuerySpec("match_subjects", match_subjects, MATCH_SQL,
              ref="transformer.py:371-476 (U2 lexical subject matcher)",
              doc="broadcast-dim n-gram matching, threshold + top-3", tags=("ml",)),
    QuerySpec("semantic_match_subjects", semantic_match, _semantic_oracle(),
              ref="semantic_matcher.py:111-191 (U3 cosine match, threshold .38 top-3)",
              doc="concept-lexicon embedder match over the 8-case harness corpus",
              tags=("ml",)),
    QuerySpec("embed_documents", embed_docs, EMBED_SQL,
              ref="elasticsearch_sync.py:357-405 (U10) — executor-side, no driver funnel",
              doc="iterator pandas-UDF hash embedder, 16-d normalized", tags=("ml",)),
    QuerySpec("embed_and_rank", embed_and_rank, EMBED_RANK_SQL,
              ref="U10 ∘ Q2 chain (SURVEY §3.3 serve path, distributed)",
              doc="embed corpus then cosine top-10 vs doc 0", tags=("ml",)),
]
