"""Subject matching — U2 (transformer.py:371-476), the reference's
TF-IDF/lexical curriculum matcher, re-expressed as a broadcast-join
scoring pipeline.

The reference scored each resource against every curriculum subject
row-at-a-time in Python (exact-code ≥0.99, name hits 0.92-0.94,
token-overlap/TF-IDF cosine fallback, threshold 0.55, top-5).  The
engine-native shape: explode document shingles once, broadcast-join the
(small) subject dimension on the shingle key, aggregate per
(doc, subject), score = subject-shingle frequency / doc shingle count,
threshold + per-doc top-k via one window.

Scale: the subjects dim broadcasts (it is inherently small — a
curriculum); the only shuffle is the (doc, subject) aggregation, keyed
by doc so it co-partitions with every other per-doc operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.functions.text import shingles, tokens


def lexical_subject_match(
    docs: DataFrame,
    subjects: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    subject_id_col: str = "subject_id",
    subject_name_col: str = "subject_name",
    shingle_n: int = 2,
    threshold: float = 0.0,
    top_k: int = 3,
) -> DataFrame:
    """Match every document to its ``top_k`` best subjects.

    score(doc, subject) = (occurrences of the subject's name as a word
    ``shingle_n``-gram in the doc) / (total doc ``shingle_n``-grams) —
    an exact integer ratio, deterministic across engines.  Ties break on
    subject_id; rows below ``threshold`` drop before ranking."""
    # ONE corpus pass (r11): the doc's shingle count rides the exploded
    # rows (constant per doc, an extra long on the aggregation key)
    # instead of a second tokenize+shingle pass + groupBy + re-join —
    # the former doc_sizes derivation re-ran the whole corpus scan.
    # The shingle array is STAGED into its own projection so the size()
    # projection and the explode generator share one evaluation
    # (GenerateExec does not CSE — the chunking-operator rationale).
    # explode_OUTER, not explode: InferFiltersFromGenerate would put a
    # size(__sh)>0 ∧ isnotnull(__sh) filter under the Generate, and
    # predicate pushdown then substitutes the full tokenize+shingle
    # expression through the staged projection — re-running it 2× more
    # per row at the scan (measured 1.8× SLOWER end-to-end).  The rule
    # skips outer generates; the null/empty rows an outer explode adds
    # die in the inner broadcast join below (null never equi-matches).
    staged = docs.select(
        F.col(id_col), shingles(tokens(F.col(text_col)), shingle_n).alias("__sh")
    )
    doc_shingles = staged.select(
        F.col(id_col),
        F.size("__sh").alias("n_shingles"),
        F.explode_outer("__sh").alias("shingle"),
    )
    hits = (
        doc_shingles.join(
            F.broadcast(
                subjects.select(
                    F.col(subject_id_col).alias("subject_id"),
                    F.col(subject_name_col).alias("shingle"),
                )
            ),
            "shingle",
        )
        .groupBy(id_col, "n_shingles", "subject_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    scored = hits.select(
        id_col,
        "subject_id",
        F.round(F.col("n_hits") / F.col("n_shingles"), 9).alias("similarity"),
    ).filter(F.col("similarity") > threshold)
    w = Window.partitionBy(id_col).orderBy(
        F.col("similarity").desc(), F.col("subject_id").asc()
    )
    return (
        scored.withColumn("match_rank", F.row_number().over(w))
        .filter(F.col("match_rank") <= top_k)
    )


def top_ngram_subjects(
    docs: DataFrame, text_col: str = "text", shingle_n: int = 2, k: int = 10
) -> DataFrame:
    """Derive a synthetic subject dimension: the ``k`` most frequent word
    ``shingle_n``-grams by document frequency (ties alphabetical).
    Stands in for the reference's curriculum reference_subjects table."""
    df_counts = (
        docs.select(
            F.explode(
                F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))
            ).alias("shingle")
        )
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    # Top-k FIRST via orderBy().limit() — Spark plans a distributed
    # TakeOrdered (per-partition top-k + driver merge), so the global
    # ranking window below only ever sees k rows.  Ranking the full
    # shingle table through a no-partition window would funnel every
    # distinct shingle into one partition.
    top = df_counts.orderBy(F.col("doc_freq").desc(), F.col("shingle").asc()).limit(k)
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("shingle").asc())
    return (
        top.withColumn("subject_id", F.row_number().over(w))
        .select("subject_id", F.col("shingle").alias("subject_name"), "doc_freq")
    )


def deletion_variants(c):
    """The FastSS deletion neighborhood of a string: the string itself
    plus every single-character deletion, deduplicated.  Two strings
    within edit distance 1 (insert / delete / substitute) ALWAYS share a
    variant: deletion/insertion pairs share the shorter string,
    substitution pairs share the both-sides-deleted form — so an
    equi-join on variants is a complete candidate generator for
    distance-1 matching."""
    from pyspark.sql import functions as F

    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substr(c, F.lit(1), i - F.lit(1)),
            F.substr(c, i + F.lit(1), F.length(c)),
        ),
    )
    return F.array_distinct(
        F.when(F.length(c) > 0, F.concat(F.array(c), dels)).otherwise(F.array(c))
    )


def deletion_neighborhood_join(
    left,
    right,
    left_id: str,
    right_id: str,
    left_str: str,
    right_str: str,
):
    """Fuzzy entity-resolution join at edit distance ≤ 1 via
    deletion-neighborhood blocking (FastSS): both sides explode their
    variants, candidates come from ONE equi-join on the variant string
    (bucket-sized, never all-pairs — the same topology as minhash
    banding), and `levenshtein` verifies survivors.  At 100 TB the
    variant table is ~|s| rows per string and the join key is
    high-cardinality, so candidates stay proportional to true matches,
    not to the cross product."""
    from pyspark.sql import functions as F

    lv = left.select(
        F.col(left_id), F.col(left_str),
        F.explode(deletion_variants(F.col(left_str))).alias("__var"),
    )
    rv = right.select(
        F.col(right_id), F.col(right_str),
        F.explode(deletion_variants(F.col(right_str))).alias("__var"),
    )
    cand = lv.join(rv, "__var").dropDuplicates([left_id, right_id])
    return cand.filter(
        F.levenshtein(F.col(left_str), F.col(right_str)) <= 1
    ).select(
        left_id, left_str, right_id, right_str,
        F.levenshtein(F.col(left_str), F.col(right_str)).alias("edit_dist"),
    )
