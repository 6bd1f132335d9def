"""Text-analysis column expressions — the training-data-pipeline surface.

Everything here is a pure ``pyspark.sql.functions`` composition (JVM-side,
whole-stage-codegen'd); no Python UDFs in the hot path.  These re-express,
as vectorized expressions, what the reference computed row-at-a-time in
Python inside RDD ``mapPartitions``:

- token counting           (transformer.py:860 — regex ``\\w+`` count)
- quality scoring          (transformer.py:340-368 — weighted completeness)
- language identification  (chatbot_api.py:69-89 — heuristic char/stopword)
- document fingerprinting  (transformer.py:310-337)
- shingling for near-dup detection (new scale capability)

Scale: each expression is embarrassingly parallel over rows — no shuffle,
no driver involvement; a 100 TB corpus runs these at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
# Deliberately small and hard-coded so the same lists embed in oracle SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "y", "los", "que"),
    "zh": ("的", "是", "了", "在", "我"),
}

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")


def normalize_text(c: Column) -> Column:
    """Canonical form: lowercase, collapsed whitespace, trimmed.
    (transformer.py text normalization before fingerprinting)"""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column) -> Column:
    """Reference counts regex ``\\w+`` matches (transformer.py:860)."""
    return F.size(F.regexp_extract_all(c, F.lit(r"\w+"), 0))


def fingerprint(c: Column) -> Column:
    """Content fingerprint of the normalized text (md5 hex)."""
    return F.md5(normalize_text(c))


def shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles: ['a b c', 'b c d', ...].

    Guarded so short documents yield an empty array — Spark's
    ``sequence(1, 0)`` would otherwise produce a DESCENDING [1, 0].

    ``toks`` is BOUND ONCE as a lambda variable (``transform(array(toks),
    t -> ...)`` + ``flatten``) instead of appearing free inside the
    per-element lambda: higher-order lambdas evaluate interpreted with no
    common-subexpression elimination, so a free ``toks`` expression (e.g.
    an inline ``tokens(text)`` — a regex normalize + split) was re-evaluated
    once per SHINGLE POSITION in the old form.  Binding measured 10× on the
    minhash per-doc array build at sf0.1 (r12; value-identical by checksum
    and oracle replay).  A bound variable read is O(1) however the caller
    spells ``toks``."""

    def _from(t: Column) -> Column:
        count = F.size(t) - (n - 1)
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(toks), _from))


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are marker stopwords for one language.
    (Closure via a factory — a ``ms=ms`` lambda default would make PySpark
    treat it as a two-arg (value, index) higher-order lambda.)"""
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(c: Column) -> Column:
    """Heuristic language ID: argmax of marker-token hits; 'und' when no
    marker hits at all. Mirrors chatbot_api.py:69-89's diacritics/stopword
    heuristic, generalized to 5 languages."""
    toks = tokens(c)
    scored = [(lang, _marker_hits(toks, ms)) for lang, ms in LANG_MARKERS.items()]
    # deterministic argmax: highest score wins; ties broken by language
    # code order (alphabetical) via iterative comparison
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in sorted(scored):  # alphabetical, then strictly-greater wins
        cond = score > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, score).otherwise(best_score)
    return best_lang


def quality_score(c: Column) -> Column:
    """Weighted text-quality heuristic in [0, 1] — the column-expression
    analog of the reference's completeness score (transformer.py:340-368):

      0.4 * min(token_count/100, 1)      (length)
    + 0.3 * distinct_token_ratio          (lexical diversity)
    + 0.3 * (1 - stopword_ratio)          (content density)

    All components are exact integer ratios evaluated in double —
    deterministic across engines.
    """
    toks = tokens(c)
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / n
    length_comp = F.least(n / F.lit(100.0), F.lit(1.0))
    # guard on any non-whitespace char, not token count: split('') yields
    # [''] so size(tokens) is never 0, and trim() only strips 0x20 so a
    # tab/newline-only doc would still score ~0.6
    nonempty = F.length(F.regexp_replace(c, r"\s", "")) > 0
    return F.when(nonempty,
                  F.lit(0.4) * length_comp
                  + F.lit(0.3) * distinct_ratio
                  + F.lit(0.3) * (F.lit(1.0) - stop_ratio)).otherwise(F.lit(0.0))
