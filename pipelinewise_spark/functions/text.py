"""Text-analysis column expressions for large-scale corpus pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure built-in expressions (JVM-side, whole-stage codegen) — at 100 TB
these run inside the parquet scan stage with zero Python. Tokenization is
parameterized so oracle comparisons can pin an exact delimiter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword inventories for the n-gram/stopword
# language heuristic (public common-word lists).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans"],
}

PUNCT_CLASS = "[^.,!?;:]"


def tokens(text: Column, delim: str = " ") -> Column:
    return F.split(text, delim)


def token_count(text: Column, delim: str = " ") -> Column:
    """Whitespace token count."""
    return F.size(tokens(text, delim))


def stopword_ratio(text: Column, lang: str = "en", delim: str = " ") -> Column:
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(F.lower(text), delim)
    hits = F.size(F.filter(toks, lambda w: F.array_contains(stops, w)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, PUNCT_CLASS, "")) / F.greatest(
        F.length(text), F.lit(1)
    )


def mean_word_len(text: Column, delim: str = " ") -> Column:
    toks = tokens(text, delim)
    return (
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / F.greatest(F.size(toks), F.lit(1))
    )


def quality_score(text: Column, delim: str = " ") -> Column:
    """Heuristic [0,1] quality: length sweet-spot x stopword presence x
    low punctuation noise (the usual pretraining-corpus filters)."""
    n = token_count(text, delim)
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text, "en", delim) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round(length_term * 0.4 + stop_term * 0.4 + punct_term * 0.2, 4)


def lang_id(text: Column, delim: str = " ") -> Column:
    """Stopword-vote language heuristic over the mini inventories."""
    scores = {code: stopword_ratio(text, code, delim) for code in STOPWORDS}
    best = F.lit("unk")
    best_score = F.lit(0.02)  # minimum evidence threshold
    # deterministic tie-break: iterate codes in sorted order, strict >
    for code in sorted(scores):
        cond = scores[code] > best_score
        best = F.when(cond, F.lit(code)).otherwise(best)
        best_score = F.when(cond, scores[code]).otherwise(best_score)
    return best


def normalize_text(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 of normalized text) — the
    exact-dedup key."""
    return F.md5(normalize_text(text))
