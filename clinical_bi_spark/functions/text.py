"""Text-analysis expressions for the training-data-pipeline extensions.

The reference's only text ops are substring classifiers and ``lower()``
(SURVEY.md §2.6 F2-F4); these extend that surface with the text-quality
operators a large-scale LLM-data pipeline needs (north star in
BASELINE.json). Everything is a pure Catalyst expression — array/lambda
higher-order functions, no Python UDFs — so the hot path stays JVM-side
and 100 TB of documents shard trivially (no shuffle for any per-document
column; these are all narrow transformations).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small, fixed stopword lists (per-language) for the heuristic language
#: guesser and quality scorer. Deliberately tiny and deterministic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "im"),
}


def word_tokens(col: Column) -> Column:
    """Whitespace tokenization with empty tokens dropped.

    ``split`` on ``\\s+`` leaves a leading empty string when the input
    starts with whitespace — filter it so token counts are stable.
    """
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish proxy: see ``subword_count``).

    ``regexp_count(\\S+)`` ≡ count of non-empty whitespace-split tokens
    (each maximal non-space run is exactly one match) but stays a native
    codegen'd expression — no array materialization, no interpreted
    lambda per token (the round-1 HOF lesson, measured ~3× on the
    text_stats headline once the bench stopped pruning projections)."""
    return F.regexp_count(col, F.lit(r"\S+")).cast("int")


def subword_count(col: Column) -> Column:
    """BPE-ish token estimate: alphanumeric runs + standalone punctuation.

    A cheap deterministic stand-in for a real tokenizer: counts maximal
    ``[A-Za-z0-9]+`` runs plus each non-space non-alnum character, which
    tracks byte-pair-encoding counts within ~15% on English text.
    """
    words = F.regexp_count(col, F.lit(r"[A-Za-z0-9]+"))
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return (words + punct).cast("int")


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace."""
    n_punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.round(n_punct / F.greatest(F.length(col), F.lit(1)), 6)


def _stopword_hits(lowered: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of whitespace-delimited tokens equal to a stopword, as one
    native regexp_count: the lookarounds pin both token boundaries, so a
    match is exactly a full-token equality (identical to filtering the
    split array, without building it)."""
    pat = r"(?<![^\s])(?:" + "|".join(stopwords) + r")(?![^\s])"
    return F.regexp_count(lowered, F.lit(pat))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords (lowercased match)."""
    lowered = F.lower(col)
    hits = _stopword_hits(lowered, STOPWORDS[lang])
    return F.round(hits / F.greatest(token_count(lowered), F.lit(1)), 6)


def mean_token_length(col: Column) -> Column:
    # sum of token lengths == count of non-whitespace characters
    total = F.length(F.regexp_replace(col, r"\s+", ""))
    return F.round(total / F.greatest(token_count(col), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Deterministic document-quality heuristic in [0, 1].

    Combines length adequacy, stopword presence, punctuation sanity, and
    mean token length — the standard cheap pre-filters an LLM data
    pipeline applies before expensive dedup/scoring stages.
    """
    n_tokens = token_count(col)
    length_ok = F.least(n_tokens / F.lit(64.0), F.lit(1.0))  # saturates at 64 tokens
    sw = stopword_ratio(col)
    sw_ok = F.least(sw / F.lit(0.05), F.lit(1.0))  # saturates at 5% stopwords
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) / F.lit(0.3), F.lit(1.0))
    mtl = mean_token_length(col)
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (length_ok + sw_ok + punct_ok + mtl_ok) / F.lit(4.0)
    return F.round(score, 6)


def language_guess(col: Column) -> Column:
    """Stopword-vote language ID (n-gram-free heuristic).

    Scores each candidate language by its stopword hit-count over the
    lowercased tokens; the winner needs at least 2 hits, else 'unknown'.
    Ties break by the fixed language order en > es > fr > de
    (deterministic; mirrors a first-wins CASE chain).
    """
    lowered = F.lower(col)
    hits = {lang: _stopword_hits(lowered, sw) for lang, sw in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    chain = F.when(best < F.lit(2), F.lit("unknown"))
    for lang in ("en", "es", "fr", "de"):
        chain = chain.when(hits[lang] == best, F.lit(lang))
    return chain.otherwise(F.lit("unknown"))


def normalized_text(col: Column) -> Column:
    """Canonical form used for fingerprinting: lowercase, collapsed spaces."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def doc_fingerprint(col: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text.

    md5 is available in both Spark and DuckDB, making this oracle-checkable;
    at scale it doubles as the exact-dedup grouping key (hash-groupBy
    shuffles 16-byte keys instead of full documents).
    """
    return F.md5(normalized_text(col))
