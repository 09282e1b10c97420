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


#: one millionth — the engine-exact fixed-point grain of every text ratio
_MICRO = 1_000_000


def _exact_div(a: Column, b: Column) -> Column:
    """Exact integer ``a DIV b`` for non-negative bigints: strip the
    remainder first, so the double division is of an exact multiple and
    is correctly rounded to the (representable) integer quotient. Exact
    for operands below 2^53 — the callers' micro-scaled counts top out
    around 4e15 only past ~2e9-character documents."""
    a = a.cast("bigint")
    b = b.cast("bigint")
    return ((a - a % b) / b).cast("bigint")


def _half_up_micro(numer: Column, denom: Column) -> Column:
    """ROUND-half-up of ``numer/denom`` at 6 decimals as an exact bigint
    micro count — the integer twin of ``ROUND(x, 6)``. The r10 unicode
    differential sweep caught Spark's BigDecimal HALF_UP and DuckDB's
    ``std::round(x*1e6)`` disagreeing by one micro on exact .5e-6
    boundaries (latent on the ASCII fixture, where punctuation counts
    are zero); integers cannot disagree."""
    two = F.lit(2).cast("bigint")
    n = numer.cast("bigint") * F.lit(_MICRO).cast("bigint")
    return _exact_div(two * n + denom.cast("bigint"), two * denom.cast("bigint"))


def _micro_to_double(micro: Column) -> Column:
    """micro/1e6 as double — both engines divide the same exact integer
    by the same constant, so the IEEE quotients are identical."""
    return (micro.cast("double") / F.lit(1_000_000.0)).cast("double")


def _punct_chars(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor
    whitespace, at exact micro grain (see ``_half_up_micro``)."""
    micro = _half_up_micro(_punct_chars(col), F.greatest(F.length(col), F.lit(1)))
    return _micro_to_double(micro)


def _stopword_hits(lowered: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of whitespace-delimited tokens equal to a stopword, as one
    native regexp_count: the lookarounds pin both token boundaries, so a
    match is exactly a full-token equality (identical to filtering the
    split array, without building it)."""
    pat = r"(?<![^\s])(?:" + "|".join(stopwords) + r")(?![^\s])"
    return F.regexp_count(lowered, F.lit(pat))


def _stopword_micro(col: Column, lang: str = "en") -> Column:
    lowered = F.lower(col)
    hits = _stopword_hits(lowered, STOPWORDS[lang])
    return _half_up_micro(hits, F.greatest(token_count(lowered), F.lit(1)))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords (lowercased match), at exact
    micro grain (see ``_half_up_micro``)."""
    return _micro_to_double(_stopword_micro(col, lang))


def _mean_token_length_micro(col: Column) -> Column:
    # sum of token lengths == count of non-whitespace characters
    total = F.length(F.regexp_replace(col, r"\s+", ""))
    return _half_up_micro(total, F.greatest(token_count(col), F.lit(1)))


def mean_token_length(col: Column) -> Column:
    """Mean whitespace-token length, at exact micro grain."""
    return _micro_to_double(_mean_token_length_micro(col))


def quality_score(col: Column) -> Column:
    """Deterministic document-quality heuristic in [0, 1].

    Combines length adequacy, stopword presence, punctuation sanity, and
    mean token length — the standard cheap pre-filters an LLM data
    pipeline applies before expensive dedup/scoring stages.

    All arithmetic is exact bigint micro-units end to end (the r10
    unicode sweep's lesson: the old double form hit .5e-6 rounding
    boundaries where the engines' round() implementations disagree —
    only observable once punctuation counts were nonzero). Each term is
    an exact micro int; the final average rounds half-up in integer
    space ((sum + 2) DIV 4), so the score is the same micro integer in
    any engine.
    """
    return _micro_to_double(quality_score_micro(col))


def quality_score_micro(col: Column) -> Column:
    """``quality_score`` as its exact bigint micro count (quality × 1e6)
    — for callers that aggregate or threshold the score and need integer
    arithmetic all the way (the curation funnel's average; a >= 0.85
    gate is exactly ``micro >= 850000``)."""
    micro = F.lit(_MICRO).cast("bigint")
    n_tokens = token_count(col).cast("bigint")
    # n/64 saturating at 1: 1e6/64 = 15625 exactly
    length_ok = F.least(n_tokens * F.lit(15625).cast("bigint"), micro)
    # stopword ratio / 0.05 = micro * 20, saturating
    sw_ok = F.least(_stopword_micro(col) * F.lit(20).cast("bigint"), micro)
    # punct ratio / 0.3 = micro * 10/3, half-up, saturating; then 1 - x
    p = _exact_div(
        F.lit(20).cast("bigint") * _half_up_micro(
            _punct_chars(col), F.greatest(F.length(col), F.lit(1))
        )
        + F.lit(3).cast("bigint"),
        F.lit(6).cast("bigint"),
    )
    punct_ok = micro - F.least(p, micro)
    mtl = _mean_token_length_micro(col)
    mtl_ok = F.when(
        (mtl >= F.lit(2 * _MICRO)) & (mtl <= F.lit(12 * _MICRO)), micro
    ).otherwise(F.lit(0).cast("bigint"))
    total = length_ok + sw_ok + punct_ok + mtl_ok
    return _exact_div(total + F.lit(2).cast("bigint"), F.lit(4).cast("bigint"))


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
