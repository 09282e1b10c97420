"""Pin the r11 let-binding rewrite of the text-quality expressions.

The stream_corpus_curation fix (r11) rewrote the quality/language
family over ``functions.text._bind`` — each text scan evaluates once —
and swapped two allocating ``regexp_replace`` primitives for
``regexp_count`` forms. The DuckDB oracle fragments were untouched, so
the oracle suite adjudicates values end to end; these tests pin the
three internal equivalences the rewrite RELIES on, so a future edit
that breaks one fails here with the reason, not in a hash mismatch:

* the fused ``curation_keep`` gate == the unfused
  ``quality >= 0.85 AND language = 'en'`` conjunction, row for row;
* the regexp_count primitives == the old regexp_replace forms
  (code-point counting, including astral chars);
* the stopword denominator swap: ``token_count(lower(s)) ==
  token_count(s)`` (lowercasing never changes whitespace).

Corpus: the unicode probe's document texts (accents, CJK, emoji, NBSP,
combining marks, RTL, full-width forms) plus degenerate edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

_EDGES = [
    None,
    "",
    " ",
    "\t\n  \r",
    "x",
    "!!!",
    "the and of to in is it that for a",  # all stopwords
    "a b c!!! ??? ;;; ...",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral 😀😀 text the and of to",  # astral code points
    "el la de que y en un por con los",
    "der die und das von zu mit den ein im",
    "the and of",  # NBSP is NOT Java \s
    "café naïve 中文 the of and to it is",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from scripts.unicode_probe import build_corpus

    dest = str(tmp_path_factory.mktemp("bind_corpus"))
    build_corpus(SF_SMALL, dest)
    docs = spark.read.parquet(f"{dest}/documents.parquet").select("text")
    edges = spark.createDataFrame([(t,) for t in _EDGES], "text string")
    return docs.unionAll(edges)


def test_fused_gate_equals_unfused_conjunction(corpus):
    from clinical_bi_spark.functions.text import (
        curation_keep,
        language_guess,
        quality_score,
    )

    rows = corpus.select(
        F.col("text"),
        curation_keep(F.col("text")).alias("fused"),
        (
            (quality_score(F.col("text")) >= 0.85)
            & (language_guess(F.col("text")) == "en")
        ).alias("unfused"),
    ).collect()
    assert rows, "empty corpus"
    for r in rows:
        # boolean OR NULL — a filter treats NULL as drop, so pin the
        # truthy set, which is what the funnel actually consumes
        assert bool(r.fused) == bool(r.unfused), (
            r.text,
            r.fused,
            r.unfused,
        )
    assert any(r.fused for r in rows), "gate never fires on the corpus"


def test_regexp_count_primitives_match_replace_forms(corpus):
    from clinical_bi_spark.functions.text import _nonws_chars, _punct_chars

    old_punct = F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
    old_nonws = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    bad = corpus.select(
        _punct_chars(F.col("text")).alias("p_new"),
        old_punct.alias("p_old"),
        _nonws_chars(F.col("text")).alias("w_new"),
        old_nonws.alias("w_old"),
    ).filter(
        ~(
            (F.col("p_new").eqNullSafe(F.col("p_old")))
            & (F.col("w_new").eqNullSafe(F.col("w_old")))
        )
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_token_count_invariant_under_lower(corpus):
    from clinical_bi_spark.functions.text import token_count

    bad = corpus.filter(
        ~token_count(F.col("text")).eqNullSafe(
            token_count(F.lower(F.col("text")))
        )
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_quality_micro_matches_unbound_arithmetic(corpus):
    """quality_score_micro (bound) == the pre-r11 unbound expression tree
    (reconstructed here verbatim from the r10 form)."""
    from clinical_bi_spark.functions.text import (
        _MICRO,
        _exact_div,
        _half_up_micro,
        _punct_chars,
        _stopword_hits,
        quality_score_micro,
        token_count,
        STOPWORDS,
    )

    col = F.col("text")
    micro = F.lit(_MICRO).cast("bigint")
    n_tokens = token_count(col).cast("bigint")
    length_ok = F.least(n_tokens * F.lit(15625).cast("bigint"), micro)
    lowered = F.lower(col)
    sw_micro = _half_up_micro(
        _stopword_hits(lowered, STOPWORDS["en"]),
        F.greatest(token_count(lowered), F.lit(1)),
    )
    sw_ok = F.least(sw_micro * F.lit(20).cast("bigint"), micro)
    p = _exact_div(
        F.lit(20).cast("bigint")
        * _half_up_micro(_punct_chars(col), F.greatest(F.length(col), F.lit(1)))
        + F.lit(3).cast("bigint"),
        F.lit(6).cast("bigint"),
    )
    punct_ok = micro - F.least(p, micro)
    mtl = _half_up_micro(
        F.length(F.regexp_replace(col, r"\s+", "")),
        F.greatest(token_count(col), F.lit(1)),
    )
    mtl_ok = F.when(
        (mtl >= F.lit(2 * _MICRO)) & (mtl <= F.lit(12 * _MICRO)), micro
    ).otherwise(F.lit(0).cast("bigint"))
    old = _exact_div(
        length_ok + sw_ok + punct_ok + mtl_ok + F.lit(2).cast("bigint"),
        F.lit(4).cast("bigint"),
    )
    bad = corpus.filter(
        ~quality_score_micro(col).eqNullSafe(old)
    )
    assert bad.count() == 0, bad.limit(5).collect()
