"""Unit pins for textops helpers that the sf fixtures cannot exercise."""

from __future__ import annotations

from pyspark.sql import types as T

from clinical_bi_spark.queries.textops import _adjacent_bigrams

_WORDS_SCHEMA = T.StructType(
    [T.StructField("words", T.ArrayType(T.StringType()), False)]
)


def test_adjacent_bigrams_zero_token_doc(spark):
    """ADVICE r8 (medium): slice(words, 1, size-1) threw
    INVALID_PARAMETER_VALUE.LENGTH for a zero-token document (length -1),
    crashing the whole query while the DuckDB oracle returned empty. The
    greatest(size-1, 0) clamp must make empty/one-token docs contribute
    zero bigrams and leave multi-token docs untouched."""
    df = spark.createDataFrame(
        [([],), (["solo"],), (["a", "b", "c"],)], _WORDS_SCHEMA
    )
    rows = sorted(
        (r.w1, r.w2) for r in _adjacent_bigrams(df).collect()
    )
    assert rows == [("a", "b"), ("b", "c")]


def test_ngram_jaccard_zero_token_docs(spark, tmp_path):
    """r9 family-wide sweep of the PMI zero-token lesson: two empty
    documents in one source block would give Jaccard 0/0 — ANSI Spark
    crashed where DuckDB's double division would not. Both zero-token
    docs must now be excluded from the pair space, and real pairs must
    still emerge."""
    from clinical_bi_spark.queries import load_all

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s1", 16),
            (2, "alpha beta gamma", "en", "s1", 16),
            (3, "", "en", "s1", 0),
            (4, "   ", "en", "s1", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = load_all()["dedup_ngram_jaccard"].fn(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]
