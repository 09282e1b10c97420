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
