"""Column-expression builders — the engine's scalar function surface.

Everything here returns a ``pyspark.sql.Column`` (pure Catalyst
expressions, no Python UDFs), so whole-stage codegen applies and the
oracle comparison is deterministic.
"""

from clinical_bi_spark.functions.exprs import (
    cleanse_text,
    contains_any,
    encode_categories,
    encode_last_writer_wins,
    null_to_zero,
    stage_from_title,
)
from clinical_bi_spark.functions.text import (
    doc_fingerprint,
    language_guess,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_tokens,
)
from clinical_bi_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)

__all__ = [
    "cleanse_text",
    "contains_any",
    "encode_categories",
    "encode_last_writer_wins",
    "null_to_zero",
    "stage_from_title",
    "doc_fingerprint",
    "language_guess",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "word_tokens",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "to_double_array",
]
