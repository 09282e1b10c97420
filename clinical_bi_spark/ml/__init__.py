"""Spark ML surface (SURVEY.md §2.7): the pieces of the reference's
pandas→TensorFlow pipeline that are models rather than queries."""

from clinical_bi_spark.ml.embedding import (
    trained_vocabulary_embedding,
    vocabulary_embedding,
)
from clinical_bi_spark.ml.lmg import lmg_relative_importance

__all__ = [
    "lmg_relative_importance",
    "trained_vocabulary_embedding",
    "vocabulary_embedding",
]
