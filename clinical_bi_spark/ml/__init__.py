"""Spark ML surface (SURVEY.md §2.7): the pieces of the reference's
pandas→TensorFlow pipeline that are models rather than queries."""

from clinical_bi_spark.ml.embedding import vocabulary_embedding

__all__ = ["vocabulary_embedding"]
