"""Vector expressions over embedding columns (``array<float>``).

Pure Catalyst higher-order functions (``zip_with`` / ``aggregate``) — no
Python boundary, so a 100 TB embedding table stays in whole-stage codegen.
All math is done in double precision regardless of the stored element type
so results are reproducible against the DuckDB oracle
(``list_cosine_similarity`` on ``DOUBLE[]``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product."""
    products = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    arr = to_double_array(a)
    return F.sqrt(F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-norm guard (0.0 for degenerate input)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))
