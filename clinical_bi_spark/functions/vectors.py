"""Vector expressions over embedding columns (``array<float>``).

Pure Catalyst higher-order functions (``zip_with`` / ``aggregate``) — no
Python boundary, so a 100 TB embedding table stays in whole-stage codegen.
All math is done in double precision regardless of the stored element type
so results are reproducible against the DuckDB oracle
(``list_cosine_similarity`` on ``DOUBLE[]``).
"""

from __future__ import annotations

from pyspark.sql import Column
import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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
    """Cosine similarity with a zero-norm guard (0.0 for degenerate input).

    Pure-Catalyst sequential math — bit-reproducible against the DuckDB
    oracle, which is why the oracle-checked exact queries use it. Catalyst
    evaluates HOF lambdas interpreted (per element), so for high-volume
    candidate scoring prefer :func:`cosine_pandas` (~2× measured at bench
    scale, more at cluster scale where numpy batches amortize)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def cosine_pandas(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine (pandas UDF + numpy): the hot-path variant
    for ANN candidate scoring — whole batches move over Arrow once and the
    math is a numpy matmul, not per-element lambda interpretation."""
    @pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        xm = np.vstack(x.values).astype(np.float64)
        ym = np.vstack(y.values).astype(np.float64)
        num = (xm * ym).sum(axis=1)
        den = np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1)
        return pd.Series(np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0))

    return _cos(a, b)
