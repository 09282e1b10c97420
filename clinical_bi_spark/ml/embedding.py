"""M8: vocabulary-backed categorical embedding.

Reference (disabled code): ``categorical_column_with_vocabulary_file
('source', 1084)`` + ``embedding_column(dim=10)`` (ct_estimator.py:106-114).
Spark shape: StringIndexer builds the vocabulary; the embedding matrix is a
broadcast lookup table joined on the index. The table here is
deterministic (md5-seeded per vocabulary entry) — a trained matrix is a
drop-in replacement; the operator is the lookup plumbing, which is what
the pipeline needs to be able to do at scale (broadcast join, no shuffle
of the fact table).

The vector formula is deliberately engine-portable so the whole operator
is oracle-checkable: component j of token t is
``(int(md5(t + '|' + j)[:8], 16) % 2000001 - 1000000) / 1e6`` — integer
arithmetic on the md5 hex prefix, then one exact IEEE division, so Spark
and DuckDB (``('0x' || substr(md5(..),1,8))::UBIGINT``) produce
bit-identical doubles with no decimal-rounding step to disagree on.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seeded_vector(token: str, dim: int) -> list[float]:
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{token}|{j}".encode()).hexdigest()
        v = int(h[:8], 16)
        out.append((v % 2000001 - 1000000) / 1000000.0)
    return out


def vocabulary_embedding(
    df: DataFrame, col: str, dim: int = 10
) -> DataFrame:
    """Attach ``{col}_idx`` (vocabulary index) and ``{col}_embedding``
    (dim-wide float vector). Out-of-vocabulary values (StringIndexer
    handleInvalid='keep' bucket) get a NULL embedding — the caller decides
    the OOV policy, matching the reference's fixed-size vocabulary file."""
    from pyspark.ml.feature import StringIndexer

    indexer = StringIndexer(
        inputCol=col, outputCol=f"{col}_idx", handleInvalid="keep"
    )
    model = indexer.fit(df)
    vocab = model.labels
    table = df.sparkSession.createDataFrame(
        [(float(i), _seeded_vector(tok, dim)) for i, tok in enumerate(vocab)],
        f"{col}_idx double, {col}_embedding array<double>",
    )
    return model.transform(df).join(F.broadcast(table), f"{col}_idx", "left")
