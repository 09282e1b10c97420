"""M8: vocabulary-backed categorical embedding.

Reference (disabled code): ``categorical_column_with_vocabulary_file
('source', 1084)`` + ``embedding_column(dim=10)`` (ct_estimator.py:106-114).
Spark shape: StringIndexer builds the vocabulary; the embedding matrix is a
broadcast lookup table joined on the index. The table here is
deterministic (md5-seeded per vocabulary entry) — a trained matrix is a
drop-in replacement; the operator is the lookup plumbing, which is what
the pipeline needs to be able to do at scale (broadcast join, no shuffle
of the fact table).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seeded_vector(token: str, dim: int) -> list[float]:
    digest = hashlib.md5(token.encode()).digest()
    seed = int.from_bytes(digest[:8], "big")
    out = []
    for _ in range(dim):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(round((seed / (1 << 63)) * 2.0 - 1.0, 6))
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
        f"{col}_idx double, {col}_embedding array<float>",
    )
    return model.transform(df).join(F.broadcast(table), f"{col}_idx", "left")
