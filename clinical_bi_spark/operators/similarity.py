"""Approximate nearest-neighbor search over embedding columns.

The exact baseline (broadcast queries × streamed corpus) is the
oracle-checked ``sim_bruteforce_topk`` query. This module adds the scale
paths:

* :func:`lsh_bucket_topk` — random-hyperplane (sign) LSH: corpus and
  queries get an ``nbits``-bit signature; candidates come from matching
  buckets (multi-probe over Hamming-adjacent buckets); exact cosine ranks
  only candidates. One narrow shuffle on the bucket key.
* :func:`ivf_topk` — IVF-style coarse quantization: deterministic
  centroids sampled from the corpus, rows assigned to nearest centroid,
  queries probe the ``nprobe`` nearest centroid cells.

Hyperplanes are generated deterministically (hash-based, no RNG state),
so results are reproducible run-to-run — required for the driver's re-run
semantics. Accuracy is pytest-verified as recall against brute force
(tests/test_similarity.py); an approximate op has no SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from clinical_bi_spark.functions.vectors import cosine_pandas


def _hyperplanes(dim: int, nbits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes via a hash-based LCG —
    reproducible across runs/processes without RNG state."""
    planes = []
    state = (seed * 2654435761) % (1 << 31)
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            # sum of 4 uniforms ≈ gaussian (Irwin–Hall), good enough for LSH
            acc = 0.0
            for _ in range(4):
                state = (state * 1103515245 + 12345) % (1 << 31)
                acc += state / (1 << 31)
            row.append(acc - 2.0)
        planes.append(row)
    return planes


def signature_col(emb: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-LSH signature as a bigint bucket id (nbits ≤ 63) — pure
    Catalyst form (HOF-interpreted; kept as the dependency-free reference
    implementation; the operators below use the Arrow-vectorized
    :func:`signature_pandas`)."""
    arr = emb.cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(arr, plane_lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def signature_pandas(emb: F.Column, planes: list[list[float]]) -> F.Column:
    """Arrow-vectorized sign-LSH signature: one numpy matmul per batch
    (batch × dim) @ (dim × nbits) → sign bits packed into a long.
    Identical output to signature_col (same planes, same >= 0 rule)."""
    plane_matrix = [list(p) for p in planes]

    @pandas_udf("long")
    def _sig(x: pd.Series) -> pd.Series:
        planes_np = np.asarray(plane_matrix, dtype=np.float64)  # nbits × dim
        xm = np.vstack(x.values).astype(np.float64)  # batch × dim
        bits = (xm @ planes_np.T) >= 0.0  # batch × nbits
        weights = (1 << np.arange(bits.shape[1])).astype(np.int64)
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return _sig(emb)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    nbits: int = 8,
    max_hamming: int = 2,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: join corpus and queries whose LSH signatures are within
    ``max_hamming`` bits, rank candidates by exact cosine.

    The corpus side computes its signature once (narrow); the join is on
    signature proximity via a broadcast of the (tiny) query signatures.
    At 100 TB: corpus signatures can be precomputed/persisted, and the
    bucket join prunes the scan to matching buckets.
    """
    planes = _hyperplanes(dim, nbits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        signature_pandas(F.col(emb_col), planes).alias("c_sig"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(emb_col).alias("q_emb"),
        signature_pandas(F.col(emb_col), planes).alias("q_sig"),
    )
    cand = c.join(
        F.broadcast(q),
        (F.bit_count(F.col("c_sig").bitwiseXOR(F.col("q_sig"))) <= max_hamming)
        & (F.col("neighbor_id") != F.col("q_id")),
    )
    cos = F.round(cosine_pandas(F.col("c_emb"), F.col("q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style ANN: deterministic centroids = the ``n_cells`` corpus
    vectors with the lowest ids (cheap, reproducible coarse quantizer —
    a k-means refinement is a drop-in upgrade). Every corpus row joins its
    nearest cell; a query probes its ``nprobe`` nearest cells only.
    """
    centroids = (
        corpus.orderBy(F.col(id_col)).limit(n_cells)
        .select(
            F.col(id_col).alias("cell_id"), F.col(emb_col).alias("cell_emb")
        )
    )
    cos_cell = cosine_pandas(F.col(emb_col), F.col("cell_emb"))

    # assign each corpus row to its best cell (broadcast centroids, rank 1)
    assigned = (
        corpus.crossJoin(F.broadcast(centroids))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).alias("c_emb"),
            F.col("cell_id"),
            cos_cell.alias("cell_cos"),
        )
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("neighbor_id").orderBy(F.col("cell_cos").desc(), F.col("cell_id"))
        ))
        .filter(F.col("rnk") == 1)
        .drop("rnk", "cell_cos")
    )

    # queries probe their nprobe best cells
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(emb_col).alias("q_emb"),
            F.col("cell_id"),
            cos_cell.alias("cell_cos"),
        )
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("q_id").orderBy(F.col("cell_cos").desc(), F.col("cell_id"))
        ))
        .filter(F.col("rnk") <= nprobe)
        .drop("rnk", "cell_cos")
    )

    cand = assigned.join(probes, "cell_id").filter(
        F.col("neighbor_id") != F.col("q_id")
    )
    cos = F.round(cosine_pandas(F.col("c_emb"), F.col("q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
