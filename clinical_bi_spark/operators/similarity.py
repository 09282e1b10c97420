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

from clinical_bi_spark.caching import persist_tracked
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from clinical_bi_spark.functions.vectors import cosine_pandas, cosine_similarity


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


def _hamming_ball_masks(nbits: int, max_hamming: int) -> list[int]:
    """All XOR masks with ≤ max_hamming bits set over nbits positions —
    the multi-probe expansion of one signature into its Hamming ball."""
    import itertools

    masks = []
    for radius in range(max_hamming + 1):
        for bits in itertools.combinations(range(nbits), radius):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


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
    exact_arithmetic: bool = False,
) -> DataFrame:
    """ANN top-k via a true bucket EQUI-join: each query signature is
    expanded (multi-probe) into every signature in its Hamming ball
    (``sum_{i<=h} C(nbits, i)`` probe keys — 93 for nbits=8, h=3), and the
    corpus joins its exact signature against the broadcast probe table.

    A (query, corpus) pair within distance ≤ h matches exactly one probe
    mask, so the expansion introduces no duplicate candidates. The corpus
    side computes its signature once and is ONLY touched by a hash lookup
    on the bucket key — no nested-loop predicate evaluation per row pair —
    which is what makes the shape survive large query batches at 100 TB
    (corpus signatures can be precomputed/persisted; the probe table stays
    |queries| × ball-size, broadcastable until millions of queries, after
    which the same plan shuffles on the signature key).

    ``exact_arithmetic=True`` computes signatures and the cosine ranking
    with the sequential-order Catalyst forms (signature_col /
    cosine_similarity) instead of the numpy batch forms — bit-reproducible
    against DuckDB list arithmetic, which is what lets the registry query
    carry an exact SQL oracle (same technique as
    ``embedding_neardup_pairs``). Both the multi-probe expansion AND the
    deterministic (cos DESC, neighbor_id) tie-break are then exactly
    recomputable in SQL: given the signatures, probing the Hamming ball
    equals the naive ``bit_count(xor) <= h`` pair predicate, so the
    all-pairs oracle also proves the expansion loses no candidate.
    A differential test pins the fast path ≡ exact path on the fixture.
    """
    planes = _hyperplanes(dim, nbits, seed)

    def _sig(col: F.Column) -> F.Column:
        if exact_arithmetic:
            return signature_col(col, planes)
        return signature_pandas(col, planes)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        _sig(F.col(emb_col)).alias("c_sig"),
    )
    masks = _hamming_ball_masks(nbits, max_hamming)
    # expand after computing the signature once (avoid re-running the UDF
    # per mask): explode a literal mask array XORed against the signature
    q_sig = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(emb_col).alias("q_emb"),
        _sig(F.col(emb_col)).alias("sig"),
    )
    mask_arr = F.array(*[F.lit(m).cast("long") for m in masks])
    probes = q_sig.select(
        "q_id",
        "q_emb",
        F.explode(F.transform(mask_arr, lambda m: F.col("sig").bitwiseXOR(m))).alias(
            "c_sig"
        ),
    )
    cand = c.join(F.broadcast(probes), "c_sig").filter(
        F.col("neighbor_id") != F.col("q_id")
    )
    cos_fn = cosine_similarity if exact_arithmetic else cosine_pandas
    cos = F.round(cos_fn(F.col("c_emb"), F.col("q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _kmeans_centroids(
    corpus: DataFrame,
    emb_col: str,
    n_cells: int,
    max_iter: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Distributed Lloyd's iterations via Spark ML KMeans (k-means||
    init): the real IVF coarse quantizer. Centroid learning is one
    distributed fit over the corpus; the resulting (tiny) centroid table
    broadcasts everywhere downstream."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        array_to_vector(F.col(emb_col).cast("array<double>")).alias("features")
    )
    # cosine distance ⇒ spherical k-means: cells partition directions, not
    # magnitudes — the right quantizer when the probe metric is cosine
    # (Euclidean centroids of high-dim data collapse toward the origin and
    # give unbalanced cosine cells)
    model = KMeans(
        k=n_cells, maxIter=max_iter, seed=seed, distanceMeasure="cosine"
    ).fit(vecs)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return corpus.sparkSession.createDataFrame(
        rows, "cell_id int, cell_emb array<double>"
    )


def det_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_cells: int = 16,
    n_train: int = 512,
    iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Deterministic spherical Lloyd's fit — every float operation has a
    pinned order, so the ENTIRE quantizer is replicable in ANSI SQL
    (unrolled CTEs) and the IVF query it feeds carries an exact oracle.

    Three determinism devices:
    * bounded training sample = the ``n_train`` lowest-id vectors (the
      standard IVF practice of fitting the codebook on a sample — FAISS
      trains on a subset too — which is also what keeps the sorted folds
      below driver/task-memory bounds at any corpus size);
    * init = the ``n_cells`` lowest-id sample vectors; assignment =
      argmax sequential cosine with (cos DESC, cell_id) tie-break;
    * update = elementwise sum of member embeddings folded in ascending
      vec_id order — NO normalization step, because cosine is
      scale-invariant in the centroid (cos(x, a*c) = cos(x, c)), so the
      raw sorted-order sum is a valid spherical centroid and the update
      contains no division or sqrt to diverge. A cell that loses all
      members keeps its previous centroid (left join + coalesce).

    Fixed ``iters`` Lloyd rounds (no convergence test — determinism over
    optimality); recall floors for the resulting quantizer are pinned in
    tests/test_similarity.py."""
    train = (
        corpus.orderBy(F.col(id_col))
        .limit(n_train)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(emb_col).cast("array<double>").alias("emb"),
        )
    )
    cent = (
        train.orderBy("vec_id")
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("int")
            .alias("cell_id"),
            F.col("emb").alias("cell_emb"),
        )
    )
    # sorted-order elementwise fold: bit-identical however Spark
    # partitions, and equal to DuckDB's list_reduce over the same order
    sum_expr = F.expr(
        "aggregate("
        "transform(array_sort(collect_list(struct(vec_id, emb))), x -> x.emb),"
        f" array_repeat(0.0D, {dim}),"
        " (a, b) -> zip_with(a, b, (p, q) -> p + q))"
    )
    for _ in range(iters):
        cos = cosine_similarity(F.col("emb"), F.col("cell_emb"))
        assigned = (
            train.crossJoin(F.broadcast(cent))
            .select("vec_id", "emb", "cell_id", cos.alias("cell_cos"))
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(
                        F.col("cell_cos").desc(), F.col("cell_id")
                    )
                ),
            )
            .filter(F.col("rnk") == 1)
        )
        sums = assigned.groupBy("cell_id").agg(sum_expr.alias("s_emb"))
        cent = cent.join(sums, "cell_id", "left").select(
            "cell_id", F.coalesce("s_emb", "cell_emb").alias("cell_emb")
        )
    return cent


def det_kmeans_rows(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_cells: int = 16,
    n_train: int = 512,
    iters: int = 3,
    dim: int = 64,
) -> list[tuple[int, list[float]]]:
    """:func:`det_kmeans_centroids` executed DRIVER-SIDE, bit-for-bit.

    The Spark-plan fit is deterministic precisely because every float
    operation has a pinned order — which also means plain Python can
    replay it exactly (CPython floats and JVM doubles are both IEEE 754
    binary64 with round-to-nearest; +, *, / are correctly rounded in
    both, ``math.sqrt`` and ``Math.sqrt`` are the IEEE sqrt). Replayed
    here: sequential fold dot/norm in element order, argmax assignment
    with the (cos DESC, cell_id ASC) tie-break, member-embedding sums
    folded in ascending vec_id order, empty cells keeping their previous
    centroid. Differential-pinned equal to the Spark plan in
    tests/test_similarity.py.

    Why it exists (r11): the lazy fit is ~6 tiny shuffle stages per
    consumer plus a deep plan that recompiles under every reuse — a
    fixed ~1.5-2 s of orchestration for 512 x 64 doubles of actual math.
    The training sample is the SAME bounded lowest-id sample the plan
    form reads (the accepted .collect() census pattern: <=512 rows for a
    model fit); a 100 TB corpus ships exactly the same 512 vectors.
    """
    rows = (
        corpus.orderBy(F.col(id_col))
        .limit(n_train)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(emb_col).cast("array<double>").alias("emb"),
        )
        .collect()
    )
    train = sorted(
        ((r.vec_id, list(r.emb)) for r in rows), key=lambda t: t[0]
    )

    def dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a: list[float]) -> float:
        import math

        acc = 0.0
        for v in a:
            acc = acc + v * v
        return math.sqrt(acc)

    def cos(a: list[float], b: list[float]) -> float:
        denom = norm(a) * norm(b)
        return dot(a, b) / denom if denom > 0 else 0.0

    # the plan form's limit(n_cells) yields FEWER cells when the corpus
    # is smaller than n_cells (single-document probe regime) — replicate
    # that, not a hardcoded range (the r11 megadoc probe caught the
    # IndexError at birth)
    cent = [emb for _vid, emb in train[:n_cells]]
    k = len(cent)
    for _ in range(iters):
        sums: dict[int, list[float]] = {}
        for _vid, emb in train:  # ascending vec_id — the fold order
            best_cell, best_cos = 0, None
            for cid, c in enumerate(cent):
                cc = cos(emb, c)
                if best_cos is None or cc > best_cos:
                    best_cell, best_cos = cid, cc
                # ties keep the LOWER cell_id (cos DESC, cell_id ASC)
            acc = sums.setdefault(best_cell, [0.0] * dim)
            for i, v in enumerate(emb):
                acc[i] = acc[i] + v
        cent = [sums.get(cid, cent[cid]) for cid in range(k)]
    return [(cid, cent[cid]) for cid in range(k)]


def np_kmeans_rows(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_cells: int = 1024,
    n_train: int = 4096,
    iters: int = 3,
) -> list[tuple[int, list[float]]]:
    """Vectorized numpy twin of :func:`det_kmeans_rows` for the LARGE-K
    scale path. Same structure — bounded lowest-id training sample,
    argmax-cosine assignment with first-max (lowest cell_id) tie-break,
    unnormalized member sums, empty cells keep their previous centroid,
    cell count capped at the sample size — but batch numpy arithmetic,
    so it is NOT bit-identical to the sequential fold. The adjudicated
    K=16 SemDeDup query therefore keeps :func:`det_kmeans_rows`; this
    fit exists because the pure-Python replay is O(iters*n_train*K*dim)
    scalar ops (~4e8 at K=1024 / n_train=4096 — minutes), while the
    matmul form is milliseconds. Web-scale K is a production-approximate
    regime by construction (the SemDeDup paper's own fit is MiniBatch
    k-means); determinism (fixed sample, fixed op order within numpy)
    is retained so reruns reproduce."""
    rows = (
        corpus.orderBy(F.col(id_col))
        .limit(n_train)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(emb_col).cast("array<double>").alias("emb"),
        )
        .collect()
    )
    if not rows:
        # empty corpus: no codebook (a 1-D empty ndarray would crash the
        # axis=1 norms below — the degenerate-probe crash class)
        return []
    train = np.array(
        [list(r.emb) for r in sorted(rows, key=lambda r: r.vec_id)],
        dtype=np.float64,
    )
    cent = train[: min(n_cells, len(train))].copy()
    tnorm = np.linalg.norm(train, axis=1)
    tnorm[tnorm == 0.0] = 1.0
    tn = train / tnorm[:, None]
    for _ in range(iters):
        cnorm = np.linalg.norm(cent, axis=1)
        cnorm[cnorm == 0.0] = 1.0
        best = np.argmax(tn @ (cent / cnorm[:, None]).T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, best, train)
        hit = np.zeros(len(cent), dtype=bool)
        hit[np.unique(best)] = True
        cent = np.where(hit[:, None], sums, cent)
    return [(cid, [float(v) for v in cent[cid]]) for cid in range(len(cent))]


def coarse_shards(
    cent_embs: list[list[float]], n_coarse: int, iters: int = 3
) -> tuple[list[tuple[int, list[float]]], list[int]]:
    """Two-level IVF: cluster the K fine centroids themselves into
    ``n_coarse`` coarse cells (numpy Lloyd over a K x dim matrix —
    driver-trivial at any realistic K). Returns the coarse codebook rows
    and ``shard_of`` (fine cell_id -> coarse shard id). A vector then
    probes the ``nprobe`` nearest coarse cells and argmaxes only over
    those shards' fine centroids: assignment cost drops from O(N*K) to
    O(N*(n_coarse + nprobe*K/n_coarse)) — the escape hatch PERF.md's
    r11 K-sweep named when the broadcast argmax overtook at K=256."""
    if not len(cent_embs):
        return [], []
    cent = np.asarray(cent_embs, dtype=np.float64)
    k = len(cent)
    coarse = cent[: min(n_coarse, k)].copy()
    norms = np.linalg.norm(cent, axis=1)
    norms[norms == 0.0] = 1.0
    cn = cent / norms[:, None]
    for _ in range(iters):
        gnorm = np.linalg.norm(coarse, axis=1)
        gnorm[gnorm == 0.0] = 1.0
        best = np.argmax(cn @ (coarse / gnorm[:, None]).T, axis=1)
        sums = np.zeros_like(coarse)
        np.add.at(sums, best, cent)
        hit = np.zeros(len(coarse), dtype=bool)
        hit[np.unique(best)] = True
        coarse = np.where(hit[:, None], sums, coarse)
    gnorm = np.linalg.norm(coarse, axis=1)
    gnorm[gnorm == 0.0] = 1.0
    shard_of = np.argmax(cn @ (coarse / gnorm[:, None]).T, axis=1)
    rows = [
        (sid, [float(v) for v in coarse[sid]]) for sid in range(len(coarse))
    ]
    return rows, [int(s) for s in shard_of]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_centroids: bool = True,
    exact_arithmetic: bool = False,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer (default; seeded Spark ML
    KMeans fit — deterministic run-to-run) or, with
    ``kmeans_centroids=False``, the dependency-free fallback of taking
    the ``n_cells`` lowest-id corpus vectors. Every corpus row joins its
    nearest cell; a query probes its ``nprobe`` nearest cells only.

    ``exact_arithmetic=True`` scores cell assignment, probes, and the
    candidate verify with the sequential-order Catalyst cosine
    (functions.vectors.cosine_similarity) instead of the numpy batch
    form — bit-reproducible against DuckDB. Combined with the
    deterministic fallback centroids this makes the ENTIRE IVF pipeline
    (assignment, multi-probe, candidate equi-join, ranked top-k) exactly
    SQL-oracle-checkable; only the learned k-means quantizer itself
    stays outside the oracle's reach (the same boundary the sign-LSH
    graduation drew in r6). Passing ``centroids`` explicitly (e.g. the
    deterministic :func:`det_kmeans_centroids` fit) overrides both
    built-in quantizers — with that fit the oracle covers the quantizer
    TRAINING too, which is how the registered ``sim_ann_ivf`` carries a
    fully exact oracle.
    """
    if centroids is not None:
        pass
    elif kmeans_centroids:
        centroids = _kmeans_centroids(corpus, emb_col, n_cells)
    else:
        centroids = (
            corpus.orderBy(F.col(id_col)).limit(n_cells)
            .select(
                F.col(id_col).alias("cell_id"), F.col(emb_col).alias("cell_emb")
            )
        )
    cos_fn = cosine_similarity if exact_arithmetic else cosine_pandas
    cos_cell = cos_fn(F.col(emb_col), F.col("cell_emb"))

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

    # the probe side is |queries| x nprobe rows — broadcast it explicitly
    # (r16 optimization): the planner cannot size the post-window probe
    # relation and picked a SortMergeJoin, which exchanged AND sorted the
    # whole assigned corpus by cell_id — an n_cells-ary hot-key
    # partitioning (16 distinct keys), a skew magnet at scale. The query
    # set is small by the operator's contract (the same bound that lets
    # sim_bruteforce_topk broadcast its query side), so with the hint the
    # corpus side is never shuffled on cell_id at all.
    cand = assigned.join(F.broadcast(probes), "cell_id").filter(
        F.col("neighbor_id") != F.col("q_id")
    )
    cos = F.round(cos_fn(F.col("c_emb"), F.col("q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    nbits: int = 32,
    max_hamming: int = 6,
    min_cosine: float = 0.8,
    dim: int = 64,
    seed: int = 42,
    exact_arithmetic: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at corpus scale — the unblocked LSH
    path for the oracle-checked ``dedup_embedding_cosine`` (which bounds
    its pair space with an attribute block instead).

    ``exact_arithmetic=True`` computes signatures and the cosine verify
    with the sequential-order Catalyst forms (signature_col /
    cosine_similarity) instead of the numpy batch forms — bit-reproducible
    against DuckDB, which is what lets the registry query carry an exact
    SQL oracle. The two arithmetics can only disagree where a dot product
    sits within float rounding of zero (sign flip) — tests assert the
    paths produce identical output on the fixtures.

    Pigeonhole bucketing (same scheme as SimHash's
    ``simhash_blocked_pairs``): the ``nbits`` sign-LSH signature splits
    into ``max_hamming + 1`` segments; any pair within Hamming distance
    ``max_hamming`` agrees exactly on at least one segment, so candidates
    come from an EQUI-join on (segment index, segment value) — no all-pairs
    scan. Candidates are prefiltered by whole-signature Hamming distance,
    then verified with exact cosine >= ``min_cosine``.

    Recall is governed by the signature: a pair at cosine c agrees per bit
    with p = 1 - arccos(c)/pi, so true near-dups (c >= 0.9 -> p ~ 0.90)
    match a segment with probability ~1 - (1 - p^(nbits/b))^b ~ 0.99+,
    while weakly-similar pairs rarely collide — which is what keeps bucket
    sizes (and the candidate join) bounded on real, clustered corpora.
    """
    planes = _hyperplanes(dim, nbits, seed)
    sig_expr = (
        signature_col(F.col(emb_col), planes)
        if exact_arithmetic
        else signature_pandas(F.col(emb_col), planes)
    )
    # one UDF pass; segments, both join sides, and verify reuse it
    sig = persist_tracked(
        df.select(
            F.col(id_col).alias("id"),
            F.col(emb_col).alias("emb"),
            sig_expr.alias("sig"),
        )
    )
    b = max_hamming + 1
    base, extra = divmod(nbits, b)
    segs, shift = [], 0
    for i in range(b):
        bits = base + (1 if i < extra else 0)
        segs.append(
            F.struct(
                F.lit(i).alias("si"),
                F.shiftrightunsigned(F.col("sig"), shift)
                .bitwiseAND(F.lit((1 << bits) - 1))
                .alias("sv"),
            )
        )
        shift += bits
    keyed = sig.select(
        "id", "sig", F.explode(F.array(*segs)).alias("seg")
    ).select("id", "sig", F.col("seg.si").alias("si"), F.col("seg.sv").alias("sv"))
    a, bb = keyed.alias("a"), keyed.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    cand = (
        a.join(bb, ["si", "sv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(hamming <= max_hamming)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # a pair agreeing on several segments appears once per segment
        .distinct()
    )
    ea = sig.select(F.col("id").alias("id_a"), F.col("emb").alias("emb_a"))
    eb = sig.select(F.col("id").alias("id_b"), F.col("emb").alias("emb_b"))
    cos_fn = cosine_similarity if exact_arithmetic else cosine_pandas
    cos = F.round(cos_fn(F.col("emb_a"), F.col("emb_b")), 6)
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
    )


def _pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    emb_col: str,
    m: int,
    ksub: int,
    dim: int,
    sample_n: int = 512,
    iters: int = 8,
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means codebooks (m x ksub x dim/m), trained
    driver-side on a deterministic corpus sample (lowest ids, strided
    seeding, fixed Lloyd iterations — reproducible run-to-run). Training
    on a bounded sample is standard PQ practice; the codebooks are tiny
    (m*ksub*dsub floats) and broadcast everywhere downstream."""
    sample = (
        corpus.select(id_col, emb_col)
        .orderBy(F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    X = np.array([r[1] for r in sample], dtype=np.float64)
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        idx = (np.arange(ksub) * max(len(sub) // ksub, 1)) % len(sub)
        cents = sub[idx].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    cents[c] = pts.mean(0)
        books.append(cents.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<int>) PQ codes — per subspace, the index of the
    nearest codebook centroid (L2). Arrow-vectorized: one gather+argmin
    per batch per subspace."""
    books = [list(map(list, b)) for b in codebooks]

    @pandas_udf("array<int>")
    def _enc(x: pd.Series) -> pd.Series:
        X = np.vstack(x.values).astype(np.float64)
        m = len(books)
        dsub = X.shape[1] // m
        out = np.empty((len(X), m), dtype=np.int32)
        for j, book in enumerate(books):
            sub = X[:, j * dsub : (j + 1) * dsub]
            cents = np.asarray(book)
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            out[:, j] = d2.argmin(1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        _enc(F.col(emb_col)).alias("codes"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    rerank: int = 50,
    exact_arithmetic: bool = False,
) -> DataFrame:
    """ANN top-k via product quantization + exact re-rank — the third leg
    of the standard ANN trio (sign-LSH buckets, IVF cells, PQ codes).

    The corpus is stored as m 4-bit-ish codes (here array<int>, m*ksub*dsub
    codebooks broadcast); the approximate distance to a query is computed
    by RECONSTRUCTING each candidate from its codes (batch gather, one
    numpy op) and taking L2 — algebraically identical to the classic
    per-query ADC lookup tables, but expressible as one Arrow-vectorized
    UDF over a crossJoin against the broadcast query batch. The best
    ``rerank`` candidates per query are re-ranked by exact cosine. At
    100 TB only the code table (m ints/vector) is scanned per query batch;
    raw vectors are touched for rerank candidates only — the crossJoin
    carries (id, codes), and the embedding table is re-joined against the
    broadcast ≤ queries×rerank survivor set."""
    actual_dim = corpus.select(F.size(emb_col)).first()[0]
    if actual_dim != dim:
        raise ValueError(
            f"pq_topk configured for dim={dim} but {emb_col} vectors have "
            f"dim={actual_dim}; pass dim explicitly (must be divisible by "
            f"m={m}) — without this check the mismatch surfaces as an "
            "opaque numpy broadcast error inside the ADC kernel"
        )
    books = _pq_codebooks(corpus, id_col, emb_col, m, ksub, dim)
    codes = persist_tracked(
        pq_encode(corpus, books, id_col, emb_col).select("id", "codes")
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb")
    )
    flat_books = [list(map(list, b)) for b in books]

    @pandas_udf("double")
    def _adc(codes_s: pd.Series, q_s: pd.Series) -> pd.Series:
        C = np.vstack(codes_s.values).astype(np.int64)  # batch x m
        Q = np.vstack(q_s.values).astype(np.float64)  # batch x dim
        mm = C.shape[1]
        dsub = Q.shape[1] // mm
        recon = np.empty_like(Q)
        for j in range(mm):
            cents = np.asarray(flat_books[j])  # ksub x dsub
            recon[:, j * dsub : (j + 1) * dsub] = cents[C[:, j]]
        return pd.Series(((Q - recon) ** 2).sum(1))

    if exact_arithmetic:
        # Catalyst SEQUENTIAL reconstruction-L2 — the adjudication form
        # (r11 graduation, the sim_ann_lsh/ivf dual-path contract): the
        # codebook is a literal m x ksub x dsub nested array, recon is a
        # concat of element_at lookups by code, and the fold over the 64
        # diffs is the left-to-right aggregate a DuckDB list_reduce
        # replays exactly. The numpy form computes the same squares but
        # reduces pairwise (8-lane tree) — ulp-level different, rank-
        # identical (differential-pinned in tests/test_similarity.py).
        dsub_ = dim // m
        books_lit = F.array(
            *[
                F.array(
                    *[
                        F.array(*[F.lit(float(v)) for v in cent])
                        for cent in book
                    ]
                )
                for book in flat_books
            ]
        )
        recon = F.concat(
            *[
                F.element_at(
                    F.element_at(books_lit, j + 1),
                    F.col("codes")[j] + F.lit(1),
                )
                for j in range(m)
            ]
        )
        diffs = F.zip_with(
            F.col("q_emb").cast("array<double>"),
            recon,
            lambda x, y: (x - y) * (x - y),
        )
        adc_expr = F.aggregate(diffs, F.lit(0.0), lambda a, v: a + v)
    else:
        adc_expr = _adc(F.col("codes"), F.col("q_emb"))

    w_adc = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("neighbor_id"))
    survivors = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("q_id"))
        .select(
            "q_id",
            "q_emb",
            F.col("id").alias("neighbor_id"),
            adc_expr.alias("adc"),
        )
        .withColumn("adc_rnk", F.row_number().over(w_adc))
        .filter(F.col("adc_rnk") <= rerank)
    )
    # exact-rerank join: the survivor set (≤ |queries|·rerank rows) is
    # broadcast against the embedding table, so raw vectors stream through
    # a hash lookup only — never the corpus×queries stage above
    emb_tbl = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb")
    )
    cand = emb_tbl.join(F.broadcast(survivors), "neighbor_id")
    cos_fn = cosine_similarity if exact_arithmetic else cosine_pandas
    cos = F.round(cos_fn(F.col("c_emb"), F.col("q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
