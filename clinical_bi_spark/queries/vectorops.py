"""Similarity-search queries over the embeddings table (array<float>, 64-d).

Brute-force cosine top-k is the exact baseline (oracle-checked against
DuckDB's list_cosine_similarity on DOUBLE[]); the LSH-bucketed ANN variant
in operators/similarity.py is the 100 TB path and is pytest-verified
against this baseline (recall ≥ threshold), since an approximate result has
no SQL oracle by construction.

Scale notes: the query side is broadcast (k query vectors), the corpus side
streams — no shuffle; cost is a single pass over the corpus per batch of
queries. All arithmetic is double-precision sequential (functions/vectors.py)
so Spark and DuckDB agree bit-for-bit after rounding.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clinical_bi_spark.functions.vectors import cosine_similarity, l2_norm
from clinical_bi_spark.queries import query
from clinical_bi_spark.session import tune
from clinical_bi_spark.sources import load_tables

_TOPK_ORACLE = """
SELECT q_id, neighbor_id, cos_sim, rank
FROM (
  SELECT
    q.vec_id AS q_id,
    e.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
      AS cos_sim,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY q.vec_id
      ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 6) DESC,
               e.vec_id) AS INT) AS rank
  FROM embeddings e, embeddings q
  WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id
) t
WHERE rank <= 5
"""


@query("sim_bruteforce_topk", oracle=_TOPK_ORACLE, bench=True)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN by cosine: broadcast the query vectors, stream the
    corpus, row_number window per query. Ties broken on (rounded cosine,
    vec_id) so ranks are engine-independent."""
    t = load_tables(tune(spark), sf_dir)
    emb = t.embeddings
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    cos = F.round(cosine_similarity(F.col("c_emb"), F.col("q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        corpus.crossJoin(F.broadcast(queries_df))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


_NEARDUP_ORACLE = """
SELECT vec_a, vec_b, cos_sim
FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cos_sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id AND a.label = b.label
) t
WHERE cos_sim >= 0.4
"""


@query("dedup_embedding_cosine", oracle=_NEARDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4, blocked by label to
    bound the pair space — the unblocked scale path is the LSH variant in
    operators/similarity.py). The fixture has no planted near-dups (max
    pairwise cosine ≈ 0.51), so the threshold sits where real pairs exist."""
    t = load_tables(tune(spark), sf_dir)
    a = t.embeddings.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = t.embeddings.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
    )
    cos = F.round(cosine_similarity(F.col("emb_a"), F.col("emb_b")), 6)
    return (
        a.join(b, (F.col("vec_a") < F.col("vec_b")) & (F.col("label_a") == F.col("label_b")))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
    )


_NORMS_ORACLE = """
SELECT
  label,
  COUNT(*) AS n_vectors,
  ROUND(AVG(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 6)
    AS avg_l2_norm
FROM embeddings
GROUP BY label
"""


@query("vec_norm_rollup", oracle=_NORMS_ORACLE)
def vec_norm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm rollup — array higher-order math feeding an
    ordinary hash aggregate (sanity stats before any ANN indexing)."""
    t = load_tables(tune(spark), sf_dir)
    return (
        t.embeddings.select("label", l2_norm(F.col("embedding")).alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("norm"), 6).alias("avg_l2_norm"),
        )
    )


def _exact_arith_enabled() -> bool:
    """Whether oracle-graduated ANN queries run their SEQUENTIAL
    exact-arithmetic signature/cosine path (bit-identical to the DuckDB
    oracle — the adjudication form) or the vectorized numpy fast path
    (the production form, differential-pinned equal to the exact path in
    tests/test_similarity.py). The exact path costs a measured 2.2x on
    sim_ann_lsh (BENCH_r06 2.241s vs r5's 1.008s — PERF.md round-7
    entry), so bench.py sets CLINICAL_BI_EXACT_ARITH=0 to measure the
    path production callers get; adjudication/correctness runs default
    on. Consumers: sim_ann_lsh (r7), sim_ann_ivf's probe/rank cosine
    (r8 — its deterministic FIT stays exact unconditionally), and
    sim_ann_pq's ADC/rerank (r11 graduation). The old
    CLINICAL_BI_ANN_RECALL recall-annotation twin died with the r11 PQ
    graduation — every ANN leg is exactly oracled now, so the
    annotation helpers were removed outright. Parity is additionally pinned AT THE BENCH SF
    (tests/test_similarity.py::test_ann_lsh_exact_arith_parity_at_bench_sf,
    r7 ADVICE item)."""
    return os.environ.get("CLINICAL_BI_EXACT_ARITH", "1") != "0"


def _ann_lsh_oracle(
    nbits: int = 8, max_hamming: int = 3, k: int = 5,
    dim: int = 64, seed: int = 42,
) -> str:
    """Exact DuckDB twin of the multi-probe sign-LSH top-k pipeline.

    Same technique that graduated ``dedup_embedding_lsh`` in r5:
    hyperplanes are deterministic dyadic rationals embedded as
    repr-roundtrip literals; signatures are sequential-order list
    arithmetic (bit-identical to Catalyst's signature_col). Given the
    signatures, the operator's Hamming-BALL probe expansion + bucket
    equi-join admits candidate c for query q IFF
    ``bit_count(xor(sig_q, sig_c)) <= max_hamming`` — so the oracle is
    written as that NAIVE all-pairs predicate, and a green driver row
    also proves the 93-mask expansion loses no candidate. Ranking
    (ROUND(cos,6) DESC, neighbor_id) is deterministic, so top-k matches
    row-for-row."""
    from clinical_bi_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, nbits, seed)
    plane_rows = ",\n    ".join(
        "({}, [{}])".format(i, ", ".join(repr(v) for v in row))
        for i, row in enumerate(planes)
    )
    return f"""
WITH pl(i, plane) AS (VALUES
    {plane_rows}
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), dots AS (
  SELECT e.vec_id, pl.i,
         list_sum(list_transform(range(1, {dim + 1}),
                                 j -> emb[j] * plane[j])) AS dot
  FROM e, pl
), sig AS (
  SELECT vec_id,
         SUM(CASE WHEN dot >= 0 THEN 1::BIGINT << i ELSE 0::BIGINT END) AS sig
  FROM dots GROUP BY vec_id
), es AS (
  SELECT s.vec_id, s.sig, e.emb FROM sig s JOIN e ON e.vec_id = s.vec_id
)
SELECT q_id, neighbor_id, cos_sim, rank
FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(c.emb, q.emb), 6) AS cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY ROUND(list_cosine_similarity(c.emb, q.emb), 6) DESC,
                    c.vec_id) AS INT) AS rank
  FROM es q
  JOIN es c
    ON bit_count(xor(q.sig, c.sig)) <= {max_hamming}
   AND c.vec_id <> q.vec_id
  WHERE q.vec_id < 8
) t
WHERE rank <= {k}
"""


@query("sim_ann_lsh", oracle=_ann_lsh_oracle(), bench=True)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-LSH bucketing + multi-probe (operators/similarity):
    the 100 TB path for sim_bruteforce_topk. RECALL-approximate vs exact
    k-NN, but the pipeline itself (signature → Hamming-ball probe →
    bucket join → cosine rank) is deterministic, so with
    sequential-arithmetic signatures it carries an EXACT SQL oracle: the
    naive bit_count(xor)<=h all-pairs form, whose green driver row also
    proves the multi-probe expansion loses no candidate (the r5
    dedup_embedding_lsh technique). The former rows-only self-evidence
    (recall@k annotation) is superseded by the oracle; recall floors vs
    brute force stay pinned in tests/test_similarity.py, and the
    numpy fast path is differential-pinned to this exact path.

    Adjudication runs the exact-arithmetic path (default); bench.py
    flips CLINICAL_BI_EXACT_ARITH=0 to measure the numpy production
    path instead — exactness costs a measured 2.2x (PERF.md round-7),
    and the differential pin is what licenses timing one while
    adjudicating the other."""
    from clinical_bi_spark.operators.similarity import lsh_bucket_topk

    t = load_tables(tune(spark), sf_dir)
    emb = t.embeddings
    # nbits=8 / max_hamming=3 ≈ 0.65 recall on near-random 64-d vectors
    # (measured; real embedding corpora cluster and do far better) while
    # pruning most of the corpus per query.
    return lsh_bucket_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, nbits=8, max_hamming=3,
        exact_arithmetic=_exact_arith_enabled(),
    )


def _ivf_det_oracle(
    n_cells: int = 16, nprobe: int = 4, k: int = 5,
    dim: int = 64, n_train: int = 512, iters: int = 3,
) -> str:
    """Exact DuckDB twin of the FULL deterministic-k-means IVF pipeline —
    quantizer training included (the r7 graduation the r6
    ``sim_ann_ivf_exact`` variant prepared: that query proved the
    assignment→probe→rank plumbing exact with a fixed quantizer; this
    oracle additionally unrolls the Lloyd's fit itself as chained CTEs).

    Each iteration = one argmax-cosine assignment (ROW_NUMBER with
    (cos DESC, cell_id) tie-break, same as Spark) and one elementwise
    member-sum folded in ascending vec_id order (list_reduce over a
    zeros-prepended sorted list — the same float-addition order as
    Catalyst's ``aggregate``). No normalization: cosine is
    scale-invariant in the centroid, so the raw sum IS the spherical
    centroid and the update has no division to diverge."""
    zeros = f"list_transform(range(1, {dim + 1}), x -> 0.0::DOUBLE)"
    parts = [f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), train AS (
  SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {n_train}
), cent0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         emb AS cell_emb
  FROM (SELECT vec_id, emb FROM train ORDER BY vec_id LIMIT {n_cells}) t0
)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""", assign{i} AS (
  SELECT vec_id, emb, cell_id FROM (
    SELECT t.vec_id, t.emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
             ORDER BY list_cosine_similarity(t.emb, c.cell_emb) DESC,
                      c.cell_id) AS rnk
    FROM train t CROSS JOIN cent{p} c
  ) a WHERE rnk = 1
), cent{i} AS (
  SELECT c.cell_id, COALESCE(s.s_emb, c.cell_emb) AS cell_emb
  FROM cent{p} c LEFT JOIN (
    SELECT cell_id,
           list_reduce(
             list_prepend({zeros},
               list_transform(
                 list_sort(list(struct_pack(v := vec_id, m := emb))),
                 x -> x.m)),
             (a, b) -> list_transform(range(1, {dim + 1}),
                                      j -> a[j] + b[j])) AS s_emb
    FROM assign{i} GROUP BY cell_id
  ) s ON s.cell_id = c.cell_id
)""")
    parts.append(f""", assigned AS (
  SELECT neighbor_id, c_emb, cell_id FROM (
    SELECT e.vec_id AS neighbor_id, e.emb AS c_emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.emb, c.cell_emb) DESC,
                      c.cell_id) AS rnk
    FROM e CROSS JOIN cent{iters} c
  ) a WHERE rnk = 1
), probes AS (
  SELECT q_id, q_emb, cell_id FROM (
    SELECT q.vec_id AS q_id, q.emb AS q_emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.emb, c.cell_emb) DESC,
                      c.cell_id) AS rnk
    FROM e q CROSS JOIN cent{iters} c WHERE q.vec_id < 8
  ) p WHERE rnk <= {nprobe}
), cand AS (
  SELECT p.q_id, a.neighbor_id,
         ROUND(list_cosine_similarity(a.c_emb, p.q_emb), 6) AS cos_sim
  FROM assigned a JOIN probes p USING (cell_id)
  WHERE a.neighbor_id <> p.q_id
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM cand
) r WHERE rank <= {k}""")
    return "".join(parts)


@query("sim_ann_ivf", oracle=_ivf_det_oracle(), bench=True)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF coarse quantization, nprobe=4 of 16 cells —
    GRADUATED to a fully exact oracle in r7: the quantizer is the
    deterministic sequential-arithmetic Lloyd's fit
    (operators/similarity.det_kmeans_centroids — bounded lowest-id
    training sample, argmax-cosine assignment, sorted-fold unnormalized
    centroid sums, fixed 3 iterations), so the oracle covers TRAINING +
    assignment + multi-probe + rank end to end; nothing about this query
    is learned-opaque anymore. The Spark-ML seeded k-means codebook
    remains available (``ivf_topk(kmeans_centroids=True)``) as the
    learned alternative — recall floors for both quantizers are pinned
    in tests/test_similarity.py. The probe/rank cosine path follows the
    CLINICAL_BI_EXACT_ARITH dual-path contract (r8, same as
    sim_ann_lsh): driver adjudication runs the sequential
    exact-arithmetic form (default ON), bench.py times the numpy
    production form — differential-pinned row-for-row in
    tests/test_similarity.py. The deterministic FIT is unconditional:
    its determinism is the oracle's foundation either way."""
    from clinical_bi_spark.operators.similarity import (
        det_kmeans_rows,
        ivf_topk,
    )

    t = load_tables(tune(spark), sf_dir)
    # NULL-embedding rows excluded on both index and query sides (the
    # null-skipping convention; see _semdedup_pipeline) — crash class
    # found by the r16 nulls probe; IsNotNull pushes to the scan and the
    # non-null fixtures adjudicate unchanged.
    emb = t.embeddings.filter(F.col("embedding").isNotNull())
    # r11: the fit runs driver-side, bit-for-bit (det_kmeans_rows — see
    # the SemDeDup note; differential-pinned against the plan form), so
    # the codebook is a 16-row literal instead of a deep lazy subtree
    # that recompiled under the assignment, probe, and verify consumers
    cent = spark.createDataFrame(
        det_kmeans_rows(emb, n_cells=16, n_train=512, iters=3),
        schema="cell_id int, cell_emb array<double>",
    )
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_cells=16,
        nprobe=4,
        centroids=cent,
        exact_arithmetic=_exact_arith_enabled(),
    )


def _embedding_lsh_oracle(
    nbits: int = 32, max_hamming: int = 10, min_cosine: float = 0.4,
    dim: int = 64, seed: int = 42,
) -> str:
    """Exact DuckDB twin of the sign-LSH near-dup pipeline. The hyperplanes
    are deterministic dyadic rationals (LCG sums of k/2^31 terms — exactly
    representable in float64), embedded below as repr-roundtrip literals;
    the Spark query computes signatures and the cosine verify with the
    SEQUENTIAL-order Catalyst forms, which match DuckDB's list arithmetic
    bit-for-bit (the property sim_bruteforce_topk's oracle already pins).
    The oracle is the naive all-pairs form over exact signatures — the
    pigeonhole segment join provably loses no pair within the Hamming
    radius, so the driver check also proves the bucketing exact."""
    from clinical_bi_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, nbits, seed)
    plane_rows = ",\n    ".join(
        "({}, [{}])".format(i, ", ".join(repr(v) for v in row))
        for i, row in enumerate(planes)
    )
    return f"""
WITH pl(i, plane) AS (VALUES
    {plane_rows}
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), dots AS (
  SELECT e.vec_id, pl.i,
         list_sum(list_transform(range(1, {dim + 1}),
                                 j -> emb[j] * plane[j])) AS dot
  FROM e, pl
), sig AS (
  SELECT vec_id,
         SUM(CASE WHEN dot >= 0 THEN 1::BIGINT << i ELSE 0::BIGINT END) AS sig
  FROM dots GROUP BY vec_id
), es AS (
  SELECT s.vec_id, s.sig, e.emb FROM sig s JOIN e ON e.vec_id = s.vec_id
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos_sim
FROM es a JOIN es b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
  AND ROUND(list_cosine_similarity(a.emb, b.emb), 6) >= {min_cosine}
"""


@query("dedup_embedding_lsh", oracle=_embedding_lsh_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over the UNBLOCKED corpus via
    sign-LSH pigeonhole bucketing + exact-cosine verify — the 100 TB path
    for dedup_embedding_cosine (which blocks by label instead). The
    candidate generation is RECALL-approximate in general, but within the
    Hamming radius the pigeonhole segment join is exact, so the output
    equals the all-pairs form — and with sequential-arithmetic signatures
    (exact_arithmetic=True) the DuckDB oracle reproduces it value-exactly.
    tests/test_similarity.py additionally verifies planted-duplicate
    recall and that the numpy production path emits identical output.
    The 0.4 threshold sits where the fixture has pairs at all (max
    pairwise cosine ≈ 0.51 on near-random vectors)."""
    from clinical_bi_spark.operators.similarity import embedding_neardup_pairs

    t = load_tables(tune(spark), sf_dir)
    return embedding_neardup_pairs(
        t.embeddings, id_col="vec_id", emb_col="embedding",
        nbits=32, max_hamming=10, min_cosine=0.4, exact_arithmetic=True,
    )


def _pq_det_oracle(
    k: int = 5,
    rerank: int = 50,
    sample_n: int = 512,
    m: int = 8,
    ksub: int = 16,
    dsub: int = 8,
    iters: int = 8,
) -> str:
    """Exact DuckDB twin of the FULL PQ pipeline — numpy training
    included (r11 graduation; the third ANN leg joins lsh/ivf as fully
    adjudicable). Every float operation the Spark side performs has a
    pinned order, replicated here term by term:

    * the trainer's per-cell column means are numpy's axis-0 reduction,
      which IS the sequential member-order fold — ``list_reduce(list(x
      ORDER BY vec_id), +) / count`` replays it exactly;
    * the trainer's and encoder's dsub=8 L2 distances reduce with
      numpy's 8-term pairwise TREE ``((d0+d1)+(d2+d3))+((d4+d5)+(d6+d7))``
      (verified: np.sum(8) is the tree, NOT a left fold), with squares
      written ``x*x`` (POWER(x,2) routes through libm pow and diverges);
    * the strided codebook init is integer arithmetic
      ``(c * max(n//ksub, 1)) % n`` over the id-ordered sample;
    * the ADC distance and rerank cosine in the ADJUDICATED Spark path
      (exact_arithmetic=True) are sequential Catalyst folds, replayed by
      ``list_reduce`` / ``list_cosine_similarity`` (the device the
      sim_bruteforce_topk oracle already pins bit-for-bit).

    All-pairs ADC here is the ORACLE's deliberate naivety (8 queries x
    corpus at sf0.01); the Spark side scans the m-int code table.
    """
    dim = m * dsub
    xs = ", ".join(f"e[sid * {dsub} + {kk + 1}] AS x{kk}" for kk in range(dsub))

    def tree8(expr) -> str:
        t = [expr(kk) for kk in range(8)]
        return (
            f"((({t[0]} + {t[1]}) + ({t[2]} + {t[3]})) + "
            f"(({t[4]} + {t[5]}) + ({t[6]} + {t[7]})))"
        )

    d2 = tree8(lambda kk: f"(p.x{kk} - c.x{kk}) * (p.x{kk} - c.x{kk})")
    means = ", ".join(
        f"list_reduce(list(x{kk} ORDER BY vec_id), (a, b) -> a + b)"
        f" / CAST(COUNT(*) AS DOUBLE) AS m{kk}"
        for kk in range(dsub)
    )
    keep = ", ".join(
        f"COALESCE(u.m{kk}, c.x{kk}) AS x{kk}" for kk in range(dsub)
    )
    cols = ", ".join(f"x{kk}" for kk in range(dsub))
    parts = [
        f"""
WITH samp AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings ORDER BY vec_id LIMIT {sample_n}
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM samp),
sub AS MATERIALIZED (
  SELECT s.sid, vec_id, {xs}
  FROM samp, (SELECT UNNEST(range({m})) AS sid) s
), rn AS (
  SELECT sid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY sid ORDER BY vec_id) - 1 AS pos,
         {cols}
  FROM sub
), cent0 AS MATERIALIZED (
  SELECT r.sid, cp.cell, {", ".join(f"r.x{kk}" for kk in range(dsub))}
  FROM rn r JOIN (
    SELECT CAST(c AS INT) AS cell,
           (c * GREATEST((SELECT n FROM nn) // {ksub}, 1))
             % (SELECT n FROM nn) AS pos
    FROM (SELECT UNNEST(range({ksub})) AS c)
  ) cp ON r.pos = cp.pos
)"""
    ]
    prev = "cent0"
    for t in range(1, iters + 1):
        parts.append(
            f""",
a{t} AS MATERIALIZED (
  SELECT p.sid, p.vec_id, c.cell, {", ".join(f"p.x{kk}" for kk in range(dsub))},
         ROW_NUMBER() OVER (
           PARTITION BY p.sid, p.vec_id
           ORDER BY {d2}, c.cell) AS rnk
  FROM sub p JOIN {prev} c ON p.sid = c.sid
), u{t} AS MATERIALIZED (
  SELECT sid, cell, {means}
  FROM a{t} WHERE rnk = 1 GROUP BY sid, cell
), cent{t} AS MATERIALIZED (
  SELECT c.sid, c.cell, {keep}
  FROM {prev} c LEFT JOIN u{t} u ON u.sid = c.sid AND u.cell = c.cell
)"""
        )
        prev = f"cent{t}"
    parts.append(
        f""",
corp AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), csub AS MATERIALIZED (
  SELECT s.sid, vec_id, {xs}
  FROM corp, (SELECT UNNEST(range({m})) AS sid) s
), enc AS (
  SELECT p.sid, p.vec_id, c.cell,
         ROW_NUMBER() OVER (
           PARTITION BY p.sid, p.vec_id
           ORDER BY {d2}, c.cell) AS rnk
  FROM csub p JOIN {prev} c ON p.sid = c.sid
), codes AS MATERIALIZED (SELECT sid, vec_id, cell FROM enc WHERE rnk = 1),
recon AS MATERIALIZED (
  SELECT k.vec_id,
         flatten(list([{", ".join(f"c.x{kk}" for kk in range(dsub))}]
                      ORDER BY k.sid)) AS re
  FROM codes k JOIN {prev} c ON c.sid = k.sid AND c.cell = k.cell
  GROUP BY k.vec_id
), adc AS (
  SELECT q.vec_id AS q_id, r.vec_id AS neighbor_id,
         list_reduce(
           list_transform(range(1, {dim + 1}),
             i -> (q.e[i] - r.re[i]) * (q.e[i] - r.re[i])),
           (a, b) -> a + b) AS adc
  FROM corp q JOIN recon r ON r.vec_id <> q.vec_id
  WHERE q.vec_id < 8
), surv AS (
  SELECT q_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, neighbor_id)
           AS adc_rnk
  FROM adc
)
SELECT q_id, neighbor_id, cos_sim, rank FROM (
  SELECT s.q_id, s.neighbor_id,
         ROUND(list_cosine_similarity(ce.embedding::DOUBLE[],
                                      qe.embedding::DOUBLE[]), 6) AS cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY s.q_id
           ORDER BY ROUND(list_cosine_similarity(ce.embedding::DOUBLE[],
                                                 qe.embedding::DOUBLE[]), 6)
                    DESC, s.neighbor_id) AS INT) AS rank
  FROM surv s
  JOIN embeddings ce ON ce.vec_id = s.neighbor_id
  JOIN embeddings qe ON qe.vec_id = s.q_id
  WHERE s.adc_rnk <= {rerank}
) t WHERE rank <= {k}"""
    )
    return "".join(parts)


@query("sim_ann_pq", oracle=_pq_det_oracle())
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via product quantization (8 subspaces × 16 centroids,
    reconstruction-ADC, exact-cosine re-rank of the best 50) — the third
    leg of the ANN trio next to sim_ann_lsh and sim_ann_ivf.

    GRADUATED to a fully exact oracle in r11 (closing the trio): the
    numpy trainer was verified float-op-for-float-op replicable in SQL
    (sequential column means, pairwise-tree dsub distances — see
    _pq_det_oracle), so the oracle covers TRAINING + encode + ADC +
    rerank end to end. The recall@k annotation is superseded by the
    oracle (the lsh/ivf move); the floor now lives in
    tests/test_similarity.py against the brute-force registry query.
    ADC + rerank follow the CLINICAL_BI_EXACT_ARITH dual-path contract:
    driver adjudication runs sequential Catalyst folds (default ON),
    bench.py times the numpy batch form — differential-pinned
    rank-identical in tests/test_similarity.py. At scale only the m-int
    code table is scanned per query batch; raw vectors are read for
    rerank candidates only."""
    from clinical_bi_spark.operators.similarity import pq_topk

    t = load_tables(tune(spark), sf_dir)
    emb = t.embeddings
    return pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=5,
        exact_arithmetic=_exact_arith_enabled(),
    )


# ---------------------------------------------------------------------------
# Higher-order array-function battery (Catalyst lambda surface).
# ---------------------------------------------------------------------------

# Every metric is a per-row lambda pipeline over the embedding array —
# transform / filter / aggregate(fold) / zip_with(reverse) / sort — with
# all float arithmetic widened element-wise to double (exact: float32 ->
# double is lossless) and folded STRICTLY left-to-right in both engines
# (Spark `aggregate` and DuckDB `list_reduce` are both sequential), so
# the doubles are bit-identical, no tolerance needed. Output columns are
# scalars on purpose: the driver's canonicalizer sorts rows by every
# column and array cells would crash it (round-1 lesson).
_ARRAY_BATTERY_ORACLE = """
SELECT vec_id AS vec_id,
       label AS label,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       list_reduce(
         list_prepend(0.0::DOUBLE, CAST(embedding AS DOUBLE[])),
         (a, b) -> a + b) AS sum_emb,
       sqrt(list_reduce(
         list_prepend(0.0::DOUBLE,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         (a, b) -> a + b)) AS l2_norm,
       CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs,
       CAST(list_sort(embedding)[32] AS DOUBLE) AS med_lo,
       list_reduce(
         list_prepend(0.0::DOUBLE,
           list_transform(CAST(embedding AS DOUBLE[]),
             (x, i) -> x * CAST(list_reverse(embedding)[i] AS DOUBLE))),
         (a, b) -> a + b) AS dot_rev,
       len(list_filter(embedding, x -> abs(x) > 2.0)) > 0 AS has_big
FROM embeddings
"""


@query("f_array_battery", oracle=_ARRAY_BATTERY_ORACLE)
def f_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst higher-order-function battery over the embedding column:
    transform / filter / aggregate-fold / zip_with-with-reverse / sort /
    exists, each reduced to a scalar and exactly oracled against DuckDB's
    list lambdas (see _ARRAY_BATTERY_ORACLE for the bit-identity
    argument). Zero shuffle — a narrow JVM-side map over parquet splits,
    the shape that scales linearly with executors; none of this touches
    Python."""
    t = load_tables(tune(spark), sf_dir)
    return t.embeddings.select(
        "vec_id",
        "label",
        F.expr("CAST(size(filter(embedding, x -> x > 0)) AS INT)").alias("n_pos"),
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),"
            " 0.0D, (a, b) -> a + b)"
        ).alias("sum_emb"),
        F.expr(
            "sqrt(aggregate(transform(embedding,"
            " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0.0D, (a, b) -> a + b))"
        ).alias("l2_norm"),
        F.expr(
            "CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)"
        ).alias("max_abs"),
        F.expr("CAST(sort_array(embedding)[31] AS DOUBLE)").alias("med_lo"),
        F.expr(
            "aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)),"
            " transform(reverse(embedding), x -> CAST(x AS DOUBLE)),"
            " (x, y) -> x * y), 0.0D, (a, b) -> a + b)"
        ).alias("dot_rev"),
        F.expr("exists(embedding, x -> abs(x) > 2.0F)").alias("has_big"),
    )


# ---------------------------------------------------------------------------
# IVF ANN with a deterministic quantizer — full exact oracle.
# ---------------------------------------------------------------------------

# The k-means IVF (sim_ann_ivf) is rows-only because the quantizer is
# learned; THIS variant swaps in the deterministic lowest-id centroid
# fallback + sequential-arithmetic cosine, making the entire IVF
# pipeline — cell assignment, multi-probe selection, candidate
# equi-join, ranked top-k — exactly SQL-checkable. Same boundary the
# sign-LSH graduation drew: the mechanics get an exact oracle, only the
# learned codebook stays outside it.
_IVF_EXACT_ORACLE = """
WITH cent AS (
  SELECT vec_id AS cell_id, embedding AS cell_emb
  FROM embeddings ORDER BY vec_id LIMIT 16
), assigned AS (
  SELECT neighbor_id, c_emb, cell_id FROM (
    SELECT e.vec_id AS neighbor_id, e.embedding AS c_emb, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
                                             c.cell_emb::DOUBLE[]) DESC,
                      c.cell_id) AS rnk
    FROM embeddings e, cent c
  ) a WHERE rnk = 1
), probes AS (
  SELECT q_id, q_emb, cell_id FROM (
    SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                             c.cell_emb::DOUBLE[]) DESC,
                      c.cell_id) AS rnk
    FROM embeddings q, cent c WHERE q.vec_id < 8
  ) p WHERE rnk <= 4
), cand AS (
  SELECT p.q_id, a.neighbor_id,
         ROUND(list_cosine_similarity(a.c_emb::DOUBLE[],
                                      p.q_emb::DOUBLE[]), 6) AS cos_sim
  FROM assigned a JOIN probes p USING (cell_id)
  WHERE a.neighbor_id <> p.q_id
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM cand
) r WHERE rank <= 5
"""


@query("sim_ann_ivf_exact", oracle=_IVF_EXACT_ORACLE)
def sim_ann_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the deterministic lowest-id quantizer and
    sequential-arithmetic cosine — the exactly-adjudicable form of the
    IVF mechanics (see _IVF_EXACT_ORACLE). The production path swaps the
    quantizer for the seeded k-means codebook (sim_ann_ivf) with
    identical assignment/probe/join/rank plumbing — THIS query is what
    proves that plumbing correct."""
    from clinical_bi_spark.operators.similarity import ivf_topk

    t = load_tables(tune(spark), sf_dir)
    emb = t.embeddings
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_cells=16,
        nprobe=4,
        kmeans_centroids=False,
        exact_arithmetic=True,
    )


# ---------------------------------------------------------------------------
# Deterministic PCA: top principal direction via power iteration (r8) —
# the same determinism-over-optimality graduation the IVF Lloyd's fit
# made. Every float operation has a pinned order, so the whole fit
# unrolls into chained SQL CTEs and the query carries an EXACT oracle:
#   * bounded training sample = the 512 lowest-id vectors (FAISS-style
#     sample training; also what keeps the sorted fold under task
#     memory at any corpus size);
#   * v0 = all-ones; iterate v <- sum_i (x_i . v) x_i with the dot a
#     sequential left fold over dimensions and the row sum a sorted
#     (vec_id-ascending) elementwise fold — no normalization INSIDE the
#     loop (power iteration is scale-invariant until readout, so the
#     update has no division/sqrt to diverge);
#   * readout = v / ||v|| with the correctly-rounded sqrt.
# ---------------------------------------------------------------------------

_PCA_DIM = 64
_PCA_TRAIN = 512
_PCA_ITERS = 3


def _pca_power_oracle(
    dim: int = _PCA_DIM, n_train: int = _PCA_TRAIN, iters: int = _PCA_ITERS
) -> str:
    zeros = f"list_transform(range(1, {dim + 1}), x -> 0.0::DOUBLE)"

    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, {dim + 1}), j -> {a}[CAST(j AS INT)]"
            f" * {b}[CAST(j AS INT)])), (acc, p) -> acc + p)"
        )

    parts = [f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), train AS (
  SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {n_train}
), v0 AS (
  SELECT list_transform(range(1, {dim + 1}), x -> 1.0::DOUBLE) AS v
)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""", it{i} AS (
  SELECT list_reduce(
           list_prepend({zeros},
             list_transform(
               list_sort(list(struct_pack(k := vec_id, m := scaled))),
               x -> x.m)),
           (a, b) -> list_transform(range(1, {dim + 1}),
                                    j -> a[CAST(j AS INT)] + b[CAST(j AS INT)]))
           AS v
  FROM (
    SELECT t.vec_id,
           list_transform(t.emb, el -> el * {dot("t.emb", "w.v")}) AS scaled
    FROM train t, it{p} w
  ) s
)""".replace("it0", "v0"))
    parts.append(f"""
SELECT CAST(j AS INT) AS dim_idx,
       f.v[CAST(j AS INT)]
         / sqrt({dot("f.v", "f.v")}) AS component
FROM it{iters} f, UNNEST(range(1, {dim + 1})) AS t(j)
""")
    return "".join(parts)


@query("vec_pca_power_top1", oracle=_pca_power_oracle())
def vec_pca_power_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by 3 fixed power
    iterations over the 512 lowest-id training sample — EXACTLY oracled
    end to end (fit + readout), the det_kmeans_centroids recipe applied
    to spectral decomposition. Scale shape: iterations touch only the
    bounded sample (the sorted fold is 512 rows regardless of corpus
    size); the corpus-wide step a full PCA pipeline adds — projecting
    every vector onto the component — is an embarrassingly parallel
    map (vec_norm_rollup's shape), not part of the fit."""
    t = load_tables(tune(spark), sf_dir)
    dim, n_train, iters = _PCA_DIM, _PCA_TRAIN, _PCA_ITERS
    train = (
        t.embeddings.orderBy("vec_id")
        .limit(n_train)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    spark_sess = spark
    v_df = spark_sess.range(1).select(
        F.expr(f"array_repeat(1.0D, {dim})").alias("v")
    )
    sum_expr = F.expr(
        "aggregate("
        "transform(array_sort(collect_list(struct(vec_id, scaled))), x -> x.scaled),"
        f" array_repeat(0.0D, {dim}),"
        " (a, b) -> zip_with(a, b, (p, q) -> p + q))"
    )
    from clinical_bi_spark.functions.vectors import dot_product

    for _ in range(iters):
        coef = dot_product(F.col("emb"), F.col("v"))
        scaled_rows = train.crossJoin(F.broadcast(v_df)).select(
            "vec_id", F.transform(F.col("emb"), lambda el: el * coef).alias("scaled")
        )
        v_df = scaled_rows.agg(sum_expr.alias("v"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # try_divide: a degenerate (all-zero) training sample drives the
    # iterate to the zero vector — component undefined, NULL on both
    # engines (DuckDB's division NULLs), not an ANSI crash (r9 sweep)
    return v_df.select(
        F.posexplode(F.transform(F.col("v"), lambda el: F.try_divide(el, norm)))
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim_idx"),
        F.col("col").alias("component"),
    )


# ---------------------------------------------------------------------------
# SemDeDup — cluster-then-prune semantic dedup.
#
# Landed r10 undecorated (the r10 adjudication window was committed before
# it, and the staleness arithmetic capped r10 registry growth at the two
# queries that landed pre-window); REGISTERED r11 before that round's
# window commit, leading the window as never-adjudicated, exactly per the
# plan written here in r10. Oracle parity and behavior tests in
# tests/test_similarity.py; bench floor + scale rows recorded at birth
# (scripts/scaleup_r11cand.py, PERF.md).
# ---------------------------------------------------------------------------

_SEMDEDUP_EPS = 0.4  # where the fixture has pairs at all (max cos ~ 0.513)


def _semdedup_oracle(
    n_cells: int = 16, dim: int = 64, n_train: int = 512, iters: int = 3,
    eps: float = 0.4,
) -> str:
    """Exact DuckDB twin of the FULL SemDeDup pipeline — deterministic
    k-means training included (the same unrolled-CTE device as
    ``_ivf_det_oracle``; kept textually separate so the r7-adjudicated
    sim_ann_ivf oracle string stays byte-identical), then intra-cluster
    eps-neighbor pairs and the keep-the-outlier drop rule on ROUND(cos, 6)
    values so both engines order identically."""
    zeros = f"list_transform(range(1, {dim + 1}), x -> 0.0::DOUBLE)"
    parts = [f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), train AS (
  SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {n_train}
), cent0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         emb AS cell_emb
  FROM (SELECT vec_id, emb FROM train ORDER BY vec_id LIMIT {n_cells}) t0
)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""", assign{i} AS (
  SELECT vec_id, emb, cell_id FROM (
    SELECT t.vec_id, t.emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
             ORDER BY list_cosine_similarity(t.emb, c.cell_emb) DESC,
                      c.cell_id) AS rnk
    FROM train t CROSS JOIN cent{p} c
  ) a WHERE rnk = 1
), cent{i} AS (
  SELECT c.cell_id, COALESCE(s.s_emb, c.cell_emb) AS cell_emb
  FROM cent{p} c LEFT JOIN (
    SELECT cell_id,
           list_reduce(
             list_prepend({zeros},
               list_transform(
                 list_sort(list(struct_pack(v := vec_id, m := emb))),
                 x -> x.m)),
             (a, b) -> list_transform(range(1, {dim + 1}),
                                      j -> a[j] + b[j])) AS s_emb
    FROM assign{i} GROUP BY cell_id
  ) s ON s.cell_id = c.cell_id
)""")
    parts.append(f""", assigned AS (
  SELECT vec_id, emb, cell_id, ROUND(cc, 6) AS cent_cos FROM (
    SELECT e.vec_id, e.emb, c.cell_id,
           list_cosine_similarity(e.emb, c.cell_emb) AS cc,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.emb, c.cell_emb) DESC,
                      c.cell_id) AS rnk
    FROM e CROSS JOIN cent{iters} c
  ) a WHERE rnk = 1
), pairs AS (
  SELECT a.vec_id AS va, a.cent_cos AS ca, b.vec_id AS vb, b.cent_cos AS cb
  FROM assigned a JOIN assigned b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.emb, b.emb), 6) >= {eps}
), nbr AS (
  SELECT va AS vec_id, ca AS d_cos, vb AS n_id, cb AS n_cos FROM pairs
  UNION ALL
  SELECT vb, cb, va, ca FROM pairs
), verdict AS (
  SELECT vec_id,
         CAST(COUNT(*) AS BIGINT) AS n_neighbors,
         BOOL_OR(n_cos < d_cos OR (n_cos = d_cos AND n_id < vec_id))
           AS dropped
  FROM nbr GROUP BY vec_id
)
SELECT a.vec_id, a.cell_id, a.cent_cos,
       COALESCE(v.n_neighbors, 0) AS n_neighbors,
       COALESCE(v.dropped, FALSE) AS dropped
FROM assigned a LEFT JOIN verdict v ON v.vec_id = a.vec_id""")
    return "".join(parts)


@query("dedup_semantic_cluster", oracle=_semdedup_oracle(), bench=True)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster-scoped semantic dedup over the embedding corpus
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540 — the published
    scale recipe: k-means the embeddings, then look for near-duplicates
    ONLY within each cluster, never across the whole corpus).

    Pipeline, all exactly oracle-replicable:
    1. quantizer = the deterministic spherical Lloyd's fit
       (operators/similarity.det_kmeans_centroids — the sim_ann_ivf
       machinery, 16 cells, bounded lowest-id training sample);
    2. every vector joins its argmax-cosine cell (broadcast centroid
       table, no shuffle on the corpus side beyond the cell_id exchange);
    3. eps-neighbor pairs (cos >= 0.4, rounded to 6) via an intra-cell
       self-join — the SemDeDup cost model: sum over cells of |cell|^2
       instead of corpus^2;
    4. drop rule = keep-the-outlier, the deterministic non-iterative
       variant of the paper's keep-low-centroid-similarity policy: a
       vector is dropped iff some eps-neighbor in its cell has strictly
       lower ROUND(centroid-cosine, 6) (ties to the lower vec_id). Every
       eps-neighborhood component keeps >= 1 survivor (its minimal
       (cent_cos, vec_id) member has no smaller neighbor), pinned in
       tests/test_similarity.py.

    100 TB posture: cells are the unit of work — K grows with the corpus
    (the paper uses K ~ 10k-100k at web scale) so the per-cell pair join
    stays bounded and the cell_id hash exchange shards evenly across
    executors; the centroid table stays broadcast-sized; nothing is
    all-pairs. Pairs crossing cluster boundaries are missed BY DESIGN
    (the paper's documented recall trade for tractability); the exact
    in-cluster semantics are what the DuckDB oracle replicates, training
    included. Reference has no counterpart (extension surface).
    """
    t = load_tables(tune(spark), sf_dir)
    return _semdedup_pipeline(spark, t.embeddings, n_cells=16)


def _semdedup_pipeline(
    spark: SparkSession,
    embeddings: DataFrame,
    n_cells: int = 16,
    eps: float = _SEMDEDUP_EPS,
    assign_shards: int | None = None,
    nprobe: int = 4,
    n_train: int = 512,
) -> DataFrame:
    """The SemDeDup pipeline over an explicit embedding relation with a
    parameterized K — the registered query pins K=16 (what the oracle
    unrolls); scripts/scaleup_r11cand.py sweeps K upward on a replicated
    corpus to measure the paper's own scaling lever (K grows with the
    corpus, so sum(|cell|^2) — the pair-join cost — falls as ~1/K for a
    fixed corpus).

    ``assign_shards`` selects the LARGE-K production assignment (r11
    verdict Next #7): the broadcast argmax is O(N*K) and overtook the
    pair-join saving at K=256 in the r11 sweep, so web-scale K needs
    IVF-sharded assignment — the fine codebook (numpy scale-path fit,
    :func:`~clinical_bi_spark.operators.similarity.np_kmeans_rows`) is
    itself clustered into ``assign_shards`` coarse cells
    (:func:`~clinical_bi_spark.operators.similarity.coarse_shards`); a
    vector probes its ``nprobe`` nearest coarse cells and argmaxes only
    over those shards' fine centroids, O(N*(C + nprobe*K/C)). With
    ``nprobe >= assign_shards`` every shard is probed and the assignment
    equals the broadcast argmax exactly (pinned in
    tests/test_similarity.py); below that it is the standard IVF recall
    trade, which moves only cross-cell eps pairs, never planted exact
    copies (copies share every cosine, hence every probe list). The
    adjudicated K=16 query never takes this branch.
    ``assign_shards=0`` is the A/B baseline arm: the numpy fit with the
    ORIGINAL flat broadcast argmax — same codebook as the sharded form,
    so scripts/scaleup_semdedup_sharded.py isolates the assignment
    structure's cost."""
    from clinical_bi_spark.operators.similarity import (
        coarse_shards,
        det_kmeans_rows,
        np_kmeans_rows,
    )

    # NULL-embedding rows are EXCLUDED (the null-skipping aggregate
    # convention): a NULL vector can be neither trained on, assigned,
    # nor cosine-compared — without the filter the driver-side fit
    # crashes on list(None) (r16 nulls probe). IsNotNull pushes to the
    # parquet scan; the fixtures are non-null, so adjudicated results
    # are unchanged.
    embeddings = embeddings.filter(F.col("embedding").isNotNull())

    # Driver-side bit-exact Lloyd fit (det_kmeans_rows): the lazy
    # Spark-plan fit is ~6 tiny shuffle stages of orchestration for
    # 512 x 64 doubles of math, and its deep plan recompiles under every
    # consumer — replaying the pinned float-op order in Python is
    # bit-identical (differential test in tests/test_similarity.py) and
    # removes the fixed term (measured 4.3 -> ~2.9 s at sf0.1). The
    # n_cells-row codebook lands as a literal table, per the bounded
    # .collect() census policy (<=512-row model fits; the large-K scale
    # path raises n_train with K — same census, bigger bounded sample).
    if assign_shards is None:
        cent_rows = det_kmeans_rows(
            embeddings, id_col="vec_id", emb_col="embedding", n_cells=n_cells
        )
    else:
        cent_rows = np_kmeans_rows(
            embeddings,
            id_col="vec_id",
            emb_col="embedding",
            n_cells=n_cells,
            n_train=max(n_train, 4 * n_cells),
        )
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cc = cosine_similarity(F.col("emb"), F.col("cell_emb"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cc").desc(), F.col("cell_id"))
    if not assign_shards:
        cent = spark.createDataFrame(
            cent_rows, schema="cell_id int, cell_emb array<double>"
        )
        assigned = (
            e.crossJoin(F.broadcast(cent))
            .select("vec_id", "emb", "cell_id", cc.alias("cc"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select(
                "vec_id", "emb", "cell_id", F.round("cc", 6).alias("cent_cos")
            )
        )
    else:
        coarse_rows, shard_of = coarse_shards(
            [emb for _cid, emb in cent_rows], n_coarse=assign_shards
        )
        cent = spark.createDataFrame(
            [
                (cid, emb, shard_of[cid])
                for cid, emb in cent_rows
            ],
            schema="cell_id int, cell_emb array<double>, shard int",
        )
        crs = spark.createDataFrame(
            coarse_rows, schema="shard int, shard_emb array<double>"
        )
        scos = cosine_similarity(F.col("emb"), F.col("shard_emb"))
        w1 = Window.partitionBy("vec_id").orderBy(
            F.col("scos").desc(), F.col("shard")
        )
        # stage 1: top-nprobe coarse cells per vector (N x C rows, one
        # vec_id-keyed window); stage 2 expands each vector to only the
        # probed shards' fine centroids via a broadcast hash join —
        # N x ~nprobe*K/C rows into the same argmax window shape. Both
        # windows hash-partition on vec_id, so the second reuses the
        # first's partitioning (one Exchange between them, none after).
        probed = (
            e.crossJoin(F.broadcast(crs))
            .select("vec_id", "emb", "shard", scos.alias("scos"))
            .withColumn("prnk", F.row_number().over(w1))
            .filter(F.col("prnk") <= nprobe)
            .select("vec_id", "emb", "shard")
        )
        assigned = (
            probed.join(F.broadcast(cent), "shard")
            .select("vec_id", "emb", "cell_id", cc.alias("cc"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select(
                "vec_id", "emb", "cell_id", F.round("cc", 6).alias("cent_cos")
            )
        )
    # assigned is consumed THREE times (both pair-join sides + the final
    # verdict join) and its lineage embeds the full 3-iteration Lloyd's
    # fit; without a persist each consumer re-executes the fit and the
    # assignment window (measured 8.8 s -> 4.4 s at sf0.1 when added at
    # registration). Released at the query boundary by the bench/driver
    # (caching.release_all).
    from clinical_bi_spark.caching import persist_tracked

    assigned = persist_tracked(assigned)
    # Pair join: both sides are the SAME projection of the cached
    # assignment (renames happen AFTER the join via alias-qualified
    # refs), so the two cell_id exchanges canonicalize identically and
    # ReuseExchange shares one. The two neighbor directions come from
    # ONE pass over the joined pairs (explode of a 2-struct array), not
    # a unionAll of two projections of `pairs` — the union form planned
    # the whole SortMergeJoin subtree TWICE (4 cache-scan+exchange legs).
    s = assigned.select("vec_id", "emb", "cell_id", "cent_cos")
    pa, pb = s.alias("pa"), s.alias("pb")
    pair_cos = F.round(
        cosine_similarity(F.col("pa.emb"), F.col("pb.emb")), 6
    )
    pairs = (
        pa.join(pb, F.col("pa.cell_id") == F.col("pb.cell_id"))
        .filter(F.col("pa.vec_id") < F.col("pb.vec_id"))
        .filter(pair_cos >= F.lit(eps))
        .select(
            F.col("pa.vec_id").alias("va"), F.col("pa.cent_cos").alias("ca"),
            F.col("pb.vec_id").alias("vb"), F.col("pb.cent_cos").alias("cb"),
        )
    )
    nbr = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("va").alias("vec_id"), F.col("ca").alias("d_cos"),
                    F.col("vb").alias("n_id"), F.col("cb").alias("n_cos"),
                ),
                F.struct(
                    F.col("vb").alias("vec_id"), F.col("cb").alias("d_cos"),
                    F.col("va").alias("n_id"), F.col("ca").alias("n_cos"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    verdict = nbr.groupBy("vec_id").agg(
        F.count("*").cast("bigint").alias("n_neighbors"),
        F.bool_or(
            (F.col("n_cos") < F.col("d_cos"))
            | ((F.col("n_cos") == F.col("d_cos")) & (F.col("n_id") < F.col("vec_id")))
        ).alias("dropped"),
    )
    return (
        assigned.select("vec_id", "cell_id", "cent_cos")
        .join(verdict, "vec_id", "left")
        .select(
            "vec_id", "cell_id", "cent_cos",
            F.coalesce("n_neighbors", F.lit(0).cast("bigint")).alias("n_neighbors"),
            F.coalesce("dropped", F.lit(False)).alias("dropped"),
        )
    )
