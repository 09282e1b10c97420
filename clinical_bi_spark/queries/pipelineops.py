"""Training-data pipeline orchestration queries — the corpus-management
layer above the per-document operators: incremental (snapshot-over-
snapshot) dedup, weighted source mixing with deterministic up/down-
sampling, global shuffle + shard assignment for training order, and
chunk-level duplication scoring.

These are engine extensions (no reference analogue — the reference's
pipeline is a one-shot pandas extract, ct_data.py:99-141); they cover the
corpus-curation steps a 100 TB pretraining pipeline runs between raw
crawl and tokenizer. Everything is exactly SQL-expressible, so every
query here is oracle-checked.

Determinism contract: all sampling/ordering decisions derive from
``md5`` of stable keys (never ``rand()``), so runs are reproducible
across sessions, partitionings, AND engines — the property that makes
the DuckDB oracles exact. The first 8 md5 hex digits give an unbiased
32-bit uniform (u32 / 2^32): Spark reads it with ``conv(substr(md5(k),
1, 8), 16, 10)``, DuckDB with ``CAST('0x' || substr(md5(k), 1, 8) AS
UBIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_bi_spark.functions.text import doc_fingerprint
from clinical_bi_spark.queries import query
from clinical_bi_spark.session import tune
from clinical_bi_spark.sources import load_tables

#: md5-hex → 32-bit uniform, Spark side. DuckDB twin: _U32_SQL.
_U32_DENOM = float(1 << 32)


def _u32(key: F.Column) -> F.Column:
    """First 8 md5 hex digits of ``key`` as a bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


_U32_SQL = "CAST('0x' || substr(md5({key}), 1, 8) AS UBIGINT)"

_NORM_FP_SQL = "md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"


# ---------------------------------------------------------------------------
# Incremental snapshot dedup: a new crawl arrives; keep only the documents
# whose content was never seen — neither in the accepted corpus nor earlier
# in the same batch. The cutoff (half the id range) stands in for the
# snapshot boundary a production pipeline gets from ingest metadata.
# ---------------------------------------------------------------------------

_INCREMENTAL_ORACLE = f"""
WITH cut AS (
  SELECT CAST(FLOOR(MAX(doc_id) / 2) AS BIGINT) AS cutoff FROM documents
), fp AS (
  SELECT doc_id, source, {_NORM_FP_SQL.format(col='text')} AS fingerprint
  FROM documents
), existing AS (
  SELECT DISTINCT fingerprint FROM fp, cut WHERE doc_id < cutoff
), incoming AS (
  SELECT fp.* FROM fp, cut WHERE doc_id >= cutoff
), batch_first AS (
  SELECT fingerprint, MIN(doc_id) AS doc_id FROM incoming GROUP BY fingerprint
)
SELECT i.doc_id, i.source, i.fingerprint
FROM incoming i
JOIN batch_first b ON b.fingerprint = i.fingerprint AND b.doc_id = i.doc_id
WHERE i.fingerprint NOT IN (SELECT fingerprint FROM existing)
"""


@query("dedup_incremental", oracle=_INCREMENTAL_ORACLE, bench=True)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot dedup: fingerprint the incoming batch, keep
    each content's first (min doc_id) occurrence within the batch, then
    anti-join against the accepted corpus's fingerprint set. Only 16-byte
    fingerprints + ids ever shuffle — never text — and the accepted side
    needs just its fingerprint column (at 100 TB that column is the thing
    a pipeline keeps hot between crawls; text stays cold). Both joins are
    fingerprint equi-joins, so the plan is two hash joins with no
    wide-row movement."""
    t = load_tables(tune(spark), sf_dir)
    fp = t.documents.select(
        "doc_id", "source", doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    # the snapshot boundary is ONE scalar: read it driver-side (a tiny
    # max-aggregate job — same accepted pattern as the PQ training
    # sample) and inline it as a literal. The previous
    # crossJoin(broadcast(one-row-agg)) form planned as a
    # BroadcastNestedLoopJoin that duplicated into both consumer
    # branches; a literal keeps the plan pure equi-join + filter, and
    # the filter pushes down to the scan.
    cutoff = t.documents.agg(
        F.floor(F.max("doc_id") / 2).cast("bigint")
    ).collect()[0][0]
    existing = fp.filter(F.col("doc_id") < F.lit(cutoff)).select("fingerprint")
    incoming = fp.filter(F.col("doc_id") >= F.lit(cutoff))
    batch_first = incoming.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        incoming.join(batch_first, ["fingerprint", "doc_id"], "left_semi")
        .join(existing, "fingerprint", "left_anti")
        .select("doc_id", "source", "fingerprint")
    )


# ---------------------------------------------------------------------------
# Weighted source mixing: every corpus source gets a mixture weight; weight
# w emits floor(w) guaranteed copies of each document plus one more with
# probability frac(w) — deterministic per doc_id, so the sampled multiset
# is reproducible. (Weights here key off the source number to give all
# three regimes: 0.5 = downsample, 1.0 = keep, 2.5 = upsample.)
# ---------------------------------------------------------------------------

_MIX_WEIGHT_SQL = """CASE CAST(substr(source, 4) AS INT) % 3
  WHEN 0 THEN 0.5 WHEN 1 THEN 1.0 ELSE 2.5 END"""

_MIXTURE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source,
         {_MIX_WEIGHT_SQL} AS wt,
         {_U32_SQL.format(key="doc_id::VARCHAR || ':mix'")} / 4294967296.0 AS u
  FROM documents
), n AS (
  SELECT doc_id, source,
         CAST(FLOOR(wt) + CASE WHEN u < wt - FLOOR(wt) THEN 1 ELSE 0 END
              AS INT) AS n_copies
  FROM w
)
SELECT doc_id, source,
       CAST(UNNEST(range(1, n_copies + 1)) AS INT) AS copy_id
FROM n
"""


@query("data_mixture_sample", oracle=_MIXTURE_ORACLE)
def data_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted source mixing (the sampling step that turns
    corpus weights into an epoch plan): n_copies = floor(w) + Bernoulli
    (frac(w)) with the coin = md5(doc_id || ':mix') — reproducible across
    runs, partitionings, and engines. Copies materialize as an exploded
    ``sequence`` (narrow, no shuffle, no rand()); rows with n_copies = 0
    vanish with the empty array. At 100 TB this is a pure map stage —
    the explode fan-out lands on whatever partition held the row."""
    t = load_tables(tune(spark), sf_dir)
    srcnum = F.substring("source", 4, 10).cast("int")
    wt = (
        F.when(srcnum % 3 == 0, F.lit(0.5))
        .when(srcnum % 3 == 1, F.lit(1.0))
        .otherwise(F.lit(2.5))
    )
    u = _u32(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))) / F.lit(
        _U32_DENOM
    )
    n_copies = (
        F.floor(wt) + F.when(u < wt - F.floor(wt), 1).otherwise(0)
    ).cast("int")
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array())  # sequence(1, 0) would count DOWN in Spark
    return t.documents.select(
        "doc_id", "source", F.explode(copies).alias("copy_raw")
    ).select(
        "doc_id", "source", F.col("copy_raw").cast("int").alias("copy_id")
    )


# ---------------------------------------------------------------------------
# Global shuffle + sharding: training order must be a reproducible global
# permutation, but a total ORDER BY is a single-partition sort at 100 TB.
# Standard decomposition: hash every doc into one of K shards, order
# WITHIN each shard by an independent hash — windows partition by shard,
# so K-way parallel, and the concatenation shard0||shard1||… is the
# training order. K here is 8; at scale K = O(corpus / shard_target_size).
# ---------------------------------------------------------------------------

_N_SHARDS = 8

_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         CAST({_U32_SQL.format(key="doc_id::VARCHAR || ':shard'")} % {_N_SHARDS}
              AS INT) AS shard,
         md5(doc_id::VARCHAR || ':order') AS okey
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id)
            AS BIGINT) AS pos
FROM h
"""


@query("data_global_shuffle", oracle=_SHUFFLE_ORACLE)
def data_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle for training order: shard =
    md5-hash(doc_id) mod K, position = rank within shard by an
    independent md5 ordering key. One shuffle (partition by shard), K
    parallel in-partition sorts, no SinglePartition exchange — the
    scalable twin of ``ORDER BY random()``. Same salt-separated keys
    (':shard' / ':order') on both engines make even the positions
    oracle-exact."""
    t = load_tables(tune(spark), sf_dir)
    did = F.col("doc_id").cast("string")
    shard = (_u32(F.concat(did, F.lit(":shard"))) % _N_SHARDS).cast("int")
    okey = F.md5(F.concat(did, F.lit(":order")))
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return (
        t.documents.select(
            "doc_id", shard.alias("shard"), okey.alias("okey")
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


# ---------------------------------------------------------------------------
# Chunk-level duplication score: split each document into fixed 25-word
# chunks, fingerprint each chunk, and score each document by the share of
# its chunks that occur anywhere else in the corpus — the intra-corpus
# boilerplate/template signal used to gate repetitive documents that
# whole-document dedup cannot catch.
# ---------------------------------------------------------------------------

_CHUNK_WORDS = 25

_CHUNK_DEDUP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), c AS (
  SELECT doc_id,
         md5(array_to_string(
             list_slice(words, i * {_CHUNK_WORDS} + 1,
                        i * {_CHUNK_WORDS} + {_CHUNK_WORDS}), ' ')) AS cfp
  FROM w, UNNEST(range(0, CAST(CEIL(len(words) / {_CHUNK_WORDS}.0) AS BIGINT)))
          AS t(i)
), g AS (
  SELECT cfp, COUNT(*) AS cnt FROM c GROUP BY cfp
)
SELECT c.doc_id,
       CAST(COUNT(*) AS INT) AS n_chunks,
       CAST(SUM(CASE WHEN g.cnt > 1 THEN 1 ELSE 0 END) AS INT) AS n_dup_chunks,
       ROUND(SUM(CASE WHEN g.cnt > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS dup_chunk_ratio
FROM c JOIN g USING (cfp)
GROUP BY c.doc_id
"""


@query("text_chunk_dedup", oracle=_CHUNK_DEDUP_ORACLE, bench=True)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-chunk ratio: 25-word chunks via a
    ``transform`` over ``sequence`` (one pass, no UDF), md5 per chunk,
    corpus-wide chunk counts by fingerprint groupBy, rejoined to score
    each doc. Only 16-byte chunk fingerprints shuffle (≈ n_words/25 per
    doc); text never leaves its scan partition. The fingerprint equi-join
    back to chunks is the same audited shape as the exact-dedup keeper
    join."""
    t = load_tables(tune(spark), sf_dir)
    words = F.split(F.col("text"), " ")
    idx = F.sequence(
        F.lit(0),
        F.ceil(F.size(words) / _CHUNK_WORDS).cast("int") - 1,
    )
    chunk_fps = F.transform(
        idx,
        lambda i: F.md5(
            F.array_join(
                F.slice(words, i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " "
            )
        ),
    )
    chunks = t.documents.select(
        "doc_id", F.explode(chunk_fps).alias("cfp")
    )
    counts = chunks.groupBy("cfp").agg(F.count("*").alias("cnt"))
    dup = F.when(F.col("cnt") > 1, 1).otherwise(0)
    return (
        chunks.join(counts, "cfp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum(dup).cast("int").alias("n_dup_chunks"),
            F.round(F.sum(dup) / F.count("*"), 6).alias("dup_chunk_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot diff: what changed between two corpus snapshots — the audit
# step a recurring-crawl pipeline runs before deciding what to reprocess.
# Content identity is the normalized fingerprint (same as incremental
# dedup), so renames/re-ids of identical text count as unchanged.
# ---------------------------------------------------------------------------

_SNAPSHOT_DIFF_ORACLE = f"""
WITH cut AS (
  SELECT CAST(FLOOR(MAX(doc_id) / 2) AS BIGINT) AS cutoff FROM documents
), fp AS (
  SELECT doc_id, {_NORM_FP_SQL.format(col='text')} AS fingerprint
  FROM documents
), old AS (
  SELECT DISTINCT fingerprint FROM fp, cut WHERE doc_id < cutoff
), new AS (
  SELECT DISTINCT fingerprint FROM fp, cut WHERE doc_id >= cutoff
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_fingerprints FROM (
  SELECT CASE WHEN o.fingerprint IS NULL THEN 'added'
              WHEN n.fingerprint IS NULL THEN 'removed'
              ELSE 'unchanged' END AS status
  FROM old o FULL OUTER JOIN new n ON o.fingerprint = n.fingerprint
) GROUP BY status
"""


@query("data_snapshot_diff", oracle=_SNAPSHOT_DIFF_ORACLE, bench=True)
def data_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus delta between two snapshots (old = ids below the midpoint
    cutoff, new = at/above — the dedup_incremental convention): distinct
    content fingerprints full-outer-joined and classified added /
    removed / unchanged, rolled up to counts. At 100 TB only 16-byte
    fingerprints shuffle (distinct is a map-side-combined agg; the
    full-outer join is a fingerprint equi-join) — text never moves, and
    the output is K rows."""
    t = load_tables(tune(spark), sf_dir)
    fp = t.documents.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    # driver-side scalar cutoff, same rationale as dedup_incremental:
    # a literal keeps both branches pure filters over the scan
    cutoff = t.documents.agg(
        F.floor(F.max("doc_id") / 2).cast("bigint")
    ).collect()[0][0]
    old = (
        fp.filter(F.col("doc_id") < F.lit(cutoff))
        .select(F.col("fingerprint").alias("ofp"))
        .distinct()
    )
    new = (
        fp.filter(F.col("doc_id") >= F.lit(cutoff))
        .select(F.col("fingerprint").alias("nfp"))
        .distinct()
    )
    status = (
        F.when(F.col("ofp").isNull(), F.lit("added"))
        .when(F.col("nfp").isNull(), F.lit("removed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        old.join(new, old.ofp == new.nfp, "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").cast("bigint").alias("n_fingerprints"))
    )


# ---------------------------------------------------------------------------
# Quality-stratified selection: keep the top-K documents per source by
# quality score — the budgeted-curation step that turns "score everything"
# into "train on the best N per domain" while preserving source balance.
# ---------------------------------------------------------------------------

_TOPK_PER_SOURCE = 20

_QUALITY_SELECT_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, {{quality}} AS quality FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY quality DESC, doc_id) AS rk
  FROM scored
)
SELECT doc_id, source, quality, CAST(rk AS INT) AS rank_in_source
FROM ranked WHERE rk <= {_TOPK_PER_SOURCE}
"""


def _quality_select_oracle() -> str:
    from clinical_bi_spark.queries.textops import _quality_sql

    return _QUALITY_SELECT_ORACLE.format(quality=_quality_sql())


@query("data_quality_select", oracle=_quality_select_oracle(), bench=True)
def data_quality_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted curation: top-{K} documents per source by quality score
    (deterministic tie-break on doc_id) — one shuffle on source, then
    partition-local rank; at 100 TB the per-source partitions sort only
    (doc_id, quality) pairs, never text, and skewed sources split under
    AQE. The quality expression is the curation funnel's own scorer, so
    the oracle reuses its SQL fragment."""
    from clinical_bi_spark.functions.text import quality_score

    t = load_tables(tune(spark), sf_dir)
    scored = t.documents.select(
        "doc_id", "source", quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank_in_source", F.row_number().over(w).cast("int"))
        .filter(F.col("rank_in_source") <= _TOPK_PER_SOURCE)
    )


# ---------------------------------------------------------------------------
# Temperature-based mixture resampling (alpha = 0.5).
# ---------------------------------------------------------------------------

# p_s ∝ n_s^alpha with alpha=0.5 — the standard recipe for upweighting
# small sources in an LLM mixture. alpha is 0.5 ON PURPOSE: n^0.5 is
# sqrt, an IEEE correctly-rounded op, so source rates are bit-identical
# across engines (generic pow() is not guaranteed correctly rounded).
# The denominator folds sqrt(n_s) over SOURCES IN SORTED ORDER in both
# engines (sequential list fold), so float addition order is pinned.
_TEMP_MIX_ORACLE = f"""
WITH stats AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n_s)::BIGINT AS n_total,
         list_reduce(
           list_prepend(0.0::DOUBLE,
             list_transform(list_sort(list(n_s)), x -> sqrt(CAST(x AS DOUBLE)))),
           (a, b) -> a + b) AS denom
  FROM stats
), rates AS (
  SELECT s.source,
         CAST(t.n_total AS DOUBLE) * sqrt(CAST(s.n_s AS DOUBLE)) / t.denom
           / CAST(s.n_s AS DOUBLE) AS r_s
  FROM stats s, tot t
), n AS (
  SELECT d.doc_id, d.source,
         CAST(FLOOR(r.r_s)
              + CASE WHEN {_U32_SQL.format(key="d.doc_id::VARCHAR || ':tmix'")}
                          / 4294967296.0 < r.r_s - FLOOR(r.r_s)
                     THEN 1 ELSE 0 END AS INT) AS n_copies
  FROM documents d JOIN rates r ON r.source = d.source
)
SELECT doc_id AS doc_id, source AS source,
       CAST(UNNEST(range(1, n_copies + 1)) AS INT) AS copy_id
FROM n
"""


@query("data_temperature_mixture", oracle=_TEMP_MIX_ORACLE)
def data_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixed resampling: per-source rates r_s = N * n_s^0.5
    / (sum_s' n_s'^0.5) / n_s (alpha = 0.5 upweights small sources while
    keeping the total expected size at N), per-doc copy counts via the
    md5-coin Bernoulli — fully deterministic and exactly oracled (see
    _TEMP_MIX_ORACLE for why alpha=0.5 and the sorted-fold denominator
    make the float path engine-portable). Scale shape: source stats are
    one tiny aggregate; the per-source sqrt-fold runs over a
    sources-count-sized list; rates broadcast back onto the corpus and
    the copy explosion is a pure map — same 100 TB posture as
    data_mixture_sample."""
    t = load_tables(tune(spark), sf_dir)
    stats = t.documents.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = stats.agg(
        F.sum("n_s").cast("bigint").alias("n_total"),
        F.expr(
            "aggregate(array_sort(collect_list(n_s)), 0.0D,"
            " (a, x) -> a + sqrt(CAST(x AS DOUBLE)))"
        ).alias("denom"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            F.col("n_total").cast("double")
            * F.sqrt(F.col("n_s").cast("double"))
            / F.col("denom")
            / F.col("n_s").cast("double")
        ).alias("r_s"),
    )
    u = _u32(F.concat(F.col("doc_id").cast("string"), F.lit(":tmix"))) / F.lit(
        _U32_DENOM
    )
    n_copies = (
        F.floor(F.col("r_s"))
        + F.when(u < F.col("r_s") - F.floor(F.col("r_s")), 1).otherwise(0)
    ).cast("int")
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array())
    return (
        t.documents.join(F.broadcast(rates), "source")
        .select("doc_id", "source", F.explode(copies).alias("copy_raw"))
        .select(
            "doc_id", "source", F.col("copy_raw").cast("int").alias("copy_id")
        )
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling WITHOUT replacement (r8): the A-Res /
# Efraimidis-Spirakis priority-sampling scheme from the public literature
# — each item draws u ~ Uniform(0,1] from its md5 hash and gets priority
# key -ln(u) / w; the K smallest keys are a weighted sample without
# replacement (longer documents proportionally likelier). The coin is
# md5(doc_id || ':wrs'), so the sample — including its order — is
# reproducible across runs, partitionings, and engines.
# ---------------------------------------------------------------------------

_WRS_K = 100

_WRS_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS weight,
         ({_U32_SQL.format(key="doc_id::VARCHAR || ':wrs'")} + 1)
           / 4294967296.0 AS u
  FROM documents
  WHERE length(text) > 0
), k AS (
  SELECT doc_id, weight, -ln(u) / weight AS pk FROM w
), r AS (
  SELECT doc_id, weight,
         ROW_NUMBER() OVER (ORDER BY pk, doc_id) AS pos
  FROM k
)
SELECT doc_id, weight, CAST(pos AS BIGINT) AS pos
FROM r WHERE pos <= {_WRS_K}
"""


@query("data_weighted_sample", oracle=_WRS_ORACLE)
def data_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement, deterministic (A-Res priority
    sampling, Efraimidis & Spirakis 2006): weight = document length in
    chars, u = (md5-u32 + 1) / 2^32 in (0, 1], priority -ln(u)/weight,
    keep the K = 100 smallest priorities ranked.

    Scale shape: the K-smallest selection compiles to
    TakeOrderedAndProject — per-partition top-K then a K-row merge on
    the driver side of the exchange, never a global sort — which is
    exactly the distributed-reservoir decomposition the paper's
    streaming variant describes. The final rank window runs over K rows
    only. Cross-engine float note: -ln(u)/w is IEEE double on both
    engines; rank flips would need two priorities within ~1 ulp, which
    the 32-bit-uniform coin makes negligible."""
    t = load_tables(tune(spark), sf_dir)
    u = (
        _u32(F.concat(F.col("doc_id").cast("string"), F.lit(":wrs"))) + 1
    ) / F.lit(_U32_DENOM)
    weight = F.length("text").cast("bigint")
    # zero-weight (empty) documents have sampling probability 0 BY
    # DEFINITION — excluded up front on both engines rather than letting
    # -ln(u)/0 throw under ANSI where DuckDB would NULL (r9 sweep)
    keyed = t.documents.filter(F.length("text") > 0).select(
        "doc_id",
        weight.alias("weight"),
        (-F.log(u) / weight.cast("double")).alias("pk"),
    )
    topk = keyed.orderBy("pk", "doc_id").limit(_WRS_K)
    w = Window.orderBy("pk", "doc_id")
    return topk.select(
        "doc_id",
        "weight",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
