"""Sketch queries: portable HLL distinct, count-min heavy hitters, Bloom
pre-filtered join.

Reference parity: the reference computes distinct counts and frequency
tables exactly (plain SQL over ~400k rows — e.g. the COUNT(DISTINCT)
sites in /root/reference/src/main/py/ct_data.py's condition/intervention
rollups); at 100 TB those exact forms shuffle the full key domain. These
queries are the scale substitutes, and — unlike the engine's builtin
``approx_count_distinct`` (a3, rows-only by construction) — every one is
EXACTLY adjudicable: the md5-u32 hash family (operators/sketches.py) lets
the DuckDB oracle recompute registers, cells, and bit positions
value-for-value, so the driver pins the whole approximate pipeline, not
just row counts. This is the same graduation the r5 dedup family made.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_bi_spark.functions.text import word_tokens
from clinical_bi_spark.operators.sketches import (
    _HLL_SCALE,
    bloom_build,
    bloom_probe_expr,
    countmin_cells,
    countmin_probe,
    hll_alpha_expr,
    hll_estimate,
)
from clinical_bi_spark.queries import query
from clinical_bi_spark.session import tune
from clinical_bi_spark.sources import load_tables


def _duck_md5_word(expr: str, offset: int) -> str:
    """DuckDB fragment mirroring operators.dedup._md5_word."""
    return (
        f"CAST(CAST('0x' || substr(md5({expr}), {offset}, 8) AS UBIGINT) "
        f"AS BIGINT)"
    )


_HLL_M = 256

_HLL_ORACLE = f"""
WITH hw AS (
  SELECT {_duck_md5_word("CAST(l_orderkey AS VARCHAR)", 1)} % {_HLL_M} AS bucket,
         {_duck_md5_word("CAST(l_orderkey AS VARCHAR)", 9)} AS w
  FROM lineitem
), regs AS (
  SELECT bucket,
         MAX(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS r
  FROM hw GROUP BY bucket
), agg AS (
  SELECT COUNT(*) AS used,
         SUM(CAST(1 AS BIGINT) << CAST(33 - r AS INT)) AS present
  FROM regs
), ex AS (
  SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem
), est AS (
  SELECT CAST({_HLL_M} AS INT) AS m,
         CAST(used AS BIGINT) AS buckets_used,
         CAST(present + ({_HLL_M} - used) * {_HLL_SCALE} AS BIGINT) AS sum_scaled,
         ROUND({hll_alpha_expr(_HLL_M)} * {_HLL_M}.0 * {_HLL_M}.0 * {float(_HLL_SCALE)}
               / CAST(present + ({_HLL_M} - used) * {_HLL_SCALE} AS DOUBLE), 4)
           AS est_distinct,
         CAST(exact_distinct AS BIGINT) AS exact_distinct
  FROM agg, ex
)
SELECT m, buckets_used, sum_scaled, est_distinct, exact_distinct,
       ROUND(ABS(est_distinct - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE) * 100.0, 3) AS rel_err_pct
FROM est
"""


@query("a3_hll_portable", oracle=_HLL_ORACLE)
def a3_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 at scale: HyperLogLog distinct-orderkey estimate whose REGISTERS
    the oracle recomputes exactly. Unlike `a3_approx_count_distinct`
    (Spark's builtin HLL++, opaque and rows-only), every step here is
    engine-portable integer arithmetic: md5-u32 bucket/witness words,
    integer leading-zero ranks (no log), and an integer-scaled harmonic
    sum (2^(33-rho) as BIGINT — the order-independent-sum trick
    text_lm_score established), with ONE final float division shared
    verbatim with the oracle text. The exact COUNT(DISTINCT) rides along
    so the estimate's error is visible in the output (raw estimator,
    n >> 2.5m regime by construction — see operators/sketches.py on the
    deliberately-omitted linear-counting branch).

    100 TB: the shuffle after map-side partial max is <= m=256 rows per
    partition, constant in input size — vs the full orderkey-domain
    shuffle of the exact form it substitutes for.
    """
    t = load_tables(tune(spark), sf_dir)
    est = hll_estimate(t.lineitem, "l_orderkey", _HLL_M)
    exact = t.lineitem.agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_distinct")
    )
    return (
        est.crossJoin(F.broadcast(exact))  # 1 row x 1 row
        .withColumn(
            "rel_err_pct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct").cast("double"))
                / F.col("exact_distinct").cast("double")
                * 100.0,
                3,
            ),
        )
        .select(
            "m",
            "buckets_used",
            "sum_scaled",
            "est_distinct",
            "exact_distinct",
            "rel_err_pct",
        )
    )


_CM_D, _CM_W, _CM_K = 4, 1024, 20

_CM_ORACLE = f"""
WITH tok AS (
  SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '')) AS token
  FROM documents
), occ AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM tok GROUP BY token
), top AS (
  SELECT token, true_count FROM occ
  ORDER BY true_count DESC, token LIMIT {_CM_K}
), cells AS (
  SELECT j,
         {_duck_md5_word("token", "1 + 8 * j")} % {_CM_W} AS cell,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok, (SELECT UNNEST(range(0, {_CM_D})) AS j)
  GROUP BY j, cell
), probepos AS (
  SELECT t.token, t.true_count, js.j,
         {_duck_md5_word("t.token", "1 + 8 * js.j")} % {_CM_W} AS cell
  FROM top t, (SELECT UNNEST(range(0, {_CM_D})) AS j) js
), probe AS (
  SELECT p.token, p.true_count, MIN(c.cnt) AS cm_estimate
  FROM probepos p
  JOIN cells c ON c.j = p.j AND c.cell = p.cell
  GROUP BY p.token, p.true_count
)
SELECT token, true_count, cm_estimate,
       CAST(cm_estimate - true_count AS BIGINT) AS overcount
FROM probe
"""


@query("sketch_countmin_topk", oracle=_CM_ORACLE)
def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus token occurrences, probed at the top-20
    true-frequent tokens: (token, true_count, cm_estimate, overcount).
    All-integer sketch (4 x 1024 cells, md5-u32 row hashes), so the oracle
    reproduces every cell and every min-estimate exactly — the CM
    guarantee (estimate >= truth, bounded overcount) is directly visible
    in the overcount column. The exact groupBy rides along as the
    comparator; at 100 TB only the sketch runs: its shuffle is <= 4096
    cells after map-side partial counts, constant in corpus size, which is
    the point vs the exact token groupBy it replaces (heavy-hitter
    monitoring over a training mixture without a token-domain shuffle).
    """
    t = load_tables(tune(spark), sf_dir)
    toks = t.documents.select(
        F.explode(word_tokens(F.lower(F.col("text")))).alias("token")
    )
    cells = countmin_cells(toks, "token", _CM_D, _CM_W)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("token"))
        .limit(_CM_K)
    )
    est = countmin_probe(cells, top.select("token"), "token", _CM_D, _CM_W)
    return (
        top.join(F.broadcast(est), "token")
        .withColumn(
            "overcount",
            (F.col("cm_estimate") - F.col("true_count")).cast("long"),
        )
        .select("token", "true_count", "cm_estimate", "overcount")
    )


_BLOOM_M, _BLOOM_K = 16384, 4

_BLOOM_ORACLE = f"""
WITH members AS (
  SELECT s_suppkey
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), bits AS (
  SELECT DISTINCT
         {_duck_md5_word("CAST(s_suppkey AS VARCHAR)", "1 + 8 * j")} % {_BLOOM_M} AS pos
  FROM members, (SELECT UNNEST(range(0, {_BLOOM_K})) AS j)
), fact AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_suppkey
), probepos AS (
  SELECT f.l_suppkey, f.n,
         {_duck_md5_word("CAST(f.l_suppkey AS VARCHAR)", "1 + 8 * js.j")} % {_BLOOM_M} AS pos
  FROM fact f, (SELECT UNNEST(range(0, {_BLOOM_K})) AS j) js
), probe AS (
  SELECT pp.l_suppkey, pp.n,
         SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS hits
  FROM probepos pp LEFT JOIN bits b ON b.pos = pp.pos
  GROUP BY pp.l_suppkey, pp.n
), flagged AS (
  SELECT p.l_suppkey, p.n,
         p.hits = {_BLOOM_K} AS bloom_pass,
         m.s_suppkey IS NOT NULL AS is_member
  FROM probe p LEFT JOIN members m ON p.l_suppkey = m.s_suppkey
)
SELECT CAST(SUM(n) AS BIGINT) AS fact_rows,
       CAST(SUM(CASE WHEN bloom_pass THEN n ELSE 0 END) AS BIGINT) AS bloom_pass_rows,
       CAST(SUM(CASE WHEN is_member THEN n ELSE 0 END) AS BIGINT) AS match_rows,
       CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN n ELSE 0 END)
            AS BIGINT) AS false_positive_rows,
       CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS member_keys
FROM flagged
"""


@query("j_bloom_prefilter_join", oracle=_BLOOM_ORACLE)
def j_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime pre-filter for a fact->dim join (the J-family
    at 100 TB): build a 16384-bit / 4-hash filter over the EUROPE supplier
    keys, probe every lineitem BEFORE any join, then verify against the
    true semi-join. Output is one row of integer evidence: total fact
    rows, rows passing the bloom, true member rows, false-positive rows
    (pass minus true — the bloom's one-sided error made observable), and
    the member-key count. The oracle recomputes the exact bit set and
    every probe, so a green row proves (a) zero false negatives and
    (b) the false-positive arithmetic, not just the final join.

    Spark shape: the bit array is built distributedly (explode -> bit_or
    groupBy), collected as a FIXED-SIZE 2 KiB literal (the
    pushed-down-literal pattern from pipelineops), and probed in a pure
    map stage — whole-stage codegen, zero shuffle before the filter. This
    is what Spark's runtime row-level bloom injection does, made explicit
    and adjudicable. At 1000 executors the probe cost is a per-row hash,
    and the filter removes ~80% of fact rows before they reach the join
    exchange.
    """
    t = load_tables(tune(spark), sf_dir)
    members = (
        t.supplier.join(
            F.broadcast(t.nation),
            t.supplier.s_nationkey == t.nation.n_nationkey,
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    words = bloom_build(members, "s_suppkey", _BLOOM_M, _BLOOM_K)
    n_members = members.count()

    fact = t.lineitem.select("l_suppkey").withColumn(
        "bloom_pass", bloom_probe_expr(F.col("l_suppkey"), words, _BLOOM_M, _BLOOM_K)
    )
    joined = fact.join(
        F.broadcast(members.withColumnRenamed("s_suppkey", "mk")),
        fact.l_suppkey == F.col("mk"),
        "left",
    )
    return joined.agg(
        F.count("*").cast("long").alias("fact_rows"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("long")
        .alias("bloom_pass_rows"),
        F.sum(F.when(F.col("mk").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("match_rows"),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("mk").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("false_positive_rows"),
        F.lit(n_members).cast("long").alias("member_keys"),
    )
