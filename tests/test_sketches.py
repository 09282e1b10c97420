"""Sketch operators: semantic guarantees the SQL oracles can't phrase —
the Bloom one-sided-error contract at adversarially small m, the count-min
overestimate bound, HLL's error behavior, and span-dedup constructions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_bi_spark.operators.sketches import (
    bloom_build,
    bloom_probe_expr,
    countmin_cells,
    countmin_probe,
    hll_estimate,
)
from tests.conftest import SF_ORACLE


def test_bloom_has_no_false_negatives_even_when_saturated(spark):
    """At m=64 bits / 100 keys the filter is nearly saturated (false
    positives everywhere) — membership must STILL hold for every real key,
    and the downstream join must be unaffected by FP noise."""
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", m_bits=64, k=2)
    assert len(words) == 1
    probe = spark.range(0, 400).select(F.col("id").alias("k"))
    got = probe.withColumn(
        "pass", bloom_probe_expr(F.col("k"), words, m_bits=64, k=2)
    )
    members = {r["k"] for r in got.filter("pass").collect()}
    assert set(range(100)) <= members  # one-sided error: no false negatives
    # the verifying join discards FPs: semi-join result == exact members
    passed = got.filter("pass")
    verified = passed.join(keys, "k", "left_semi")
    assert sorted(r["k"] for r in verified.collect()) == list(range(100))


def test_bloom_rejects_most_nonmembers_when_sized(spark):
    """Properly sized (16384 bits, 4 hashes, 100 keys) the FP rate over
    1000 non-member probes must be tiny (expected ~0; allow <= 1%)."""
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", m_bits=16384, k=4)
    nonmembers = spark.range(1000, 2000).select(F.col("id").alias("k"))
    fps = nonmembers.filter(
        bloom_probe_expr(F.col("k"), words, m_bits=16384, k=4)
    ).count()
    assert fps <= 10


def test_countmin_never_underestimates(spark):
    """CM guarantee: estimate >= true count for EVERY token, including
    rare ones (probe the 50 least-frequent, not just heavy hitters)."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("token")
    )
    cells = countmin_cells(toks, "token", 4, 1024)
    true = toks.groupBy("token").agg(F.count("*").alias("true_count"))
    rare = true.orderBy(F.asc("true_count"), F.asc("token")).limit(50)
    est = countmin_probe(cells, rare.select("token"), "token", 4, 1024)
    rows = rare.join(est, "token").collect()
    # the fixture vocabulary may be smaller than 50 — every probed token
    # must come back, and none may be underestimated
    assert len(rows) == min(50, true.count())
    assert all(r["cm_estimate"] >= r["true_count"] for r in rows)


def test_hll_error_within_advertised_bound(spark):
    """m=256 → theoretical stderr 1.04/sqrt(256) = 6.5%; assert the
    orderkey estimate lands within 3 sigma (19.5%)."""
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    row = hll_estimate(li, "l_orderkey", 256).collect()[0]
    exact = li.select("l_orderkey").distinct().count()
    rel = abs(row["est_distinct"] - exact) / exact
    assert rel < 0.195, (row["est_distinct"], exact)


def test_hll_is_insensitive_to_duplication(spark):
    """Registers depend only on the distinct value set: duplicating every
    row 3x must give the IDENTICAL estimate (the property that makes the
    sketch a COUNT(DISTINCT) substitute)."""
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select("l_orderkey")
    once = hll_estimate(li, "l_orderkey", 256).collect()[0]
    tripled = hll_estimate(li.union(li).union(li), "l_orderkey", 256).collect()[0]
    assert once["sum_scaled"] == tripled["sum_scaled"]
    assert once["est_distinct"] == tripled["est_distinct"]


def test_span_dedup_flags_copied_paragraph(spark):
    """A doc sharing an 8+-token run with another doc gets dup spans; a
    fully unique doc gets zero; span counts follow len-n+1."""
    from clinical_bi_spark.operators.dedup import span_fingerprint_arrays

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    rows = [
        ("a", shared + " alpha beta gamma"),
        ("b", "prefix words here " + shared),
        ("c", "entirely distinct content with no overlap at all okay then"),
        ("d", "short text"),  # < 8 tokens → zero spans
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    f1s, f2s = span_fingerprint_arrays(F.col("text"), 8)
    spans = df.select(
        "doc_id",
        F.explode(F.arrays_zip(f1s.alias("a"), f2s.alias("b"))).alias("z"),
    ).select("doc_id", "z.a", "z.b")
    dup = (
        spans.groupBy("a", "b")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter("nd >= 2")
    )
    perdoc = {
        r["doc_id"]: r["n"]
        for r in spans.join(dup.select("a", "b"), ["a", "b"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # the shared 10-token run yields 3 duplicated 8-gram positions each
    assert perdoc.get("a") == 3 and perdoc.get("b") == 3
    assert "c" not in perdoc and "d" not in perdoc
    counts = {
        r["doc_id"]: r["n"]
        for r in spans.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a"] == 13 - 8 + 1
    assert "d" not in counts  # no spans at all for <8 tokens


def test_hll_merge_equals_union_registers(spark):
    """Mergeability contract: per-bucket MAX over slice registers must be
    IDENTICAL to registers computed over the union directly — the
    executor→final merge property, asserted at register granularity."""
    from clinical_bi_spark.operators.sketches import hll_registers

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    h1 = li.filter("l_shipdate < timestamp'1997-06-01'")
    h2 = li.filter("l_shipdate >= timestamp'1997-06-01'")
    merged = (
        hll_registers(h1, "l_orderkey", 256)
        .unionByName(hll_registers(h2, "l_orderkey", 256))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    direct = hll_registers(li, "l_orderkey", 256)
    m = {(r["bucket"], r["r"]) for r in merged.collect()}
    d = {(r["bucket"], r["r"]) for r in direct.collect()}
    assert m == d and len(m) > 0


def test_histogram_quantiles_within_bin_resolution(spark):
    """The 256-bin estimate must land within one bin width of the exact
    quantile — the histogram's resolution guarantee."""
    from clinical_bi_spark.queries import load_all

    rows = load_all()["agg_histogram_quantiles"].fn(spark, SF_ORACLE).collect()
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    b = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).collect()[0]
    width = (b["hi"] - b["lo"]) / 256.0
    assert len(rows) == 4
    for r in rows:
        assert abs(r["est_price"] - r["exact_price"]) <= width, r


def test_kmv_estimate_within_theory_error(spark):
    """KMV with k=256 has relative standard error ~1/sqrt(k-2) ~ 6.3%;
    assert every per-group estimate lands within 3 sigma (19%) and the
    sketch is exactly full (the fixture has >> k distinct keys)."""
    from clinical_bi_spark.queries import load_all

    rows = load_all()["sketch_kmv_distinct"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_sketch == 256
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 0.19, (r.l_returnflag, rel)


def test_kmv_merge_is_sketch_of_union(spark):
    """Structural mergeability: union-then-truncate of the two slice
    sketches must EQUAL the sketch built directly over the union — the
    set-level exactness that distinguishes KMV from register sketches."""
    from clinical_bi_spark.queries.sketchops import (
        _KMV_K,
        _kmv_sketch,
    )
    from pyspark.sql.window import Window

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    split = F.lit("1997-06-01").cast("date")
    half = F.when(F.col("l_shipdate") < split, F.lit(0)).otherwise(F.lit(1))
    slices = _kmv_sketch(li, half, "l_orderkey", _KMV_K)
    merged = {
        r.hv
        for r in slices.select("hv")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("hv")))
        .filter(F.col("rn") <= _KMV_K)
        .collect()
    }
    direct = {
        r.hv
        for r in _kmv_sketch(li, F.lit(0), "l_orderkey", _KMV_K).collect()
    }
    assert merged == direct and len(direct) == _KMV_K


def test_kmv_jaccard_within_theory_error(spark):
    """The sketch-only Jaccard estimate must land within 3 sigma of the
    exact overlap (sigma ~ 1/sqrt(k) for the |U ∩ A ∩ B|/k estimator at
    k=256 -> 0.0625; allow 0.19 absolute)."""
    from clinical_bi_spark.queries import load_all

    r = load_all()["sketch_kmv_jaccard"].fn(spark, SF_ORACLE).collect()[0]
    assert r.k_eff == 256
    assert abs(r.est_jaccard - r.exact_jaccard) < 0.19, r


# ---------------------------------------------------------------------------
# r9: bottom-k quantile sketch — error contract + merge property
# ---------------------------------------------------------------------------


def test_bottomk_quantiles_error_within_sample_bound(spark):
    """A k=256 uniform sample's rank error is ~1/sqrt(k) (~6%); assert
    each estimated quantile's TRUE rank (fraction of the corpus below
    the estimate) is within 0.08 of its target — the advertised bound
    with headroom for the fixture."""
    from clinical_bi_spark.queries import load_all

    row = load_all()["sketch_bottomk_quantiles"].fn(spark, SF_ORACLE).first()
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    n = li.count()
    for name, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)):
        est = row[name]
        true_rank = (
            li.filter(F.col("l_extendedprice") <= est).count() / n
        )
        assert abs(true_rank - q) < 0.08, (name, est, true_rank)


def test_bottomk_sample_is_mergeable(spark):
    """The sketch's merge law: bottom-k of a union equals bottom-k of
    the concatenated per-part bottom-ks — exact set equality, which is
    what makes the sketch shard/tree-aggregate cleanly at 100 TB."""
    from clinical_bi_spark.operators.dedup import _md5_word
    from clinical_bi_spark.queries.sketchops import _BKQ_K

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    h = li.select(
        F.col("l_extendedprice").cast("double").alias("v"),
        _md5_word(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
                F.lit(":bkq"),
            ),
            1,
        ).alias("hv"),
        (F.col("l_orderkey") % 2).alias("part"),
    )
    whole = [(r.hv, r.v) for r in h.orderBy("hv", "v").limit(_BKQ_K).collect()]
    parts = h.filter(F.col("part") == 0).orderBy("hv", "v").limit(_BKQ_K).unionAll(
        h.filter(F.col("part") == 1).orderBy("hv", "v").limit(_BKQ_K)
    )
    merged = [(r.hv, r.v) for r in parts.orderBy("hv", "v").limit(_BKQ_K).collect()]
    assert merged == whole


def test_bottomk_quantiles_empty_relation_yields_null_row(spark, tmp_path):
    """r9 ADVICE: an EMPTY relation must yield one row with NULL
    quantiles (matching the oracle's vs[0] -> NULL), not an ANSI
    INVALID_ARRAY_INDEX crash from element_at(vs, 0)."""
    from clinical_bi_spark.queries import load_all

    spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    row = load_all()["sketch_bottomk_quantiles"].fn(spark, str(tmp_path)).first()
    assert row.n_rows == 0
    assert row.p25 is None and row.p50 is None
    assert row.p75 is None and row.p95 is None
