"""Unit pins for textops helpers that the sf fixtures cannot exercise."""

from __future__ import annotations

from pyspark.sql import types as T

from clinical_bi_spark.queries.textops import _adjacent_bigrams

_WORDS_SCHEMA = T.StructType(
    [T.StructField("words", T.ArrayType(T.StringType()), False)]
)


def test_adjacent_bigrams_zero_token_doc(spark):
    """ADVICE r8 (medium): slice(words, 1, size-1) threw
    INVALID_PARAMETER_VALUE.LENGTH for a zero-token document (length -1),
    crashing the whole query while the DuckDB oracle returned empty. The
    greatest(size-1, 0) clamp must make empty/one-token docs contribute
    zero bigrams and leave multi-token docs untouched."""
    df = spark.createDataFrame(
        [([],), (["solo"],), (["a", "b", "c"],)], _WORDS_SCHEMA
    )
    rows = sorted(
        (r.w1, r.w2) for r in _adjacent_bigrams(df).collect()
    )
    assert rows == [("a", "b"), ("b", "c")]


def test_ngram_jaccard_zero_token_docs(spark, tmp_path):
    """r9 family-wide sweep of the PMI zero-token lesson: two empty
    documents in one source block would give Jaccard 0/0 — ANSI Spark
    crashed where DuckDB's double division would not. Both zero-token
    docs must now be excluded from the pair space, and real pairs must
    still emerge."""
    from clinical_bi_spark.queries import load_all

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s1", 16),
            (2, "alpha beta gamma", "en", "s1", 16),
            (3, "", "en", "s1", 0),
            (4, "   ", "en", "s1", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = load_all()["dedup_ngram_jaccard"].fn(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_curation_avg_div_exact_past_2_53(spark):
    """r11 verdict Next #5: the curation rollup's average switched from
    the ``_exact_div`` double trick to true bigint ``div`` in r10's
    advice fix because an AGGREGATE numerator (2*SUM(qmicro)+n) can pass
    2^53, where (a - a%b)/b silently loses exactness on the Spark side
    while the DuckDB HUGEINT twin stays exact. Pin that bound with a
    synthetic group ABOVE 2^53: the registered ``div`` form must equal
    Python integer arithmetic, and the retired double-trick form must
    demonstrably diverge on the same input (the test has teeth)."""
    from pyspark.sql import functions as F

    # Adversarial construction (generic >2^53 operands often round back
    # to the exact quotient; the guarantee is what ends at 2^53, so pin
    # a case that provably breaks): quotient q = 2^53 + 1 sits OFF the
    # double grid (spacing 2 past 2^53), and the numerator's low bits
    # (12 mod 16 at ulp 16) force the m -> fl(m) rounding upward, so the
    # double path must land on 2^53 + 2 while bigint div returns q.
    n_docs = 6
    qsum = 6 * ((1 << 53) + 1) - 3
    numer = 2 * qsum + n_docs
    denom = 2 * n_docs
    expected = numer // denom  # exactly 2^53 + 1
    assert expected == (1 << 53) + 1 and numer % denom == 0

    df = spark.createDataFrame(
        [(qsum, n_docs)], "`__qsum` bigint, n_docs bigint"
    )
    got = df.select(
        F.expr(
            "(2 * `__qsum` + cast(n_docs as bigint)) div "
            "(2 * cast(n_docs as bigint))"
        ).alias("q")
    ).collect()[0].q
    assert got == expected

    # the retired form: remainder-strip then double division — m = 12q
    # ~ 2^56.6 rounds UP by 4 when represented (12 mod 16 residue), and
    # q + 1/3 then correctly-rounds to the next grid point 2^53 + 2
    a, b = F.lit(numer).cast("bigint"), F.lit(denom).cast("bigint")
    old = df.select(
        ((a - a % b) / b).cast("bigint").alias("q")
    ).collect()[0].q
    assert old == (1 << 53) + 2, (
        "double-trick divergence shape changed; re-derive the pin "
        f"(got {old}, expected off-grid rounding to 2^53+2)"
    )
