"""Pins the environmental assumption behind text_lm_score's exact oracle.

The micro-nat score ``ROUND(1e6 * (ln(c1+V) - ln(c12+1)))`` does NOT
rest on bit-level ln() agreement: a dense probe (r6) measured JVM
``Math.log`` and DuckDB libm differing by 1 ulp on ~0.9% of integer
arguments (ln(3) included). The oracle survives because the micro-nat
ROUND absorbs 1-ulp drift everywhere except within ~1 ulp of a .5
boundary — so the ACTUAL premise is "no domain pair lands on a
boundary", which is exactly what this test checks: it enumerates the
fixture's whole (c1+V, c12+1) domain and compares the ROUNDED micro-nat
value Spark computes against DuckDB's, pair by pair. A libm/JDK change
(or a new fixture) that lands a pair on a boundary fails here, with the
offending arguments in the message, before it fails an adjudication
row. The same premise backs text_bm25_topk's idf (ln of integers times
an exact rational, micro-rounded) — covered by the second test below.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from .conftest import SF_ORACLE

_TOKENS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

# the fixture's (a, b) = (c1 + V, c12 + 1) argument domain
_DOMAIN_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS} AS t
  FROM read_parquet('{{sf_dir}}/documents.parquet')
), tokr AS (
  SELECT doc_id, UNNEST(t) AS w FROM tok
), uni AS (
  SELECT w, COUNT(*) AS c1 FROM tokr GROUP BY w
), v AS (
  SELECT COUNT(*) AS v FROM uni
), bigr AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM tok, UNNEST(range(1, len(t))) AS r(i)
), bc AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bigr GROUP BY w1, w2
)
SELECT DISTINCT u.c1 + v.v AS a, bc.c12 + 1 AS b
FROM bc JOIN uni u ON u.w = bc.w1 CROSS JOIN v
"""


@pytest.mark.parametrize(
    "sf_dir", [SF_ORACLE, "/root/testdata/sf0.001"], ids=["sf_oracle", "sf0.001"]
)
def test_micro_nat_ln_agreement_over_fixture_domain(spark, sf_dir):
    con = duckdb.connect()
    duck = con.execute(
        f"""
        SELECT a, b, CAST(ROUND(1000000.0 * (ln(a) - ln(b))) AS BIGINT) AS micro
        FROM ({_DOMAIN_SQL.format(sf_dir=sf_dir)})
        """
    ).fetchall()
    assert duck, "fixture produced an empty bigram domain?"

    pairs = spark.createDataFrame(
        [(a, b) for a, b, _ in duck], "a bigint, b bigint"
    )
    got = {
        (r["a"], r["b"]): r["micro"]
        for r in pairs.select(
            "a",
            "b",
            F.round(
                F.lit(1_000_000.0) * (F.log(F.col("a")) - F.log(F.col("b")))
            )
            .cast("bigint")
            .alias("micro"),
        ).collect()
    }
    mismatches = [
        (a, b, micro, got[(a, b)]) for a, b, micro in duck if got[(a, b)] != micro
    ]
    assert not mismatches, (
        f"JVM Math.log and DuckDB libm disagree at micro-nat rounding on "
        f"{len(mismatches)}/{len(duck)} domain pairs, e.g. {mismatches[:5]} "
        f"— the text_lm_score oracle's exactness premise is broken on this "
        f"platform"
    )


_BM25_DOMAIN_SQL = """
WITH tok AS (
  SELECT doc_id, {toks} AS t
  FROM read_parquet('{sf_dir}/documents.parquet')
), stats AS (
  SELECT COUNT(*) AS n, SUM(len(t)) AS tt FROM tok
), tokr AS (
  SELECT doc_id, UNNEST(t) AS w FROM tok
), tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM tokr GROUP BY doc_id, w
), dft AS (
  SELECT w, COUNT(*) AS df FROM tf GROUP BY w
), qt AS (
  SELECT w, df FROM dft, stats WHERE 2 * df <= n ORDER BY df DESC, w LIMIT 5
), dl AS (
  SELECT doc_id, len(t) AS dl FROM tok
)
SELECT DISTINCT tf.tf, qt.df, dl.dl, s.n, s.tt
FROM tf JOIN qt USING (w) JOIN dl USING (doc_id) CROSS JOIN stats s
"""


@pytest.mark.parametrize(
    "sf_dir", [SF_ORACLE, "/root/testdata/sf0.001"], ids=["sf_oracle", "sf0.001"]
)
def test_bm25_micro_agreement_over_fixture_domain(spark, sf_dir):
    """Same premise-check for text_bm25_topk: the rounded per-(doc,term)
    micro score must agree engine-by-engine over every (tf, df, dl)
    triple the fixture's query terms actually produce."""
    con = duckdb.connect()
    duck = con.execute(
        f"""
        SELECT tf, df, dl,
               CAST(ROUND(1000000.0 * (ln(2*n - 2*df + 1) - ln(2*df + 1))
                    * (22 * tf * tt) / (10 * tf * tt + 3 * tt + 9 * dl * n)
               ) AS BIGINT) AS micro
        FROM ({_BM25_DOMAIN_SQL.format(toks=_TOKENS, sf_dir=sf_dir)})
        """
    ).fetchall()
    assert duck, "no (tf, df, dl) domain — did the query-term guard drop all terms?"
    n, tt = con.execute(
        f"SELECT COUNT(*), SUM(len({_TOKENS})) FROM "
        f"read_parquet('{sf_dir}/documents.parquet') "
    ).fetchone()
    n, tt = int(n), int(tt)

    triples = spark.createDataFrame(
        [(tf, df, dl) for tf, df, dl, _m in duck], "tf bigint, df bigint, dl bigint"
    )
    idf = F.log(F.lit(2 * n) - 2 * F.col("df") + 1) - F.log(2 * F.col("df") + 1)
    num = F.lit(22) * F.col("tf") * F.lit(tt)
    den = (
        F.lit(10) * F.col("tf") * F.lit(tt)
        + F.lit(3 * tt)
        + F.lit(9) * F.col("dl") * F.lit(n)
    )
    micro = F.round(F.lit(1_000_000.0) * idf * num / den).cast("bigint")
    got = {
        (r["tf"], r["df"], r["dl"]): r["micro"]
        for r in triples.select("tf", "df", "dl", micro.alias("micro")).collect()
    }
    mismatches = [
        (tf, df, dl, m, got[(tf, df, dl)])
        for tf, df, dl, m in duck
        if got[(tf, df, dl)] != m
    ]
    assert not mismatches, (
        f"BM25 micro disagreement on {len(mismatches)}/{len(duck)} domain "
        f"triples, e.g. {mismatches[:5]}"
    )
